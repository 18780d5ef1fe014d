"""TagInterpreter: the polygon-vs-line decision for way geometries.

Re-expresses the reference's ``BaseTagInterpreter.isArea`` rules
(``oshdb-util/.../taginterpreter/BaseTagInterpreter.java:48-158``) as a
pure Column predicate over the tags map + the actual ring closure:

1. an OPEN way is never an area (first vertex != last vertex);
2. an explicit ``area`` tag wins: ``area=no`` forces line even when
   area-ish keys are present, ``area=yes`` forces polygon;
3. otherwise the way is an area iff it carries a key from the
   area-tag dictionary (``building`` here); keys outside the
   dictionary (``highway``) do not make an area.

Key ids come from the engine's dictionary (sources/versions.py tag
model extended for ways): AREA_KEY carries yes=1/no=0.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BUILDING_KEY = 1  # in the area-tag dictionary
AREA_KEY = 5      # explicit area=yes/no override
HIGHWAY_KEY = 6   # NOT in the area-tag dictionary (line-ish)
AREA_YES = 1
AREA_NO = 0

# the areaTags dictionary (BaseTagInterpreter.java:70-104): which keys
# imply polygon semantics for a closed way
AREA_TAG_KEYS = (BUILDING_KEY,)


def ring_closed_col(lon_arr: Column, lat_arr: Column) -> Column:
    """First vertex == last vertex, with enough vertices for a ring."""
    return (
        (F.size(lon_arr) >= 4)
        & (F.element_at(lon_arr, 1) == F.element_at(lon_arr, -1))
        & (F.element_at(lat_arr, 1) == F.element_at(lat_arr, -1))
    )


def way_is_area_col(tags: Column, lon_arr: Column, lat_arr: Column) -> Column:
    """The isArea(way) rule as one Column expression (JVM-side)."""
    closed = ring_closed_col(lon_arr, lat_arr)
    explicit = tags.getItem(AREA_KEY)
    polyish = F.lit(False)
    for k in AREA_TAG_KEYS:
        polyish = polyish | F.map_contains_key(tags, F.lit(k))
    return closed & (
        F.when(explicit == AREA_NO, F.lit(False))
        .when(explicit == AREA_YES, F.lit(True))
        .otherwise(polyish)
    )


def way_geom_kind_col(tags: Column, lon_arr: Column, lat_arr: Column) -> Column:
    """'polygon' | 'line' — the OSHDBGeometryBuilder dispatch
    (``OSHDBGeometryBuilder.java:66-139``: isArea && closed -> Polygon,
    else LineString)."""
    return F.when(way_is_area_col(tags, lon_arr, lat_arr), F.lit("polygon")).otherwise(
        F.lit("line")
    )
