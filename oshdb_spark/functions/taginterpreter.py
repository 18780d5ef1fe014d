"""TagInterpreter: the polygon-vs-line / area-vs-collection decision.

Re-expresses the reference's tag-interpretation rules as pure Column
predicates over the tags map — zero Python at runtime:

* ways (``BaseTagInterpreter.java:48-104``): an OPEN way is never an
  area; an explicit ``area`` tag wins (``area=no`` forces line even
  when area-ish keys are present, ``area=yes`` forces polygon);
  otherwise the polygon-features rule table decides.
* the rule table mirrors the ``polygon-features.json`` structure the
  reference loads in ``DefaultTagInterpreter.java:31-81``: each key
  carries a MODE — ``all`` (any value except ``no``), ``whitelist``
  (only the listed values), ``blacklist`` (anything but the listed
  values). NOTE the reference's loader also inserts the value-id of
  ``"no"`` into whitelist sets (DefaultTagInterpreter.java:96-105),
  which would make ``landuse=no`` an area; this module follows the
  published polygon-features semantics instead (a whitelist matches
  only its listed values) and documents the divergence here.
* relations (``DefaultTagInterpreter.java:160-199``): isArea iff
  ``type`` is ``multipolygon`` or ``boundary``; isLine iff
  ``type=route``; the geometry builder dispatches area-relations to
  multipolygon assembly and everything else to a GeometryCollection
  (``OSHDBGeometryBuilder.java:121-139``).
* old-style multipolygons (``BaseTagInterpreter.java:106-135``): a
  relation whose tags are all either the relation-area tag or
  *uninteresting* keys, with exactly ONE outer way member, keeps its
  real tags on that outer way (pre-2008 OSM mapping style); consumers
  resolve tags through the member.

Key ids come from the engine's dictionary (sources/versions.py tag
model extended for ways/relations): AREA_KEY carries yes=1/no=0.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- way-side keys ---------------------------------------------------------
BUILDING_KEY = 1  # polygon-features mode "all"
AREA_KEY = 5      # explicit area=yes/no override
HIGHWAY_KEY = 6   # NOT in the rule table (line-ish)
LANDUSE_KEY = 7   # polygon-features mode "whitelist"
BARRIER_KEY = 8   # polygon-features mode "blacklist"
AREA_YES = 1
AREA_NO = 0
NO_VALUE = 0      # the value-id of "no" (mode "all" excludes it)

# landuse values
LANDUSE_FOREST = 1
LANDUSE_RESIDENTIAL = 2  # the whitelist EXCEPTION: landuse present, not an area
LANDUSE_GRASS = 3
# barrier values
BARRIER_WALL = 1
BARRIER_FENCE = 2
BARRIER_CITY_WALL = 3  # the only barrier value NOT blacklisted -> area

# the polygon-features rule table (DefaultTagInterpreter.java:31-81
# structure): (key, mode, values)
POLYGON_FEATURES: tuple[tuple[int, str, tuple[int, ...]], ...] = (
    (BUILDING_KEY, "all", ()),
    (LANDUSE_KEY, "whitelist", (LANDUSE_FOREST, LANDUSE_GRASS)),
    (BARRIER_KEY, "blacklist", (BARRIER_WALL, BARRIER_FENCE)),
)

# --- relation-side keys ----------------------------------------------------
TYPE_KEY = 10
TYPE_MULTIPOLYGON = 1
TYPE_BOUNDARY = 2
TYPE_ROUTE = 3
NAME_KEY = 11    # an *interesting* tag: blocks old-style detection
SOURCE_KEY = 12  # uninteresting (uninterestingTags.json analog)
UNINTERESTING_KEYS: tuple[int, ...] = (SOURCE_KEY,)


def ring_closed_col(lon_arr: Column, lat_arr: Column) -> Column:
    """First vertex == last vertex, with enough vertices for a ring."""
    return (
        (F.size(lon_arr) >= 4)
        & (F.element_at(lon_arr, 1) == F.element_at(lon_arr, -1))
        & (F.element_at(lat_arr, 1) == F.element_at(lat_arr, -1))
    )


def polygon_features_match_col(tags: Column) -> Column:
    """True iff any rule of the POLYGON_FEATURES table matches the tags
    map — the ``wayAreaTags`` lookup of ``BaseTagInterpreter.java:48-60``
    generalized to per-key value modes."""
    m = F.lit(False)
    for key, mode, values in POLYGON_FEATURES:
        v = tags.getItem(key)
        if mode == "all":
            cond = v.isNotNull() & (v != F.lit(NO_VALUE))
        elif mode == "whitelist":
            cond = v.isin(*values) if values else F.lit(False)
        elif mode == "blacklist":
            cond = v.isNotNull() & ~v.isin(*values) if values else v.isNotNull()
        else:  # pragma: no cover - table is static
            raise ValueError(f"unknown polygon-features mode {mode!r}")
        m = m | cond
    return m


def way_is_area_col(tags: Column, lon_arr: Column, lat_arr: Column) -> Column:
    """The isArea(way) rule as one Column expression (JVM-side)."""
    closed = ring_closed_col(lon_arr, lat_arr)
    explicit = tags.getItem(AREA_KEY)
    return closed & (
        F.when(explicit == AREA_NO, F.lit(False))
        .when(explicit == AREA_YES, F.lit(True))
        .otherwise(polygon_features_match_col(tags))
    )


def way_geom_kind_col(tags: Column, lon_arr: Column, lat_arr: Column) -> Column:
    """'polygon' | 'line' — the OSHDBGeometryBuilder dispatch
    (``OSHDBGeometryBuilder.java:66-139``: isArea && closed -> Polygon,
    else LineString)."""
    return F.when(way_is_area_col(tags, lon_arr, lat_arr), F.lit("polygon")).otherwise(
        F.lit("line")
    )


# --- relations -------------------------------------------------------------

def relation_is_area_col(tags: Column) -> Column:
    """isArea(relation): ``type`` in (multipolygon, boundary)
    (``DefaultTagInterpreter.java:182-192``)."""
    t = tags.getItem(TYPE_KEY)
    # null-safe: a relation with NO type tag is not an area (isin on a
    # NULL map lookup yields NULL, which must read as False)
    return F.coalesce(t.isin(TYPE_MULTIPOLYGON, TYPE_BOUNDARY), F.lit(False))


def relation_is_line_col(tags: Column) -> Column:
    """isLine(relation): ``type=route``
    (``DefaultTagInterpreter.java:195-198``)."""
    return F.coalesce(tags.getItem(TYPE_KEY) == TYPE_ROUTE, F.lit(False))


def relation_geom_kind_col(tags: Column) -> Column:
    """'multipolygon' | 'collection' — the relation dispatch of
    ``OSHDBGeometryBuilder.java:121-139``: area-relations assemble into
    multipolygons, every other relation (route, unknown type, no type)
    degrades to a GeometryCollection of its member geometries rather
    than silently assembling."""
    return F.when(relation_is_area_col(tags), F.lit("multipolygon")).otherwise(
        F.lit("collection")
    )


def has_interesting_tags_besides_area_col(tags: Column) -> Column:
    """True iff the relation carries any tag that is neither the
    relation-area ``type`` tag nor an uninteresting key — the tag-side
    half of ``isOldStyleMultipolygon`` (``BaseTagInterpreter.java:
    106-135``: any such tag disqualifies old-style)."""
    ignorable = F.array(
        F.lit(TYPE_KEY).cast("int"),
        *[F.lit(k).cast("int") for k in UNINTERESTING_KEYS],
    )
    interesting = F.filter(
        F.map_keys(tags), lambda k: ~F.array_contains(ignorable, k)
    )
    return F.size(interesting) > 0


def old_style_multipolygon_col(tags: Column, n_outer_members: Column) -> Column:
    """isOldStyleMultipolygon (``BaseTagInterpreter.java:106-135``):
    an area-relation with EXACTLY one outer way member whose own tags
    are all either the area tag or uninteresting — its real tags live
    on the outer way (pre-2008 mapping style)."""
    return (
        relation_is_area_col(tags)
        & (n_outer_members == 1)
        & ~has_interesting_tags_besides_area_col(tags)
    )
