"""Geodesic measures — numpy ports of the reference formulas so output
values are comparable digit-for-digit.

* ``segment_lengths`` / ``line_length``: equirectangular approximation,
  ``R * sqrt((dlng*cos(mid_lat))^2 + dlat^2)`` per segment with
  R = 6 371 000 m (reference ``Geo.java:19,37-44`` — deliberately NOT
  haversine: the reference states the approximation works because
  segments are short, and matching its numbers requires the same
  formula).
* ``ring_area``: spherical excess accumulation
  ``sum((rad(x3)-rad(x1)) * sin(rad(y2))) * R^2 / 2`` over consecutive
  vertex triples — the Chamberlain–Duquette algorithm as implemented at
  ``Geo.java:147-179`` (ported from the same JPL publication, not from
  the reference source).
* ``polygon_area``: |outer ring| minus |inner rings| (``Geo.java:94-101``).

All functions are vectorized over coordinate arrays and are meant to be
called inside Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS = 6_371_000.0  # meters
PREC_INV = 1e-7  # fixed-point -> degrees


def segment_lengths(lon_deg: np.ndarray, lat_deg: np.ndarray) -> np.ndarray:
    """Per-segment equirectangular lengths (meters) of a polyline given
    in degrees. Returns an array of len(coords)-1.

    Operation order mirrors the reference exactly (radians of the
    coordinate *difference*, cosine of the mid-latitude), so oracle SQL
    written with the same expressions agrees to the last bit.
    """
    dlat = np.radians(lat_deg[1:] - lat_deg[:-1])
    dlng = np.radians(lon_deg[1:] - lon_deg[:-1]) * np.cos(
        np.radians((lat_deg[1:] + lat_deg[:-1]) / 2.0)
    )
    return EARTH_RADIUS * np.sqrt(dlng * dlng + dlat * dlat)


def line_length(lon_deg: np.ndarray, lat_deg: np.ndarray) -> float:
    if len(lon_deg) < 2:
        return 0.0
    return float(segment_lengths(lon_deg, lat_deg).sum())


def line_length_e7(lon_e7: np.ndarray, lat_e7: np.ndarray) -> float:
    return line_length(lon_e7 * PREC_INV, lat_e7 * PREC_INV)


def ring_area(lon_deg: np.ndarray, lat_deg: np.ndarray) -> float:
    """Signed spherical ring area (m^2), Chamberlain–Duquette. The ring
    must be closed (first == last vertex); the reference iterates the
    closed coordinate array including the duplicate end vertex."""
    n = len(lon_deg)
    if n <= 2:
        return 0.0
    x = np.radians(lon_deg)
    y = np.radians(lat_deg)
    # consecutive triples (p1, p2, p3) with wraparound over the closed array
    x1 = x
    y2 = np.roll(y, -1)
    x3 = np.roll(x, -2)
    area = float(np.sum((x3 - x1) * np.sin(y2)))
    return area * EARTH_RADIUS * EARTH_RADIUS / 2.0


def rings_area(lon_deg_2d: np.ndarray, lat_deg_2d: np.ndarray) -> np.ndarray:
    """Batch Chamberlain–Duquette: signed areas of N equal-length closed
    rings given as (N, V) degree arrays — the vectorized form of
    ``ring_area`` for pandas-UDF batches (one numpy pass, no per-row
    Python)."""
    x = np.radians(np.asarray(lon_deg_2d, dtype=np.float64))
    y = np.radians(np.asarray(lat_deg_2d, dtype=np.float64))
    x3 = np.roll(x, -2, axis=1)
    y2 = np.roll(y, -1, axis=1)
    return ((x3 - x) * np.sin(y2)).sum(axis=1) * EARTH_RADIUS * EARTH_RADIUS / 2.0


def bbox_rings_area_e7(
    min_lon: np.ndarray, min_lat: np.ndarray, max_lon: np.ndarray, max_lat: np.ndarray
) -> np.ndarray:
    """|area| of fixed-point bbox rings (m^2), batched: each bbox becomes
    the closed 5-vertex ring (SW, SE, NE, NW, SW) fed to ``rings_area``."""
    x0 = np.asarray(min_lon, dtype=np.float64) * PREC_INV
    y0 = np.asarray(min_lat, dtype=np.float64) * PREC_INV
    x1 = np.asarray(max_lon, dtype=np.float64) * PREC_INV
    y1 = np.asarray(max_lat, dtype=np.float64) * PREC_INV
    lon = np.stack([x0, x1, x1, x0, x0], axis=1)
    lat = np.stack([y0, y0, y1, y1, y0], axis=1)
    return np.abs(rings_area(lon, lat))


def polygon_area(
    outer: tuple[np.ndarray, np.ndarray],
    inners: list[tuple[np.ndarray, np.ndarray]] | None = None,
) -> float:
    """|outer| - sum(|inner|) in m^2 (Geo.java:94-101 semantics)."""
    area = abs(ring_area(*outer))
    for lon, lat in inners or []:
        area -= abs(ring_area(lon, lat))
    return area
