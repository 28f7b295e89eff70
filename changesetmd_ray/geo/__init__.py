"""Pure-numpy geospatial kernels (no Ray, no external geo libraries).

Every primitive the engine needs — envelopes, haversine, point-in-polygon
with PostGIS boundary semantics, S2 cell ids, H3-style hex cells, the
lon/lat join grid, and an STR packed rectangle tree — implemented from
scratch against published specs, vectorized over numpy arrays.
"""

from changesetmd_ray.geo.envelope import (  # noqa: F401
    bbox_area_sq_m,
    bbox_contains,
    bbox_coveredby,
    bbox_intersects,
    normalize_bbox,
)
from changesetmd_ray.geo.haversine import haversine_m  # noqa: F401
