"""Distributed join operators (SURVEY.md §2.4) — each one a composition
of Ray Data primitives over the pure-numpy geo kernels:

- :mod:`pip`   — J2: broadcast point-in-polygon (driver-built STRtree →
  ``ray.put`` → actor-pool probe).
- :mod:`bbox`  — J3: cell-partitioned bbox∩bbox join with skew-aware
  salting and shuffle-free reference-point dedup.
- :mod:`knn`   — J4: exact haversine kNN via broadcast probes +
  streaming per-block partial top-k + per-probe merge.
- :mod:`tiles` — J5: raster-tile ↔ vector assignment, tile aggregation,
  sorted tile output.
- :mod:`equi`  — J1: distributed hash join (both sides large, optional
  hot-key salting).
- :mod:`asof`  — time-series as-of join (most recent right row at or
  before each left timestamp).
- :mod:`broadcast` — J1/J6 small-side forms: lookup / semi / anti via
  one ``ray.put``, no shuffle.
"""

from changesetmd_ray.joins.asof import asof_join  # noqa: F401
from changesetmd_ray.joins.bbox import bbox_join  # noqa: F401
from changesetmd_ray.joins.broadcast import (  # noqa: F401
    anti_join_keys,
    broadcast_lookup,
    semi_join_keys,
)
from changesetmd_ray.joins.equi import hash_join  # noqa: F401
from changesetmd_ray.joins.knn import knn_join, knn_radius_join  # noqa: F401
from changesetmd_ray.joins.pip import pip_join  # noqa: F401
from changesetmd_ray.joins.tiles import assign_tiles, tile_counts  # noqa: F401
