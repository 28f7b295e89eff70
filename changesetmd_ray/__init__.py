"""changesetmd_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch reimplementation of the query and data-processing
capabilities of the reference ``SlowMo24/ChangesetMD`` (an XML →
Postgres/PostGIS changeset loader, see ``/root/reference/changesetmd.py``)
re-expressed Ray-Data-first per SURVEY.md:

- data model: Arrow tables / ``ray.data.Dataset`` instead of Postgres
  tables (reference DDL at ``queries.py:6-33``);
- the GiST-backed geofilter query surface (reference
  ``queries.py:52-59``, ``README.md:218-234``) becomes vectorized
  numpy/Arrow kernels in :mod:`changesetmd_ray.geo` driven through
  ``map_batches`` stages in :mod:`changesetmd_ray.stages`;
- the replication/checkpoint state table (``queries.py:28-32``) becomes
  the per-partition manifest in :mod:`changesetmd_ray.state.manifest`.

Nothing in here calls ``ray.init``; callers own the Ray session.
"""

__version__ = "0.1.0"
