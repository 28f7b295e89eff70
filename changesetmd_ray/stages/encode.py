"""Cell-encoder actor stage: append S2 / hex / grid index columns.

The Ray-native replacement for the reference's post-load GiST index build
(``changesetmd.py:604-606``, ``queries.py:57-59``): instead of a global
index object, every row carries sortable hierarchical cell-id columns
derived during load (SURVEY.md §2.1 S12, §2.3 T2). Actor pool because
the S2 Hilbert lookup tables and hex lattice constants are loaded once
per actor in ``__init__``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from changesetmd_ray.geo import cells, grid, hexgrid


class CellEncoder:
    """Appends ``s2_cell`` (uint64, at ``s2_level``), ``hex_cell``
    (uint64, at ``hex_res``) and ``grid_cell`` (uint64, at
    ``grid_zoom``) computed from the row's bbox centre; rows without a
    bbox get nulls. Vectorized numpy over the whole batch."""

    def __init__(self, s2_level: int = 12, hex_res: int = 9, grid_zoom: int = 7) -> None:
        self.s2_level = s2_level
        self.hex_res = hex_res
        self.grid_zoom = grid_zoom

    def __call__(self, batch: pa.Table) -> pa.Table:
        min_lon = batch["min_lon"].to_numpy(zero_copy_only=False)
        min_lat = batch["min_lat"].to_numpy(zero_copy_only=False)
        max_lon = batch["max_lon"].to_numpy(zero_copy_only=False)
        max_lat = batch["max_lat"].to_numpy(zero_copy_only=False)
        # wrap-aware centre: an antimeridian box (min_lon > max_lon,
        # the normalize_bbox representation) centres near ±180, not 0
        raw = (min_lon + max_lon) * 0.5
        with np.errstate(invalid="ignore"):
            wrapped = min_lon > max_lon
        cx = np.where(wrapped, np.where(raw >= 0.0, raw - 180.0, raw + 180.0), raw)
        cy = (min_lat + max_lat) * 0.5
        ok = ~(np.isnan(cx) | np.isnan(cy))

        s2 = np.zeros(len(cx), dtype=np.uint64)
        hx = np.zeros(len(cx), dtype=np.uint64)
        gc = np.zeros(len(cx), dtype=np.uint64)
        if ok.any():
            s2[ok] = cells.cell_from_latlng(cy[ok], cx[ok], self.s2_level)
            hx[ok] = hexgrid.encode(cx[ok], cy[ok], self.hex_res)
            gc[ok] = grid.point_cell(cx[ok], cy[ok], self.grid_zoom)

        def masked(a):
            return pa.array(a, pa.uint64(), mask=~ok)

        return (
            batch.append_column("s2_cell", masked(s2))
            .append_column("hex_cell", masked(hx))
            .append_column("grid_cell", masked(gc))
        )
