"""HTML → geo-signal extraction stage (the engine's analogue of the
reference's streaming XML parse, ``changesetmd.py:208-271``).

The reference walks ``<changeset>`` elements pulling 11 attributes into a
row tuple (``changesetmd.py:239-254``); this stage walks a page's HTML
bytes pulling geo signals into a ``points`` list column and a
changeset-style bbox (min/max lon/lat), while passing ``text`` through
**byte-identical** (the north_rule per-row invariant): the Arrow column
is never touched, just re-attached to the output table zero-copy.

Recognized signals (all planted by the fixture generator):
- ``<meta name="geo.position" content="LAT;LON">``
- ``<meta name="ICBM" content="LAT, LON">``
- ``<span data-lat="LAT" data-lon="LON">``

A callable class → Ray actor pool: the combined regex compiles once per
actor in ``__init__`` (SURVEY.md §2.3 T2 pattern), scanning raw bytes in
document order.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from changesetmd_ray.geo.envelope import normalize_bbox

# one alternation so matches come back in document order
_PATTERN = re.compile(
    rb'<meta name="geo\.position" content="(-?[0-9]+\.[0-9]+);(-?[0-9]+\.[0-9]+)">'
    rb'|<meta name="ICBM" content="(-?[0-9]+\.[0-9]+), (-?[0-9]+\.[0-9]+)">'
    rb'|data-lat="(-?[0-9]+\.[0-9]+)" data-lon="(-?[0-9]+\.[0-9]+)"'
)

POINTS_TYPE = pa.list_(pa.struct([("lon", pa.float64()), ("lat", pa.float64())]))


class GeoExtractor:
    """Stateful batch UDF; state = the compiled pattern."""

    def __init__(self) -> None:
        self.pattern = _PATTERN

    def __call__(self, batch: pa.Table) -> pa.Table:
        html = batch["html"].combine_chunks()
        n = len(html)
        # ONE regex scan over the column's contiguous Arrow values buffer
        # (no per-row as_py copies); match offsets map back to rows via
        # searchsorted on the value offsets. A match straddling two
        # documents' boundary is rejected by the end<=row_end check —
        # and triggers the exact per-row re-scan, because finditer
        # already consumed the straddled span and could have skipped a
        # real match overlapping it in the next document.
        off_dtype = (
            np.int64
            if pa.types.is_large_binary(html.type) or pa.types.is_large_string(html.type)
            else np.int32
        )
        val_off = np.frombuffer(html.buffers()[1], dtype=off_dtype)[
            html.offset : html.offset + n + 1
        ].astype(np.int64)
        rows: list[int] = []
        lats: list[float] = []
        lons: list[float] = []
        if n and val_off[-1] > val_off[0]:
            data = memoryview(html.buffers()[2])[val_off[0] : val_off[-1]]
            base = int(val_off[0])
            starts: list[int] = []
            ends: list[int] = []
            for m in self.pattern.finditer(data):
                la, lo = (g for g in m.groups() if g is not None)
                starts.append(m.start())
                ends.append(m.end())
                lats.append(float(la))
                lons.append(float(lo))
            if starts:
                # ONE vectorized row-mapping + boundary mask instead of a
                # numpy call per match
                st = np.asarray(starts, dtype=np.int64) + base
                en = np.asarray(ends, dtype=np.int64) + base
                row_arr = np.searchsorted(val_off, st, "right") - 1
                ok_m = en <= val_off[row_arr + 1]  # reject boundary straddles
                if ok_m.all():
                    rows = row_arr.tolist()
                else:
                    # rare exact path: scan each row's own byte slice so
                    # no consumed straddle span can hide a real match
                    rows, lats, lons = [], [], []
                    rel = (val_off - base).tolist()
                    for r in range(n):
                        for m in self.pattern.finditer(data[rel[r] : rel[r + 1]]):
                            la, lo = (g for g in m.groups() if g is not None)
                            rows.append(r)
                            lats.append(float(la))
                            lons.append(float(lo))
        # forward scan ⇒ rows are nondecreasing ⇒ document order per row
        counts_per_row = np.bincount(
            np.asarray(rows, dtype=np.int64), minlength=n
        ) if rows else np.zeros(n, dtype=np.int64)
        offsets = np.concatenate([[0], np.cumsum(counts_per_row)]).astype(np.int32)

        lon_arr = np.asarray(lons, dtype=np.float64)
        lat_arr = np.asarray(lats, dtype=np.float64)
        points = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            pa.StructArray.from_arrays(
                [pa.array(lon_arr, pa.float64()), pa.array(lat_arr, pa.float64())],
                ["lon", "lat"],
            ),
        )
        counts = np.diff(offsets)
        has = counts > 0

        # per-row raw min/max over the flat coord arrays (vectorized
        # segmented reduce via np.minimum/maximum.reduceat on non-empty rows)
        min_lon = np.full(len(counts), np.nan)
        min_lat = np.full(len(counts), np.nan)
        max_lon = np.full(len(counts), np.nan)
        max_lat = np.full(len(counts), np.nan)
        if has.any():
            starts = offsets[:-1][has].astype(np.int64)
            min_lon[has] = np.minimum.reduceat(lon_arr, starts)
            max_lon[has] = np.maximum.reduceat(lon_arr, starts)
            min_lat[has] = np.minimum.reduceat(lat_arr, starts)
            max_lat[has] = np.maximum.reduceat(lat_arr, starts)
            # reduceat quirk: a start equal to the next start reduces a
            # single element — fine here because `has` rows are non-empty
            # and consecutive starts of non-empty rows never coincide.

        # ST_MakeValid analogue: clamp out-of-range lat (README.md:187-188)
        lo_x, lo_y, hi_x, hi_y, geom = normalize_bbox(min_lon, min_lat, max_lon, max_lat)

        def fcol(a):
            return pa.array(a, pa.float64(), from_pandas=True)  # NaN → null

        cols = {"url": batch["url"]}
        # byte-identical passthrough, zero-copy — but presence-optional,
        # so a caller that pruned its read (columns=) to exactly what it
        # outputs doesn't pay I/O for columns the query never emits
        for passthrough in ("warc_ts", "text", "lang"):
            if passthrough in batch.column_names:
                cols[passthrough] = batch[passthrough]
        cols |= {
            "points": points,
            "n_points": pa.array(counts, pa.int32()),
            "min_lon": fcol(lo_x),
            "min_lat": fcol(lo_y),
            "max_lon": fcol(hi_x),
            "max_lat": fcol(hi_y),
            "geom_class": pa.array(geom, pa.int8()),
        }
        if "shard_id" in batch.column_names:
            cols["shard_id"] = batch["shard_id"]
        return pa.table(cols)
