"""ANSI-SQL generators that reproduce the geo cell encoders bit-exactly.

These exist so the driver's DuckDB oracle can value-check the own-spec
cell encoders (:mod:`changesetmd_ray.geo.cells`,
:mod:`changesetmd_ray.geo.hexgrid`, :mod:`changesetmd_ray.geo.grid`) —
the engine-side analogue of the reference's GiST index columns
(reference ``queries.py:57-59``) — not just property-test them.

Bit-parity strategy (same discipline as the haversine/mercator oracles
in ``pipelines/queries.py``):

- Every float *constant* (lattice rotation cos/sin, hex size, √3/3,
  π/180) is computed once in numpy and inlined into the SQL via
  ``repr`` — 17 significant digits round-trip to the identical double,
  so both engines start from the same bits.
- Per-row math mirrors the numpy expressions operation-for-operation;
  +,-,*,/ and sqrt are correctly rounded under IEEE-754 in both
  engines, so identical inputs give identical doubles.
- Per-row trig (sin/cos for the S2 face projection) relies on numpy
  and DuckDB sharing libm behavior on this platform — verified
  bit-exact over the full sf0.1 grid (100k points, 0 mismatches).
- The S2 Hilbert encode is pure integer math: the 1024-entry
  position-lookup table from ``cells._build_lookups()`` is inlined as a
  SQL list literal and the 8 4-bit rounds are unrolled as chained CTEs.
- Cube-rounding in the hex encoder uses round-to-nearest on values with
  measured ≥5e-6 distance from .5 ties, so DuckDB's half-away and
  numpy's half-even agree.

Packed ids exceed int64 (res<<60), so packing runs in HUGEINT and casts
to UBIGINT at the end — pandas dtype uint64 on both sides.
"""

from __future__ import annotations

import numpy as np

from changesetmd_ray.geo import cells, grid, hexgrid

_LUT = "[" + ",".join(str(int(v)) for v in cells._LOOKUP_POS) + "]"
_DEG = repr(float(np.pi / 180.0))


def grid_cell_expr(zoom: int, lon: str = "lon", lat: str = "lat") -> str:
    """SQL expression for ``grid.point_cell(lon, lat, zoom)`` (ubigint)."""
    nx, ny = grid.grid_dims(zoom)
    return (
        f"cast(cast({zoom} as ubigint)*{1 << 58}"
        f" + cast(least(greatest(cast(floor(({lat} + 90.0)/180.0*{ny}) as bigint), 0), {ny - 1}) as ubigint)*{1 << 29}"
        f" + cast(least(greatest(cast(floor(({lon} + 180.0)/360.0*{nx}) as bigint), 0), {nx - 1}) as ubigint)"
        f" as ubigint)"
    )


def cells_select(
    src: str,
    keys: list[str],
    s2_level: int | None = None,
    hex_res: int | None = None,
    grid_zoom: int | None = None,
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """A parenthesized subquery selecting ``keys..`` plus the requested
    cell columns (``s2_cell``/``hex_cell``/``grid_cell``) from ``src``
    (itself a relation/subquery exposing ``keys``, ``lon``, ``lat``).
    """
    ks = ", ".join(keys)
    ctes: list[str] = [f"__src as (select {ks}, {lon} as lon, {lat} as lat from {src})"]
    outs: list[str] = []
    final_src = "__src"

    if hex_res is not None:
        rot = hexgrid._res_rot(hex_res)
        c = repr(float(np.cos(-rot)))
        s = repr(float(np.sin(-rot)))
        size = repr(hexgrid._res_size(hex_res))
        a = repr(float(np.sqrt(3.0) / 3.0))
        b = repr(1.0 / 3.0)
        tt = repr(2.0 / 3.0)
        # axial coords, cube rounding (fix_x = dx>dy & dx>dz; fix_z uses
        # the UNfixed rx because it only fires when fix_x didn't)
        ctes.append(
            f"""__hex_ax as (
  select {ks},
    ({a}*(lon*{c} - lat*{s}) - {b}*(lon*{s} + lat*{c}))/{size} as fq,
    ({tt}*(lon*{s} + lat*{c}))/{size} as fr
  from __src
), __hex_rnd as (
  select {ks}, fq, fr, (-fq - fr) as fy,
    round(fq) as rx, round(-fq - fr) as ry, round(fr) as rz from __hex_ax
), __hex_dd as (
  select {ks}, rx, ry, rz,
    abs(rx - fq) as dx, abs(ry - fy) as dy, abs(rz - fr) as dz from __hex_rnd
), __hex as (
  select {ks},
    cast(cast({hex_res} as hugeint)*{1 << 60}
      + (cast(case when dx > dy and dx > dz then -ry - rz else rx end as hugeint) + {1 << 29})*{1 << 30}
      + (cast(case when (not (dx > dy and dx > dz)) and dz > dy then -rx - ry else rz end as hugeint) + {1 << 29})
      as ubigint) as hex_cell
  from __hex_dd
)"""
        )
        outs.append("hex_cell")

    if s2_level is not None:
        ctes.append(
            f"""__s2_xyz as (
  select {ks},
    cos(lat*{_DEG})*cos(lon*{_DEG}) as x,
    cos(lat*{_DEG})*sin(lon*{_DEG}) as y,
    sin(lat*{_DEG}) as z
  from __src
), __s2_fuv as (
  select {ks},
    case when abs(x) >= abs(y)
         then (case when abs(x) >= abs(z) then (case when x < 0 then 3 else 0 end)
                    else (case when z < 0 then 5 else 2 end) end)
         else (case when abs(y) >= abs(z) then (case when y < 0 then 4 else 1 end)
                    else (case when z < 0 then 5 else 2 end) end) end as face,
    x, y, z
  from __s2_xyz
), __s2_uv as (
  select {ks}, face,
    case face when 0 then y/x when 1 then (-x)/y when 2 then (-x)/z
              when 3 then z/x when 4 then z/y else (-y)/z end as u,
    case face when 0 then z/x when 1 then z/y when 2 then (-y)/z
              when 3 then y/x when 4 then (-x)/y else (-x)/z end as v
  from __s2_fuv
), __s2_st as (
  select {ks}, face,
    case when u >= 0 then 0.5*sqrt(1.0 + 3.0*u) else 1.0 - 0.5*sqrt(1.0 - 3.0*u) end as s,
    case when v >= 0 then 0.5*sqrt(1.0 + 3.0*v) else 1.0 - 0.5*sqrt(1.0 - 3.0*v) end as t
  from __s2_uv
), __s2_ij as (
  select {ks}, face,
    least(greatest(cast(floor(s*1073741824.0) as bigint), 0), 1073741823) as i,
    least(greatest(cast(floor(t*1073741824.0) as bigint), 0), 1073741823) as j
  from __s2_st
), __s2_lut as (select {_LUT} as l)"""
        )
        prev = "__s2_h"
        ctes.append(
            f"{prev} as (select {ks}, face, i, j, cast(face % 2 as bigint) as bits,"
            f" cast(0 as hugeint) as acc from __s2_ij, __s2_lut)"
        )
        for k in range(7, -1, -1):
            nxt = f"__s2_g{k}"
            idx = f"(bits + (((i // {1 << (4 * k)}) % 16)*16 + ((j // {1 << (4 * k)}) % 16))*4) + 1"
            ctes.append(
                f"{nxt} as (select {ks}, face, i, j,"
                f" (l[{idx}]) % 4 as bits,"
                f" acc + cast((l[{idx}]) // 4 as hugeint) * {1 << (8 * k)} as acc"
                f" from {prev}, __s2_lut)"
            )
            prev = nxt
        half = 1 << (2 * (30 - s2_level))
        ctes.append(
            f"__s2 as (select {ks},"
            f" cast((((cast(face as hugeint)*{1 << 60} + acc)*2 + 1) // {2 * half}) * {2 * half} + {half}"
            f" as ubigint) as s2_cell from {prev})"
        )
        outs.append("s2_cell")

    if grid_zoom is not None:
        ctes.append(
            f"__grid as (select {ks}, {grid_cell_expr(grid_zoom)} as grid_cell from __src)"
        )
        outs.append("grid_cell")

    # join the produced CTEs back on the key columns
    produced = [
        t
        for t, on in (("__hex", hex_res), ("__s2", s2_level), ("__grid", grid_zoom))
        if on is not None
    ]
    using = ", ".join(keys)
    join_sql = final_src + "".join(f" join {t} using ({using})" for t in produced)
    sel = ", ".join([f"__src.{k}" for k in keys] + outs)
    return f"(with {', '.join(ctes)} select {sel} from {join_sql})"
