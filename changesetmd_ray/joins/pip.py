"""J2 — broadcast point-in-polygon join (SURVEY.md §2.4).

The reference's geofilter runs ``ST_CoveredBy`` / ``ST_Contains`` /
``ST_Intersects`` against a *small* polygon set through a GiST index
(reference ``queries.py:57-59``, ``README.md:230-234``). The Ray-native
shape is a broadcast join: the polygon side is prepared ONCE on the
driver (numpy ring arrays + an STRtree over polygon bboxes), put into
the object store ONCE (``ray.put``), and every probe actor reads it
zero-copy in ``__init__`` — it is never re-shipped per batch. The big
point side streams through ``map_batches`` with backpressure; output is
the (point, polygon) pair table.

Scale notes: the broadcast side must fit in a worker heap (millions of
vertices is fine); the point side is unbounded. For a *large* polygon
side, use :func:`changesetmd_ray.joins.bbox.bbox_join` on the polygon
bboxes as the candidate stage instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from changesetmd_ray.geo.pip import (
    BOUNDARY,
    INTERIOR,
    classify_points_cap,
    classify_points_polygon,
    ring_bbox,
)
from changesetmd_ray.geo.strtree import STRtree


def prepare_polygons(polygons: pa.Table) -> dict:
    """Driver-side broadcast package: per-polygon numpy rings + an
    STRtree over polygon bboxes (candidate pruning, the GiST analogue).

    Accepts the fixtures polygon schema (``poly_id, kind, ring,
    lat_threshold``; kind ∈ ring|cap_n|cap_s). Antimeridian-crossing
    rings are stored unwrapped (lon beyond ±180); their bbox stays in the
    unwrapped frame and probes are additionally tested shifted ±360 by
    the classify kernel, so the tree query must use the shifted probes
    too — handled in :class:`PipProbe`.
    """
    polys = []
    boxes = []
    for row in polygons.to_pylist():
        d = {
            "poly_id": int(row["poly_id"]),
            "kind": row["kind"],
            "lat_threshold": row["lat_threshold"],
            "x": None,
            "y": None,
        }
        if row["kind"] == "ring":
            d["x"] = np.array([p["lon"] for p in row["ring"]], dtype=np.float64)
            d["y"] = np.array([p["lat"] for p in row["ring"]], dtype=np.float64)
            boxes.append(ring_bbox(d["x"], d["y"]))
        elif row["kind"] == "cap_n":
            boxes.append((-360.0, float(row["lat_threshold"]), 360.0, 90.0))
        else:  # cap_s
            boxes.append((-360.0, -90.0, 360.0, float(row["lat_threshold"])))
        polys.append(d)
    b = np.array(boxes, dtype=np.float64).reshape(-1, 4)
    tree = STRtree(b[:, 0], b[:, 1], b[:, 2], b[:, 3]) if len(polys) else None
    return {"polys": polys, "tree": tree}


class PipProbe:
    """Actor-pool batch UDF: probes each point batch against the
    broadcast polygon package. State (the ``ray.get`` of the broadcast
    ref) is resolved once per actor in ``__init__`` (SURVEY.md §2.3 T3).
    """

    def __init__(self, prep_ref, predicate: str = "intersects", id_col: str = "id",
                 lon_col: str = "lon", lat_col: str = "lat"):
        self.prep = ray.get(prep_ref) if isinstance(prep_ref, ray.ObjectRef) else prep_ref
        if predicate not in ("intersects", "coveredby", "contains"):
            raise ValueError(f"unknown predicate {predicate!r}")
        self.want_boundary = predicate != "contains"
        self.id_col = id_col
        self.lon_col = lon_col
        self.lat_col = lat_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        px = batch[self.lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        py = batch[self.lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~(np.isnan(px) | np.isnan(py))

        out_pid: list[np.ndarray] = []
        out_poly: list[np.ndarray] = []
        tree = self.prep["tree"]
        polys = self.prep["polys"]
        if tree is not None and ok.any():
            idx = np.nonzero(ok)[0]
            qx, qy = px[idx], py[idx]
            # candidate (probe, polygon) pairs; probe shifted copies so
            # unwrapped antimeridian rings see their neighbours
            cand_q, cand_p = [], []
            for shift in (0.0, 360.0, -360.0):
                qi, pi = tree.query_points(qx + shift, qy)
                cand_q.append(qi)
                cand_p.append(pi)
            qi = np.concatenate(cand_q)
            pi = np.concatenate(cand_p)
            if len(qi):
                # dedup (probe, poly) candidates from the shifted queries
                key = qi * np.int64(len(polys)) + pi
                _, first = np.unique(key, return_index=True)
                qi, pi = qi[first], pi[first]
                # exact test grouped by polygon (small side ⇒ short loop;
                # per-polygon work fully vectorized)
                order = np.argsort(pi, kind="stable")
                qi, pi = qi[order], pi[order]
                bounds = np.searchsorted(pi, np.arange(len(polys) + 1))
                for p in range(len(polys)):
                    s, e = bounds[p], bounds[p + 1]
                    if s == e:
                        continue
                    sel = idx[qi[s:e]]
                    poly = polys[p]
                    if poly["kind"] == "ring":
                        cls = classify_points_polygon(px[sel], py[sel], poly["x"], poly["y"])
                    else:
                        cls = classify_points_cap(
                            px[sel], py[sel], poly["lat_threshold"], north=poly["kind"] == "cap_n"
                        )
                    hit = (cls == INTERIOR) | (self.want_boundary & (cls == BOUNDARY))
                    out_pid.append(ids[sel[hit]])
                    out_poly.append(np.full(int(hit.sum()), poly["poly_id"], dtype=np.int64))

        pid = np.concatenate(out_pid) if out_pid else np.empty(0, dtype=ids.dtype)
        pol = np.concatenate(out_poly) if out_poly else np.empty(0, dtype=np.int64)
        return pa.table({self.id_col: pa.array(pid), "poly_id": pa.array(pol, pa.int64())})


def pip_join(
    points,
    polygons: pa.Table,
    *,
    predicate: str = "intersects",
    id_col: str = "id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    batch_size: int = 8192,
    concurrency=(1, 8),
):
    """``points`` (Dataset with id/lon/lat columns) ⋈ ``polygons``
    (small driver-side table) → Dataset of ``(id_col, poly_id)`` pairs
    under the PostGIS predicate. Broadcast join: polygons shipped once
    via ``ray.put``."""
    prep_ref = ray.put(prepare_polygons(polygons))
    return points.map_batches(
        PipProbe,
        fn_constructor_kwargs={
            "prep_ref": prep_ref,
            "predicate": predicate,
            "id_col": id_col,
            "lon_col": lon_col,
            "lat_col": lat_col,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
