"""M2 — tag-map fold: HTML meta tags → ``map<string,string>`` column.

The reference folds ``<tag k v>`` XML children into a per-row dict
stored as jsonb (``changesetmd.py:223-225``) and queries it with
containment (``tags ? 'comment'``) and extraction + LIKE
(``tags -> 'created_by' LIKE 'JOSM%'``, reference ``README.md:218-228``).
Here the open-schema map is built from ``<meta name content>`` pairs as
an Arrow MapArray (``pa.MapArray.from_arrays``) so downstream predicates
run as vectorized ``pc.map_lookup`` + ``pc.match_like`` kernels — no
JSON, no Python dicts past this stage.

The pattern compiles once at module import; the callable class is just
a convenient batch UDF — run it as a TASK pool (instances pickle
cheaply), not an actor pool.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_META = re.compile(rb'<meta name="([^"]+)" content="([^"]*)">')


class TagExtractor:
    """(url, html, ...) batches → + ``tags: map<string,string>``."""

    def __init__(self) -> None:
        self.pattern = _META

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys: list[str] = []
        vals: list[str] = []
        offsets = np.empty(len(batch) + 1, dtype=np.int32)
        offsets[0] = 0
        finditer = self.pattern.finditer
        for i, cell in enumerate(batch["html"]):
            buf = cell.as_py()
            if buf:
                for m in finditer(buf):
                    keys.append(m.group(1).decode("utf-8", "replace"))
                    vals.append(m.group(2).decode("utf-8", "replace"))
            offsets[i + 1] = len(keys)
        tags = pa.MapArray.from_arrays(
            pa.array(offsets, pa.int32()),
            pa.array(keys, pa.string()),
            pa.array(vals, pa.string()),
        )
        return batch.append_column("tags", tags)
