"""Great-circle distance, vectorized."""

from __future__ import annotations

import numpy as np

from changesetmd_ray.geo.envelope import EARTH_RADIUS_M


def haversine_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Haversine distance in meters; broadcasts over numpy arrays.

    Used for exact kNN verification after cell-ring candidate generation
    (SURVEY.md §2.4 J4) and by the brute-force oracle.
    """
    lon1 = np.radians(np.asarray(lon1, dtype=np.float64))
    lat1 = np.radians(np.asarray(lat1, dtype=np.float64))
    lon2 = np.radians(np.asarray(lon2, dtype=np.float64))
    lat2 = np.radians(np.asarray(lat2, dtype=np.float64))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    a = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))
