"""Deterministic geotagging of rows to sphere points.

Two flavors:

1. ``triplet`` derivation — pure int64 modular arithmetic from an integer
   key, then an IEEE-exact normalize.  Every operation (int mul/mod, double
   divide, sqrt) is correctly rounded and therefore bit-identical between
   NumPy, Spark SQL and DuckDB SQL.  This is what the correctness oracle
   uses: the same derivation is emitted as SQL by :func:`sql_xyz_exprs`.

2. ``splitmix64`` hash of a string image_id -> uniform sphere point with a
   configurable fraction pulled into planted hot-spot caps (Zurich / Sydney /
   SF), to create realistic tile skew for the images table (FIXTURES.md §1).
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64

# --- triplet derivation constants (shared with the SQL oracle) ---
M1, A1, B1 = 2000003, 2654435761, 1013904223
M2, A2, B2 = 1999993, 2246822519, 3266489917
M3, A3, B3 = 1999979, 3266489917, 668265263
RANGE = 2001  # components in [-1000, 1000]


def int_triplet_from_key(key: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """int64 key -> (x0, y0, z0) int64 in [-1000, 1000], never all-zero.

    All math stays within int64 (key < ~2.8e3 * 1e15 safe for keys < 2^42).
    """
    k = np.asarray(key, dtype=np.int64)
    h1 = (k * A1 + B1) % M1
    h2 = (k * A2 + B2) % M2
    h3 = (k * A3 + B3) % M3
    x0 = (h1 % RANGE) - 1000
    y0 = (h2 % RANGE) - 1000
    z0 = (h3 % RANGE) - 1000
    degenerate = (x0 == 0) & (y0 == 0) & (z0 == 0)
    x0 = np.where(degenerate, 1, x0)
    return x0, y0, z0


def wide_unit_xyz(
    key: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Unit vector on a ~2048^3-times finer grid than the triplet
    lattice: three independent triplet draws combined with strides
    4194304/2048/1.  Bit-identical to the shared SQL text
    (__spark_entry__._wide_unit_xyz_sql): int64 modular draws, squares
    and the sum computed in DOUBLE left-to-right, one sqrt, divides."""
    k = np.asarray(key, np.int64)
    a = int_triplet_from_key(k)
    b = int_triplet_from_key((k * 31 + 7) % 999983)
    c = int_triplet_from_key((k * 37 + 11) % 999979)
    comp = [
        (aa * 4194304 + bb * 2048 + cc).astype(np.float64)
        for aa, bb, cc in zip(a, b, c)
    ]
    nrm = np.sqrt(comp[0] * comp[0] + comp[1] * comp[1] + comp[2] * comp[2])
    return comp[0] / nrm, comp[1] / nrm, comp[2] / nrm


def xyz_from_triplet(
    x0: np.ndarray, y0: np.ndarray, z0: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Normalize the integer triplet: exact int sums then one sqrt + divides.

    Operation order is pinned — the SQL oracle mirrors it exactly.
    """
    x0 = np.asarray(x0, np.int64)
    y0 = np.asarray(y0, np.int64)
    z0 = np.asarray(z0, np.int64)
    norm = np.sqrt((x0 * x0 + y0 * y0 + z0 * z0).astype(np.float64))
    return (
        x0.astype(np.float64) / norm,
        y0.astype(np.float64) / norm,
        z0.astype(np.float64) / norm,
    )


def sql_xyz_exprs(key_expr: str) -> dict[str, str]:
    """SQL (DuckDB/Spark-compatible) mirroring the triplet derivation."""
    t = {
        "h1": f"(({key_expr}) * {A1} + {B1}) % {M1}",
        "h2": f"(({key_expr}) * {A2} + {B2}) % {M2}",
        "h3": f"(({key_expr}) * {A3} + {B3}) % {M3}",
    }
    x0 = f"(({t['h1']}) % {RANGE}) - 1000"
    y0 = f"(({t['h2']}) % {RANGE}) - 1000"
    z0 = f"(({t['h3']}) % {RANGE}) - 1000"
    x0g = f"(CASE WHEN ({x0}) = 0 AND ({y0}) = 0 AND ({z0}) = 0 THEN 1 ELSE ({x0}) END)"
    return {"x0": x0g, "y0": f"({y0})", "z0": f"({z0})"}


# --- splitmix64 image geotag ---

_SM_GAMMA = U64(0x9E3779B97F4A7C15)
_SM_M1 = U64(0xBF58476D1CE4E5B9)
_SM_M2 = U64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    z = np.asarray(x, np.uint64) + _SM_GAMMA
    z = (z ^ (z >> U64(30))) * _SM_M1
    z = (z ^ (z >> U64(27))) * _SM_M2
    return z ^ (z >> U64(31))


# planted hot spots: (lat_deg, lng_deg, radius_km) — FIXTURES.md §1
HOTSPOTS = [
    (47.36, 8.55, 50.0),  # Zurich
    (-33.87, 151.20, 50.0),  # Sydney
    (37.77, -122.42, 50.0),  # San Francisco
]
EARTH_KM = 6371.010


def geotag_from_index(
    idx: np.ndarray, hot_fraction: float = 0.2
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (lat_deg, lng_deg) for image row indices.

    ``hot_fraction`` of rows land inside the three hot-spot caps (skew),
    the rest are area-uniform on the sphere.
    """
    idx = np.asarray(idx, np.uint64)
    h = splitmix64(idx)
    h2 = splitmix64(h)
    u1 = (h >> U64(11)).astype(np.float64) * (1.0 / (1 << 53))  # [0,1)
    u2 = (h2 >> U64(11)).astype(np.float64) * (1.0 / (1 << 53))
    sel = splitmix64(h2)
    is_hot = (sel >> U64(11)).astype(np.float64) * (1.0 / (1 << 53)) < hot_fraction
    which = (sel & U64(0xFFFF)).astype(np.int64) % len(HOTSPOTS)

    # uniform sphere: z ~ U(-1,1), lng ~ U(-pi,pi)
    z = 2.0 * u1 - 1.0
    lat_u = np.degrees(np.arcsin(z))
    lng_u = 360.0 * u2 - 180.0

    # hot spot: uniform in a spherical cap around the center
    lat_c = np.array([h_[0] for h_ in HOTSPOTS])[which]
    lng_c = np.array([h_[1] for h_ in HOTSPOTS])[which]
    rad_km = np.array([h_[2] for h_ in HOTSPOTS])[which]
    r_ang = rad_km / EARTH_KM  # radians
    r = r_ang * np.sqrt(u1)  # ~uniform density in small cap
    theta = 2.0 * np.pi * u2
    lat_h = lat_c + np.degrees(r * np.cos(theta))
    lng_h = lng_c + np.degrees(r * np.sin(theta) / np.cos(np.radians(lat_c)))

    lat = np.where(is_hot, lat_h, lat_u)
    lng = np.where(is_hot, lng_h, lng_u)
    return np.clip(lat, -90.0, 90.0), np.clip(lng, -180.0, 180.0)
