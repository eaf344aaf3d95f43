"""Coordinate transforms: (lat,lng) <-> XYZ <-> (face,u,v) <-> (s,t) <-> (i,j).

Vectorized NumPy re-implementations of the published S2 coordinate system
(reference: s2coords.h:280-438, s2coords.cc:28-73, s2latlng.cc:68-77).
Quadratic projection throughout (the reference's shipped default,
s2coords.h:291).  All ops are plain IEEE double +,-,*,/,sqrt so results are
bit-identical to any other strict-IEEE implementation of the same formula
order (the reference compiles with fp-contract off for this reason).
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
LIMIT_IJ = 1 << MAX_LEVEL  # 2^30
MAX_SI_TI = 1 << (MAX_LEVEL + 1)  # 2^31

# kFaceUVWAxes (s2coords_internal.h:84-123): [face][axis(u,v,w)][xyz]
FACE_UVW_AXES = np.array(
    [
        [[0, 1, 0], [0, 0, 1], [1, 0, 0]],
        [[-1, 0, 0], [0, 0, 1], [0, 1, 0]],
        [[-1, 0, 0], [0, -1, 0], [0, 0, 1]],
        [[0, 0, -1], [0, -1, 0], [-1, 0, 0]],
        [[0, 0, -1], [1, 0, 0], [0, -1, 0]],
        [[0, 1, 0], [1, 0, 0], [0, 0, -1]],
    ],
    dtype=np.float64,
)

# kFaceUVWFaces (s2coords_internal.h:125-133): [face][axis][direction]
FACE_UVW_FACES = np.array(
    [
        [[4, 1], [5, 2], [3, 0]],
        [[0, 3], [5, 2], [4, 1]],
        [[0, 3], [1, 4], [5, 2]],
        [[2, 5], [1, 4], [0, 3]],
        [[2, 5], [3, 0], [1, 4]],
        [[4, 1], [3, 0], [2, 5]],
    ],
    dtype=np.int64,
)


def latlng_to_xyz(lat_rad: np.ndarray, lng_rad: np.ndarray) -> tuple[np.ndarray, ...]:
    """S2LatLng::ToPoint (s2latlng.cc:68-77). Radians in, unit vector out."""
    cosphi = np.cos(lat_rad)
    return np.cos(lng_rad) * cosphi, np.sin(lng_rad) * cosphi, np.sin(lat_rad)


def xyz_to_latlng(x: np.ndarray, y: np.ndarray, z: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Latitude/Longitude of a (not necessarily unit) vector (s2latlng.h:235-250)."""
    lat = np.arctan2(z, np.sqrt(x * x + y * y))
    lng = np.arctan2(y, x)
    return lat, lng


def get_face(x: np.ndarray, y: np.ndarray, z: np.ndarray) -> np.ndarray:
    """GetFace (s2coords.h:409-414): LargestAbsComponent, +3 if negative.

    Tie-break replicates vector.h:508-513 exactly:
    ax > ay ? (ax > az ? 0 : 2) : (ay > az ? 1 : 2).
    """
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax > ay, np.where(ax > az, 0, 2), np.where(ay > az, 1, 2))
    comp = np.choose(face, [x, y, z])
    return np.where(comp < 0, face + 3, face).astype(np.int64)


# per-face numerator/denominator axis + sign tables for ValidFaceXYZtoUV
# (transcribes the 6-case ratio table of s2coords.h:389-404; multiplying
# the numerator by +/-1.0 before the divide is IEEE-exact, so this gather
# form is bit-identical to the branch form)
_UV_U_AXIS = np.array([1, 0, 0, 2, 2, 1], dtype=np.int64)
_UV_U_SIGN = np.array([1.0, -1.0, -1.0, 1.0, 1.0, -1.0])
_UV_V_AXIS = np.array([2, 2, 1, 1, 0, 0], dtype=np.int64)
_UV_V_SIGN = np.array([1.0, 1.0, -1.0, 1.0, -1.0, -1.0])
_UV_D_AXIS = np.array([0, 1, 2, 0, 1, 2], dtype=np.int64)


def valid_face_xyz_to_uv(
    face: np.ndarray, x: np.ndarray, y: np.ndarray, z: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """ValidFaceXYZtoUV (s2coords.h:389-404): per-face coordinate ratios.

    Gather form: three fancy-indexed component picks + two divides instead
    of twelve masked divides (the old branch form survives in the
    regression test tests/test_cellid.py)."""
    face, x, y, z = np.broadcast_arrays(
        np.asarray(face, np.int64),
        np.asarray(x, np.float64),
        np.asarray(y, np.float64),
        np.asarray(z, np.float64),
    )
    P = np.stack([x.ravel(), y.ravel(), z.ravel()])
    f = face.ravel()
    ar = np.arange(f.size)
    d = P[_UV_D_AXIS[f], ar]
    u = _UV_U_SIGN[f] * P[_UV_U_AXIS[f], ar] / d
    v = _UV_V_SIGN[f] * P[_UV_V_AXIS[f], ar] / d
    return u.reshape(face.shape), v.reshape(face.shape)


def xyz_to_face_uv(
    x: np.ndarray, y: np.ndarray, z: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    face = get_face(x, y, z)
    u, v = valid_face_xyz_to_uv(face, x, y, z)
    return face, u, v


def face_uv_to_xyz(
    face: np.ndarray, u: np.ndarray, v: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """FaceUVtoXYZ (s2coords.h:368-383) — unnormalized direction vector."""
    one = np.ones_like(u)
    xs = np.stack([one, -u, -u, -one, v, v])
    ys = np.stack([u, one, -v, -v, -one, u])
    zs = np.stack([v, v, one, -u, -u, -one])
    idx = np.asarray(face, dtype=np.int64)
    take = np.arange(idx.size)
    shape = np.broadcast(face, u).shape
    return (
        xs.reshape(6, -1)[idx.ravel(), take].reshape(shape),
        ys.reshape(6, -1)[idx.ravel(), take].reshape(shape),
        zs.reshape(6, -1)[idx.ravel(), take].reshape(shape),
    )


def st_to_uv(s: np.ndarray) -> np.ndarray:
    """Quadratic STtoUV (s2coords.h:324-327)."""
    s = np.asarray(s, dtype=np.float64)
    hi = (1 / 3.0) * (4 * s * s - 1)
    lo = (1 / 3.0) * (1 - 4 * (1 - s) * (1 - s))
    return np.where(s >= 0.5, hi, lo)


def uv_to_st(u: np.ndarray) -> np.ndarray:
    """Quadratic UVtoST (s2coords.h:329-332)."""
    u = np.asarray(u, dtype=np.float64)
    with np.errstate(invalid="ignore"):
        hi = 0.5 * np.sqrt(1 + 3 * u)
        lo = 1 - 0.5 * np.sqrt(1 - 3 * u)
    return np.where(u >= 0, hi, lo)


def st_to_ij(s: np.ndarray) -> np.ndarray:
    """STtoIJ (s2coords.h:345-356): clamp-floor to the 2^30 leaf grid."""
    s = np.asarray(s, dtype=np.float64)
    scaled = LIMIT_IJ * s
    ij = np.minimum(scaled, float(LIMIT_IJ - 1)).astype(np.int64)
    return np.where(s > 0, ij, 0)


def ij_to_st_min(i: np.ndarray) -> np.ndarray:
    """IJtoSTMin (s2coords.h:340-343)."""
    return (1.0 / LIMIT_IJ) * np.asarray(i, dtype=np.float64)


def si_ti_to_st(si: np.ndarray) -> np.ndarray:
    """SiTitoST (s2coords.h:358-361)."""
    return (1.0 / MAX_SI_TI) * np.asarray(si, dtype=np.float64)


def st_to_si_ti(s: np.ndarray) -> np.ndarray:
    """STtoSiTi (s2coords.h:363-366): round-half-even to the 2^31 grid."""
    return np.rint(np.asarray(s, dtype=np.float64) * MAX_SI_TI).astype(np.int64)


def face_si_ti_to_xyz(
    face: np.ndarray, si: np.ndarray, ti: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """FaceSiTitoXYZ (s2coords.cc:67-73) — unnormalized cell-center vector."""
    u = st_to_uv(si_ti_to_st(si))
    v = st_to_uv(si_ti_to_st(ti))
    return face_uv_to_xyz(face, u, v)


def normalize(x: np.ndarray, y: np.ndarray, z: np.ndarray) -> tuple[np.ndarray, ...]:
    n = np.sqrt(x * x + y * y + z * z)
    return x / n, y / n, z / n
