"""S2 point compression codec (SURVEY.md §2.3).

Wire-format-compatible reimplementation of S2EncodePointsCompressed /
S2DecodePointsCompressed (s2point_compression.cc:317-391): a sequence
of points assumed to be level-``level`` cell centers is stored as

* run-length encoded faces: one ``varint64(6*count + face)`` per run
  (FaceRun::Encode, cc:47-66);
* (pi, qi) = (si, ti) >> (kMaxCellLevel + 1 - level) (SiTitoPiQi,
  cc:182-191, with the si = kMaxSiTi clamp);
* 2nd-derivative coding of the pi and qi sequences with int32
  wraparound (util/coding/nth-derivative.h) — first value raw, second
  value a first difference, the rest second differences;
* the first (pi, qi) bit-interleaved (pi on even bits — util/bits/
  bit-interleave.cc LUT) and stored fixed-length in
  ``(level + 7) / 8 * 2`` little-endian bytes (cc:208-230);
* every later pair ZigZag-encoded (transforms.h:42-50), interleaved,
  and stored as one varint64 (cc:232-252);
* points whose cell_level != level are appended exactly:
  ``varint32(count)`` then per point ``varint32(index)`` + 24 raw
  little-endian bytes of xyz (cc:317-341).

XYZtoFaceSiTi (s2coords.cc:83-107) — including the exact decoded-center
equality that determines ``cell_level`` — is implemented here because
the encoder needs it and kernels/coords.py only had the forward
direction.

Spark usage: per-chain vertex streams stored as compact ``binary``
columns (operators/pointcodec.py); the C++ Encoder/Decoder streaming
interface is a pointer-into-buffer concern that Arrow batches replace.
"""

from __future__ import annotations

import numpy as np

from .cellcodec import _read_varint64, _varint64
from .coords import (
    face_si_ti_to_xyz,
    normalize,
    st_to_si_ti,
    uv_to_st,
    xyz_to_face_uv,
)

MAX_LEVEL = 30
MAX_SI_TI = 1 << (MAX_LEVEL + 1)
_U32 = np.uint64(0xFFFFFFFF)

_SPREAD_MASKS = [
    (np.uint64(16), np.uint64(0x0000FFFF0000FFFF)),
    (np.uint64(8), np.uint64(0x00FF00FF00FF00FF)),
    (np.uint64(4), np.uint64(0x0F0F0F0F0F0F0F0F)),
    (np.uint64(2), np.uint64(0x3333333333333333)),
    (np.uint64(1), np.uint64(0x5555555555555555)),
]


def _spread(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.uint64) & _U32
    for sh, mask in _SPREAD_MASKS:
        x = (x | (x << sh)) & mask
    return x


def interleave_uint32(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """util_bits::InterleaveUint32: a on even bits, b on odd bits."""
    return _spread(a) | (_spread(b) << np.uint64(1))


def _unspread(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.uint64) & np.uint64(0x5555555555555555)
    x = (x | (x >> np.uint64(1))) & np.uint64(0x3333333333333333)
    x = (x | (x >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    return (x | (x >> np.uint64(16))) & _U32


def deinterleave_uint32(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    v = np.asarray(v, np.uint64)
    return _unspread(v), _unspread(v >> np.uint64(1))


def zigzag_encode(n: np.ndarray) -> np.ndarray:
    """transforms.h:42: (n << 1) ^ -(n >> 31) on uint32."""
    u = np.asarray(n, np.int64).astype(np.uint32)
    sign = u >> np.uint32(31)
    return ((u << np.uint32(1)) ^ (np.uint32(0) - sign)).astype(np.uint32)


def zigzag_decode(u: np.ndarray) -> np.ndarray:
    u = np.asarray(u, np.uint32)
    return ((u >> np.uint32(1)) ^ (np.uint32(0) - (u & np.uint32(1)))).view(
        np.int32
    )


def nth_derivative2_encode(v: np.ndarray) -> np.ndarray:
    """Order-2 NthDerivativeCoder over a whole sequence (int32 wrap)."""
    v = np.asarray(v, np.int64).astype(np.uint32)
    out = v.copy()
    if len(v) > 1:
        d1 = v[1:] - v[:-1]
        out[1] = d1[0]
        if len(v) > 2:
            out[2:] = d1[1:] - d1[:-1]
    return out.view(np.int32)


def nth_derivative2_decode(d: np.ndarray) -> np.ndarray:
    d = np.asarray(d, np.int64).astype(np.uint32)
    if len(d) > 1:
        d1 = np.cumsum(d[1:].astype(np.uint64)).astype(np.uint32)
        return np.concatenate(
            [d[:1], d[:1] + np.cumsum(d1.astype(np.uint64)).astype(np.uint32)]
        ).view(np.int32)
    return d.view(np.int32)


def _varint32(x: int) -> bytes:
    return _varint64(x & 0xFFFFFFFF)


def xyz_to_face_si_ti(
    x: np.ndarray, y: np.ndarray, z: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """XYZtoFaceSiTi (s2coords.cc:83-107): -> (face, si, ti, cell_level)
    with cell_level = -1 unless the point is EXACTLY (bit-for-bit) the
    normalized center of a cell at that level."""
    face, u, v = xyz_to_face_uv(x, y, z)
    si = st_to_si_ti(uv_to_st(u))
    ti = st_to_si_ti(uv_to_st(v))
    ctz_s = np.zeros(len(si), np.int64)
    ctz_t = np.zeros(len(ti), np.int64)
    for arr, out in ((si, ctz_s), (ti, ctz_t)):
        a = (np.asarray(arr, np.int64) | MAX_SI_TI).astype(np.uint64)
        low = a & (np.uint64(0) - a)
        # bit_length - 1 of an exact power of two
        out[:] = np.frexp(low.astype(np.float64))[1] - 1
    level = MAX_LEVEL - ctz_s
    level = np.where(ctz_s != ctz_t, -1, level)
    level = np.where(level < 0, -1, level)
    cx, cy, cz = normalize(*face_si_ti_to_xyz(face, si, ti))
    exact = (cx == x) & (cy == y) & (cz == z)
    return face, si, ti, np.where(exact, level, -1)


def si_ti_to_pi_qi(si: np.ndarray, level: int) -> np.ndarray:
    """SiTitoPiQi (s2point_compression.cc:182-191)."""
    si = np.minimum(np.asarray(si, np.int64), MAX_SI_TI - 1)
    return si >> (MAX_LEVEL + 1 - level)


def pi_qi_to_xyz(
    face: np.ndarray, pi: np.ndarray, qi: np.ndarray, level: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """FacePiQitoXYZ (cc:202-206): center of the level-``level`` cell."""
    from .coords import st_to_uv

    s = (np.asarray(pi, np.float64) + 0.5) / (1 << level)
    t = (np.asarray(qi, np.float64) + 0.5) / (1 << level)
    from .coords import face_uv_to_xyz

    return normalize(*face_uv_to_xyz(face, st_to_uv(s), st_to_uv(t)))


def encode_points_compressed(
    xyz: np.ndarray,
    face: np.ndarray,
    si: np.ndarray,
    ti: np.ndarray,
    cell_level: np.ndarray,
    level: int,
) -> bytes:
    """S2EncodePointsCompressed (cc:317-341).  xyz: (n, 3) float64."""
    n = len(face)
    out = bytearray()
    # face runs
    i = 0
    while i < n:
        j = i
        while j < n and face[j] == face[i]:
            j += 1
        out += _varint64(6 * (j - i) + int(face[i]))
        i = j
    # derivative-coded interleaved (pi, qi)
    pi = si_ti_to_pi_qi(si, level)
    qi = si_ti_to_pi_qi(ti, level)
    dp = nth_derivative2_encode(pi)
    dq = nth_derivative2_encode(qi)
    if n:
        first = int(
            interleave_uint32(
                np.asarray([dp[0]], np.int64).astype(np.uint32),
                np.asarray([dq[0]], np.int64).astype(np.uint32),
            )[0]
        )
        nbytes = (level + 7) // 8 * 2
        out += first.to_bytes(8, "little")[:nbytes]
        zz = interleave_uint32(zigzag_encode(dp[1:]), zigzag_encode(dq[1:]))
        for v in zz:
            out += _varint64(int(v))
    # off-center exact points
    off = np.nonzero(np.asarray(cell_level) != level)[0]
    out += _varint32(len(off))
    for idx in off:
        out += _varint32(int(idx))
        out += np.ascontiguousarray(xyz[idx], "<f8").tobytes()
    return bytes(out)


def decode_points_compressed(buf, level: int, n: int) -> np.ndarray:
    """S2DecodePointsCompressed (cc:343-391) -> (n, 3) float64."""
    buf = memoryview(bytes(buf))
    pos = 0
    faces = np.empty(n, np.int64)
    got = 0
    while got < n:
        fc, pos = _read_varint64(buf, pos)
        f, c = fc % 6, fc // 6
        if c <= 0:
            raise ValueError("bad face run")
        faces[got : got + c] = f
        got += c
    dp = np.empty(n, np.int32)
    dq = np.empty(n, np.int32)
    if n:
        nbytes = (level + 7) // 8 * 2
        first = int.from_bytes(bytes(buf[pos : pos + nbytes]), "little")
        pos += nbytes
        p0, q0 = deinterleave_uint32(np.asarray([first], np.uint64))
        dp[0], dq[0] = int(p0[0]), int(q0[0])
        for k in range(1, n):
            v, pos = _read_varint64(buf, pos)
            zp, zq = deinterleave_uint32(np.asarray([v], np.uint64))
            dp[k] = zigzag_decode(zp.astype(np.uint32))[0]
            dq[k] = zigzag_decode(zq.astype(np.uint32))[0]
    pi = nth_derivative2_decode(dp).astype(np.int64)
    qi = nth_derivative2_decode(dq).astype(np.int64)
    x, y, z = pi_qi_to_xyz(faces, pi, qi, level)
    pts = np.stack([x, y, z], axis=1)
    n_off, pos = _read_varint64(buf, pos)
    if n_off > n:
        raise ValueError("bad off-center count")
    for _ in range(int(n_off)):
        idx, pos = _read_varint64(buf, pos)
        if idx >= n:
            raise ValueError("bad off-center index")
        pts[idx] = np.frombuffer(buf, "<f8", count=3, offset=pos)
        pos += 24
    return pts
