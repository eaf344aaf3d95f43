"""EncodedS2PointVector — the CELL_IDS block-packed container
(reference: encoded_s2point_vector.cc:62-944, encoded_string_vector.cc,
encoded_uint_vector.h:203-226).

This is the last §2.3 wire format: a vector of S2Points stored as
S2CellId centers in fixed 16-value blocks, each value the sum of a
global ``base``, a per-block ``offset`` and a per-value nibble-packed
``delta``; points that are not cell centers at the chosen level ride
along as 24-byte raw exceptions indexed by reserved delta values
0..15.  Points are first converted to the interleaved-bit-PAIR value
space (InterleaveUint32BitPairs, cc:52-66) — NOT the Hilbert id — so
the codec here deliberately shares nothing with kernels/cellcodec.

Layout (cc:419-476):
  byte 0: format(3) | have_exceptions << 3 | (last_block_count-1) << 4
  byte 1: base_bytes(3) | level << 3
  base:   0-7 bytes, the value prefix >> BaseShift(level, base_bits)
  blocks: an EncodedStringVector = varint64(n_blocks*8 | (off_len-1)),
          n_blocks little-endian end-offsets of off_len bytes each,
          then the concatenated block bodies
  block:  byte 0: (offset_bytes - overlap_nibbles) | overlap_nibbles<<3
                  | (delta_nibbles-1) << 4
          offset_bytes bytes of offset >> (delta_bits - overlap_bits)
          ceil(block_size * delta_nibbles / 2) bytes of packed deltas
          24 bytes per exception, in delta order

The UNCOMPRESSED fallback (cc:204-224) is varint64(n << 3 | 0) + raw
little-endian doubles, chosen when fewer than 5% of the points are
encodable as cell centers (kMinEncodableFraction, cc:633-638).

Pure NumPy/bytes — no Spark imports; the distributed op lives in
operators/pointvec_blocks.py.
"""

from __future__ import annotations

import struct

import numpy as np

from .pointcodec import xyz_to_face_si_ti

__all__ = [
    "BLOCK_SIZE",
    "encode_point_vector",
    "encode_point_vector_fast",
    "encode_point_vector_compact",
    "decode_point_vector",
    "point_vector_info",
    "encoded_value_to_point",
    "interleave_bit_pairs",
    "deinterleave_bit_pairs",
]

BLOCK_SHIFT = 4
BLOCK_SIZE = 1 << BLOCK_SHIFT  # 16 values per block (cc:283-285)
_EXCEPTION = (1 << 64) - 1  # kException
_FMT_UNCOMPRESSED = 0
_FMT_CELL_IDS = 1
_MAX_LEVEL = 30


def _bit_mask(n: int) -> int:
    return 0 if n <= 0 else (1 << n) - 1


def _bit_width(x: int) -> int:
    return int(x).bit_length()


def _max_bits_for_level(level: int) -> int:
    return 2 * level + 3


def _base_shift(level: int, base_bits: int) -> int:
    return max(0, _max_bits_for_level(level) - base_bits)


def interleave_bit_pairs(val0: int, val1: int) -> int:
    """InterleaveUint32BitPairs (cc:52-66): bit pairs of val0 at result
    pairs 0, 2, 4, ...; val1 at pairs 1, 3, 5, ..."""
    v0, v1 = int(val0), int(val1)
    for shift, mask in (
        (16, 0x0000FFFF0000FFFF),
        (8, 0x00FF00FF00FF00FF),
        (4, 0x0F0F0F0F0F0F0F0F),
        (2, 0x3333333333333333),
    ):
        v0 = (v0 | (v0 << shift)) & mask
        v1 = (v1 | (v1 << shift)) & mask
    return v0 | (v1 << 2)


def deinterleave_bit_pairs(code: int) -> tuple[int, int]:
    """DeinterleaveUint32BitPairs (cc:71-94)."""
    v0, v1 = int(code), int(code) >> 2
    for mask, shift in (
        (0x3333333333333333, 2),
        (0x0F0F0F0F0F0F0F0F, 4),
        (0x00FF00FF00FF00FF, 8),
        (0x0000FFFF0000FFFF, 16),
    ):
        v0 &= mask
        v0 |= v0 >> shift
        v1 &= mask
        v1 |= v1 >> shift
    return v0 & 0xFFFFFFFF, v1 & 0xFFFFFFFF


def _varint64(x: int) -> bytes:
    out = bytearray()
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint64(buf: bytes, pos: int) -> tuple[int, int]:
    shift = val = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint64 overrun")


def _uint_with_length(x: int, length: int) -> bytes:
    """EncodeUintWithLength: lowest ``length`` little-endian bytes."""
    return int(x).to_bytes(8, "little")[:length]


def _get_uint_with_length(buf: bytes, pos: int, length: int) -> int:
    return int.from_bytes(buf[pos : pos + length], "little")


def _cell_points(points: np.ndarray):
    """ChooseBestLevel step 1 (cc:600-614): per point (level, face, si,
    ti) with level = -1 when the point is not a cell center."""
    pts = np.asarray(points, np.float64).reshape(-1, 3)
    face, si, ti, level = xyz_to_face_si_ti(pts[:, 0], pts[:, 1], pts[:, 2])
    return face, si, ti, level


def _choose_best_level(level: np.ndarray) -> int:
    """cc:616-641: level with the most encodable points (smallest level
    wins ties via argmax), or -1 when fewer than 5% are encodable."""
    enc = level[level >= 0]
    n = len(level)
    if n == 0 or len(enc) == 0:
        return -1
    counts = np.bincount(enc.astype(np.int64), minlength=_MAX_LEVEL + 1)
    best = int(np.argmax(counts))
    if counts[best] <= 0.05 * n:
        return -1
    return best


_PAIR_STEPS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
)


def _interleave_bit_pairs_vec(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized InterleaveUint32BitPairs over uint64 arrays."""
    v0 = a.astype(np.uint64)
    v1 = b.astype(np.uint64)
    for shift, mask in _PAIR_STEPS:
        m = np.uint64(mask)
        s = np.uint64(shift)
        v0 = (v0 | (v0 << s)) & m
        v1 = (v1 | (v1 << s)) & m
    return v0 | (v1 << np.uint64(2))


def _deinterleave_bit_pairs_vec(code: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized DeinterleaveUint32BitPairs."""
    v0 = code.astype(np.uint64)
    v1 = v0 >> np.uint64(2)
    for shift, mask in reversed(_PAIR_STEPS):
        m = np.uint64(mask)
        s = np.uint64(shift)
        v0 &= m
        v0 |= v0 >> s
        v1 &= m
        v1 |= v1 >> s
    u32 = np.uint64(0xFFFFFFFF)
    return v0 & u32, v1 & u32


def _convert_cells_to_values(
    face: np.ndarray, si: np.ndarray, ti: np.ndarray,
    cell_level: np.ndarray, level: int,
) -> list[int]:
    """ConvertCellsToValues (cc:645-677): the bit-pair-interleaved
    (sj, tj) value per point, or kException — one vectorized pass."""
    shift = np.uint64(_MAX_LEVEL - level)
    f = np.asarray(face, np.uint64)
    s = np.asarray(si, np.uint64)
    t = np.asarray(ti, np.uint64)
    sj = (((f & np.uint64(3)) << np.uint64(30)) | (s >> np.uint64(1))) >> shift
    tj = (((f & np.uint64(4)) << np.uint64(29)) | t) >> (shift + np.uint64(1))
    v = _interleave_bit_pairs_vec(sj, tj)
    v = np.where(
        np.asarray(cell_level, np.int64) != level, np.uint64(_EXCEPTION), v
    )
    return [int(x) for x in v]


def _choose_base(
    values: list[int], level: int, have_exceptions: bool
) -> tuple[int, int]:
    """ChooseBase (cc:679-712) -> (base, base_bits)."""
    enc = [v for v in values if v != _EXCEPTION]
    if not enc:
        return 0, 0
    v_min, v_max = min(enc), max(enc)
    min_delta_bits = 8 if (have_exceptions or len(values) == 1) else 4
    excluded_bits = max(
        _bit_width(v_min ^ v_max),
        min_delta_bits,
        _base_shift(level, 56),
    )
    base = v_min & ~_bit_mask(excluded_bits)
    if base == 0:
        base_bits = 0
    else:
        low_bit = (base & -base).bit_length() - 1
        base_bits = (_max_bits_for_level(level) - low_bit + 7) & ~7
    return v_min & ~_bit_mask(_base_shift(level, base_bits)), base_bits


def _can_encode(
    d_min: int, d_max: int, delta_bits: int, overlap_bits: int,
    have_exceptions: bool,
) -> bool:
    """cc:715-730."""
    d_min &= ~_bit_mask(delta_bits - overlap_bits)
    max_delta = _bit_mask(delta_bits)
    if have_exceptions:
        if max_delta < BLOCK_SIZE:
            return False
        max_delta -= BLOCK_SIZE
    return d_min + max_delta >= d_max


def _get_block_code(
    values: list[int], base: int, have_exceptions: bool
) -> tuple[int, int, int]:
    """GetBlockCode (cc:736-837) -> (delta_bits, offset_bits,
    overlap_bits)."""
    enc = [v for v in values if v != _EXCEPTION]
    if not enc:
        return 4, 0, 0
    b_min = min(enc) - base
    b_max = max(enc) - base
    delta_bits = (max(1, _bit_width(b_max - b_min) - 1) + 3) & ~3
    overlap_bits = 0
    if not _can_encode(b_min, b_max, delta_bits, 0, have_exceptions):
        if _can_encode(b_min, b_max, delta_bits, 4, have_exceptions):
            overlap_bits = 4
        else:
            delta_bits += 4
            if not _can_encode(b_min, b_max, delta_bits, 0, have_exceptions):
                overlap_bits = 4
    if len(values) == 1 and not have_exceptions:
        delta_bits = 8
    max_delta = _bit_mask(delta_bits) - (BLOCK_SIZE if have_exceptions else 0)
    offset_bits = 0
    if b_max > max_delta:
        offset_shift = delta_bits - overlap_bits
        mask = _bit_mask(offset_shift)
        min_offset = (b_max - max_delta + mask) & ~mask
        offset_bits = (_bit_width(min_offset) - offset_shift + 7) & ~7
        if offset_bits == 64:
            overlap_bits = 4
    return delta_bits, offset_bits, overlap_bits


def encode_point_vector_fast(points: np.ndarray) -> bytes:
    """EncodeS2PointVectorFast (cc:204-221): UNCOMPRESSED."""
    pts = np.ascontiguousarray(np.asarray(points, np.float64).reshape(-1, 3))
    return _varint64((len(pts) << 3) | _FMT_UNCOMPRESSED) + pts.astype(
        "<f8"
    ).tobytes()


def encode_point_vector_compact(
    points: np.ndarray, cell_points=None
) -> bytes:
    """EncodeS2PointVectorCompact (cc:478-592): CELL_IDS, falling back
    to UNCOMPRESSED when not worthwhile.  ``cell_points`` optionally
    supplies a precomputed (face, si, ti, cell_level) tuple for the
    batch (callers that already ran the coordinate pipeline — e.g. the
    per-tile operator — skip re-deriving it per vector)."""
    pts = np.asarray(points, np.float64).reshape(-1, 3)
    face, si, ti, cell_level = (
        cell_points if cell_points is not None else _cell_points(pts)
    )
    level = _choose_best_level(cell_level)
    if level < 0:
        return encode_point_vector_fast(pts)
    values = _convert_cells_to_values(face, si, ti, cell_level, level)
    have_exceptions = any(v == _EXCEPTION for v in values)
    base, base_bits = _choose_base(values, level, have_exceptions)

    num_blocks = (len(values) + BLOCK_SIZE - 1) >> BLOCK_SHIFT
    base_bytes = base_bits >> 3
    last_block_count = len(values) - BLOCK_SIZE * (num_blocks - 1)
    out = bytearray()
    out.append(
        _FMT_CELL_IDS | (int(have_exceptions) << 3) | ((last_block_count - 1) << 4)
    )
    out.append(base_bytes | (level << 3))
    out += _uint_with_length(base >> _base_shift(level, base_bits), base_bytes)

    blocks: list[bytes] = []
    for i in range(0, len(values), BLOCK_SIZE):
        bvals = values[i : i + BLOCK_SIZE]
        delta_bits, offset_bits, overlap_bits = _get_block_code(
            bvals, base, have_exceptions
        )
        offset_bytes = offset_bits >> 3
        delta_nibbles = delta_bits >> 2
        overlap_nibbles = overlap_bits >> 2
        block = bytearray()
        block.append(
            (offset_bytes - overlap_nibbles)
            | (overlap_nibbles << 3)
            | (delta_nibbles - 1) << 4
        )
        enc = [v for v in bvals if v != _EXCEPTION]
        num_exceptions = len(bvals) - len(enc)
        offset = min((v - base) for v in enc) if enc else 0
        offset_shift = delta_bits - overlap_bits
        offset &= ~_bit_mask(offset_shift)
        if offset > 0:
            block += _uint_with_length(offset >> offset_shift, offset_bytes)
        delta_bytes = (delta_nibbles + 1) >> 1
        exceptions: list[int] = []
        for j, v in enumerate(bvals):
            if v == _EXCEPTION:
                delta = len(exceptions)
                exceptions.append(i + j)
            else:
                delta = v - (offset + base)
                if have_exceptions:
                    delta += BLOCK_SIZE
            if (delta_nibbles & 1) and (j & 1):
                last_byte = block[-1]
                del block[-1]
                delta = (delta << 4) | (last_byte & 0xF)
            block += _uint_with_length(delta, delta_bytes)
        for pi in exceptions:
            block += struct.pack("<3d", *pts[pi])
        blocks.append(bytes(block))

    # StringVectorEncoder::Encode = EncodeUintVector of END offsets
    # (encoded_string_vector.cc:41-49, encoded_uint_vector.h:203-226)
    offsets = []
    total = 0
    for b in blocks:
        total += len(b)
        offsets.append(total)
    one_bits = 1
    for x in offsets:
        one_bits |= x
    off_len = ((_bit_width(one_bits) - 1) >> 3) + 1
    out += _varint64((len(offsets) * 8) | (off_len - 1))
    for x in offsets:
        out += _uint_with_length(x, off_len)
    for b in blocks:
        out += b
    return bytes(out)


def encode_point_vector(
    points: np.ndarray, hint: str = "compact", cell_points=None
) -> bytes:
    if hint == "fast":
        return encode_point_vector_fast(points)
    return encode_point_vector_compact(points, cell_points)


def _values_to_points(values: np.ndarray, level: int) -> np.ndarray:
    """Vectorized DecodeCellIdsFormat value -> point tail (cc:925-936)
    for a batch of 64-bit values: returns (n, 3) float64."""
    from . import coords

    sj, tj = _deinterleave_bit_pairs_vec(np.asarray(values, np.uint64))
    shift = np.uint64(_MAX_LEVEL - level)
    u32 = np.uint64(0xFFFFFFFF)
    one = np.uint64(1)
    # C++ does these shifts in 32-bit registers: mask to uint32
    si = ((((sj << one) | one) << shift) & u32) & np.uint64(0x7FFFFFFF)
    ti = ((((tj << one) | one) << shift) & u32) & np.uint64(0x7FFFFFFF)
    face = (((sj << shift) & u32) >> np.uint64(30)) | (
        (((tj << (shift + one)) & u32) >> np.uint64(29)) & np.uint64(4)
    )
    u = coords.st_to_uv(coords.si_ti_to_st(si.astype(np.int64)))
    v = coords.st_to_uv(coords.si_ti_to_st(ti.astype(np.int64)))
    x, y, z = coords.face_uv_to_xyz(face.astype(np.int64) & 7, u, v)
    x, y, z = coords.normalize(x, y, z)
    return np.stack([x, y, z], axis=1)


def encoded_value_to_point(value: int, level: int) -> np.ndarray:
    """Single-value convenience wrapper over :func:`_values_to_points`."""
    return _values_to_points(np.array([value], np.uint64), level)[0]


def point_vector_info(buf: bytes) -> dict:
    """Header summary: format, n, level, base_bytes, have_exceptions,
    n_blocks (0 for UNCOMPRESSED)."""
    fmt = buf[0] & 7
    if fmt == _FMT_UNCOMPRESSED:
        size, _ = _read_varint64(buf, 0)
        return {
            "fmt": _FMT_UNCOMPRESSED,
            "n": size >> 3,
            "level": -1,
            "base_bytes": 0,
            "have_exceptions": False,
            "n_blocks": 0,
        }
    header1, header2 = buf[0], buf[1]
    base_bytes = header2 & 7
    pos = 2 + base_bytes
    size_len, pos = _read_varint64(buf, pos)
    n_blocks = size_len >> 3
    last_block_count = (header1 >> 4) + 1
    return {
        "fmt": _FMT_CELL_IDS,
        "n": BLOCK_SIZE * (n_blocks - 1) + last_block_count if n_blocks else 0,
        "level": header2 >> 3,
        "base_bytes": base_bytes,
        "have_exceptions": bool(header1 & 8),
        "n_blocks": n_blocks,
    }


def decode_point_vector(buf: bytes) -> np.ndarray:
    """Full decode of either format (InitCellIdsFormat +
    DecodeCellIdsFormat, cc:838-937)."""
    fmt = buf[0] & 7
    if fmt == _FMT_UNCOMPRESSED:
        size, pos = _read_varint64(buf, 0)
        n = size >> 3
        return (
            np.frombuffer(buf, "<f8", 3 * n, pos).reshape(n, 3).astype(np.float64)
        )
    if fmt != _FMT_CELL_IDS:
        raise ValueError(f"unknown EncodedS2PointVector format {fmt}")
    header1, header2 = buf[0], buf[1]
    have_exceptions = bool(header1 & 8)
    last_block_count = (header1 >> 4) + 1
    base_bytes = header2 & 7
    level = header2 >> 3
    if level > _MAX_LEVEL:
        raise ValueError("bad level")
    pos = 2
    base = _get_uint_with_length(buf, pos, base_bytes) << _base_shift(
        level, base_bytes << 3
    )
    pos += base_bytes
    size_len, pos = _read_varint64(buf, pos)
    n_blocks = size_len >> 3
    off_len = (size_len & 7) + 1
    offsets = [
        _get_uint_with_length(buf, pos + k * off_len, off_len)
        for k in range(n_blocks)
    ]
    pos += n_blocks * off_len
    n = BLOCK_SIZE * (n_blocks - 1) + last_block_count if n_blocks else 0
    out = np.empty((n, 3), np.float64)
    # delta-decode every index first (cheap int ops), then convert all
    # cell values to points in ONE vectorized pass — the per-point
    # trig/normalize tail dominated the scalar path
    values = np.zeros(n, np.uint64)
    is_cell = np.zeros(n, bool)
    start = 0
    for bi in range(n_blocks):
        body = buf[pos + start : pos + offsets[bi]]
        start = offsets[bi]
        header = body[0]
        p = 1
        overlap_nibbles = (header >> 3) & 1
        offset_bytes = (header & 7) + overlap_nibbles
        delta_nibbles = (header >> 4) + 1
        offset = 0
        if offset_bytes > 0:
            offset_shift = (delta_nibbles - overlap_nibbles) << 2
            offset = _get_uint_with_length(body, p, offset_bytes) << offset_shift
            p += offset_bytes
        block_size = min(BLOCK_SIZE, n - bi * BLOCK_SIZE)
        delta_bytes = (delta_nibbles + 1) >> 1
        exc_base = p + (block_size * delta_nibbles + 1) // 2
        for j in range(block_size):
            delta_nibble_offset = j * delta_nibbles
            dp = p + (delta_nibble_offset >> 1)
            delta = _get_uint_with_length(body, dp, delta_bytes)
            delta >>= (delta_nibble_offset & 1) << 2
            delta &= _bit_mask(delta_nibbles << 2)
            i = bi * BLOCK_SIZE + j
            if have_exceptions and delta < BLOCK_SIZE:
                ep = exc_base + delta * 24
                out[i] = struct.unpack_from("<3d", body, ep)
                continue
            if have_exceptions:
                delta -= BLOCK_SIZE
            values[i] = base + offset + delta
            is_cell[i] = True
    if is_cell.any():
        out[is_cell] = _values_to_points(values[is_cell], level)
    return out
