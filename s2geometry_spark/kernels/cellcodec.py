"""Compact binary codec for S2CellId vectors (SURVEY.md §2.3).

Wire-format-compatible reimplementation of the reference's
EncodedS2CellIdVector (encoded_s2cell_id_vector.h:33-116,
encoded_s2cell_id_vector.cc:38-195): every id is stored as
``base + (delta[i] << shift)`` where

* ``shift`` is the largest even count of shared trailing zero bits
  (capped at 56), bumped to odd when ALL ids share the bit just above
  (i.e. all ids are at the same S2 level — the odd-shift rule of
  encoded_s2cell_id_vector.cc:104-110);
* ``base`` is the 0-7 most-significant BYTES of the (unsigned) minimum
  id, with the length chosen by exhaustively minimizing the total
  encoding size (cc:112-133);
* deltas are a fixed-width little-endian vector whose width is set by
  the largest delta, prefixed by ``varint64(n*8 | (width-1))``
  (encoded_uint_vector.h:204-224).

Header layout (cc:38-60): byte 0 packs ``(shift_code << 3) | base_len``
where shift_code 0..28 means even shifts 0..56, 29/30 mean odd shifts
1/3, and 31 means the odd shift is ``2*next_byte + 1`` (one extra
byte).  Odd shifts imply bit ``shift-1`` of base is set (cc:172-175).

The byte-size goldens of encoded_s2cell_id_vector_test.cc:81-255 are
pinned in tests/test_cellcodec.py, so this codec produces byte-for-byte
the sizes the reference produces.  Spark usage: coverings / per-tile
leaf-id vectors stored as compact ``binary`` columns (the lazy-decode
random access of the C++ class is a pointer-into-mmap concern that
Parquet + Arrow batching replaces).
"""

from __future__ import annotations

import numpy as np

_U64 = (1 << 64) - 1
# End(kMaxLevel).id() == FromFace(5).range_max()+1 (s2cell_id.h End):
# targets at or past it always compare >= every encodable id.
_END_LEAF = 0xC000000000000000


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


def _read_varint64(buf, pos: int) -> tuple[int, int]:
    x = 0
    for k in range(10):
        b = buf[pos + k]
        x |= (b & 0x7F) << (7 * k)
        if not b & 0x80:
            return x, pos + k + 1
    raise ValueError("varint64 overrun")


def encode_cell_ids(ids: np.ndarray) -> bytes:
    """ids: uint64 array (any order, any levels, need not be valid)."""
    v = np.ascontiguousarray(ids, dtype=np.uint64)
    n = len(v)
    if n:
        v_or = int(np.bitwise_or.reduce(v))
        v_and = int(np.bitwise_and.reduce(v))
        v_min = int(v.min())
        v_max = int(v.max())
    else:
        v_or = 0
        v_and = v_min = _U64 & 0  # unused
        v_max = 0
    e_base, e_base_len, e_shift, e_msb = 0, 0, 0, 0
    if v_or > 0:
        # even shift unless every id has the same low set bit
        e_shift = min(56, ((v_or & -v_or).bit_length() - 1) & ~1)
        if (v_and >> e_shift) & 1:
            e_shift += 1
        best = 1 << 63
        for blen in range(8):
            t_base = v_min & ~(_U64 >> (8 * blen)) if blen else 0
            t_msb = max(0, ((v_max - t_base) >> e_shift).bit_length() - 1)
            t_bytes = blen + n * ((t_msb >> 3) + 1)
            if t_bytes < best:
                e_base, e_base_len, e_msb, best = t_base, blen, t_msb, t_bytes
        # odd shifts cost a header byte at shift>=5; drop to even when the
        # doubled deltas still fit the same byte width (cc:134-137)
        if (e_shift & 1) and (e_msb & 7) != 7:
            e_shift -= 1
    # header (cc:38-60)
    shift_code = e_shift >> 1
    if e_shift & 1:
        shift_code = min(31, shift_code + 29)
    out = bytearray([(shift_code << 3) | e_base_len])
    if shift_code == 31:
        out.append(e_shift >> 1)
    base_bytes = e_base >> (64 - 8 * max(1, e_base_len))
    for _ in range(e_base_len):
        out.append(base_bytes & 0xFF)
        base_bytes >>= 8
    # fixed-width little-endian delta vector (encoded_uint_vector.h:204)
    deltas = (v - np.uint64(e_base)) >> np.uint64(e_shift)
    width = (e_msb >> 3) + 1 if n else 1
    out += _varint64((n * 8) | (width - 1))
    if n:
        out += deltas.view(np.uint8).reshape(n, 8)[:, :width].tobytes()
    return bytes(out)


def _parse_header(buf) -> tuple[int, int, int, int, int]:
    """-> (base, shift, n, width, deltas_offset); raises on malformed."""
    if len(buf) < 2:
        raise ValueError("truncated header")
    pos = 0
    code_plus_len = buf[pos]
    pos += 1
    shift_code = code_plus_len >> 3
    if shift_code == 31:
        shift_code = 29 + buf[pos]
        pos += 1
        if shift_code > 56:
            raise ValueError("shift out of range")
    base_len = code_plus_len & 7
    if pos + base_len > len(buf):
        raise ValueError("truncated base")
    base = 0
    for k in range(base_len):
        base |= buf[pos + k] << (8 * k)
    pos += base_len
    base <<= 64 - 8 * max(1, base_len)
    if shift_code >= 29:
        shift = 2 * (shift_code - 29) + 1
        base |= 1 << (shift - 1)
    else:
        shift = 2 * shift_code
    size_len, pos = _read_varint64(buf, pos)
    n = size_len >> 3
    width = (size_len & 7) + 1
    if pos + n * width > len(buf):
        raise ValueError("truncated deltas")
    return base, shift, n, width, pos


def decode_cell_ids(buf) -> np.ndarray:
    """bytes -> uint64 array (vectorized: one frombuffer + pad + shift)."""
    buf = memoryview(bytes(buf))
    base, shift, n, width, pos = _parse_header(buf)
    raw = np.frombuffer(buf, np.uint8, count=n * width, offset=pos)
    padded = np.zeros((n, 8), np.uint8)
    padded[:, :width] = raw.reshape(n, width)
    deltas = padded.reshape(-1).view(np.uint64)
    return (deltas << np.uint64(shift)) + np.uint64(base & _U64)


def lower_bound(buf, target: int) -> int:
    """Index of first id >= target (REQUIRES encoded ids sorted;
    encoded_s2cell_id_vector.h:105-116)."""
    buf = memoryview(bytes(buf))
    base, shift, n, width, pos = _parse_header(buf)
    base &= _U64
    if target <= base:
        return 0
    if target >= _END_LEAF:
        return n
    want = (target - base + (1 << shift) - 1) >> shift
    raw = np.frombuffer(buf, np.uint8, count=n * width, offset=pos)
    padded = np.zeros((n, 8), np.uint8)
    padded[:, :width] = raw.reshape(n, width)
    deltas = padded.reshape(-1).view(np.uint64)
    return int(np.searchsorted(deltas, np.uint64(want & _U64), side="left"))
