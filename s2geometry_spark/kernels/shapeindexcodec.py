"""MutableS2ShapeIndex::Encode / EncodedS2ShapeIndex wire format
(reference: mutable_s2shape_index.cc:1988-2030,
s2shape_index.cc:69-372, encoded_s2shape_index.cc:1-203).

The index serialization is the composition of the three container
primitives this repo already builds to the reference formats:

  varint64(max_edges_per_cell << 2 | version)     [version = 0]
  EncodedS2CellIdVector of the index cell ids     [kernels/cellcodec]
  EncodedStringVector of per-cell bodies          [offsets + blobs]

with each body an S2ShapeIndexCell encoding: tagged varints packing
(shape_id deltas, contains_center, edge-id run lists), specialized for
the single-shape index, single-clipped-shape, and contiguous-edge-range
cases exactly as s2shape_index.cc:69-190 documents.  The lazy per-cell
mmap ACCESS pattern of EncodedS2ShapeIndex is the part Parquet pages +
Arrow batches replace; the bytes here are the reference's bytes.

A "clipped" entry is ``(shape_id, contains_center: bool, edge_ids)``
with edge ids strictly increasing; a cell body is a list of clipped
entries with strictly increasing shape ids.
"""

from __future__ import annotations

import numpy as np

from . import cellcodec

__all__ = [
    "encode_cell_body",
    "decode_cell_body",
    "encode_shape_index",
    "decode_shape_index",
]

_VERSION = 0  # kCurrentEncodingVersionNumber


def _varint(x: int) -> bytes:
    return cellcodec._varint64(int(x))


def _edges_size_arm(edge_ids: list[int]) -> bytes:
    """EncodeEdges (s2shape_index.cc:290-323): (delta, count) runs with
    the lone-last-edge shortcut."""
    out = bytearray()
    edge_id_base = 0
    n = len(edge_ids)
    i = 0
    while i < n:
        edge_id = edge_ids[i]
        delta = edge_id - edge_id_base
        if i + 1 == n:
            out += _varint(delta)
            i += 1
            continue
        count = 1
        while i + 1 < n and edge_ids[i + 1] == edge_id + count:
            count += 1
            i += 1
        if count < 8:
            out += _varint(delta << 3 | (count - 1))
        else:
            out += _varint((count - 8) << 3 | 7)
            out += _varint(delta)
        edge_id_base = edge_id + count
        i += 1
    return bytes(out)


def encode_cell_body(clipped: list[tuple], num_shape_ids: int) -> bytes:
    """S2ShapeIndexCell::Encode (s2shape_index.cc:69-190)."""
    out = bytearray()
    if num_shape_ids == 1:
        assert len(clipped) == 1 and clipped[0][0] == 0
        _, cc, edges = clipped[0]
        n = len(edges)
        if n >= 2 and n <= 17 and edges[-1] - edges[0] == n - 1:
            out += _varint(edges[0] << 6 | (n - 2) << 2 | int(cc) << 1 | 0)
        elif n == 1:
            out += _varint(edges[0] << 3 | int(cc) << 2 | 1)
        else:
            out += _varint(n << 3 | int(cc) << 2 | 3)
            out += _edges_size_arm(list(edges))
        return bytes(out)
    if len(clipped) > 1:
        out += _varint(len(clipped) << 3 | 3)
    shape_id_base = 0
    for shape_id, cc, edges in clipped:
        shape_delta = shape_id - shape_id_base
        shape_id_base = shape_id + 1
        n = len(edges)
        if n >= 1 and n <= 16 and edges[-1] - edges[0] == n - 1:
            out += _varint(edges[0] << 2 | int(cc) << 1 | 0)
            out += _varint(shape_delta << 4 | (n - 1))
        elif n == 0:
            out += _varint(shape_delta << 4 | int(cc) << 3 | 7)
        else:
            out += _varint((n - 1) << 3 | int(cc) << 2 | 1)
            out += _varint(shape_delta)
            out += _edges_size_arm(list(edges))
    return bytes(out)


def _decode_edges(buf: bytes, pos: int, num_edges: int):
    edges: list[int] = []
    edge_id = 0
    i = 0
    while i < num_edges:
        delta, pos = cellcodec._read_varint64(buf, pos)
        if i + 1 == num_edges:
            edge_id += delta
            edges.append(edge_id)
            i += 1
        else:
            count = (delta & 7) + 1
            delta >>= 3
            if count == 8:
                count = delta + 8
                delta, pos = cellcodec._read_varint64(buf, pos)
            edge_id += delta
            for _ in range(count):
                edges.append(edge_id)
                edge_id += 1
                i += 1
    return edges, pos


def decode_cell_body(buf: bytes, num_shape_ids: int, pos: int = 0):
    """S2ShapeIndexCell::Decode (s2shape_index.cc:192-290); returns
    (clipped list, end position)."""
    if num_shape_ids == 1:
        header, pos = cellcodec._read_varint64(buf, pos)
        if (header & 1) == 0:
            n = ((header >> 2) & 15) + 2
            cc = bool(header & 2)
            e0 = header >> 6
            return [(0, cc, [e0 + i for i in range(n)])], pos
        if (header & 2) == 0:
            cc = bool(header & 4)
            return [(0, cc, [header >> 3])], pos
        n = header >> 3
        cc = bool(header & 4)
        edges, pos = _decode_edges(buf, pos, n)
        return [(0, cc, edges)], pos
    header, pos = cellcodec._read_varint64(buf, pos)
    num_clipped = 1
    if (header & 7) == 3:
        num_clipped = header >> 3
        header, pos = cellcodec._read_varint64(buf, pos)
    out = []
    shape_id = 0
    for j in range(num_clipped):
        if j > 0:
            header, pos = cellcodec._read_varint64(buf, pos)
        if (header & 1) == 0:
            sc, pos = cellcodec._read_varint64(buf, pos)
            shape_id += sc >> 4
            n = (sc & 15) + 1
            cc = bool(header & 2)
            e0 = header >> 2
            out.append((shape_id, cc, [e0 + i for i in range(n)]))
        elif (header & 7) == 7:
            shape_id += header >> 4
            out.append((shape_id, bool(header & 8), []))
        else:
            assert (header & 3) == 1
            sd, pos = cellcodec._read_varint64(buf, pos)
            shape_id += sd
            n = (header >> 3) + 1
            cc = bool(header & 4)
            edges, pos = _decode_edges(buf, pos, n)
            out.append((shape_id, cc, edges))
        shape_id += 1
    return out, pos


def encode_shape_index(
    cell_ids: np.ndarray,
    bodies: list[list[tuple]],
    num_shape_ids: int,
    max_edges_per_cell: int = 10,
) -> bytes:
    """MutableS2ShapeIndex::Encode (mutable_s2shape_index.cc:1988-2008):
    ``cell_ids`` are RAW uint64 ids in index (unsigned ascending) order,
    ``bodies[i]`` the clipped list of cell i."""
    out = bytearray()
    out += _varint(max_edges_per_cell << 2 | _VERSION)
    out += cellcodec.encode_cell_ids(np.asarray(cell_ids, np.uint64))
    blobs = [encode_cell_body(b, num_shape_ids) for b in bodies]
    offsets = []
    total = 0
    for b in blobs:
        total += len(b)
        offsets.append(total)
    one_bits = 1
    for x in offsets:
        one_bits |= x
    off_len = ((int(one_bits).bit_length() - 1) >> 3) + 1
    out += _varint(len(offsets) * 8 | (off_len - 1))
    for x in offsets:
        out += int(x).to_bytes(8, "little")[:off_len]
    for b in blobs:
        out += b
    return bytes(out)


def decode_shape_index(buf: bytes, num_shape_ids: int):
    """Returns (max_edges_per_cell, cell_ids uint64 array, bodies)."""
    hdr, pos = cellcodec._read_varint64(buf, 0)
    version = hdr & 3
    if version != _VERSION:
        raise ValueError(f"unsupported shape index version {version}")
    max_edges = hdr >> 2
    cell_ids = cellcodec.decode_cell_ids(buf[pos:])
    _, _, n_ids, width, dpos = cellcodec._parse_header(memoryview(buf[pos:]))
    pos += dpos + n_ids * width
    size_len, pos = cellcodec._read_varint64(buf, pos)
    n_blobs = size_len >> 3
    off_len = (size_len & 7) + 1
    offsets = [
        int.from_bytes(buf[pos + k * off_len : pos + (k + 1) * off_len], "little")
        for k in range(n_blobs)
    ]
    pos += n_blobs * off_len
    bodies = []
    start = 0
    for end in offsets:
        body, _ = decode_cell_body(buf[pos + start : pos + end], num_shape_ids)
        bodies.append(body)
        start = end
    return max_edges, cell_ids, bodies
