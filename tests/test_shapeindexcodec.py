"""MutableS2ShapeIndex::Encode wire format: reference byte goldens
(encoded_s2shape_index_test.cc:110-120) + arm-complete round trips."""

import numpy as np
import pytest

from s2geometry_spark.kernels import cellid, paddedcell, shapeindexcodec as sic
from s2geometry_spark.kernels.coords import latlng_to_xyz, normalize
from s2geometry_spark.kernels.faceclip import K_CELL_PADDING, clip_to_padded_face


def test_empty_index_golden_4_bytes():
    buf = sic.encode_shape_index(np.array([], np.uint64), [], 1)
    assert len(buf) == 4  # varint header (1) + empty cell vector (2) + empty string vector (1)
    me, ids, bodies = sic.decode_shape_index(buf, 1)
    assert me == 10 and len(ids) == 0 and bodies == []


def test_one_edge_golden_8_bytes():
    """EncodedS2ShapeIndex.OneEdge: the index of MakeLaxPolyline
    '1:1, 2:2' encodes in 8 bytes.  The single index cell is the
    reference build's ShrinkToFit of the face cell over the edge's
    padded uv bound — computed here with the same kernels the
    distributed build uses."""
    lat = np.radians([1.0, 2.0])
    lng = np.radians([1.0, 2.0])
    x, y, z = normalize(*latlng_to_xyz(lat, lng))
    faces = np.arange(6)
    hit, au, av, bu, bv = clip_to_padded_face(
        faces,
        np.full(6, x[0]), np.full(6, y[0]), np.full(6, z[0]),
        np.full(6, x[1]), np.full(6, y[1]), np.full(6, z[1]),
        K_CELL_PADDING,
    )
    assert hit.sum() == 1
    f = int(faces[hit][0])
    face_cell = np.atleast_1d(cellid.from_face(f)).astype(np.uint64)
    shrunk = paddedcell.shrink_to_fit(
        face_cell, K_CELL_PADDING,
        np.minimum(au[hit], bu[hit]), np.maximum(au[hit], bu[hit]),
        np.minimum(av[hit], bv[hit]), np.maximum(av[hit], bv[hit]),
    )
    assert int(cellid.level(shrunk)[0]) == 5
    buf = sic.encode_shape_index(shrunk, [[(0, False, [0])]], 1)
    assert len(buf) == 8
    me, ids, bodies = sic.decode_shape_index(buf, 1)
    assert me == 10
    assert ids.tolist() == shrunk.tolist()
    assert bodies == [[(0, False, [0])]]


def _rt_body(clipped, nshapes):
    buf = sic.encode_cell_body(clipped, nshapes)
    dec, end = sic.decode_cell_body(buf, nshapes)
    assert end == len(buf)
    assert dec == clipped
    # re-encode idempotence (the reference test's memcmp check)
    assert sic.encode_cell_body(dec, nshapes) == buf
    return len(buf)


def test_single_shape_arms():
    # contiguous range 2..17 edges -> 1 varint
    assert _rt_body([(0, True, list(range(5, 10)))], 1) >= 1
    # single edge
    _rt_body([(0, False, [13])], 1)
    _rt_body([(0, True, [3000])], 1)
    # general: gaps, long runs (count >= 8), empty
    _rt_body([(0, False, [])], 1)
    _rt_body([(0, True, [1, 5, 6, 7, 40])], 1)
    _rt_body([(0, False, list(range(10, 30)))], 1)  # 20-edge run
    _rt_body([(0, False, list(range(0, 16)) + [99])], 1)


def test_multi_shape_arms():
    # one clipped shape (no count header), contiguous
    _rt_body([(2, True, [7, 8, 9])], 4)
    # empty clipped shape (polygon-interior case)
    _rt_body([(1, True, [])], 4)
    # several shapes, mixed arms incl. shape deltas
    _rt_body(
        [
            (0, False, [4]),
            (1, True, []),
            (3, False, [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 30]),
            (7, False, list(range(100, 104))),
        ],
        9,
    )


def test_random_round_trips():
    rng = np.random.default_rng(17)
    for _ in range(200):
        nshapes = int(rng.integers(1, 6))
        clipped = []
        sid = 0
        for _ in range(int(rng.integers(1, 4)) if nshapes > 1 else 1):
            if nshapes == 1:
                sid = 0
            else:
                sid = sid + int(rng.integers(0, 3))
                if sid >= nshapes:
                    break
            n = int(rng.integers(0, 12))
            edges = np.unique(rng.integers(0, 200, n)).tolist()
            if nshapes == 1 and not clipped:
                clipped.append((0, bool(rng.integers(0, 2)), edges))
                break
            clipped.append((sid, bool(rng.integers(0, 2)), edges))
            sid += 1
        if not clipped:
            continue
        _rt_body(clipped, nshapes)


def test_full_index_round_trip():
    rng = np.random.default_rng(23)
    leaves = cellid.from_latlng_degrees(
        rng.uniform(-60, 60, 40), rng.uniform(-170, 170, 40)
    )
    ids = np.unique(cellid.parent(leaves, 8))
    bodies = []
    for k in range(len(ids)):
        edges = np.unique(rng.integers(0, 500, int(rng.integers(1, 8)))).tolist()
        bodies.append([(0, False, edges)])
    buf = sic.encode_shape_index(ids, bodies, 1, max_edges_per_cell=7)
    me, dids, dbodies = sic.decode_shape_index(buf, 1)
    assert me == 7
    assert dids.tolist() == ids.tolist()
    assert dbodies == bodies
