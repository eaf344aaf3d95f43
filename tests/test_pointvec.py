"""EncodedS2PointVector CELL_IDS container: reference byte-size goldens
(encoded_s2point_vector_test.cc:109-394) + round trips."""

import numpy as np
import pytest

from s2geometry_spark.kernels import cellid, hilbert, pointcodec, pointvec
from s2geometry_spark.kernels.coords import LIMIT_IJ

MAX_LEVEL = 30


def _pt(x, y, z):
    v = np.array([x, y, z], np.float64)
    return v / np.sqrt(v @ v)


def _cell_point(debug: str) -> np.ndarray:
    cid = cellid.from_debug_string([debug])
    x, y, z = cellid.to_point(cid)
    return np.array([x[0], y[0], z[0]])


def _id_point(cid) -> np.ndarray:
    x, y, z = cellid.to_point(np.array([cid], np.uint64))
    return np.array([x[0], y[0], z[0]])


def _begin(level: int) -> int:
    f0 = np.atleast_1d(cellid.from_face(0)).astype(np.uint64)
    return int(np.atleast_1d(cellid.child_begin(f0, level))[0])


def _last(level: int) -> int:
    # End(level).prev(): child_end past face 5, stepped back once
    f5 = np.atleast_1d(cellid.from_face(5)).astype(np.uint64)
    end = np.atleast_1d(cellid.child_end(f5, level)).astype(np.uint64)
    return int(np.atleast_1d(cellid.prev_cell(end))[0])


def _prev(cid: int) -> int:
    return int(cellid.prev_cell(np.array([cid], np.uint64))[0])


def _encoded_value_to_point(value: int, level: int) -> np.ndarray:
    """Test-side helper, deliberately using SINGLE-BIT deinterleave like
    the reference test (util_bits::DeinterleaveUint32, test.cc:96-106),
    while the codec itself uses bit pairs."""
    sj, tj = pointcodec.deinterleave_uint32(np.array([value], np.uint64))
    sj, tj = int(sj[0]), int(tj[0])
    shift = MAX_LEVEL - level
    si = ((((sj << 1) | 1) << shift) & 0xFFFFFFFF) & 0x7FFFFFFF
    ti = ((((tj << 1) | 1) << shift) & 0xFFFFFFFF) & 0x7FFFFFFF
    face = (((sj << shift) & 0xFFFFFFFF) >> 30) | (
        (((tj << (shift + 1)) & 0xFFFFFFFF) >> 29) & 4
    )
    from s2geometry_spark.kernels import coords

    u = coords.st_to_uv(coords.si_ti_to_st(np.array([si], np.int64)))
    v = coords.st_to_uv(coords.si_ti_to_st(np.array([ti], np.int64)))
    x, y, z = coords.normalize(*coords.face_uv_to_xyz(np.array([face]), u, v))
    return np.array([x[0], y[0], z[0]])


def _check(points, hint, expected_bytes=None):
    pts = np.array(points, np.float64).reshape(-1, 3)
    buf = pointvec.encode_point_vector(pts, hint)
    if expected_bytes is not None:
        assert len(buf) == expected_bytes, (len(buf), expected_bytes)
    dec = pointvec.decode_point_vector(buf)
    assert dec.shape == pts.shape
    assert (dec == pts).all(), "round trip must be bit-exact"
    return len(buf)


def test_empty():
    _check(np.empty((0, 3)), "fast", 1)
    _check(np.empty((0, 3)), "compact", 1)


def test_one_point():
    _check([_pt(1, 0, 0)], "fast", 25)
    _check([_pt(1, 0, 0)], "compact", 6)


def test_one_point_with_exceptions_no_overlap():
    a = _pt(1, 0, 0)
    points = [_pt(1, 2, 3)] + [a] * 15 + [a]
    _check(points, "compact", 48)


def test_one_point_with_exceptions_with_overlap():
    a = _id_point(0x946DF618D0000000)
    b = _id_point(0x947209E070000000)
    points = [_pt(1, 2, 3)] + [a] * 15 + [b]
    _check(points, "compact", 54)


def test_cell_id_with_exception():
    _check([_cell_point("1/23"), _pt(0.1, 0.2, 0.3)], "compact", 31)


def test_points_at_multiple_levels():
    _check(
        [
            _cell_point("2/11001310230102"),
            _cell_point("1/23322"),
            _cell_point("3/3"),
            _cell_point("1/23323"),
            _cell_point("2/12101023022012"),
        ],
        "compact",
        83,
    )


def test_no_overlap_or_extra_delta_bits_needed():
    level = 3
    points = [_encoded_value_to_point(0, level)] * pointvec.BLOCK_SIZE
    for v in (0x72, 0x74, 0x75, 0x7E):
        points.append(_encoded_value_to_point(v, level))
    _check(points, "compact", 10 + pointvec.BLOCK_SIZE // 2)


def test_overlap_needed():
    level = 3
    points = [_encoded_value_to_point(0, level)] * pointvec.BLOCK_SIZE
    for v in (0x78, 0x7A, 0x7C, 0x84):
        points.append(_encoded_value_to_point(v, level))
    _check(points, "compact", 10 + pointvec.BLOCK_SIZE // 2)


def test_extra_delta_bits_needed():
    level = 3
    points = [_encoded_value_to_point(0, level)] * pointvec.BLOCK_SIZE
    for v in (0x08, 0x4E, 0x82, 0x104):
        points.append(_encoded_value_to_point(v, level))
    _check(points, "compact", 13 + pointvec.BLOCK_SIZE // 2)


def test_extra_delta_bits_and_overlap_needed():
    level = 5
    points = [_encoded_value_to_point(0, level)] * pointvec.BLOCK_SIZE
    for v in (0xF08, 0xF4E, 0xF82, 0x1004):
        points.append(_encoded_value_to_point(v, level))
    _check(points, "compact", 14 + pointvec.BLOCK_SIZE // 2)


def test_sixty_four_bit_offset():
    level = MAX_LEVEL
    points = [_id_point(_begin(level))] * pointvec.BLOCK_SIZE
    last = _last(level)
    points.append(_id_point(last))
    points.append(_id_point(_prev(last)))
    _check(points, "compact", 16 + pointvec.BLOCK_SIZE // 2)


def test_all_exceptions_block():
    points = [_encoded_value_to_point(0, MAX_LEVEL)] * pointvec.BLOCK_SIZE
    points.append(_pt(0.1, 0.2, 0.3))
    points.append(_pt(0.3, 0.2, 0.1))
    _check(points, "compact", 72)
    _check(points, "fast", 434)


def test_first_at_all_levels():
    for level in range(MAX_LEVEL + 1):
        _check([_id_point(_begin(level))], "compact", 6)


def test_last_at_all_levels():
    for level in range(MAX_LEVEL + 1):
        _check([_id_point(_last(level))], "compact", 6 + level // 4)


def test_max_face_si_ti_at_all_levels():
    for level in range(MAX_LEVEL + 1):
        leaf = hilbert.from_face_ij(
            np.array([5]), np.array([LIMIT_IJ - 1]), np.array([LIMIT_IJ - 1])
        )
        cid = int(cellid.parent(leaf, level)[0])
        expected = 6 if level < 4 else 6 + (level + 1) // 4
        _check([_id_point(cid)], "compact", expected)


def test_last_two_points_at_all_levels():
    for level in range(MAX_LEVEL + 1):
        cid = _last(level)
        _check(
            [_id_point(cid), _id_point(_prev(cid))],
            "compact",
            6 + (level + 2) // 4,
        )


def test_many_duplicate_points_at_all_levels():
    for level in range(MAX_LEVEL + 1):
        cid = _last(level)
        expected = 23 + (level + 2) // 4
        if level == 30:
            expected += 1
        _check([_id_point(cid)] * 32, "compact", expected)


def test_random_cell_center_round_trip():
    rng = np.random.default_rng(42)
    for trial in range(10):
        level = int(rng.integers(0, 31))
        n = int(rng.integers(1, 60))
        leaves = cellid.from_latlng_degrees(
            rng.uniform(-80, 80, n), rng.uniform(-179, 179, n)
        )
        cids = cellid.parent(leaves, level)
        xs, ys, zs = cellid.to_point(cids)
        pts = np.stack([xs, ys, zs], axis=1)
        # sprinkle raw (exception) points
        for k in range(0, n, 7):
            pts[k] = _pt(*rng.normal(size=3))
        buf = pointvec.encode_point_vector(pts, "compact")
        dec = pointvec.decode_point_vector(buf)
        assert (dec == pts).all()
        info = pointvec.point_vector_info(buf)
        assert info["n"] == n


def test_interleave_pairs_round_trip():
    rng = np.random.default_rng(3)
    for _ in range(200):
        a = int(rng.integers(0, 1 << 32))
        b = int(rng.integers(0, 1 << 31))
        v = pointvec.interleave_bit_pairs(a, b)
        aa, bb = pointvec.deinterleave_bit_pairs(v)
        assert (aa, bb) == (a, b)
