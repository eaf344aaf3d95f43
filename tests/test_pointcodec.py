"""S2 point compression wire format (kernels/pointcodec) against the
reference's own goldens (s2point_compression_test.cc)."""

import numpy as np
import pytest

from s2geometry_spark.kernels import cellid
from s2geometry_spark.kernels import pointcodec as pc
from s2geometry_spark.kernels.coords import (
    face_uv_to_xyz,
    normalize,
    st_to_uv,
)


def _snap_to_level(x, y, z, level):
    leaf = cellid.from_xyz(x, y, z)
    cell = cellid.parent(leaf, level)
    face, si, ti = cellid.get_center_si_ti(cell)
    sx, sy, sz = normalize(*pc.face_si_ti_to_xyz(face, si, ti))
    return np.stack([sx, sy, sz], axis=1)


def _encode(xyz, level):
    face, si, ti, lvl = pc.xyz_to_face_si_ti(xyz[:, 0], xyz[:, 1], xyz[:, 2])
    return pc.encode_points_compressed(xyz, face, si, ti, lvl, level)


def test_straight_line_compresses_well():
    """s2point_compression_test.cc:267-271 (StraightLineCompressesWell):
    the 100-vertex face-0 line snapped to kMaxCellLevel encodes to
    exactly n + 17 = 117 bytes (~1 byte/vertex)."""
    i = np.arange(100)
    s = 0.01 + 0.005 * i
    t = 0.01 + 0.009 * i
    x, y, z = normalize(
        *face_uv_to_xyz(np.zeros(100, np.int64), st_to_uv(s), st_to_uv(t))
    )
    xyz = _snap_to_level(x, y, z, 30)
    buf = _encode(xyz, 30)
    assert len(buf) == 100 + 17
    assert np.array_equal(pc.decode_points_compressed(buf, 30, 100), xyz)


def test_multi_face_loop_roundtrips():
    """s2point_compression_test.cc:263-265 (MultiFaceLoop): two vertices
    on each of three faces; exercises the face run-length coder."""
    mf = [
        (0, -0.5, 0.5),
        (1, -0.5, 0.5),
        (1, 0.5, -0.5),
        (2, -0.5, 0.5),
        (2, 0.5, -0.5),
        (2, 0.5, 0.5),
    ]
    fc = np.array([m[0] for m in mf], np.int64)
    u = np.array([m[1] for m in mf])
    v = np.array([m[2] for m in mf])
    x, y, z = normalize(*face_uv_to_xyz(fc, u, v))
    xyz = _snap_to_level(x, y, z, 30)
    buf = _encode(xyz, 30)
    dec = pc.decode_points_compressed(buf, 30, 6)
    assert np.array_equal(dec, xyz)
    face, _, _, lvl = pc.xyz_to_face_si_ti(xyz[:, 0], xyz[:, 1], xyz[:, 2])
    assert list(face) == [0, 1, 1, 2, 2, 2]
    assert (lvl == 30).all()


def test_first_point_on_face_edge():
    """s2point_compression_test.cc:273-307 (FirstPointOnFaceEdge): a
    first point with ti == kMaxSiTi must clamp in SiTitoPiQi instead of
    overflowing the fixed-length first-point encoding."""
    pts = np.array(
        [
            [0.054299323861222645, -0.70606358900180299, 0.70606358900180299],
            [0.056482651436986935, -0.70781701406865505, 0.70413406726388494],
        ]
    )
    face = np.array([2, 4], np.int64)
    si = np.array([956301312, 4194304], np.int64)
    ti = np.array([2147483648, 1195376640], np.int64)
    lvl = np.array([-1, 8], np.int64)
    buf = pc.encode_points_compressed(pts, face, si, ti, lvl, 8)
    dec = pc.decode_points_compressed(buf, 8, 2)
    assert np.array_equal(dec, pts)


def test_mixed_levels_roundtrip_unsnapped_tail():
    """Mixed on/off-center points (Roundtrips100VertexLoopMixed* shape):
    off-center points ride the raw 24-byte tail and decode bit-exact."""
    i = np.arange(40)
    s = 0.02 + 0.004 * i
    t = 0.03 + 0.007 * i
    x, y, z = normalize(
        *face_uv_to_xyz(np.full(40, 3, np.int64), st_to_uv(s), st_to_uv(t))
    )
    lvls = np.where(i % 4 == 0, 22, 18)
    leaf = cellid.from_xyz(x, y, z)
    cell = cellid.parent(leaf, lvls)
    face, si, ti = cellid.get_center_si_ti(cell)
    sx, sy, sz = normalize(*pc.face_si_ti_to_xyz(face, si, ti))
    xyz = np.stack([sx, sy, sz], axis=1)
    f2, si2, ti2, clvl = pc.xyz_to_face_si_ti(sx, sy, sz)
    assert np.array_equal(clvl, lvls)
    buf = pc.encode_points_compressed(xyz, f2, si2, ti2, clvl, 18)
    dec = pc.decode_points_compressed(buf, 18, 40)
    assert np.array_equal(dec, xyz)
    # off-center points cost ~25 bytes each; on-center ~2
    assert len(buf) < 10 * 25 + 30 * 4 + 20


def test_nth_derivative_and_interleave_primitives():
    rng = np.random.default_rng(3)
    v = rng.integers(-(2**20), 2**20, 50)
    enc = pc.nth_derivative2_encode(v)
    assert np.array_equal(pc.nth_derivative2_decode(enc), v.astype(np.int32))
    a = rng.integers(0, 2**32, 30, dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, 2**32, 30, dtype=np.uint64).astype(np.uint32)
    il = pc.interleave_uint32(a, b)
    da, db = pc.deinterleave_uint32(il)
    assert np.array_equal(da.astype(np.uint32), a)
    assert np.array_equal(db.astype(np.uint32), b)
    # pi occupies the EVEN bits (bit-interleave.cc LUT[1] == 0x0001)
    assert int(pc.interleave_uint32(np.array([1]), np.array([0]))[0]) == 1
    assert int(pc.interleave_uint32(np.array([0]), np.array([1]))[0]) == 2
    zz = pc.zigzag_encode(np.array([0, -1, 1, -2, 2], np.int64))
    assert list(zz) == [0, 1, 2, 3, 4]


def test_point_vector_codec_oracle_parity(spark, duck):
    import __spark_entry__ as entry
    from tests.conftest import SF_ORACLE, compare_frames

    q = entry.queries()["point_vector_codec"]
    sql = entry.oracle_sql()["point_vector_codec"]
    compare_frames(q(spark, SF_ORACLE), duck.sql(sql))
