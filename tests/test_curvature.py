"""GetCurvature parity (operators/curvature, s2loop_measures.cc:206-244)."""

import math

import numpy as np
import pytest


def _ring(n=12, lat=0.3, seed_rot=0.0):
    """Simple CCW ring at constant latitude (spherical cap boundary)."""
    ts = seed_rot + 2.0 * math.pi * np.arange(n) / n
    clat = math.cos(lat)
    return np.stack(
        [clat * np.cos(ts), clat * np.sin(ts), np.full(n, math.sin(lat))], axis=1
    )


def test_curvature_matches_gauss_bonnet():
    """curvature == 2*pi - area for a simple loop (s2loop_measures.h:80-94
    documents the identity), within GetCurvatureMaxError + area error."""
    from s2geometry_spark.kernels.measures import loop_signed_area
    from s2geometry_spark.operators.curvature import _curvature_one

    V = _ring(24, lat=0.4)
    _, d, curv = _curvature_one(V)
    area = loop_signed_area(V)
    assert abs(curv - (2.0 * math.pi - area)) < 1e-12


def test_curvature_rotation_invariant_reversal_negates():
    """The canonical-order contract (s2loop_measures.cc:218-228): any
    rotation of the vertex list gives the BIT-IDENTICAL curvature; the
    reversed list gives exactly the negation."""
    from s2geometry_spark.operators.curvature import _curvature_one

    rng = np.random.default_rng(7)
    base = _ring(17, lat=-0.2, seed_rot=0.37)
    base += 0.01 * rng.standard_normal(base.shape)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    _, _, c0 = _curvature_one(base)
    for k in range(1, len(base)):
        _, _, ck = _curvature_one(np.roll(base, k, axis=0))
        assert ck == c0
    _, _, cr = _curvature_one(base[::-1].copy())
    assert cr == -c0


def test_curvature_sign_convention():
    """CCW cap boundary: positive curvature < 2*pi; its mirror is the
    exact negation (s2loop_measures.h:85-96)."""
    from s2geometry_spark.operators.curvature import _curvature_one

    V = _ring(16, lat=0.5)
    _, _, c = _curvature_one(V)
    assert 0.0 < c < 2.0 * math.pi
    M = V.copy()
    M[:, 1] = -M[:, 1]  # mirror = reversed orientation
    _, _, cm = _curvature_one(M)
    assert cm == -c


def test_adjacent_duplicate_rejected():
    from s2geometry_spark.operators.curvature import _curvature_one

    V = _ring(8)
    V[3] = V[2]
    with pytest.raises(ValueError):
        _curvature_one(V)


def test_loop_curvature_oracle_parity(spark, duck):
    import __spark_entry__ as entry
    from tests.conftest import SF_ORACLE, compare_frames

    q = entry.queries()["loop_curvature"]
    sql = entry.oracle_sql()["loop_curvature"]
    compare_frames(q(spark, SF_ORACLE), duck.sql(sql))
