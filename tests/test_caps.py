"""S2Cap pair relations (operators/caps.py) vs trigonometric ground truth.

The engine/oracle compute relations through the closed-form S1ChordAngle
addition (s1chord_angle.cc:75-110); the ground truth here goes the long
way through angles (chord = 2*sin(theta/2)), mirroring how
s2cap_test.cc validates against S1Angle arithmetic.
"""

import math

import duckdb
import numpy as np
import pytest

from s2geometry_spark.operators.caps import (
    cap_pair_relations,
    chord_add_sql,
    conservative_pair_bound,
    radius2_sql,
)


def _chord2(theta: float) -> float:
    return min(4.0, (2.0 * math.sin(min(theta, math.pi) / 2.0)) ** 2)


def _add_via_sql(a2: float, b2: float) -> float:
    return duckdb.sql(
        f"SELECT {chord_add_sql(repr(a2), repr(b2))} AS v"
    ).fetchone()[0]


def test_chord_add_matches_angle_addition():
    rng = np.random.default_rng(7)
    for _ in range(200):
        ta, tb = rng.uniform(0, 2.0, 2)
        got = _add_via_sql(_chord2(ta), _chord2(tb))
        want = _chord2(ta + tb)
        assert got == pytest.approx(want, rel=1e-12, abs=1e-12)
    # fast paths
    assert _add_via_sql(0.123, 0.0) == 0.123
    assert _add_via_sql(3.9, 3.9) == 4.0


def test_cap_relations_vs_trig_brute_force(spark):
    """Relations from the distributed join == relations from S1Angle
    arithmetic on the same caps (tolerant compare away from ties)."""
    rng = np.random.default_rng(11)
    n = 150
    # clustered points so pairs actually interact
    lat0, lng0 = 0.6, 1.1
    lats = lat0 + rng.uniform(-0.02, 0.02, n)
    lngs = lng0 + rng.uniform(-0.02, 0.02, n)
    x = np.cos(lats) * np.cos(lngs)
    y = np.cos(lats) * np.sin(lngs)
    z = np.sin(lats)
    from s2geometry_spark.kernels import cellid

    cells = cellid.to_biased(cellid.from_xyz(x, y, z))
    rows = [
        (int(i + 1), float(x[i]), float(y[i]), float(z[i]), int(cells[i]))
        for i in range(n)
    ]
    pts = spark.createDataFrame(
        rows, "pid long, x double, y double, z double, cell long"
    )
    r2u, nr = 2.5e-4, 7
    got = {
        (r.pid_a, r.pid_b): r
        for r in cap_pair_relations(pts, r2u, nr).collect()
    }
    # trig ground truth
    theta = {i + 1: 2.0 * math.asin(0.5 * math.sqrt(r2u * (1 + (i + 1) % nr))) for i in range(n)}
    want = {}
    for i in range(n):
        for j in range(i + 1, n):
            d = 2.0 * math.asin(
                0.5
                * math.sqrt(
                    (x[i] - x[j]) ** 2 + (y[i] - y[j]) ** 2 + (z[i] - z[j]) ** 2
                )
            )
            a, b = i + 1, j + 1
            if theta[a] + theta[b] >= d - 1e-13:
                want[(a, b)] = (
                    theta[a] >= d + theta[b] - 1e-13,
                    theta[b] >= d + theta[a] - 1e-13,
                )
    # every clearly-intersecting pair found; flags agree away from ties
    for k, (ca, cb) in want.items():
        if k not in got:
            # only permissible at the boundary
            a, b = k
            d = theta[a] + theta[b]
            assert False, f"missing intersecting pair {k}"
        r = got[k]
        assert bool(r.a_contains_b) == ca or abs(r.dist_chord2) < 1e-12
        assert bool(r.b_contains_a) == cb or abs(r.dist_chord2) < 1e-12
    assert set(got) == set(want)
    assert conservative_pair_bound(r2u, nr) >= max(
        r.dist_chord2 for r in got.values()
    )
    # radius SQL sanity
    v = duckdb.sql(f"SELECT {radius2_sql('3', r2u, nr)} AS v").fetchone()[0]
    assert v == r2u * (1 + 3 % nr)
