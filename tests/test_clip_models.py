"""Boundary-model clip (S2BooleanOperation PolygonModel/PolylineModel,
s2boolean_operation.h:160-230): rider semantics, kernel/operator parity.
Engine-vs-DuckDB bit-parity of the entry query is covered by
tests/test_entry_correctness.py (polyline_clip_models)."""

import math

import numpy as np

from s2geometry_spark.kernels import predicates
from s2geometry_spark.kernels.clipmodels import (
    POLYGON_MODELS,
    POLYLINE_MODELS,
    clip_chain_models,
)
from s2geometry_spark.kernels.regions import Loop

LOOP = Loop.make_regular(17.0, 31.0, 0.6, 12)
L = LOOP.vertices


def _pt(t, ang):
    latr, lngr = math.radians(17.0), math.radians(31.0)
    z = np.array(
        [
            math.cos(lngr) * math.cos(latr),
            math.sin(lngr) * math.cos(latr),
            math.sin(latr),
        ]
    )
    x = np.asarray(predicates._ortho(z))
    y = np.cross(z, x)
    d = math.cos(t) * z + math.sin(t) * (math.cos(ang) * x + math.sin(ang) * y)
    return d / np.linalg.norm(d)


def _clip(V):
    return clip_chain_models(np.asarray(V), L, LOOP.origin_inside)


A = [2 * math.pi * i / 12 for i in range(12)]


def test_boundary_ride_loop_order():
    res = _clip(np.stack([L[0], L[1], L[2], L[3]]))
    assert res["open"]["closed"] == (0, 0, 0)       # boundary not contained
    assert res["semi_open"]["closed"] == (1, 4, 0)  # interior on the left
    assert res["closed"]["closed"] == (1, 4, 0)


def test_boundary_ride_reversed():
    res = _clip(np.stack([L[7], L[6], L[5]]))
    assert res["open"]["closed"] == (0, 0, 0)
    assert res["semi_open"]["closed"] == (0, 0, 0)  # interior on the right
    assert res["closed"]["closed"] == (1, 3, 0)


def test_vertex_touch_from_outside_degenerate_point():
    res = _clip(np.stack([_pt(0.95, A[4] - 0.2), L[4], _pt(0.95, A[4] + 0.2)]))
    for pg in ("open", "semi_open"):
        assert res[pg]["closed"] == (0, 0, 0)
    # closed polygon: the touch survives as a degenerate point; the
    # touching vertex is interior to the chain, so every polyline model
    # keeps it
    for pl in POLYLINE_MODELS:
        assert res["closed"][pl] == (0, 0, 1)


def test_vertex_touch_from_inside_no_degeneracy():
    res = _clip(np.stack([_pt(0.25, A[8] - 0.2), L[8], _pt(0.25, A[8] + 0.2)]))
    for pg in POLYGON_MODELS:
        assert res[pg]["closed"] == (1, 3, 0)


def test_interior_chord():
    res = _clip(np.stack([L[9], L[11]]))
    for pg in POLYGON_MODELS:
        assert res[pg]["closed"] == (1, 2, 0)


def test_enter_ride_exit():
    V = np.stack(
        [_pt(1.1, A[0] - 0.5), _pt(0.25, A[0] + 0.15), L[1], L[2], _pt(1.1, A[2] + 0.5)]
    )
    res = _clip(V)
    assert res["open"]["closed"] == (1, 3, 0)       # ride dropped, entry kept
    assert res["semi_open"]["closed"] == (1, 4, 0)  # ride merges with entry
    assert res["closed"]["closed"] == (1, 4, 0)


def test_endpoint_on_loop_vertex_polyline_models():
    """Chain ENDS on a loop vertex from outside: the degenerate point at
    the last vertex survives only when the polyline model contains its
    last vertex (closed)."""
    res = _clip(np.stack([_pt(0.95, A[10] - 0.3), L[10]]))
    assert res["closed"]["open"] == (0, 0, 0)
    assert res["closed"]["semi_open"] == (0, 0, 0)
    assert res["closed"]["closed"] == (0, 0, 1)
    for pg in ("open", "semi_open"):
        for pl in POLYLINE_MODELS:
            assert res[pg][pl] == (0, 0, 0)


def test_generic_crossings_model_independent():
    V = np.stack([_pt(0.3, 0.5), _pt(1.0, 1.0), _pt(0.35, 2.0), _pt(1.2, 2.6)])
    res = _clip(V)
    assert res["open"]["closed"] == res["closed"]["closed"] == (2, 5, 0)


def test_operator_matches_kernel(spark):
    from s2geometry_spark.operators.polylines import polyline_clip_model_counts

    chains = {
        1: np.stack([L[0], L[1], L[2]]),
        2: np.stack([_pt(0.3, 0.5), _pt(1.0, 1.0), _pt(0.35, 2.0)]),
    }
    rows = [
        (cid, s, float(V[s, 0]), float(V[s, 1]), float(V[s, 2]))
        for cid, V in chains.items()
        for s in range(V.shape[0])
    ]
    cdf = spark.createDataFrame(rows, "chain_id long, seq long, x double, y double, z double")
    got = {
        (r["pg_model"], r["pl_model"], r["chain_id"]): (
            r["n_pieces"], r["n_vertices"], r["n_points"],
        )
        for r in polyline_clip_model_counts(cdf, LOOP).collect()
    }
    assert len(got) == 18
    for cid, V in chains.items():
        res = clip_chain_models(V, L, LOOP.origin_inside)
        for pg in POLYGON_MODELS:
            for pl in POLYLINE_MODELS:
                assert got[(pg, pl, cid)] == res[pg][pl]
