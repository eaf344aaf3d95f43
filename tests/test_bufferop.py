"""Buffered regions (S2BufferOperation approximation): containment
within tolerance, area sanity, distributed per-chain buffering."""

import math

import numpy as np
import pytest

from s2geometry_spark.kernels import booleanop, bufferop, measures
from s2geometry_spark.kernels.measures import point_edge_chord2
from s2geometry_spark.kernels.regions import Loop, Polygon


def _pt(lat, lng):
    la, ln = math.radians(lat), math.radians(lng)
    return np.array(
        [math.cos(la) * math.cos(ln), math.cos(la) * math.sin(ln), math.sin(la)]
    )


def test_buffer_point_is_cap():
    ring = bufferop.buffer_point(_pt(10, 20), 0.2, 64)
    cap_area = 2 * math.pi * (1 - math.cos(0.2))
    assert measures.loop_area(ring) == pytest.approx(cap_area, rel=2e-3)


def test_buffer_edge_stadium_classification():
    a, b = _pt(0, 0), _pt(0, 15)
    r, nv = 0.1, 32
    poly = Polygon([Loop(bufferop.buffer_edge(a, b, r, nv))])
    rng = np.random.RandomState(0)
    P = _pt(0, 7)[None, :] + 0.3 * rng.randn(3000, 3)
    P /= np.linalg.norm(P, axis=1)[:, None]
    d = point_edge_chord2(P, np.broadcast_to(a, (3000, 3)), np.broadcast_to(b, (3000, 3)))
    ang = 2 * np.arcsin(np.minimum(1, 0.5 * np.sqrt(d)))
    inside = poly.contains_points(P)
    tol = r * (1 - math.cos(math.pi / (nv // 2))) + 1e-3
    assert not ((ang > r + tol) & inside).any()
    assert not ((ang < r - tol) & ~inside).any()
    assert inside.any() and (~inside).any()


def test_buffer_polyline_union_classification():
    V = np.stack([_pt(0, 0), _pt(0, 8), _pt(5, 12), _pt(10, 12)])
    r, nv = 0.08, 24
    loops = bufferop.buffer_polyline(V, r, nv)
    assert len(loops) == 1  # overlapping stadiums merge into one ring
    bp = Polygon([Loop(v) for v in loops])
    rng = np.random.RandomState(1)
    Q = _pt(3, 6)[None, :] + 0.25 * rng.randn(4000, 3)
    Q /= np.linalg.norm(Q, axis=1)[:, None]
    dmin = None
    for i in range(V.shape[0] - 1):
        dd = point_edge_chord2(
            Q, np.broadcast_to(V[i], (4000, 3)), np.broadcast_to(V[i + 1], (4000, 3))
        )
        dmin = dd if dmin is None else np.minimum(dmin, dd)
    ang = 2 * np.arcsin(np.minimum(1, 0.5 * np.sqrt(dmin)))
    inside = bp.contains_points(Q)
    tol = r * (1 - math.cos(math.pi / (nv // 2))) + 2e-3
    assert not ((ang > r + tol) & inside).any()
    assert not ((ang < r - tol) & ~inside).any()


def test_buffer_polygon_grows_area():
    big = Loop.make_regular(10, 20, 0.2, 16).vertices
    grown = bufferop.buffer_polygon([big], 0.05, 16)
    ratio = booleanop.polygon_area(grown) / measures.loop_area(big)
    want = (1 - math.cos(0.25)) / (1 - math.cos(0.2))  # cap-area ratio
    assert ratio == pytest.approx(want, rel=0.05)
    # grown polygon contains the original's vertices
    gp = Polygon([Loop(v) for v in grown])
    assert gp.contains_points(big).all()


def test_buffer_chains_operator(spark):
    from s2geometry_spark.operators.polylines import buffer_chains

    V = np.stack([_pt(0, 0), _pt(0, 8), _pt(5, 12)])
    rows = [(7, s, *map(float, V[s])) for s in range(3)]
    df = spark.createDataFrame(
        rows, "chain_id long, seq long, x double, y double, z double"
    )
    out = buffer_chains(df, 0.08, 24).collect()
    want = bufferop.buffer_polyline(V, 0.08, 24)
    want_area = booleanop.polygon_area(want)
    assert {r.chain_id for r in out} == {7}
    assert all(r.area == pytest.approx(want_area, abs=0) for r in out)
    got = np.array(
        [[r.x, r.y, r.z] for r in sorted(out, key=lambda r: (r.loop, r.seq))]
    )
    assert np.array_equal(got, np.vstack(want))
