"""Polyline predicates + clipping: crossing join vs brute force, clip
pieces verified by dense sampling."""

import math

import numpy as np
import pytest

from s2geometry_spark.kernels import measures, predicates
from s2geometry_spark.kernels.regions import Loop, Polygon
from s2geometry_spark.operators.polylines import (
    clip_to_polygon,
    polyline_clip_join,
    polyline_crossing_join,
)


def _pt(lat, lng):
    la, ln = math.radians(lat), math.radians(lng)
    return np.array(
        [math.cos(la) * math.cos(ln), math.cos(la) * math.sin(ln), math.sin(la)]
    )


def _chain_rows(cid, pts):
    return [(cid, s, float(p[0]), float(p[1]), float(p[2])) for s, p in enumerate(pts)]


def _walk(rng, n, start, step=0.05):
    pts = [start / np.linalg.norm(start)]
    for _ in range(n - 1):
        d = rng.randn(3)
        p = pts[-1] + step * d
        pts.append(p / np.linalg.norm(p))
    return np.stack(pts)


def test_polyline_crossing_join_vs_bruteforce(spark):
    rng = np.random.RandomState(17)
    # all walks start around the same hot spot so chains actually cross
    A = {i: _walk(rng, 12, _pt(10, 20) + 0.05 * rng.randn(3), step=0.08) for i in range(6)}
    B = {i: _walk(rng, 12, _pt(10, 20) + 0.05 * rng.randn(3), step=0.08) for i in range(6)}
    da = spark.createDataFrame(
        [r for cid, pts in A.items() for r in _chain_rows(cid, pts)],
        "chain_id long, seq long, x double, y double, z double",
    )
    db = spark.createDataFrame(
        [r for cid, pts in B.items() for r in _chain_rows(cid, pts)],
        "chain_id long, seq long, x double, y double, z double",
    )
    got = {
        (r.chain_a, r.chain_b)
        for r in polyline_crossing_join(spark, da, db).collect()
    }
    want = set()
    for ca, pa in A.items():
        for cb, pb in B.items():
            hit = False
            for i in range(pa.shape[0] - 1):
                for j in range(pb.shape[0] - 1):
                    if predicates.crossing_sign(pa[i], pa[i + 1], pb[j], pb[j + 1]) > 0:
                        hit = True
            if hit:
                want.add((ca, cb))
    assert got == want
    assert want  # random walks this long do cross


def test_clip_to_polygon_sampling():
    """Every clipped piece lies inside; the kept arc-length fraction
    matches dense per-edge sampling of the original chain."""
    poly = Polygon([Loop.make_regular(10, 20, 0.35, 24)])
    rng = np.random.RandomState(3)
    V = _walk(rng, 30, _pt(10, 14), step=0.08)
    pieces = clip_to_polygon(V, poly)
    assert pieces  # the walk enters the cap region
    # all piece midpoints inside
    for p in pieces:
        mids = p[:-1] + p[1:]
        mids /= np.linalg.norm(mids, axis=1)[:, None]
        assert poly.contains_points(mids).all()
    # length conservation vs dense sampling
    total_in = sum(measures.polyline_length(p) for p in pieces)
    ts = np.linspace(0, 1, 200, endpoint=False)
    sampled = 0.0
    for i in range(V.shape[0] - 1):
        seg = np.array(
            [measures.interpolate(V[i], V[i + 1], t + 0.5 / 200)[0] for t in ts]
        )
        inside = poly.contains_points(seg)
        seglen = measures.polyline_length(np.stack([V[i], V[i + 1]]))
        sampled += seglen * inside.mean()
    assert total_in == pytest.approx(sampled, rel=0.02)


def test_polyline_clip_join(spark):
    poly = Polygon([Loop.make_regular(10, 20, 0.35, 24)])
    rng = np.random.RandomState(9)
    chains = {i: _walk(rng, 20, _pt(10, 16), step=0.07) for i in range(4)}
    df = spark.createDataFrame(
        [r for cid, pts in chains.items() for r in _chain_rows(cid, pts)],
        "chain_id long, seq long, x double, y double, z double",
    )
    rows = polyline_clip_join(df, poly).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault((r.chain_id, r.piece), []).append((r.seq, r.x, r.y, r.z))
    for cid, V in chains.items():
        want = clip_to_polygon(V, poly)
        got_pieces = [
            np.array([[x, y, z] for _, x, y, z in sorted(v)])
            for (c, _), v in sorted(by_key.items())
            if c == cid
        ]
        assert len(got_pieces) == len(want)
        for g, w in zip(got_pieces, want):
            assert np.array_equal(g, w)


def test_chain_true_centroids(spark):
    """Operator output equals the direct NumPy TrueCentroid sum per chain
    (s2centroids.cc:76), and the fold-normalized centroid direction
    approximates the chain midpoint for a short smooth walk."""
    from s2geometry_spark.operators.polylines import chain_true_centroids

    rng = np.random.RandomState(17)
    chains = {i: _walk(rng, 12 + i, _pt(20 + 3 * i, 5 * i), step=0.03) for i in range(5)}
    df = spark.createDataFrame(
        [r for cid, pts in chains.items() for r in _chain_rows(cid, pts)],
        "chain_id long, seq long, x double, y double, z double",
    )
    rows = {r.chain_id: r for r in chain_true_centroids(df).collect()}
    for cid, V in chains.items():
        acc = np.zeros(3)
        length = 0.0
        for a, b in zip(V[:-1], V[1:]):
            vd, vs = a - b, a + b
            sin2, cos2 = float(vd @ vd), float(vs @ vs)
            acc = acc + math.sqrt(sin2 / cos2) * vs
            length += 2.0 * math.asin(math.sqrt(sin2) / 2.0)
        r = rows[cid]
        assert r.n_edges == len(V) - 1
        assert np.allclose([r.cx, r.cy, r.cz], acc, rtol=1e-12, atol=1e-15)
        assert r.length_radians == pytest.approx(length, rel=1e-12)
        assert r.length_radians == pytest.approx(
            measures.polyline_length(V), rel=1e-9
        )
        # direction sanity: normalized centroid is inside the walk's cap
        c = np.array([r.cx, r.cy, r.cz])
        c = c / np.linalg.norm(c)
        assert min(float(c @ v) for v in V) > math.cos(0.5)


def test_chain_pair_min_distance(spark):
    """Crossing pair -> exactly 0; separated pair -> min of the four
    endpoint-to-edge distances over all edge pairs, argmin lexicographic."""
    from s2geometry_spark.kernels.measures import point_edge_chord2
    from s2geometry_spark.operators.polylines import chain_pair_min_distance

    # chain 0 and chain 1 cross at the equator; chain 2 / 3 are disjoint
    rows = (
        _chain_rows(0, [_pt(-5, 0), _pt(5, 0.5), _pt(-5, 1.0)])
        + _chain_rows(1, [_pt(0.2, -1), _pt(-0.2, 2)])
        + _chain_rows(2, [_pt(20, 10), _pt(21, 11), _pt(22, 12)])
        + _chain_rows(3, [_pt(30, 10), _pt(31, 11)])
    )
    chains = spark.createDataFrame(rows, "chain_id long, seq long, x double, y double, z double")
    pairs = spark.createDataFrame([(0, 1), (2, 3)], "chain_a long, chain_b long")
    out = {
        (r.chain_a, r.chain_b): r
        for r in chain_pair_min_distance(spark, chains, pairs).collect()
    }
    assert out[(0, 1)].min_chord2 == 0.0
    # brute-force replay for the disjoint pair
    A = np.stack([_pt(20, 10), _pt(21, 11), _pt(22, 12)])
    B = np.stack([_pt(30, 10), _pt(31, 11)])
    best = None
    for i in range(2):
        for j in range(1):
            d = min(
                point_edge_chord2(B[j][None], A[i][None], A[i + 1][None])[0],
                point_edge_chord2(B[j + 1][None], A[i][None], A[i + 1][None])[0],
                point_edge_chord2(A[i][None], B[j][None], B[j + 1][None])[0],
                point_edge_chord2(A[i + 1][None], B[j][None], B[j + 1][None])[0],
            )
            if best is None or d < best[0]:
                best = (d, i, j)
    r = out[(2, 3)]
    assert r.min_chord2 == best[0] and (r.a_edge, r.b_edge) == (best[1], best[2])
    assert (r.n_a, r.n_b) == (3, 2)
