"""M4/M5 tests: containment join and kNN join vs brute-force NumPy oracles
on deterministic synthetic points (FIXTURES.md §5 pattern)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from s2geometry_spark.kernels import cellid, geotag, predicates
from s2geometry_spark.kernels.regions import Cap, Loop
from s2geometry_spark.operators.contains_join import (
    RegionIndex,
    cap_join,
    contains_join,
)
from s2geometry_spark.operators.knn import knn_join


def _points_df(spark, n=4000, key_mult=1, key_off=0):
    keys = np.arange(1, n + 1, dtype=np.int64) * key_mult + key_off
    x0, y0, z0 = geotag.int_triplet_from_key(keys)
    x, y, z = geotag.xyz_from_triplet(x0, y0, z0)
    cells = cellid.to_biased(cellid.from_xyz(x, y, z))
    import pandas as pd

    pdf = pd.DataFrame(
        {"pid": keys, "x": x, "y": y, "z": z, "cell": cells}
    )
    return spark.createDataFrame(pdf), np.stack([x, y, z], axis=1), keys


POLYS = {
    "zurich": Loop.make_regular(47.36, 8.55, 0.25, 16),
    "sydney": Loop.make_regular(-33.87, 151.20, 0.35, 24),
    "sf": Loop.make_regular(37.77, -122.42, 0.15, 12),
    "north": Loop.make_regular(90.0, 0.0, 0.5, 16),
}


class TestContainsJoin:
    def test_matches_brute_force(self, spark):
        df, pts, keys = _points_df(spark, 4000)
        index = RegionIndex(POLYS)
        got = contains_join(spark, df, index).toPandas()
        got_set = set(zip(got["pid"], got["poly_id"]))
        expect = set()
        for rid, loop in POLYS.items():
            inside = predicates.loop_contains_points(
                loop.vertices, loop.origin_inside, pts
            )
            for i in np.nonzero(inside)[0]:
                expect.add((keys[i], rid))
        assert got_set == expect
        assert len(expect) > 50  # sanity: fixtures actually exercise the join

    def test_semi_anti_variants(self, spark):
        df, pts, keys = _points_df(spark, 2000)
        index = RegionIndex(POLYS)
        pairs = contains_join(spark, df, index)
        inside_any = df.join(pairs, "pid", "left_semi")
        outside_all = df.join(pairs, "pid", "left_anti")
        n_in = inside_any.count()
        n_out = outside_all.count()
        assert n_in + n_out == 2000
        expect_in = set()
        for loop in POLYS.values():
            inside = predicates.loop_contains_points(
                loop.vertices, loop.origin_inside, pts
            )
            expect_in |= {int(keys[i]) for i in np.nonzero(inside)[0]}
        assert n_in == len(expect_in)

    def test_cap_join_matches_brute_force(self, spark):
        df, pts, keys = _points_df(spark, 4000)
        caps = {
            "c1": Cap.from_latlng_degrees(47.36, 8.55, 0.3),
            "c2": Cap.from_latlng_degrees(-33.87, 151.20, 0.5),
            "c3": Cap.from_latlng_degrees(0.0, 0.0, 0.2),
        }
        got = cap_join(spark, df, caps).toPandas()
        got_set = set(zip(got["pid"], got["poly_id"]))
        expect = set()
        for rid, cap in caps.items():
            inside = cap.contains_points(pts)
            for i in np.nonzero(inside)[0]:
                expect.add((keys[i], rid))
        assert got_set == expect
        assert len(expect) > 20


class TestKnnJoin:
    def test_matches_brute_force(self, spark):
        pdf_p, pts, pkeys = _points_df(spark, 3000)
        pdf_q, qts, qkeys = _points_df(spark, 120, key_mult=7, key_off=3)
        points = pdf_p.toDF("pid", "px", "py", "pz", "p_cell")
        queries = pdf_q.toDF("qid", "qx", "qy", "qz", "q_cell")
        k = 3
        got = knn_join(spark, points, queries, k, start_level=5, num_stages=2).toPandas()
        # brute force oracle
        d = ((qts[:, None, :] - pts[None, :, :]) ** 2).sum(axis=2)
        rows = []
        for i, qk in enumerate(qkeys):
            order = np.lexsort((pkeys, d[i]))[:k]
            for r, j in enumerate(order, start=1):
                rows.append((int(qk), r, int(pkeys[j])))
        expect = set(rows)
        got_set = set(zip(got["qid"], got["rank"], got["pid"]))
        assert got_set == expect

    def test_every_query_gets_k(self, spark):
        pdf_p, _, _ = _points_df(spark, 500)
        pdf_q, _, _ = _points_df(spark, 40, key_mult=11, key_off=5)
        points = pdf_p.toDF("pid", "px", "py", "pz", "p_cell")
        queries = pdf_q.toDF("qid", "qx", "qy", "qz", "q_cell")
        got = knn_join(spark, points, queries, 5, start_level=6, num_stages=2)
        counts = got.groupBy("qid").count().toPandas()
        assert len(counts) == 40
        assert (counts["count"] == 5).all()


class TestBoundaryDistance:
    def test_matches_brute_force(self, spark):
        from s2geometry_spark.kernels import measures
        from s2geometry_spark.operators.knn import distance_to_boundary_join

        df, P, keys = _points_df(spark, n=2500)
        rows = {r.pid: r for r in distance_to_boundary_join(df, POLYS).collect()}
        assert set(rows) == set(keys.tolist())
        rids = sorted(POLYS)
        # brute force: min over every loop edge, first-(rid, eidx) tie-break
        edges = []
        for rid in rids:
            V = np.asarray(POLYS[rid].vertices, float)
            W = np.roll(V, -1, axis=0)
            edges.extend((rid, i, V[i], W[i]) for i in range(len(V)))
        n = P.shape[0]
        best = np.full(n, np.inf)
        best_j = np.zeros(n, np.int64)
        for j, (_, _, a, b) in enumerate(edges):
            d = measures.point_edge_chord2(
                P, np.broadcast_to(a, (n, 3)), np.broadcast_to(b, (n, 3))
            )
            upd = d < best
            best = np.where(upd, d, best)
            best_j = np.where(upd, j, best_j)
        inside = np.zeros(n, bool)
        for rid in rids:
            lp = POLYS[rid]
            inside |= predicates.loop_contains_points(lp.vertices, lp.origin_inside, P)
        for i, pid in enumerate(keys):
            r = rows[int(pid)]
            rid, eidx, _, _ = edges[best_j[i]]
            assert (r.rid, r.edge_idx) == (rid, eidx)
            assert r.dist_chord2 == best[i]
            assert r.inside == inside[i]
            assert r.signed_chord2 == (-best[i] if inside[i] else best[i])
            # S2Polygon::Project: the point itself inside, else the
            # closest boundary point on the winning edge
            if inside[i]:
                assert (r.px, r.py, r.pz) == tuple(P[i])
            else:
                _, _, a, b = edges[best_j[i]]
                want = measures.project_to_edge_pinned(
                    P[i : i + 1],
                    np.broadcast_to(a, (1, 3)).copy(),
                    np.broadcast_to(b, (1, 3)).copy(),
                )[0]
                assert (r.px, r.py, r.pz) == tuple(want)
        # the fixture must exercise both signs
        assert inside.any() and not inside.all()


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


def test_rect_join_matches_brute_force(spark):
    """rect_join (covering candidates + atan2-free SQL refinement) equals
    the per-point LatLngRect.contains_point scan, including the
    antimeridian-wrapping and full-longitude polar rects."""
    from s2geometry_spark.kernels.regions import LatLngRect
    from s2geometry_spark.operators.contains_join import rect_join

    rects = {
        "box": LatLngRect.from_degrees(10.0, 20.0, 35.0, 55.0),
        "wrap": LatLngRect.from_degrees(-30.0, 160.0, 10.0, -150.0),
        "polar": LatLngRect.from_degrees(70.0, -180.0, 90.0, 180.0),
    }
    df, pts, keys = _points_df(spark, n=3000)
    got = {
        (r.pid, r.poly_id) for r in rect_join(spark, df, rects).collect()
    }
    want = {
        (int(k), rid)
        for k, p in zip(keys, pts)
        for rid, rect in rects.items()
        if rect.contains_point(p)
    }
    assert got == want and len(want) > 0
