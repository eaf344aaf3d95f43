"""S2PointVectorLayer (operators/point_layer) vs NumPy brute force.

Reference semantics (s2builderutil_s2point_vector_layer.cc:60-84):
edges degenerate in the SNAPPED graph become points; duplicates merge
per site (DuplicateEdges::MERGE) with label-set union; still-non-
degenerate edges are the error signal and are skipped.
"""

import numpy as np
import pandas as pd
import pytest

from s2geometry_spark.kernels import builder, cellid
from s2geometry_spark.operators.point_layer import (
    nondegenerate_edge_count,
    point_vector_layer,
    snap_edge_endpoints,
)

LEVEL = 6


def _unit(v):
    v = np.asarray(v, np.float64)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


@pytest.fixture(scope="module")
def edges_pdf():
    rng = np.random.RandomState(20260820)
    n = 400
    A = _unit(rng.randn(n, 3))
    # thirds: zero-length / tiny perturbation (mostly collapses) / long
    B = A.copy()
    third = n // 3
    B[third : 2 * third] = _unit(
        A[third : 2 * third] + 0.004 * rng.randn(third, 3)
    )
    B[2 * third :] = _unit(rng.randn(n - 2 * third, 3))
    return pd.DataFrame(
        {
            "eid": np.arange(n, dtype=np.int64),
            "label": np.arange(n, dtype=np.int64) % 7,
            "ax": A[:, 0], "ay": A[:, 1], "az": A[:, 2],
            "bx": B[:, 0], "by": B[:, 1], "bz": B[:, 2],
        }
    )


def _brute(pdf):
    """Dict site -> (n_merged, sorted label set) via direct kernel calls."""
    A = pdf[["ax", "ay", "az"]].to_numpy()
    B = pdf[["bx", "by", "bz"]].to_numpy()
    sa = cellid.to_biased(builder.snap_cells(A, LEVEL))
    sb = cellid.to_biased(builder.snap_cells(B, LEVEL))
    out = {}
    for site, sb_i, lbl in zip(sa, sb, pdf["label"]):
        if site != sb_i:
            continue
        n, labels = out.get(site, (0, set()))
        out[site] = (n + 1, labels | {int(lbl)})
    return out


def test_merge_matches_brute_force(spark, edges_pdf):
    df = spark.createDataFrame(edges_pdf)
    got = point_vector_layer(df, LEVEL).toPandas()
    want = _brute(edges_pdf)
    assert len(got) == len(want)
    for r in got.itertuples():
        n, labels = want[r.site]
        assert r.n_merged == n
        assert r.labels == ",".join(str(x) for x in sorted(labels))
        # the emitted point is the snap-site center
        ids = cellid.from_biased(np.array([r.site], np.int64))
        cx, cy, cz = cellid.to_point(ids)
        assert (r.cx, r.cy, r.cz) == (cx[0], cy[0], cz[0])


def test_keep_mode_and_error_signal(spark, edges_pdf):
    df = spark.createDataFrame(edges_pdf)
    keep = point_vector_layer(df, LEVEL, duplicate="keep").toPandas()
    merge = point_vector_layer(df, LEVEL).toPandas()
    # KEEP emits one row per degenerate edge; MERGE groups them
    assert keep.groupby("site").size().sort_index().tolist() == (
        merge.set_index("site")["n_merged"].sort_index().tolist()
    )
    n_bad = nondegenerate_edge_count(df, LEVEL)
    assert n_bad == len(edges_pdf) - len(keep)
    assert n_bad > 0  # the fixture's long-edge class hits the error path
    # collapse path present: some degenerate edges had distinct endpoints
    sn = snap_edge_endpoints(df, LEVEL).toPandas()
    deg = sn[sn.site == sn.site_b]
    collapsed = edges_pdf.merge(deg[["eid"]], on="eid")
    moved = ~(
        (collapsed.ax == collapsed.bx)
        & (collapsed.ay == collapsed.by)
        & (collapsed.az == collapsed.bz)
    )
    assert moved.any()


def test_empty_batch_schema(spark, edges_pdf):
    df = spark.createDataFrame(edges_pdf).filter("eid < 0")
    out = point_vector_layer(df, LEVEL)
    assert out.count() == 0
    assert out.columns == ["site", "n_merged", "labels", "cx", "cy", "cz"]
