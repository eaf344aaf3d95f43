"""Graph::GetPolylines(PATH) assembly (operators/polyline_layer.py) vs
hand-worked reference cases mirroring s2builder_graph.cc:635-787."""

from s2geometry_spark.operators.polyline_layer import assemble_polylines


def _run(spark, rows):
    df = spark.createDataFrame(rows, "eid long, src long, dst long")
    out = assemble_polylines(df).collect()
    chains = {}
    for r in out:
        chains.setdefault(r.chain_id, []).append(r)
    for v in chains.values():
        v.sort(key=lambda r: r.seq)
    return chains, out


def test_simple_path_and_branch_split(spark):
    # 1->2->3->4 plus a branch 9->3: vertex 3 has indegree 2, so the
    # chain must split there (PATH semantics).
    rows = [
        (10, 1, 2),
        (11, 2, 3),
        (12, 3, 4),
        (13, 9, 3),
    ]
    chains, out = _run(spark, rows)
    assert len(out) == 4
    # 10->11 form one polyline (vertex 2 interior), 12 and 13 stand alone
    c = chains[10]
    assert [r.eid for r in c] == [10, 11]
    assert all(not r.is_loop for r in out)
    assert [r.eid for r in chains[12]] == [12]
    assert [r.eid for r in chains[13]] == [13]


def test_duplicate_edges_split(spark):
    # duplicate edge (KEEP): both copies are their own polyline because
    # the endpoints' degrees exceed 1
    rows = [(1, 5, 6), (2, 5, 6)]
    chains, out = _run(spark, rows)
    assert len(out) == 2 and len(chains) == 2
    assert all(r.seq == 0 and not r.is_loop for r in out)


def test_cycle_canonical_start_after_max(spark):
    # all-interior cycle with edge ids 3,9,5 in walk order
    # (3: a->b, 9: b->c, 5: c->a).  CanonicalizeLoopOrder puts the max
    # id LAST, so the loop starts at 9's successor = 5, NOT at min id 3.
    rows = [(3, 100, 101), (9, 101, 102), (5, 102, 100)]
    chains, out = _run(spark, rows)
    assert len(chains) == 1
    c = list(chains.values())[0]
    assert all(r.is_loop for r in c)
    assert [r.eid for r in c] == [5, 3, 9]
    # chain_id is the component label (min edge id)
    assert c[0].chain_id == 3


def test_lollipop_splits_at_junction(spark):
    # tail 1->2 then cycle 2->3->4->2: vertex 2 has indegree 2 ->
    # non-interior -> the tail is one polyline and the cycle edges walk
    # from vertex 2 (reference BuildPath starting at the junction edge)
    rows = [(7, 1, 2), (8, 2, 3), (9, 3, 4), (6, 4, 2)]
    chains, out = _run(spark, rows)
    assert len(out) == 4
    assert [r.eid for r in chains[7]] == [7]
    walk = chains[6] if 6 in chains else chains[8]
    assert [r.eid for r in walk] == [8, 9, 6]
    assert all(not r.is_loop for r in walk)  # vertex 2 is non-interior
