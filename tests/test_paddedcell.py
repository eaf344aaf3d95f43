"""S2PaddedCell kernels vs the reference's own property tests
(s2padded_cell_test.cc: S2CellMethods / GetEntryExitVertices /
ShrinkToFit), vectorized with seeded NumPy randomness."""

import numpy as np

from s2geometry_spark.kernels import cellid, coords, hilbert, paddedcell

RNG = np.random.RandomState(20260820)
N = 2000


def _random_cells(n, rng=RNG):
    """s2random::CellId analogue: random leaf via random point, then a
    uniform-random level ancestor."""
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    leafs = cellid.from_xyz(v[:, 0], v[:, 1], v[:, 2])
    lvls = rng.randint(0, 31, n)
    return cellid.parent(leafs, lvls)


def test_center_matches_cellid_to_point():
    ids = _random_cells(N)
    cx, cy, cz = paddedcell.get_center(ids)
    px, py, pz = cellid.to_point(ids)
    assert np.array_equal(cx, px) and np.array_equal(cy, py)
    assert np.array_equal(cz, pz)


def test_face_cell_fast_path_equivalence():
    """The reference special-cases face cells (s2padded_cell.cc:42-49);
    our generic decode must reproduce those fields exactly."""
    faces = np.arange(6, dtype=np.uint64)
    ids = (faces << np.uint64(61)) + (np.uint64(1) << np.uint64(60))
    f = paddedcell.padded_fields(ids, 0.25)
    assert np.array_equal(f["level"], np.zeros(6, np.int64))
    assert np.array_equal(f["orientation"], np.arange(6) & 1)
    assert np.all(f["ij_lo_i"] == 0) and np.all(f["ij_lo_j"] == 0)
    assert np.all(f["u_lo"] == -1.25) and np.all(f["u_hi"] == 1.25)
    mu0, mu1, mv0, mv1 = paddedcell.middle_rect(ids, 0.25)
    assert np.all(mu0 == -0.25) and np.all(mv1 == 0.25)


def test_child_splice_equals_direct_fields():
    """S2PaddedCell(parent, i, j) takes one bound corner from the parent
    and the opposite from middle() (s2padded_cell.cc:62-80).  Computing
    the child's fields directly from its id must agree bitwise."""
    parents = _random_cells(N)
    parents = parents[cellid.level(parents) < 30]
    pad = 1e-3
    pf = paddedcell.padded_fields(parents, pad)
    mu0, mu1, mv0, mv1 = paddedcell.middle_rect(parents, pad)
    for pos in range(4):
        ch = cellid.child(parents, pos)
        cf = paddedcell.padded_fields(ch, pad)
        # recover (i, j) of the child within the parent from ij_lo deltas
        half = pf["size"] // 2
        ci = (cf["ij_lo_i"] - pf["ij_lo_i"]) // half
        cj = (cf["ij_lo_j"] - pf["ij_lo_j"]) // half
        assert set(np.unique(ci)) <= {0, 1} and set(np.unique(cj)) <= {0, 1}
        # reference splice: bound[0][1-i] <- middle[0][1-i], keep [0][i]
        want_u_lo = np.where(ci == 1, mu0, pf["u_lo"])
        want_u_hi = np.where(ci == 1, pf["u_hi"], mu1)
        want_v_lo = np.where(cj == 1, mv0, pf["v_lo"])
        want_v_hi = np.where(cj == 1, pf["v_hi"], mv1)
        assert np.array_equal(cf["u_lo"], want_u_lo)
        assert np.array_equal(cf["u_hi"], want_u_hi)
        assert np.array_equal(cf["v_lo"], want_v_lo)
        assert np.array_equal(cf["v_hi"], want_v_hi)
        # orientation recurrence: parent ^ kPosToOrientation[pos]
        want_o = pf["orientation"] ^ hilbert.POS_TO_ORIENTATION[pos]
        assert np.array_equal(cf["orientation"], want_o)


def test_entry_exit_vertices():
    ids = _random_cells(N)
    ex = np.stack(paddedcell.get_exit_vertex(ids), axis=1)
    en_next = np.stack(
        paddedcell.get_entry_vertex(cellid.next_wrap(ids)), axis=1
    )
    assert np.array_equal(ex, en_next)
    nonleaf = ids[cellid.level(ids) < 30]
    en = np.stack(paddedcell.get_entry_vertex(nonleaf), axis=1)
    en_c0 = np.stack(
        paddedcell.get_entry_vertex(cellid.child(nonleaf, 0)), axis=1
    )
    assert np.array_equal(en, en_c0)
    ex_p = np.stack(paddedcell.get_exit_vertex(nonleaf), axis=1)
    ex_c3 = np.stack(
        paddedcell.get_exit_vertex(cellid.child(nonleaf, 3)), axis=1
    )
    assert np.array_equal(ex_p, ex_c3)


def test_shrink_to_fit_recovers_target():
    """The reference's backwards construction: build a rect that is
    contained in a target cell's padded bound but straddles two of its
    children, then shrink from a random ancestor."""
    rng = np.random.RandomState(7)
    results = _random_cells(1500, rng)
    f0 = paddedcell.padded_fields(results, 0.0)
    size_u = f0["u_hi"] - f0["u_lo"]
    size_v = f0["v_hi"] - f0["v_lo"]
    max_pad = 0.5 * np.minimum(size_u, size_v)
    pad = rng.uniform(0.0, 1.0, len(results)) * max_pad

    ru_lo = np.empty(len(results))
    ru_hi = np.empty(len(results))
    rv_lo = np.empty(len(results))
    rv_hi = np.empty(len(results))
    init = np.empty(len(results), np.uint64)
    ok = np.ones(len(results), bool)
    for n in range(len(results)):
        lo = np.array([f0["u_lo"][n] + pad[n], f0["v_lo"][n] + pad[n]])
        hi = np.array([f0["u_hi"][n] - pad[n], f0["v_hi"][n] - pad[n]])
        a = rng.uniform(lo, hi)
        b = rng.uniform(lo, hi)
        lvl = int(f0["level"][n])
        if lvl < 30:
            axis = rng.randint(2)
            si = 2 * (f0["ij_lo_i"][n] if axis == 0 else f0["ij_lo_j"][n]) + f0["size"][n]
            center = float(
                coords.st_to_uv(coords.si_ti_to_st(np.array([si])))[0]
            )
            s_lo = max(center - pad[n], lo[axis])
            s_hi = min(center + pad[n], hi[axis])
            if s_lo > s_hi:
                ok[n] = False
                continue
            mid = rng.uniform(s_lo, s_hi)
            a[axis] = rng.uniform(lo[axis], mid)
            b[axis] = rng.uniform(mid, hi[axis])
        ru_lo[n], ru_hi[n] = min(a[0], b[0]), max(a[0], b[0])
        rv_lo[n], rv_hi[n] = min(a[1], b[1]), max(a[1], b[1])
        init[n] = cellid.parent(
            results[n : n + 1], rng.randint(0, lvl + 1)
        )[0]
    m = ok
    got = paddedcell.shrink_to_fit(
        init[m], pad[m], ru_lo[m], ru_hi[m], rv_lo[m], rv_hi[m]
    )
    assert m.sum() > 1000
    assert np.array_equal(got, results[m])
