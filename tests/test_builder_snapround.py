"""Snap rounding (kernels.builder.snap_round_chain) and the
inverse-Hilbert cell-center decode CTE (oracle.cell_center_xyz_cte)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from s2geometry_spark import oracle
from s2geometry_spark.kernels import cellid
from s2geometry_spark.kernels.builder import (
    snap_radius_chord2,
    snap_round_chain,
    snap_to_cell_centers,
)
from s2geometry_spark.kernels.measures import point_edge_chord2

RNG = np.random.default_rng(20260817)


def random_chain(rng, n):
    lat = np.cumsum(rng.normal(0, 0.3, n)) + 10
    lng = np.cumsum(rng.normal(0, 0.3, n))
    la, lo = np.radians(lat), np.radians(lng)
    return np.stack(
        [np.cos(la) * np.cos(lo), np.cos(la) * np.sin(lo), np.sin(la)], axis=1
    )


class TestDecodeCte:
    def test_center_decode_bitwise(self):
        v = RNG.normal(size=(50_000, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        leafs = cellid.from_xyz(v[:, 0], v[:, 1], v[:, 2])
        for lvl in (3, 10, 17, 29):
            cells = cellid.parent(leafs, lvl)
            biased = cellid.to_biased(cells)
            ex, ey, ez = cellid.to_point(cells)
            con = duckdb.connect()
            con.register("t", pd.DataFrame({"c": biased}))
            cte = oracle.cell_center_xyz_cte("t", "c", lvl)
            df = con.execute(f"WITH {cte} SELECT cx, cy, cz FROM ctr").fetchdf()
            assert np.array_equal(df.cx.to_numpy(), ex)
            assert np.array_equal(df.cy.to_numpy(), ey)
            assert np.array_equal(df.cz.to_numpy(), ez)


class TestSnapRoundChain:
    def test_guarantees_random_sweep(self):
        for trial in range(25):
            rng = np.random.default_rng(500 + trial)
            V = random_chain(rng, int(rng.integers(4, 40)))
            lvl = int(rng.integers(6, 14))
            W = snap_round_chain(V, lvl)
            if W.shape[0] < 2:
                continue
            r2 = snap_radius_chord2(lvl)
            sites = np.unique(snap_to_cell_centers(V, lvl), axis=0)
            skeys = {s.tobytes() for s in sites}
            # 1: every output vertex is a snap site
            assert all(w.tobytes() in skeys for w in W)
            E, S, m = V.shape[0] - 1, sites.shape[0], W.shape[0]
            A = np.repeat(V[:-1], S, axis=0)
            B = np.repeat(V[1:], S, axis=0)
            X = np.tile(sites, (E, 1))
            near = point_edge_chord2(X, A, B).reshape(E, S) <= r2
            wkeys = {w.tobytes() for w in W}
            # 2: every site within the snap radius of ANY input edge
            # appears on the output chain (the S2Builder replacement
            # guarantee)
            for j in np.flatnonzero(near.any(axis=0)):
                assert sites[j].tobytes() in wkeys
            # 3: every output vertex lies within the snap radius of the
            # input chain
            A2 = np.repeat(V[:-1], m, axis=0)
            B2 = np.repeat(V[1:], m, axis=0)
            X2 = np.tile(W, (E, 1))
            dmin = point_edge_chord2(X2, A2, B2).reshape(E, m).min(axis=0)
            assert (dmin <= r2 * (1 + 1e-9)).all()

    def test_collapse_to_empty(self):
        # a chain inside one level-5 cell collapses entirely
        V = random_chain(np.random.default_rng(1), 6)
        V = snap_to_cell_centers(V, 16)  # tight cluster
        W = snap_round_chain(np.repeat(V[:1], 4, axis=0), 5)
        assert W.shape == (0, 3)

    def test_no_consecutive_duplicates(self):
        V = random_chain(np.random.default_rng(2), 30)
        W = snap_round_chain(V, 9)
        assert all(
            W[i].tobytes() != W[i + 1].tobytes() for i in range(W.shape[0] - 1)
        )


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
