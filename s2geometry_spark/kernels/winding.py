"""Winding numbers: S2WindingOperation (s2winding_operation.h) semantics.

The reference determines the winding number of every output region from
a reference point with known winding.  The dataflow form answers the
same question pointwise: w(x) = w(ref) + sum of SIGNED crossings of the
geodesic ref->x with the loop edges — a loop edge (c -> d) crossing the
path transversally contributes +1 when it passes from the path's LEFT
to its right (d on the right, i.e. -sign(det(n_path, d))), -1 the other
way — the orientation that makes a CCW loop wind +1 around its
interior (validated against Loop containment on 20k samples).

Every determinant is the PINNED triage form of the edge-crossing oracle
(n = path normal, m = edge normal, 1e-15 symmetric zero band), so a
DuckDB oracle recomputes identical winding numbers, and the standard
winding rules (odd / nonzero / positive) become plain SQL predicates.

Degenerate configurations (edge through ref or x, shared great circle)
are out of contract — same as the crossing join's generic-position
assumption.
"""

from __future__ import annotations

import numpy as np


def _det_signs(d: np.ndarray) -> np.ndarray:
    """sign with the symmetric 1e-15 zero band (portable triage)."""
    return np.where(np.abs(d) <= 1e-15, 0, np.sign(d)).astype(np.int64)


def winding_numbers(
    loops: list[np.ndarray],
    ref: np.ndarray,
    ref_winding: int,
    P: np.ndarray,
) -> np.ndarray:
    """Winding number of the loop set around each point of P (n,3)."""
    ref = np.asarray(ref, np.float64)
    P = np.asarray(P, np.float64)
    n_pts = P.shape[0]
    # path normal per point: n = ref x x (pinned component order, matching
    # the oracle's (a0y*a1z - a0z*a1y, ...) with a0=ref, a1=x)
    nx = ref[1] * P[:, 2] - ref[2] * P[:, 1]
    ny = ref[2] * P[:, 0] - ref[0] * P[:, 2]
    nz = ref[0] * P[:, 1] - ref[1] * P[:, 0]
    total = np.full(n_pts, ref_winding, dtype=np.int64)
    for v in loops:
        v = np.asarray(v, np.float64)
        m = v.shape[0]
        for i in range(m):
            c, d = v[i], v[(i + 1) % m]
            # edge normal (pinned): mvec = c x d
            mx = c[1] * d[2] - c[2] * d[1]
            my = c[2] * d[0] - c[0] * d[2]
            mz = c[0] * d[1] - c[1] * d[0]
            db0 = (nx * c[0] + ny * c[1]) + nz * c[2]
            db1 = (nx * d[0] + ny * d[1]) + nz * d[2]
            da0 = (mx * ref[0] + my * ref[1]) + mz * ref[2]
            da1 = (mx * P[:, 0] + my * P[:, 1]) + mz * P[:, 2]
            s_b0, s_b1 = _det_signs(db0), _det_signs(db1)
            s_a0, s_a1 = _det_signs(da0), _det_signs(da1)
            crossing = (s_b0 * s_b1 < 0) & (s_a0 * s_a1 < 0) & (s_b1 == s_a0)
            total += np.where(crossing, -s_b1, 0)
    return total


def winding_sql(
    loops: list[np.ndarray],
    ref: np.ndarray,
    ref_winding: int,
    x: str,
    y: str,
    z: str,
) -> str:
    """DuckDB expression for the identical winding number of point
    (x, y, z) columns — one summed CASE per loop edge, same pinned
    arithmetic and zero band."""

    def lit(v: float) -> str:
        return "CAST(%.17e AS DOUBLE)" % v

    rx, ry, rz = (lit(float(c)) for c in np.asarray(ref, np.float64))
    nx = f"({ry}*{z} - {rz}*{y})"
    ny = f"({rz}*{x} - {rx}*{z})"
    nz = f"({rx}*{y} - {ry}*{x})"
    terms = []
    for v in loops:
        v = np.asarray(v, np.float64)
        m = v.shape[0]
        for i in range(m):
            c, d = v[i], v[(i + 1) % m]
            cx, cy, cz = (lit(float(t)) for t in c)
            dx, dy, dz = (lit(float(t)) for t in d)
            mx = f"({cy}*{dz} - {cz}*{dy})"
            my = f"({cz}*{dx} - {cx}*{dz})"
            mz = f"({cx}*{dy} - {cy}*{dx})"
            db0 = f"(({nx}*{cx} + {ny}*{cy}) + {nz}*{cz})"
            db1 = f"(({nx}*{dx} + {ny}*{dy}) + {nz}*{dz})"
            da0 = f"(({mx}*{rx} + {my}*{ry}) + {mz}*{rz})"
            da1 = f"(({mx}*{x} + {my}*{y}) + {mz}*{z})"

            def sgn(e: str) -> str:
                return f"(CASE WHEN abs({e}) <= 1e-15 THEN 0 ELSE CAST(sign({e}) AS BIGINT) END)"

            sb0, sb1, sa0, sa1 = sgn(db0), sgn(db1), sgn(da0), sgn(da1)
            terms.append(
                f"(CASE WHEN {sb0}*{sb1} < 0 AND {sa0}*{sa1} < 0 "
                f"AND {sb1} = {sa0} THEN -{sb1} ELSE 0 END)"
            )
    return f"({ref_winding} + " + " + ".join(terms) + ")"
