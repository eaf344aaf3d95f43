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


# ---------------------------------------------------------------------------
# S2WindingOperation::Build — assemble the REGION polygon, not just the
# pointwise winding number.
# ---------------------------------------------------------------------------

#: WindingRule (s2winding_operation.h:104-121) as predicates on w.
WINDING_RULES = {
    "odd": lambda w: (w % 2) != 0,
    "nonzero": lambda w: w != 0,
    "positive": lambda w: w > 0,
    "negative": lambda w: w < 0,
}


def build_winding_polygon(
    loops: list[np.ndarray],
    ref: np.ndarray,
    ref_winding: int,
    rule: str = "odd",
    eps: float = 1e-9,
) -> list[np.ndarray]:
    """S2WindingOperation::Build (s2winding_operation.cc): the region
    {x : rule(w(x))} of an ARBITRARY loop multiset — loops may
    self-intersect, cross each other, repeat edges, or touch at
    T-junctions — returned as a simple odd-even polygon
    (small-oriented, pairwise non-crossing loops).

    With rule='odd' this is exactly the S2Builder graph normalization of
    self-intersecting input (s2builder.cc:1497+ assembles the same
    arrangement; the reference resolves winding through its graph, we
    resolve it pointwise):

    1. split every input edge at its transversal self-crossings and at
       every input vertex lying exactly in its interior (the overlay
       machinery of kernels.booleanop, i.e. the zero-radius snap case);
    2. for each DISTINCT undirected sub-edge, evaluate the winding
       number on both sides (midpoint displaced by ``eps`` along the
       edge normal; the pinned crossing kernel above) — the sub-edge is
       on the result boundary iff the rule disagrees across it, oriented
       with the rule-true region on its LEFT (duplicate edges need no
       special-casing: the winding evaluation sees the full multiset);
    3. chain the kept directed sub-edges into simple loops with the
       clockwise-first face walk (booleanop._chain).

    Robustness contract: input features (non-incident edge-to-midpoint
    distances) must be >> ``eps`` and the displaced midpoints in generic
    position w.r.t. the pinned 1e-15 zero band — the same contract the
    pointwise winding query documents.  Raises if the requested region
    is the COMPLEMENT of the representable odd-even polygon (e.g. a
    whole-sphere region), which small-oriented loops cannot encode.
    """
    from . import booleanop as bo
    from .regions import Loop, Polygon

    if rule not in WINDING_RULES:
        raise ValueError(f"unknown winding rule {rule!r}")
    R = WINDING_RULES[rule]
    ref = np.asarray(ref, np.float64)
    fl = [np.asarray(v, np.float64) for v in loops]

    edges = bo._loops_edges(fl, 0)
    splits = bo._split_points(edges, edges)
    bo._add_vertex_splits(edges, [e[3] for e in edges], splits)
    sub = bo._sub_edges(edges, splits)

    # one representative per distinct undirected sub-edge
    reps: dict[tuple, tuple] = {}
    for _, v0, v1 in sub:
        k0, k1 = v0.tobytes(), v1.tobytes()
        reps.setdefault((min(k0, k1), max(k0, k1)), (v0, v1))
    cands = list(reps.values())

    kept = []
    if cands:
        V0 = np.stack([c[0] for c in cands])
        V1 = np.stack([c[1] for c in cands])
        mid = V0 + V1
        mid /= np.linalg.norm(mid, axis=1, keepdims=True)
        nrm = np.cross(V0, V1)
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        pl = mid + eps * nrm
        pr = mid - eps * nrm
        P = np.concatenate([pl, pr])
        P /= np.linalg.norm(P, axis=1, keepdims=True)
        w = winding_numbers(fl, ref, ref_winding, P)
        k = len(cands)
        rl, rr = R(w[:k]), R(w[k:])
        for c, left_in, right_in in zip(cands, rl, rr):
            if bool(left_in) == bool(right_in):
                continue  # interior or exterior edge, not a boundary
            kept.append(c if bool(left_in) else (c[1], c[0]))

    expected_ref = bool(R(np.asarray([ref_winding]))[0])
    if not kept:
        if expected_ref:
            raise ValueError(
                "winding region is the whole sphere — not representable "
                "as a small-oriented odd-even polygon"
            )
        return []
    out = bo._normalize_small(bo._chain(kept))
    pa = Polygon([Loop(v) for v in out])
    if bool(pa.contains_points(ref[None, :])[0]) != expected_ref:
        raise ValueError(
            "winding region is the complement of the representable "
            "odd-even polygon (covers the reference point's antipodal "
            "majority) — complement the rule or move the reference"
        )
    return out
