"""Distributed polyline simplification: S2Polyline::SubsampleVertices
(s2polyline.cc:645/568, tests s2polyline_test.cc SubsampleVertices*)
over chain tables, plus a DuckDB oracle that replays the greedy wedge
walk decision-for-decision.

* ``simplify_chains`` — one groupBy(chain) applyInPandas pass; each
  chain runs the scalar kernel (kernels/simplify.py) independently, so
  the operator scales with the number of chains and skew follows the
  chain-size distribution (bound chain sizes upstream, same contract as
  chain_interpolate).  Output is INTEGER-only (chain_id, seq, n_in,
  n_kept): oracle parity is purely decision parity, which the pinned
  float shapes guarantee — no float column ever reaches the compare.
* ``subsample_oracle_sql`` — the identical algorithm in DuckDB SQL: a
  recursive CTE advances the kept-vertex walk, and each step's
  FindEndVertex scan is a list_reduce fold over per-candidate
  precomputed (distance, ray-angle, target-wedge) structs.  Every float
  expression mirrors the kernel's shape (left-assoc sums,
  reciprocal-multiply normalize, fmod-based remainder), so branch
  decisions are bit-identical.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame

from ..kernels.simplify import subsample_vertices

__all__ = ["simplify_chains", "subsample_oracle_sql"]


def simplify_chains(
    chains: DataFrame,
    tolerance: float,
    chain_col: str = "chain_id",
    seq_col: str = "seq",
) -> DataFrame:
    """SubsampleVertices per chain: (chain_id, seq, n_in, n_kept), one
    row per KEPT vertex.  ``tolerance`` is radians."""
    tol = float(tolerance)

    def one_chain(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(seq_col)
        xs = [float(v) for v in pdf["x"]]
        ys = [float(v) for v in pdf["y"]]
        zs = [float(v) for v in pdf["z"]]
        seqs = pdf[seq_col].to_list()
        kept = subsample_vertices(xs, ys, zs, tol)
        cid = pdf[chain_col].iloc[0]
        return pd.DataFrame(
            {
                chain_col: [cid] * len(kept),
                seq_col: [seqs[i] for i in kept],
                "n_in": [len(xs)] * len(kept),
                "n_kept": [len(kept)] * len(kept),
            }
        )

    return chains.groupBy(chain_col).applyInPandas(
        one_chain, f"{chain_col} long, {seq_col} long, n_in long, n_kept long"
    )


def subsample_oracle_sql(table_sql: str, tolerance: float) -> str:
    """DuckDB replay of SubsampleVertices over ``table_sql`` (must
    select chain_id, seq, x, y, z).  Returns rows (chain_id, seq, n_in,
    n_kept) for kept vertices — the same schema as simplify_chains.

    Shape notes (each mirrors kernels/simplify.py exactly):
    - remainder(x, 2pi) is fmod + Sterbenz-exact wrap (DuckDB has no
      remainder; both are exact so the forms agree bitwise except on
      exact +/-pi ties);
    - the asin() argument is guarded by the same `sin(d)=0 OR
      sin(tol) > sin(d)` predicate the kernel uses for C++'s NaN path
      (DuckDB asin throws outside [-1, 1]);
    - S1Interval Intersection/FastContains/GetLength are inlined
      CASE-for-branch.
    """
    tol = max(float(tolerance), 0.0)
    TOL = "CAST(%.17e AS DOUBLE)" % tol
    SINT = "CAST(%.17e AS DOUBLE)" % math.sin(tol)
    PI = "pi()"
    # element/state struct constructor: every field always present
    def S(bk, lo, hi, ld, ok):
        return (
            "struct_pack(j := e.j, dd := e.dd, ct := e.ct, dg := e.dg, "
            f"sm := e.sm, t0 := e.t0, t1 := e.t1, bk := {bk}, "
            f"lo := {lo}, hi := {hi}, ld := {ld}, ok := {ok})"
        )

    # S1Interval helpers on expression strings
    def fc(L, H, p):
        return (
            f"(CASE WHEN {L} > {H} "
            f"THEN (({p} >= {L} OR {p} <= {H}) "
            f"AND NOT ({L} = {PI} AND {H} = -{PI})) "
            f"ELSE ({p} >= {L} AND {p} <= {H}) END)"
        )

    def ln(L, H):
        return (
            f"(CASE WHEN {H} - {L} >= 0.0 THEN {H} - {L} "
            f"WHEN ({H} - {L}) + 2*{PI} > 0.0 THEN ({H} - {L}) + 2*{PI} "
            f"ELSE -1.0 END)"
        )

    # Contains(center): -pi maps to pi first (s1interval.cc:70)
    ctm = f"(CASE WHEN e.ct = -{PI} THEN {PI} ELSE e.ct END)"
    fcY0 = fc("a.lo", "a.hi", "e.t0")
    fcY1 = fc("a.lo", "a.hi", "e.t1")
    fcL = fc("e.t0", "e.t1", "a.lo")
    lenY = ln("e.t0", "e.t1")
    lenA = ln("a.lo", "a.hi")
    ilo = (
        f"CASE WHEN {fcY0} AND {fcY1} THEN "
        f"(CASE WHEN {lenY} < {lenA} THEN e.t0 ELSE a.lo END) "
        f"WHEN {fcY0} THEN e.t0 WHEN {fcY1} THEN a.lo "
        f"WHEN {fcL} THEN a.lo ELSE {PI} END"
    )
    ihi = (
        f"CASE WHEN {fcY0} AND {fcY1} THEN "
        f"(CASE WHEN {lenY} < {lenA} THEN e.t1 ELSE a.hi END) "
        f"WHEN {fcY0} THEN a.hi WHEN {fcY1} THEN e.t1 "
        f"WHEN {fcL} THEN a.hi ELSE -{PI} END"
    )

    step = f"""(a, e) -> CASE
      WHEN a.bk THEN a
      WHEN e.dd > {PI}/2 AND a.ld > 0.0
        THEN {S('true', 'a.lo', 'a.hi', 'a.ld', 'a.ok')}
      WHEN e.dd < a.ld AND a.ld > {TOL}
        THEN {S('true', 'a.lo', 'a.hi', 'a.ld', 'a.ok')}
      WHEN e.sm THEN {S('false', 'a.lo', 'a.hi', 'e.dd', 'e.j')}
      WHEN NOT {fc('a.lo', 'a.hi', ctm)}
        THEN {S('true', 'a.lo', 'a.hi', 'e.dd', 'a.ok')}
      WHEN e.dg THEN {S('false', PI, f'-{PI}', 'e.dd', 'e.j')}
      ELSE {S('false', ilo, ihi, 'e.dd', 'e.j')}
    END"""

    # per-candidate precompute in TWO list_transform stages (lambdas
    # cannot hold subqueries, so stage 1 binds (distance, ray-angle)
    # once and stage 2 derives the guarded target wedge from them —
    # keeping every expensive expression written exactly once).
    # Origin (ox..oz) and frame (c0*, c1*) are columns of the enclosing
    # select.  Candidate j is a 0-based vertex index; DuckDB lists are
    # 1-based, so its components are xs[j+1].
    D0 = "CAST(0 AS DOUBLE)"
    cx, cy, cz = "xs[j+1]", "ys[j+1]", "zs[j+1]"
    ux = f"(oy*{cz} - oz*{cy})"
    uy = f"(oz*{cx} - ox*{cz})"
    uz = f"(ox*{cy} - oy*{cx})"
    dd = (
        f"atan2(sqrt(({ux}*{ux} + {uy}*{uy}) + {uz}*{uz}), "
        f"(ox*{cx} + oy*{cy}) + oz*{cz})"
    )
    ct = (
        f"atan2((c1x*{cx} + c1y*{cy}) + c1z*{cz}, "
        f"(c0x*{cx} + c0y*{cy}) + c0z*{cz})"
    )
    dg = f"(sin(s.d0) = 0.0 OR {SINT} > sin(s.d0))"
    # FromPoint maps -pi -> pi before expanding (s1interval.cc:29)
    c0m = f"(CASE WHEN s.ct0 = -{PI} THEN {PI} ELSE s.ct0 END)"
    half = f"asin({SINT} / sin(s.d0))"

    def rem(x):
        # fmod + wrap into [-pi, pi] (== IEEE remainder, see kernel)
        return (
            f"(CASE WHEN fmod({x}, 2*{PI}) > {PI} "
            f"THEN fmod({x}, 2*{PI}) - 2*{PI} "
            f"WHEN fmod({x}, 2*{PI}) < -{PI} "
            f"THEN fmod({x}, 2*{PI}) + 2*{PI} "
            f"ELSE fmod({x}, 2*{PI}) END)"
        )

    t0r = rem(f"({c0m} - {half})")
    t1r = rem(f"({c0m} + {half})")
    cand = f"""list_transform(
      list_transform(
        generate_series(CAST(idx AS BIGINT) + 1, n - 1),
        j -> struct_pack(j := j, d0 := {dd}, ct0 := {ct})),
      s -> struct_pack(
          j := s.j, dd := s.d0, ct := s.ct0, dg := {dg},
          sm := s.d0 <= {TOL},
          t0 := CASE WHEN {dg} THEN {D0}
                     WHEN {t0r} <= -{PI} THEN {PI} ELSE {t0r} END,
          t1 := CASE WHEN {dg} THEN {D0} ELSE {t1r} END,
          bk := false, lo := {D0}, hi := {D0}, ld := {D0},
          ok := CAST(0 AS BIGINT))
    )"""
    init = (
        f"struct_pack(j := CAST(idx AS BIGINT), dd := {D0}, ct := {D0}, "
        f"dg := false, sm := false, t0 := {D0}, t1 := {D0}, bk := false, "
        f"lo := -{PI}, hi := {PI}, ld := {D0}, ok := CAST(idx AS BIGINT))"
    )

    # FindEndVertex is evaluated NON-recursively for EVERY possible
    # origin (one fold per (chain, origin) row), and the recursive part
    # is then a lambda-free pointer walk over the precomputed `nxt`
    # table.  (A first cut ran the fold inside the recursive term;
    # DuckDB 1.0 evaluated the outer-column-capturing lambdas
    # nondeterministically there — ~60% of chains came back wrong,
    # differently per run.  Outside recursion the same machinery is
    # deterministic.)  Cost: O(n) folds per chain instead of O(kept) —
    # an oracle-only constant factor.
    return f"""
WITH RECURSIVE pts AS MATERIALIZED ({table_sql}),
chains AS MATERIALIZED (
  SELECT chain_id,
         list(x ORDER BY seq) AS xs,
         list(y ORDER BY seq) AS ys,
         list(z ORDER BY seq) AS zs,
         list(seq ORDER BY seq) AS seqs,
         count(*) AS n
  FROM pts GROUP BY chain_id
),
allnext AS MATERIALIZED (
  SELECT chain_id, idx, n, nxt,
         xs[idx+1] = xs[nxt+1] AND ys[idx+1] = ys[nxt+1]
           AND zs[idx+1] = zs[nxt+1] AS same_vertex
  FROM (
  SELECT chain_id, idx, n, xs, ys, zs,
         list_reduce(list_prepend({init}, {cand}), {step}).ok AS nxt
  FROM (
    -- frame at the origin: c2 = origin, c1 = Ortho(origin),
    -- c0 = c1 x origin (s2pointutil.cc GetFrame)
    SELECT *,
           (c1y*oz - c1z*oy) AS c0x,
           (c1z*ox - c1x*oz) AS c0y,
           (c1x*oy - c1y*ox) AS c0z
    FROM (
      SELECT *, crx*rcn AS c1x, cry*rcn AS c1y, crz*rcn AS c1z
      FROM (
        SELECT *, CASE WHEN sqrt((crx*crx + cry*cry) + crz*crz) <> 0.0
                       THEN 1.0 / sqrt((crx*crx + cry*cry) + crz*crz)
                       ELSE sqrt((crx*crx + cry*cry) + crz*crz)
                  END AS rcn
        FROM (
          SELECT *,
                 (oy*tmz - oz*tmy) AS crx,
                 (oz*tmx - ox*tmz) AS cry,
                 (ox*tmy - oy*tmx) AS crz
          FROM (
            SELECT *,
                   CASE WHEN k = 0 THEN 1.0 ELSE CAST(0.012 AS DOUBLE) END AS tmx,
                   CASE WHEN k = 1 THEN 1.0 ELSE CAST(0.0053 AS DOUBLE) END AS tmy,
                   CASE WHEN k = 2 THEN 1.0 ELSE CAST(0.00457 AS DOUBLE) END AS tmz
            FROM (
              SELECT *, CASE WHEN lac = 0 THEN 2 ELSE lac - 1 END AS k
              FROM (
                SELECT c.chain_id, CAST(oi.i AS BIGINT) AS idx,
                       c.xs, c.ys, c.zs, c.n,
                       c.xs[oi.i+1] AS ox, c.ys[oi.i+1] AS oy,
                       c.zs[oi.i+1] AS oz,
                       CASE WHEN abs(c.xs[oi.i+1]) > abs(c.ys[oi.i+1])
                            THEN CASE WHEN abs(c.xs[oi.i+1]) > abs(c.zs[oi.i+1])
                                      THEN 0 ELSE 2 END
                            ELSE CASE WHEN abs(c.ys[oi.i+1]) > abs(c.zs[oi.i+1])
                                      THEN 1 ELSE 2 END
                       END AS lac
                FROM chains c, unnest(generate_series(0, c.n - 2)) AS oi(i)
              )
            )
          )
        )
      )
    )
  )
  )
),
walk(chain_id, idx, kept, n) AS (
  SELECT chain_id, CAST(0 AS BIGINT) AS idx, [CAST(0 AS BIGINT)] AS kept, n
  FROM chains
  UNION ALL
  SELECT w.chain_id, a.nxt,
         CASE WHEN a.same_vertex THEN w.kept
              ELSE list_append(w.kept, a.nxt) END,
         w.n
  FROM walk w JOIN allnext a ON a.chain_id = w.chain_id AND a.idx = w.idx
  WHERE w.idx + 1 < w.n
)
SELECT f.chain_id,
       c.seqs[k + 1] AS seq,
       c.n AS n_in,
       len(f.kept) AS n_kept
FROM (SELECT chain_id, kept FROM walk WHERE idx + 1 >= n) f
JOIN chains c ON c.chain_id = f.chain_id
CROSS JOIN unnest(f.kept) AS u(k)
"""


def simplify_chains_disc(
    chains: DataFrame,
    tolerance: float,
    chain_col: str = "chain_id",
    seq_col: str = "seq",
) -> DataFrame:
    """S2PolylineSimplifier canonical loop per chain (kernels/
    polyline_simplifier.py — the disc-constraint simplifier S2Builder's
    simplify_edge_chains uses): (chain_id, seq, n_in, n_kept), one row
    per KEPT vertex.  Same dataflow contract as simplify_chains."""
    from ..kernels.polyline_simplifier import simplify_polyline

    tol = float(tolerance)

    def one_chain(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(seq_col)
        xs = [float(v) for v in pdf["x"]]
        ys = [float(v) for v in pdf["y"]]
        zs = [float(v) for v in pdf["z"]]
        seqs = pdf[seq_col].to_list()
        kept = simplify_polyline(xs, ys, zs, tol)
        cid = pdf[chain_col].iloc[0]
        return pd.DataFrame(
            {
                chain_col: [cid] * len(kept),
                seq_col: [seqs[i] for i in kept],
                "n_in": [len(xs)] * len(kept),
                "n_kept": [len(kept)] * len(kept),
            }
        )

    return chains.groupBy(chain_col).applyInPandas(
        one_chain, f"{chain_col} long, {seq_col} long, n_in long, n_kept long"
    )


def disc_simplify_oracle_sql(table_sql: str, tolerance: float) -> str:
    """DuckDB replay of simplify_chains_disc over ``table_sql`` (must
    select chain_id, seq, x, y, z) — the S2PolylineSimplifier state
    machine as a LAMBDA-FREE recursive CTE:

    for every possible origin vertex, the per-candidate quantities
    (chord2, bearing, conservative semiwidth, target wedge) are
    precomputed in plain scalar SQL (``cand``), and a recursive CTE
    advances every origin's run one candidate per iteration
    (TargetDisc each candidate; Extend-test each candidate after the
    first; a run stops iterating at its first Extend failure).  A second
    recursion (the pointer walk) chains the per-origin break indices
    into the kept list.  Every float expression mirrors
    kernels/polyline_simplifier.py's pinned shapes: the unnormalized
    smallest-component tangent basis of Init, left-assoc chord2 / dot
    products, GetSemiwidth's conservative rounding (including the C++
    NaN path for candidates beyond ~90 degrees, folded into ``mt``),
    and the S1Interval FromPoint-Expanded / Intersection branches.

    Deliberately NO list_reduce: DuckDB 1.0 evaluates a fold whose step
    lambda returns CASE-selected structs batch-sensitively WRONG over
    full tables (same fold, same stored list, different result
    depending on surrounding rows — verified on this fixture), while
    plain-column recursion is exact."""
    from ..kernels.polyline_simplifier import chord2_of_radius

    _DBL_ERR = 0.5 * 2.220446049250313e-16
    r2v = chord2_of_radius(max(float(tolerance), 0.0))
    R2 = "CAST(%.17e AS DOUBLE)" % r2v
    SIN2R = "CAST(%.17e AS DOUBLE)" % (r2v * (1.0 - 0.25 * r2v))
    A2PAD = "CAST(%.17e AS DOUBLE)" % (64.0 * _DBL_ERR * _DBL_ERR)
    E24 = "CAST(%.17e AS DOUBLE)" % (24.0 * _DBL_ERR)
    E17 = "CAST(%.17e AS DOUBLE)" % (17.0 * _DBL_ERR)
    PI = "pi()"

    # ---- S1Interval helpers on expression strings ----
    def fc(L, H, p):
        return (
            f"(CASE WHEN {L} > {H} "
            f"THEN (({p} >= {L} OR {p} <= {H}) "
            f"AND NOT ({L} = {PI} AND {H} = -{PI})) "
            f"ELSE ({p} >= {L} AND {p} <= {H}) END)"
        )

    def ln(L, H):
        return (
            f"(CASE WHEN {H} - {L} >= 0.0 THEN {H} - {L} "
            f"WHEN ({H} - {L}) + 2*{PI} > 0.0 THEN ({H} - {L}) + 2*{PI} "
            f"ELSE -1.0 END)"
        )

    # Intersection of window (s.lo, s.hi) with target (c.t0, c.t1)
    fcY0 = fc("s.lo", "s.hi", "c.t0")
    fcY1 = fc("s.lo", "s.hi", "c.t1")
    fcL = fc("c.t0", "c.t1", "s.lo")
    lenY = ln("c.t0", "c.t1")
    lenA = ln("s.lo", "s.hi")
    ilo = (
        f"CASE WHEN {fcY0} AND {fcY1} THEN "
        f"(CASE WHEN {lenY} < {lenA} THEN c.t0 ELSE s.lo END) "
        f"WHEN {fcY0} THEN c.t0 WHEN {fcY1} THEN s.lo "
        f"WHEN {fcL} THEN s.lo ELSE {PI} END"
    )
    ihi = (
        f"CASE WHEN {fcY0} AND {fcY1} THEN "
        f"(CASE WHEN {lenY} < {lenA} THEN c.t1 ELSE s.hi END) "
        f"WHEN {fcY0} THEN s.hi WHEN {fcY1} THEN c.t1 "
        f"WHEN {fcL} THEN s.hi ELSE -{PI} END"
    )

    # Extend failure: edge > 90 degrees (chord2 > 2) or bearing outside
    # the window; Contains(ct) maps -pi -> pi first (s1interval.cc:70).
    ctm = f"(CASE WHEN c.ct = -{PI} THEN {PI} ELSE c.ct END)"
    xfail = (
        f"(NOT c.fst AND (c.c2 > 2.0 OR NOT {fc('s.lo', 's.hi', ctm)}))"
    )

    # ---- per-candidate scalar precompute (plain SQL, layered) ----
    c2e = (
        "(((ox-cx)*(ox-cx) + (oy-cy)*(oy-cy)) + (oz-cz)*(oz-cz))"
    )
    dire = (
        "atan2((cx*ydx + cy*ydy) + cz*ydz, (cx*xdx + cy*xdy) + cz*xdz)"
    )
    a2 = f"(c2 + {A2PAD})"
    s2a = f"({a2}*(1.0 - 0.25*{a2}))"
    nc = f"({a2} <= {R2})"
    bad = f"({s2a} <= 0.0 OR {SIN2R} > {s2a})"
    swraw = f"asin(sqrt({SIN2R} / {s2a}))"
    sw_guarded = (
        f"CASE WHEN {nc} OR {bad} THEN 0.0 "
        f"ELSE ({swraw} - ({E24} + {E17}*{swraw})) END"
    )
    c0m = f"(CASE WHEN ct = -{PI} THEN {PI} ELSE ct END)"

    def rem(x):
        # fmod + wrap into [-pi, pi] (== IEEE remainder, see kernel)
        return (
            f"(CASE WHEN fmod({x}, 2*{PI}) > {PI} "
            f"THEN fmod({x}, 2*{PI}) - 2*{PI} "
            f"WHEN fmod({x}, 2*{PI}) < -{PI} "
            f"THEN fmod({x}, 2*{PI}) + 2*{PI} "
            f"ELSE fmod({x}, 2*{PI}) END)"
        )

    t0r = rem(f"({c0m} - sw)")
    t1r = rem(f"({c0m} + sw)")

    return f"""
WITH RECURSIVE pts AS MATERIALIZED ({table_sql}),
chains AS MATERIALIZED (
  SELECT chain_id,
         list(x ORDER BY seq) AS xs,
         list(y ORDER BY seq) AS ys,
         list(z ORDER BY seq) AS zs,
         list(seq ORDER BY seq) AS seqs,
         count(*) AS n
  FROM pts GROUP BY chain_id
),
-- Init's tangent basis per origin: smallest-|component| axis, cyclic
-- j/k, both directions unnormalized (s2polyline_simplifier.cc:28-58)
frames AS MATERIALIZED (
    SELECT *,
           CASE si WHEN 0 THEN 0.0 WHEN 1 THEN -oz ELSE oy END AS ydx,
           CASE si WHEN 0 THEN oz WHEN 1 THEN 0.0 ELSE -ox END AS ydy,
           CASE si WHEN 0 THEN -oy WHEN 1 THEN ox ELSE 0.0 END AS ydz,
           CASE si WHEN 0 THEN oy*oy + oz*oz
                   WHEN 1 THEN -(ox*oy) ELSE -(ox*oz) END AS xdx,
           CASE si WHEN 0 THEN -(oy*ox)
                   WHEN 1 THEN oz*oz + ox*ox ELSE -(oy*oz) END AS xdy,
           CASE si WHEN 0 THEN -(oz*ox)
                   WHEN 1 THEN -(oz*oy) ELSE ox*ox + oy*oy END AS xdz
    FROM (
      SELECT c.chain_id, CAST(oi.i AS BIGINT) AS idx, c.n,
             c.xs[oi.i+1] AS ox, c.ys[oi.i+1] AS oy, c.zs[oi.i+1] AS oz,
             c.xs, c.ys, c.zs,
             CASE WHEN abs(c.xs[oi.i+1]) < abs(c.ys[oi.i+1])
                  THEN CASE WHEN abs(c.xs[oi.i+1]) < abs(c.zs[oi.i+1])
                            THEN 0 ELSE 2 END
                  ELSE CASE WHEN abs(c.ys[oi.i+1]) < abs(c.zs[oi.i+1])
                            THEN 1 ELSE 2 END
             END AS si
      FROM chains c, unnest(generate_series(0, c.n - 2)) AS oi(i)
    )
),
cand0 AS MATERIALIZED (
  SELECT chain_id, idx, n,
         CAST(jj.j AS BIGINT) AS i,
         CAST(jj.j AS BIGINT) - idx AS pos,
         jj.j = idx + 1 AS fst,
         {c2e.replace('cx', 'xs[jj.j+1]').replace('cy', 'ys[jj.j+1]').replace('cz', 'zs[jj.j+1]')} AS c2,
         {dire.replace('cx', 'xs[jj.j+1]').replace('cy', 'ys[jj.j+1]').replace('cz', 'zs[jj.j+1]')} AS ct
  FROM frames, unnest(generate_series(CAST(idx AS BIGINT) + 1, n - 1)) AS jj(j)
),
cand1 AS MATERIALIZED (
  SELECT chain_id, idx, n, i, pos, fst, c2, ct,
         {nc} AS nc,
         (NOT {nc} AND {bad}) AS mt0,
         {sw_guarded} AS sw
  FROM cand0
),
cand AS MATERIALIZED (
  SELECT chain_id, idx, n, i, pos, fst, c2, ct, nc,
         (NOT nc AND (mt0 OR sw < 0.0)) AS mt,
         CASE WHEN nc OR (NOT nc AND (mt0 OR sw < 0.0)) THEN 0.0
              WHEN {t0r} <= -{PI} THEN {PI} ELSE {t0r} END AS t0,
         CASE WHEN nc OR (NOT nc AND (mt0 OR sw < 0.0)) THEN 0.0
              ELSE {t1r} END AS t1
  FROM cand1
),
-- one run per origin, all origins advancing in lockstep; a run stops
-- iterating at its first Extend failure (its final state is already in
-- the recursion's union output)
states AS (
  SELECT chain_id, idx, n, CAST(0 AS BIGINT) AS pos,
         -{PI} AS lo, {PI} AS hi, false AS bk, n - 1 AS nxt
  FROM frames
  UNION ALL
  SELECT s.chain_id, s.idx, s.n, s.pos + 1,
         CASE WHEN {xfail} THEN s.lo
              WHEN c.nc THEN s.lo WHEN c.mt THEN {PI} ELSE {ilo} END AS lo,
         CASE WHEN {xfail} THEN s.hi
              WHEN c.nc THEN s.hi WHEN c.mt THEN -{PI} ELSE {ihi} END AS hi,
         {xfail} AS bk,
         CASE WHEN {xfail} THEN c.i - 1 ELSE s.nxt END AS nxt
  FROM states s
  JOIN cand c ON c.chain_id = s.chain_id AND c.idx = s.idx
             AND c.pos = s.pos + 1
  WHERE NOT s.bk
),
allnext AS MATERIALIZED (
  SELECT chain_id, idx, nxt
  FROM states
  QUALIFY row_number() OVER (
    PARTITION BY chain_id, idx
    ORDER BY CASE WHEN bk THEN 1 ELSE 0 END DESC, pos DESC
  ) = 1
),
walk(chain_id, idx, kept, n) AS (
  SELECT chain_id, CAST(0 AS BIGINT) AS idx, [CAST(0 AS BIGINT)] AS kept, n
  FROM chains
  UNION ALL
  SELECT w.chain_id, a.nxt, list_append(w.kept, a.nxt), w.n
  FROM walk w JOIN allnext a ON a.chain_id = w.chain_id AND a.idx = w.idx
  WHERE w.idx + 1 < w.n
)
SELECT f.chain_id,
       c.seqs[k + 1] AS seq,
       c.n AS n_in,
       len(f.kept) AS n_kept
FROM (SELECT chain_id, kept FROM walk WHERE idx + 1 >= n) f
JOIN chains c ON c.chain_id = f.chain_id
CROSS JOIN unnest(f.kept) AS u(k)
"""
