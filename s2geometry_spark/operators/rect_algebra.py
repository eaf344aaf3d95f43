"""S2LatLngRect pair algebra — Contains / Intersects / Union /
Intersection with full longitude-wrap semantics.

Parity targets:
* R1Interval (r1interval.h:114-199): Contains :114, Intersects :128,
  Union :189, Intersection :197 — plain min/max interval arithmetic;
* S1Interval (s1interval.cc): FastContains :62, Contains :89,
  Intersects :112, Union :226, Intersection :257, GetLength,
  PositiveDistance :133 — the wrapping circle-interval algebra where
  an interval with lo > hi is "inverted" (crosses the ±π seam);
* S2LatLngRect::Contains/Intersects/Union/Intersection
  (s2latlng_rect.cc) — per-axis conjunction/composition, with
  Intersection normalizing to the canonical Empty rect when either
  axis comes back empty.

Everything is comparison/min/max/±/CASE arithmetic on doubles — no
transcendentals — so Spark codegen and DuckDB evaluate ONE shared
generated SQL text bit-identically.

Fixture contract (asserted in tests): input intervals are non-empty
and non-full, and endpoints never equal ±π exactly, so the
empty/full-INPUT code paths of the reference (unreachable under the
contract) are not generated; Union may still produce Full and
Intersection Empty, which ARE generated (the reference literals).

Scale: the rect table is a pure projection of the fact table; the
pairing is one equi-join on a derived key; every output column is
whole-stage codegen.  At 10^12 rows this is scan → hash join → project.
"""

from __future__ import annotations

import math

PI = "%.17e" % math.pi
TWO_PI = "%.17e" % (2.0 * math.pi)


# ---------- R1Interval (r1interval.h) ----------


def r1_contains(xlo: str, xhi: str, ylo: str, yhi: str) -> str:
    return f"((({ylo}) > ({yhi})) OR ((({ylo}) >= ({xlo})) AND (({yhi}) <= ({xhi}))))"


def r1_intersects(xlo: str, xhi: str, ylo: str, yhi: str) -> str:
    return (
        f"(CASE WHEN ({xlo}) <= ({ylo}) "
        f"THEN (({ylo}) <= ({xhi}) AND ({ylo}) <= ({yhi})) "
        f"ELSE (({xlo}) <= ({yhi}) AND ({xlo}) <= ({xhi})) END)"
    )


def r1_union_lo(xlo: str, ylo: str) -> str:
    return f"least({xlo}, {ylo})"


def r1_union_hi(xhi: str, yhi: str) -> str:
    return f"greatest({xhi}, {yhi})"


def r1_inter_lo(xlo: str, ylo: str) -> str:
    return f"greatest({xlo}, {ylo})"


def r1_inter_hi(xhi: str, yhi: str) -> str:
    return f"least({xhi}, {yhi})"


# ---------- S1Interval (s1interval.cc) ----------


def _inv(lo: str, hi: str) -> str:
    return f"(({lo}) > ({hi}))"


def s1_fast_contains(xlo: str, xhi: str, p: str) -> str:
    """FastContains (s1interval.cc:62-68), non-empty input."""
    return (
        f"(CASE WHEN {_inv(xlo, xhi)} "
        f"THEN (({p}) >= ({xlo}) OR ({p}) <= ({xhi})) "
        f"ELSE (({p}) >= ({xlo}) AND ({p}) <= ({xhi})) END)"
    )


def s1_contains(xlo: str, xhi: str, ylo: str, yhi: str) -> str:
    """Contains (s1interval.cc:89-100), non-empty non-full inputs."""
    both = f"((({ylo}) >= ({xlo})) AND (({yhi}) <= ({xhi})))"
    return (
        f"(CASE WHEN {_inv(xlo, xhi)} "
        f"THEN (CASE WHEN {_inv(ylo, yhi)} THEN {both} "
        f"ELSE ((({ylo}) >= ({xlo})) OR (({yhi}) <= ({xhi}))) END) "
        f"ELSE (CASE WHEN {_inv(ylo, yhi)} THEN FALSE ELSE {both} END) END)"
    )


def s1_intersects(xlo: str, xhi: str, ylo: str, yhi: str) -> str:
    """Intersects (s1interval.cc:112-122), non-empty inputs."""
    either = f"((({ylo}) <= ({xhi})) OR (({yhi}) >= ({xlo})))"
    return (
        f"(CASE WHEN {_inv(xlo, xhi)} "
        f"THEN ({_inv(ylo, yhi)} OR {either}) "
        f"ELSE (CASE WHEN {_inv(ylo, yhi)} THEN {either} "
        f"ELSE ((({ylo}) <= ({xhi})) AND (({yhi}) >= ({xlo}))) END) END)"
    )


def s1_length(lo: str, hi: str) -> str:
    """GetLength for non-empty intervals (the -1 branch is unreachable)."""
    return (
        f"(CASE WHEN (({hi}) - ({lo})) >= 0e0 THEN (({hi}) - ({lo})) "
        f"ELSE ((({hi}) - ({lo})) + {TWO_PI}) END)"
    )


def _pos_dist(a: str, b: str) -> str:
    """PositiveDistance (s1interval.cc:133-143) — note the pinned
    (b + π) - (a - π) form, NOT b - a + 2π."""
    return (
        f"(CASE WHEN (({b}) - ({a})) >= 0e0 THEN (({b}) - ({a})) "
        f"ELSE ((({b}) + {PI}) - (({a}) - {PI})) END)"
    )


def _s1_union_branch(
    xlo: str, xhi: str, ylo: str, yhi: str, pick_lo: bool
) -> str:
    """Union (s1interval.cc:226-255): one CASE tree per output endpoint."""
    fc_ylo = s1_fast_contains(xlo, xhi, ylo)
    fc_yhi = s1_fast_contains(xlo, xhi, yhi)
    fc_xlo_in_y = s1_fast_contains(ylo, yhi, xlo)
    contains = s1_contains(xlo, xhi, ylo, yhi)
    closer = f"({_pos_dist(yhi, xlo)} < {_pos_dist(xhi, ylo)})"
    full = f"(0e0 - {PI})" if pick_lo else PI
    if pick_lo:
        v_contained, v_lo_in, v_hi_in, v_y, v_dlo, v_dhi = (
            xlo, xlo, ylo, ylo, ylo, xlo,
        )
    else:
        v_contained, v_lo_in, v_hi_in, v_y, v_dlo, v_dhi = (
            xhi, yhi, xhi, yhi, xhi, yhi,
        )
    return (
        f"(CASE WHEN {fc_ylo} AND {fc_yhi} THEN "
        f"(CASE WHEN {contains} THEN ({v_contained}) ELSE {full} END) "
        f"WHEN {fc_ylo} THEN ({v_lo_in}) "
        f"WHEN {fc_yhi} THEN ({v_hi_in}) "
        f"WHEN {fc_xlo_in_y} THEN ({v_y}) "
        f"WHEN {closer} THEN ({v_dlo}) ELSE ({v_dhi}) END)"
    )


def s1_union_lo(xlo, xhi, ylo, yhi):
    return _s1_union_branch(xlo, xhi, ylo, yhi, True)


def s1_union_hi(xlo, xhi, ylo, yhi):
    return _s1_union_branch(xlo, xhi, ylo, yhi, False)


def _s1_inter_branch(
    xlo: str, xhi: str, ylo: str, yhi: str, pick_lo: bool
) -> str:
    """Intersection (s1interval.cc:257-281): the disjoint branch emits
    the canonical Empty endpoints (π, -π)."""
    fc_ylo = s1_fast_contains(xlo, xhi, ylo)
    fc_yhi = s1_fast_contains(xlo, xhi, yhi)
    fc_xlo_in_y = s1_fast_contains(ylo, yhi, xlo)
    shorter_y = f"({s1_length(ylo, yhi)} < {s1_length(xlo, xhi)})"
    empty = PI if pick_lo else f"(0e0 - {PI})"
    if pick_lo:
        v_y, v_x, v_lo_in, v_hi_in = ylo, xlo, ylo, xlo
    else:
        v_y, v_x, v_lo_in, v_hi_in = yhi, xhi, xhi, yhi
    return (
        f"(CASE WHEN {fc_ylo} AND {fc_yhi} THEN "
        f"(CASE WHEN {shorter_y} THEN ({v_y}) ELSE ({v_x}) END) "
        f"WHEN {fc_ylo} THEN ({v_lo_in}) "
        f"WHEN {fc_yhi} THEN ({v_hi_in}) "
        f"WHEN {fc_xlo_in_y} THEN ({v_x}) ELSE {empty} END)"
    )


def s1_inter_lo(xlo, xhi, ylo, yhi):
    return _s1_inter_branch(xlo, xhi, ylo, yhi, True)


def s1_inter_hi(xlo, xhi, ylo, yhi):
    return _s1_inter_branch(xlo, xhi, ylo, yhi, False)


def s1_inter_is_empty(xlo, xhi, ylo, yhi) -> str:
    """True iff Intersection falls through every FastContains branch."""
    return (
        f"(NOT {s1_fast_contains(xlo, xhi, ylo)} "
        f"AND NOT {s1_fast_contains(xlo, xhi, yhi)} "
        f"AND NOT {s1_fast_contains(ylo, yhi, xlo)})"
    )


# ---------- S2LatLngRect pair outputs ----------

# (output column, generator) — a/b rect columns are
# {a,b}lat_lo/{a,b}lat_hi (R1) and {a,b}lng_lo/{a,b}lng_hi (S1)
def rect_pair_exprs() -> dict[str, str]:
    alat = ("alat_lo", "alat_hi")
    blat = ("blat_lo", "blat_hi")
    alng = ("alng_lo", "alng_hi")
    blng = ("blng_lo", "blng_hi")
    lat_inter_lo = r1_inter_lo(alat[0], blat[0])
    lat_inter_hi = r1_inter_hi(alat[1], blat[1])
    lat_empty = f"(({lat_inter_lo}) > ({lat_inter_hi}))"
    lng_empty = s1_inter_is_empty(*alng, *blng)
    any_empty = f"({lat_empty} OR {lng_empty})"
    return {
        "a_contains_b": (
            f"({r1_contains(*alat, *blat)} AND {s1_contains(*alng, *blng)})"
        ),
        "b_contains_a": (
            f"({r1_contains(*blat, *alat)} AND {s1_contains(*blng, *alng)})"
        ),
        "intersects": (
            f"({r1_intersects(*alat, *blat)} AND {s1_intersects(*alng, *blng)})"
        ),
        "union_lat_lo": r1_union_lo(alat[0], blat[0]),
        "union_lat_hi": r1_union_hi(alat[1], blat[1]),
        "union_lng_lo": s1_union_lo(*alng, *blng),
        "union_lng_hi": s1_union_hi(*alng, *blng),
        # Intersection with the Empty-rect normalization
        # (s2latlng_rect.cc Intersection): R1Empty = [1, 0],
        # S1Empty = [π, -π]
        "inter_lat_lo": f"(CASE WHEN {any_empty} THEN 1e0 ELSE ({lat_inter_lo}) END)",
        "inter_lat_hi": f"(CASE WHEN {any_empty} THEN 0e0 ELSE ({lat_inter_hi}) END)",
        "inter_lng_lo": (
            f"(CASE WHEN {any_empty} THEN {PI} ELSE ({s1_inter_lo(*alng, *blng)}) END)"
        ),
        "inter_lng_hi": (
            f"(CASE WHEN {any_empty} THEN (0e0 - {PI}) "
            f"ELSE ({s1_inter_hi(*alng, *blng)}) END)"
        ),
        "inter_empty": any_empty,
    }


# ---------- deterministic rect synthesis (shared SQL text) ----------


def rect_synth_exprs(pid: str) -> dict[str, str]:
    """Four rect endpoints from an integer key: lat clamped to
    (-π/2, π/2), lng wrapped across the ±π seam ONE turn (magnitudes
    bounded by construction), so wrapping (inverted) lng intervals
    occur naturally.  Keys ≡ 0, 3 (mod 4) get 3× larger rects, so
    BOTH containment directions occur across the (even, even+1)
    pairing."""
    h1 = f"((({pid}) * 2654435761) % 1000003)"
    h2 = f"((({pid}) * 1103515245 + 54321) % 1000033)"
    big = f"(CASE WHEN ({pid}) % 4 IN (0, 3) THEN 3e0 ELSE 1e0 END)"
    clat = f"((CAST({h1} % 300 AS DOUBLE) - 1.5e2) * 1e-2)"
    hlat = f"((1e0 + CAST({h1} % 37 AS DOUBLE)) * 1e-2 * {big})"
    clng = f"((CAST({h2} % 628 AS DOUBLE) - 3.14e2) * 1e-2)"
    hlng = f"((1e0 + CAST({h2} % 53 AS DOUBLE)) * 1e-2 * {big})"

    def wrap(v: str) -> str:
        return (
            f"(CASE WHEN ({v}) < (0e0 - {PI}) THEN ({v}) + {TWO_PI} "
            f"WHEN ({v}) > {PI} THEN ({v}) - {TWO_PI} ELSE ({v}) END)"
        )

    return {
        "lat_lo": f"greatest(-1.57e0, {clat} - {hlat})",
        "lat_hi": f"least(1.57e0, {clat} + {hlat})",
        "lng_lo": wrap(f"({clng} - {hlng})"),
        "lng_hi": wrap(f"({clng} + {hlng})"),
    }
