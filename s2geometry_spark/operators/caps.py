"""S2Cap pair algebra as a distributed spatial self-join.

Parity target: the cap-vs-cap predicates of s2cap.cc —
``Contains(const S2Cap&)`` (s2cap.cc:73-76: ``radius_ >=
S1ChordAngle(center_, other.center_) + other.radius_``),
``Intersects`` (:78-81) and ``InteriorIntersects`` (:83-87) — built on
S1ChordAngle addition (s1chord_angle.cc:75-110), which is CLOSED FORM
in doubles:

    add(a2, b2) = a2                      if b2 == 0
                = 4                       if a2 + b2 >= 4
                = x + y + 2*sqrt(x*y)     otherwise,
      x = a2*(1 - 0.25*b2),  y = b2*(1 - 0.25*a2)

so the whole relation family is expressible as ONE generated SQL text
that Spark codegen and DuckDB evaluate identically (no asin, no
transcendental drift).

Distributed shape: "which caps overlap" over N caps is the
epsilon-neighborhood self-join — candidates from the kMinWidth-
certified grid-neighbor equi-join at the conservative bound
add(r2max, r2max) (chord-angle addition is monotone in both arguments,
so no intersecting pair can exceed it), relations refined in codegen.
One shuffle keyed by grid cells; candidates density-bounded, never
O(n²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .knn import within_distance_pairs


def chord_add_sql(a2: str, b2: str) -> str:
    """S1ChordAngle operator+ (s1chord_angle.cc:75-110) as SQL text —
    the IDENTICAL string is evaluated by Spark and DuckDB."""
    x = f"(({a2}) * (1e0 - 2.5e-1 * ({b2})))"
    y = f"(({b2}) * (1e0 - 2.5e-1 * ({a2})))"
    return (
        f"(CASE WHEN ({b2}) = 0e0 THEN ({a2}) "
        f"WHEN ({a2}) + ({b2}) >= 4e0 THEN 4e0 "
        f"ELSE {x} + {y} + 2e0 * sqrt({x} * {y}) END)"
    )


def radius2_sql(pid: str, r2_unit: float, n_radii: int) -> str:
    """Deterministic per-cap squared-chord radius: r2_unit * (1 + pid mod n)."""
    return f"(CAST({r2_unit!r} AS DOUBLE) * (1e0 + CAST(({pid}) % {n_radii} AS DOUBLE)))"


def conservative_pair_bound(r2_unit: float, n_radii: int) -> float:
    """add(r2max, r2max) — the largest center distance any intersecting
    pair can have (monotonicity of chord-angle addition)."""
    r2max = r2_unit * n_radii
    x = r2max * (1.0 - 0.25 * r2max)
    return min(4.0, 4.0 * x)


def cap_pair_relations(
    points: DataFrame, r2_unit: float, n_radii: int = 7
) -> DataFrame:
    """(pid_a, pid_b, dist_chord2, interior_intersects, a_contains_b,
    b_contains_a) for every INTERSECTING unordered cap pair.

    Caps: center = the point, radius² = radius2_sql(pid).  Emitted rows
    all satisfy Intersects (s2cap.cc:78-81); the three flags carry the
    rest of the relation lattice.
    """
    pairs = within_distance_pairs(
        points, conservative_pair_bound(r2_unit, n_radii)
    )
    df = pairs.withColumn(
        "r2_a", F.expr(radius2_sql("pid_a", r2_unit, n_radii))
    ).withColumn("r2_b", F.expr(radius2_sql("pid_b", r2_unit, n_radii)))
    add_ab = F.expr(chord_add_sql("r2_a", "r2_b"))
    add_db = F.expr(chord_add_sql("dist_chord2", "r2_b"))
    add_da = F.expr(chord_add_sql("dist_chord2", "r2_a"))
    return (
        df.where(add_ab >= F.col("dist_chord2"))
        .select(
            "pid_a",
            "pid_b",
            "dist_chord2",
            (add_ab > F.col("dist_chord2")).alias("interior_intersects"),
            (F.col("r2_a") >= add_db).alias("a_contains_b"),
            (F.col("r2_b") >= add_da).alias("b_contains_a"),
        )
    )


def cap_pair_relations_oracle_sql(
    xyz_cte: str, r2_unit: float, n_radii: int = 7
) -> str:
    """Brute-force O(n²) oracle with the identical generated SQL text
    for chord², radii, and chord-angle addition."""
    d2 = (
        "(((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))"
        " + (a.z - b.z) * (a.z - b.z))"
    )
    r2a = radius2_sql("a.pid", r2_unit, n_radii)
    r2b = radius2_sql("b.pid", r2_unit, n_radii)
    add_ab = chord_add_sql(r2a, r2b)
    add_db = chord_add_sql(d2, r2b)
    add_da = chord_add_sql(d2, r2a)
    return f"""
WITH {xyz_cte}
SELECT a.pid AS pid_a, b.pid AS pid_b, {d2} AS dist_chord2,
       {add_ab} > {d2} AS interior_intersects,
       {r2a} >= {add_db} AS a_contains_b,
       {r2b} >= {add_da} AS b_contains_a
FROM xyz a JOIN xyz b ON a.pid < b.pid
WHERE {add_ab} >= {d2}
"""
