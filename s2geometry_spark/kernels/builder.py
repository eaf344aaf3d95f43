"""S2Builder subset: snap-to-cell-center snapping + degeneracy cleanup
(s2builder.h:16-70, S2CellIdSnapFunction in s2builderutil_snap_functions.h).

The full S2Builder is a 2200-line graph assembler; the subset here covers
the dominant pipeline uses — canonicalizing dirty geometry onto a snap
grid so downstream joins/dedups see identical doubles for identical
locations:

* ``snap_to_cell_centers``  — vertices -> the center of their level-L
  cell (S2CellIdSnapFunction semantics: snap radius <= half the cell
  diagonal at L).
* ``simplify_chain``        — collapse consecutive duplicate vertices a
  snap produces (degenerate edges), drop a closing duplicate.
* ``build_polyline``        — snap + simplify; empty result if the whole
  chain collapses to one point.
* ``build_loops``           — per-loop snap + simplify; loops with < 3
  distinct vertices (collapsed by snapping) are dropped, mirroring
  S2Builder's degenerate-loop handling for polygons.

Snapping is idempotent (cell centers snap to themselves), and the
snapped cell assignment is pure ``parent(leaf(v), L)`` — which is what
the SQL oracle recomputes.
"""

from __future__ import annotations

import math

import numpy as np

from . import cellid


def snap_cells(xyz: np.ndarray, level: int) -> np.ndarray:
    """uint64 snap cell per vertex: the level-L ancestor of its leaf."""
    p = np.asarray(xyz, np.float64)
    leafs = cellid.from_xyz(p[:, 0], p[:, 1], p[:, 2])
    return cellid.parent(leafs, level)


def snap_to_cell_centers(xyz: np.ndarray, level: int) -> np.ndarray:
    """(n,3) vertices snapped to their level-L cell centers (normalized)."""
    cells = snap_cells(xyz, level)
    x, y, z = cellid.to_point(cells)
    return np.stack([x, y, z], axis=1)


def simplify_chain(xyz: np.ndarray, closed: bool = False) -> np.ndarray:
    """Remove consecutive duplicate vertices (and for closed chains the
    wrap-around duplicate) — the degenerate edges snapping creates."""
    p = np.asarray(xyz, np.float64)
    if p.shape[0] == 0:
        return p
    keep = np.ones(p.shape[0], bool)
    keep[1:] = np.any(p[1:] != p[:-1], axis=1)
    out = p[keep]
    if closed and out.shape[0] > 1 and np.array_equal(out[0], out[-1]):
        out = out[:-1]
    return out


def build_polyline(xyz: np.ndarray, level: int) -> np.ndarray:
    """Snapped polyline; (0,3) if the chain collapses to a single point."""
    out = simplify_chain(snap_to_cell_centers(xyz, level))
    if out.shape[0] < 2:
        return out[:0]
    return out


def build_loops(loops: list[np.ndarray], level: int) -> list[np.ndarray]:
    """Snapped loops; loops collapsing below 3 distinct vertices drop."""
    out = []
    for v in loops:
        s = simplify_chain(snap_to_cell_centers(v, level), closed=True)
        # a loop can also degenerate to a back-and-forth sliver with
        # repeated (non-consecutive) vertices; 3+ DISTINCT vertices needed
        if s.shape[0] >= 3 and np.unique(s, axis=0).shape[0] >= 3:
            out.append(s)
    return out


# ---------------------------------------------------------------------------
# Snap ROUNDING (epsilon-radius S2Builder pass): vertex snapping alone is
# not topology-safe — a snapped edge may sweep straight past a site that
# other geometry snapped to.  S2Builder therefore replaces every INPUT
# edge by a chain through all sites within the snap radius of that edge,
# in order along it (s2builder.cc snap_rounding; guarantees in
# s2builder.h:90-150: "each edge is replaced by a chain of vertices, each
# within snap_radius of the input edge").  This is the within-chain
# subset: the site set is the chain's own snapped vertices.
# ---------------------------------------------------------------------------


def min_snap_radius_for_level(level: int) -> float:
    """Radians upper bound on S2CellIdSnapFunction snap movement at
    ``level`` (s2builderutil_snap_functions.cc:111-121: half the max
    cell diagonal plus the 4-eps conversion error budget)."""
    from . import metrics

    return 0.5 * metrics.MAX_DIAG.get_value(level) + 4.0 * np.finfo(np.float64).eps


def level_for_max_snap_radius(snap_radius_rad: float) -> int:
    """Finest level whose min snap radius fits within ``snap_radius``
    (s2builderutil_snap_functions.cc:123-128) — the inverse of
    min_snap_radius_for_level up to its error allowance."""
    from . import metrics

    return metrics.MAX_DIAG.get_level_for_max_value(
        2.0 * (snap_radius_rad - 4.0 * float(np.finfo(np.float64).eps))
    )


def snap_radius_chord2(level: int) -> float:
    """Squared chord length of the S2CellIdSnapFunction snap radius at
    ``level`` (half the max cell diagonal,
    s2builderutil_snap_functions.cc MinSnapRadiusForLevel)."""
    from . import metrics

    r = metrics.MAX_DIAG.get_value(level) / 2.0
    s = 2.0 * np.sin(r / 2.0)
    return float(s * s)


def snap_round_chain(xyz: np.ndarray, level: int) -> np.ndarray:
    """Topology-safe snap rounding of one chain (single deterministic
    pass, the S2Builder edge-replacement semantics):

    1. snap every vertex to its level-L cell center (site per vertex);
    2. replace each INPUT edge by the chain of all sites lying within
       the snap radius of that input edge, ordered along it (the edge's
       own endpoints' sites are its chain ends);
    3. collapse consecutive duplicates.

    Every output vertex is a site within snap_radius of the input chain,
    and every site within snap_radius of an input edge appears on that
    edge's replacement chain — the pair of guarantees
    tests/test_builder_snapround.py asserts.
    Returns (0,3) if the chain collapses below 2 vertices.
    """
    from .measures import point_edge_chord2

    V = np.asarray(xyz, np.float64)
    if V.shape[0] < 2:
        return V[:0]
    snapped = snap_to_cell_centers(V, level)
    sites = np.unique(snapped, axis=0)
    r2 = snap_radius_chord2(level)
    E = V.shape[0] - 1
    S = sites.shape[0]
    # distance of every site to every INPUT edge (original coordinates)
    A = np.repeat(V[:-1], S, axis=0)
    B = np.repeat(V[1:], S, axis=0)
    X = np.tile(sites, (E, 1))
    near = (point_edge_chord2(X, A, B).reshape(E, S)) <= r2
    site_cells = cellid.to_biased(snap_cells(sites, level))
    out = [snapped[0]]
    for i in range(E):
        ka, kb = snapped[i].tobytes(), snapped[i + 1].tobytes()
        ins = [
            j
            for j in np.flatnonzero(near[i])
            if sites[j].tobytes() != ka and sites[j].tobytes() != kb
        ]
        # order along the input arc a->b (monotone in -dot(s, a) for
        # arcs < pi, the overlay's _sub_edges recipe); the dot is the
        # PINNED left-assoc form and ties break on the site cell id so
        # the SQL oracle replays the identical ordering
        ax, ay, az = float(V[i, 0]), float(V[i, 1]), float(V[i, 2])
        ins.sort(
            key=lambda j: (
                -((float(sites[j, 0]) * ax + float(sites[j, 1]) * ay)
                  + float(sites[j, 2]) * az),
                int(site_cells[j]),
            )
        )
        out.extend(sites[j] for j in ins)
        out.append(snapped[i + 1])
    W = simplify_chain(np.stack(out))
    return W if W.shape[0] >= 2 else W[:0]


# ---------------------------------------------------------------------------
# IntLatLngSnapFunction (s2builderutil_snap_functions.cc:327-414): snap
# vertices to a uniform integer (lat, lng) grid in degrees * 10^exponent —
# the snap function used when output must round-trip through E5/E6/E7
# integer-degree storage (the other non-grid... rather non-CELL grid the
# reference ships next to S2CellIdSnapFunction).
# ---------------------------------------------------------------------------

_DEG_PER_RAD = 180.0 / np.pi
INT_LATLNG_MIN_EXPONENT = 0
INT_LATLNG_MAX_EXPONENT = 10
_DBL_EPS = float(np.finfo(np.float64).eps)


def int_latlng_snap(xyz: np.ndarray, exponent: int) -> tuple[np.ndarray, np.ndarray]:
    """(ilat, ilng) int64 grid coordinates per vertex —
    IntLatLngSnapFunction::SnapPoint's integer stage
    (s2builderutil_snap_functions.cc:387-393): degrees scaled by
    10^exponent, rounded ties-to-even (np.rint == MathUtil::FastInt64Round
    semantics).  The degree conversion is the pinned product
    (asin(z) * (180/pi)) * scale so the SQL oracle replays it literally.
    """
    P = np.asarray(xyz, np.float64)
    scale = 1.0
    for _ in range(exponent):  # reference builds the power by repeated *10
        scale *= 10.0
    lat = (np.arcsin(np.clip(P[:, 2], -1.0, 1.0)) * _DEG_PER_RAD) * scale
    lng = (np.arctan2(P[:, 1], P[:, 0]) * _DEG_PER_RAD) * scale
    return np.rint(lat).astype(np.int64), np.rint(lng).astype(np.int64)


def int_latlng_snap_point(
    ilat: np.ndarray, ilng: np.ndarray, exponent: int
) -> np.ndarray:
    """(n,3) unit vectors of the snapped grid coordinates —
    S2LatLng::FromDegrees(i * 10^-e).ToPoint() (s2latlng.h ToPoint:
    (cos(lat)cos(lng), cos(lat)sin(lng), sin(lat)))."""
    scale = 1.0
    for _ in range(exponent):
        scale *= 10.0
    to_deg = 1.0 / scale
    lat = np.radians(np.asarray(ilat, np.float64) * to_deg)
    lng = np.radians(np.asarray(ilng, np.float64) * to_deg)
    cl = np.cos(lat)
    return np.stack([cl * np.cos(lng), cl * np.sin(lng), np.sin(lat)], axis=1)


def min_snap_radius_for_exponent(exponent: int) -> float:
    """Radians upper bound on SnapPoint movement
    (s2builderutil_snap_functions.cc:248-277): rounding can move a point
    by up to sqrt(2)/2 grid units diagonally, plus the conversion error
    budget (9*sqrt(2) + 1.5) * DBL_EPSILON."""
    power = 1.0
    for _ in range(exponent):
        power *= 10.0
    return math.radians(math.sqrt(0.5) / power) + (
        9.0 * math.sqrt(2.0) + 1.5
    ) * _DBL_EPS


def exponent_for_max_snap_radius(snap_radius_rad: float) -> int:
    """Largest exponent whose min snap radius fits within ``snap_radius``
    (s2builderutil_snap_functions.cc:279-298) — the inverse of
    min_snap_radius_for_exponent up to its documented error tolerance."""
    r = snap_radius_rad - (9.0 * math.sqrt(2.0) + 1.5) * _DBL_EPS
    r = max(r, 1e-30)
    exponent = math.log10(math.sqrt(0.5) / math.degrees(r))
    return max(
        INT_LATLNG_MIN_EXPONENT,
        min(INT_LATLNG_MAX_EXPONENT, int(math.ceil(exponent - 2 * _DBL_EPS))),
    )


def int_latlng_min_vertex_separation(exponent: int, snap_radius_rad: float) -> float:
    """Radians lower bound on output vertex separation after the builder's
    site selection (s2builderutil_snap_functions.cc:294-312): max of the
    proportional bound 0.471 * r and the asymptotic r - sqrt(1/2) grid
    units."""
    power = 1.0
    for _ in range(exponent):
        power *= 10.0
    return max(
        0.471 * snap_radius_rad,
        snap_radius_rad - math.radians(math.sqrt(0.5) / power),
    )


def choose_sites(V: np.ndarray, sep_chord2: float) -> tuple[np.ndarray, np.ndarray]:
    """S2Builder::ChooseInitialSites for IdentitySnapFunction(r) — the
    iterative site-merging loop for NON-grid snap functions
    (s2builder.cc:727-789): consider input vertices in the
    SortInputVertices order (leaf S2CellId, then point lexicographic,
    then input index — s2builder.cc:615-686); each vertex becomes a new
    site unless an already-chosen site lies within
    min_vertex_separation == snap_radius (CompareDistance(site, s, sep)
    <= 0, i.e. chord2 <= sep_chord2 INCLUSIVE).  Identity snap means
    site == vertex, bit-for-bit.

    Returns (sites (s,3) in chosen order, site_id (n,) per input row =
    the nearest chosen site by pinned chord2, ties -> lowest site id —
    the guaranteed-within-snap-radius assignment S2Builder's SnapEdge
    uses).  O(n*s) per call; callers bound group sizes (same contract
    as the alignment/simplify operators).
    """
    V = np.asarray(V, np.float64)
    n = V.shape[0]
    if n == 0:
        return V[:0], np.zeros(0, np.int64)
    leaf = cellid.to_biased(cellid.from_xyz(V[:, 0], V[:, 1], V[:, 2]))
    order = np.lexsort((np.arange(n), V[:, 2], V[:, 1], V[:, 0], leaf))
    S = np.empty((n, 3), np.float64)
    cnt = 0
    for idx in order:
        v = V[idx]
        if cnt:
            dx = S[:cnt, 0] - v[0]
            dy = S[:cnt, 1] - v[1]
            dz = S[:cnt, 2] - v[2]
            c2 = (dx * dx + dy * dy) + dz * dz
            if (c2 <= sep_chord2).any():
                continue
        S[cnt] = v
        cnt += 1
    sites = S[:cnt].copy()
    dx = V[:, None, 0] - sites[None, :, 0]
    dy = V[:, None, 1] - sites[None, :, 1]
    dz = V[:, None, 2] - sites[None, :, 2]
    c2 = (dx * dx + dy * dy) + dz * dz
    sid = np.argmin(c2, axis=1).astype(np.int64)  # first min = lowest id
    return sites, sid
