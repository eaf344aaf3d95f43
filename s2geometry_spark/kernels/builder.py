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
