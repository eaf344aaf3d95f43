"""Raster -> vector: trace the boundary polygon of a cell raster
(the north rule's "raster <-> vector" axis; the reference's nearest
analogue is S2CellUnion -> S2Polygon::InitToCellUnionBorder,
s2polygon.cc:1261+).

Input: a set of SAME-LEVEL cell ids (a raster layer).  Output: closed
boundary loops.  A cell edge is a boundary edge iff the neighbor across
it is not in the set — except across FACE seams, which are always
emitted so each face's loops close independently (corner coordinates
are exact only within one face's si/ti grid; the per-face polygons are
interior-disjoint, so odd-even over all loops equals their union).

Corner vertices come from cellid.corners_xyz: adjacent same-face cells
share grid corners BIT-EXACTLY, so the chain walk (booleanop._chain)
needs no tolerance.
"""

from __future__ import annotations

import numpy as np

from . import cellid
from .booleanop import _chain


def boundary_edges(cells: np.ndarray) -> list[tuple[np.ndarray, np.ndarray]]:
    """Directed boundary edges (interior on the left) of the raster."""
    cells = np.unique(np.asarray(cells, np.uint64))
    if cells.size == 0:
        return []
    lv = cellid.level(cells)
    if not (lv == lv[0]).all():
        raise ValueError("raster cells must share one level")
    in_set = set(cells.tolist())
    faces = cellid.face(cells)
    nbrs = cellid.get_edge_neighbors(cells)  # (n,4): down, right, up, left
    corners = cellid.corners_xyz(cells)  # (n,4,3): (lo,lo),(hi,lo),(hi,hi),(lo,hi)
    # edge k runs v_k -> v_{k+1} and faces neighbor k (down/right/up/left)
    edges = []
    for n in range(cells.size):
        for k in range(4):
            nb = int(nbrs[n, k])
            seam = int(cellid.face(np.asarray([nbrs[n, k]], np.uint64))[0]) != int(
                faces[n]
            )
            if seam or nb not in in_set:
                edges.append((corners[n, k], corners[n, (k + 1) % 4]))
    return edges


def vectorize_cells(cells: np.ndarray) -> list[np.ndarray]:
    """Boundary loops of the raster, normalized to SMALL orientation so
    odd-even parity over the loop set equals raster membership for any
    loop count (an un-normalized CW loop contributes the complement,
    which cancels only for even loop counts — found the hard way)."""
    from .booleanop import _normalize_small

    edges = boundary_edges(cells)
    if not edges:
        return []
    return _normalize_small(_chain(edges))
