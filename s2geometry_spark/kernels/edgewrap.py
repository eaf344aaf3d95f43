"""s2shapeutil::NextEdgeWrap / PrevEdgeWrap (s2shapeutil_edge_wrap.cc:
24-104) as columnar NumPy kernels.

The reference walks one edge at a time through a shape's chain table:
polygon (dimension-2) chains always wrap, polyline chains wrap only
when closed (last edge's v1 == first edge's v0), point chains never
have a neighbor.  In columnar form every edge row carries its chain
geometry — (dimension, chain_start, chain_length, offset, closed) —
which is exactly how the distributed shape tables in
operators/shape_measures lay chains out, so the per-call chain lookup
the C++ doc warns about disappears: the whole column resolves in one
vectorized pass.
"""

from __future__ import annotations

import numpy as np

__all__ = ["next_edge_wrap", "prev_edge_wrap"]


def _as(a) -> np.ndarray:
    return np.asarray(a, np.int64)


def next_edge_wrap(
    dimension, chain_start, chain_length, offset, closed
) -> np.ndarray:
    """Edge id of the next edge in each edge's chain, or -1 at the end
    of an open chain (points always -1).  ``closed`` only matters for
    dimension-1 rows (polygon chains always wrap)."""
    dim = _as(dimension)
    start = _as(chain_start)
    length = _as(chain_length)
    off = _as(offset)
    cl = np.asarray(closed, bool)
    nxt2 = start + (off + 1) % length
    at_end = off == length - 1
    nxt1 = np.where(at_end, np.where(cl, start, -1), start + off + 1)
    return np.where(dim == 2, nxt2, np.where(dim == 1, nxt1, -1))


def prev_edge_wrap(
    dimension, chain_start, chain_length, offset, closed
) -> np.ndarray:
    """Edge id of the previous edge in each edge's chain, or -1 at the
    start of an open chain (points always -1)."""
    dim = _as(dimension)
    start = _as(chain_start)
    length = _as(chain_length)
    off = _as(offset)
    cl = np.asarray(closed, bool)
    prv2 = start + (off - 1) % length
    at_start = off == 0
    prv1 = np.where(at_start, np.where(cl, start + length - 1, -1), start + off - 1)
    return np.where(dim == 2, prv2, np.where(dim == 1, prv1, -1))
