"""Spherical convex hull (S2ConvexHullQuery, s2convex_hull_query.h).

Scope: point sets contained in an open hemisphere (the dataflow use is
"hull of a cluster/tile of points", always hemispheric; the reference
additionally handles full-sphere degeneracies via cap bounds).

Method: gnomonic (central) projection about the normalized centroid maps
great circles to straight lines, so the spherical convex hull of a
hemispheric set equals the planar convex hull of the projected points —
computed with Andrew's monotone chain; the planar orientation test falls
back to the robust spherical Sign predicate when the double cross-product
is within its error bound.  Returns CCW vertices (interior on the left),
i.e. a Loop boundary.
"""

from __future__ import annotations

import numpy as np

from . import predicates


def _frame(c: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    ref = np.array([0.0, 0.0, 1.0]) if abs(c[2]) < 0.9 else np.array([1.0, 0.0, 0.0])
    u = np.cross(c, ref)
    u /= np.linalg.norm(u)
    v = np.cross(c, u)
    return u, v


def convex_hull(points: np.ndarray) -> np.ndarray:
    """CCW convex hull vertices of (n,3) unit points (hemispheric set)."""
    p = np.asarray(points, np.float64)
    p = np.unique(p, axis=0)
    n = p.shape[0]
    if n <= 2:
        return p
    c = p.mean(axis=0)
    nc = np.linalg.norm(c)
    if nc < 1e-12:
        raise ValueError("point set is not hemispheric (centroid ~ 0)")
    c = c / nc
    dots = p @ c
    if (dots <= 1e-12).any():
        raise ValueError("point set is not contained in the open hemisphere of its centroid")
    u, v = _frame(c)
    # gnomonic coordinates
    gx = (p @ u) / dots
    gy = (p @ v) / dots

    order = np.lexsort((gy, gx))
    idx = order.tolist()

    def turn(i: int, j: int, k: int) -> int:
        """Orientation of (i,j,k) in the plane, robust via spherical Sign.

        For gnomonic points the planar orientation equals the spherical
        orientation as seen from c; Sign(a,b,x) (s2pred) gives it exactly.
        """
        cross = (gx[j] - gx[i]) * (gy[k] - gy[i]) - (gy[j] - gy[i]) * (gx[k] - gx[i])
        if abs(cross) > 1e-12:
            return 1 if cross > 0 else -1
        return predicates.sign(p[i], p[j], p[k])

    # Andrew's monotone chain
    lower: list[int] = []
    for i in idx:
        while len(lower) >= 2 and turn(lower[-2], lower[-1], i) <= 0:
            lower.pop()
        lower.append(i)
    upper: list[int] = []
    for i in reversed(idx):
        while len(upper) >= 2 and turn(upper[-2], upper[-1], i) <= 0:
            upper.pop()
        upper.append(i)
    hull_idx = lower[:-1] + upper[:-1]
    return p[hull_idx]


def contains_all(hull_vertices: np.ndarray, points: np.ndarray, shrink: float = 1e-9) -> bool:
    """Check every point lies inside-or-on the hull loop (points are pulled
    `shrink` toward the hull centroid to dodge exact-boundary parity)."""
    from .regions import Loop

    h = np.asarray(hull_vertices, np.float64)
    if h.shape[0] < 3:
        return True
    c = h.mean(axis=0)
    c /= np.linalg.norm(c)
    lp = Loop(h)
    p = np.asarray(points, np.float64)
    q = p * (1.0 - shrink) + c[None, :] * shrink
    q /= np.linalg.norm(q, axis=1)[:, None]
    return bool(lp.contains_points(q).all())
