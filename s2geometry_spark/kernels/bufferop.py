"""Buffered geometry: an S2BufferOperation approximation
(s2buffer_operation.cc, S2ShapeIndexBufferedRegion).

The reference produces an approximate buffered polygon within an error
tolerance.  Same contract here, via composition of existing kernels:

* ``buffer_point``    — spherical cap discretized as a regular ring of
  ``num_vertices`` (the ring is INSCRIBED; pass radius/cos(pi/n) to
  circumscribe, matching the reference's snap-error budgeting).
* ``buffer_edge``     — "stadium" around a geodesic segment: two arc
  caps at the endpoints + two offset geodesics, discretized.
* ``buffer_polyline`` — union (kernels.booleanop) of the per-edge
  stadiums: one polygon (possibly multi-loop) covering everything
  within ``radius`` of the chain, up to discretization error
  radius * (1 - cos(pi / num_vertices)).
* ``buffer_polygon``  — polygon union'd with its boundary's buffer
  (grow-only; negative buffers are out of scope).

For covering-level approximations (no polygon output needed),
``cellunion.expand_radius`` remains the cheap path.
"""

from __future__ import annotations

import math

import numpy as np

from . import booleanop, predicates


def _frame(c: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    x = np.asarray(predicates._ortho(c))
    y = np.cross(c, x)
    return x, y


def buffer_point(p: np.ndarray, radius: float, num_vertices: int = 24) -> np.ndarray:
    """CCW ring of the cap around unit vector p."""
    p = np.asarray(p, np.float64)
    x, y = _frame(p)
    verts = []
    for i in range(num_vertices):
        ang = 2.0 * math.pi * i / num_vertices
        d = math.cos(radius) * p + math.sin(radius) * (
            math.cos(ang) * x + math.sin(ang) * y
        )
        verts.append(d / np.linalg.norm(d))
    return np.stack(verts)


def buffer_edge(
    a: np.ndarray, b: np.ndarray, radius: float, num_vertices: int = 24
) -> np.ndarray:
    """Simple ring around segment ab (a "stadium"): offset geodesic on
    one side, half-cap at b sweeping through the outward tangent, offset
    back on the other side, half-cap at a — orientation normalized to
    enclose the small side."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    n = np.cross(a - b, a + b)  # robust cross ∝ a x b
    nn = np.linalg.norm(n)
    if nn < 1e-15:
        return buffer_point(a, radius, num_vertices)
    n = n / nn
    t_b = np.cross(n, b)  # tangent at b pointing AWAY from a
    t_b /= np.linalg.norm(t_b)
    t_a = np.cross(a, n)  # tangent at a pointing AWAY from b
    t_a /= np.linalg.norm(t_a)
    half = max(4, num_vertices // 2)
    steps = max(2, num_vertices // 2)
    verts: list[np.ndarray] = []

    def cap_arc(center, d_from, d_mid, d_to):
        """half-cap from d_from through d_mid to d_to (each a unit
        direction in center's tangent plane), endpoints included."""
        for i in range(half + 1):
            phi = math.pi * i / half
            d = math.cos(phi) * d_from + math.sin(phi) * d_mid
            # the parameterization passes d_mid at pi/2 and -d_from at pi
            # == d_to by construction (d_to = -d_from)
            p = math.cos(radius) * center + math.sin(radius) * d
            verts.append(p / np.linalg.norm(p))

    def offset_side(p0, p1, sign):
        """interior samples of geodesic p0->p1 pushed toward sign*n."""
        for i in range(1, steps):
            t = i / steps
            g = (1.0 - t) * p0 + t * p1
            g = g / np.linalg.norm(g)
            d = math.cos(radius) * g + math.sin(radius) * (sign * n)
            verts.append(d / np.linalg.norm(d))

    # walk: +n offset a->b, cap at b (n -> t_b -> -n), -n offset b->a,
    # cap at a (-n -> t_a -> n); both caps bulge AWAY from the segment
    verts.append(_push(a, n, radius))
    offset_side(a, b, +1.0)
    cap_arc(b, n, t_b, -n)
    offset_side(b, a, -1.0)
    cap_arc(a, -n, t_a, n)
    # drop the closing duplicate (cap at a ends where we started)
    ring = np.stack(verts[:-1])
    return booleanop._normalize_small([ring])[0]


def _push(p: np.ndarray, d: np.ndarray, radius: float) -> np.ndarray:
    out = math.cos(radius) * p + math.sin(radius) * d
    return out / np.linalg.norm(out)


def buffer_polyline(
    V: np.ndarray, radius: float, num_vertices: int = 24
) -> list[np.ndarray]:
    """Union of per-edge stadiums: loops of the buffered region."""
    V = np.asarray(V, np.float64)
    if V.shape[0] == 0:
        return []
    if V.shape[0] == 1:
        return [buffer_point(V[0], radius, num_vertices)]
    acc: list[np.ndarray] | None = None
    for i in range(V.shape[0] - 1):
        ring = [buffer_edge(V[i], V[i + 1], radius, num_vertices)]
        acc = ring if acc is None else booleanop.overlay(acc, ring, "union")
    return acc or []


def buffer_polygon(
    loops: list[np.ndarray], radius: float, num_vertices: int = 24
) -> list[np.ndarray]:
    """Grow a polygon by ``radius``: the polygon union'd with the buffer
    of every boundary edge."""
    acc = [np.asarray(v, np.float64) for v in loops]
    for v in loops:
        n = v.shape[0]
        for i in range(n):
            ring = [buffer_edge(v[i], v[(i + 1) % n], radius, num_vertices)]
            acc = booleanop.overlay(acc, ring, "union")
    return acc
