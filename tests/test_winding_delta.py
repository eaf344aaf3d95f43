"""GetSnappedWindingDelta (kernels/winding_delta) vs the reference's
own test cases (s2builderutil_get_snapped_winding_delta_test.cc) and a
RandomLoops-style topological-consistency check.

The named cases replay the reference's ExpectWindingDelta harness with
an explicit snap model equivalent to the IdentitySnapFunction builds it
performs: sites = forced vertices plus input vertices farther than the
snap radius from every earlier site; every input edge is replaced by
the chain of sites within the snap radius of it, ordered along the
edge (the same edge-replacement semantics as
kernels/builder.snap_round_chain, with arbitrary sites).
"""

import numpy as np
import pytest

from s2geometry_spark.kernels import winding_delta as wd
from s2geometry_spark.kernels.measures import point_edge_chord2


def ll(lat, lng):
    """degrees -> unit vector"""
    phi, theta = np.radians(lat), np.radians(lng)
    return np.array(
        [np.cos(phi) * np.cos(theta), np.cos(phi) * np.sin(theta), np.sin(phi)]
    )


def parse_loops(s):
    loops = []
    for part in s.split(";"):
        loop = []
        for tok in part.strip().split(","):
            lat, lng = tok.strip().split(":")
            loop.append(ll(float(lat), float(lng)))
        loops.append(loop)
    return loops


def chord2_of_radius(radius_rad):
    s = 2.0 * np.sin(radius_rad / 2.0)
    return s * s


class SnapModel:
    """Identity-snap-with-forced-sites edge-replacement model."""

    def __init__(self, loops, forced, radius_rad):
        self.r2 = chord2_of_radius(radius_rad)
        self.sites = list(forced)
        for loop in loops:
            for v in loop:
                if all(
                    float(((v - s) ** 2).sum()) > self.r2 for s in self.sites
                ):
                    if all(
                        tuple(v) != tuple(s) for s in self.sites
                    ):
                        self.sites.append(v)

    def site_of(self, v):
        d = [float(((v - s) ** 2).sum()) for s in self.sites]
        return self.sites[int(np.argmin(d))]

    def edge_chain(self, a, b):
        """SnapEdge semantics (s2builder.cc:1162-1230): the chain of
        sites whose radius-clipped Voronoi regions the edge passes
        through, in order — evaluated here by dense sampling (the loops
        in this test span ~0.1 rad, so 400 samples resolve every
        Voronoi cell crossing)."""
        sa, sb = self.site_of(a), self.site_of(b)
        if tuple(a) == tuple(b):
            return [sa, sb]
        S = np.stack(self.sites)
        t = np.linspace(0.0, 1.0, 400)[:, None]
        P = a[None, :] * (1 - t) + b[None, :] * t
        P /= np.linalg.norm(P, axis=1, keepdims=True)
        D = ((P[:, None, :] - S[None, :, :]) ** 2).sum(axis=2)
        nearest = np.argmin(D, axis=1)
        within = D[np.arange(len(t)), nearest] <= self.r2
        visited = []
        for k in np.flatnonzero(within):
            j = int(nearest[k])
            if not visited or visited[-1] != j:
                visited.append(j)
        chain = [sa] + [self.sites[j] for j in visited] + [sb]
        out = [chain[0]]
        for v in chain[1:]:
            if tuple(v) != tuple(out[-1]):
                out.append(v)
        return out


def compute_delta(loops, forced, radius_deg, ref_in):
    model = SnapModel(loops, forced, np.radians(radius_deg))
    ref_out = model.site_of(ref_in)
    snaps = []
    for loop in loops:
        n = len(loop)
        for i in range(n):
            a, b = loop[i], loop[(i + 1) % n]
            chain = model.edge_chain(a, b)
            keys = [tuple(v) for v in chain]
            if tuple(ref_out) not in keys:
                continue
            rk = tuple(ref_out)
            occ = [i for i, k in enumerate(keys) if k == rk]
            # the ref site can occur twice: at BOTH chain ends (edge
            # leaves the Voronoi region and returns) -> one incoming
            # and one outgoing output edge, like the reference's
            # per-graph-edge EdgeSnap accumulation (.cc:322-331)
            first, last = occ[0], occ[-1]
            v_in = (
                chain[last - 1]
                if last > 0 and keys[last - 1] != rk
                else None
            )
            v_out = (
                chain[first + 1]
                if first < len(chain) - 1 and keys[first + 1] != rk
                else None
            )
            snaps.append(wd.EdgeSnap(a, b, v_in=v_in, v_out=v_out))
    return wd.get_snapped_winding_delta(ref_in, ref_out, snaps), model


# (loops, forced, radius_deg, expected_delta) — ref edge is the first
# loop's first (degenerate) edge, so ref_in = first vertex.
REFERENCE_CASES = [
    ("NoOtherEdges", "0:0", "0:0", 10.0, 0),
    ("DegenerateInputLoops", "0:0; 1:1; 2:2", "0:0", 10.0, 0),
    ("DuplicateDegenerate", "0:0; 0:0; 1:1; 1:1", "0:0", 10.0, 0),
    ("CollapsingShell", "0:0; 1:1, 1:-2, -2:1", "0:0", 10.0, -1),
    ("CollapsingHole", "0:0; 1:1, -2:1, 1:-2", "0:0", 10.0, +1),
    (
        "CollapsingDoubleShell",
        "0:0; 1:1, 1:-2, -2:1, 2:2, 2:-3, -3:2",
        "0:0",
        10.0,
        -2,
    ),
    ("ExtLoopRefStaysOutside", "0:0; 20:0, 0:0, 0:20", "0:0", 10.0, 0),
    ("ExtLoopRefStaysInside", "0:0; 0:-20, 0:0, 20:0", "0:0", 10.0, 0),
    ("ExtLoopRefMovesInside", "1:1; 0:-20, 1:-1, 20:0", "0:0", 10.0, +1),
    (
        "CrossingEdgeRefStaysOutside",
        "-1:-1; 20:-20, -20:20, 20:20",
        "0:0",
        10.0,
        0,
    ),
    (
        "CrossingEdgeRefMovesOutside",
        "1:1; 20:-20, -20:20, 20:20",
        "0:0",
        10.0,
        -1,
    ),
    (
        "ExtLoopDoubleHoleToSingleHole",
        "4:4; 0:20, 3:3, 6:3, 2:7, 2:2, 2:20",
        "0:0",
        10.0,
        +1,
    ),
    (
        "ExtLoopDoubleHoleToSingleShell",
        "4:4; 0:-20, 6:2, 2:6, 2:2, 6:2, 2:6, 2:2, 20:0",
        "0:0",
        10.0,
        +3,
    ),
    (
        "ExtEdgesCrossSnapToSameVertex",
        "1:1; -5:30, 7:-3, -7:-3, 5:30",
        "0:0, 0:15",
        10.0,
        -1,
    ),
]


@pytest.mark.parametrize(
    "name,loops_s,forced_s,radius,want",
    REFERENCE_CASES,
    ids=[c[0] for c in REFERENCE_CASES],
)
def test_reference_cases(name, loops_s, forced_s, radius, want):
    loops = parse_loops(loops_s)
    forced = [v for loop in parse_loops(forced_s) for v in loop]
    ref_in = loops[0][0]
    got, _ = compute_delta(loops, forced, radius, ref_in)
    assert got == want


def _winding(anchor, p, loops):
    """Winding number of p relative to an anchor of winding 0, via
    signed crossings of anchor->p — an independent procedure from the
    chain-assembly/connector machinery under test."""
    total = 0
    for loop in loops:
        chain = list(loop) + [loop[0]]
        total += wd.get_edge_winding_delta(anchor, p, chain)
    return total


def test_random_loops_topologically_consistent():
    """w_before + delta == w_after over random snap configurations
    (the reference's RandomLoops strategy)."""
    rng = np.random.RandomState(42)
    n_checked = 0
    for it in range(150):
        # random reference point + orthonormal frame
        r = rng.randn(3)
        r /= np.linalg.norm(r)
        e1 = np.cross(r, [0.0, 0.0, 1.0])
        if np.linalg.norm(e1) < 1e-9:
            e1 = np.cross(r, [0.0, 1.0, 0.0])
        e1 /= np.linalg.norm(e1)
        e2 = np.cross(r, e1)
        scale = 0.03  # radians; snap radius below is 0.02
        loops = []
        for _ in range(rng.randint(1, 4)):
            m = rng.randint(3, 7)
            center = (
                r
                + scale * rng.uniform(-1.5, 1.5) * e1
                + scale * rng.uniform(-1.5, 1.5) * e2
            )
            loop = []
            for k in range(m):
                th = 2 * np.pi * (k + rng.uniform(0, 0.6)) / m
                rad = scale * rng.uniform(0.3, 2.0)
                v = center + rad * (np.cos(th) * e1 + np.sin(th) * e2)
                loop.append(v / np.linalg.norm(v))
            loops.append(loop)
        all_loops = [[r]] + loops  # degenerate ref loop first
        forced = []  # identity snapping, no forced sites
        radius_deg = np.degrees(0.02)
        try:
            delta, model = compute_delta(all_loops, forced, radius_deg, r)
        except ValueError:
            continue  # filtered edges didn't form loops (not expected)
        ref_out = model.site_of(r)
        # snapped image of each loop: concatenated edge chains
        snapped_loops = []
        for loop in loops:
            out = []
            n = len(loop)
            for i in range(n):
                ch = model.edge_chain(loop[i], loop[(i + 1) % n])
                for v in ch[:-1]:
                    if not out or tuple(v) != tuple(out[-1]):
                        out.append(v)
            if len(out) >= 1:
                snapped_loops.append(out)
        # anchor 90 deg away: outside every (tiny) loop, winding 0.
        # NOT the antipode: the edge (-r -> r) is an ill-defined
        # antipodal geodesic and crossing counts along it are arbitrary.
        anchor = e1
        w_before = _winding(anchor, r, loops)
        w_after = _winding(anchor, ref_out, snapped_loops)
        assert w_before + delta == w_after, (
            it,
            w_before,
            delta,
            w_after,
        )
        n_checked += 1
    assert n_checked >= 140
