"""NextEdgeWrap/PrevEdgeWrap vs a literal port of the reference's
per-edge walk (s2shapeutil_edge_wrap.cc:24-104)."""

import numpy as np

from s2geometry_spark.kernels.edgewrap import next_edge_wrap, prev_edge_wrap


def _ref_next(dim, start, length, off, closed):
    if dim == 2:
        off = (off + 1) % length
    elif dim == 1:
        if off == length - 1:
            if closed:
                off = 0
            else:
                return -1
        else:
            off += 1
    else:
        return -1
    return start + off


def _ref_prev(dim, start, length, off, closed):
    if dim == 2:
        off -= 1
        if off < 0:
            off += length
    elif dim == 1:
        if off == 0:
            if closed:
                off = length - 1
            else:
                return -1
        else:
            off -= 1
    else:
        return -1
    return start + off


def _shape_rows():
    """A mixed shape: 2 point chains, an open 3-edge polyline, a closed
    4-edge polyline, a 5-edge polygon loop — edge ids contiguous."""
    rows = []
    start = 0
    for dim, length, closed in (
        (0, 1, False), (0, 1, False),
        (1, 3, False), (1, 4, True),
        (2, 5, False),
    ):
        for off in range(length):
            rows.append((dim, start, length, off, closed))
        start += length
    return rows


def test_matches_reference_walk():
    rows = _shape_rows()
    dim, start, length, off, closed = map(np.array, zip(*rows))
    nxt = next_edge_wrap(dim, start, length, off, closed)
    prv = prev_edge_wrap(dim, start, length, off, closed)
    for i, r in enumerate(rows):
        assert nxt[i] == _ref_next(*r), (i, r)
        assert prv[i] == _ref_prev(*r), (i, r)


def test_wrap_inverse_on_closed_chains():
    rows = [r for r in _shape_rows() if r[0] == 2 or (r[0] == 1 and r[4])]
    dim, start, length, off, closed = map(np.array, zip(*rows))
    nxt = next_edge_wrap(dim, start, length, off, closed)
    eid = start + off
    # prev(next(e)) == e on wrapping chains
    prv = prev_edge_wrap(dim, start, length, nxt - start, closed)
    assert (prv == eid).all()
    # a full next-walk visits the whole chain
    for s, ln in {(int(a), int(b)) for a, b in zip(start, length)}:
        seen, e = set(), s
        d = 2 if (s, ln) == (10, 5) else 1
        for _ in range(ln):
            seen.add(e)
            e = int(
                next_edge_wrap([d], [s], [ln], [e - s], [True])[0]
            )
        assert seen == set(range(s, s + ln))


def test_points_and_open_ends():
    assert next_edge_wrap([0], [0], [1], [0], [False])[0] == -1
    assert prev_edge_wrap([0], [0], [1], [0], [False])[0] == -1
    assert next_edge_wrap([1], [2], [3], [2], [False])[0] == -1
    assert prev_edge_wrap([1], [2], [3], [0], [False])[0] == -1
