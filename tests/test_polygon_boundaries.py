"""BuildPolygonBoundaries vs the reference's own cases
(s2shapeutil_build_polygon_boundaries_test.cc)."""

import pytest

from s2geometry_spark.kernels.polygon_boundaries import build_polygon_boundaries
from s2geometry_spark.kernels.textformat import make_points


def L(s):
    return make_points(s)


def test_no_components():
    assert build_polygon_boundaries([]) == []


def test_one_loop():
    a0 = L("0:0, 1:0, 0:1")  # outer face (clockwise)
    a1 = L("0:0, 0:1, 1:0")
    faces = build_polygon_boundaries([[a0, a1]])
    assert len(faces) == 2


def test_two_loops_same_component():
    a0 = L("0:0, 1:0, 0:1")  # outer face
    a1 = L("0:0, 0:1, 1:0")
    a2 = L("1:0, 0:1, 1:1")
    faces = build_polygon_boundaries([[a0, a1, a2]])
    assert len(faces) == 3


def test_two_nested_loops():
    a0 = L("0:0, 3:0, 0:3")  # outer face
    a1 = L("0:0, 0:3, 3:0")
    b0 = L("1:1, 2:0, 0:2")  # outer face
    b1 = L("1:1, 0:2, 2:0")
    faces = build_polygon_boundaries([[a0, a1], [b0, b1]])
    assert len(faces) == 3
    # the a1 face consists of b's outer loop then a1 itself
    assert faces[0] == [(1, 0), (0, 1)]


def test_two_loops_different_components():
    a0 = L("0:0, 1:0, 0:1")  # outer face
    a1 = L("0:0, 0:1, 1:0")
    b0 = L("0:2, 1:2, 0:3")  # outer face
    b1 = L("0:2, 0:3, 1:2")
    faces = build_polygon_boundaries([[a0, a1], [b0, b1]])
    assert len(faces) == 3
    # the final face holds both depth-0 outer loops
    assert faces[2] == [(0, 0), (1, 0)]


def test_one_degenerate_loop():
    a0 = L("0:0, 1:0, 0:0")
    faces = build_polygon_boundaries([[a0]])
    assert len(faces) == 1


def test_two_degenerate_loops():
    a0 = L("0:0, 1:0, 0:0")
    b0 = L("2:0, 3:0, 2:0")
    faces = build_polygon_boundaries([[a0], [b0]])
    assert len(faces) == 1
    assert len(faces[0]) == 2


def test_complex_nesting():
    """The ComplexTest1 core: a 4-square component with three nested
    components inside one of the squares and a degenerate loop outside —
    the face count is #indexed loops + 1 and every inner component's
    outer loop lands in the face of the square that contains it."""
    a0 = L("0:0, 25:0, 50:0, 50:25, 50:50, 25:50, 0:50, 0:50")
    a1 = L("0:0, 0:25, 25:25, 25:0")
    a2 = L("0:25, 0:50, 25:50, 25:25")
    a3 = L("25:0, 25:25, 50:25, 50:0")
    a4 = L("25:25, 25:50, 50:50, 50:25")
    b0 = L("0:-10, 10:-10, 0:-10")  # degenerate, single-loop component
    a1_a0 = L("5:5, 20:5, 20:10, 5:10")
    a1_a1 = L("5:5, 5:10, 20:10, 20:5")
    faces = build_polygon_boundaries(
        [[a0, a1, a2, a3, a4], [b0], [a1_a0, a1_a1]]
    )
    # indexed loops: a1..a4 (4) + a1_a1 (1) -> 5 faces + final = 6
    assert len(faces) == 6
    # a1's face (indexed loop 0) contains the inner component's outer
    # loop a1_a0 = (2, 0) plus a1 itself
    assert faces[0] == [(2, 0), (0, 1)]
    # the final face holds the two depth-0 outer loops: a0 and b0
    assert faces[5] == [(0, 0), (1, 0)]


def test_not_a_subdivision_raises():
    a0 = L("0:0, 1:0, 0:1")
    a1 = L("5:5, 6:5, 5:6")  # also does not contain the origin... both
    # loops of this 2-loop component exclude the origin -> 0 outer loops
    with pytest.raises(ValueError):
        build_polygon_boundaries([[a1, a1]])
