"""Port of the reference loop-measures suite
(dilivia/s2/region/S2LoopMeasuresUnitTest.kt) against
s2_geometry_kotlin_spark/kernel/measures.py.

Covers pruneDegeneracies (character loops), getCanonicalLoopOrder,
perimeter (incl. > 2*pi), area/curvature Gauss-Bonnet consistency over
the named pathological loops, the random-cap area+centroid sweep, and
the curvature invariants: IDENTICAL under rotation, exactly negated
under reversal, including the 20000-vertex spiral stress."""

import math

import numpy as np
import pytest

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel.measures import (
    curvature_max_error, get_canonical_loop_order, loop_area,
    loop_centroid, loop_curvature, loop_perimeter, prune_degeneracies)
from s2_geometry_kotlin_spark.kernel.textparser import parse_latlngs

PI = math.pi


def parse_vertices(text: str) -> np.ndarray:
    lls = parse_latlngs(text)
    lat = np.array([a for a, _ in lls])
    lng = np.array([b for _, b in lls])
    x, y, z = ck.latlng_deg_to_xyz(lat, lng)
    return np.stack([x, y, z], axis=1)


FULL = np.zeros((0, 3))
V_LOOP = parse_vertices("5:1, 0:2, 5:3, 0:2")
NORTH_HEMI = parse_vertices("0:-180, 0:-90, 0:0, 0:90")
NORTH_HEMI3 = parse_vertices("0:-180, 0:-60, 0:60")
WEST_HEMI = parse_vertices("0:-180, -90:0, 0:0, 90:0")
EAST_HEMI = parse_vertices("90:0, 0:0, -90:0, 0:-180")
CANDY_CANE = parse_vertices("-20:150, -20:-70, 0:70, 10:-150, 10:70, -10:-70")
LINE_TRIANGLE = parse_vertices("0:1, 0:2, 0:3")
SKINNY_CHEVRON = parse_vertices("0:0, -1e-320:80, 0:1e-320, 1e-320:80")
THREE_LEAF_CLOVER = parse_vertices(
    "0:0, -3:3, 3:3, 0:0, 3:0, 3:-3, 0:0, -3:-3, -3:0")
TESSELLATED_LOOP = parse_vertices(
    "10:34, 5:34, 0:34, -10:34, -10:36, -5:36, 0:36, 10:36")


def make_test_loop(s: str) -> np.ndarray:
    """Each character becomes the (non-unit) point (ord(ch), 0, 0) —
    only exact-equality structure matters for pruning/ordering."""
    return np.array([[float(ord(c)), 0.0, 0.0] for c in s]).reshape(-1, 3)


def check_prune(input_str: str, expected_str: str):
    pruned = prune_degeneracies(make_test_loop(input_str))
    actual = "".join(chr(int(p[0])) for p in pruned)
    assert actual == expected_str, (input_str, actual, expected_str)


def test_prune_degeneracies_all_degeneracies():
    check_prune("", "")
    check_prune("a", "")
    check_prune("aaaaa", "")
    check_prune("ab", "")
    check_prune("abb", "")
    check_prune("aab", "")
    check_prune("aba", "")
    check_prune("abba", "")
    check_prune("abcb", "")
    check_prune("abcba", "")
    check_prune("abcdcdedefedcbcdcb", "")


def test_prune_degeneracies_some_degeneracies():
    check_prune("abc", "abc")
    check_prune("abca", "abc")
    check_prune("abcc", "abc")
    check_prune("abccaa", "abc")
    check_prune("aabbcc", "abc")
    check_prune("abcdedca", "abc")
    check_prune("abcbabcbcdc", "abc")
    check_prune("xyzabcazy", "abc")
    check_prune("xxyyzzaabbccaazzyyxx", "abc")


def test_canonical_loop_order_all_degeneracies():
    assert get_canonical_loop_order(make_test_loop("")) == (0, 1)
    assert get_canonical_loop_order(make_test_loop("a")) == (0, 1)
    assert get_canonical_loop_order(make_test_loop("aaaaa")) == (0, 1)
    assert get_canonical_loop_order(make_test_loop("ba")) == (1, 1)
    assert get_canonical_loop_order(make_test_loop("bab")) == (1, 1)
    assert get_canonical_loop_order(make_test_loop("cbab")) == (2, 1)
    assert get_canonical_loop_order(make_test_loop("bacbcab")) == (8, -1)


def test_perimeter_empty():
    assert loop_perimeter(FULL) == 0.0


def test_perimeter_octant():
    assert loop_perimeter(parse_vertices("0:0, 0:90, 90:0")) == 3 * PI / 2


def test_perimeter_more_than_two_pi():
    # must not go through chord angles, which cap at 2*pi
    assert loop_perimeter(
        parse_vertices("0:0, 0:90, 0:180, 90:0, 0:-90")) == 5 * PI / 2


@pytest.mark.parametrize("name,loop", [
    ("full", FULL), ("north_hemi", NORTH_HEMI),
    ("north_hemi3", NORTH_HEMI3), ("west_hemi", WEST_HEMI),
    ("east_hemi", EAST_HEMI), ("candy_cane", CANDY_CANE),
    ("line_triangle", LINE_TRIANGLE),
    ("skinny_chevron", SKINNY_CHEVRON),
    ("three_leaf_clover", THREE_LEAF_CLOVER),
    ("tessellated_loop", TESSELLATED_LOOP)])
def test_area_consistent_with_curvature(name, loop):
    area = loop_area(loop)
    gauss_area = 2 * PI - loop_curvature(loop)
    assert abs(area - gauss_area) <= 1e-14, (name, area, gauss_area)


def test_area_and_centroid_random_caps():
    assert loop_area(FULL) == 4 * PI
    assert np.array_equal(loop_centroid(FULL), np.zeros(3))
    assert loop_area(NORTH_HEMI) == 2 * PI
    assert abs(loop_area(EAST_HEMI) - 2 * PI) <= 1e-12

    k_max_dist = 1e-6
    rng = np.random.default_rng(20260817)
    for _ in range(50):
        # random orthonormal frame
        m = rng.normal(size=(3, 3))
        q, _ = np.linalg.qr(m)
        if np.linalg.det(q) < 0:
            q[:, 2] = -q[:, 2]
        x, y, z = q[:, 0], q[:, 1], q[:, 2]
        height = 2 * rng.random()
        phi = math.asin(1 - height)
        max_dtheta = 2 * math.acos(
            math.tan(abs(phi)) / math.tan(abs(phi) + k_max_dist))
        max_dtheta = min(PI, max_dtheta)
        pts = []
        theta = 0.0
        while theta < 2 * PI:
            pts.append(math.cos(theta) * math.cos(phi) * x
                       + math.sin(theta) * math.cos(phi) * y
                       + math.sin(phi) * z)
            theta += rng.random() * max_dtheta
        loop = np.array(pts)
        area = loop_area(loop)
        centroid = loop_centroid(loop)
        expected_area = 2 * PI * height
        assert abs(area - expected_area) <= 2 * PI * k_max_dist
        expected_centroid = (expected_area * (1 - 0.5 * height)) * z
        assert np.linalg.norm(centroid - expected_centroid) <= 2 * k_max_dist


def expect_same_order(loop1, order1, loop2, order2):
    assert len(loop1) == len(loop2)
    n = len(loop1)
    i1, d1 = order1
    i2, d2 = order2
    for _ in range(n):
        assert np.array_equal(loop2[i2 % n], loop1[i1 % n]), \
            (order1, order2)
        i1 += d1
        i2 += d2


def check_curvature_invariants(loop_in: np.ndarray):
    """Curvature must be IDENTICAL under rotation and exactly negated
    under reversal (degenerate loops stay +2*pi)."""
    order_in = get_canonical_loop_order(loop_in)
    loop = loop_in.copy()
    expected = loop_curvature(loop_in)
    for _ in range(len(loop_in)):
        rev = loop[::-1].copy()
        got = loop_curvature(rev)
        want = expected if expected == 2 * PI else -expected
        assert got == want
        expect_same_order(loop_in, order_in, rev,
                          get_canonical_loop_order(rev))
        loop = np.roll(loop, -1, axis=0)
        assert loop_curvature(loop) == expected
        expect_same_order(loop_in, order_in, loop,
                          get_canonical_loop_order(loop))


def test_curvature():
    assert loop_curvature(FULL) == -2 * PI

    assert loop_curvature(V_LOOP) == 2 * PI
    check_curvature_invariants(V_LOOP)

    # computed exactly
    assert loop_curvature(NORTH_HEMI3) == 0.0
    check_curvature_invariants(NORTH_HEMI3)

    assert abs(loop_curvature(WEST_HEMI)) <= 1e-15
    check_curvature_invariants(WEST_HEMI)

    check_curvature_invariants(CANDY_CANE)
    check_curvature_invariants(THREE_LEAF_CLOVER)

    assert abs(loop_curvature(LINE_TRIANGLE) - 2 * PI) <= 1e-15
    check_curvature_invariants(LINE_TRIANGLE)

    assert abs(loop_curvature(SKINNY_CHEVRON) - 2 * PI) <= 1e-15
    check_curvature_invariants(SKINNY_CHEVRON)


def test_curvature_spiral_error_linear_in_vertices():
    # narrow two-armed spiral from the north pole: many long parallel
    # edges make the PARTIAL sums of turn angles linear in n, the
    # worst case for naive accumulation
    k_arm_points = 10000
    k_arm_radius = 0.01
    spiral = np.zeros((2 * k_arm_points, 3))
    for i in range(k_arm_points):
        angle = (2 * PI / 3) * i
        x, y = math.cos(angle), math.sin(angle)
        r1 = i * k_arm_radius / k_arm_points
        r2 = (i + 1.5) * k_arm_radius / k_arm_points
        p1 = np.array([r1 * x, r1 * y, 1.0])
        p2 = np.array([r2 * x, r2 * y, 1.0])
        spiral[k_arm_points - i - 1] = p1 / np.linalg.norm(p1)
        spiral[k_arm_points + i] = p2 / np.linalg.norm(p2)
    got = loop_curvature(spiral)
    want = 2 * PI - loop_area(spiral)
    assert abs(got - want) <= 0.01 * curvature_max_error(len(spiral))
