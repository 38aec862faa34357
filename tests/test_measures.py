"""Measure tests against S2LoopUnitTest golden values
(getAreaAndCentroid, areaConsistentWithCurvature)."""

import math

import numpy as np

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel import measures as M


def make_loop(text: str) -> np.ndarray:
    pts = []
    for tok in text.split(","):
        lat, lng = tok.strip().split(":")
        x, y, z = ck.latlng_deg_to_xyz(np.array([float(lat)]),
                                       np.array([float(lng)]))
        pts.append([x[0], y[0], z[0]])
    return np.array(pts, dtype=np.float64)


NORTH_HEMI = make_loop("0:-180, 0:-90, 0:0, 0:90")
SOUTH_HEMI = make_loop("0:90, 0:0, 0:-90, 0:-180")
CANDY_CANE = make_loop("-20:150, -20:-70, 0:70, 10:-150, 10:70, -10:-70")
ARCTIC_80 = make_loop("80:-150, 80:-30, 80:90")
SMALL_NE_CW = make_loop("35:20, 45:20, 40:25")


def test_hemisphere_areas():
    assert abs(M.loop_area(NORTH_HEMI) - 2 * math.pi) < 1e-12
    assert abs(M.loop_area(SOUTH_HEMI) - 2 * math.pi) < 1e-12


def test_empty_full_loops():
    assert M.loop_area(np.array([[0.0, 0.0, 1.0]])) == 0.0
    assert M.loop_area(np.array([[0.0, 0.0, -1.0]])) == 4 * math.pi


def test_cw_loop_area_is_complement():
    ccw = SMALL_NE_CW[::-1].copy()
    a_ccw = M.loop_area(ccw)
    a_cw = M.loop_area(SMALL_NE_CW)
    assert abs((a_ccw + a_cw) - 4 * math.pi) < 1e-10
    assert a_ccw < 0.01  # small triangle
    assert a_cw > 4 * math.pi - 0.01


def test_area_consistent_with_curvature():
    # Gauss-Bonnet: area ~= 2*pi - curvature (error ~ eps per vertex)
    for loop in (NORTH_HEMI, CANDY_CANE, ARCTIC_80):
        area = M.loop_area(loop)
        gb = 2 * math.pi - M.loop_curvature(loop)
        assert abs(area - gb) < 1e-9, (area, gb)


def test_triangle_area_small_vs_girard():
    # tiny triangle: L'Huilier must keep relative accuracy
    a = np.array(ck.latlng_deg_to_xyz(np.array([0.0]), np.array([0.0])))[:, 0]
    b = np.array(ck.latlng_deg_to_xyz(np.array([0.0]), np.array([1e-4])))[:, 0]
    c = np.array(ck.latlng_deg_to_xyz(np.array([1e-4]), np.array([0.0])))[:, 0]
    area = M.triangle_area(a, b, c)
    expected = 0.5 * math.radians(1e-4) ** 2
    assert abs(area - expected) / expected < 1e-6


def test_centroid_of_symmetric_loop_on_axis():
    c = M.loop_centroid(ARCTIC_80)
    n = c / np.linalg.norm(c)
    # arctic triangle is symmetric-ish around the pole; centroid近 z-axis
    assert n[2] > 0.99


def test_polygon_area_with_hole():
    from s2_geometry_kotlin_spark.sources.layers import regular_loop_vertices
    shell = regular_loop_vertices(10.0, 20.0, 5.0, 64)
    hole = regular_loop_vertices(10.0, 20.0, 2.0, 64)[::-1].copy()
    a_shell = M.loop_area(shell)
    a_hole_ccw = M.loop_area(hole[::-1].copy())
    total = M.polygon_area([shell, hole])
    assert abs(total - (a_shell - a_hole_ccw)) < 1e-10
    # spherical cap area = 2*pi*(1-cos r); polygon is inscribed, slightly
    # smaller but within 1% for 64 vertices
    cap = 2 * math.pi * (1 - math.cos(math.radians(5.0)))
    assert 0.98 * cap < a_shell < cap


def test_area_consistent_with_curvature_named_loops():
    """S2LoopUnitTest.areaConsistentWithCurvature (:459-472): by
    Gauss-Bonnet, area == 2*pi - curvature for every named fixture
    loop (within 1e-14)."""
    import math as m
    import sys

    from s2_geometry_kotlin_spark.kernel.measures import (loop_area,
                                                          loop_curvature)
    sys.path.insert(0, "tests")
    import test_loop_relations_matrix as mx
    named = [mx.north_hemi, mx.north_hemi3, mx.south_hemi, mx.west_hemi,
             mx.east_hemi, mx.near_hemi, mx.far_hemi, mx.candy_cane,
             mx.small_ne_cw, mx.arctic_80, mx.antarctic_80, mx.loop_a,
             mx.loop_b, mx.a_intersect_b, mx.a_union_b, mx.a_minus_b,
             mx.b_minus_a, mx.loop_c, mx.loop_d, mx.loop_e, mx.loop_f,
             mx.loop_g, mx.loop_h, mx.loop_i]
    for lp in named:
        area = loop_area(lp.vertices)
        gauss = 2 * m.pi - loop_curvature(lp.vertices)
        assert abs(area - gauss) <= 1e-14, lp


def test_area_consistent_with_sign_degenerate_equator_loops():
    """S2LoopUnitTest.getAreaConsistentWithSign (:475-501): degenerate
    loops with all vertices on the equator have area ~0 when CCW
    (normalized) and ~4*pi when CW, matching north-pole containment."""
    import math as m
    import random

    import numpy as np

    from s2_geometry_kotlin_spark.kernel.measures import loop_area
    from s2_geometry_kotlin_spark.kernel.regions import Loop
    from s2_geometry_kotlin_spark.kernel.validation import \
        find_validation_error
    rng = random.Random(61)
    done = 0
    while done < 40:
        nv = 3 + rng.randrange(4)
        verts = []
        for _ in range(nv):
            lng = rng.random() * (m.pi / 2)
            verts.append([m.cos(lng), m.sin(lng), 0.0])
        v = np.asarray(verts)
        if find_validation_error([v]) is not None:
            continue
        lp = Loop(v)
        area = loop_area(v)
        pole = np.array([0.0, 0.0, 1.0])
        ccw = not lp.contains_point(pole)
        want = 0.0 if ccw else 4 * m.pi
        assert abs(area - want) <= 1e-14, (done, area, ccw)
        done += 1


def test_true_centroid_fixtures():
    """S2CentroidsUnitTest ports (:34-95): small-triangle median
    property, semi-equator edge centroid, and great-circle segment sums
    cancelling to the sphere center."""
    import math as m
    import random

    import numpy as np

    from s2_geometry_kotlin_spark.kernel.measures import (
        edge_true_centroid, planar_centroid_triangle,
        true_centroid_triangle)

    def nrm(v):
        return v / np.linalg.norm(v)

    def ang(p, q):
        return m.atan2(float(np.linalg.norm(np.cross(p, q))),
                       float(p @ q))

    rng = random.Random(101)

    def frame():
        p = nrm(np.array([rng.gauss(0, 1) for _ in range(3)]))
        x = nrm(np.cross(p, np.array([rng.gauss(0, 1)
                                      for _ in range(3)])))
        y = nrm(np.cross(p, x))
        return p, x, y

    # small triangles: centroid at the intersection of the medians
    for _ in range(100):
        p, x, y = frame()
        d = 1e-4 * (1e-4 ** rng.random())
        p0 = nrm(p - d * x)
        p1 = nrm(p + d * x)
        p2 = nrm(p + 3 * d * y)
        centroid = nrm(true_centroid_triangle(p0, p1, p2))
        expected = nrm(p + d * y)
        assert ang(centroid, expected) <= 2e-8
        assert ang(centroid,
                   nrm(planar_centroid_triangle(p0, p1, p2))) <= 2e-8

    # semi-equator polyline: centroid*length points at B with norm 2
    a = np.array([0.0, -1.0, 0.0])
    b = np.array([1.0, 0.0, 0.0])
    c = np.array([0.0, 1.0, 0.0])
    cent = edge_true_centroid(a, b) + edge_true_centroid(b, c)
    assert ang(nrm(cent), b) < 1e-14
    assert abs(float(np.linalg.norm(cent)) - 2.0) < 1e-15

    # random great circles split into arbitrary segments sum to ~0
    for _ in range(100):
        _, x, y = frame()
        centroid = np.zeros(3)
        v0 = x
        theta = 0.0
        while theta < 2 * m.pi:
            v1 = m.cos(theta) * x + m.sin(theta) * y
            centroid = centroid + edge_true_centroid(v0, v1)
            v0 = v1
            theta += rng.random() ** 10.0
        centroid = centroid + edge_true_centroid(v0, x)
        assert float(np.linalg.norm(centroid)) <= 2e-14
