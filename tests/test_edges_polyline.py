"""Unit tests for the D2/D3 edge kernels and the S2Polyline class
(reference semantics: edge/S2EdgeDistances.kt, region/S2Cell.kt:254-386,
region/S2Polyline.kt)."""

import math

import numpy as np
import pytest

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel import distance as dist
from s2_geometry_kotlin_spark.kernel import edges as ek
from s2_geometry_kotlin_spark.kernel.polyline import Polyline


def _pt(lat, lon):
    x, y, z = ck.latlng_deg_to_xyz(np.array([lat]), np.array([lon]))
    return np.array([x[0], y[0], z[0]])


def test_pairwise_matches_matrix_form():
    rng = np.random.default_rng(3)
    p = rng.normal(size=(50, 3))
    p /= np.linalg.norm(p, axis=1, keepdims=True)
    a = rng.normal(size=(50, 3))
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    b = rng.normal(size=(50, 3))
    b /= np.linalg.norm(b, axis=1, keepdims=True)
    paired = ek.point_edge_chord2_pairwise(p, a, b)
    matrix = dist.point_edge_chord2(p, a, b)
    # last-ulp tolerance: the matrix form's endpoint term goes through
    # BLAS matmul (FMA/reassociation), the paired form through einsum
    assert np.allclose(paired, matrix.diagonal(), rtol=0, atol=4e-15)


def test_project_endpoint_and_interior():
    a = np.array([_pt(0, 0)])
    b = np.array([_pt(0, 10)])
    # point "behind" a projects to a
    p = np.array([_pt(0, -5)])
    q = ek.project_to_edge(p, a, b)
    assert np.allclose(q[0], a[0], atol=1e-15)
    # point above the middle projects onto the interior at same lon
    p = np.array([_pt(5, 5)])
    q = ek.project_to_edge(p, a, b)
    lat, lon = ck.xyz_to_latlng_deg(q[0, 0], q[0, 1], q[0, 2])
    assert abs(float(lon) - 5.0) < 1e-9
    assert abs(float(lat)) < 1e-9
    # projected point's distance equals the kernel min distance
    d2 = ek.point_edge_chord2_pairwise(p, a, b)
    dq = p[0] - q[0]
    assert abs(float(dq @ dq) - float(d2[0])) < 1e-15


def test_interpolate_matches_reference_semantics():
    a = np.array([_pt(0, 0)])
    b = np.array([_pt(0, 90)])
    mid = ek.interpolate(a, b, 0.5)
    lat, lon = ck.xyz_to_latlng_deg(mid[0, 0], mid[0, 1], mid[0, 2])
    assert abs(float(lon) - 45.0) < 1e-9
    # interpolate_at_distance: quarter of the 90-degree edge
    q = ek.interpolate_at_distance(a, b, math.radians(30.0))
    lat, lon = ck.xyz_to_latlng_deg(q[0, 0], q[0, 1], q[0, 2])
    assert abs(float(lon) - 30.0) < 1e-9
    # endpoints exact
    assert np.allclose(ek.interpolate(a, b, 0.0)[0], a[0], atol=1e-15)
    assert np.allclose(ek.interpolate(a, b, 1.0)[0], b[0], atol=1e-12)


def test_edge_edge_distance_zero_on_cross():
    a = np.array([_pt(-5, 0)])
    b = np.array([_pt(5, 0)])
    c = np.array([_pt(0, -5)])
    d = np.array([_pt(0, 5)])
    assert ek.edge_edge_chord2(a, b, c, d)[0] == 0.0
    # disjoint edges: distance equals closest endpoint-edge distance
    c2 = np.array([_pt(10, -5)])
    d2 = np.array([_pt(10, 5)])
    got = ek.edge_edge_chord2(a, b, c2, d2)[0]
    brute = min(
        ek.point_edge_chord2_pairwise(c2, a, b)[0],
        ek.point_edge_chord2_pairwise(d2, a, b)[0],
        ek.point_edge_chord2_pairwise(a, c2, d2)[0],
        ek.point_edge_chord2_pairwise(b, c2, d2)[0])
    assert got == brute > 0


def test_cell_point_chord2_inside_is_zero():
    cid = ck.parent(ck.from_latlng_deg(np.array([10.0]), np.array([20.0])), 8)
    pts = np.stack([_pt(10.0, 20.0), _pt(-60.0, 100.0)])
    d2 = ek.cell_point_chord2(cid, pts)
    assert d2[0, 0] == 0.0
    assert d2[0, 1] > 0.1
    # distance agrees with brute-force min over boundary edges
    verts = ck.cell_vertices(cid)[0]
    a = verts
    b = np.roll(verts, -1, axis=0)
    brute = dist.point_edge_chord2(pts[1:2], a, b).min()
    assert abs(d2[0, 1] - brute) < 1e-15


def test_cell_cell_chord2():
    ida = int(ck.parent(ck.from_latlng_deg(
        np.array([10.0]), np.array([20.0])), 6)[0])
    idb = int(ck.parent(ck.from_latlng_deg(
        np.array([10.0]), np.array([20.0])), 10)[0])
    assert ek.cell_cell_chord2(ida, idb) == 0.0  # nested
    far = int(ck.parent(ck.from_latlng_deg(
        np.array([-50.0]), np.array([-100.0])), 6)[0])
    d = ek.cell_cell_chord2(ida, far)
    assert 0.0 < d <= 4.0


def test_polyline_interpolate_and_length():
    line = Polyline.from_latlng_deg([(0, 0), (0, 90), (0, 180)])
    assert abs(line.arclength_angle() - math.pi) < 1e-12
    mid = line.interpolate(0.5)
    lat, lon = ck.xyz_to_latlng_deg(mid[0], mid[1], mid[2])
    assert abs(float(lon) - 90.0) < 1e-9
    q = line.interpolate(0.25)
    lat, lon = ck.xyz_to_latlng_deg(q[0], q[1], q[2])
    assert abs(float(lon) - 45.0) < 1e-9
    assert np.allclose(line.interpolate(0.0), line.vertices[0])
    assert np.allclose(line.interpolate(1.0), line.vertices[-1])


def test_polyline_project():
    line = Polyline.from_latlng_deg([(0, 0), (0, 10), (10, 10)])
    q, nxt = line.project(_pt(5, 2))
    lat, lon = ck.xyz_to_latlng_deg(q[0], q[1], q[2])
    assert abs(float(lon) - 2.0) < 1e-9 and abs(float(lat)) < 1e-9
    assert nxt == 1
    q, nxt = line.project(_pt(5, 11))
    # closest to the second edge
    assert nxt == 2


def test_polyline_intersects():
    a = Polyline.from_latlng_deg([(0, -10), (0, 10)])
    b = Polyline.from_latlng_deg([(-10, 0), (10, 0)])
    c = Polyline.from_latlng_deg([(5, -10), (5, 10)])
    assert a.intersects(b)
    assert b.intersects(a)
    assert not a.intersects(c)


def test_polyline_subsample():
    # nearly-collinear middle vertex gets dropped at loose tolerance
    line = Polyline.from_latlng_deg([(0, 0), (0.01, 5), (0, 10)])
    keep = line.subsample_vertices(math.radians(1.0))
    assert keep == [0, 2]
    keep_tight = line.subsample_vertices(math.radians(0.001))
    assert keep_tight == [0, 1, 2]


def test_polyline_region_contract():
    from s2_geometry_kotlin_spark.kernel.coverer import RegionCoverer
    from s2_geometry_kotlin_spark.kernel.regions import Cell
    line = Polyline.from_latlng_deg([(48.7, 2.2), (48.9, 2.4), (48.8, 2.6)])
    cov = RegionCoverer(max_cells=16).get_covering(line)
    assert cov
    # every vertex of the line lies in some covering cell
    for v in line.vertices:
        lat, lon = ck.xyz_to_latlng_deg(v[0], v[1], v[2])
        leaf = int(ck.from_latlng_deg(np.atleast_1d(lat),
                                      np.atleast_1d(lon))[0])
        assert any(ck.sc_range_min(c) <= leaf <= ck.sc_range_max(c)
                   for c in cov)
    # 1-dim region never contains a cell
    assert not line.contains_cell(Cell(cov[0]))
