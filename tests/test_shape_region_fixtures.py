"""Ports of S2ShapeIndexRegionUnitTest.kt and
S2ShapeIndexBufferedRegionUnitTest.kt (region/) against
kernel.shape_region.GeometryRegion / BufferedGeometryRegion.

The reference builds shapes around an S2ShapeIndex; here the same
geometry goes through LaxGeometry collections, and the cell relations
are decided the same way (uv clipping with the documented conservative
error bounds), so the fixtures carry over verbatim.
"""

import math

import numpy as np

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel.boolean_mixed import LaxGeometry
from s2_geometry_kotlin_spark.kernel.clipping import (
    FACE_CLIP_ERROR_UV_COORD, INTERSECTS_RECT_ERROR_UV_DIST)
from s2_geometry_kotlin_spark.kernel.coverer import RegionCoverer
from s2_geometry_kotlin_spark.kernel.regions import Cap, Cell, CellRegion
from s2_geometry_kotlin_spark.kernel.shape_region import (
    BufferedGeometryRegion, GeometryRegion)
from s2_geometry_kotlin_spark.kernel.textparser import make_index, make_point

# S2ShapeIndexRegionUnitTest.kt:38 — pad by at least twice the maximum
# error for reliable results
K_PADDING = 2.0 * (FACE_CLIP_ERROR_UV_COORD + INTERSECTS_RECT_ERROR_UV_DIST)


def cid(debug: str) -> int:
    return int(ck.from_debug_string([debug])[0])


def padded_cell(cell_id: int, padding_uv: float) -> LaxGeometry:
    """newPaddedCell (S2ShapeIndexRegionUnitTest.kt:40-48): a lax loop
    tracing the cell's uv bound expanded by padding_uv."""
    face, _, _ = ck.sc_to_face_ij(cell_id)
    u_lo, u_hi, v_lo, v_hi = ck.sc_bound_uv(cell_id)
    u_lo -= padding_uv
    v_lo -= padding_uv
    u_hi += padding_uv
    v_hi += padding_uv
    verts = []
    for u, v in ((u_lo, v_lo), (u_hi, v_lo), (u_hi, v_hi), (u_lo, v_hi)):
        p = np.array(ck.sc_face_uv_to_xyz(face, u, v))
        verts.append(p / np.linalg.norm(p))
    g = LaxGeometry()
    g.loops.append(np.asarray(verts))
    return g


TARGET = "3/0123012301230123012301230123"


def test_get_cap_bound():
    """getCapBound (S2ShapeIndexRegionUnitTest.kt:52-66)."""
    target = cid(TARGET)
    region = GeometryRegion(padded_cell(target, -K_PADDING))
    cell_bound = CellRegion(target).cap_bound()
    index_bound = region.cap_bound()
    assert index_bound.contains_cap(cell_bound)
    assert index_bound.radius_angle() <= cell_bound.radius_angle() * 1.00001


def test_get_rect_bound():
    """getRectBound (S2ShapeIndexRegionUnitTest.kt:68-78)."""
    target = cid(TARGET)
    region = GeometryRegion(padded_cell(target, -K_PADDING))
    cell_bound = Cell(target).rect_bound()
    index_bound = region.rect_bound()
    assert abs(index_bound.lat_lo - cell_bound.lat_lo) < 1e-15
    assert abs(index_bound.lat_hi - cell_bound.lat_hi) < 1e-15
    assert abs(index_bound.lng.lo - cell_bound.lng.lo) < 1e-15
    assert abs(index_bound.lng.hi - cell_bound.lng.hi) < 1e-15


def test_get_cell_union_bound_multiple_faces():
    """getCellUnionBoundMultipleFaces
    (S2ShapeIndexRegionUnitTest.kt:80-89)."""
    ids = [cid("3/00123"), cid("2/11200013")]
    region = GeometryRegion([padded_cell(i, -K_PADDING) for i in ids])
    covering = region.cell_union_bound()
    assert covering == sorted(ids)


def test_get_cell_union_bound_one_face():
    """getCellUnionBoundOneFace (S2ShapeIndexRegionUnitTest.kt:91-115):
    three pairs within children of face 5; the bound is the smallest
    cell enclosing each pair."""
    inputs = [
        cid("5/010"), cid("5/0211030"),
        cid("5/110230123"), cid("5/11023021133"),
        cid("5/311020003003030303"), cid("5/311020023"),
    ]
    expected = [cid("5/0"), cid("5/110230"), cid("5/3110200")]
    # each shape added 3 times in the reference to force subdivision;
    # the cell relations here don't depend on multiplicity
    region = GeometryRegion(
        [padded_cell(i, -K_PADDING) for i in inputs for _ in range(3)])
    assert region.cell_union_bound() == expected


def test_contains_cell_multiple_shapes():
    """containsCellMultipleShapes
    (S2ShapeIndexRegionUnitTest.kt:117-137): contains is true if ANY
    shape contains the cell."""
    target = cid(TARGET)
    shrunk = padded_cell(target, -K_PADDING)
    assert not GeometryRegion(shrunk).contains_cell(Cell(target))

    grown = padded_cell(target, K_PADDING)
    region = GeometryRegion([shrunk, grown])
    assert region.contains_cell(Cell(target))
    for k in range(4):
        child = int(ck.sc_child(target, k))
        assert region.contains_cell(Cell(child))


def test_intersects_shrunken_cell():
    """intersectsShrunkenCell (S2ShapeIndexRegionUnitTest.kt:139-156):
    a shape strictly inside the target intersects the target but none
    of its 8 neighbors."""
    target = cid(TARGET)
    region = GeometryRegion(padded_cell(target, -K_PADDING))
    assert region.may_intersect_cell(Cell(target))
    for nbr in ck.get_all_neighbors(target, ck.sc_level(target)):
        assert not region.may_intersect_cell(Cell(nbr))


def test_intersects_exact_cell():
    """intersectsExactCell (S2ShapeIndexRegionUnitTest.kt:158-173): a
    shape tracing the exact cell boundary intersects the cell and all
    8 neighbors."""
    target = cid(TARGET)
    region = GeometryRegion(padded_cell(target, 0.0))
    assert region.may_intersect_cell(Cell(target))
    for nbr in ck.get_all_neighbors(target, ck.sc_level(target)):
        assert region.may_intersect_cell(Cell(nbr))


# ---------------------------------------------------------------------------
# S2ShapeIndexBufferedRegionUnitTest.kt
# ---------------------------------------------------------------------------

def _chord2(r: float) -> float:
    s = math.sin(min(r, math.pi) / 2.0)
    return 4.0 * s * s


def test_buffered_empty_index():
    """emptyIndex (S2ShapeIndexBufferedRegionUnitTest.kt:36-44)."""
    region = BufferedGeometryRegion(LaxGeometry(), math.radians(2.0))
    assert RegionCoverer().get_covering(region) == []


def test_buffered_full_polygon():
    """fullPolygon (S2ShapeIndexBufferedRegionUnitTest.kt:46-58)."""
    region = BufferedGeometryRegion(make_index("# # full"),
                                    math.radians(2.0))
    covering = RegionCoverer().get_covering(region)
    assert len(covering) == 6
    assert all(ck.sc_level(c) == 0 for c in covering)


def test_buffered_full_after_buffering():
    """fullAfterBuffering
    (S2ShapeIndexBufferedRegionUnitTest.kt:60-72): six axis points
    buffered by 60 degrees cover the sphere."""
    geom = make_index("0:0 | 0:90 | 0:180 | 0:-90 | 90:0 | -90:0 # #")
    region = BufferedGeometryRegion(geom, math.radians(60.0))
    covering = RegionCoverer(max_cells=1000).get_covering(region)
    assert len(covering) == 6
    assert all(ck.sc_level(c) == 0 for c in covering)


def test_buffered_point_zero_radius():
    """pointZeroRadius (S2ShapeIndexBufferedRegionUnitTest.kt:74-86)."""
    region = BufferedGeometryRegion(make_index("34:25 # #"), 0.0)
    covering = RegionCoverer().get_covering(region)
    assert len(covering) == 1
    assert ck.sc_level(covering[0]) == ck.MAX_LEVEL


def _union_contains(covering, target: int) -> bool:
    return any(ck.sc_range_min(c) <= ck.sc_range_min(target) and
               ck.sc_range_max(target) <= ck.sc_range_max(c)
               for c in covering)


def _union_intersects(covering, target: int) -> bool:
    return any(ck.sc_range_min(c) <= ck.sc_range_max(target) and
               ck.sc_range_max(c) >= ck.sc_range_min(target)
               for c in covering)


def _check_covering(region, covering, check_tight, cell_id=None,
                    budget=None):
    """S2CellUnionUnitTest.checkCovering port: recursive validation
    that `covering` covers `region` (and, if check_tight, touches only
    cells the region may intersect)."""
    if budget is None:
        budget = [500_000]
    if cell_id is None:
        for face in range(6):
            _check_covering(region, covering, check_tight,
                            int(ck.from_face(face)), budget)
        return
    budget[0] -= 1
    assert budget[0] > 0, "checkCovering recursion runaway"
    cell = Cell(cell_id)
    if not region.may_intersect_cell(cell):
        if check_tight:
            assert not _union_intersects(covering, cell_id)
    elif not _union_contains(covering, cell_id):
        assert not region.contains_cell(cell)
        assert ck.sc_level(cell_id) < ck.MAX_LEVEL
        for k in range(4):
            _check_covering(region, covering, check_tight,
                            int(ck.sc_child(cell_id, k)), budget)


def test_buffered_point_vs_cap():
    """bufferedPointVsCap
    (S2ShapeIndexBufferedRegionUnitTest.kt:88-100): the covering of a
    buffered point is a valid covering of the equivalent cap."""
    point = make_point("3:5")
    radius = math.radians(2.0)
    region = BufferedGeometryRegion(make_index("3:5 # #"), radius)
    covering = RegionCoverer(max_cells=50).get_covering(region)
    cap = Cap(point, _chord2(radius))
    _check_covering(cap, covering, True)


def _tangents(p: np.ndarray):
    k = int(np.argmin(np.abs(p)))
    e = np.zeros(3)
    e[k] = 1.0
    t1 = np.cross(p, e)
    t1 /= np.linalg.norm(t1)
    return t1, np.cross(p, t1)


def _buffer_index_case(index_str: str, radius: float, max_cells: int):
    """testBufferIndex (S2ShapeIndexBufferedRegionUnitTest.kt:109-139)
    re-expressed: (a) the covering contains every sample of the
    original geometry, and (b) points at 0.99*radius from the geometry
    in any direction are still covered (i.e. the buffered region lies
    inside the covering); every covering cell may-intersects the
    region."""
    geom = make_index(index_str)
    region = BufferedGeometryRegion(geom, radius)
    covering = RegionCoverer(max_cells=max_cells).get_covering(region)
    assert covering

    def covered(p):
        leaf = int(ck.from_xyz(np.array([p[0]]), np.array([p[1]]),
                               np.array([p[2]]))[0])
        return _union_contains(covering, leaf)

    samples = [np.asarray(p) for p in geom.points]
    chains = list(geom.lines) + [np.vstack([lo, lo[:1]])
                                 for lo in geom.loops]
    for chain in chains:
        for i in range(len(chain) - 1):
            a, b = chain[i], chain[i + 1]
            for t in np.linspace(0.0, 1.0, 9):
                q = (1 - t) * a + t * b
                samples.append(q / np.linalg.norm(q))
    d = 0.99 * radius
    for p in samples:
        assert covered(p)
        t1, t2 = _tangents(p)
        for theta in np.linspace(0.0, 2 * math.pi, 8, endpoint=False):
            direction = math.cos(theta) * t1 + math.sin(theta) * t2
            q = math.cos(d) * p + math.sin(d) * direction
            assert covered(q)
    for c in covering:
        assert region.may_intersect_cell(Cell(c))


def test_buffered_point_set():
    """pointSet (S2ShapeIndexBufferedRegionUnitTest.kt:141-146)."""
    _buffer_index_case("10:20 | 10:23 | 10:26 # #",
                       math.radians(5.0), 100)


def test_buffered_polyline():
    """polyline (S2ShapeIndexBufferedRegionUnitTest.kt:148-153)."""
    _buffer_index_case("# 10:5, 20:30, -10:60, -60:100 #",
                       math.radians(2.0), 100)


def test_buffered_polygon_with_hole():
    """polygonWithHole
    (S2ShapeIndexBufferedRegionUnitTest.kt:155-160)."""
    _buffer_index_case("# # 10:10, 10:100, 70:0; 11:11, 69:0, 11:99",
                       math.radians(2.0), 100)
