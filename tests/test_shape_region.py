"""GeometryRegion / BufferedGeometryRegion: coverings of mixed
point+polyline+polygon collections (S2ShapeIndexRegion /
S2ShapeIndexBufferedRegion semantics)."""

import math

import numpy as np

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel.coverer import RegionCoverer
from s2_geometry_kotlin_spark.kernel.shape_region import (
    BufferedGeometryRegion, GeometryRegion)
from s2_geometry_kotlin_spark.kernel.textparser import make_index


def covered(cov, p):
    leaf = np.uint64(ck.from_xyz(np.array([p[0]]), np.array([p[1]]),
                                 np.array([p[2]]))[0])
    return any(ck.sc_range_min(c) <= leaf <= ck.sc_range_max(c)
               for c in cov)


MIXED = ("10:10 | 30:30 # 0:0, 5:5, 5:10 # "
         "20:20, 20:22, 22:22, 22:20")


def test_mixed_collection_covering_covers_every_shape():
    geom = make_index(MIXED)
    region = GeometryRegion(geom)
    cov = RegionCoverer(max_cells=32).get_covering(region)
    assert cov
    # every point, polyline vertex+midpoint and polygon vertex+interior
    # sample is covered
    samples = list(geom.points)
    for ln in geom.lines:
        samples.extend(ln)
        samples.extend((ln[:-1] + ln[1:]) /
                       np.linalg.norm(ln[:-1] + ln[1:],
                                      axis=1, keepdims=True))
    for lo in geom.loops:
        samples.extend(np.asarray(lo))
    # interior of the square
    la, lo_ = 21.0, 21.0
    x = math.cos(math.radians(la)) * math.cos(math.radians(lo_))
    y = math.cos(math.radians(la)) * math.sin(math.radians(lo_))
    z = math.sin(math.radians(la))
    samples.append(np.array([x, y, z]))
    for p in samples:
        assert covered(cov, np.asarray(p))
    # a far-away point is NOT covered (the covering is not trivial)
    far = np.array([0.0, 0.0, -1.0])
    assert not covered(cov, far)


def test_interior_covering_inside_covering():
    geom = make_index(MIXED)
    region = GeometryRegion(geom)
    rc = RegionCoverer(max_cells=32)
    cov = rc.get_covering(region)
    interior = rc.get_interior_covering(region)
    # only the polygon part has interior; every interior cell is under
    # the covering and strictly inside the square
    for c in interior:
        assert any(ck.sc_range_min(o) <= c <= ck.sc_range_max(o)
                   for o in cov)


def test_buffered_region_grows_and_contains():
    geom = make_index("0:0 # #")   # a single point
    r = math.radians(2.0)
    region = BufferedGeometryRegion(geom, r)
    cov = RegionCoverer(max_cells=16).get_covering(region)

    def ll(lat, lng):
        la, lo_ = math.radians(lat), math.radians(lng)
        return np.array([math.cos(la) * math.cos(lo_),
                         math.cos(la) * math.sin(lo_), math.sin(la)])

    # a point 1 degree away is inside the buffer; 5 degrees is not
    assert covered(cov, ll(1.0, 0.0))
    assert not covered(cov, ll(5.0, 5.0))
    # contains_cell is conservative but accepts a small central cell
    pid = int(ck.parent(np.array(
        [ck.from_xyz(np.array([1.0]), np.array([0.0]),
                     np.array([0.0]))[0]], dtype=np.uint64), 8)[0])
    from s2_geometry_kotlin_spark.kernel.regions import Cell
    assert region.contains_cell(Cell(pid))


def test_buffered_polyline_distance_covering():
    geom = make_index("# 0:0, 0:10 #")
    r = math.radians(1.5)
    region = BufferedGeometryRegion(geom, r)
    cov = RegionCoverer(max_cells=24).get_covering(region)

    def ll(lat, lng):
        la, lo_ = math.radians(lat), math.radians(lng)
        return np.array([math.cos(la) * math.cos(lo_),
                         math.cos(la) * math.sin(lo_), math.sin(la)])

    assert covered(cov, ll(1.0, 5.0))     # 1 deg off the midline
    assert not covered(cov, ll(8.0, 5.0))  # 8 deg away


def test_shape_index_measures_fixtures():
    """S2ShapeIndexMeasuresUnitTest port
    (index/shape/S2ShapeIndexMeasuresUnitTest.kt:37-120): dimension,
    numPoints, length, perimeter and area over mixed collections."""
    import math

    from s2_geometry_kotlin_spark.kernel.boolean_mixed import (
        geometry_approx_area, geometry_area, geometry_dimension,
        geometry_length, geometry_num_points, geometry_perimeter)

    def g(text):
        return make_index(text)

    assert geometry_dimension(g("# #")) == -1
    assert geometry_dimension(g("0:0 # #")) == 0
    assert geometry_dimension(g("0:0 # 1:1, 1:2 #")) == 1
    assert geometry_dimension(g("0:0 # 1:1 #")) == 1
    assert geometry_dimension(g("0:0 # 1:1, 2:2 # 3:3, 3:4, 4:3")) == 2

    assert geometry_num_points(g("# #")) == 0
    assert geometry_num_points(g("0:0 | 1:0 # #")) == 2
    assert geometry_num_points(g("# 1:1, 1:2 # 0:3, 0:5, 2:5")) == 0

    assert geometry_length(g("# #")) == 0.0
    got = geometry_length(g("4:4 # 0:0, 1:0 | 1:0, 2:0 # 5:5, 5:6, 6:5"))
    assert abs(math.degrees(got) - 2.0) < 1e-16

    assert geometry_perimeter(g("# #")) == 0.0
    got = geometry_perimeter(
        g("4:4 # 0:0, 1:0 | 2:0, 3:0 # 0:1, 0:2, 0:3"))
    assert abs(math.degrees(got) - 4.0) < 1e-13

    assert geometry_area(g("# #")) == 0.0
    assert abs(geometry_area(g("# # full | full")) -
               8 * math.pi) < 1e-15
    assert abs(geometry_approx_area(g("# # full | full")) -
               8 * math.pi) < 1e-15
