"""Port of the reference region-union suite
(dilivia/s2/region/S2RegionUnionUnitTest.kt) against GeometryRegion
over a point collection (the union-of-point-regions shape): bounds,
cell relations, point containment, incremental add, and the
single-cell covering collapsing to the common face."""

import math

import numpy as np

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel.boolean_mixed import LaxGeometry
from s2_geometry_kotlin_spark.kernel.coverer import RegionCoverer
from s2_geometry_kotlin_spark.kernel.regions import Cell
from s2_geometry_kotlin_spark.kernel.shape_region import GeometryRegion


def pt(lat, lng):
    x, y, z = ck.latlng_deg_to_xyz(np.array([float(lat)]),
                                   np.array([float(lng)]))
    return np.array([x[0], y[0], z[0]])


def test_region_union_basic():
    two = GeometryRegion(LaxGeometry(points=[pt(35, 40), pt(-35, -40)]))
    rect = two.rect_bound()
    # GeometryRegion's bound carries the conservative bounder padding
    # (the reference test likewise only requires approxEquals)
    assert abs(math.degrees(rect.lat_lo) - (-35)) <= 1e-6
    assert abs(math.degrees(rect.lat_hi) - 35) <= 1e-6
    assert abs(math.degrees(rect.lng.lo) - (-40)) <= 1e-6
    assert abs(math.degrees(rect.lng.hi) - 40) <= 1e-6

    face0 = Cell(int(ck.from_face(np.array([0]))[0]))
    assert two.may_intersect_cell(face0)
    assert not two.contains_cell(face0)

    assert two.contains_point(pt(35, 40))
    assert two.contains_point(pt(-35, -40))
    assert not two.contains_point(pt(0, 0))

    # adding another region
    three = GeometryRegion(LaxGeometry(
        points=[pt(35, 40), pt(-35, -40), pt(10, 10)]))
    assert not two.contains_point(pt(10, 10))
    assert three.contains_point(pt(10, 10))

    # a 1-cell covering collapses to the common face
    covering = RegionCoverer(max_cells=1).get_covering(two)
    assert len(covering) == 1
    assert covering[0] == int(ck.from_face(np.array([0]))[0])
