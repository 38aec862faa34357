"""Port of the reference contains-point-query suite
(dilivia/s2/index/shape/S2ContainsPointQueryUnitTest.kt) against
pip.polygon_contains_points vertex models and regions.Loop:

- the three S2VertexModel fixtures over a mixed index (point shape +
  polyline + triangle): OPEN never contains vertices, SEMI_OPEN
  contains exactly the 'owned' vertex of the triangle, CLOSED contains
  every vertex including point-shape and polyline vertices;
- the 100-loop random sweep comparing the vectorized parity kernel
  (pip.loop_contains_points) against the independent Loop region
  containment;
- incident-edge visitation over a mixed index."""

import math

import numpy as np

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel.pip import (
    compute_origin_inside, loop_contains_points, polygon_contains_points)
from s2_geometry_kotlin_spark.kernel.regions import Loop
from s2_geometry_kotlin_spark.kernel.textparser import (
    make_point, parse_latlngs)


def pts(text: str) -> np.ndarray:
    lls = parse_latlngs(text)
    lat = np.array([a for a, _ in lls])
    lng = np.array([b for _, b in lls])
    x, y, z = ck.latlng_deg_to_xyz(lat, lng)
    return np.stack([x, y, z], axis=1)


# "0:0 # -1:1, 1:1 # 0:5, 0:7, 2:6"
POINT_SHAPE = pts("0:0")
POLYLINE = pts("-1:1, 1:1")
TRIANGLE = pts("0:5, 0:7, 2:6")


def query_contains(p: np.ndarray, model: str) -> bool:
    """contains(p) over the whole index: polygons contain by the
    vertex-model parity; under CLOSED, point shapes and polylines also
    contain their vertices (S2VertexModel.CLOSED semantics)."""
    if bool(polygon_contains_points([TRIANGLE], p[None, :],
                                    vertex_model=model)[0]):
        return True
    if model == "closed":
        for arr in (POINT_SHAPE, POLYLINE):
            if any(np.array_equal(p, v) for v in arr):
                return True
    return False


def test_vertex_model_open():
    m = "open"
    for t in ("0:0", "-1:1", "1:1", "0:2", "0:3", "0:5", "0:7", "2:6",
              "10:10"):
        assert not query_contains(make_point(t), m), t
    assert query_contains(make_point("1:6"), m)


def test_vertex_model_semi_open():
    m = "semi_open"
    for t in ("0:0", "-1:1", "1:1", "0:2", "0:5", "2:6", "10:10"):
        assert not query_contains(make_point(t), m), t
    assert query_contains(make_point("0:7"), m)  # contained vertex
    assert query_contains(make_point("1:6"), m)


def test_vertex_model_closed():
    m = "closed"
    for t in ("0:0", "-1:1", "1:1", "0:5", "0:7", "2:6", "1:6"):
        assert query_contains(make_point(t), m), t
    for t in ("0:2", "10:10"):
        assert not query_contains(make_point(t), m), t


def test_get_containing_shapes_random_sweep():
    """100 random regular loops near a random cap center; the parity
    kernel must agree with the independent Loop region containment for
    100 sample points."""
    from s2_geometry_kotlin_spark.sources.layers import (
        regular_loop_vertices)
    rng = np.random.default_rng(20260817)
    center_lat = float(rng.uniform(-60, 60))
    center_lng = float(rng.uniform(-180, 180))
    max_radius_deg = math.degrees(10.0 / 6371.01)  # ~10 km
    loops = []
    for _ in range(100):
        dlat = float(rng.uniform(-max_radius_deg, max_radius_deg))
        dlng = float(rng.uniform(-max_radius_deg, max_radius_deg))
        radius = max_radius_deg * float(rng.random()) + 1e-7
        loops.append(regular_loop_vertices(center_lat + dlat,
                                           center_lng + dlng, radius, 10))
    region_loops = [Loop(v) for v in loops]
    for _ in range(100):
        dlat = float(rng.uniform(-max_radius_deg, max_radius_deg))
        dlng = float(rng.uniform(-max_radius_deg, max_radius_deg))
        x, y, z = ck.latlng_deg_to_xyz(np.array([center_lat + dlat]),
                                       np.array([center_lng + dlng]))
        p = np.array([x[0], y[0], z[0]])
        for verts, lp in zip(loops, region_loops):
            got = bool(loop_contains_points(
                verts, p[None, :], compute_origin_inside(verts))[0])
            want = lp.contains_point(p)
            assert got == want


def test_visit_incident_edges():
    # "0:0 | 1:1 # 1:1, 1:2 # 1:2, 1:3, 2:2"
    shapes = [
        ("points", pts("0:0, 1:1")),
        ("polyline", pts("1:1, 1:2")),
        ("triangle", pts("1:2, 1:3, 2:2")),
    ]

    def edges_of(kind, arr):
        if kind == "points":
            return [(k, arr[k], arr[k]) for k in range(len(arr))]
        if kind == "polyline":
            return [(k, arr[k], arr[k + 1]) for k in range(len(arr) - 1)]
        n = len(arr)
        return [(k, arr[k], arr[(k + 1) % n]) for k in range(n)]

    def incident(p):
        out = []
        for sid, (kind, arr) in enumerate(shapes):
            for eid, a, b in edges_of(kind, arr):
                if np.array_equal(p, a) or np.array_equal(p, b):
                    out.append((sid, eid))
        return out

    assert incident(make_point("0:0")) == [(0, 0)]
    assert incident(make_point("1:1")) == [(0, 1), (1, 0)]
    assert incident(make_point("1:2")) == [(1, 0), (2, 0), (2, 2)]
    assert incident(make_point("1:3")) == [(2, 0), (2, 1)]
    assert incident(make_point("2:2")) == [(2, 1), (2, 2)]
