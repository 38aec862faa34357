"""B3 S2BooleanOperation parity tests: intersection/union/difference/
symmetric-difference semantics of S2Polygon.initToIntersection/Union/
Difference (S2Polygon.kt:768-801) on fixture polygons — area identities,
membership matrices, hole handling, no-crossing containment cases."""

import math

import numpy as np
import pytest

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel import measures
from s2_geometry_kotlin_spark.kernel.booleanop import polygon_boolean
from s2_geometry_kotlin_spark.kernel.polygon_relations import loop_depths
from s2_geometry_kotlin_spark.kernel.regions import Loop, Polygon
from s2_geometry_kotlin_spark.sources.layers import regular_loop_vertices


def pt(lat, lon):
    x, y, z = ck.latlng_deg_to_xyz(np.array([lat]), np.array([lon]))
    return np.array([x[0], y[0], z[0]])


def area(p: Polygon) -> float:
    tot = 0.0
    for lp, d in zip(p.loops, loop_depths(p)):
        a = measures.loop_area(lp.vertices)
        tot += a if d % 2 == 0 else -a
    return tot


def disc(lat, lon, radius_deg, nv=24) -> Polygon:
    return Polygon([Loop(regular_loop_vertices(lat, lon, radius_deg, nv))])


PARIS = (48.8566, 2.3522)
LONDON = (51.5074, -0.1278)
SYDNEY = (-33.8688, 151.2093)


@pytest.fixture(scope="module")
def overlapping():
    return disc(*PARIS, 2.0), disc(*LONDON, 2.0)


def test_area_identities_overlapping_discs(overlapping):
    a, b = overlapping
    i = polygon_boolean(a, b, "intersection")
    u = polygon_boolean(a, b, "union")
    d = polygon_boolean(a, b, "difference")
    s = polygon_boolean(a, b, "symmetric_difference")
    assert area(i) > 0 and area(i) < min(area(a), area(b))
    assert abs(area(a) + area(b) - (area(i) + area(u))) < 1e-12
    assert abs(area(d) - (area(a) - area(i))) < 1e-12
    assert abs(area(s) - (area(u) - area(i))) < 1e-12


def test_membership_matrix_overlapping_discs(overlapping):
    a, b = overlapping
    i = polygon_boolean(a, b, "intersection")
    u = polygon_boolean(a, b, "union")
    d = polygon_boolean(a, b, "difference")
    s = polygon_boolean(a, b, "symmetric_difference")
    # dense probe grid: result membership == boolean of operand PIP
    lats = np.linspace(44.0, 56.0, 25)
    lons = np.linspace(-6.0, 8.0, 25)
    for lat in lats:
        for lon in lons:
            p = pt(lat, lon)
            ia, ib = a.contains_point(p), b.contains_point(p)
            assert i.contains_point(p) == (ia and ib)
            assert u.contains_point(p) == (ia or ib)
            assert d.contains_point(p) == (ia and not ib)
            assert s.contains_point(p) == (ia != ib)


def test_hole_cases_donut_vs_disc():
    shell = Loop(regular_loop_vertices(*PARIS, 5.0, 24))
    hole = Loop(regular_loop_vertices(*PARIS, 1.0, 16)[::-1].copy())
    donut = Polygon([shell, hole])
    metro = disc(*PARIS, 2.0)
    i = polygon_boolean(donut, metro, "intersection")   # ring 1..2
    u = polygon_boolean(donut, metro, "union")          # full 5-disc
    d = polygon_boolean(donut, metro, "difference")     # ring 2..5
    d2 = polygon_boolean(metro, donut, "difference")    # 1-deg core
    core = pt(*PARIS)
    ring15 = pt(PARIS[0] + 1.5, PARIS[1])
    ring3 = pt(PARIS[0] + 3.0, PARIS[1])
    assert (i.contains_point(core), i.contains_point(ring15),
            i.contains_point(ring3)) == (False, True, False)
    assert (u.contains_point(core), u.contains_point(ring3)) == (True, True)
    assert (d.contains_point(ring15), d.contains_point(ring3)) == \
        (False, True)
    assert (d2.contains_point(core), d2.contains_point(ring15)) == \
        (True, False)
    assert abs(area(i) + area(u) - (area(donut) + area(metro))) < 1e-12
    assert len(u.loops) == 1  # hole swallowed by the disc


def test_no_crossing_containment_and_disjoint():
    a = disc(*PARIS, 2.0)
    small = disc(*PARIS, 0.5, 12)
    far = disc(*SYDNEY, 2.0, 12)
    assert abs(area(polygon_boolean(a, small, "intersection"))
               - area(small)) < 1e-15
    assert abs(area(polygon_boolean(a, small, "union")) - area(a)) < 1e-15
    ann = polygon_boolean(a, small, "difference")
    assert abs(area(ann) - (area(a) - area(small))) < 1e-15
    assert len(ann.loops) == 2
    assert polygon_boolean(small, a, "difference").loops == []
    assert polygon_boolean(a, far, "intersection").loops == []
    assert len(polygon_boolean(a, far, "union").loops) == 2
    assert abs(area(polygon_boolean(a, far, "difference"))
               - area(a)) < 1e-15


def test_antimeridian_crossing_ops():
    """Date-line wrap: diamond fixture loop (FIXTURES.md loop_a) vs a
    disc straddling the antimeridian."""
    diamond = Polygon([Loop.from_latlng_text("0:178, -1:180, 0:-179, 1:-180")])
    d = disc(0.3, 179.5, 1.0, 16)
    i = polygon_boolean(diamond, d, "intersection")
    u = polygon_boolean(diamond, d, "union")
    assert area(i) > 0
    assert abs(area(diamond) + area(d) - (area(i) + area(u))) < 1e-12
    for lat, lon in [(0.0, 179.0), (0.0, -179.5), (0.5, 179.5),
                     (0.9, -180.0), (-0.9, 180.0)]:
        p = pt(lat, lon)
        assert i.contains_point(p) == \
            (diamond.contains_point(p) and d.contains_point(p))
        assert u.contains_point(p) == \
            (diamond.contains_point(p) or d.contains_point(p))


def test_intersection_commutes_and_nests():
    a, b = disc(*PARIS, 2.0), disc(*LONDON, 2.0)
    i1 = polygon_boolean(a, b, "intersection")
    i2 = polygon_boolean(b, a, "intersection")
    assert abs(area(i1) - area(i2)) < 1e-15
    # chaining with a THIRD region (general position vs i1's boundary):
    # (A n B) n C == membership AND over all three on a probe grid
    c = disc(50.0, 1.0, 1.5, 20)
    i3 = polygon_boolean(i1, c, "intersection")
    for lat in np.linspace(47.5, 53.0, 12):
        for lon in np.linspace(-2.5, 4.5, 12):
            p = pt(lat, lon)
            assert i3.contains_point(p) == (
                a.contains_point(p) and b.contains_point(p)
                and c.contains_point(p))


def test_initoriented_reinversion_regression():
    """A single shell legitimately enclosing >half the sphere must
    round-trip, not silently become its complement (ADVICE r2)."""
    big = Polygon([Loop(regular_loop_vertices(*PARIS, 120.0, 24))])
    assert big.inverted
    assert big.contains_point(pt(*PARIS))
    assert area_of_region(big) > 2 * math.pi
    # antipode of Paris is outside
    assert not big.contains_point(pt(-PARIS[0], PARIS[1] - 180.0))


def area_of_region(p: Polygon) -> float:
    a = area(p)
    return 4 * math.pi - a if p.inverted else a


def test_contains_nested_sentinel_loops_follow_reference():
    """<3-vertex loops are the empty/full sentinels; the reference's
    containsNested short-circuits to isFull() || b.isEmpty()
    (S2Loop.kt:771-772) instead of running the degenerate wedge test."""
    from s2_geometry_kotlin_spark.kernel.polygon_relations import \
        contains_nested
    import pytest

    a = Loop(regular_loop_vertices(*PARIS, 2.0, 12))
    # canonical sentinels are ONE vertex (S2Loop.isEmptyOrFull is
    # numVertices == 1); a 2-vertex loop is malformed input and is
    # rejected loudly (ADVICE r4)
    empty = Loop.__new__(Loop)
    empty.vertices = regular_loop_vertices(*PARIS, 0.5, 12)[:1]
    empty.origin_inside = False
    empty._bound = None
    full = Loop.__new__(Loop)
    full.vertices = empty.vertices[:1]
    full.origin_inside = True
    full._bound = None
    two = Loop.__new__(Loop)
    two.vertices = regular_loop_vertices(*PARIS, 0.5, 12)[:2]
    two.origin_inside = False
    two._bound = None
    with pytest.raises(ValueError, match="1-vertex sentinels"):
        contains_nested(a, two)
    # every loop contains the empty loop
    assert contains_nested(a, empty) is True
    # a finite loop does not contain the full loop
    assert contains_nested(a, full) is False
    # the full loop contains everything; the empty loop nothing (but
    # still contains the empty loop)
    assert contains_nested(full, a) is True
    assert contains_nested(empty, a) is False
    assert contains_nested(empty, empty) is True


def test_clip_polyline_to_polygon():
    """B3 polyline operand: a line through a disc keeps exactly the
    inside chord (intersection) / the two outside stubs (difference),
    and the piece endpoints lie on the boundary ring's crossings."""
    import numpy as np

    from s2_geometry_kotlin_spark.kernel import cellid as ck
    from s2_geometry_kotlin_spark.kernel.booleanop import clip_polyline
    from s2_geometry_kotlin_spark.kernel.regions import Loop, Polygon
    from s2_geometry_kotlin_spark.sources.layers import \
        regular_loop_vertices

    disc = Polygon([Loop(regular_loop_vertices(10.0, 20.0, 2.0, 32))])

    def line(lls):
        lat = np.array([p[0] for p in lls])
        lon = np.array([p[1] for p in lls])
        x, y, z = ck.latlng_deg_to_xyz(lat, lon)
        return np.stack([x, y, z], axis=1)

    through = line([(10.0, 14.0), (10.0, 26.0)])
    inside = clip_polyline(through, disc, keep_inside=True)
    outside = clip_polyline(through, disc, keep_inside=False)
    assert len(inside) == 1 and len(outside) == 2
    # endpoints of the kept chord are the boundary crossings; both
    # verdicts partition the line (shared endpoints)
    assert np.allclose(inside[0][0], outside[0][-1])
    assert np.allclose(inside[0][-1], outside[1][0])
    # all chord interior points are inside the disc
    mid = inside[0][0] + inside[0][-1]
    mid /= np.linalg.norm(mid)
    assert disc.contains_point(mid)

    # a line fully outside is untouched by difference, empty by
    # intersection
    away = line([(40.0, 14.0), (40.0, 26.0)])
    assert clip_polyline(away, disc, keep_inside=True) == []
    off = clip_polyline(away, disc, keep_inside=False)
    assert len(off) == 1 and len(off[0]) == 2


def test_inverted_polygon_pip_kernel_consistency():
    """The PIP verify kernels honor Polygon.inverted: the vectorized
    polygon_contains_points(inverted=...) agrees with
    Polygon.contains_point for a >half-sphere shell."""
    import numpy as np

    from s2_geometry_kotlin_spark.kernel import cellid as ck
    from s2_geometry_kotlin_spark.kernel import pip
    from s2_geometry_kotlin_spark.kernel.regions import Loop, Polygon
    from s2_geometry_kotlin_spark.sources.layers import \
        regular_loop_vertices

    big = Polygon([Loop(regular_loop_vertices(48.0, 2.0, 120.0, 24))])
    assert big.inverted  # shell encloses >half the sphere
    lat = np.array([48.0, -48.0, 0.0, -80.0])
    lon = np.array([2.0, -178.0, 90.0, -178.0])
    x, y, z = ck.latlng_deg_to_xyz(lat, lon)
    pts = np.stack([x, y, z], axis=1)
    vec = pip.polygon_contains_points(
        [lp.vertices for lp in big.loops], pts, inverted=big.inverted)
    ref = np.array([big.contains_point(p) for p in pts])
    assert np.array_equal(vec, ref)
    assert vec[0] and not vec[1]  # near center in, antipode out


def test_dirty_operand_auto_snaps():
    """A vertex of A lying EXACTLY on an edge of B violates general
    position: the no-retry path fails to stitch, and the snap-rounding
    retry (B1 ingestion) rescues it."""
    import numpy as np
    import pytest

    from s2_geometry_kotlin_spark.kernel import cellid as ck
    from s2_geometry_kotlin_spark.kernel.booleanop import polygon_boolean
    from s2_geometry_kotlin_spark.kernel.edges import interpolate
    from s2_geometry_kotlin_spark.kernel.regions import Loop, Polygon
    from s2_geometry_kotlin_spark.sources.layers import \
        regular_loop_vertices

    b_ring = regular_loop_vertices(10.0, 20.0, 3.0, 8)
    # A runs ALONG the sub-segment b0 -> mid of B's first edge before
    # departing: a partial collinear overlap, the canonical
    # general-position violation (exact shared-edge matching cannot
    # pair it, and the split machinery cannot cut at a crossing that
    # has no crossing sign)
    m = b_ring[0] + b_ring[1]
    m = m / np.linalg.norm(m)

    def ll(lat, lon):
        x, y, z = ck.latlng_deg_to_xyz(np.array([lat]), np.array([lon]))
        return np.array([x[0], y[0], z[0]])

    a = Polygon([Loop(np.array([b_ring[0], m, ll(16.0, 26.0)]))])
    b = Polygon([Loop(b_ring)])
    with pytest.raises(ValueError, match="open chain|not assemblable"):
        polygon_boolean(a, b, "intersection", snap_on_failure=False)
    inter = polygon_boolean(a, b, "intersection")  # retry path
    assert len(inter.loops) == 1
    # duplicate vertices also survive (benign even without retry)
    dirty = np.insert(b_ring, 5, b_ring[5], axis=0)
    inter2 = polygon_boolean(Polygon([Loop(dirty)]), a, "intersection")
    assert inter2.loops
