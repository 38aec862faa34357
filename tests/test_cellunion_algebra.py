"""Unit tests for the completed cell-union algebra: U7 difference, U10
fromBeginEnd/fromMinMax, U6 intersect-with-cell, C6 simple covering /
flood fill, E17 expandedByDistanceUV, M5 cell areas (reference:
region/S2CellUnion.kt, S2RegionCoverer.kt:727-751, S2CellId.kt:977-1009,
region/S2Cell.kt:205-250)."""

import math

import numpy as np

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel import coverer as cov
from s2_geometry_kotlin_spark.kernel import distance as dist
from s2_geometry_kotlin_spark.kernel.regions import Cap


def _leaves(cells, level):
    """All level-`level` descendants of a normalized union (test helper;
    cells must be at levels <= level)."""
    out = set()
    for c in cells:
        lo = ck.sc_range_min(c) - 1 + (1 << (2 * (30 - level)))
        step = 1 << (2 * (30 - level) + 1)
        count = 1 << (2 * (level - ck.sc_level(c)))
        for i in range(count):
            out.add(lo + i * step)
    return out


def _random_union(rng, n, max_level=8, min_level=4):
    ids = ck.from_latlng_deg(rng.uniform(-80, 80, n),
                             rng.uniform(-180, 180, n))
    lvls = rng.integers(min_level, max_level + 1, n)
    return cov.normalize([int(u) for u in ck.parent(ids, lvls)])


def test_difference_matches_leaf_sets():
    rng = np.random.default_rng(11)
    for trial in range(10):
        a = _random_union(rng, 20)
        b = _random_union(rng, 20)
        d = cov.difference(a, b)
        # verify at the finest level present
        lv = max((ck.sc_level(c) for c in a + b + d), default=0)
        la, lb, ld = (_leaves(a, lv), _leaves(b, lv), _leaves(d, lv))
        assert ld == la - lb
        # difference of a normalized input stays normalized
        assert cov.normalize(d) == sorted(d)


def test_difference_with_self_and_disjoint():
    rng = np.random.default_rng(12)
    a = _random_union(rng, 10)
    assert cov.difference(a, a) == []
    assert cov.difference(a, []) == a


def test_from_begin_end_roundtrip():
    rng = np.random.default_rng(13)
    for _ in range(20):
        ids = ck.from_latlng_deg(rng.uniform(-80, 80, 2),
                                 rng.uniform(-180, 180, 2))
        lo, hi = sorted(int(u) for u in ids)
        cells = cov.from_begin_end(lo, hi)
        # covering is normalized, sorted, and covers exactly [lo, hi)
        assert cells == cov.normalize(cells)
        total = sum(ck.sc_range_max(c) - ck.sc_range_min(c) + 2
                    for c in cells) // 2
        assert total == (hi - lo) // 2
        assert ck.sc_range_min(cells[0]) == lo
        assert ck.sc_range_max(cells[-1]) == hi - 2
    assert cov.from_begin_end(lo, lo) == []


def test_from_min_max_includes_endpoints():
    rng = np.random.default_rng(14)
    ids = ck.from_latlng_deg(rng.uniform(-80, 80, 2),
                             rng.uniform(-180, 180, 2))
    lo, hi = sorted(int(u) for u in ids)
    cells = cov.from_min_max(lo, hi)
    assert ck.sc_range_min(cells[0]) <= lo
    assert ck.sc_range_max(cells[-1]) >= hi


def test_intersect_with_cell():
    rng = np.random.default_rng(15)
    a = _random_union(rng, 30, max_level=10, min_level=6)
    probe = a[len(a) // 2]
    par = ck.sc_parent(probe, max(0, ck.sc_level(probe) - 2))
    got = cov.intersect_with_cell(a, par)
    lv = max(ck.sc_level(c) for c in a)
    expected = _leaves(a, lv) & _leaves([par], lv)
    assert _leaves(got, lv) == expected
    # slicing to a cell inside one union cell returns that cell
    child = ck.sc_child(probe, 2)
    assert cov.intersect_with_cell(a, child) == [child]


def test_simple_covering_matches_coverer_at_fixed_level():
    cap = Cap.from_latlng_radius_deg(43.0, 7.0, 0.7)
    level = 7
    flood = sorted(cov.get_simple_covering(
        cap, [float(v) for v in cap.center], level))
    full = cov.RegionCoverer(min_level=level, max_level=level,
                             max_cells=1 << 30)
    expected = sorted(full.get_covering(cap))
    assert flood == expected
    assert all(ck.sc_level(c) == level for c in flood)


def test_expanded_by_distance_uv_contains_nearby_points():
    cid = int(ck.parent(ck.from_latlng_deg(
        np.array([12.0]), np.array([34.0])), 8)[0])
    uv = ck.sc_bound_uv(cid)
    d = 0.005  # radians
    exp = ck.expanded_by_distance_uv(uv, d)
    assert exp[0] < uv[0] and exp[1] > uv[1]
    assert exp[2] < uv[2] and exp[3] > uv[3]
    # points just outside each cell edge but within d are inside the
    # expanded rect (projected to this face)
    face = cid >> 61
    rng = np.random.default_rng(16)
    verts = ck.cell_vertices(np.array([cid], dtype=np.uint64))[0]
    for k in range(4):
        a, b = verts[k], verts[(k + 1) % 4]
        mid = a + b
        mid /= np.linalg.norm(mid)
        # push the midpoint outward by ~0.8*d along the outward normal
        center = np.array(ck.sc_center_xyz(cid))
        out_dir = mid - center * float(center @ mid)
        out_dir /= np.linalg.norm(out_dir)
        p = mid * math.cos(0.8 * d) + out_dir * math.sin(0.8 * d)
        f2, u2, v2 = ck.sc_xyz_to_face_uv(*[float(t) for t in p])
        if f2 != face:
            continue
        assert exp[0] <= u2 <= exp[1] and exp[2] <= v2 <= exp[3], k


def test_cell_areas():
    # sum of exact areas of the 6 faces = sphere area
    total = sum(ck.cell_exact_area(int(ck.from_face(f))) for f in range(6))
    assert abs(total - 4 * math.pi) < 1e-9
    # approx within 3% of exact at a mid level (S2Cell.kt:214 contract)
    cid = int(ck.parent(ck.from_latlng_deg(
        np.array([12.0]), np.array([34.0])), 9)[0])
    exact = ck.cell_exact_area(cid)
    approx = ck.cell_approx_area(cid)
    assert abs(approx - exact) / exact < 0.03
    # average area: 4pi / (6 * 4^level)
    assert abs(ck.cell_average_area(0) - 4 * math.pi / 6) < 1e-15
    assert abs(ck.cell_average_area(5) -
               4 * math.pi / 6 / 4 ** 5) < 1e-18
    # children sum to the parent (exact area is additive)
    kids = sum(ck.cell_exact_area(int(ck.sc_child(cid, p)))
               for p in range(4))
    assert abs(kids - exact) / exact < 1e-9


def test_text_parser():
    """S2TextParser fixture notation round-trips (S2TextParser.kt:46-145)."""
    from s2_geometry_kotlin_spark.kernel import textparser as tp
    p = tp.make_point("48.8566:2.3522")
    assert abs(np.linalg.norm(p) - 1) < 1e-15
    loop = tp.make_loop("0:-180, 0:-90, 0:0, 0:90")
    assert len(loop.vertices) == 4
    poly = tp.make_polygon("10:10, 10:20, 20:20, 20:10; "
                           "12:12, 12:14, 14:14, 14:12")
    assert len(poly.loops) == 2
    # hole winding normalized: a point in the hole is NOT contained
    assert not poly.contains_point(tp.make_point("13:13"))
    assert poly.contains_point(tp.make_point("17:17"))
    cid = tp.make_cellid("3/0123")
    assert ck.sc_level(cid) == 4 and cid >> 61 == 3
    import pytest as _pytest
    with _pytest.raises(ValueError):
        tp.make_cellid("7/012")
    # four siblings normalize to the whole face cell
    cu = tp.make_cell_union("3/0, 3/1, 3/2, 3/3")
    assert cu == [ck.sc_parent(cid, 0)]
    line = tp.make_polyline("0:0, 0:10, 10:10")
    assert len(line.vertices) == 3
