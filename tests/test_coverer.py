"""Coverer contract tests, ported from the reference
(S2RegionCovererUnitTest.kt:39-132 and S2GeometryTestCase.kt:29-54)."""

import numpy as np
import pytest

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel.coverer import (RegionCoverer,
                                                     denormalize, normalize)
from s2_geometry_kotlin_spark.kernel.regions import (Cap, Cell, CellRegion,
                                                     LatLngRect, Loop)

rng = np.random.default_rng(1)


def random_cell_id(level=None):
    lat = rng.uniform(-89.9, 89.9)
    lon = rng.uniform(-180, 180)
    leaf = int(ck.from_latlng_deg(np.array([lat]), np.array([lon]))[0])
    if level is None:
        level = int(rng.integers(0, 31))
    return ck.sc_parent(leaf, level)


def check_covering(region, covering: list[int], check_tight: bool,
                   cid: int | None = None):
    """Recursive covering oracle (S2GeometryTestCase.kt:29-54)."""
    if cid is None:
        for face in range(6):
            check_covering(region, covering, check_tight,
                           int(ck.from_face(face)))
        return
    cell = Cell(cid)
    intersects_covering = any(
        ck.sc_range_min(c) <= ck.sc_range_max(cid) and
        ck.sc_range_max(c) >= ck.sc_range_min(cid) for c in covering)
    contained = any(
        ck.sc_range_min(c) <= cid <= ck.sc_range_max(c) for c in covering)
    if not region.may_intersect_cell(cell):
        if check_tight:
            assert not intersects_covering, f"loose cell {cid:#x}"
    elif not contained:
        assert not region.contains_cell(cell), \
            f"region-contained cell {cid:#x} not covered"
        assert ck.sc_level(cid) < 30, f"uncovered leaf {cid:#x}"
        for pos in range(4):
            check_covering(region, covering, check_tight,
                           ck.sc_child(cid, pos))


def check_covering_contract(coverer: RegionCoverer, region,
                            covering: list[int], interior: bool):
    """S2RegionCovererUnitTest.checkCovering (:53-76)."""
    # min-level ancestor uniqueness when over maxCells
    if len(covering) > coverer.max_cells:
        seen = {}
        for cid in covering:
            anc = ck.sc_parent(cid, coverer.min_level)
            seen[anc] = seen.get(anc, 0) + 1
        assert max(seen.values()) <= 1, "shared min-level ancestor"
    for cid in covering:
        level = ck.sc_level(cid)
        assert coverer.min_level <= level <= coverer.max_level
        assert (level - coverer.min_level) % coverer.level_mod == 0
    if interior:
        for cid in covering:
            assert region.contains_cell(Cell(cid)), \
                f"interior covering cell {cid:#x} not contained"
    else:
        # wrap in a normalized union before the coverage oracle, as the
        # reference does (denormalized coverings contain sibling quads)
        check_covering(region, normalize(covering), check_tight=False)


def test_random_cells_max_cells_1():
    # S2RegionCovererUnitTest.kt:39-51: covering of one cell with
    # maxCells=1 is exactly that cell (reduced iteration count for speed)
    coverer = RegionCoverer(max_cells=1)
    for _ in range(300):
        cid = random_cell_id()
        covering = coverer.get_covering(CellRegion(cid))
        assert covering == [cid]


@pytest.mark.parametrize("seed", range(4))
def test_random_caps_contract(seed):
    # S2RegionCovererUnitTest.kt:78-132 (reduced to 25 caps per seed);
    # cap area is bounded by (3*maxCells+1)*avgArea(minLevel) exactly as
    # the reference does, so min_level stays compatible with the cap size.
    import math

    from s2_geometry_kotlin_spark.kernel import metrics
    local = np.random.default_rng(seed + 10)
    for _ in range(25):
        max_level = int(local.integers(0, 31))
        min_level = 0 if max_level == 0 else int(local.integers(0, max_level))
        level_mod = int(local.integers(1, 4))
        max_cells = int(np.clip(local.geometric(0.2), 1, 40))
        coverer = RegionCoverer(max_cells=max_cells, min_level=min_level,
                                max_level=max_level, level_mod=level_mod)
        max_area = min(4 * math.pi,
                       (3 * max_cells + 1) * metrics.AVG_AREA.get_value(
                           min_level))
        min_area = 0.1 * metrics.AVG_AREA.get_value(30)
        area = min_area * (max_area / min_area) ** local.uniform(0, 1)
        # cap area = pi * chord2
        radius2 = min(4.0, area / math.pi)
        lat = local.uniform(-85, 85)
        lon = local.uniform(-180, 180)
        x, y, z = ck.latlng_deg_to_xyz(np.array([lat]), np.array([lon]))
        cap = Cap(np.array([x[0], y[0], z[0]]), radius2)
        covering = coverer.get_covering(cap)
        check_covering_contract(coverer, cap, covering, interior=False)
        interior = coverer.get_interior_covering(cap)
        check_covering_contract(coverer, cap, interior, interior=True)


def test_loop_coverings_cover_their_vertices_and_centroid():
    fixtures = [
        "80:-150, 80:-30, 80:90",                      # arctic_80
        "-20:150, -20:-70, 0:70, 10:-150, 10:70, -10:-70",  # candy_cane
        "35:20, 45:20, 40:25",                          # small_ne (ccw)
        "0:178, -1:180, 0:-179, 1:-180",                # loop_a antimeridian
    ]
    for text in fixtures:
        loop = Loop.from_latlng_text(text)
        coverer = RegionCoverer(max_cells=8)
        covering = coverer.get_covering(loop)
        assert 0 < len(covering) <= 8 or len(covering) <= 6
        check_covering(loop, covering, check_tight=False)
        # every vertex must be inside the covering's cell ranges
        for v in loop.vertices:
            leaf = int(ck.from_xyz(np.array([v[0]]), np.array([v[1]]),
                                   np.array([v[2]]))[0])
            assert any(ck.sc_range_min(c) <= leaf <= ck.sc_range_max(c)
                       for c in covering)


def test_rect_covering():
    rect = LatLngRect.from_degrees(40.0, 50.0, -10.0, 10.0)
    coverer = RegionCoverer(max_cells=12)
    covering = coverer.get_covering(rect)
    assert len(covering) <= 12
    check_covering(rect, covering, check_tight=False)


def test_normalize_merges_siblings():
    cid = random_cell_id(level=10)
    children = [ck.sc_child(cid, p) for p in range(4)]
    assert normalize(children) == [cid]
    # denormalize back to level 11 gives 4 children... (level 10 -> 11)
    den = denormalize([cid], 11, 1)
    assert len(den) == 4
    assert normalize(den) == [cid]
    assert all(ck.sc_level(c) == 11 for c in den)


def test_interior_covering_cells_contained():
    cap = Cap.from_latlng_radius_deg(48.85, 2.35, 2.0)
    coverer = RegionCoverer(max_cells=8)
    interior = coverer.get_interior_covering(cap)
    for cid in interior:
        assert cap.contains_cell(Cell(cid))
