"""S2PolygonIsValidUnitTest ports (region/S2PolygonIsValidUnitTest.kt):
randomized concentric-loop fixtures mutated into each invalidity class,
checked against the validation scanner.  The reference's
initOriented/loop-depth cases (inconsistentOrientations,
loopDepthNegative, loopNestingInvalid, :225-262) are not portable: this
repo's Polygon normalizes orientation on construction and stores no
explicit depth, so those invalid states cannot be represented."""

from __future__ import annotations

import random

import numpy as np
import pytest

from s2_geometry_kotlin_spark.kernel import validation as V
from s2_geometry_kotlin_spark.sources.layers import regular_loop_vertices

ITERS = 12


def concentric_loops(rng: random.Random, num_loops: int,
                     min_vertices: int) -> list:
    """addConcentricLoops (:55-66): nested regular loops around a
    common center, same vertex count, radii decreasing exponentially so
    index-aligned vertices are collinear with the center."""
    lat = rng.uniform(-60, 60)
    lon = rng.uniform(-180, 180)
    nv = min_vertices + rng.randrange(10)
    return [regular_loop_vertices(lat, lon, 8.0 * 0.1 ** i, nv)
            for i in range(num_loops)]


def err_code(loops) -> str | None:
    got = V.find_validation_error([np.asarray(lv) for lv in loops])
    return got[0] if got else None


@pytest.mark.parametrize("seed", [21, 22])
def test_vertex_count(seed):
    """:117-124: loops with fewer than 3 vertices are invalid."""
    rng = random.Random(seed)
    for _ in range(ITERS):
        if rng.randrange(2):
            lv = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        else:
            lv = np.empty((0, 3))
        assert err_code([lv]) == V.LOOP_NOT_ENOUGH_VERTICES


@pytest.mark.parametrize("seed", [23, 24])
def test_duplicate_vertex(seed):
    """:125-135: overwriting one vertex with another duplicates it."""
    rng = random.Random(seed)
    for _ in range(ITERS):
        loops = concentric_loops(rng, 1, 3)
        lv = loops[0].copy()
        n = len(lv)
        i = rng.randrange(n)
        j = rng.randrange(n - 1)
        lv[i] = lv[j + (1 if j >= i else 0)]
        assert err_code([lv]) == V.DUPLICATE_VERTICES


@pytest.mark.parametrize("seed", [25, 26])
def test_self_intersection(seed):
    """:137-150: swapping two adjacent vertices creates a
    self-crossing."""
    rng = random.Random(seed)
    for _ in range(ITERS):
        loops = [lv.copy() for lv in
                 concentric_loops(rng, 1 + rng.randrange(6), 5)]
        k = rng.randrange(len(loops))
        lv = loops[k]
        n = len(lv)
        i = rng.randrange(n)
        lv[[i, (i + 1) % n]] = lv[[(i + 1) % n, i]]
        assert err_code(loops) == V.LOOP_SELF_INTERSECTION


@pytest.mark.parametrize("seed", [27, 28])
def test_empty_and_full_loop_in_multi_loop_polygon(seed):
    """:152-169: a sentinel (empty or full) loop is only valid as the
    polygon's single loop."""
    rng = random.Random(seed)
    for _ in range(ITERS):
        loops = concentric_loops(rng, 1 + rng.randrange(5), 3)
        z = -1.0 if rng.randrange(2) else 1.0
        loops.append(np.array([[0.0, 0.0, z]]))
        assert err_code(loops) == V.EMPTY_OR_FULL_LOOP
    # alone, the sentinel is fine
    assert err_code([np.array([[0.0, 0.0, 1.0]])]) is None


@pytest.mark.parametrize("seed", [29, 30])
def test_loops_crossing(seed):
    """:171-189: exchanging index-aligned vertices of two concentric
    loops makes the loops cross (at edges, or at vertices when the
    neighbors are copied across too)."""
    rng = random.Random(seed)
    for _ in range(ITERS):
        loops = [lv.copy() for lv in concentric_loops(rng, 2, 4)]
        n = len(loops[0])
        i = rng.randrange(n)
        tmp = loops[0][i].copy()
        loops[0][i] = loops[1][i]
        loops[1][i] = tmp
        if rng.randrange(2):
            loops[0][(i + 1) % n] = loops[1][(i + 1) % n]
            loops[0][(i - 1) % n] = loops[1][(i - 1) % n]
        assert err_code(loops) in (V.POLYGON_LOOPS_CROSS,
                                   V.LOOP_SELF_INTERSECTION,
                                   V.POLYGON_LOOPS_SHARE_EDGE)


@pytest.mark.parametrize("seed", [31, 32])
def test_duplicate_edge(seed):
    """:191-214: a shared same-direction edge, or a reversed edge made
    by splitting one loop along a diagonal."""
    rng = random.Random(seed)
    for _ in range(ITERS):
        loops = [lv.copy() for lv in concentric_loops(rng, 2, 4)]
        n = len(loops[0])
        if rng.randrange(2):
            i = rng.randrange(n)
            loops[0][i] = loops[1][i]
            loops[0][(i + 1) % n] = loops[1][(i + 1) % n]
        else:
            split = 2 + rng.randrange(n - 3)
            l0 = loops[0]
            loops[1] = np.vstack([l0[:1], l0[split:]])
            loops[0] = l0[:split + 1]
        assert err_code(loops) in (V.POLYGON_LOOPS_SHARE_EDGE,
                                   V.POLYGON_LOOPS_CROSS)


@pytest.mark.parametrize("seed", [33])
def test_non_unit_and_nan_vertices(seed):
    """:95-110 (unitLength): zeroed, scaled or NaN vertices are
    invalid."""
    rng = random.Random(seed)
    for mode in range(3):
        loops = [lv.copy() for lv in concentric_loops(rng, 1, 3)]
        lv = loops[0]
        i = rng.randrange(len(lv))
        if mode == 0:
            lv[i] = 0.0
        elif mode == 1:
            lv[i] = lv[i] * 1e30
        else:
            lv[i] = np.nan
        assert err_code(loops) == V.INVALID_VERTEX


def test_valid_fixture_layers_still_pass():
    """The scanner additions must not flag any valid fixture layer."""
    from s2_geometry_kotlin_spark.sources.layers import fixture_layer
    for _name, _pid, poly in fixture_layer():
        assert V.find_validation_error(
            [lp.vertices for lp in poly.loops]) is None
