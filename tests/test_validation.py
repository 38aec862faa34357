"""Polygon validation scanner: findSelfIntersection / findCrossingError
semantics (S2CrossingEdgePairsScanner.kt) on hand-built fixtures."""

import numpy as np

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel.validation import (
    DUPLICATE_VERTICES, LOOP_SELF_INTERSECTION, POLYGON_LOOPS_CROSS,
    POLYGON_LOOPS_SHARE_EDGE, find_validation_error)


def ring(txt: str) -> np.ndarray:
    pts = []
    for tok in txt.split(","):
        lat, lng = (float(t) for t in tok.strip().split(":"))
        x, y, z = ck.latlng_deg_to_xyz(np.array([lat]), np.array([lng]))
        pts.append([x[0], y[0], z[0]])
    return np.array(pts, dtype=np.float64)


def test_valid_polygons_pass():
    assert find_validation_error([ring("0:0, 0:5, 5:5, 5:0")]) is None
    assert find_validation_error(
        [ring("0:0, 0:5, 5:5, 5:0"), ring("10:10, 10:12, 12:12")]) is None
    # shell with a hole (opposite orientation) is fine too
    assert find_validation_error(
        [ring("0:0, 0:9, 9:9, 9:0"), ring("3:3, 6:3, 6:6, 3:6")]) is None


def test_bowtie_self_intersection():
    err = find_validation_error([ring("0:0, 4:4, 0:4, 4:0")])
    assert err is not None and err[0] == LOOP_SELF_INTERSECTION


def test_two_loops_properly_crossing():
    err = find_validation_error(
        [ring("0:0, 0:6, 6:6, 6:0"), ring("3:3, 3:9, 9:9, 9:3")])
    assert err is not None and err[0] == POLYGON_LOOPS_CROSS


def test_duplicate_vertex_in_one_loop():
    # pinched ring revisits 2:2
    err = find_validation_error(
        [ring("0:0, 2:2, 0:4, 4:4, 2:2, 4:0")])
    assert err is not None and err[0] == DUPLICATE_VERTICES


def test_loops_sharing_an_edge():
    err = find_validation_error(
        [ring("0:0, 0:5, 5:5, 5:0"),
         ring("0:5, 0:9, 5:9, 5:5")])  # shares edge (0:5)-(5:5)? no —
    # shares the border 0:5 -> 5:5?  loop2's edge (5:5, 0:5) is the
    # reverse of loop1's (0:5, 5:5): a shared edge in either direction
    assert err is not None and err[0] == POLYGON_LOOPS_SHARE_EDGE


def test_loops_crossing_at_shared_vertex():
    # two bowtie halves: both rings use vertex 2:2; their wedges
    # properly interleave -> crossing at the vertex, no shared edge
    a = ring("0:0, 2:2, 0:4")       # below-ish triangle through 2:2
    b = ring("4:1, 4:3, 2:2")       # above triangle touching at 2:2
    # construct interleaving: make b pass through 2:2 between a's edges
    err = find_validation_error(
        [ring("0:0, 2:2, 0:4"), ring("4:3, 2:2, 4:1")])
    # whichever orientation, touching at one vertex with disjoint
    # wedges is VALID; interleaved wedges are not.  Build interleaved:
    crossing = find_validation_error(
        [ring("0:0, 2:2, 4:4, 0:4"), ring("0:2, 2:2, 4:2, 4:0")])
    assert crossing is not None
    assert crossing[0] in (POLYGON_LOOPS_CROSS, LOOP_SELF_INTERSECTION)
    # and the plain vertex touch stays valid
    assert err is None


def test_vertex_touch_without_crossing_is_valid():
    # two triangles meeting at exactly one vertex, wedges disjoint
    assert find_validation_error(
        [ring("-4:-4, 0:0, -4:4"), ring("4:4, 0:0, 4:-4")]) is None


def test_every_fixture_layer_polygon_is_valid():
    """The driver's polygon layers (cities, donut, reference fixtures,
    boolean-op results, snapped layers, adjacent unions) all pass
    validation — the invariant every join relies on."""
    from s2_geometry_kotlin_spark.operators.booleans import (
        adjacent_union_layer, result_layer)
    from s2_geometry_kotlin_spark.sources.layers import fixture_layer
    layers = list(fixture_layer()) + list(adjacent_union_layer())
    for op in ("union", "intersection", "difference"):
        layers += list(result_layer(op))
    assert len(layers) > 25
    for name, pid, poly in layers:
        assert poly.is_valid(), (name, pid)


def test_random_rings_property_sweep():
    """Seeded sweep: jittered regular rings validate clean; injecting a
    duplicate vertex or swapping two non-adjacent vertices (a bowtie)
    is always caught."""
    import random

    from s2_geometry_kotlin_spark.sources.layers import \
        regular_loop_vertices

    rng = random.Random(42)
    for trial in range(15):
        nv = rng.randrange(6, 16)
        base = regular_loop_vertices(rng.uniform(-60, 60),
                                     rng.uniform(-170, 170),
                                     rng.uniform(0.5, 4.0), nv)
        # mild radial jitter keeps the ring simple
        jit = base * (1.0 + 1e-4 * np.array(
            [[rng.uniform(-1, 1)] * 3 for _ in range(nv)]))
        jit = jit / np.linalg.norm(jit, axis=1, keepdims=True)
        assert find_validation_error([jit]) is None, trial
        # duplicate vertex
        k = rng.randrange(nv)
        dup = np.insert(jit, (k + 2) % nv, jit[k], axis=0)
        err = find_validation_error([dup])
        assert err is not None, trial
        # bowtie via swapping two separated vertices
        i, j = sorted(rng.sample(range(nv), 2))
        if j - i >= 2 and not (i == 0 and j == nv - 1):
            tw = jit.copy()
            tw[[i, j]] = tw[[j, i]]
            err = find_validation_error([tw])
            assert err is not None and err[0] == LOOP_SELF_INTERSECTION, \
                (trial, i, j)
