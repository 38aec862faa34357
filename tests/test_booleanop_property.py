"""Property-based checks for B3/B1 kernels (hypothesis, derandomized):

- inclusion–exclusion: area(A∩B) + area(A∪B) == area(A) + area(B) for
  random disc pairs in every regime (crossing, nested, disjoint);
- membership partition: for random probe points, [p in A∩B] == [p in A
  and p in B], [p in A∪B] == [p in A or p in B], difference likewise;
- snap idempotency on random rings.
"""

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel.booleanop import polygon_boolean
from s2_geometry_kotlin_spark.kernel.measures import loop_area
from s2_geometry_kotlin_spark.kernel.regions import Loop, Polygon
from s2_geometry_kotlin_spark.sources.layers import regular_loop_vertices

SETTINGS = dict(derandomize=True, max_examples=30, deadline=None)


def _disc(lat, lon, radius_deg, nv=24) -> Polygon:
    return Polygon([Loop(regular_loop_vertices(lat, lon, radius_deg, nv))])


def _poly_area(p: Polygon) -> float:
    from s2_geometry_kotlin_spark.kernel.polygon_relations import \
        loop_depths
    depths = loop_depths(p)
    return sum(loop_area(lp.vertices) * (1 if d % 2 == 0 else -1)
               for lp, d in zip(p.loops, depths))


disc_pair = st.tuples(
    st.floats(-60, 60), st.floats(-170, 170),      # center A
    st.floats(1.0, 8.0),                           # radius A (deg)
    st.floats(-12, 12), st.floats(-12, 12),        # B offset from A
    st.floats(1.0, 8.0),                           # radius B
)


@given(disc_pair)
@settings(**SETTINGS)
def test_inclusion_exclusion_area(params):
    la, lo, ra, dlat, dlon, rb = params
    a = _disc(la, lo, ra)
    b = _disc(max(-80.0, min(80.0, la + dlat)), lo + dlon, rb)
    try:
        inter = polygon_boolean(a, b, "intersection")
        union = polygon_boolean(a, b, "union")
    except ValueError:
        # random pair violated general position (tangency) — the
        # documented precondition, not a correctness failure
        return
    lhs = _poly_area(inter) + _poly_area(union)
    rhs = _poly_area(a) + _poly_area(b)
    assert math.isclose(lhs, rhs, rel_tol=1e-9, abs_tol=1e-12), \
        (lhs, rhs, params)


@given(disc_pair, st.integers(0, 10_000))
@settings(**SETTINGS)
def test_membership_partition(params, seed):
    la, lo, ra, dlat, dlon, rb = params
    a = _disc(la, lo, ra)
    b = _disc(max(-80.0, min(80.0, la + dlat)), lo + dlon, rb)
    try:
        results = {op: polygon_boolean(a, b, op)
                   for op in ("intersection", "union", "difference",
                              "symmetric_difference")}
    except ValueError:
        return
    rng = np.random.default_rng(seed)
    lat = np.clip(la + rng.uniform(-15, 15, 64), -89, 89)
    lon = lo + rng.uniform(-20, 20, 64)
    x, y, z = ck.latlng_deg_to_xyz(lat, lon)
    pts = np.stack([x, y, z], axis=1)
    for p in pts:
        ia, ib = a.contains_point(p), b.contains_point(p)
        assert results["intersection"].contains_point(p) == (ia and ib)
        assert results["union"].contains_point(p) == (ia or ib)
        assert results["difference"].contains_point(p) == (ia and not ib)
        assert results["symmetric_difference"].contains_point(p) == \
            (ia != ib)


@given(st.floats(-60, 60), st.floats(-170, 170), st.floats(0.5, 5.0),
       st.integers(6, 24))
@settings(**SETTINGS)
def test_snap_idempotent_random_rings(lat, lon, radius, nv):
    from s2_geometry_kotlin_spark.kernel.builder_snap import (CellIdSnap,
                                                              snap_loops)
    snap = CellIdSnap(14)
    ring = regular_loop_vertices(lat, lon, radius, nv)
    once = snap_loops([ring], snap)
    if not once:
        return  # collapsed below 3 sites — legal for tiny rings
    twice = snap_loops(once, snap)
    assert len(twice) == len(once)
    assert all(np.array_equal(u, v) for u, v in zip(once, twice))
