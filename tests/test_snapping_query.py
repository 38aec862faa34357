"""B1 driver-query plumbing: the snapped layer and simplified routes
are deterministic, non-degenerate constants."""

import numpy as np


def test_snapped_layer_deterministic_and_nondegenerate():
    from s2_geometry_kotlin_spark.operators import snapping

    lay = snapping.snapped_layer()
    assert len(lay) == 8  # one snapped core per fixture city
    for layer, pid, poly in lay:
        assert layer == "snapped_core"
        assert len(poly.loops) == 1
        # the ring survives snapping (vertices are far apart relative
        # to the level-13 cell size); duplicates+jitter mostly collapse
        # — a jittered copy that crosses a cell boundary may keep its
        # own site, so the bound is loose, but far below the 36 noisy
        # input vertices
        assert 10 <= len(poly.loops[0].vertices) <= 18
    # construction is memoized AND rebuilding from scratch agrees
    snapping._SNAPPED = None
    lay2 = snapping.snapped_layer()
    for (_, _, a), (_, _, b) in zip(lay, lay2):
        assert np.array_equal(a.loops[0].vertices, b.loops[0].vertices)


def test_simplified_routes_deterministic_and_thinned():
    import __spark_entry__ as e

    orig = dict(e._routes())
    simp = e._routes_simplified()
    for rid, line in simp:
        dense_n = 16 * (len(orig[rid].vertices) - 1) + 1
        assert len(line.vertices) < dense_n / 4, \
            "simplifier failed to thin the densified route"
        assert len(line.vertices) >= 2
    # deterministic across rebuilds
    e._ROUTES_SIMPLIFIED = None
    again = e._routes_simplified()
    for (_, a), (_, b) in zip(simp, again):
        assert np.array_equal(a.vertices, b.vertices)
