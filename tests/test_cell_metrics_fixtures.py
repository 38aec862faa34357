"""Port of the reference cell-metrics suite
(dilivia/s2/coords/S2CellMetricsUnitTest.kt) against
s2_geometry_kotlin_spark/kernel/metrics.py: min<=avg<=max per bundle,
provable cross-bundle inequalities, aspect-ratio consistency, and the
exact boundary behavior of getLevelForMaxValue / getLevelForMinValue /
getClosestLevel at every level (including out-of-range and the 1.2x /
0.8x non-boundary probes)."""

import math

from s2_geometry_kotlin_spark.kernel import metrics as m

MAX_LEVEL = 30

# aspect-ratio constants of the quadratic projection
# (S2QuadraticProjection.kt)
MAX_EDGE_ASPECT = 1.442615274452682920
MAX_DIAG_ASPECT = math.sqrt(3.0)

BUNDLES = {
    "angle_span": (m.MIN_ANGLE_SPAN, m.MAX_ANGLE_SPAN, m.AVG_ANGLE_SPAN),
    "width": (m.MIN_WIDTH, m.MAX_WIDTH, m.AVG_WIDTH),
    "edge": (m.MIN_EDGE, m.MAX_EDGE, m.AVG_EDGE),
    "diag": (m.MIN_DIAG, m.MAX_DIAG, m.AVG_DIAG),
    "area": (m.MIN_AREA, m.MAX_AREA, m.AVG_AREA),
}


def test_min_avg_max_per_bundle():
    for name, (mn, mx, avg) in BUNDLES.items():
        assert mn.deriv <= avg.deriv <= mx.deriv, name


def test_cross_bundle_inequalities():
    def le(a, b):
        (amin, amax, aavg), (bmin, bmax, bavg) = BUNDLES[a], BUNDLES[b]
        assert amin.deriv <= bmin.deriv, (a, b)
        assert amax.deriv <= bmax.deriv, (a, b)
        assert aavg.deriv <= bavg.deriv, (a, b)

    le("width", "angle_span")
    le("width", "edge")
    le("edge", "diag")
    assert m.MIN_AREA.deriv >= \
        m.MIN_WIDTH.deriv * m.MIN_EDGE.deriv - 1e-15
    assert m.MAX_AREA.deriv <= \
        m.MAX_WIDTH.deriv * m.MAX_EDGE.deriv + 1e-15


def test_aspect_ratios():
    assert MAX_EDGE_ASPECT >= 1
    assert MAX_EDGE_ASPECT <= m.MAX_EDGE.deriv / m.MIN_EDGE.deriv
    assert MAX_DIAG_ASPECT >= 1
    assert MAX_DIAG_ASPECT <= m.MAX_DIAG.deriv / m.MIN_DIAG.deriv


def test_level_selection_boundaries():
    for level in range(-2, MAX_LEVEL + 4):
        width = m.MIN_WIDTH.deriv * 2.0 ** (-level)
        if level >= MAX_LEVEL + 3:
            width = 0.0
        expected = max(0, min(MAX_LEVEL, level))
        assert m.MIN_WIDTH.get_level_for_max_value(width) == expected
        assert m.MIN_WIDTH.get_level_for_min_value(width) == expected
        assert m.MIN_WIDTH.get_closest_level(width) == expected
        assert m.MIN_WIDTH.get_level_for_max_value(1.2 * width) == \
            expected
        assert m.MIN_WIDTH.get_level_for_min_value(0.8 * width) == \
            expected
        assert m.MIN_WIDTH.get_closest_level(1.2 * width) == expected
        assert m.MIN_WIDTH.get_closest_level(0.8 * width) == expected

        area = m.MIN_AREA.deriv * 4.0 ** (-level)
        if level <= -3:
            area = 0.0
        assert m.MIN_AREA.get_level_for_max_value(area) == expected
        assert m.MIN_AREA.get_level_for_min_value(area) == expected
        assert m.MIN_AREA.get_closest_level(area) == expected
        assert m.MIN_AREA.get_level_for_max_value(1.2 * area) == expected
        assert m.MIN_AREA.get_level_for_min_value(0.8 * area) == expected
        assert m.MIN_AREA.get_closest_level(1.2 * area) == expected
        assert m.MIN_AREA.get_closest_level(0.8 * area) == expected
