"""Port of the reference S1Interval suite
(dilivia/s2/S1IntervalUnitTest.kt) against LngInterval
(s2_geometry_kotlin_spark/kernel/regions.py).

The interval algebra underpins every LatLngRect bound, covering and
polyline-simplifier window in the engine, so this suite pins the full
quadrant relation matrix (contains / interiorContains / intersects /
interiorIntersects / union / intersection over ~70 pairs), addPoint,
project, fromPointPair, expanded with both margin signs, approxEquals
near the empty/full thresholds, and the directed Hausdorff cases.
"""

import math

import pytest

from s2_geometry_kotlin_spark.kernel.regions import DBL_EPS, LngInterval

PI = math.pi
PI_2 = math.pi / 2

I = LngInterval

empty = I.empty()
full = I.full()
zero = I(0.0, 0.0)
pi2 = I(PI_2, PI_2)
pi = I(PI, PI)
mipi = I(-PI, -PI)  # normalizes to (pi, pi)
mipi2 = I(-PI_2, -PI_2)

quad1 = I(0.0, PI_2)
quad2 = I(PI_2, -PI)  # hi=-pi normalizes to pi
quad3 = I(PI, -PI_2)
quad4 = I(-PI_2, 0.0)

quad12 = I(0.0, -PI)
quad23 = I(PI_2, -PI_2)  # inverted
quad34 = I(-PI, 0.0)
quad41 = I(-PI_2, PI_2)

quad123 = I(0.0, -PI_2)
quad234 = I(PI_2, 0.0)
quad341 = I(PI, PI_2)
quad412 = I(-PI_2, -PI)

mid12 = I(PI_2 - 0.01, PI_2 + 0.02)
mid23 = I(PI - 0.01, -PI + 0.02)
mid34 = I(-PI_2 - 0.01, -PI_2 + 0.02)
mid41 = I(-0.01, 0.02)

quad1lo = I(quad12.lo, mid41.hi)
quad2lo = I(quad23.lo, mid12.hi)
quad2hi = I(mid23.lo, quad12.hi)
quad3hi = I(mid34.lo, quad23.hi)
quad12eps = I(quad12.lo, mid23.hi)
quadeps12 = I(mid41.lo, quad12.hi)
quad123eps = I(quad12.lo, mid34.hi)
quadeps123 = I(mid41.lo, quad23.hi)
quad23eps = I(quad23.lo, mid34.hi)
quadeps23 = I(mid12.lo, quad23.hi)
quad412eps = I(mid34.lo, quad12.hi)


def eq(x: LngInterval, y: LngInterval) -> bool:
    return x.lo == y.lo and x.hi == y.hi


def test_constructors_and_accessors():
    assert quad12.lo == 0.0 and quad12.hi == PI
    assert quad34.lo == PI and quad34.hi == 0.0
    assert pi.lo == PI and pi.hi == PI
    # [-pi, -pi] normalizes to [pi, pi]
    assert mipi.lo == PI and mipi.hi == PI
    assert quad23.lo == PI_2 and quad23.hi == -PI_2
    assert empty.is_valid() and empty.is_empty()


def test_simple_predicates():
    assert zero.is_valid() and not zero.is_empty() and not zero.is_full()
    assert empty.is_valid() and empty.is_empty() and not empty.is_full()
    assert empty.is_inverted()
    assert full.is_valid() and not full.is_empty() and full.is_full()
    assert not quad12.is_empty() and not quad12.is_full() \
        and not quad12.is_inverted()
    assert not quad23.is_empty() and not quad23.is_full() \
        and quad23.is_inverted()
    assert pi.is_valid() and not pi.is_empty() and not pi.is_inverted()
    assert mipi.is_valid() and not mipi.is_empty() and not mipi.is_inverted()


def test_almost_empty_or_full():
    almost_pi = PI - 2 * DBL_EPS
    assert not I(-almost_pi, PI).is_full()
    assert not I(-PI, almost_pi).is_full()
    assert not I(PI, -almost_pi).is_empty()
    assert not I(almost_pi, -PI).is_empty()


def test_center():
    assert quad12.center() == PI_2
    assert I(3.1, 2.9).center() == 3.0 - PI
    assert I(-2.9, -3.1).center() == PI - 3.0
    assert I(2.1, -2.1).center() == PI
    assert pi.center() == PI
    assert mipi.center() == PI
    assert abs(quad23.center()) == PI
    assert quad123.center() == 0.75 * PI


def test_length():
    assert quad12.length() == PI
    assert pi.length() == 0.0
    assert mipi.length() == 0.0
    assert quad123.length() == 1.5 * PI
    assert abs(quad23.length()) == PI
    assert full.length() == 2 * PI
    assert empty.length() < 0


def test_complement():
    assert empty.complement().is_full()
    assert full.complement().is_empty()
    assert pi.complement().is_full()
    assert mipi.complement().is_full()
    assert zero.complement().is_full()
    assert quad12.complement().approx_equals(quad34)
    assert quad34.complement().approx_equals(quad12)
    assert quad123.complement().approx_equals(quad4)


def test_contains_double():
    assert not empty.contains(0) and not empty.contains(PI) \
        and not empty.contains(-PI)
    assert not empty.interior_contains(PI) \
        and not empty.interior_contains(-PI)
    assert full.contains(0) and full.contains(PI) and full.contains(-PI)
    assert full.interior_contains(PI) and full.interior_contains(-PI)
    assert quad12.contains(0) and quad12.contains(PI) \
        and quad12.contains(-PI)
    assert quad12.interior_contains(PI_2) \
        and not quad12.interior_contains(0)
    assert not quad12.interior_contains(PI) \
        and not quad12.interior_contains(-PI)
    assert quad23.contains(PI_2) and quad23.contains(-PI_2)
    assert quad23.contains(PI) and quad23.contains(-PI)
    assert not quad23.contains(0)
    assert not quad23.interior_contains(PI_2) \
        and not quad23.interior_contains(-PI_2)
    assert quad23.interior_contains(PI) and quad23.interior_contains(-PI)
    assert not quad23.interior_contains(0)
    assert pi.contains(PI) and pi.contains(-PI) and not pi.contains(0)
    assert not pi.interior_contains(PI) and not pi.interior_contains(-PI)
    assert mipi.contains(PI) and mipi.contains(-PI) and not mipi.contains(0)
    assert not mipi.interior_contains(PI) \
        and not mipi.interior_contains(-PI)
    assert zero.contains(0) and not zero.interior_contains(0)


# (x, y, "TFTF" for contains/interiorContains/intersects/
#  interiorIntersects, expected union, expected intersection) — the
# full matrix from S1IntervalUnitTest.intervalOps
INTERVAL_OPS = [
    (empty, empty, "TTFF", empty, empty),
    (empty, full, "FFFF", full, empty),
    (empty, zero, "FFFF", zero, empty),
    (empty, pi, "FFFF", pi, empty),
    (empty, mipi, "FFFF", mipi, empty),

    (full, empty, "TTFF", full, empty),
    (full, full, "TTTT", full, full),
    (full, zero, "TTTT", full, zero),
    (full, pi, "TTTT", full, pi),
    (full, mipi, "TTTT", full, mipi),
    (full, quad12, "TTTT", full, quad12),
    (full, quad23, "TTTT", full, quad23),

    (zero, empty, "TTFF", zero, empty),
    (zero, full, "FFTF", full, zero),
    (zero, zero, "TFTF", zero, zero),
    (zero, pi, "FFFF", I(0.0, PI), empty),
    (zero, pi2, "FFFF", quad1, empty),
    (zero, mipi, "FFFF", quad12, empty),
    (zero, mipi2, "FFFF", quad4, empty),
    (zero, quad12, "FFTF", quad12, zero),
    (zero, quad23, "FFFF", quad123, empty),

    (pi2, empty, "TTFF", pi2, empty),
    (pi2, full, "FFTF", full, pi2),
    (pi2, zero, "FFFF", quad1, empty),
    (pi2, pi, "FFFF", I(PI_2, PI), empty),
    (pi2, pi2, "TFTF", pi2, pi2),
    (pi2, mipi, "FFFF", quad2, empty),
    (pi2, mipi2, "FFFF", quad23, empty),
    (pi2, quad12, "FFTF", quad12, pi2),
    (pi2, quad23, "FFTF", quad23, pi2),

    (pi, empty, "TTFF", pi, empty),
    (pi, full, "FFTF", full, pi),
    (pi, zero, "FFFF", I(PI, 0.0), empty),
    (pi, pi, "TFTF", pi, pi),
    (pi, pi2, "FFFF", I(PI_2, PI), empty),
    (pi, mipi, "TFTF", pi, pi),
    (pi, mipi2, "FFFF", quad3, empty),
    (pi, quad12, "FFTF", I(0.0, PI), pi),
    (pi, quad23, "FFTF", quad23, pi),

    (mipi, empty, "TTFF", mipi, empty),
    (mipi, full, "FFTF", full, mipi),
    (mipi, zero, "FFFF", quad34, empty),
    (mipi, pi, "TFTF", mipi, mipi),
    (mipi, pi2, "FFFF", quad2, empty),
    (mipi, mipi, "TFTF", mipi, mipi),
    (mipi, mipi2, "FFFF", I(-PI, -PI_2), empty),
    (mipi, quad12, "FFTF", quad12, mipi),
    (mipi, quad23, "FFTF", quad23, mipi),

    (quad12, empty, "TTFF", quad12, empty),
    (quad12, full, "FFTT", full, quad12),
    (quad12, zero, "TFTF", quad12, zero),
    (quad12, pi, "TFTF", quad12, pi),
    (quad12, mipi, "TFTF", quad12, mipi),
    (quad12, quad12, "TFTT", quad12, quad12),
    (quad12, quad23, "FFTT", quad123, quad2),
    (quad12, quad34, "FFTF", full, quad12),

    (quad23, empty, "TTFF", quad23, empty),
    (quad23, full, "FFTT", full, quad23),
    (quad23, zero, "FFFF", quad234, empty),
    (quad23, pi, "TTTT", quad23, pi),
    (quad23, mipi, "TTTT", quad23, mipi),
    (quad23, quad12, "FFTT", quad123, quad2),
    (quad23, quad23, "TFTT", quad23, quad23),
    (quad23, quad34, "FFTT", quad234, I(-PI, -PI_2)),

    (quad1, quad23, "FFTF", quad123, I(PI_2, PI_2)),
    (quad2, quad3, "FFTF", quad23, mipi),
    (quad3, quad2, "FFTF", quad23, pi),
    (quad2, pi, "TFTF", quad2, pi),
    (quad2, mipi, "TFTF", quad2, mipi),
    (quad3, pi, "TFTF", quad3, pi),
    (quad3, mipi, "TFTF", quad3, mipi),

    (quad12, mid12, "TTTT", quad12, mid12),
    (mid12, quad12, "FFTT", quad12, mid12),
    (quad12, mid23, "FFTT", quad12eps, quad2hi),
    (mid23, quad12, "FFTT", quad12eps, quad2hi),
    (quad12, mid34, "FFFF", quad412eps, empty),
    (mid34, quad12, "FFFF", quad412eps, empty),
    (quad12, mid41, "FFTT", quadeps12, quad1lo),
    (mid41, quad12, "FFTT", quadeps12, quad1lo),

    (quad23, mid12, "FFTT", quadeps23, quad2lo),
    (mid12, quad23, "FFTT", quadeps23, quad2lo),
    (quad23, mid23, "TTTT", quad23, mid23),
    (mid23, quad23, "FFTT", quad23, mid23),
    (quad23, mid34, "FFTT", quad23eps, quad3hi),
    (mid34, quad23, "FFTT", quad23eps, quad3hi),
    (quad23, mid41, "FFFF", quadeps123, empty),
    (mid41, quad23, "FFFF", quadeps123, empty),
]


@pytest.mark.parametrize("idx", range(len(INTERVAL_OPS)))
def test_interval_ops(idx):
    x, y, rel, exp_union, exp_inter = INTERVAL_OPS[idx]
    assert x.contains_interval(y) == (rel[0] == "T")
    assert x.interior_contains_interval(y) == (rel[1] == "T")
    assert x.intersects(y) == (rel[2] == "T")
    assert x.interior_intersects(y) == (rel[3] == "T")
    u = x.union_interval(y)
    n = x.intersection(y)
    assert eq(u, exp_union), (u.lo, u.hi, exp_union.lo, exp_union.hi)
    assert eq(n, exp_inter), (n.lo, n.hi, exp_inter.lo, exp_inter.hi)
    # union returns self exactly when x contains y (reference ===)
    assert x.contains_interval(y) == (u is x)
    assert x.intersects(y) == (not n.is_empty())
    if y.lo == y.hi:
        assert eq(x.add_point(y.lo), exp_union)


def test_add_point():
    assert eq(empty.add_point(0), zero)
    assert eq(empty.add_point(PI), pi)
    assert eq(empty.add_point(-PI), mipi)
    assert eq(empty.add_point(PI).add_point(-PI), pi)
    assert eq(empty.add_point(-PI).add_point(PI), mipi)
    assert eq(empty.add_point(mid12.lo).add_point(mid12.hi), mid12)
    assert eq(empty.add_point(mid23.lo).add_point(mid23.hi), mid23)
    assert eq(quad1.add_point(-0.9 * PI).add_point(-PI_2), quad123)
    assert full.add_point(0).is_full()
    assert full.add_point(PI).is_full()
    assert full.add_point(-PI).is_full()


def test_project():
    r = I(-PI, -PI)
    assert r.project(-PI) == PI
    assert r.project(0) == PI
    r = I(0.0, PI)
    assert r.project(0.1) == 0.1
    assert r.project(-PI_2 + 1e-15) == 0.0
    assert r.project(-PI_2 - 1e-15) == PI
    r = I(PI - 0.1, -PI + 0.1)
    assert r.project(PI) == PI
    assert r.project(1e-15) == PI - 0.1
    assert r.project(-1e-15) == -PI + 0.1
    assert full.project(0) == 0.0
    assert full.project(PI) == PI
    assert full.project(-PI) == PI


def test_from_point_pair():
    assert eq(I.from_point_pair(-PI, PI), pi)
    assert eq(I.from_point_pair(PI, -PI), pi)
    assert eq(I.from_point_pair(mid34.hi, mid34.lo), mid34)
    assert eq(I.from_point_pair(mid23.lo, mid23.hi), mid23)


def test_expanded():
    assert eq(empty.expanded(1), empty)
    assert eq(full.expanded(1), full)
    assert eq(zero.expanded(1), I(-1.0, 1.0))
    assert eq(mipi.expanded(0.01), I(PI - 0.01, -PI + 0.01))
    assert eq(pi.expanded(27), full)
    assert eq(pi.expanded(PI_2), quad23)
    assert eq(pi2.expanded(PI_2), quad12)
    assert eq(mipi2.expanded(PI_2), quad34)
    assert eq(empty.expanded(-1), empty)
    assert eq(full.expanded(-1), full)
    assert eq(quad123.expanded(-27), empty)
    assert eq(quad234.expanded(-27), empty)
    assert eq(quad123.expanded(-PI_2), quad2)
    assert eq(quad341.expanded(-PI_2), quad4)
    assert eq(quad412.expanded(-PI_2), quad1)


def test_approx_equals():
    # shifting an endpoint by k_lo keeps intervals equivalent under the
    # default max_error; k_hi does not
    k_lo = 4 * DBL_EPS
    k_hi = 6 * DBL_EPS

    assert empty.approx_equals(empty)
    assert zero.approx_equals(empty) and empty.approx_equals(zero)
    assert pi.approx_equals(empty) and empty.approx_equals(pi)
    assert mipi.approx_equals(empty) and empty.approx_equals(mipi)
    assert not empty.approx_equals(full)
    assert empty.approx_equals(I(1.0, 1 + 2 * k_lo))
    assert not empty.approx_equals(I(1.0, 1 + 2 * k_hi))
    assert I(PI - k_lo, -PI + k_lo).approx_equals(empty)

    assert full.approx_equals(full)
    assert not full.approx_equals(empty)
    assert not full.approx_equals(zero)
    assert not full.approx_equals(pi)
    assert full.approx_equals(I(k_lo, -k_lo))
    assert not full.approx_equals(I(2 * k_hi, 0.0))
    assert I(-PI + k_lo, PI - k_lo).approx_equals(full)
    assert not I(-PI, PI - 2 * k_hi).approx_equals(full)

    assert pi.approx_equals(pi) and mipi.approx_equals(pi)
    assert pi.approx_equals(I(PI - k_lo, PI - k_lo))
    assert not pi.approx_equals(I(PI - k_hi, PI - k_hi))
    assert pi.approx_equals(I(PI - k_lo, -PI + k_lo))
    assert not pi.approx_equals(I(PI - k_hi, -PI))
    assert not zero.approx_equals(pi)
    assert pi.union_interval(mid12).union_interval(zero) \
        .approx_equals(quad12)
    assert quad2.intersection(quad3).approx_equals(pi)
    assert quad3.intersection(quad2).approx_equals(pi)

    # nearly-equal endpoints in opposite order (inverted vs not)
    assert not I(0.0, k_lo).approx_equals(I(k_lo, 0.0))
    assert not I(PI - 0.5 * k_lo, -PI + 0.5 * k_lo).approx_equals(
        I(-PI + 0.5 * k_lo, PI - 0.5 * k_lo))

    assert I(1 - k_lo, 2 + k_lo).approx_equals(I(1.0, 2.0))
    assert I(1 + k_lo, 2 - k_lo).approx_equals(I(1.0, 2.0))
    assert I(2 - k_lo, 1 + k_lo).approx_equals(I(2.0, 1.0))
    assert I(2 + k_lo, 1 - k_lo).approx_equals(I(2.0, 1.0))
    assert not I(1 - k_hi, 2 + k_lo).approx_equals(I(1.0, 2.0))
    assert not I(1 + k_hi, 2 - k_lo).approx_equals(I(1.0, 2.0))
    assert not I(2 - k_hi, 1 + k_lo).approx_equals(I(2.0, 1.0))
    assert not I(2 + k_hi, 1 - k_lo).approx_equals(I(2.0, 1.0))
    assert not I(1 - k_lo, 2 + k_hi).approx_equals(I(1.0, 2.0))
    assert not I(1 + k_lo, 2 - k_hi).approx_equals(I(1.0, 2.0))
    assert not I(2 - k_lo, 1 + k_hi).approx_equals(I(2.0, 1.0))
    assert not I(2 + k_lo, 1 - k_hi).approx_equals(I(2.0, 1.0))


def test_directed_hausdorff():
    assert empty.directed_hausdorff(empty) == 0.0
    assert empty.directed_hausdorff(mid12) == 0.0
    assert mid12.directed_hausdorff(empty) == PI
    assert quad12.directed_hausdorff(quad123) == 0.0
    inv = I(3.0, -3.0)  # complement center is 0
    assert I(-0.1, 0.2).directed_hausdorff(inv) == 3.0
    assert I(0.1, 0.2).directed_hausdorff(inv) == 3.0 - 0.1
    assert I(-0.2, -0.1).directed_hausdorff(inv) == 3.0 - 0.1
