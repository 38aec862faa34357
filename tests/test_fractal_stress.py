"""Fractal stress inputs (Fractal.kt / FractalLoopShapeIndexFactory):
the PIP, covering, validation, kNN and boolean suites run over Koch
fractal loops at two seeds — the reference's hardest stress shape."""

import math

import numpy as np
import pytest

from s2_geometry_kotlin_spark.sources.fractal import Fractal

CENTER = (43.7, 7.3)
RADIUS = math.radians(1.0)
SEEDS = [1, 2]


def fractal_loop(seed, max_level=4, min_level=-1):
    f = Fractal(max_level, min_level=min_level, seed=seed)
    return f, f.make_loop_vertices(*CENTER, RADIUS)


def tangent_samples(factor, n=64, seed=9):
    """Points at `factor` * RADIUS from the center, in the tangent
    plane (the metric min/max_radius_factor guarantees use)."""
    phi, lam = math.radians(CENTER[0]), math.radians(CENTER[1])
    z = np.array([math.cos(phi) * math.cos(lam),
                  math.cos(phi) * math.sin(lam), math.sin(phi)])
    x = np.array([-math.sin(lam), math.cos(lam), 0.0])
    y = np.cross(z, x)
    rng = np.random.default_rng(seed)
    out = []
    for t in rng.uniform(0, 2 * math.pi, n):
        p = (factor * RADIUS) * (math.cos(t) * x + math.sin(t) * y) + z
        out.append(p / np.linalg.norm(p))
    return np.asarray(out)


@pytest.mark.parametrize("seed", SEEDS)
def test_fractal_pip_radius_guarantees(seed):
    """Points well inside min_radius_factor are contained; points well
    outside max_radius_factor are not (Fractal.kt:123-157; projection
    to the sphere only SHRINKS the fractal, :164-166)."""
    from s2_geometry_kotlin_spark.kernel.pip import loop_contains_points
    from s2_geometry_kotlin_spark.kernel.pip import compute_origin_inside
    f, v = fractal_loop(seed)
    assert len(v) == 3 * 4 ** 4
    oi = compute_origin_inside(v)
    inside = tangent_samples(0.9 * f.min_radius_factor())
    outside = tangent_samples(1.1 * f.max_radius_factor())
    assert loop_contains_points(v, inside, oi).all()
    assert not loop_contains_points(v, outside, oi).any()


@pytest.mark.parametrize("seed", SEEDS)
def test_fractal_is_valid_and_multilevel(seed):
    """The projected fractal has no crossing edge pairs (validation
    scanner), including the multi-level variant."""
    from s2_geometry_kotlin_spark.kernel.validation import \
        find_validation_error
    for min_level in (-1, 1):
        _, v = fractal_loop(seed, max_level=4, min_level=min_level)
        err = find_validation_error([v])
        assert err is None, err


@pytest.mark.parametrize("seed", SEEDS)
def test_fractal_covering_contains_samples(seed):
    """C1/C2: the covering of the fractal covers every interior sample;
    the interior covering is contained in the covering."""
    from s2_geometry_kotlin_spark.kernel import cellid as ck
    from s2_geometry_kotlin_spark.kernel.coverer import RegionCoverer
    from s2_geometry_kotlin_spark.kernel.regions import Loop, Polygon
    f, v = fractal_loop(seed)
    poly = Polygon([Loop(v)])
    rc = RegionCoverer(max_cells=64)
    cov = rc.get_covering(poly)
    inside = tangent_samples(0.9 * f.min_radius_factor())
    ids = ck.from_xyz(inside[:, 0], inside[:, 1], inside[:, 2])
    for leaf in ids.tolist():
        assert any(ck.range_min(c) <= np.uint64(leaf) <= ck.range_max(c)
                   for c in cov), "covering missed an interior point"
    interior = rc.get_interior_covering(poly)
    for c in interior:
        assert any(ck.range_min(o) <= c <= ck.range_max(o)
                   for o in cov)


@pytest.mark.parametrize("seed", SEEDS)
def test_fractal_knn_center_distance(seed):
    """D9: distance from the fractal center to its boundary respects
    the radius-factor bounds (tangent-plane factors are conservative
    after projection, so only the outer bound is exact-ish)."""
    from s2_geometry_kotlin_spark.kernel.edges import \
        point_edge_chord2_pairwise
    f, v = fractal_loop(seed)
    phi, lam = math.radians(CENTER[0]), math.radians(CENTER[1])
    c = np.array([math.cos(phi) * math.cos(lam),
                  math.cos(phi) * math.sin(lam), math.sin(phi)])
    n = len(v)
    xs = v
    ys = np.roll(v, -1, axis=0)
    d2 = point_edge_chord2_pairwise(np.broadcast_to(c, (n, 3)), xs, ys)
    dmin = 2.0 * np.arcsin(np.sqrt(d2.min()) / 2.0)
    # the center's min distance lies within the guaranteed band,
    # with slack for spherical projection shrinkage
    assert dmin >= 0.8 * f.min_radius_factor() * RADIUS
    assert dmin <= 1.05 * f.max_radius_factor() * RADIUS


@pytest.mark.parametrize("seed", SEEDS)
def test_fractal_boolean_properties(seed):
    """B3 over fractal operands: X∩X=X, X∪X=X, X−X=∅, X⊕X=∅ (edge
    multisets), and intersection with a disjoint translate is empty."""
    from s2_geometry_kotlin_spark.kernel.booleanop import polygon_boolean
    from s2_geometry_kotlin_spark.kernel.regions import Loop, Polygon

    def eset(poly):
        out = set()
        for lp in poly.loops:
            w = lp.vertices
            for i in range(len(w)):
                out.add((tuple(np.round(w[i], 9)),
                         tuple(np.round(w[(i + 1) % len(w)], 9))))
        return out

    # level 3 keeps the O(n^2) sub-edge classification quick
    f = Fractal(3, seed=seed)
    v = f.make_loop_vertices(*CENTER, RADIUS)
    a = Polygon([Loop(v)])
    same = polygon_boolean(a, a, "intersection")
    assert eset(same) == eset(a)
    assert eset(polygon_boolean(a, a, "union")) == eset(a)
    assert not polygon_boolean(a, a, "difference").loops
    assert not polygon_boolean(a, a, "symmetric_difference").loops
    far = Polygon([Loop(Fractal(3, seed=seed + 7)
                        .make_loop_vertices(CENTER[0] + 10.0,
                                            CENTER[1], RADIUS))])
    assert not polygon_boolean(a, far, "intersection").loops
    u = polygon_boolean(a, far, "union")
    assert eset(u) == eset(a) | eset(far)
