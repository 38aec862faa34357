"""B1 snap-rounding: fixture parity with the reference's
S2CellIdSnapFunction semantics (builder/S2Builder.kt + builder/snap/)."""

import math

import numpy as np
import pytest

from s2_geometry_kotlin_spark.kernel import builder_snap as bs
from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel.regions import Loop, Polygon


def _latlng_ring(pts):
    lat = np.array([p[0] for p in pts], dtype=np.float64)
    lon = np.array([p[1] for p in pts], dtype=np.float64)
    x, y, z = ck.latlng_deg_to_xyz(lat, lon)
    return np.stack([x, y, z], axis=1)


def _cell_centers(vertices, level):
    ids = ck.parent(ck.from_xyz(vertices[:, 0], vertices[:, 1],
                                vertices[:, 2]), level)
    x, y, z = ck.to_xyz(ids)
    return np.stack([x, y, z], axis=1)


# a ~20km square around Paris; vertices are far apart relative to the
# level-16 snap radius (~150m), so each vertex keeps its own site
CLEAN = [(48.76, 2.20), (48.76, 2.50), (48.95, 2.50), (48.95, 2.20)]


def test_noisy_loop_snaps_to_cell_centers_level16():
    """VERDICT r2 item 3's done-criterion: a noisy loop (duplicate
    vertices + jitter below the snap radius) snapped at level 16
    reproduces the S2CellIdSnapFunction output — the clean vertices'
    level-16 cell centers, bit-for-bit."""
    from s2_geometry_kotlin_spark.kernel import metrics
    snap = bs.CellIdSnap(16)
    want = _cell_centers(_latlng_ring(CLEAN), 16)
    lat_c, lon_c = ck.xyz_to_latlng_deg(want[:, 0], want[:, 1],
                                        want[:, 2])
    # jitter strictly inside each vertex's level-16 cell (20% of the
    # half-width), plus exact duplicates — all copies share the site
    jit = math.degrees(0.2 * 0.5 * metrics.MIN_WIDTH.get_value(16))
    noisy_pts = []
    for k in range(len(CLEAN)):
        noisy_pts.append((lat_c[k], lon_c[k]))
        noisy_pts.append((lat_c[k], lon_c[k]))  # exact duplicate vertex
        noisy_pts.append((lat_c[k] + (jit if k % 2 else -jit),
                          lon_c[k]))
    noisy = _latlng_ring(noisy_pts)

    snapped = bs.snap_loops([noisy], snap)
    assert len(snapped) == 1
    got = snapped[0]
    # same site set, bit-identical coordinates, same cyclic order
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    i0 = next(i for i, v in enumerate(got) if tuple(v) == tuple(want[0]))
    assert np.array_equal(np.roll(got, -i0, axis=0), want)


def test_jitter_under_separation_merges_to_one_site():
    """Vertices closer than min_vertex_separation share a site (the
    snap-first merge rule, S2Builder.kt:1067-1076)."""
    snap = bs.CellIdSnap(12)
    base = _latlng_ring([(10.0, 10.0)])
    eps = math.degrees(snap.min_vertex_separation()) * 0.3
    near = _latlng_ring([(10.0 + eps, 10.0)])
    sites = bs.choose_sites(np.concatenate([base, near]), snap)
    assert len(sites) == 1


def test_spike_discarded():
    """A degenerate spike (out-and-back edge pair) vanishes: the
    DegenerateEdges.DISCARD behavior of polygon layers."""
    spike_tip = (48.855, 2.6)  # off the ring, out-and-back via CLEAN[1]
    pts = [CLEAN[0], CLEAN[1], spike_tip, CLEAN[1], CLEAN[2], CLEAN[3]]
    snapped = bs.snap_loops([_latlng_ring(pts)], bs.CellIdSnap(16))
    assert len(snapped) == 1
    want = _cell_centers(_latlng_ring(CLEAN), 16)
    assert sorted(map(tuple, snapped[0])) == sorted(map(tuple, want))


def test_collapsed_loop_dropped():
    """A loop smaller than the snap cell collapses to nothing."""
    tiny = [(20.0, 20.0), (20.0, 20.0000001), (20.0000001, 20.0000001)]
    snapped = bs.snap_loops([_latlng_ring(tiny)], bs.CellIdSnap(10))
    assert snapped == []


def test_idempotent():
    """Snapping an already-snapped loop is the identity
    (S2Builder's snapping_needed short-circuit semantics)."""
    snap = bs.CellIdSnap(16)
    once = bs.snap_loops([_latlng_ring(CLEAN)], snap)
    twice = bs.snap_loops(once, snap)
    assert len(once) == len(twice) == 1
    assert np.array_equal(once[0], twice[0])


def test_int_latlng_snap_grid():
    """IntLatLngSnapFunction: coordinates land exactly on the
    10^-exponent degree grid."""
    snap = bs.IntLatLngSnap(2)
    noisy = _latlng_ring([(48.7612, 2.2049), (48.7649, 2.5051),
                          (48.9551, 2.5049), (48.9549, 2.2051)])
    snapped = bs.snap_loops([noisy], snap)
    assert len(snapped) == 1
    lat, lon = ck.xyz_to_latlng_deg(snapped[0][:, 0], snapped[0][:, 1],
                                    snapped[0][:, 2])
    assert np.allclose(lat * 100, np.round(lat * 100), atol=1e-9)
    assert np.allclose(lon * 100, np.round(lon * 100), atol=1e-9)
    want = _latlng_ring([(48.76, 2.20), (48.76, 2.51),
                         (48.96, 2.50), (48.95, 2.21)])
    assert np.allclose(snapped[0], want, atol=1e-12)


def test_snap_polygon_preserves_interior_point():
    """Containment of a point far from the boundary (relative to
    max_edge_deviation) survives snapping."""
    snap = bs.CellIdSnap(14)
    poly = Polygon([Loop(_latlng_ring(CLEAN))])
    center = _latlng_ring([(48.855, 2.35)])[0]
    outside = _latlng_ring([(49.5, 2.35)])[0]
    snapped = bs.snap_polygon(poly, snap)
    assert snapped.contains_point(center)
    assert not snapped.contains_point(outside)


def test_shared_jittered_boundary_merges_for_boolean_prep():
    """Layer-prep motivation: two polygons digitized against the same
    border with sub-snap-radius jitter snap to IDENTICAL vertices along
    the shared stretch, so downstream exact algorithms see one
    boundary, not two nearly-coincident ones."""
    snap = bs.CellIdSnap(14)
    jitter = math.degrees(snap.snap_radius) * 0.1
    shared = [(47.0, 5.0), (47.5, 5.0), (48.0, 5.0)]
    west = [(47.0, 4.0), *shared[::-1]]
    east = [(47.0, 6.0), *[(la + jitter, lo) for la, lo in shared]]
    got = bs.snap_loops([_latlng_ring(west)], snap)[0]
    got2 = bs.snap_loops([_latlng_ring(east)], snap)[0]
    east_set = set(map(tuple, got2))
    shared_sites = set(map(tuple,
                           _cell_centers(_latlng_ring(shared), 14)))
    assert shared_sites <= set(map(tuple, got))
    assert shared_sites <= east_set


def test_voronoi_exclusion_prunes_redundant_chain_site():
    """S2Builder.kt:1438-1476 chain pruning: a site whose coverage
    interval on the edge is CONTAINED in a nearer site's interval is
    excluded from the chain (the pre-round-4 code kept it, producing a
    correct-but-not-reference-identical chain)."""
    import math

    import numpy as np

    from s2_geometry_kotlin_spark.kernel import cellid as ck
    from s2_geometry_kotlin_spark.kernel.builder_snap import (
        IdentitySnap, _coverage_interval, snap_edge)

    def pt(lat, lon):
        x, y, z = ck.latlng_deg_to_xyz(np.array([lat]), np.array([lon]))
        return np.array([x[0], y[0], z[0]])

    snap = IdentitySnap(math.radians(0.3))
    x, y = pt(0, 0), pt(0, 1)
    b = pt(0.05, 0.5)    # near the edge: wide coverage interval
    c = pt(0.28, 0.52)   # deep offset: narrow interval inside b's
    sites = np.stack([x, b, c, y])
    theta = math.acos(float(x @ y))
    cos_r = math.cos(snap.edge_snap_radius())
    cov_b = _coverage_interval(b, x, y, cos_r, theta, math.sin(theta),
                               math.cos(theta))
    cov_c = _coverage_interval(c, x, y, cos_r, theta, math.sin(theta),
                               math.cos(theta))
    assert cov_b[0] < cov_c[0] and cov_c[1] < cov_b[1]  # contained
    chain = snap_edge(x, y, sites, snap)
    assert chain == [0, 1, 3]  # site 2 pruned; endpoints + b survive
    # snapping invariant (the reference's debug check): the chain ends
    # at the site nearest to y
    assert chain[-1] == 3
    # a site with a NON-contained interval is kept
    sites2 = np.stack([x, b, pt(0.05, 0.85), y])
    assert snap_edge(x, y, sites2, snap) == [0, 1, 2, 3]


def _ring_chord_to_inputs(ring_sites, inputs):
    """max over input vertices of (min chord distance to the ring)."""
    import numpy as np

    from s2_geometry_kotlin_spark.kernel.edges import \
        point_edge_chord2_pairwise
    m = len(ring_sites)
    d2min = None
    for k in range(m):
        a, b = ring_sites[k], ring_sites[(k + 1) % m]
        d2 = point_edge_chord2_pairwise(
            inputs, np.broadcast_to(a, inputs.shape),
            np.broadcast_to(b, inputs.shape))
        d2min = d2 if d2min is None else np.minimum(d2min, d2)
    return float(np.sqrt(d2min).max())


def test_simplify_edge_chains_reduces_and_keeps_tolerance():
    """S2Builder options.simplifyEdgeChains: an oversampled circle
    snapped at level 14 collapses from ~200 sites to a handful, and
    every INPUT vertex stays within edge_snap_radius of the simplified
    ring (the targetInputVertices guarantee)."""
    import math

    from s2_geometry_kotlin_spark.kernel.builder_snap import (CellIdSnap,
                                                              snap_loops)
    from s2_geometry_kotlin_spark.sources.layers import \
        regular_loop_vertices

    ring = regular_loop_vertices(48.8566, 2.3522, 0.5, 200)
    snap = CellIdSnap(14)
    plain = snap_loops([ring], snap)
    simp = snap_loops([ring], snap, simplify_edge_chains=True)
    assert len(plain) == len(simp) == 1
    assert len(simp[0]) < len(plain[0]) / 3  # real simplification
    worst = _ring_chord_to_inputs(simp[0], ring)
    r_chord = 2 * math.sin(snap.edge_snap_radius() / 2)
    assert worst <= r_chord * (1 + 1e-9)


def test_simplify_edge_chains_keeps_junction_sites():
    """Sites shared between two loops are NOT interior (degree > 1 in
    the merged graph) and must survive simplification, so adjacent
    snapped layers keep their exact shared border."""
    import numpy as np

    from s2_geometry_kotlin_spark.kernel.builder_snap import (CellIdSnap,
                                                              snap_loops)
    from s2_geometry_kotlin_spark.sources.layers import \
        regular_loop_vertices

    a = regular_loop_vertices(10.0, 10.0, 0.5, 80)
    b = regular_loop_vertices(10.0, 10.9, 0.5, 80)  # overlapping discs
    snap = CellIdSnap(12)
    out = snap_loops([a, b], snap, simplify_edge_chains=True)
    assert len(out) == 2
    # any site used by both output rings must appear in both (junction
    # preservation): compare exact row sets
    keys_a = {tuple(v) for v in out[0]}
    keys_b = {tuple(v) for v in out[1]}
    plain = snap_loops([a, b], snap)
    shared_plain = ({tuple(v) for v in plain[0]}
                    & {tuple(v) for v in plain[1]})
    assert shared_plain <= (keys_a & keys_b)


def test_simplify_edge_chains_avoids_nearby_site():
    """Topology guarantee: simplification may not bring the chain
    closer than min_edge_vertex_separation to any OTHER site — the
    simplified ring's clearance to a nearby feature is never reduced
    below the separation bound."""
    import math

    import numpy as np

    from s2_geometry_kotlin_spark.kernel.builder_snap import (
        CellIdSnap, snap_loops)
    from s2_geometry_kotlin_spark.kernel.edges import \
        point_edge_chord2_pairwise
    from s2_geometry_kotlin_spark.sources.layers import \
        regular_loop_vertices

    ring = regular_loop_vertices(0.0, 0.0, 0.5, 120)
    # a small polygon hugging the inside of the ring arc, inside the
    # max-edge-deviation corridor a careless chord could cut through
    tri = regular_loop_vertices(0.0, 0.475, 0.012, 6)
    snap = CellIdSnap(14)
    plain = snap_loops([ring, tri], snap)
    out = snap_loops([ring, tri], snap, simplify_edge_chains=True)
    assert len(plain) == len(out) == 2

    def clearance(big, small):
        m = len(big)
        worst = None
        for p in small:
            d2 = point_edge_chord2_pairwise(
                np.asarray([p] * m), np.asarray(big),
                np.asarray([big[(k + 1) % m] for k in range(m)]))
            d = float(np.sqrt(d2).min())
            worst = d if worst is None else min(worst, d)
        return worst

    big_p, small_p = max(plain, key=len), min(plain, key=len)
    big_s, small_s = max(out, key=len), min(out, key=len)
    assert len(big_s) < len(big_p)  # the ring actually simplified
    sep_chord = 2 * math.sin(snap.min_edge_vertex_separation() / 2)
    before = clearance(big_p, small_p)
    after = clearance(big_s, small_s)
    # never reduced below the separation bound
    assert after >= min(before, sep_chord) * (1 - 1e-9), (before, after)


def test_dominated_psi_wrap_branch():
    """ADVICE r4: when the dominance phase psi lands outside the
    principal branch's reach of [0, theta], the (psi-pi/2, psi+pi/2)
    window must be compared modulo 2*pi.  Built so the ground truth
    (winner strictly closer over every covered edge point) is verified
    numerically in the test itself."""
    import math

    import numpy as np

    from s2_geometry_kotlin_spark.kernel.builder_snap import _dominated

    theta = 3.0
    x = np.array([1.0, 0.0, 0.0])
    y = np.array([math.cos(theta), math.sin(theta), 0.0])
    # choose d = winner - loser with phase psi = -3 (principal branch),
    # whose +2*pi representative 3.28 has window (1.71, 4.85) ⊇ cov
    psi = -3.0
    d = np.array([math.cos(psi), math.sin(psi), 0.0])
    loser = np.array([0.0, 0.0, 1.0])
    winner = loser + d
    cov = (2.0, 3.0)
    # ground truth: d . gamma(t) > 0 on all of cov (winner dominates)
    ts = np.linspace(cov[0], cov[1], 512)
    gam = (np.sin(theta - ts)[:, None] * x +
           np.sin(ts)[:, None] * y) / math.sin(theta)
    assert (gam @ d > 0).all()
    assert _dominated(cov, winner, loser, x, y, theta,
                      math.sin(theta), math.cos(theta))
    # and the complementary direction is NOT dominated anywhere in cov
    assert (gam @ (-d) < 0).all()
    assert not _dominated(cov, loser + (-d), loser, x, y, theta,
                          math.sin(theta), math.cos(theta))
