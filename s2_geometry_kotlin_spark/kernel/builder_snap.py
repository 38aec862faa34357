"""B1: minimal S2Builder snap rounding — the ingestion path for dirty
real-world geometry (duplicate vertices, jittered coordinates,
near-degenerate spikes) before it reaches the join/boolean kernels.

Reference: builder/S2Builder.kt (2401 LoC; options :482, chooseSites
:869-1121, snapEdge :1390-1492) with the snap functions from
builder/snap/ (S2CellIdSnapFunction.kt, IntLatLngSnapFunction.kt,
IdentitySnapFunction.kt).  This implements the reference's "snap first"
site-selection algorithm (S2Builder.kt:1067-1076) and per-edge site
chaining, scoped to what layer ingestion needs:

1. sites: apply snap_function to every input vertex in input order; a
   snapped point becomes a NEW site only if no existing site is within
   min_vertex_separation (brute-force distance scan instead of the
   reference's S2PointIndex — layers are driver-sized by design, the
   100-TB side of every query is the pages table);
2. edge snapping: each input edge (x, y) maps to the chain of sites
   within edge_snap_radius of the edge, visited in increasing distance
   from x and pruned with the reference's Voronoi-exclusion
   refinements (getVoronoiSiteExclusion coverage-interval containment
   and the edgeCircumcenterSign joint test, S2Builder.kt:1438-1476),
   so redundant near-edge sites are removed exactly as the reference
   removes them;
3. degeneracy cleanup on reassembled loops: consecutive duplicate sites
   collapse, sibling-pair spikes (…a, b, a…) are discarded to a fixed
   point (the graph-layer DegenerateEdges.DISCARD behavior polygons
   use, builder/graph/Graph.kt), loops left with < 3 vertices vanish.

Out of scope (B5 territory, documented): multi-layer graphs, edge
labels, simplify_edge_chains, and the full degeneracy classifier.
"""

from __future__ import annotations

import math

import numpy as np

from . import cellid as ck
from . import metrics
from . import predicates as pred
from .distance import chord2_points
from .edges import point_edge_chord2_pairwise
from .regions import Loop, Polygon

DBL_EPS = 2.220446049250313e-16
_SQRT2 = math.sqrt(2.0)

# S2EdgeCrossings.kIntersectionError — added to the edge snap radius so
# split edges stay within tolerance (S2Builder.kt:392-397)
INTERSECTION_ERROR = 8.0 * DBL_EPS


def _chord2(r_rad: float) -> float:
    """Squared chord length of an angle (S1ChordAngle.fromLength2)."""
    s = math.sin(min(r_rad, math.pi) / 2.0)
    return 4.0 * s * s


class SnapFunction:
    """builder/snap/SnapFunction.kt contract: a vertex-snapping map plus
    the separation guarantees the site-selection pass enforces."""

    snap_radius: float  # radians

    def snap_points(self, pts: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def min_vertex_separation(self) -> float:
        raise NotImplementedError

    def max_edge_deviation(self) -> float:
        """SnapFunction.maxEdgeDeviation (SnapFunction.kt:98): edges
        deviate at most 10% beyond the snap radius."""
        return 1.1 * self.snap_radius

    def edge_snap_radius(self) -> float:
        """snap radius + intersection error (S2Builder.kt:392-397)."""
        return self.snap_radius + INTERSECTION_ERROR


class IdentitySnap(SnapFunction):
    """IdentitySnapFunction.kt: no coordinate change; vertices merge
    only within the (default zero) snap radius."""

    def __init__(self, snap_radius: float = 0.0):
        self.snap_radius = float(snap_radius)

    def snap_points(self, pts: np.ndarray) -> np.ndarray:
        return np.asarray(pts, dtype=np.float64)

    def min_vertex_separation(self) -> float:
        # IdentitySnapFunction.minVertexSeparation: snapRadius
        return self.snap_radius

    def min_edge_vertex_separation(self) -> float:
        # IdentitySnapFunction.kt:53
        return 0.5 * self.snap_radius


class CellIdSnap(SnapFunction):
    """S2CellIdSnapFunction.kt: snap to level-`level` cell centers.

    min snap radius = 0.5 * kMaxDiag(level) + 4 * DBL_EPSILON
    (S2CellIdSnapFunction.kt:169-178)."""

    @staticmethod
    def min_snap_radius_for_level(level: int) -> float:
        """S2CellIdSnapFunction.minSnapRadiusForLevel
        (S2CellIdSnapFunction.kt:169-178), radians."""
        return 0.5 * metrics.MAX_DIAG.get_value(int(level)) + 4 * DBL_EPS

    @staticmethod
    def level_for_max_snap_radius(snap_radius: float) -> int:
        """Largest cells whose centers stay within snap_radius
        (S2CellIdSnapFunction.kt:190-195); clamped to a valid level."""
        return metrics.MAX_DIAG.get_level_for_max_value(
            2.0 * (snap_radius - 4 * DBL_EPS))

    def __init__(self, level: int, snap_radius: float | None = None):
        self.level = int(level)
        min_r = 0.5 * metrics.MAX_DIAG.get_value(self.level) + 4 * DBL_EPS
        self.snap_radius = (min_r if snap_radius is None
                            else float(snap_radius))
        if self.snap_radius < min_r:
            raise ValueError("snap_radius below minimum for level")
        self._min_radius = min_r

    def snap_points(self, pts: np.ndarray) -> np.ndarray:
        pts = np.asarray(pts, dtype=np.float64)
        ids = ck.parent(ck.from_xyz(pts[:, 0], pts[:, 1], pts[:, 2]),
                        self.level)
        x, y, z = ck.to_xyz(ids)
        return np.stack([x, y, z], axis=1)

    def min_vertex_separation(self) -> float:
        # S2CellIdSnapFunction.kt:76-98: max of the constant,
        # proportional, and asymptotic bounds
        min_edge = metrics.MIN_EDGE.get_value(self.level)
        max_diag = metrics.MAX_DIAG.get_value(self.level)
        r = self.snap_radius
        return max(min_edge, max(0.548 * r, r - 0.5 * max_diag))

    def min_edge_vertex_separation(self) -> float:
        # S2CellIdSnapFunction.kt:105-150
        min_diag = metrics.MIN_DIAG.get_value(self.level)
        if self.snap_radius == self._min_radius:
            return 0.565 * min_diag
        vs = self.min_vertex_separation()
        return max(0.397 * min_diag,
                   max(0.219 * self.snap_radius,
                       0.5 * vs * vs / self.snap_radius))


class IntLatLngSnap(SnapFunction):
    """IntLatLngSnapFunction.kt: snap to the 10^-exponent degree grid.

    min snap radius = degrees(sqrt(1/2) / 10^e)
                      + (9*sqrt(2) + 1.5) * DBL_EPSILON
    (IntLatLngSnapFunction.kt:182-211)."""

    MIN_EXPONENT = 0
    MAX_EXPONENT = 10

    @staticmethod
    def min_snap_radius_for_exponent(exponent: int) -> float:
        """IntLatLngSnapFunction.minSnapRadiusForExponent
        (IntLatLngSnapFunction.kt:182-211), radians."""
        scale = float(10 ** int(exponent))
        return (math.radians((0.5 * _SQRT2) / scale)
                + (9 * _SQRT2 + 1.5) * DBL_EPS)

    @staticmethod
    def exponent_for_max_snap_radius(snap_radius: float) -> int:
        """Smallest exponent whose snapping stays within snap_radius
        (IntLatLngSnapFunction.kt:223-240); clamped to the valid range."""
        radius = max(snap_radius - (9 * _SQRT2 + 1.5) * DBL_EPS, 1e-30)
        exponent = math.log10((0.5 * _SQRT2) / math.degrees(radius))
        return max(IntLatLngSnap.MIN_EXPONENT,
                   min(IntLatLngSnap.MAX_EXPONENT,
                       math.ceil(exponent - 2 * DBL_EPS)))

    def __init__(self, exponent: int, snap_radius: float | None = None):
        self.exponent = int(exponent)
        self._scale = float(10 ** self.exponent)
        min_r = (math.radians((0.5 * _SQRT2) / self._scale)
                 + (9 * _SQRT2 + 1.5) * DBL_EPS)
        self.snap_radius = (min_r if snap_radius is None
                            else float(snap_radius))
        if self.snap_radius < min_r:
            raise ValueError("snap_radius below minimum for exponent")

    def snap_points(self, pts: np.ndarray) -> np.ndarray:
        pts = np.asarray(pts, dtype=np.float64)
        lat, lon = ck.xyz_to_latlng_deg(pts[:, 0], pts[:, 1], pts[:, 2])
        lat = np.round(lat * self._scale) / self._scale
        lon = np.round(lon * self._scale) / self._scale
        x, y, z = ck.latlng_deg_to_xyz(lat, lon)
        return np.stack([x, y, z], axis=1)

    def min_vertex_separation(self) -> float:
        # IntLatLngSnapFunction.kt:104-121
        return max(0.471 * self.snap_radius,
                   self.snap_radius
                   - math.radians((0.5 * _SQRT2) / self._scale))

    def min_edge_vertex_separation(self) -> float:
        # IntLatLngSnapFunction.kt:128-156 (constant / proportional /
        # asymptotic bounds)
        vs = self.min_vertex_separation()
        return max(math.radians(1.0 / self._scale) * 0.277,
                   max(0.222 * self.snap_radius,
                       (vs / self.snap_radius) * vs * 0.5))


def choose_sites(vertices: np.ndarray, snap: SnapFunction) -> np.ndarray:
    """The reference's "snap first" site selection
    (S2Builder.chooseInitialSites, :1054-1119): snap every input vertex
    in order; keep the snapped point as a new site unless an existing
    site lies within min_vertex_separation."""
    snapped = snap.snap_points(vertices)
    sep2 = _chord2(snap.min_vertex_separation())
    sites: list[np.ndarray] = []
    for s in snapped:
        if sites:
            arr = np.asarray(sites)
            diff = arr - s
            d2 = np.einsum("ij,ij->i", diff, diff)
            if float(d2.min()) < sep2 or (arr == s).all(axis=1).any():
                continue
        sites.append(s)
    return np.asarray(sites).reshape(-1, 3)


def _nearest_site(p: np.ndarray, sites: np.ndarray) -> int:
    diff = sites - p
    d2 = np.einsum("ij,ij->i", diff, diff)
    return int(d2.argmin())


def _coverage_interval(s: np.ndarray, x: np.ndarray, y: np.ndarray,
                       cos_r: float, theta: float, sin_theta: float,
                       cos_theta: float):
    """Segment [t0, t1] of the edge parameter t in [0, theta] where the
    geodesic point gamma(t) lies within the snap radius of site s (the
    "coverage interval" of S2Builder.kt:1432-1437), or None if empty.

    gamma(t) = (sin(theta-t) x + sin(t) y) / sin(theta), so
    s . gamma(t) = R cos(t - psi) / sin(theta)."""
    a = float(s @ x)
    b = float(s @ y)
    p = a * sin_theta
    q = b - a * cos_theta
    rr = math.hypot(p, q)
    if rr == 0.0:
        return None
    psi = math.atan2(q, p)
    arg = cos_r * sin_theta / rr
    if arg > 1.0:
        return None
    delta = math.acos(max(-1.0, arg))
    lo = max(0.0, psi - delta)
    hi = min(theta, psi + delta)
    if lo > hi:
        return None
    return lo, hi


def _dominated(cov, winner: np.ndarray, loser: np.ndarray,
               x: np.ndarray, y: np.ndarray, theta: float,
               sin_theta: float, cos_theta: float) -> bool:
    """True if `winner` is strictly closer than `loser` to EVERY edge
    point gamma(t), t in cov.  gamma(t) . (winner - loser) > 0 is again
    an R cos(t - psi) form, positive exactly on (psi-pi/2, psi+pi/2)."""
    if cov is None:
        return True
    d = winner - loser
    a_ = float(d @ x)
    b_ = float(d @ y)
    p = a_ * sin_theta
    q = b_ - a_ * cos_theta
    rr = math.hypot(p, q)
    if rr == 0.0:
        return False  # equidistant along the whole edge: no dominance
    psi = math.atan2(q, p)
    half = 0.5 * math.pi
    # atan2 returns the principal branch; near +/-pi the window
    # (psi-pi/2, psi+pi/2) must be compared modulo 2*pi against
    # cov in [0, theta] or a dominated site is kept (ADVICE r4) —
    # check all representatives that could reach [0, pi]
    two_pi = 2.0 * math.pi
    return any(p0 - half < cov[0] and cov[1] < p0 + half
               for p0 in (psi, psi + two_pi, psi - two_pi))


def _voronoi_exclusion(b: np.ndarray, c: np.ndarray, x: np.ndarray,
                       y: np.ndarray, cos_r: float, theta: float,
                       sin_theta: float, cos_theta: float) -> int:
    """S2Predicates.getVoronoiSiteExclusion semantics (numeric form,
    :652-682): a site is excluded iff its Voronoi region clipped to a
    disc of the snap radius has empty intersection with edge XY — i.e.
    the OTHER site is closer to every edge point within the snap radius
    of it.  Returns 1 if b is excluded by c, 2 if c is excluded by b,
    0 if neither (both cannot be excluded, :662-666)."""
    ib = _coverage_interval(b, x, y, cos_r, theta, sin_theta, cos_theta)
    ic = _coverage_interval(c, x, y, cos_r, theta, sin_theta, cos_theta)
    if _dominated(ib, c, b, x, y, theta, sin_theta, cos_theta):
        return 1
    if _dominated(ic, b, c, x, y, theta, sin_theta, cos_theta):
        return 2
    return 0


def _edge_circumcenter_sign(x: np.ndarray, y: np.ndarray, a: np.ndarray,
                            b: np.ndarray, c: np.ndarray) -> int:
    """Which side of edge XY the circumcenter of triangle ABC lies on
    (S2Predicates.edgeCircumcenterSign:622-650, triage formula
    :1203-1226: sign(ABC) * (x cross y) . ((b-a) cross (c-a)))."""
    abc = pred.sign(a, b, c)
    z = np.cross(b - a, c - a)
    val = abc * float(np.cross(x, y) @ z)
    return 1 if val > 0 else (-1 if val < 0 else 0)


def snap_edge(x: np.ndarray, y: np.ndarray, sites: np.ndarray,
              snap: SnapFunction,
              r_edge: float | None = None) -> list[int]:
    """Site chain for input edge (x, y) — S2Builder.snapEdge
    (:1390-1492) including the Voronoi-exclusion chain pruning:
    candidates (sites within edge_snap_radius of the edge) are visited
    in increasing distance from X (sortSitesByDistance, :1191-1194,
    applied at :1316), and each new site C prunes trailing chain sites
    whose clipped Voronoi regions it excludes — directly
    (getVoronoiSiteExclusion coverage-interval containment) or jointly
    with the second-to-last site via the circumcenter test
    (:1452-1476)."""
    first = _nearest_site(x, sites)
    last = _nearest_site(y, sites)
    if first == last:
        return [first]
    if r_edge is None:
        # callers that snap crossing-split geometry keep the padded
        # radius; the polyline layers pass the exact per-options radius
        # (padded by kIntersectionError ONLY under splitCrossingEdges,
        # S2Builder.kt:384-397)
        r_edge = snap.edge_snap_radius()
    r2 = _chord2(r_edge)
    xs = np.broadcast_to(x, sites.shape)
    ys = np.broadcast_to(y, sites.shape)
    d2 = point_edge_chord2_pairwise(sites, xs, ys)
    near = set(np.flatnonzero(d2 <= r2).tolist()) | {first, last}
    if r2 == 0.0:
        # zero edge snap radius (IdentitySnap(0)): the reference's
        # candidate test is the EXACT predicate
        # compareEdgeDistance(c, x, y, 0) <= 0 (S2Builder.kt:1416), so
        # a site merely within float rounding of the great circle —
        # e.g. 4:5 on the 3:5..5:5 meridian chord, whose double
        # coordinates are NOT exactly coplanar — must not split the
        # edge.  Keep only sites exactly on the edge's great circle
        # (the chord2-to-segment filter above already bounds them to
        # the segment).
        near = {i for i in near
                if i in (first, last) or
                pred._exact_sign(x, y, sites[i], perturb=False) == 0}
    # visit order: increasing distance from X
    cand = sorted(near,
                  key=lambda i: float(((sites[i] - x) ** 2).sum()))
    cos_r = math.cos(min(r_edge, math.pi))
    theta = math.acos(max(-1.0, min(1.0, float(x @ y))))
    sin_theta, cos_theta = math.sin(theta), math.cos(theta)
    max_adj2 = _chord2(min(math.pi, 2.0 * r_edge))
    chain: list[int] = []
    for c_id in cand:
        c = sites[c_id]
        add_c = True
        while chain:
            b = sites[chain[-1]]
            bc2 = float(((b - c) ** 2).sum())
            if bc2 >= max_adj2:
                break  # clipped Voronoi regions cannot interact
            res = _voronoi_exclusion(b, c, x, y, cos_r, theta,
                                     sin_theta, cos_theta)
            if res == 1:
                chain.pop()  # B excluded by C; retry previous site
                continue
            if res == 2:
                add_c = False  # C excluded by B
                break
            if len(chain) < 2:
                break
            a = sites[chain[-2]]
            ac2 = float(((a - c) ** 2).sum())
            if ac2 >= max_adj2:
                break
            # if the circumcenter of ABC lies on the opposite side of
            # XY from B, then B is excluded by A and C combined
            xyb = pred.sign(x, y, b)
            if pred.sign(a, b, c) == xyb:
                break  # circumcenter on B's side but further away
            if _edge_circumcenter_sign(x, y, a, b, c) != xyb:
                break
            chain.pop()
        if add_c:
            chain.append(c_id)
    if not chain:
        raise ValueError("snap_edge produced an empty chain")
    return chain


def _drop_degeneracies(chain: list[int]) -> list[int]:
    """Collapse consecutive duplicates and sibling-pair spikes
    (…a, b, a… -> …a…) to a fixed point, on a CLOSED chain — the
    polygon-layer DegenerateEdges.DISCARD cleanup."""
    out = list(chain)
    changed = True
    while changed and len(out) >= 1:
        changed = False
        n = len(out)
        # consecutive duplicates (closed: last->first too)
        dedup = [v for i, v in enumerate(out) if v != out[(i + 1) % n]]
        if len(dedup) != n:
            out = dedup
            changed = True
            continue
        n = len(out)
        for i in range(n):
            if n >= 2 and out[(i - 1) % n] == out[(i + 1) % n]:
                # spike at i: remove i and one of its equal neighbors
                hi, lo = max(i, (i + 1) % n), min(i, (i + 1) % n)
                del out[hi]
                if n > 1 and hi != lo:
                    del out[lo]
                changed = True
                break
    return out


def snap_loops(loops: list[np.ndarray], snap: SnapFunction,
               simplify_edge_chains: bool = False,
               sites: np.ndarray | None = None,
               split_crossing_edges: bool = False,
               idempotent: bool = False,
               as_graph: bool = False) -> list[np.ndarray]:
    """Snap-round a set of loops together (shared site set, so nearby
    vertices across loops merge consistently).  Returns the surviving
    snapped loops; degenerate loops (collapsed below 3 distinct sites)
    are dropped.  With simplify_edge_chains, chains of degree-2 sites
    are simplified per S2Builder options.simplifyEdgeChains
    (EdgeChainSimplifier, S2Builder.kt:1799-2200) while preserving the
    snap guarantees — see _simplify_ring.  An explicit `sites` array
    lets several layers share one site set (snap_polygon_pair)."""
    loops = [np.asarray(lv, dtype=np.float64) for lv in loops]
    edge_list = [(lv[i], lv[(i + 1) % len(lv)]) for lv in loops
                 for i in range(len(lv))]
    if idempotent and not (split_crossing_edges or
                           simplify_edge_chains) and sites is None and \
            input_meets_guarantees(np.concatenate(loops, axis=0),
                                   edge_list, snap):
        # S2Builder.kt:581-599: input already meets the output
        # guarantees; pass through unchanged
        return [lv.copy() for lv in loops]
    if sites is None:
        all_v = np.concatenate(loops, axis=0)
        if split_crossing_edges:
            # S2Builder.kt:489-520: self/mutual crossings become
            # shared vertices of both edges
            xpts = crossing_vertices(edge_list)
            if xpts:
                all_v = np.concatenate([all_v, np.asarray(xpts)],
                                       axis=0)
        sites = choose_sites(all_v, snap)
    # pass 1: snap every loop, recording the input edge that produced
    # each output edge (owners[k] = input edge owning the ring edge
    # ARRIVING at verts[k]; owners[0] = the closing edge's owner)
    rings: list[tuple[list[int], list[tuple[int, int]]]] = []
    for li, lv in enumerate(loops):
        verts: list[int] = []
        owners: list[tuple[int, int]] = []
        n = len(lv)
        for i in range(n):
            seg = snap_edge(lv[i], lv[(i + 1) % n], sites, snap)
            # each edge chain starts where the previous ended (the
            # snapEdge endpoint invariant); keep the full segment if a
            # pruning edge case ever breaks it rather than losing a site
            if verts and seg and seg[0] == verts[-1]:
                seg = seg[1:]
            verts.extend(seg)
            owners.extend([(li, i)] * len(seg))
        if len(verts) > 1 and verts[0] == verts[-1]:
            verts.pop()
            owners[0] = owners.pop()
        rings.append((verts, owners))
    if simplify_edge_chains:
        rings = _simplify_rings(rings, loops, sites, snap)
    if as_graph:
        # hand the snapped ring chains to the caller as (index chains,
        # site array) for graph-substrate assembly (init_to_simplified)
        return [v for v, _o in rings], sites
    out = []
    for verts, _owners in rings:
        chain = _drop_degeneracies(verts)
        if len(chain) >= 3 and len(set(chain)) == len(chain):
            out.append(sites[chain])
        elif len(chain) >= 3:
            # a revisited site means the loop pinched into multiple
            # rings at that site; split at repeats
            out.extend(sites[c] for c in _split_at_repeats(chain)
                       if len(c) >= 3)
    return out


def _simplify_rings(rings, loops, sites: np.ndarray,
                    snap: SnapFunction):
    """EdgeChainSimplifier (S2Builder.kt:1799-2130) scoped to the
    single-layer closed-ring graphs snap_loops builds: chains of
    INTERIOR sites (used exactly once across all rings — in/out degree
    1, no duplicates, no junctions) are replaced by simplified chains
    subject to the reference's three guarantees:

    - every input vertex snapped to a removed site stays within
      edge_snap_radius of the simplified edge (targetInputVertices,
      :2005-2016);
    - every OTHER site near the replaced edges is avoided by
      min_edge_vertex_separation on its original side, preserving
      topology (avoidSites, :2019-2100);
    - chain distance grows monotonically and no simplified edge
      exceeds the max-edge-deviation length bound
      (minEdgeLengthToSplit, S2Builder.kt:410)."""
    from .polyline_simplifier import PolylineSimplifier

    counts: dict[int, int] = {}
    for verts, _ in rings:
        for s in verts:
            counts[s] = counts.get(s, 0) + 1
    interior = {s: c == 1 for s, c in counts.items()}
    # input vertices per site (the targets that must stay covered)
    site_inputs: dict[int, list[np.ndarray]] = {}
    for lv in loops:
        for v in lv:
            site_inputs.setdefault(_nearest_site(v, sites), []).append(v)
    r_target = snap.edge_snap_radius()
    r_avoid = snap.min_edge_vertex_separation()
    query_r2 = _chord2(snap.max_edge_deviation() + r_avoid)
    max_len = 2.0 * math.acos(min(1.0, math.sin(snap.snap_radius)
                                  / math.sin(snap.max_edge_deviation())))
    edge_sites_cache: dict[tuple[int, int], np.ndarray] = {}

    def edge_sites(owner: tuple[int, int]) -> np.ndarray:
        got = edge_sites_cache.get(owner)
        if got is None:
            li, i = owner
            lv = loops[li]
            x, y = lv[i], lv[(i + 1) % len(lv)]
            d2 = point_edge_chord2_pairwise(
                sites, np.broadcast_to(x, sites.shape),
                np.broadcast_to(y, sites.shape))
            got = np.flatnonzero(d2 <= query_r2)
            edge_sites_cache[owner] = got
        return got

    def ang(a: np.ndarray, b: np.ndarray) -> float:
        return math.acos(max(-1.0, min(1.0, float(a @ b))))

    def simplify_ring(verts: list[int], owners: list[tuple[int, int]]):
        m = len(verts)
        if m < 3:
            return verts, owners
        start = next((k for k in range(m) if not interior[verts[k]]), 0)
        verts = verts[start:] + verts[:start]
        owners = owners[start:] + owners[:start]
        path = verts + [verts[0]]
        # edge j: path[j] -> path[j+1], owned by owners[(j+1) % m]
        e_owner = [owners[(j + 1) % m] for j in range(m)]

        def avoid(c0: int, v1: int, simp) -> bool:
            """avoidSites(:2019-2100) for edge j=v1 (v1 -> v1+1)."""
            p0 = sites[path[c0]]
            p1 = sites[path[v1]]
            p2 = sites[path[v1 + 1]]
            r1 = ang(p0, p1)
            r2 = ang(p0, p2)
            if r2 < r1:
                return False  # chain must move away monotonically
            if r2 >= max_len:
                return False  # edge too long for the deviation bound
            excl = {path[c0], path[v1], path[v1 + 1]}
            for sid in edge_sites(e_owner[v1]):
                sid = int(sid)
                if sid in excl:
                    continue
                p = sites[sid]
                r = ang(p0, p)
                if r <= r1 or r >= r2:
                    continue
                if v1 == c0:
                    disc_on_left = pred.sign(p1, p2, p) > 0
                else:
                    disc_on_left = pred.ordered_ccw(p0, p2, p, p1)
                if not simp.avoid_disc(p, r_avoid, disc_on_left):
                    return False
            return True

        def target_inputs(v: int, simp) -> bool:
            for iv in site_inputs.get(path[v], ()):
                if not simp.target_disc(iv, r_target):
                    return False
            return True

        new_verts: list[int] = []
        new_owners: list[tuple[int, int]] = []
        j = 0
        while j < m:
            simp = PolylineSimplifier()
            simp.init(sites[path[j]])
            avoid(j, j, simp)  # seed the window with the first edge
            chain = [j]
            cur0, cur1 = j, j + 1
            while True:
                chain.append(cur1)
                if cur1 == m or not interior[path[cur1]]:
                    break
                cur0, cur1 = cur1, cur1 + 1
                if not (target_inputs(cur0, simp)
                        and avoid(chain[0], cur0, simp)
                        and simp.extend(sites[path[cur1]])):
                    break
            new_verts.append(path[chain[0]])
            new_owners.append(e_owner[chain[0] % m])
            j = chain[-1]
        return new_verts, new_owners

    return [simplify_ring(v, o) for v, o in rings]


def _split_at_repeats(chain: list[int]) -> list[list[int]]:
    """Split a closed chain that revisits a site into simple cycles."""
    cycles: list[list[int]] = []
    stack: list[int] = []
    pos: dict[int, int] = {}
    for v in chain:
        if v in pos:
            k = pos[v]
            cyc = stack[k:]
            for u in cyc:
                pos.pop(u, None)
            del stack[k:]
            cycles.append(cyc)
        pos[v] = len(stack)
        stack.append(v)
    if len(stack) >= 3:
        cycles.append(stack)
    return cycles


def snap_polygon(poly: Polygon, snap: SnapFunction,
                 simplify_edge_chains: bool = False) -> Polygon:
    """Snap-round a polygon's loops; the Polygon constructor re-derives
    orientation/nesting from the snapped rings (initOriented model)."""
    snapped = snap_loops([lp.vertices for lp in poly.loops], snap,
                         simplify_edge_chains=simplify_edge_chains)
    return Polygon([Loop(v) for v in snapped])


def build_polyline_layer(lines: list[np.ndarray],
                         snap: SnapFunction | None = None,
                         edge_type: str = "directed",
                         split_crossing_edges: bool = False
                         ) -> list[np.ndarray]:
    """S2PolylineLayer semantics (builder/layers/S2PolylineLayer.kt):
    snap ALL input polylines against one shared site set, then
    assemble the combined directed-edge multiset into maximal edge
    WALKS (PolylineBuilder.buildWalks) — so edges contributed by
    different input polylines merge into one output polyline when
    possible, vertices/edges may repeat within a walk, and degenerate
    (self) edges are discarded.  edge_type="undirected" assembles with
    sibling-pair consumption and prefers the original direction."""
    from .builder_graph import build_polylines, build_polylines_undirected
    snap = snap if snap is not None else IdentitySnap(0.0)
    lines = [np.asarray(ln, dtype=np.float64) for ln in lines]
    edge_list = [(ln[i], ln[i + 1]) for ln in lines
                 for i in range(len(ln) - 1)]
    if not edge_list:
        return []
    all_v = np.concatenate(lines, axis=0)
    cand = [all_v]
    if split_crossing_edges:
        xpts = crossing_vertices(edge_list)
        if xpts:
            cand.append(np.asarray(xpts))
    sites = choose_sites(np.concatenate(cand, axis=0), snap)
    edges: list[tuple[int, int]] = []
    ids: list[int] = []  # per graph edge: its INPUT edge id (sub-edges
    # of a snap-split input edge share the id — Graph.getMinInputEdgeIds)
    input_id = 0
    r_edge = snap.snap_radius + (INTERSECTION_ERROR
                                 if split_crossing_edges else 0.0)
    for ln in lines:
        for i in range(len(ln) - 1):
            seg = snap_edge(ln[i], ln[i + 1], sites, snap,
                            r_edge=r_edge)
            for a, b in zip(seg[:-1], seg[1:]):
                if a != b:
                    edges.append((a, b))
                    ids.append(input_id)
            input_id += 1
    if edge_type == "directed":
        walks = build_polylines(edges, "walk", min_input_ids=ids)
    elif edge_type == "undirected":
        # INTERLEAVE each edge with its reverse copy so each input edge
        # pairs with its OWN reverse in the sibling map (the reference
        # pairing — Graph.makeSiblingMap on edges sorted with input-id
        # tie-break); the reverse copies carry NO input id, so the walk
        # continuation prefers original edge directions
        # (PolylineBuilder.kt:97-100).
        from .builder_graph import NO_INPUT_ID
        und, und_ids = [], []
        for e, eid in zip(edges, ids):
            und.append(e)
            und_ids.append(eid)
            und.append((e[1], e[0]))
            und_ids.append(NO_INPUT_ID)
        edges = und
        walks = build_polylines_undirected(edges, "walk",
                                           min_input_ids=und_ids)
    else:
        raise ValueError("edge_type must be 'directed' or 'undirected'")
    out = []
    for w in walks:
        chain = [edges[w[0]][0]] + [edges[e][1] for e in w]
        out.append(sites[chain])
    return out


def build_polyline_vector_layer(lines: list[np.ndarray],
                                snap: SnapFunction | None = None,
                                edge_type: str = "directed",
                                polyline_type: str = "path",
                                duplicate_edges: str = "keep",
                                sibling_pairs: str = "keep",
                                labels: list | None = None,
                                split_crossing_edges: bool = False):
    """S2PolylineVectorLayer semantics
    (builder/layers/S2PolylineVectorLayer.kt): assemble the combined
    edge multiset into MULTIPLE polylines — graph options are
    (edge_type, DegenerateEdges.DISCARD, duplicate_edges,
    sibling_pairs) per graphOptions() (:150-152), assembly is
    Graph.getPolylines(polyline_type) (:155), i.e. buildPaths (split at
    every vertex where the continuation is ambiguous) or buildWalks.
    Output polylines come back in input order whenever possible
    (canonicalizeVectorOrder).

    Vertex ids are assigned in leaf-cell-id order of the chosen sites
    (S2Builder.sortInputVertices, S2Builder.kt:957-1005 sorts candidate
    sites by S2CellId), which the reference's edge ordering — and hence
    the tie-break order of leftover loops sharing one input id —
    inherits.

    `labels`, when given, is one label list per input polyline; returns
    (polylines, label_sets) where label_sets[i][j] is the sorted label
    list of edge j of polyline i, fetched like Graph.LabelFetcher
    (Graph.kt:800-835: undirected fetch unions both siblings' input
    edges).  Without `labels`, returns just the polyline list."""
    from .builder_graph import (NO_INPUT_ID, DegenerateEdges,
                                DuplicateEdges, EdgeType, GraphOptions,
                                SiblingPairs, _sibling_map,
                                build_polylines,
                                build_polylines_undirected,
                                process_edges)
    snap = snap if snap is not None else IdentitySnap(0.0)
    lines = [np.asarray(ln, dtype=np.float64) for ln in lines]
    edge_list = [(ln[i], ln[i + 1]) for ln in lines
                 for i in range(len(ln) - 1)]

    def empty():
        return ([], []) if labels is not None else []

    if not edge_list:
        return empty()
    all_v = np.concatenate(lines, axis=0)
    cand = [all_v]
    if split_crossing_edges:
        xpts = crossing_vertices(edge_list)
        if xpts:
            cand.append(np.asarray(xpts))
    sites = choose_sites(np.concatenate(cand, axis=0), snap)
    # renumber sites in leaf-cell-id order (sortInputVertices)
    from . import cellid as _ck
    cids = _ck.from_xyz(sites[:, 0], sites[:, 1], sites[:, 2])
    perm = np.argsort(cids, kind="stable")
    sites = sites[perm]
    edges: list[tuple[int, int]] = []
    ids: list[list[int]] = []  # per graph edge: its input-edge ID SET
    input_labels: dict[int, tuple] = {}
    input_id = 0
    r_edge = snap.snap_radius + (INTERSECTION_ERROR
                                 if split_crossing_edges else 0.0)
    for li, ln in enumerate(lines):
        lab = tuple(labels[li]) if labels is not None else ()
        for i in range(len(ln) - 1):
            seg = snap_edge(ln[i], ln[i + 1], sites, snap,
                            r_edge=r_edge)
            for a, b in zip(seg[:-1], seg[1:]):
                # degenerate sub-edges stay: the layer's
                # DegenerateEdges.DISCARD drops them in process_edges
                edges.append((a, b))
                ids.append([input_id])
                if edge_type == "undirected":
                    # the reverse copy of an undirected edge carries NO
                    # input id (input ids live in one direction only)
                    edges.append((b, a))
                    ids.append([])
            input_labels[input_id] = lab
            input_id += 1
    opts = GraphOptions(
        EdgeType.DIRECTED if edge_type == "directed"
        else EdgeType.UNDIRECTED,
        DegenerateEdges.DISCARD,
        DuplicateEdges.MERGE if duplicate_edges == "merge"
        else DuplicateEdges.KEEP,
        {"keep": SiblingPairs.KEEP,
         "discard": SiblingPairs.DISCARD}[sibling_pairs])
    edges, ids, err = process_edges(opts, edges, ids)
    if err is not None:
        raise ValueError(err)
    if not edges:
        return empty()
    min_ids = [min(s) if s else NO_INPUT_ID for s in ids]
    if edge_type == "directed":
        walks = build_polylines(edges, polyline_type,
                                min_input_ids=min_ids)
    else:
        walks = build_polylines_undirected(edges, polyline_type,
                                           min_input_ids=min_ids)
    out = []
    for w in walks:
        chain = [edges[w[0]][0]] + [edges[e][1] for e in w]
        out.append(sites[chain])
    if labels is None:
        return out
    sib = _sibling_map(edges) if edge_type == "undirected" else None
    out_labels = []
    for w in walks:
        pl = []
        for e in w:
            s = set(ids[e])
            if sib is not None:
                s |= set(ids[sib[e]])
            pl.append(sorted({lv for iid in s
                              for lv in input_labels[iid]}))
        out_labels.append(pl)
    return out, out_labels


def init_to_simplified(poly: Polygon, snap: SnapFunction) -> Polygon:
    """S2Polygon.initToSimplified (S2Polygon.kt initToSimplified /
    S2PolygonSimplifierUnitTest semantics): snap-round ALL loops
    against one shared site set with simplifyEdgeChains on, then
    assemble the combined directed-edge multiset on the graph
    substrate (S2PolygonLayer: degenerate edges and sibling pairs
    DISCARDed) so that

    - a loop that pinches at a merged site splits into multiple loops,
    - opposite-direction overlapping sub-edges of DIFFERENT loops
      cancel and the loops merge,
    - loops collapsed below 3 sites disappear."""
    from .builder_graph import assemble_polygon
    rings, sites = snap_loops([lp.vertices for lp in poly.loops], snap,
                              simplify_edge_chains=True, as_graph=True)
    edges = []
    for chain in rings:
        n = len(chain)
        edges.extend((chain[i], chain[(i + 1) % n]) for i in range(n))
    out_rings, _degs = assemble_polygon(sites, edges)
    return Polygon([Loop(sites[r]) for r in out_rings if len(r) >= 3])


def snap_polygon_pair(a: Polygon, b: Polygon,
                      snap: SnapFunction) -> tuple[Polygon, Polygon]:
    """Snap-round TWO polygons against ONE shared site set — the
    S2BooleanOperation ingestion shape (both operands feed the same
    S2Builder).  A vertex of one operand lying on (or near) an edge of
    the other becomes a shared site that splits that edge, so
    T-junction incidences turn into exact shared sub-edges the boolean
    classification handles; snapping the operands separately cannot do
    this, because neither snap pass sees the other's vertices."""
    la = [lp.vertices for lp in a.loops]
    lb = [lp.vertices for lp in b.loops]
    sites = choose_sites(np.concatenate(la + lb, axis=0), snap)
    sa = snap_loops(la, snap, sites=sites)
    sb = snap_loops(lb, snap, sites=sites)
    return (Polygon([Loop(v) for v in sa]),
            Polygon([Loop(v) for v in sb]))


# ---------------------------------------------------------------------------
# S2Builder options: splitCrossingEdges and idempotent
# ---------------------------------------------------------------------------

def crossing_vertices(edge_list: list) -> list[np.ndarray]:
    """splitCrossingEdges support (S2Builder.kt:520 and the
    edge-snap-radius note at :384-397): intersection points of every
    crossing pair among the input edges, to be added to the site
    candidates so both edges snap through a common vertex.  `edge_list`
    is [(x, y), ...] over ALL layers of the build."""
    from .edges import edge_intersection
    out = []
    for i in range(len(edge_list)):
        x, y = edge_list[i]
        for j in range(i + 1, len(edge_list)):
            c, d = edge_list[j]
            if pred.crossing_sign(x, y, c, d) > 0:
                out.append(edge_intersection(x, y, c, d))
    return out


def input_meets_guarantees(vertices: np.ndarray, edge_list: list,
                           snap: SnapFunction) -> bool:
    """The `idempotent` pre-check (S2Builder.kt:581-599): snapping is
    skipped iff every vertex is already at a snapped location, every
    DISTINCT vertex pair is separated by >= min_vertex_separation, and
    every non-incident edge/vertex pair by >=
    min_edge_vertex_separation.  Exact duplicates are allowed — they
    merge to one site without moving anything."""
    vertices = np.asarray(vertices, dtype=np.float64).reshape(-1, 3)
    if len(vertices) == 0:
        return True
    snapped = snap.snap_points(vertices)
    if not np.allclose(snapped, vertices, atol=1e-15, rtol=0.0):
        return False
    # distinct vertex pairs
    sep2 = _chord2(snap.min_vertex_separation())
    if sep2 > 0:
        d2 = chord2_points(vertices, vertices)
        np.fill_diagonal(d2, np.inf)
        close = d2 < sep2
        if close.any():
            ii, jj = np.nonzero(close)
            for i, j in zip(ii.tolist(), jj.tolist()):
                if not np.array_equal(vertices[i], vertices[j]):
                    return False
    # non-incident edge/vertex pairs
    ev2 = _chord2(snap.min_edge_vertex_separation())
    if ev2 > 0:
        for (x, y) in edge_list:
            if np.array_equal(x, y):
                continue
            xs = np.broadcast_to(x, vertices.shape)
            ys = np.broadcast_to(y, vertices.shape)
            d2 = point_edge_chord2_pairwise(vertices, xs, ys)
            for k in np.flatnonzero(d2 < ev2).tolist():
                w = vertices[k]
                if not (np.array_equal(w, x) or np.array_equal(w, y)):
                    return False
    return True


def snap_polylines(lines: list[np.ndarray], snap: SnapFunction,
                   split_crossing_edges: bool = False,
                   idempotent: bool = True,
                   sites: np.ndarray | None = None
                   ) -> list[np.ndarray]:
    """Snap-round polylines (S2PolylineLayer semantics: degenerate
    edges discarded, consecutive duplicate sites collapse).  Supports
    the two remaining S2Builder options:

    - split_crossing_edges (S2Builder.kt:489-520): self- and mutual
      crossings become shared vertices of both edges;
    - idempotent (S2Builder.kt:581-599): input already meeting the
      snap guarantees passes through unchanged.

    Mirrors S2BuilderUnitTest selfIntersectingPolyline /
    idempotencySnaps* fixtures (tests/test_builder_options.py)."""
    lines = [np.asarray(ln, dtype=np.float64) for ln in lines]
    edge_list = [(ln[i], ln[i + 1]) for ln in lines
                 for i in range(len(ln) - 1)]
    all_v = (np.concatenate(lines, axis=0) if lines
             else np.zeros((0, 3)))
    if idempotent and not split_crossing_edges and sites is None and \
            input_meets_guarantees(all_v, edge_list, snap):
        return [ln.copy() for ln in lines]
    if sites is None:
        cand = [all_v]
        if split_crossing_edges:
            xpts = crossing_vertices(edge_list)
            if xpts:
                cand.append(np.asarray(xpts))
        sites = choose_sites(np.concatenate(cand, axis=0), snap)
    out = []
    for ln in lines:
        verts: list[int] = []
        for i in range(len(ln) - 1):
            seg = snap_edge(ln[i], ln[i + 1], sites, snap)
            if verts and seg and seg[0] == verts[-1]:
                seg = seg[1:]
            verts.extend(seg)
        dedup: list[int] = []
        for v in verts:
            if not dedup or dedup[-1] != v:
                dedup.append(v)
        if len(dedup) >= 2:
            out.append(sites[dedup])
    return out
