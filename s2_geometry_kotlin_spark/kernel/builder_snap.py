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
   within edge_snap_radius of the edge, ordered by their projection
   along it (S2Builder.snapEdge's site-visit order), starting at
   site(x) and ending at site(y).  The reference's Voronoi-exclusion
   refinements (getVoronoiSiteExclusion / edgeCircumcenterSign,
   S2Builder.kt:1438-1476) only REMOVE redundant chain sites; omitting
   them can keep an extra near-edge site in the chain, never lose one;
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


class CellIdSnap(SnapFunction):
    """S2CellIdSnapFunction.kt: snap to level-`level` cell centers.

    min snap radius = 0.5 * kMaxDiag(level) + 4 * DBL_EPSILON
    (S2CellIdSnapFunction.kt:169-178)."""

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
            d2 = np.maximum(0.0, 2.0 - 2.0 * (arr @ s))
            if float(d2.min()) < sep2 or (arr == s).all(axis=1).any():
                continue
        sites.append(s)
    return np.asarray(sites).reshape(-1, 3)


def _nearest_site(p: np.ndarray, sites: np.ndarray) -> int:
    d2 = np.maximum(0.0, 2.0 - 2.0 * (sites @ p))
    return int(d2.argmin())


def snap_edge(x: np.ndarray, y: np.ndarray, sites: np.ndarray,
              snap: SnapFunction) -> list[int]:
    """Site chain for input edge (x, y) — S2Builder.snapEdge
    (:1390-1492) without the Voronoi-exclusion chain pruning: every
    site within edge_snap_radius of the edge, ordered by projection
    along it, anchored at the endpoint sites."""
    first = _nearest_site(x, sites)
    last = _nearest_site(y, sites)
    if first == last:
        return [first]
    r2 = _chord2(snap.edge_snap_radius())
    xs = np.broadcast_to(x, sites.shape)
    ys = np.broadcast_to(y, sites.shape)
    d2 = point_edge_chord2_pairwise(sites, xs, ys)
    near = np.flatnonzero(d2 <= r2)
    # order by PROJECTION along the edge (angle from x of each site's
    # closest point on the edge — NOT distance from x, which reorders
    # sites with different perpendicular offsets and can zig-zag the
    # chain); endpoint sites anchor the chain even if they sit just
    # outside the radius (possible when a vertex snapped a full
    # snap_radius away)
    from .edges import project_to_edge
    chain_ids = sorted(set(near.tolist()) | {first, last})
    pts = sites[chain_ids]
    feet = project_to_edge(pts, np.broadcast_to(x, pts.shape),
                           np.broadcast_to(y, pts.shape))
    t = np.arccos(np.clip(feet @ x, -1.0, 1.0))

    def park(k: int) -> float:
        i = chain_ids[k]
        if i == first:
            return -1.0
        if i == last:
            return 4.0  # > pi: always sorts after interior sites
        return float(t[k])
    order = sorted(range(len(chain_ids)), key=park)
    return [chain_ids[k] for k in order]


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


def snap_loops(loops: list[np.ndarray],
               snap: SnapFunction) -> list[np.ndarray]:
    """Snap-round a set of loops together (shared site set, so nearby
    vertices across loops merge consistently).  Returns the surviving
    snapped loops; degenerate loops (collapsed below 3 distinct sites)
    are dropped."""
    all_v = np.concatenate([np.asarray(lv, dtype=np.float64)
                            for lv in loops], axis=0)
    sites = choose_sites(all_v, snap)
    out = []
    for lv in loops:
        lv = np.asarray(lv, dtype=np.float64)
        chain: list[int] = []
        n = len(lv)
        for i in range(n):
            seg = snap_edge(lv[i], lv[(i + 1) % n], sites, snap)
            # each edge chain starts where the previous ended
            chain.extend(seg if not chain else seg[1:])
        if chain and chain[0] == chain[-1]:
            chain = chain[:-1]
        chain = _drop_degeneracies(chain)
        if len(chain) >= 3 and len(set(chain)) == len(chain):
            out.append(sites[chain])
        elif len(chain) >= 3:
            # a revisited site means the loop pinched into multiple
            # rings at that site; split at repeats
            out.extend(sites[c] for c in _split_at_repeats(chain)
                       if len(c) >= 3)
    return out


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


def snap_polygon(poly: Polygon, snap: SnapFunction) -> Polygon:
    """Snap-round a polygon's loops; the Polygon constructor re-derives
    orientation/nesting from the snapped rings (initOriented model)."""
    snapped = snap_loops([lp.vertices for lp in poly.loops], snap)
    return Polygon([Loop(v) for v in snapped])
