"""B5: find + classify polygon degeneracies — full reference algorithm.

Reference: builder/S2FindPolygonDegeneracies.kt — given a polygon edge
graph, find every DEGENERATE EDGE (vertex to itself) and SIBLING PAIR
(edge plus its exact reverse) and classify each as a SHELL (isolated
boundary outside the polygon interior) or a HOLE (inside it).

The classification follows the reference end-to-end (:140-385):

1. mark degenerate edges (multiplicity-matched sibling pairing) and
   UNBALANCED vertices — vertices owning an out-edge with no sibling,
   where semi-open containment is decidable from the incident edges
   alone (:207-236);
2. build connected components rooted at unvisited degeneracies with a
   crossing-parity BFS: each traversed graph edge flips the "same side
   as the root" bit by the parity of boundary edges crossed in the
   neighborhood of its endpoints (:246-276 buildComponent, :278-305
   crossingParity);
3. resolve each component's root sign — at an unbalanced vertex via the
   S2ContainsVertexQuery rule (the unmatched incident edge immediately
   clockwise from ortho(v) decides containment, :360-371 +
   S2ContainsVertexQuery.kt:38-63), else by edgeOrVertexCrossing parity
   along a segment from a vertex of known sign (:330-345
   computeUnknownSignsBruteForce);
4. merge, inverting is_hole where the root turned out outside (:372-385).

This handles UNBALANCED graphs (sibling multisets that do not stitch
into closed loops) — the case the previous scoped version documented
out — because no step requires assembling the non-degenerate remainder
into loops.  Fine for driver-side layer prep, where graphs are
layer-sized.

Preconditions mirror the reference (:45-51): degeneracies must not
coincide with non-degenerate boundary portions — guaranteed by B1 snap
rounding, which separates sites by min_vertex_separation.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass

import numpy as np

from . import predicates as pred


@dataclass(frozen=True)
class PolygonDegeneracy:
    """S2FindPolygonDegeneracies.PolygonDegeneracy (:51)."""
    edge_id: int
    is_hole: bool


def mark_degeneracies(edges: list[tuple[int, int]]) -> list[bool]:
    """Which edges are degeneracies: self loops, plus sibling pairs
    matched with multiplicity — the k-th copy of (a, b) pairs with the
    k-th copy of (b, a), so an unbalanced multiset marks only
    min(count, reverse count) copies per direction (the reference's
    sorted-merge pairing, :207-236)."""
    cnt = Counter(edges)
    seen: Counter = Counter()
    out = []
    for a, b in edges:
        if a == b:
            out.append(True)
            continue
        seen[(a, b)] += 1
        out.append(seen[(a, b)] <= min(cnt[(a, b)], cnt[(b, a)]))
    return out


class _Finder:
    """DegeneracyFinder (:137-385) on index-pair edge lists."""

    def __init__(self, vertices: np.ndarray,
                 edges: list[tuple[int, int]]):
        self.v = np.asarray(vertices, dtype=np.float64)
        self.edges = edges
        self.is_deg = mark_degeneracies(edges)
        self.out_map: dict[int, list[int]] = {}
        self.in_map: dict[int, list[int]] = {}
        for e, (a, b) in enumerate(edges):
            self.out_map.setdefault(a, []).append(e)
            self.in_map.setdefault(b, []).append(e)
        # a vertex is unbalanced if one of its out-edges has no sibling:
        # semi-open containment of that vertex is decidable locally
        cnt = Counter(edges)
        self.unbalanced = {a for (a, b) in edges
                           if a != b and cnt[(a, b)] > cnt[(b, a)]}

    def crossing_parity(self, v0: int, v1: int,
                        include_same: bool) -> bool:
        """Parity of crossings between edge (v0, v1) and the edges
        incident to v0 (:278-305); the S2::VertexCrossing equivalent."""
        if v0 == v1:
            # degenerate target: the point edge crosses nothing; only
            # same-edge counting applies (explicit guard because this
            # repo's ordered_ccw counts ties, unlike SimpleCCW)
            crossings = 0
            if include_same:
                crossings += sum(
                    1 for e in self.out_map.get(v0, ())
                    if self.edges[e][1] == v1)
                crossings += sum(
                    1 for e in self.in_map.get(v0, ())
                    if self.edges[e][0] == v1)
            return (crossings & 1) != 0
        crossings = 0
        p0 = self.v[v0]
        p1 = self.v[v1]
        p0_ref = pred.ortho(p0)
        for e in self.out_map.get(v0, ()):
            w = self.edges[e][1]
            if w == v1:
                if include_same:
                    crossings += 1
            elif w != v0 and pred.ordered_ccw(p0_ref, self.v[w], p1, p0):
                crossings += 1
        for e in self.in_map.get(v0, ()):
            u = self.edges[e][0]
            if u == v1:
                if include_same:
                    crossings += 1
            elif u != v0 and pred.ordered_ccw(p0_ref, self.v[u], p1, p0):
                crossings += 1
        return (crossings & 1) != 0

    def contains_vertex_sign(self, v0: int) -> int:
        """S2ContainsVertexQuery (:360-371 + its .kt:38-63): +1 if v0
        is contained (semi-open), -1 if not, 0 if all incident edges
        are matched sibling pairs.  The unmatched edge immediately
        clockwise from ortho(v0) decides: outgoing => contained."""
        p0 = self.v[v0]
        edge_dirs: dict[int, int] = {}
        for e in self.out_map.get(v0, ()):
            w = self.edges[e][1]
            if w != v0:
                edge_dirs[w] = edge_dirs.get(w, 0) + 1
        for e in self.in_map.get(v0, ()):
            u = self.edges[e][0]
            if u != v0:
                edge_dirs[u] = edge_dirs.get(u, 0) - 1
        ref = pred.ortho(p0)
        best_point, best_dir = ref, 0
        for w, d in edge_dirs.items():
            if d == 0:
                continue  # matched sibling pair
            if pred.ordered_ccw(ref, best_point, self.v[w], p0):
                best_point, best_dir = self.v[w], d
        return (best_dir > 0) - (best_dir < 0)

    def build_component(self, root: int, used: set):
        """(:246-276) BFS from a degeneracy root, tracking each
        vertex's side relative to the root via crossing parity."""
        degeneracies: list[PolygonDegeneracy] = []
        root_sign = 0
        frontier = [(root, True)]
        used.add(root)
        while frontier:
            v0, v0_same = frontier.pop()
            if root_sign == 0 and v0 in self.unbalanced:
                s = self.contains_vertex_sign(v0)
                if s == 0:
                    raise ValueError("unbalanced vertex with sign 0")
                root_sign = s if v0_same else -s
            for e in self.out_map.get(v0, ()):
                v1 = self.edges[e][1]
                same = v0_same ^ self.crossing_parity(v0, v1, False)
                if self.is_deg[e]:
                    degeneracies.append(PolygonDegeneracy(e, same))
                if v1 in used:
                    continue
                same = same ^ self.crossing_parity(v1, v0, True)
                frontier.append((v1, same))
                used.add(v1)
        return root, root_sign, degeneracies

    def resolve_sign_brute_force(self, known_v: int, known_sign: int,
                                 root: int) -> int:
        """(:330-345): parity of edgeOrVertexCrossings of the segment
        known_v -> root against every non-degenerate edge."""
        inside = known_sign > 0
        a = self.v[known_v]
        b = self.v[root]
        for e, (u, w) in enumerate(self.edges):
            if self.is_deg[e]:
                continue
            inside ^= pred.edge_or_vertex_crossing(
                a, b, self.v[u], self.v[w])
        return 1 if inside else -1


def find_polygon_degeneracies(
        vertices: np.ndarray,
        edges: list[tuple[int, int]],
        is_full_if_degenerate: bool = False) -> list[PolygonDegeneracy]:
    """Classify every degenerate edge / sibling-pair member of a
    directed polygon edge graph (interior on the left, the S2Builder
    graph convention); handles unbalanced sibling multisets.

    vertices: (n, 3) unit vectors; edges: directed (v0, v1) index
    pairs.  `is_full_if_degenerate` mirrors Graph.isFullPolygon for the
    everything-degenerate case (:148-152): a fully-degenerate graph is
    all holes in a full polygon, all shells in an empty one."""
    n = len(edges)
    finder = _Finder(vertices, edges)
    n_deg = sum(finder.is_deg)
    if n_deg == 0:
        return []
    if n_deg == n:
        return [PolygonDegeneracy(i, is_full_if_degenerate)
                for i in range(n)]
    used: set = set()
    components = []
    known_v, known_sign = -1, 0
    for e in range(n):
        if not finder.is_deg[e]:
            continue
        root = edges[e][0]
        if root in used:
            continue
        comp = finder.build_component(root, used)
        if comp[1] != 0:
            known_v, known_sign = comp[0], comp[1]
        components.append(comp)
    if any(sign == 0 for _, sign, _ in components):
        if known_sign == 0:
            # no component saw an unbalanced vertex: pick any (the
            # graph has non-degenerate edges, so one exists)
            if not finder.unbalanced:
                # balanced non-degenerate remainder: classify its
                # containment via a vertex of a non-degenerate edge
                # using the semi-open vertex query directly
                known_v = next(edges[e][0] for e in range(n)
                               if not finder.is_deg[e])
                known_sign = finder.contains_vertex_sign(known_v)
                if known_sign == 0:
                    raise ValueError(
                        "cannot seed containment sign: all incident "
                        "edges at the probe vertex are matched pairs")
            else:
                known_v = next(iter(finder.unbalanced))
                known_sign = finder.contains_vertex_sign(known_v)
        components = [
            (root, sign if sign != 0 else finder.resolve_sign_brute_force(
                known_v, known_sign, root), degs)
            for root, sign, degs in components]
    out = []
    for _root, sign, degs in components:
        invert = sign < 0
        out.extend(PolygonDegeneracy(d.edge_id, d.is_hole ^ invert)
                   for d in degs)
    out.sort(key=lambda d: (d.edge_id, d.is_hole))
    return out
