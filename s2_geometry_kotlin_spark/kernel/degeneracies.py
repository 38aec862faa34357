"""B5: find + classify polygon degeneracies.

Reference: builder/S2FindPolygonDegeneracies.kt — given a polygon edge
graph, find every DEGENERATE EDGE (vertex to itself) and SIBLING PAIR
(edge plus its exact reverse) and classify each as a SHELL (isolated
boundary outside the polygon interior) or a HOLE (inside it).  The
reference classifies via crossing-parity BFS over graph components
(:132-385) as an optimization; the semantics it computes are exactly
"is the degeneracy's location contained in the polygon defined by the
NON-degenerate edges" (contained => hole), which is what this
implementation evaluates directly: stitch the non-degenerate edges into
loops (general position, the S2Builder snap-rounding postcondition) and
test each degeneracy vertex with the P4/P5 containment kernel.  Fine
for driver-side layer prep, where graphs are layer-sized.

Preconditions mirror the reference (:45-51): degeneracies must not
coincide with non-degenerate boundary portions — guaranteed by B1 snap
rounding, which separates sites by min_vertex_separation.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .regions import Loop, Polygon


@dataclass(frozen=True)
class PolygonDegeneracy:
    """S2FindPolygonDegeneracies.PolygonDegeneracy (:51)."""
    edge_id: int
    is_hole: bool


def find_polygon_degeneracies(
        vertices: np.ndarray,
        edges: list[tuple[int, int]],
        is_full_if_degenerate: bool = False) -> list[PolygonDegeneracy]:
    """Classify every degenerate edge / sibling-pair member of a
    directed polygon edge graph.

    vertices: (n, 3) unit vectors; edges: directed (v0, v1) vertex-index
    pairs (interior on the left, the S2Builder graph convention).
    `is_full_if_degenerate` mirrors Graph.isFullPolygon for the
    everything-degenerate case (:148-152): a fully-degenerate graph is
    all holes in a full polygon, all shells in an empty one."""
    n = len(edges)
    is_deg = mark_degeneracies(edges)
    n_deg = sum(is_deg)
    if n_deg == 0:
        return []
    if n_deg == n:
        return [PolygonDegeneracy(i, is_full_if_degenerate)
                for i in range(n)]
    # stitch the non-degenerate remainder into loops and classify each
    # degeneracy's location against it (contained => hole)
    from .booleanop import _stitch
    keep = [(vertices[a], vertices[b])
            for i, (a, b) in enumerate(edges) if not is_deg[i]]
    poly = Polygon([Loop(v) for v in _stitch(keep)])
    out = []
    for i, (a, _) in enumerate(edges):
        if is_deg[i]:
            out.append(PolygonDegeneracy(
                i, bool(poly.contains_point(vertices[a]))))
    return out


def mark_degeneracies(edges: list[tuple[int, int]]) -> list[bool]:
    """Which edges are degeneracies: self loops, plus sibling pairs
    matched with multiplicity — the k-th copy of (a, b) pairs with the
    k-th copy of (b, a), so an unbalanced multiset marks only
    min(count, reverse count) copies per direction (the reference's
    sorted-merge pairing, :207-236).  Classification of unbalanced
    graphs (the reference's contains-vertex-sign path, :309-330) is out
    of this minimal scope: `find_polygon_degeneracies` requires the
    non-degenerate remainder to stitch into closed loops."""
    from collections import Counter
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
