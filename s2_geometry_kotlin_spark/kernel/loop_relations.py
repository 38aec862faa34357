"""Loop/loop and polygon relations (SURVEY.md §2.4 P8).

contains/intersects between loops via the reference's structure
(dilivia/s2/region/S2Loop.kt:496-569): bound reject, edge-crossing scan
with wedge tests at shared vertices (dilivia/s2/S2WedgeRelations.kt),
then the point-containment conditions.  Layer-side (small polygons);
runs driver-side or inside per-layer UDFs — never on the page hot path.
"""

from __future__ import annotations

import numpy as np

from . import predicates as pred
from .regions import Loop


def wedge_contains(a0, ab1, a2, b0, b2) -> bool:
    """CCW order around ab1 must be a2 b2 b0 a0 (S2WedgeRelations.kt)."""
    return (pred.ordered_ccw(a2, b2, b0, ab1) and
            pred.ordered_ccw(b0, a0, a2, ab1))


def wedge_intersects(a0, ab1, a2, b0, b2) -> bool:
    return not (pred.ordered_ccw(a0, b2, b0, ab1) and
                pred.ordered_ccw(b0, a2, a0, ab1))


def _edges(v: np.ndarray):
    n = len(v)
    for i in range(n):
        yield v[i - 1], v[i], v[(i + 1) % n]  # prev, cur, next


def _crossing_scan(a: Loop, b: Loop):
    """Returns (has_proper_crossing, shared_vertex_wedges) where wedges is
    a list of (a_prev, v, a_next, b_prev, b_next) at shared vertices."""
    av = a.vertices
    bv = b.vertices
    has_crossing = False
    wedges = []
    for i in range(len(av)):
        for j in range(len(bv)):
            if np.array_equal(av[i], bv[j]):
                wedges.append((av[i - 1], av[i],
                               av[(i + 1) % len(av)],
                               bv[j - 1], bv[(j + 1) % len(bv)]))
    for i in range(len(av)):
        a0, a1 = av[i], av[(i + 1) % len(av)]
        for j in range(len(bv)):
            b0, b1 = bv[j], bv[(j + 1) % len(bv)]
            if pred.crossing_sign(a0, a1, b0, b1) > 0:
                has_crossing = True
    return has_crossing, wedges


def loop_contains_loop(a: Loop, b: Loop) -> bool:
    """S2Loop.contains(S2Loop) (S2Loop.kt:496-541)."""
    if not a.rect_bound().contains_rect(b.rect_bound()):
        # the reference uses the padded subregionBound here; a strict
        # reject is only safe when the bounds are clearly disjoint
        if not a.rect_bound().intersects_rect(b.rect_bound()):
            return False
    na, nb = len(a.vertices), len(b.vertices)
    if na < 3 or nb < 3:  # empty/full specials
        a_full = na == 1 and a.vertices[0][2] < 0
        b_empty = nb == 1 and b.vertices[0][2] >= 0
        return a_full or b_empty
    has_crossing, wedges = _crossing_scan(a, b)
    if has_crossing:
        return False
    if wedges:
        # A must contain B locally at every shared vertex
        return all(wedge_contains(a0, v, a2, b0, b2)
                   for a0, v, a2, b0, b2 in wedges)
    if not a.contains_point(b.vertices[0]):
        return False
    # reject the case where A union B is the whole sphere
    if b.contains_point(a.vertices[0]):
        return False
    return True


def loop_intersects_loop(a: Loop, b: Loop) -> bool:
    """S2Loop.intersects (S2Loop.kt:543-569)."""
    if not a.rect_bound().intersects_rect(b.rect_bound()):
        return False
    na, nb = len(a.vertices), len(b.vertices)
    if na < 3 or nb < 3:
        a_full = na == 1 and a.vertices[0][2] < 0
        b_full = nb == 1 and b.vertices[0][2] < 0
        a_empty = na == 1 and a.vertices[0][2] >= 0
        b_empty = nb == 1 and b.vertices[0][2] >= 0
        if a_empty or b_empty:
            return False
        return a_full or b_full
    has_crossing, wedges = _crossing_scan(a, b)
    if has_crossing:
        return True
    if wedges:
        return any(wedge_intersects(a0, v, a2, b0, b2)
                   for a0, v, a2, b0, b2 in wedges)
    if a.contains_point(b.vertices[0]):
        return True
    if b.contains_point(a.vertices[0]):
        return True
    return False
