"""Spherical measures (SURVEY.md §2.6 M1-M5).

Triangle angle/turn-angle/area (Girard + L'Huilier ladder,
dilivia/s2/S2Measures.kt:39-161), loop area via signed surface integral
with Gauss-Bonnet sign check (dilivia/s2/region/S2LoopMeasures.kt:95-300),
true centroids (dilivia/s2/S2Centroids.kt:68-143).
"""

from __future__ import annotations

import math

import numpy as np

from . import predicates as pred


def _robust_cross(a, b):
    x = np.cross(b + a, b - a)
    n = np.linalg.norm(x)
    if n == 0.0:
        return pred.ortho(a)
    return x


def _vec_angle(u, v):
    """Numerically stable angle between vectors (atan2 form)."""
    return math.atan2(np.linalg.norm(np.cross(u, v)), float(u @ v))


def angle(a, b, c) -> float:
    """M1: interior angle at vertex B (S2Measures.kt:39-44)."""
    return _vec_angle(_robust_cross(a, b), _robust_cross(c, b))


def turn_angle(a, b, c) -> float:
    """Exterior (turning) angle at B; positive for CCW turns."""
    ang = _vec_angle(_robust_cross(a, b), _robust_cross(b, c))
    return ang if pred.sign(a, b, c) > 0 else -ang


def girard_area(a, b, c) -> float:
    ab = _robust_cross(a, b)
    bc = _robust_cross(b, c)
    ac = _robust_cross(a, c)
    return max(0.0, _vec_angle(ab, ac) - _vec_angle(ab, bc) +
               _vec_angle(bc, ac))


def triangle_area(a, b, c) -> float:
    """L'Huilier with Girard fallback for skinny triangles
    (S2Measures.kt:80-135)."""
    sa = _vec_angle(b, c)
    sb = _vec_angle(c, a)
    sc = _vec_angle(a, b)
    s = 0.5 * (sa + sb + sc)
    if s >= 3e-4:
        s2 = s * s
        dmin = s - max(sa, sb, sc)
        if dmin < 1e-2 * s * s2 * s2:
            area = girard_area(a, b, c)
            if dmin < s * (0.1 * (area + 5e-15)):
                return area
    return 4.0 * math.atan(math.sqrt(max(
        0.0, math.tan(0.5 * s) * math.tan(0.5 * (s - sa)) *
        math.tan(0.5 * (s - sb)) * math.tan(0.5 * (s - sc)))))


def signed_triangle_area(a, b, c) -> float:
    return pred.sign(a, b, c) * triangle_area(a, b, c)


def loop_perimeter(vertices: np.ndarray) -> float:
    """Sum of edge lengths, radians (S2LoopMeasures.kt:49-56).  Plain
    angle accumulation — NOT chord angles, which cap at 2*pi."""
    n = len(vertices)
    if n <= 1:
        return 0.0
    total = 0.0
    for i in range(n):
        total += _vec_angle(vertices[i], vertices[(i + 1) % n])
    return total


def prune_degeneracies(vertices) -> list:
    """Remove duplicate vertices and ABA edge pairs (sibling spikes),
    including pairs wrapping across the loop start
    (S2LoopMeasures.kt:195-245).  Returns [] for a completely
    degenerate loop, else a list of vertices (rows of the input)."""
    out: list = []
    for v in vertices:
        t = tuple(v)
        if not out or t != tuple(out[-1]):
            if len(out) >= 2 and t == tuple(out[-2]):
                out.pop()
            else:
                out.append(v)
    if len(out) < 3:
        return []
    if tuple(out[0]) == tuple(out[-1]):
        out.pop()
    # ABA pairs straddling the start: loop starts with BA... and ends
    # with ...A
    k = 0
    while k + 1 < len(out) and \
            tuple(out[k + 1]) == tuple(out[len(out) - (k + 1)]):
        k += 1
    span = len(out) - 2 * k
    return [] if span < 3 else out[k:k + span]


def _order_less(o1, o2, pts) -> bool:
    """isOrderLess: lexicographic comparison of the full vertex
    sequences the two loop orders induce (S2LoopMeasures.kt)."""
    n = len(pts)
    (f1, d1), (f2, d2) = o1, o2
    if o1 == o2:
        return False
    for k in range(n):
        a = tuple(pts[(f1 + k * d1) % n])
        b = tuple(pts[(f2 + k * d2) % n])
        if a < b:
            return True
        if a > b:
            return False
    return False


def get_canonical_loop_order(vertices) -> tuple[int, int]:
    """(first, dir) such that the sequence first, first+dir, ... is
    invariant under rotation and reversal of the loop's vertex order:
    the order minimizing the vertex sequence, starting at the smallest
    vertex (S2LoopMeasures.kt:391-430)."""
    n = len(vertices)
    if n == 0:
        return (0, 1)
    min_indices = [0]
    for i in range(1, n):
        ti, tm = tuple(vertices[i]), tuple(vertices[min_indices[0]])
        if ti <= tm:
            if ti < tm:
                min_indices = []
            min_indices.append(i)
    # dir=-1 candidates carry first = index + n (reference convention:
    # the span indexes [0, 2n) so first + k*dir stays non-negative)
    best = (min_indices[0], 1)
    for mi in min_indices:
        for cand in ((mi, 1), (mi + n, -1)):
            if _order_less(cand, best, vertices):
                best = cand
    return best


_MAX_CURVATURE = 2 * math.pi - 4 * 2.22e-16


def curvature_max_error(n: int) -> float:
    """Error bound on loop_curvature / loop area for an n-vertex loop
    (S2LoopMeasures.kt:308-330)."""
    return 9.73 * 2.22e-16 * n


def loop_curvature(vertices: np.ndarray) -> float:
    """Gauss-Bonnet curvature: sum of turn angles over the
    degeneracy-pruned loop, accumulated in CANONICAL order with Kahan
    summation so the result is identical under rotation and exactly
    negated under reversal (S2LoopMeasures.kt:264-301).  Degenerate
    loops return exactly +2*pi; the full (0-vertex) loop exactly
    -2*pi; all other results clamp to +-(2*pi - 4*eps)."""
    n = len(vertices)
    if n == 0:
        return -2 * math.pi
    if n < 3:
        # empty (z>0) / full (z<0) convention of the 1-vertex loops
        return 2 * math.pi if vertices[0][2] >= 0 else -2 * math.pi
    pruned = prune_degeneracies(vertices)
    if not pruned:
        return 2 * math.pi
    first, dir_ = get_canonical_loop_order(pruned)
    n = len(pruned)
    i = first
    total = turn_angle(pruned[(i - dir_) % n], pruned[i % n],
                       pruned[(i + dir_) % n])
    comp = 0.0
    for _ in range(n - 1):
        i += dir_
        ang = turn_angle(pruned[(i - dir_) % n], pruned[i % n],
                         pruned[(i + dir_) % n])
        old = total
        ang += comp
        total += ang
        comp = (old - total) + ang
    total += comp
    return max(-_MAX_CURVATURE, min(_MAX_CURVATURE, dir_ * total))


def loop_signed_area(vertices: np.ndarray) -> float:
    """Signed surface integral over fan triangles from vertex 0, with the
    Gauss-Bonnet sign cross-check (S2LoopMeasures.kt:95-160)."""
    n = len(vertices)
    if n == 0:
        return 4 * math.pi  # reference full-loop convention (no vertices)
    if n < 3:
        if n == 1 and vertices[0][2] < 0:
            return -4 * math.pi  # full loop sentinel
        return 0.0
    area = 0.0
    for i in range(1, n - 1):
        area += signed_triangle_area(vertices[0], vertices[i],
                                     vertices[i + 1])
    area = math.remainder(area, 4 * math.pi)
    max_error = 9.73 * 2.22e-16 * n
    # near-zero signed sums are disambiguated by the Gauss-Bonnet
    # orientation: a degenerate CCW loop (curvature exactly +2*pi)
    # has area 0; otherwise disagreement between the sum's sign and
    # the curvature returns the smallest value of the correct sign,
    # so a CW degenerate loop converts to ~4*pi in loop_area
    # (S2LoopMeasures.kt:171-183; pinned by the ported
    # getAreaConsistentWithSign fixture)
    if abs(area) <= max_error:
        curv = loop_curvature(vertices)
        if area == 0.0 and curv == 0.0:
            return 0.0
        if curv == 2 * math.pi:
            return 0.0   # degenerate CCW
        if area <= 0 and curv > 0:
            return 5e-324
        if area >= 0 and curv < 0:
            return -5e-324
    return area


def loop_area(vertices: np.ndarray) -> float:
    """Positive area in [0, 4pi] (S2LoopMeasures.kt:62-67)."""
    a = loop_signed_area(vertices)
    if len(vertices) == 1 and vertices[0][2] < 0:
        return 4 * math.pi
    if a < 0:
        a += 4 * math.pi
    return a


def true_centroid_triangle(a, b, c) -> np.ndarray:
    """Area-weighted true centroid (S2Centroids.kt:87-126)."""
    angle_a = _vec_angle(b, c)
    angle_b = _vec_angle(c, a)
    angle_c = _vec_angle(a, b)
    ra = 1.0 if angle_a == 0.0 else angle_a / math.sin(angle_a)
    rb = 1.0 if angle_b == 0.0 else angle_b / math.sin(angle_b)
    rc = 1.0 if angle_c == 0.0 else angle_c / math.sin(angle_c)
    x = np.array([a[0], b[0] - a[0], c[0] - a[0]])
    y = np.array([a[1], b[1] - a[1], c[1] - a[1]])
    z = np.array([a[2], b[2] - a[2], c[2] - a[2]])
    r = np.array([ra, rb - ra, rc - ra])
    return 0.5 * np.array([float(np.cross(y, z) @ r),
                           float(np.cross(z, x) @ r),
                           float(np.cross(x, y) @ r)])


def loop_centroid(vertices: np.ndarray) -> np.ndarray:
    """Area-weighted centroid: fan sum of the SIGNED per-triangle
    centroid integrals (S2LoopMeasures.kt:336+).  true_centroid_triangle
    is already orientation-signed (antisymmetric under b<->c), so the
    terms must NOT be re-multiplied by pred.sign — doing so double-signs
    CW fan triangles, which negates the centroid of any loop enclosing
    more than a hemisphere (r6 defect, found by the random-cap fixture
    port at heights > 1; sub-hemisphere loops were unaffected because
    their vertex-0 fans are all CCW)."""
    n = len(vertices)
    out = np.zeros(3)
    for i in range(1, n - 1):
        out += true_centroid_triangle(vertices[0], vertices[i],
                                      vertices[i + 1])
    return out


def planar_centroid_triangle(a, b, c) -> np.ndarray:
    """M4: planar centroid (a+b+c)/3 (S2Centroids.kt:68)."""
    return (np.asarray(a) + np.asarray(b) + np.asarray(c)) / 3.0


def edge_true_centroid(a, b) -> np.ndarray:
    """M4: true centroid of geodesic edge AB x its length
    (S2Centroids.kt:131-153): sqrt(|a-b|^2/|a+b|^2) * (a+b); summing
    over edges gives a polyline's centroid."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    vdiff = a - b
    vsum = a + b
    sin2 = float(vdiff @ vdiff)
    cos2 = float(vsum @ vsum)
    if cos2 == 0.0:
        return np.zeros(3)
    return math.sqrt(sin2 / cos2) * vsum


def polyline_centroid(vertices: np.ndarray) -> np.ndarray:
    """Length-weighted true centroid of a polyline (sum of
    edge_true_centroid over its edges)."""
    out = np.zeros(3)
    for i in range(len(vertices) - 1):
        out += edge_true_centroid(vertices[i], vertices[i + 1])
    return out


def polygon_area(loops: list[np.ndarray]) -> float:
    """M3: multi-loop area = sum of signed loop areas (holes are
    reverse-oriented loops), normalized into [0, 4pi]
    (S2Polygon.kt:509-525)."""
    total = sum(loop_signed_area(v) for v in loops)
    while total < 0:
        total += 4 * math.pi
    while total > 4 * math.pi:
        total -= 4 * math.pi
    return total
