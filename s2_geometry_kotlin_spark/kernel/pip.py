"""Vectorized point-in-polygon crossing-parity kernel (P4/P5).

The distributed PIP join predicate: after the covering prejoin, batches of
candidate points are tested against a loop with crossing parity from the
fixed origin — the same convention as the reference's bruteForceContains
(dilivia/s2/region/S2Loop.kt:981-998) with edgeOrVertexCrossing tie-breaks
(SEMI_OPEN vertex model, S2ContainsPointQuery.kt:44).

The hot path is numpy: for m points x n edges the crossing test needs three
determinant families, two of which are matrix products.  Entries where the
float triage is uncertain (|det| <= 1.8274*eps) or where a query point
coincides with a loop vertex escalate to the exact scalar predicates in
predicates.py — mask-escalation, never a python loop over all rows.
"""

from __future__ import annotations

import numpy as np

from . import predicates as pred


def _close_ring(vertices: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """edge arrays (C, D): C[i]=v_i, D[i]=v_{i+1 mod n}."""
    c = vertices
    d = np.roll(vertices, -1, axis=0)
    return c, d


def loop_contains_points(vertices: np.ndarray, points: np.ndarray,
                         origin_inside: bool) -> np.ndarray:
    """bool[m]: crossing parity from ORIGIN for each point.

    vertices: (n,3) float64 unit vectors, CCW interior-left.
    points:   (m,3) float64 unit vectors.
    """
    n = len(vertices)
    m = len(points)
    if n < 3:
        return np.full(m, origin_inside)
    a = pred.ORIGIN
    c, d = _close_ring(vertices)

    # s1[j, i] = triage sign(A, P_j, V_i) ; reused for edge endpoints
    a_cross_p = np.cross(a[None, :], points)            # (m,3)
    det1 = a_cross_p @ vertices.T                       # (m,n)
    s1 = pred.triage_sign_dets(det1)
    s1c = s1                                            # sign(A,P,C_i)
    s1d = np.roll(s1, -1, axis=1)                       # sign(A,P,D_i)

    # s2[i] = sign(C_i, D_i, A);  s3[j, i] = sign(C_i, D_i, P_j)
    e = np.cross(c, d)                                  # (n,3)
    s2 = pred.triage_sign_dets(e @ a)                   # (n,)
    s3 = pred.triage_sign_dets(points @ e.T)            # (m,n)

    # interior crossing iff with t = -sign(A,P,C):
    #   sign(A,P,D) == t and -sign(C,D,P) == t and sign(C,D,A) == t
    t = -s1c
    crossing = (s1d == t) & (-s3 == t) & (s2[None, :] == t) & (t != 0)

    # escalation mask: any uncertain triage among the four signs, or any
    # exact vertex coincidence P == C or P == D
    uncertain = (s1c == 0) | (s1d == 0) | (s3 == 0) | (s2[None, :] == 0)
    eq_c = np.all(points[:, None, :] == c[None, :, :], axis=2)
    eq_d = np.all(points[:, None, :] == d[None, :, :], axis=2)
    needs_exact = uncertain | eq_c | eq_d
    # also: P == ORIGIN or P == -anything degenerate resolves in scalar path

    if needs_exact.any():
        js, iss = np.nonzero(needs_exact)
        for j, i in zip(js.tolist(), iss.tolist()):
            crossing[j, i] = pred.edge_or_vertex_crossing(
                a, points[j], c[i], d[i])

    parity = np.bitwise_xor.reduce(crossing, axis=1)
    return parity ^ origin_inside


def compute_origin_inside(vertices: np.ndarray) -> bool:
    """Bootstrap the originInside flag (S2Loop.kt:874-912).

    A loop with consecutive vertices A,B,C contains vertex B iff
    ortho(B) is inside the wedge ABC (closed at A, open at C).
    """
    n = len(vertices)
    if n < 3:
        if n == 1 and _is_empty_or_full(vertices[0]):
            return bool(vertices[0][2] < 0)
        return False
    v0, v1, v2 = vertices[0], vertices[1], vertices[2]
    v1_inside = pred.ordered_ccw(pred.ortho(v1), v0, v2, v1)
    contains_v1 = bool(loop_contains_points(
        vertices, v1[None, :], origin_inside=False)[0])
    return v1_inside != contains_v1


def _is_empty_or_full(v: np.ndarray) -> bool:
    return abs(abs(float(v[2])) - 1.0) < 1e-12 and \
        abs(float(v[0])) < 1e-12 and abs(float(v[1])) < 1e-12


def polygon_contains_points(loops: list[np.ndarray],
                            points: np.ndarray) -> np.ndarray:
    """Multi-loop polygon containment: xor of per-loop parity
    (S2Polygon.kt:1357-1376)."""
    out = np.zeros(len(points), dtype=bool)
    for verts in loops:
        oi = compute_origin_inside(verts)
        out ^= loop_contains_points(verts, points, oi)
    return out
