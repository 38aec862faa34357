"""M7 edge clipping + M8 edge intersection + M4 centroid kernels
(edge/S2EdgeClipping.kt, S2EdgeCrossings.kt:241-306, S2Centroids.kt)."""

import math

import numpy as np

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel import clipping as clip
from s2_geometry_kotlin_spark.kernel import edges as ek
from s2_geometry_kotlin_spark.kernel import measures


def _pt(lat, lon):
    x, y, z = ck.latlng_deg_to_xyz(np.array([lat]), np.array([lon]))
    return np.array([x[0], y[0], z[0]])


def test_face_segments_same_face():
    segs = clip.get_face_segments(_pt(10, 10), _pt(20, 20))
    assert len(segs) == 1 and segs[0][0] == 0


def test_face_segments_cross_faces():
    # equator edge spanning faces 0 -> 1 (lon 40 -> 130)
    a, b = _pt(0, 40), _pt(0, 130)
    segs = clip.get_face_segments(a, b)
    assert [s[0] for s in segs] == [0, 1]
    # continuity: exit of seg k and entry of seg k+1 are the same xyz
    for (f1, _, e1), (f2, s2, _) in zip(segs, segs[1:]):
        x1 = np.array(ck.sc_face_uv_to_xyz(f1, float(e1[0]), float(e1[1])))
        x2 = np.array(ck.sc_face_uv_to_xyz(f2, float(s2[0]), float(s2[1])))
        x1 /= np.linalg.norm(x1)
        x2 /= np.linalg.norm(x2)
        assert np.allclose(x1, x2, atol=1e-12)
    # endpoints preserved exactly
    assert np.allclose(segs[0][1], clip.face_xyz_to_uvw(0, a)[:2] /
                       clip.face_xyz_to_uvw(0, a)[2], atol=1e-15)


def test_face_segments_long_edge():
    # 3 faces: lon 10 -> 200 crosses 0, 1, 2/3 region
    segs = clip.get_face_segments(_pt(0, 10), _pt(0, 200))
    assert len(segs) >= 3
    faces = [s[0] for s in segs]
    assert faces[0] == 0 and len(set(faces)) == len(faces)


def test_clip_to_padded_face():
    a, b = _pt(0, 40), _pt(0, 130)
    r0 = clip.clip_to_padded_face(a, b, 0)
    r1 = clip.clip_to_padded_face(a, b, 1)
    assert r0 is not None and r1 is not None
    # clipped endpoints stay in the padded square
    for auv, buv in (r0, r1):
        assert max(abs(auv[0]), abs(auv[1])) <= 1 + 1e-12
        assert max(abs(buv[0]), abs(buv[1])) <= 1 + 1e-12
    # faces not touched by the edge are rejected
    assert clip.clip_to_padded_face(a, b, 3) is None
    # back faces rejected for a short edge
    assert clip.clip_to_padded_face(_pt(10, 10), _pt(20, 20), 3) is None


def test_clip_edge_2d():
    got = clip.clip_edge((-2.0, 0.0), (2.0, 1.0), (-1.0, 1.0), (-1.0, 1.0))
    assert got is not None
    (a, b) = got
    assert a[0] == -1.0 and b[0] == 1.0
    assert abs(a[1] - 0.25) < 1e-15 and abs(b[1] - 0.75) < 1e-15
    assert clip.clip_edge((-2.0, 5.0), (2.0, 5.0),
                          (-1.0, 1.0), (-1.0, 1.0)) is None


def test_edge_intersection():
    a, b = _pt(-10, 0), _pt(10, 0)
    c, d = _pt(0, -10), _pt(0, 10)
    p = ek.edge_intersection(a, b, c, d)
    assert abs(np.linalg.norm(p) - 1) < 1e-14
    # the crossing of these two edges is (lat 0, lon 0)
    assert np.allclose(p, _pt(0, 0), atol=1e-14)
    # intersection lies on both great circles
    assert abs(float(np.cross(a, b) @ p)) < 1e-14
    assert abs(float(np.cross(c, d) @ p)) < 1e-14
    # skewed crossing
    a, b = _pt(-5, -3), _pt(7, 4)
    c, d = _pt(-4, 5), _pt(6, -6)
    p = ek.edge_intersection(a, b, c, d)
    assert abs(float(np.cross(a, b) @ p)) < 1e-13
    assert abs(float(np.cross(c, d) @ p)) < 1e-13
    # on the front side of both edges
    assert float(p @ (a + b)) > 0 and float(p @ (c + d)) > 0


def test_centroids():
    a, b = _pt(0, 0), _pt(0, 90)
    c = measures.edge_true_centroid(a, b)
    # direction: midpoint of the edge; magnitude 2*sin(theta/2)... the
    # length-weighted centroid integrates to sin(theta/2)*2 along (a+b)^
    mid = (a + b) / np.linalg.norm(a + b)
    cn = c / np.linalg.norm(c)
    assert np.allclose(cn, mid, atol=1e-14)
    # degenerate edge -> zero vector is NOT produced (a==b gives vsum ok)
    z = measures.edge_true_centroid(a, -a)
    assert np.allclose(z, 0.0)
    # polyline centroid of a symmetric path lies on the symmetry plane
    pc = measures.polyline_centroid(np.stack([_pt(0, -30), _pt(0, 0),
                                              _pt(0, 30)]))
    lat, lon = ck.xyz_to_latlng_deg(pc[0], pc[1], pc[2])
    assert abs(float(lon)) < 1e-12 and abs(float(lat)) < 1e-12
    # planar centroid
    g = measures.planar_centroid_triangle(a, b, _pt(90, 0))
    assert np.allclose(g, (a + b + _pt(90, 0)) / 3.0)
