"""Koch-snowflake fractal loop generator — the reference's hardest
stress shape for kNN / PIP / boolean suites (Fractal.kt:35-226,
used by FractalLoopShapeIndexFactory).

The fractal starts from an equilateral triangle in the tangent plane
at the loop center and recursively subdivides each edge into four
segments; the fractal dimension controls the subdivision offsets
(edge_fraction = 4^(-1/dim), offset_fraction = sqrt(edge_fraction -
1/4), Fractal.kt:186-189).  Multi-level fractals stop subdividing a
sub-edge early with equal probability per level (Fractal.kt:203-207).
Drawing in the tangent plane and projecting to the sphere avoids
self-intersections (Fractal.kt:160-166)."""

from __future__ import annotations

import math
import random

import numpy as np

KOCH_DIMENSION = math.log(4.0) / math.log(3.0)   # ~1.26


class Fractal:
    def __init__(self, max_level: int, min_level: int = -1,
                 dimension: float = KOCH_DIMENSION,
                 seed: int = 0):
        if max_level < 0 or not (1.0 <= dimension < 2.0):
            raise ValueError("max_level >= 0 and dimension in [1, 2)")
        self.max_level = max_level
        self.min_level = min_level if 0 <= min_level <= max_level \
            else max_level
        self.dimension = dimension
        self.rng = random.Random(seed)
        self.edge_fraction = 4.0 ** (-1.0 / dimension)
        self.offset_fraction = math.sqrt(self.edge_fraction - 0.25)

    def min_radius_factor(self) -> float:
        """Fractal.kt:123-146: lower bound on (min boundary distance
        from center) / nominal radius, in the tangent plane."""
        k_min_dim = 1.0852230903040407
        if self.dimension >= k_min_dim:
            e = self.edge_fraction
            return math.sqrt(1 + 3 * e * (e - 1))
        return 0.5

    def max_radius_factor(self) -> float:
        """Fractal.kt:148-157."""
        return max(1.0, self.offset_fraction * math.sqrt(3.0) + 0.5)

    def _r2_vertices(self) -> list:
        s3 = math.sqrt(3.0) / 2.0
        v0 = np.array([1.0, 0.0])
        v1 = np.array([-0.5, s3])
        v2 = np.array([-0.5, -s3])
        out: list = []
        self._helper(v0, v1, 0, out)
        self._helper(v1, v2, 0, out)
        self._helper(v2, v0, 0, out)
        return out

    def _helper(self, v0, v4, level, out):
        if level >= self.min_level and \
                self.rng.randrange(self.max_level - level + 1) == 0:
            out.append(v0)
            return
        d = v4 - v0
        ortho = np.array([-d[1], d[0]])   # R2Vector.ortho (CCW 90)
        v1 = v0 + self.edge_fraction * d
        v2 = 0.5 * (v0 + v4) - self.offset_fraction * ortho
        v3 = v4 - self.edge_fraction * d
        self._helper(v0, v1, level + 1, out)
        self._helper(v1, v2, level + 1, out)
        self._helper(v2, v3, level + 1, out)
        self._helper(v3, v4, level + 1, out)

    def make_loop_vertices(self, center_lat: float, center_lng: float,
                           nominal_radius_rad: float) -> np.ndarray:
        """Fractal loop vertices on the sphere, centered at the given
        lat/lng (degrees), first vertex toward local east
        (makeLoop, Fractal.kt:160-176)."""
        phi, lam = math.radians(center_lat), math.radians(center_lng)
        z = np.array([math.cos(phi) * math.cos(lam),
                      math.cos(phi) * math.sin(lam), math.sin(phi)])
        x = np.array([-math.sin(lam), math.cos(lam), 0.0])  # east
        y = np.cross(z, x)                                  # north
        r = nominal_radius_rad
        pts = []
        for v in self._r2_vertices():
            p = v[0] * r * x + v[1] * r * y + z
            pts.append(p / np.linalg.norm(p))
        return np.asarray(pts)
