"""B4: S2PolylineSimplifier — tolerance-based greedy polyline
simplification (region/S2PolylineSimplifier.kt).

Maintains a window of acceptable bearings (an S1Interval in the tangent
space of the current source vertex): an output edge src→dst is valid iff
its bearing lies in the window, and each targeted disc narrows the
window so the edge is guaranteed (conservatively, with the reference's
error bounds) to pass within `radius` of the disc center
(S2PolylineSimplifier.kt:126-148 targetDisc, :166-183 avoidDisc).

`simplify_polyline` drives it with the reference's documented loop
(S2PolylineSimplifier.kt:36-50): extend the current edge while every
original vertex stays within tolerance, else emit and restart — the
tolerance-true upgrade of S2Polyline.subsampleVertices
(S2Polyline.kt:421, kernel/polyline.py:109), used to thin route layers
before the edge-table build.
"""

from __future__ import annotations

import math

import numpy as np

from .regions import LngInterval

DBL_ERR = 2.220446049250313e-16 / 2  # 0.5 * DBL_EPSILON (rounding unit)


def _chord2(a: np.ndarray, b: np.ndarray) -> float:
    d = a - b
    return min(4.0, float(d @ d))


class PolylineSimplifier:
    """Port of the reference's window algebra; angles measured in the
    tangent basis at src (S2PolylineSimplifier.kt:76-106 init)."""

    def init(self, src: np.ndarray) -> None:
        self.src = np.asarray(src, dtype=np.float64)
        self.window = LngInterval.full()
        s = self.src
        t = np.abs(s)
        i = (0 if t[0] < t[2] else 2) if t[0] < t[1] else \
            (1 if t[1] < t[2] else 2)
        j = 0 if i == 2 else i + 1
        k = 2 if i == 0 else i - 1
        y = np.zeros(3)
        y[j] = s[k]
        y[k] = -s[j]
        x = np.empty(3)
        x[i] = s[j] * s[j] + s[k] * s[k]
        x[j] = -s[j] * s[i]
        x[k] = -s[k] * s[i]
        self.x_dir = x
        self.y_dir = y

    def _angle(self, p: np.ndarray) -> float:
        return math.atan2(float(p @ self.y_dir), float(p @ self.x_dir))

    def _semiwidth(self, p: np.ndarray, radius2: float,
                   round_direction: int) -> float:
        """sin(semiwidth) = sin(r)/sin(a) via squared chord lengths,
        with the reference's conservative error inflation
        (S2PolylineSimplifier.kt:188-265)."""
        err = DBL_ERR
        r2 = radius2
        a2 = _chord2(self.src, p)
        a2 -= 64 * err * err * round_direction
        if a2 <= r2:
            return math.pi  # disc contains src
        sin2_r = r2 * (1 - 0.25 * r2)
        sin2_a = a2 * (1 - 0.25 * a2)
        semiwidth = math.asin(math.sqrt(sin2_r / sin2_a))
        error = (2 * 10 + 4) * err + 17 * err * semiwidth
        return semiwidth + round_direction * error

    def extend(self, dst: np.ndarray) -> bool:
        """True iff edge (src, dst) satisfies all targeting constraints;
        edges longer than 90 degrees are unsupported."""
        if _chord2(self.src, dst) > 2.0:  # S1ChordAngle.right().length2
            return False
        return self.window.contains(self._angle(dst))

    def target_disc(self, point: np.ndarray, radius_rad: float) -> bool:
        """Require the output edge to pass through the disc
        (point, radius)."""
        r = 2.0 * math.sin(0.5 * min(math.pi, radius_rad))
        semiwidth = self._semiwidth(point, r * r, -1)
        if semiwidth >= math.pi:
            return True
        if semiwidth < 0:
            self.window = LngInterval.empty()
            return False
        center = self._angle(point)
        target = LngInterval.from_point(center).expanded(semiwidth)
        self.window = self.window.intersection(target)
        return not self.window.is_empty()

    def avoid_disc(self, point: np.ndarray, radius_rad: float,
                   disc_on_left: bool) -> bool:
        """Require the output edge to avoid the disc, passing it on the
        given side (preserves topology wrt nearby features)."""
        r = 2.0 * math.sin(0.5 * min(math.pi, radius_rad))
        semiwidth = self._semiwidth(point, r * r, 1)
        if semiwidth >= math.pi:
            self.window = LngInterval.empty()
            return False
        center = self._angle(point)
        opposite = center - math.pi if center > 0 else center + math.pi
        target = (LngInterval(opposite, center) if disc_on_left
                  else LngInterval(center, opposite))
        self.window = self.window.intersection(target.expanded(-semiwidth))
        return not self.window.is_empty()


def simplify_polyline(vertices: np.ndarray,
                      tolerance_rad: float) -> list[int]:
    """Indices of a simplified vertex chain: every ORIGINAL vertex stays
    within tolerance of the output edge that replaces it (the
    edge-chain driving loop documented at S2PolylineSimplifier.kt:36-50;
    endpoints restricted to original vertices)."""
    v = np.asarray(vertices, dtype=np.float64)
    n = len(v)
    if n <= 2:
        return list(range(n))
    s = PolylineSimplifier()
    out = [0]
    s.init(v[0])
    for i in range(1, n):
        if not s.extend(v[i]):
            # guard: if extend() fails on the very first candidate after
            # a restart (edge longer than 90°), i-1 is already the last
            # emitted vertex — appending again would duplicate it
            if out[-1] != i - 1:
                out.append(i - 1)
            s.init(v[i - 1])
        s.target_disc(v[i], tolerance_rad)
    if out[-1] != n - 1:
        out.append(n - 1)
    return out
