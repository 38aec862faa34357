"""Cell metrics (E18) for the quadratic projection.

Constants from dilivia/s2/coords/S2QuadraticProjection.kt:46-67; level
selection formulas from dilivia/s2/coords/S2CellMetric.kt:48-81.
"""

from __future__ import annotations

import math

MAX_LEVEL = 30


class Metric:
    def __init__(self, deriv: float, dim: int):
        self.deriv = deriv
        self.dim = dim

    def get_value(self, level: int) -> float:
        return self.deriv * math.ldexp(1.0, -self.dim * level)

    def get_level_for_max_value(self, value: float) -> int:
        """Max level such that metric(level) <= value."""
        if value <= 0:
            return MAX_LEVEL
        _, exp = math.frexp(value / self.deriv)
        return max(0, min(MAX_LEVEL, -((exp - 1) >> (self.dim - 1))))

    def get_level_for_min_value(self, value: float) -> int:
        """Min level such that metric(level) >= value -> largest such level."""
        if value <= 0:
            return MAX_LEVEL
        _, exp = math.frexp(self.deriv / value)
        return max(0, min(MAX_LEVEL, (exp - 1) >> (self.dim - 1)))

    def get_closest_level(self, value: float) -> int:
        return self.get_level_for_max_value(
            (math.sqrt(2.0) if self.dim == 1 else 2.0) * value)


_SQRT2 = math.sqrt(2.0)

MIN_ANGLE_SPAN = Metric(4.0 / 3.0, 1)
MAX_ANGLE_SPAN = Metric(1.704897179199218452, 1)
AVG_ANGLE_SPAN = Metric(math.pi / 2, 1)

MIN_WIDTH = Metric(2.0 * _SQRT2 / 3.0, 1)
MAX_WIDTH = Metric(MAX_ANGLE_SPAN.deriv, 1)
AVG_WIDTH = Metric(1.434523672886099389, 1)

MIN_EDGE = Metric(2.0 * _SQRT2 / 3.0, 1)
MAX_EDGE = Metric(MAX_ANGLE_SPAN.deriv, 1)
AVG_EDGE = Metric(1.459213746386106062, 1)

MIN_DIAG = Metric(8.0 * _SQRT2 / 9.0, 1)
MAX_DIAG = Metric(2.438654594434021032, 1)
AVG_DIAG = Metric(2.060422738998471683, 1)

MIN_AREA = Metric(8.0 * _SQRT2 / 9.0, 2)
MAX_AREA = Metric(2.635799256963161491, 2)
AVG_AREA = Metric(4 * math.pi / 6, 2)
