"""B3 as a Spark operator: constructive polygon boolean ops feeding the
spatial join.

S2BooleanOperation (index/shape/S2BooleanOperation.kt:191-229,429) is a
LAYER-PREP step in the engine: polygon layers are broadcast-sized by
design (the 100-TB side is the pages table), so the construction itself
runs driver-side on the kernel (kernel/booleanop.py) and the result is
shipped to executors exactly like any other layer — covering prejoin +
PIP verify.  The oracle for each query proves the construction against
the DEFINITION: pages contained in A op B must equal the boolean
combination of the independent PIP verdicts against the operands A and B
(computed in DuckDB with the shared crossing-parity SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernel.booleanop import polygon_boolean
from ..kernel.regions import Polygon


def operand_pairs() -> list[tuple[Polygon, Polygon]]:
    """Deterministic fixture operand pairs covering the interesting
    regimes: proper boundary crossings (Paris/London lens), hole +
    no-crossing nesting (donut vs metro), and disjoint."""
    from ..sources.layers import fixture_layer
    # index by (layer name, order of appearance)
    named: dict[str, list[Polygon]] = {}
    for lname, _, poly in fixture_layer():
        named.setdefault(lname, []).append(poly)
    paris_core = named["city_core"][0]       # CITIES[0] = Paris
    paris_metro = named["city_metro"][0]
    london_metro = named["city_metro"][4]    # CITIES[4] = London
    sydney_metro = named["city_metro"][5]    # CITIES[5] = Sydney
    donut = named["city_donut"][0]
    return [
        (paris_metro, london_metro),   # lens (proper crossings)
        (donut, paris_metro),          # hole + nesting, no crossings
        (paris_metro, sydney_metro),   # disjoint
        (paris_core, paris_metro),     # full containment: A inside B, so
                                       # A∩B = A lands on the page-dense
                                       # core (non-zero driver evidence)
    ]


def operand_layer() -> list[tuple[str, int, Polygon]]:
    """Operands flattened for the oracle's pipjoin: pair k's polygons
    get ids 2k (A) and 2k+1 (B)."""
    out = []
    for k, (a, b) in enumerate(operand_pairs()):
        out.append(("boolop", 2 * k, a))
        out.append(("boolop", 2 * k + 1, b))
    return out


_RESULT_CACHE: dict[str, list] = {}


def result_layer(op: str) -> list[tuple[str, int, Polygon]]:
    """(op, pair_id, A op B) for every pair whose result is non-empty
    (an empty region simply contributes no join rows, matching the
    oracle)."""
    cached = _RESULT_CACHE.get(op)
    if cached is not None:
        return cached
    out = []
    for k, (a, b) in enumerate(operand_pairs()):
        res = polygon_boolean(a, b, op)
        if res.loops:
            out.append((op, k, res))
    _RESULT_CACHE[op] = out
    return out


def pages_in_boolean(pages: DataFrame, spark: SparkSession,
                     op: str) -> DataFrame:
    """(url, pair_id) for pages contained in A op B, per operand pair —
    the constructed polygon goes through the standard covering-prejoin
    broadcast spatial join (the pages side never reshuffles)."""
    from .spatial_join import spatial_join
    joined = spatial_join(pages, spark, result_layer(op),
                          strategy="broadcast")
    return joined.select("url",
                         F.col("polygon_id").cast("long").alias("pair_id"))


def boolean_oracle_select(op: str) -> str:
    """SQL over the `pipjoin(url, layer, polygon_id)` CTE built from
    operand_layer(): membership in the boolean result by DEFINITION."""
    if op == "intersection":
        return ("SELECT p1.url AS url, "
                "CAST(p1.polygon_id // 2 AS BIGINT) AS pair_id "
                "FROM pipjoin p1 JOIN pipjoin p2 ON p1.url = p2.url "
                "AND p2.polygon_id = p1.polygon_id + 1 "
                "WHERE p1.polygon_id % 2 = 0")
    if op == "union":
        return ("SELECT DISTINCT url, "
                "CAST(polygon_id // 2 AS BIGINT) AS pair_id FROM pipjoin")
    if op == "difference":
        return ("SELECT p1.url AS url, "
                "CAST(p1.polygon_id // 2 AS BIGINT) AS pair_id "
                "FROM pipjoin p1 WHERE p1.polygon_id % 2 = 0 "
                "AND NOT EXISTS (SELECT 1 FROM pipjoin p2 "
                "WHERE p2.url = p1.url "
                "AND p2.polygon_id = p1.polygon_id + 1)")
    if op == "symmetric_difference":
        return ("SELECT url, CAST(polygon_id // 2 AS BIGINT) AS pair_id "
                "FROM pipjoin GROUP BY 1, 2 HAVING COUNT(*) = 1")
    raise ValueError(op)
