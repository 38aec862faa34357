"""Cell-sorted storage layout (SURVEY.md §4.1 'Iceberg min/max stats on
cell_id give free pruning when tables are written cell-sorted').

The reference's TreeMap<S2CellId, ...> indexes read in Hilbert order;
the table-layout analogue is: partition by a coarse ancestor cell and
sort by cell_id within files.  Any cell-range predicate then prunes at
two granularities:

- partition pruning on the coarse-cell directory column (Iceberg hidden
  partitioning `truncate`/`bucket(cell_id)` on a real deployment), and
- parquet row-group min/max stats on cell_id, which are tight because
  rows are Hilbert-sorted within each file.

Cell ranges nest along the Hilbert curve, so the rows of leaf range
[rmin, rmax] live exactly in partitions
[parent(rmin, L), parent(rmax, L)] — one contiguous partition interval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import functions as s2f


def write_cell_sorted(df: DataFrame, path: str, level: int = 5) -> str:
    """Write `df` (must carry cell_id) partitioned by its level-`level`
    ancestor, Hilbert-sorted within partitions.  Returns the partition
    column name."""
    pcol = f"cell_l{level}"
    out = df.withColumn(pcol, s2f.cell_parent(F.col("cell_id"), level))
    (out.repartition(F.col(pcol))
        .sortWithinPartitions("cell_id")
        .write.partitionBy(pcol).mode("overwrite").parquet(path))
    return pcol


def read_cell_range(spark: SparkSession, path: str, cell: int,
                    level: int = 5) -> DataFrame:
    """Scan only the rows whose cell_id is contained by `cell` (signed
    int64 bit pattern): partition-prunes to the ancestor interval and
    row-group-prunes via the sorted cell_id stats."""
    lsb = 1 << (2 * (30 - _cell_level(cell)))
    rmin = cell - (lsb - 1)
    rmax = cell + (lsb - 1)
    plsb = 1 << (2 * (30 - level))
    pmask = ~(2 * plsb - 1)
    p_lo = (rmin & pmask) | plsb
    p_hi = (rmax & pmask) | plsb
    pcol = f"cell_l{level}"
    return (spark.read.parquet(path)
            .where((F.col(pcol) >= F.lit(p_lo)) &
                   (F.col(pcol) <= F.lit(p_hi)) &
                   (F.col("cell_id") >= F.lit(rmin)) &
                   (F.col("cell_id") <= F.lit(rmax))))


def _cell_level(cell: int) -> int:
    u = cell + (1 << 64) if cell < 0 else cell
    return 30 - ((u & -u).bit_length() - 1) // 2
