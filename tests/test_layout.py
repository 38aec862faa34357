"""Cell-sorted layout: partition pruning + row correctness for
cell-range scans (the Hilbert-locality storage analogue of the
reference's TreeMap index order)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from s2_geometry_kotlin_spark.kernel import cellid as ck


@pytest.fixture(scope="module")
def spark():
    from s2_geometry_kotlin_spark.session import get_spark
    s = get_spark("layout-tests", cpus=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def test_cell_range_scan_prunes_partitions(spark, tmp_path_factory):
    import __spark_entry__ as entrymod
    from s2_geometry_kotlin_spark.plans import layout as L

    out = str(tmp_path_factory.mktemp("cells_sorted"))
    geo = entrymod._geo_pages(spark, "/root/testdata/sf0.001") \
        .select("url", "lat", "lon", "cell_id")
    pcol = L.write_cell_sorted(geo, out, level=5)
    assert pcol == "cell_l5"
    full = spark.read.parquet(out)
    n_files_total = len(full.inputFiles())
    assert n_files_total > 1

    # probe: the level-7 ancestor of Paris
    paris = ck.from_latlng_deg(np.array([48.8566]), np.array([2.3522]))
    probe = int(ck.to_signed(ck.parent(paris, 7))[0])
    pruned = L.read_cell_range(spark, out, probe, level=5)
    # input_file_name over the executed scan reflects post-pruning reads
    n_files_pruned = pruned.select(
        F.input_file_name().alias("f")).distinct().count()
    assert 0 < n_files_pruned < n_files_total

    # correctness: exactly the rows whose leaf cell is inside the probe
    probe_u = probe + (1 << 64) if probe < 0 else probe
    rmin = ck.sc_range_min(probe_u)
    rmax = ck.sc_range_max(probe_u)
    rmin = rmin - (1 << 64) if rmin >= (1 << 63) else rmin
    rmax = rmax - (1 << 64) if rmax >= (1 << 63) else rmax
    # filter the materialized table (filtering the raw geo plan would
    # push the predicate through the whole cell-encode expression chain)
    expected = full.where((F.col("cell_id") >= rmin) &
                          (F.col("cell_id") <= rmax)) \
        .select("url").collect()
    got = pruned.select("url").collect()
    assert sorted(r[0] for r in got) == sorted(r[0] for r in expected)
    assert len(got) > 0

    # the partition filter reaches the scan (directory pruning, the
    # Iceberg hidden-partitioning analogue)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cell_l5" in plan
