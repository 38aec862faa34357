"""Mimics the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB over the same parquet, compare
row count, column names, and order-insensitive values."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

import os
SF_DIR = os.environ.get("S2_TEST_SF_DIR", "/root/testdata/sf0.001")
# oracles whose SQL embeds data-derived constants (IVF centroids) read
# this env var to train on the same sf the queries run against
os.environ["S2_TEST_SF_DIR"] = SF_DIR

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="session")
def spark():
    from s2_geometry_kotlin_spark.session import get_spark
    s = get_spark("contract-tests", cpus=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for col in df.columns:
        if df[col].dtype == object and len(df) and \
                isinstance(df[col].iloc[0], (bytes, bytearray)):
            df[col] = df[col].map(bytes)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(name, spark, duck):
    oracles = entrymod.oracle_sql()
    if name not in oracles:
        pytest.skip("rows-only query (no SQL oracle)")
    got = _canon(entrymod.queries()[name](spark, SF_DIR).toPandas())
    exp = _canon(duck.execute(oracles[name]).fetchdf())
    assert list(got.columns) == list(exp.columns), \
        f"{name}: columns {list(got.columns)} != {list(exp.columns)}"
    assert len(got) == len(exp), f"{name}: {len(got)} vs {len(exp)} rows"
    for col in got.columns:
        g, e = got[col], exp[col]
        # The driver hashes rendered values, so an int column on one side
        # and a float column on the other ("1" vs "1.0") is a mismatch even
        # when values are numerically equal.  Mirror that: numeric kinds
        # must agree (int-family with int-family, float with float).
        numeric = set("iuf")
        if g.dtype.kind in numeric and e.dtype.kind in numeric:
            gk = "i" if g.dtype.kind in "iu" else "f"
            ek = "i" if e.dtype.kind in "iu" else "f"
            assert gk == ek, \
                f"{name}.{col} dtype-kind mismatch: {g.dtype} vs {e.dtype}"
        if g.dtype.kind == "f" or e.dtype.kind == "f":
            assert np.allclose(g.astype(float), e.astype(float),
                               rtol=0, atol=0, equal_nan=True), \
                f"{name}.{col} float mismatch"
        else:
            if g.dtype != e.dtype:
                g = g.astype(str)
                e = e.astype(str)
            assert (g == e).all(), f"{name}.{col} mismatch"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.count()
    assert rows >= 0
    assert df.columns


# Round 6 regression guards for the r5 driver-board truncation: the
# driver checks at most the FIRST 50 registered queries (r5 registered
# 52 and positions 51-52 silently got no CORRECTNESS row), and any
# query without an oracle_sql entry only gets a weak rows-only check.
DRIVER_BOARD_CAP = 50


def test_registry_fits_driver_cap():
    assert len(entrymod.queries()) <= DRIVER_BOARD_CAP, (
        "queries() exceeds the driver's 50-row correctness board; "
        "consolidate rows (see the registry comment) or the tail gets "
        "no CORRECTNESS row")


def test_every_query_has_value_oracle():
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert q == o, (f"registry/oracle mismatch: missing oracles "
                    f"{sorted(q - o)}, orphan oracles {sorted(o - q)}")
