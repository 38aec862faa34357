"""Run the full oracle board (every queries() entry vs its DuckDB
oracle) at sf0.1 — VERDICT r4 item 3: promote 'correct at fixture
scale' to 'correct at bench scale'.  Writes BOARD_SF01.json.

Usage: python scripts/board_sf01.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_name = sys.argv[2] if len(sys.argv) > 2 else "BOARD_SF01.json"
    os.environ["S2_TEST_SF_DIR"] = sf_dir
    import duckdb
    import pandas as pd

    import __spark_entry__ as e
    from s2_geometry_kotlin_spark.session import get_spark
    spark = get_spark("board-sf01", cpus=16, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs, oq = e.queries(), e.oracle_sql()
    report = {"sf_dir": sf_dir, "n_queries": len(qs), "rows": {}}
    n_pass = 0
    for name in sorted(qs):
        t0 = time.time()
        row = {}
        try:
            got = qs[name](spark, sf_dir).toPandas()
            cols = sorted(got.columns)
            got = got[cols].sort_values(cols).reset_index(drop=True)
            row["spark_rows"] = int(len(got))
            if name in oq:
                exp = con.execute(oq[name]).fetchdf()
                exp = exp[sorted(exp.columns)]
                exp = exp.sort_values(sorted(exp.columns))
                exp = exp.reset_index(drop=True)
                row["oracle_rows"] = int(len(exp))
                if sorted(exp.columns) != cols:
                    row["status"] = "schema_mismatch"
                else:
                    exp = exp[cols].astype(got.dtypes.to_dict())
                    eq = got.equals(exp)
                    if not eq:
                        # float-tolerant fallback (driver hashes at
                        # rounded precision)
                        try:
                            pd.testing.assert_frame_equal(
                                got, exp, check_exact=False, rtol=1e-9,
                                atol=1e-12)
                            eq = True
                        except AssertionError:
                            eq = False
                    row["status"] = "pass" if eq else "value_mismatch"
            else:
                row["status"] = "rows_only"
        except Exception as ex:   # noqa: BLE001 — report, don't abort
            row["status"] = f"err: {type(ex).__name__}: {ex}"[:200]
        row["secs"] = round(time.time() - t0, 2)
        if row.get("status") in ("pass", "rows_only"):
            n_pass += 1
        report["rows"][name] = row
        print(name, row.get("status"), row.get("spark_rows"),
              f"{row['secs']}s", flush=True)
    report["n_pass"] = n_pass
    with open(os.path.join(REPO, out_name), "w") as f:
        json.dump(report, f, indent=1)
    print(f"{n_pass}/{len(qs)} pass -> {out_name}")
    spark.stop()


if __name__ == "__main__":
    main()
