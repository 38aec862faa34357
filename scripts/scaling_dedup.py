"""Two-parallelism scaling evidence for the DEDUP family (VERDICT r5
item 6): the 4->16 north-rule pair in scripts/scaling.py measures the
geocode+join pipeline; this runs the other shuffle-heavy family —
MinHash-LSH pair generation + connected-components cluster assignment —
over a 10x-replicated documents corpus (the heavy-duplication regime)
at two parallelism levels on identical input.

Same methodology as scaling.py: each level in its own subprocess
(fresh JVM), full-size warm-up pass, best-of-N, plus the
allocation-free JVM calibration loop bounding what the sandbox VM can
deliver between the same core counts.  Prints JSON and writes
BENCH/DEDUP_SCALING.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPL = int(os.environ.get("S2_BENCH_DEDUP_REPL", "10"))
LEVELS = [int(v) for v in
          os.environ.get("S2_SCALE_LEVELS", "4,16").split(",")]
PAIRS = [(4, 16), (8, 32)]
DOCS_PATH = os.environ.get("S2_SCALE_DOCS", "/tmp/s2_docs_scaling")


def _timed(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def materialize_docs() -> int:
    """Replicate documents REPL x with a per-replica text MUTATION
    (append a replica token), so every text is DISTINCT but replicas of
    one document stay near-duplicates (high Jaccard within the group).
    This is deliberate: with verbatim replicas the exact-fingerprint
    representative election collapses the corpus back to sf0.1 size and
    the whole job becomes latency-bound (13 s at 4 cores — a first run
    of this script measured 0.202 'efficiency' on pure scheduling
    overhead).  Distinct near-dup texts force the full shingle /
    banding / candidate-verify / propagation volume through the plan,
    which is the quantity whose scaling the north rule grades."""
    from pyspark.sql import functions as F

    from s2_geometry_kotlin_spark.session import get_spark
    spark = get_spark("dedup-scaling-setup", cpus=32,
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    (docs.withColumn("rep", F.explode(F.array(
         *[F.lit(i) for i in range(REPL)])))
     .withColumn("doc_id", F.col("doc_id") * REPL + F.col("rep"))
     .withColumn("text", F.concat_ws(" ", "text",
                                     F.concat(F.lit("zqrep"),
                                              F.col("rep"))))
     .drop("rep")
     .repartition(64)
     .write.mode("overwrite").parquet(f"{DOCS_PATH}/documents.parquet"))
    n = spark.read.parquet(f"{DOCS_PATH}/documents.parquet").count()
    spark.stop()
    return n


def run_level(cpus: int) -> dict:
    from s2_geometry_kotlin_spark.operators.components import \
        q_dedup_components
    from s2_geometry_kotlin_spark.operators.dedup import \
        q_minhash_lsh_pairs
    from s2_geometry_kotlin_spark.session import get_spark
    from scripts.scaling import _calibration

    spark = get_spark(f"dedup-scaling-{cpus}", cpus=cpus,
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    n = spark.read.parquet(f"{DOCS_PATH}/documents.parquet").count()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # full-size warm-up (JIT, Arrow buffers, first-touch page faults)
    force(q_minhash_lsh_pairs(spark, DOCS_PATH))
    reps = int(os.environ.get("S2_SCALE_REPS", "2"))
    t_pairs = min(_timed(lambda: force(
        q_minhash_lsh_pairs(spark, DOCS_PATH))) for _ in range(reps))
    force(q_dedup_components(spark, DOCS_PATH))
    t_comp = min(_timed(lambda: force(
        q_dedup_components(spark, DOCS_PATH))) for _ in range(reps))
    t_calib = _calibration(spark, cpus, reps)
    spark.stop()
    return {"cpus": cpus, "docs": n,
            "sec_pairs": round(t_pairs, 2),
            "sec_components": round(t_comp, 2),
            "sec_total": round(t_pairs + t_comp, 2),
            "sec_calib": round(t_calib, 2)}


def report(res: dict) -> None:
    def eff(small: int, big: int, key: str) -> float:
        return round((res[small][key] / res[big][key]) / (big / small), 3)

    pairs_out = {}
    for small, big in PAIRS:
        if small in res and big in res:
            pairs_out[f"{small}->{big}"] = {
                "pipeline_efficiency": eff(small, big, "sec_total"),
                "machine_ceiling": eff(small, big, "sec_calib"),
            }
    n = res[min(res)]["docs"]
    out = {"docs": n, "sf": SF_DIR, "replicate": REPL,
           "levels": res, "pairs": pairs_out}
    print(json.dumps(out))
    os.makedirs("BENCH", exist_ok=True)
    rows = "\n".join(
        f"| local[{c}], shuffle={c} | {res[c]['docs']} | "
        f"{res[c]['sec_pairs']} | {res[c]['sec_components']} | "
        f"{res[c]['sec_total']} | {res[c]['sec_calib']} |"
        for c in sorted(res))
    pair_rows = "\n".join(
        f"| {k} | {v['pipeline_efficiency']} | {v['machine_ceiling']} | "
        f"{round(v['pipeline_efficiency'] / max(1e-9, v['machine_ceiling']), 3)} |"
        for k, v in pairs_out.items())
    with open("BENCH/DEDUP_SCALING.md", "w") as f:
        f.write(f"""# BENCH — dedup-family scaling evidence (r5 item 6)

Pipeline: scan the stored {REPL}x-replicated documents table
({n} docs = sf0.1 x {REPL}; replicas carry a per-replica text mutation
so every text is DISTINCT but group members stay near-duplicates —
verbatim replicas would let the exact-dup representative election
collapse the corpus and leave a latency-bound 13-second job whose
"scaling" is pure scheduling overhead) -> MinHash banding (single
aggregation pass) -> band equi-join candidates -> candidate-only
Jaccard verify (`minhash_lsh_pairs`), then min-label propagation
(`dedup_components`).  Identical input at both parallelism levels;
each level in its own process (fresh JVM); full-size warm-up excluded;
best-of-N.  `calib (s)` is the same pure-JVM trig-loop ceiling as
BENCH/BASELINE.md.

| config | docs | pairs (s) | components (s) | total (s) | calib (s) |
|---|---|---|---|---|---|
{rows}

| pair (N -> 4N) | pipeline efficiency | machine ceiling (calib) | pipeline / ceiling |
|---|---|---|---|
{pair_rows}

**north_rule target: >= 0.8 N -> 4N** (same gate as the geocode+join
pair; the 4 -> 16 pair is the regime where the sandbox VM still
delivers linear CPU).
""")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--materialize":
        print(f"MATERIALIZED {materialize_docs()}")
        return
    if len(sys.argv) > 2 and sys.argv[1] == "--run":
        print("RESULT " + json.dumps(run_level(int(sys.argv[2]))))
        return
    here = os.path.abspath(__file__)
    cwd = os.path.dirname(os.path.dirname(here))
    setup = subprocess.run([sys.executable, here, "--materialize"],
                           capture_output=True, text=True, timeout=1800,
                           cwd=cwd)
    if "MATERIALIZED" not in setup.stdout:
        sys.stderr.write(setup.stdout[-2000:] + setup.stderr[-2000:])
        raise SystemExit("docs materialization failed")
    res = {}
    for cpus in LEVELS:
        proc = subprocess.run([sys.executable, here, "--run", str(cpus)],
                              capture_output=True, text=True,
                              timeout=3600, cwd=cwd)
        line = [ln for ln in proc.stdout.splitlines()
                if ln.startswith("RESULT ")]
        if not line:
            sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
            raise SystemExit(f"level {cpus} failed")
        res[cpus] = json.loads(line[-1][len("RESULT "):])
        print("LEVEL " + line[-1][len("RESULT "):], flush=True)
    report(res)


if __name__ == "__main__":
    sys.exit(main())
