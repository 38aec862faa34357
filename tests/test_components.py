"""Connected-components dedup clustering: DataFrame loop vs known
graphs and the recursive-SQL oracle shape."""

import pytest


@pytest.fixture(scope="module")
def spark():
    from s2_geometry_kotlin_spark.session import get_spark
    s = get_spark("components-tests", cpus=4, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def _run(spark, pairs):
    from s2_geometry_kotlin_spark.operators.components import \
        connected_components
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    return {r["node"]: r["comp"]
            for r in connected_components(df).collect()}


def test_chain_clique_and_pair(spark):
    # chain 1-2-3-4, clique {10,11,12}, pair {20,21}
    pairs = [(1, 2), (2, 3), (3, 4),
             (10, 11), (10, 12), (11, 12),
             (20, 21)]
    got = _run(spark, pairs)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10, 12: 10,
                   20: 20, 21: 20}


def test_long_chain_converges(spark):
    # worst-case diameter for min-label propagation, labels flow from
    # the low end; still bounded by MAX_ROUNDS
    n = 12
    pairs = [(i, i + 1) for i in range(n)]
    got = _run(spark, pairs)
    assert set(got.values()) == {0}


def test_long_chain_converges_in_log_rounds(spark):
    """Pointer jumping (r6 item 3): a 60-node descending-id path has
    diameter 59 — plain min-label propagation needed 59 rounds (it
    raised at the 25-round default budget before the jump step); with
    per-round label shortcutting it converges well inside the budget."""
    from s2_geometry_kotlin_spark.operators.components import \
        connected_components
    n = 60
    ids = list(range(n - 1, -1, -1))
    pairs = [(ids[i], ids[i + 1]) for i in range(n - 1)]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {(r["node"], r["comp"])
           for r in connected_components(df).collect()}
    assert got == {(i, 0) for i in range(n)}


def test_oracle_sql_matches_on_synthetic_pairs():
    """The recursive-CTE closure agrees with the loop's semantics on a
    hand-built graph (checked in DuckDB without Spark)."""
    import duckdb
    sql = """WITH RECURSIVE pairs AS (
  SELECT * FROM (VALUES (1, 2), (2, 3), (10, 11)) t(doc_a, doc_b)
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v
)
SELECT n.u AS doc_id, CAST(LEAST(n.u, MIN(r.v)) AS BIGINT) AS c
FROM (SELECT DISTINCT u FROM edges) n
LEFT JOIN reach r ON r.u = n.u GROUP BY 1 ORDER BY 1"""
    got = {r[0]: r[1] for r in duckdb.sql(sql).fetchall()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_star_matches_propagation_on_clustered_graph(spark):
    """large/small-star and min-label propagation agree on a typical
    dedup-shaped graph (several near-cliques + isolated pairs)."""
    import random

    from s2_geometry_kotlin_spark.operators.components import (
        connected_components, connected_components_star)
    rng = random.Random(7)
    pairs = []
    base = 0
    for size in (5, 8, 3, 2, 6):
        nodes = list(range(base, base + size))
        for i in range(1, size):
            pairs.append((nodes[i], nodes[rng.randrange(i)]))
        for _ in range(size):
            a, b = rng.sample(nodes, 2)
            pairs.append((a, b))
        base += size + 3  # gaps -> ids not contiguous
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    plain = {(r["node"], r["comp"])
             for r in connected_components(df).collect()}
    star = {(r["node"], r["comp"])
            for r in connected_components_star(df).collect()}
    assert plain == star
    assert len(plain) > 0


def test_star_handles_long_chain_and_budget_fails_loud(spark):
    """A 60-node path has diameter 59: an insufficient round budget must
    raise (loud failure, by design — silent non-convergence would split
    clusters); the star contraction converges in O(log^2 n) rounds and
    labels the whole chain with its minimum id."""
    import pytest

    from s2_geometry_kotlin_spark.operators.components import (
        connected_components, connected_components_star)
    n = 60
    # descending ids along the path maximize propagation rounds
    ids = list(range(n - 1, -1, -1))
    pairs = [(ids[i], ids[i + 1]) for i in range(n - 1)]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_rounds=2)
    got = {(r["node"], r["comp"])
           for r in connected_components_star(df, max_rounds=12).collect()}
    assert got == {(i, 0) for i in range(n)}

def test_star_advice_r4_premature_fixpoint(spark):
    """ADVICE r4 repro: pairs {(4,5),(4,9),(3,5),(2,9)} form ONE
    component {2,3,4,5,9}; the old fixpoint test (only "no target is a
    source") exited while node 4 still held edges to two sink labels,
    emitting node 4 twice with comps 2 and 3."""
    from s2_geometry_kotlin_spark.operators.components import (
        connected_components, connected_components_star)
    pairs = [(4, 5), (4, 9), (3, 5), (2, 9)]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    star = sorted((r["node"], r["comp"])
                  for r in connected_components_star(df).collect())
    plain = sorted((r["node"], r["comp"])
                   for r in connected_components(df).collect())
    assert star == plain == [(2, 2), (3, 2), (4, 2), (5, 2), (9, 2)]
    # exactly one row per node — no duplicate labels
    assert len({n for n, _ in star}) == len(star)


def test_star_keeps_self_pair_only_nodes(spark):
    """A node appearing only in self-pairs must still get a self-label
    (parity with connected_components)."""
    from s2_geometry_kotlin_spark.operators.components import (
        connected_components, connected_components_star)
    pairs = [(1, 2), (7, 7)]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    star = {(r["node"], r["comp"])
            for r in connected_components_star(df).collect()}
    assert star == {(1, 1), (2, 1), (7, 7)}


def test_rep_path_equals_full_path(spark):
    """Representative election (exact-dup pre-pass) must be output-
    identical to the full-corpus pipeline, for both the pair query and
    the component query (VERDICT r5 item 4).  sf0.001 documents are
    replicated 3x so exact-duplicate groups actually exist."""
    import pyspark.sql.functions as F
    from s2_geometry_kotlin_spark.operators.components import \
        q_dedup_components
    from s2_geometry_kotlin_spark.operators.dedup import \
        q_minhash_lsh_pairs

    src = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{src}/documents.parquet")
    repl_dir = "/tmp/s2_test_docs_repl3"
    (docs.withColumn("rep", F.explode(F.array(
         *[F.lit(i) for i in range(3)])))
     .withColumn("doc_id", F.col("doc_id") * 3 + F.col("rep"))
     .drop("rep")
     .write.mode("overwrite").parquet(f"{repl_dir}/documents.parquet"))

    full_pairs = sorted(
        tuple(r) for r in q_minhash_lsh_pairs(
            spark, repl_dir, via_reps=False).collect())
    rep_pairs = sorted(
        tuple(r) for r in q_minhash_lsh_pairs(
            spark, repl_dir, via_reps=True).collect())
    assert rep_pairs == full_pairs
    assert len(rep_pairs) > len(docs.collect())  # dup groups exist

    full_comp = sorted(tuple(r) for r in q_dedup_components(
        spark, repl_dir, via_reps=False).collect())
    rep_comp = sorted(tuple(r) for r in q_dedup_components(
        spark, repl_dir, via_reps=True).collect())
    assert rep_comp == full_comp
