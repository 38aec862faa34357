"""Text-analysis operators for the training-data pipeline.

All hot-path computation is JVM-side Spark SQL (split / higher-order
array functions inside whole-stage codegen) — no Python.  Each operator
ships a DuckDB oracle built from the same logical spec.

Operators: token counting, quality scoring (length / distinct / stopword
ratios), lexicon-vote language-ID heuristic, md5 document fingerprint +
min-shingle fingerprint (rolling-hash style winnowing-lite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in")

# tiny domain lexicons for the vote-based language/domain id heuristic
LEXICONS = {
    "db": ("table", "row", "column", "key", "query", "join", "scan"),
    "stream": ("stream", "window", "batch", "event", "late", "state"),
    "perf": ("fast", "slow", "big", "small", "merge", "sort", "hash"),
}


def _words_spark():
    return F.split(F.trim(F.col("text")), " +")


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = _words_spark()
    return docs.select(
        "doc_id",
        F.size(w).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(w)).cast("long").alias("n_distinct"),
        F.length(F.col("text")).cast("long").alias("n_chars_raw"),
    )


def token_stats_sql() -> str:
    return ("SELECT doc_id, "
            "len(string_split_regex(trim(text), ' +')) AS n_tokens, "
            "len(list_distinct(string_split_regex(trim(text), ' +'))) "
            "AS n_distinct, "
            "length(text) AS n_chars_raw FROM documents")


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality score: distinct ratio, stopword ratio, mean word length
    (rounded to 6 decimals; all ratios of exact integers)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = _words_spark()
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n = F.size(w).cast("double")
    n_stop = F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x)))
    sum_len = F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x))
    return docs.select(
        "doc_id",
        F.round(F.size(F.array_distinct(w)) / n, 6).alias("distinct_ratio"),
        F.round(n_stop / n, 6).alias("stopword_ratio"),
        F.round(sum_len / n, 6).alias("mean_word_len"),
    )


def quality_sql() -> str:
    stops = ",".join(f"'{s}'" for s in STOPWORDS)
    w = "string_split_regex(trim(text), ' +')"
    return (f"SELECT doc_id, "
            f"round(len(list_distinct({w})) / "
            f"CAST(len({w}) AS DOUBLE), 6) AS distinct_ratio, "
            f"round(len(list_filter({w}, x -> x IN ({stops}))) / "
            f"CAST(len({w}) AS DOUBLE), 6) AS stopword_ratio, "
            f"round(list_aggregate(list_transform({w}, x -> length(x)), "
            f"'sum') / CAST(len({w}) AS DOUBLE), 6) AS mean_word_len "
            f"FROM documents")


def q_domain_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-vote domain/language-ID heuristic: argmax of lexicon hit
    counts, ties broken by lexicon order."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = _words_spark()
    def _hit_counter(lex):
        arr = F.array(*[F.lit(s) for s in lex])
        return F.size(F.filter(w, lambda x: F.array_contains(arr, x)))

    scores = [_hit_counter(lex).alias(f"s_{name}")
              for name, lex in LEXICONS.items()]
    scored = docs.select("doc_id", *scores)
    names = list(LEXICONS.keys())
    best = F.lit(names[0])
    best_score = F.col(f"s_{names[0]}")
    for name in names[1:]:
        cond = F.col(f"s_{name}") > best_score
        best = F.when(cond, F.lit(name)).otherwise(best)
        best_score = F.when(cond, F.col(f"s_{name}")).otherwise(best_score)
    return scored.select("doc_id", best.alias("domain"),
                         best_score.cast("long").alias("score"))


def domain_id_sql() -> str:
    w = "string_split_regex(trim(text), ' +')"
    parts = []
    for name, lex in LEXICONS.items():
        lx = ",".join(f"'{s}'" for s in lex)
        parts.append(f"len(list_filter({w}, x -> x IN ({lx}))) AS s_{name}")
    names = list(LEXICONS.keys())
    # same left-to-right argmax with strict > (first wins ties)
    best = f"'{names[0]}'"
    best_score = f"s_{names[0]}"
    for name in names[1:]:
        best = f"CASE WHEN s_{name} > {best_score} THEN '{name}' ELSE {best} END"
        best_score = (f"CASE WHEN s_{name} > {best_score} THEN s_{name} "
                      f"ELSE {best_score} END")
    return (f"WITH scored AS (SELECT doc_id, {', '.join(parts)} "
            f"FROM documents) "
            f"SELECT doc_id, {best} AS domain, {best_score} AS score "
            f"FROM scored")


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: full-text md5 + min word-5-gram md5
    (winnowing-lite rolling fingerprint)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = _words_spark()
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(w) - F.lit(4), F.lit(1))),
        lambda i: F.md5(F.concat_ws(" ", F.slice(w, i, 5))))
    return docs.select(
        "doc_id",
        F.md5(F.col("text")).alias("text_md5"),
        F.array_min(grams).alias("min_shingle_md5"),
    )


def fingerprint_sql() -> str:
    w = "string_split_regex(trim(text), ' +')"
    return (f"SELECT doc_id, md5(text) AS text_md5, "
            f"list_min(list_transform("
            f"range(1, greatest(len({w}) - 4, 1) + 1), "
            f"i -> md5(array_to_string(list_slice({w}, i, i + 4), ' ')))) "
            f"AS min_shingle_md5 FROM documents")


# BPE-ish pre-tokenization: alpha runs, single digits, single
# non-alnum marks — the GPT-style pre-split shape (word pieces before
# merges).  Identical regex semantics in Spark (Java regex) and DuckDB
# (RE2) for these basic classes.
BPE_PATTERN = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"


def q_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting per document: total pre-tokens plus the
    alpha/digit/punct split — all JVM regexp, no Python."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), 0)
    alpha = F.filter(toks, lambda t: t.rlike("^[A-Za-z]+$"))
    digit = F.filter(toks, lambda t: t.rlike("^[0-9]$"))
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_bpe"),
        F.size(alpha).cast("long").alias("n_alpha"),
        F.size(digit).cast("long").alias("n_digit"),
        (F.size(toks) - F.size(alpha) - F.size(digit)).cast("long")
        .alias("n_punct"))


def bpe_token_stats_sql() -> str:
    return f"""SELECT doc_id,
  len(regexp_extract_all(text, '{BPE_PATTERN}')) AS n_bpe,
  len(list_filter(regexp_extract_all(text, '{BPE_PATTERN}'),
      t -> regexp_matches(t, '^[A-Za-z]+$'))) AS n_alpha,
  len(list_filter(regexp_extract_all(text, '{BPE_PATTERN}'),
      t -> regexp_matches(t, '^[0-9]$'))) AS n_digit,
  len(regexp_extract_all(text, '{BPE_PATTERN}'))
    - len(list_filter(regexp_extract_all(text, '{BPE_PATTERN}'),
          t -> regexp_matches(t, '^[A-Za-z]+$')))
    - len(list_filter(regexp_extract_all(text, '{BPE_PATTERN}'),
          t -> regexp_matches(t, '^[0-9]$'))) AS n_punct
FROM documents"""
