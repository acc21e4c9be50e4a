"""Round-4 flagship composition: the END-TO-END pretraining corpus
build — quality gate → benchmark holdout + decontamination → stratified
mixing → sequence packing — as ONE declarative plan with a full
value-hash oracle. A user of this engine runs their whole data build as
a single query; every stage is also individually gate-pinned (X99,
X90, X92, X267).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.hashing import token_hash, token_hash_sql
from ..sources.tables import load
from .datasetops import BENCH_MOD, _GRAMS_SQL, corpus_flags, grams_of
from .llm_ext2 import _CTX
from .registry import query

# ---------------------------------------------------------------------------
# X339 — end-to-end pretraining data build
# ---------------------------------------------------------------------------


@query(
    "q_pretrain_build",
    oracle=f"""
    WITH g AS (SELECT * FROM {_GRAMS_SQL}),
    bench_grams AS (
      SELECT DISTINCT gram FROM g WHERE doc_id % {BENCH_MOD} = 0),
    hits AS (
      SELECT DISTINCT g.doc_id FROM g JOIN bench_grams USING (gram)
      WHERE g.doc_id % {BENCH_MOD} <> 0),
    flags AS (
      SELECT d.doc_id, d.source, d.text,
             len(string_split(d.text, ' ')) AS n_words,
             (len(string_split(d.text, ' ')) >= 30
              AND d.n_chars * 1.0 / len(string_split(d.text, ' '))
                  BETWEEN 3 AND 13) AS q,
             d.doc_id % {BENCH_MOD} = 0 AS bench,
             h.doc_id IS NOT NULL AS cont,
             {token_hash_sql("CAST(d.doc_id AS VARCHAR)")} % 10000
               < (CASE WHEN CAST(substr(d.source, 4) AS INT) < 5 THEN 10000
                       WHEN CAST(substr(d.source, 4) AS INT) < 10 THEN 5000
                       WHEN CAST(substr(d.source, 4) AS INT) < 15 THEN 2500
                       ELSE 1000 END) AS kept
      FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id),
    survivors AS (
      SELECT doc_id, source,
             len(list_filter(string_split(text, ' '), t -> t <> ''))
               AS n_tok
      FROM flags WHERE q AND NOT bench AND NOT cont AND kept),
    pieces AS (
      SELECT doc_id, source,
             unnest(range(CAST(ceil(n_tok / {_CTX}.0) AS BIGINT)))
               AS piece_id,
             n_tok
      FROM survivors WHERE n_tok > 0),
    sized AS (
      SELECT doc_id, source, piece_id,
             least({_CTX}, n_tok - piece_id * {_CTX}) AS piece_len
      FROM pieces),
    placed AS (
      SELECT source, piece_len,
             CAST(ceil(sum(piece_len) OVER (
                 PARTITION BY source
                 ORDER BY piece_len DESC, doc_id, piece_id
                 ROWS UNBOUNDED PRECEDING) / {_CTX}.0) AS BIGINT)
               AS window_id
      FROM sized)
    SELECT source,
           count(*) AS n_pieces,
           CAST(count(DISTINCT window_id) AS BIGINT) AS n_windows,
           CAST(sum(piece_len) AS BIGINT) AS real_tokens,
           round(CAST(sum(piece_len) AS DOUBLE)
                 / (count(DISTINCT window_id) * {_CTX}), 4) AS pack_eff
    FROM placed GROUP BY source
    """,
)
def q_pretrain_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X339 — the END-TO-END pretraining data build as one plan:
    quality gate (X99's word-count + mean-word-length) → benchmark
    holdout + 5-gram decontamination (X90, broadcast semi-join) →
    stratified hash-threshold mixing (X92) → shard-local sequence
    packing of the SURVIVORS into 128-token windows (X267's
    running-sum bins), reporting per source the packed-window count,
    surviving token budget, and achieved packing efficiency — the
    numbers a training run is actually provisioned from.

    This is the engine's closing argument: every stage is a
    Column-expression transformation on the same lazy plan (flags in
    one pass, one broadcast semi-join, one shard-partitioned packing
    window), so the whole corpus build runs in ONE job with no
    intermediate materialization — at 100 TB the naive
    stage-per-dataset pipeline writes the corpus three times; this
    writes one summary table. Each constituent stage remains
    individually hash-pinned (X99/X90/X92/X267)."""
    d = load(spark, sf_dir, "documents")
    g = grams_of(d)
    bench_grams = (
        g.filter(F.col("doc_id") % BENCH_MOD == 0).select("gram").distinct()
    )
    hits = (
        g.filter(F.col("doc_id") % BENCH_MOD != 0)
        .join(F.broadcast(bench_grams), "gram", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    flags = corpus_flags(d, hits)
    survivors = (
        flags.filter(
            F.col("q") & ~F.col("bench") & ~F.col("cont") & F.col("kept")
        )
        .join(d.select("doc_id", "text"), "doc_id")
        .select(
            "doc_id",
            "source",
            F.size(
                F.filter(F.split("text", " "), lambda t: t != "")
            ).alias("n_tok"),
        )
        .filter(F.col("n_tok") > 0)
    )
    pieces = survivors.select(
        "doc_id",
        "source",
        F.explode(
            F.sequence(
                F.lit(0),
                F.ceil(F.col("n_tok") / float(_CTX)).cast("long") - 1,
            )
        ).alias("piece_id"),
        "n_tok",
    ).select(
        "doc_id",
        "source",
        "piece_id",
        F.least(
            F.lit(_CTX), F.col("n_tok") - F.col("piece_id") * _CTX
        ).alias("piece_len"),
    )
    w_cum = (
        Window.partitionBy("source")
        .orderBy(F.desc("piece_len"), F.asc("doc_id"), F.asc("piece_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = pieces.select(
        "source",
        "piece_len",
        F.ceil(F.sum("piece_len").over(w_cum) / float(_CTX))
        .cast("long")
        .alias("window_id"),
    )
    return placed.groupBy("source").agg(
        F.count("*").alias("n_pieces"),
        F.countDistinct("window_id").cast("long").alias("n_windows"),
        F.sum("piece_len").cast("long").alias("real_tokens"),
        F.round(
            F.sum("piece_len").cast("double")
            / (F.countDistinct("window_id") * _CTX),
            4,
        ).alias("pack_eff"),
    )
