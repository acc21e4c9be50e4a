"""Data-mutation & reshape operators: MERGE upsert, changelog compaction,
unpivot/melt, deterministic dataset splitting.

The reference's only mutation is record-at-a-time INSERT with a swallow-on-
duplicate (kafka_s.py:621-629) and a hand-rolled "reload the dim when a
count changes" refresh (kafka_s.py:198-238). A warehouse engine needs the
set-oriented forms: MERGE (upsert a whole batch in one plan), changelog →
latest-state compaction (what Kafka log compaction does to the reference's
CDC topic, expressed relationally), UNPIVOT (the inverse of A2's pivot,
kafka_s.py:298-310), and reproducible train/val/test splits for the
training-data pipeline extensions (SURVEY.md §2.13).

Scale notes: MERGE is one full-outer shuffle join on the key — at 100 TB
both sides hash-partition on the merge key and AQE handles skew; no
driver-side row loop (the reference does one round-trip per record).
Compaction is one window shuffle, partition-pruned by key prefix when the
log is bucketed. The hash split is a pure map-side stage: no shuffle at
all until the per-split aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import token_hash, token_hash_sql
from ..sources.tables import load
from .registry import query

# ---------------------------------------------------------------------------
# MERGE INTO (upsert) as a single full-outer join plan
# ---------------------------------------------------------------------------


@query(
    "q_merge_upsert",
    oracle="""
    WITH target AS (
      SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal
      FROM customer WHERE c_nationkey < 13
    ),
    source AS (
      SELECT o_custkey, round(sum(o_totalprice) * 0.001, 2) AS delta
      FROM orders WHERE o_totalprice > 350000 GROUP BY o_custkey
    )
    SELECT
      coalesce(t.c_custkey, s.o_custkey) AS c_custkey,
      coalesce(t.c_name, 'NEW#' || CAST(s.o_custkey AS VARCHAR)) AS c_name,
      round(coalesce(t.c_acctbal, 0.0) + coalesce(s.delta, 0.0), 2)
        AS c_acctbal,
      CASE WHEN t.c_custkey IS NULL THEN 'insert'
           WHEN s.o_custkey IS NULL THEN 'keep'
           ELSE 'update' END AS merge_action
    FROM target t FULL OUTER JOIN source s ON t.c_custkey = s.o_custkey
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (Delta/Iceberg-style upsert) as one relational
    plan: target FULL OUTER JOIN source on the merge key, then per-row
    WHEN MATCHED → update / WHEN NOT MATCHED → insert / else keep.

    Target = customers of nations 0-12; source = per-customer spend on
    big-ticket orders (>350k) — chosen so the merge genuinely exercises
    all three branches on the testdata: matched-update, source-only
    insert, and target-only keep.
    The reference's analog is its insert-or-skip Mongo write
    (kafka_s.py:614-630) done one record at a time — here the whole batch
    merges in a single shuffle join that Catalyst plans like any other
    join (broadcast if the source is small, sort-merge otherwise).
    """
    target = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") < 13)
        .select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal"))
    )
    source = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 350000)
        .groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice") * 0.001, 2).alias("delta"))
    )
    t, s = target.alias("t"), source.alias("s")
    merged = t.join(s, F.col("t.c_custkey") == F.col("s.o_custkey"), "full_outer")
    return merged.select(
        F.coalesce("t.c_custkey", "s.o_custkey").alias("c_custkey"),
        F.coalesce(
            "t.c_name",
            F.concat(F.lit("NEW#"), F.col("s.o_custkey").cast("string")),
        ).alias("c_name"),
        F.round(
            F.coalesce("t.c_acctbal", F.lit(0.0))
            + F.coalesce("s.delta", F.lit(0.0)),
            2,
        ).alias("c_acctbal"),
        F.when(F.col("t.c_custkey").isNull(), "insert")
        .when(F.col("s.o_custkey").isNull(), "keep")
        .otherwise("update")
        .alias("merge_action"),
    )


# ---------------------------------------------------------------------------
# Changelog → latest-state compaction (Kafka log-compaction analog)
# ---------------------------------------------------------------------------


@query(
    "q_cdc_latest",
    oracle="""
    SELECT user_id, event_type, value AS latest_value, ts AS latest_ts
    FROM (
      SELECT user_id, event_type, value, ts,
             row_number() OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    WHERE rn = 1
    """,
)
def q_cdc_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog compaction: materialize the latest state per key from an
    append-only event log — exactly what Kafka log compaction does to the
    reference's CDC topic (kafka_s.py:68,149-161), expressed as one
    window. Key = (user_id, event_type); version order = (ts, event_id)
    with event_id as the deterministic tie-break.

    Scale: one shuffle on the key; at 100 TB the same plan works as an
    incremental merge (new micro-batch unioned with the prior compact
    snapshot, re-windowed per key partition).
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("value").alias("latest_value"),
            F.col("ts").alias("latest_ts"),
        )
    )


# ---------------------------------------------------------------------------
# UNPIVOT / melt — the inverse of the reference's A2 pivot
# ---------------------------------------------------------------------------


@query(
    "q_unpivot",
    oracle="""
    SELECT l_returnflag, metric, count(*) AS n, round(sum(val), 2) AS total
    FROM (
      SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS val
      FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_discount', l_discount FROM lineitem)
    GROUP BY l_returnflag, metric
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide measure columns → long (metric, value) rows,
    the inverse of A2's pivot (kafka_s.py:298-310). Uses the literal
    ``DataFrame.unpivot`` API (Catalyst Expand — one pass over the input,
    NOT the 3-scan UNION ALL the oracle spells out), then aggregates per
    (flag, metric) to pin the reshape's semantics."""
    li = load(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "metric",
        "val",
    )
    return long.groupBy("l_returnflag", "metric").agg(
        F.count("*").alias("n"), F.round(F.sum("val"), 2).alias("total")
    )


# ---------------------------------------------------------------------------
# Deterministic train/val/test split (reproducible sampling)
# ---------------------------------------------------------------------------

_SPLIT_CASE_SQL = """
CASE WHEN bucket < 80 THEN 'train'
     WHEN bucket < 90 THEN 'val'
     ELSE 'test' END
"""


@query(
    "q_hash_split",
    oracle=f"""
    SELECT split, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           min(doc_id) AS min_doc
    FROM (
      SELECT doc_id, n_chars,
             {_SPLIT_CASE_SQL.replace("bucket",
               token_hash_sql("CAST(doc_id AS VARCHAR)") + " % 100")} AS split
      FROM documents)
    GROUP BY split
    """,
)
def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 80/10/10 train/val/test split by content-stable hash
    (md5 of the doc key → bucket 0-99), the standard way a training-data
    pipeline splits a corpus so the assignment survives reruns, engine
    changes, and repartitioning — unlike ``df.sample`` whose output
    depends on partition layout. Pure map-side (no shuffle) until the
    per-split audit aggregate; at 100 TB the split column is written as a
    partition key so downstream readers prune to one split."""
    d = load(spark, sf_dir, "documents")
    bucket = token_hash(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        d.select("doc_id", "n_chars", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc"),
        )
    )


@query(
    "q_dq_audit",
    oracle="""
    SELECT 'orders_pk_unique' AS rule,
           (SELECT count(*) FROM (
              SELECT o_orderkey FROM orders
              GROUP BY o_orderkey HAVING count(*) > 1)) AS violations
    UNION ALL
    SELECT 'orders_fk_customer',
           (SELECT count(*) FROM orders o LEFT JOIN customer c
            ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL)
    UNION ALL
    SELECT 'lineitem_fk_orders',
           (SELECT count(*) FROM lineitem l LEFT JOIN orders o
            ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL)
    UNION ALL
    SELECT 'lineitem_qty_positive',
           (SELECT count(*) FROM lineitem WHERE l_quantity <= 0)
    UNION ALL
    SELECT 'lineitem_discount_range',
           (SELECT count(*) FROM lineitem
            WHERE l_discount < 0 OR l_discount > 1)
    UNION ALL
    SELECT 'orders_date_not_null',
           (SELECT count(*) FROM orders WHERE o_orderdate IS NULL)
    """,
)
def q_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality assertion battery (the dbt-test / Great-Expectations
    shape as one engine query): PK uniqueness, two referential-integrity
    checks, range and null rules — each emitted as (rule, violations)
    so a zero row is evidence, not silence. Plan notes: uniqueness is a
    partial-agg groupBy (count>1 survivors only), FK checks are
    broadcast anti-join-shaped left joins; all six rules scan their
    table once and nothing materializes but the per-rule count — at
    100 TB this is the nightly audit pass, not six separate jobs."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    li = load(spark, sf_dir, "lineitem")

    def one(rule: str, cnt: DataFrame) -> DataFrame:
        return cnt.select(
            F.lit(rule).alias("rule"), F.col("violations")
        )

    pk = one(
        "orders_pk_unique",
        o.groupBy("o_orderkey")
        .count()
        .filter(F.col("count") > 1)
        .agg(F.count("*").alias("violations")),
    )
    fk_o = one(
        "orders_fk_customer",
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti").agg(
            F.count("*").alias("violations")
        ),
    )
    fk_l = one(
        "lineitem_fk_orders",
        li.join(o, li.l_orderkey == o.o_orderkey, "left_anti").agg(
            F.count("*").alias("violations")
        ),
    )
    qty = one(
        "lineitem_qty_positive",
        li.filter(F.col("l_quantity") <= 0).agg(
            F.count("*").alias("violations")
        ),
    )
    disc = one(
        "lineitem_discount_range",
        li.filter(
            (F.col("l_discount") < 0) | (F.col("l_discount") > 1)
        ).agg(F.count("*").alias("violations")),
    )
    nn = one(
        "orders_date_not_null",
        o.filter(F.col("o_orderdate").isNull()).agg(
            F.count("*").alias("violations")
        ),
    )
    return pk.union(fk_o).union(fk_l).union(qty).union(disc).union(nn)


@query(
    "q_table_stats",
    oracle="""
    SELECT 'o_orderkey' AS col, count(o_orderkey) AS n_filled,
           count(*) - count(o_orderkey) AS n_null,
           count(DISTINCT o_orderkey) AS ndv,
           round(min(o_orderkey), 4) AS min_v,
           round(max(o_orderkey), 4) AS max_v
    FROM orders
    UNION ALL
    SELECT 'o_custkey', count(o_custkey), count(*) - count(o_custkey),
           count(DISTINCT o_custkey),
           round(min(o_custkey), 4), round(max(o_custkey), 4)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(o_totalprice),
           count(*) - count(o_totalprice),
           count(DISTINCT o_totalprice),
           round(min(o_totalprice), 4), round(max(o_totalprice), 4)
    FROM orders
    """,
)
def q_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style per-column statistics (filled/null counts, NDV,
    min/max) in ONE scan — the stats a cost-based optimizer or a file-
    skipping index wants. All columns' aggregates ride the same pass and
    unpivot into (col, stats) rows at the end; at 100 TB swap the exact
    NDV for q_hll_portable's registers to keep the pass single-shuffle."""
    o = load(spark, sf_dir, "orders")
    agg = o.agg(
        *[
            f
            for col in ["o_orderkey", "o_custkey", "o_totalprice"]
            for f in (
                F.count(col).alias(f"{col}__filled"),
                (F.count("*") - F.count(col)).alias(f"{col}__null"),
                F.count_distinct(col).alias(f"{col}__ndv"),
                F.round(F.min(col), 4).alias(f"{col}__min"),
                F.round(F.max(col), 4).alias(f"{col}__max"),
            )
        ]
    )
    rows = [
        F.struct(
            F.lit(col).alias("col"),
            F.col(f"{col}__filled").alias("n_filled"),
            F.col(f"{col}__null").alias("n_null"),
            F.col(f"{col}__ndv").alias("ndv"),
            F.col(f"{col}__min").cast("double").alias("min_v"),
            F.col(f"{col}__max").cast("double").alias("max_v"),
        )
        for col in ["o_orderkey", "o_custkey", "o_totalprice"]
    ]
    return agg.select(F.explode(F.array(*rows)).alias("s")).select("s.*")


@query(
    "q_snapshot_diff",
    oracle="""
    WITH snap_a AS (
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        AND o_orderkey % 13 <> 0),
    snap_b AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_custkey % 10 = 0
                  THEN round(o_totalprice * 1.1, 2)
                  ELSE o_totalprice END AS o_totalprice
      FROM orders
      WHERE o_orderdate < TIMESTAMP '1999-07-01 00:00:00'),
    d AS (
      SELECT coalesce(a.o_orderkey, b.o_orderkey) AS k,
             CASE WHEN a.o_orderkey IS NULL THEN 'insert'
                  WHEN b.o_orderkey IS NULL THEN 'delete'
                  WHEN a.o_totalprice <> b.o_totalprice THEN 'update'
                  ELSE 'unchanged' END AS change_type
      FROM snap_a a FULL OUTER JOIN snap_b b
        ON a.o_orderkey = b.o_orderkey)
    SELECT change_type, count(*) AS n
    FROM d GROUP BY change_type
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed GENERATION: diff two table snapshots into an
    insert/update/delete/unchanged changelog (the inverse of
    q_cdc_latest, which compacts one). Snapshots here are deterministic
    transforms of orders (B extends the date horizon, bumps some prices,
    and A withholds the keys B "deleted") so both engines derive
    identical inputs. One full-outer shuffle join on the key — the same
    plan MERGE uses, so at 100 TB the diff co-partitions with the
    upsert that consumes it."""
    o = load(spark, sf_dir, "orders")
    snap_a = o.filter(
        (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
        & (F.col("o_orderkey") % 13 != 0)
    ).select("o_orderkey", "o_custkey", "o_totalprice")
    snap_b = o.filter(
        F.col("o_orderdate") < F.lit("1999-07-01").cast("timestamp")
    ).select(
        "o_orderkey",
        "o_custkey",
        F.when(
            F.col("o_custkey") % 10 == 0,
            F.round(F.col("o_totalprice") * 1.1, 2),
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    a, b = snap_a.alias("a"), snap_b.alias("b")
    d = a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
    change = (
        F.when(F.col("a.o_orderkey").isNull(), "insert")
        .when(F.col("b.o_orderkey").isNull(), "delete")
        .when(F.col("a.o_totalprice") != F.col("b.o_totalprice"), "update")
        .otherwise("unchanged")
    )
    return d.select(change.alias("change_type")).groupBy("change_type").agg(
        F.count("*").alias("n")
    )
