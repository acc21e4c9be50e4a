"""Gap-closers and windowing (SURVEY.md §2.9 absences + §2.13 E7-E12).

The reference implements no sorts, top-k, set ops, rollup, ranking
functions, or event-time windows (SURVEY.md §2.9); BASELINE.json's north
star names stateful aggregation + windowing explicitly, so the engine
provides them as first-class queries, each with a DuckDB oracle —
including session windows, whose oracle is the classic gaps-and-islands
rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load
from .registry import query


@query(
    "q_sort_limit",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 50
    """,
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E11 — global sort + top-k. Spark executes orderBy().limit(k) as
    TakeOrderedAndProject: per-partition top-k then a k-row merge on the
    driver — no full sort, no shuffle of the 100 TB table."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(50)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


@query(
    "q_setops",
    oracle="""
    SELECT nk FROM (
      SELECT nk FROM (
        SELECT c_nationkey AS nk FROM customer
        UNION
        SELECT s_nationkey AS nk FROM supplier
      )
      INTERSECT
      SELECT n_nationkey AS nk FROM nation
    )
    EXCEPT
    SELECT n_nationkey AS nk FROM nation WHERE n_regionkey = 4
    """,
)
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E11 — UNION / INTERSECT / EXCEPT with set (distinct) semantics."""
    cust = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    supp = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    nat = load(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("nk"))
    nat4 = (
        load(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey") == 4)
        .select(F.col("n_nationkey").alias("nk"))
    )
    return cust.union(supp).distinct().intersect(nat).subtract(nat4)


@query(
    "q_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(avg(l_extendedprice), 2) AS avg_price,
           count(*) AS n_rows
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E11 — rollup aggregation (subtotals + grand total). Sums are
    rounded on both sides: double accumulation order differs between
    engines by design (partial aggregation), not by bug."""
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
        F.count("*").alias("n_rows"),
    )


@query(
    "q_rank_topk_per_group",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal, rn FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) WHERE rn <= 3
    """,
)
def q_rank_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E10 — ranking window function, top-3 per group, deterministic
    tiebreak on the unique key. One shuffle on the partition key; AQE
    handles group-count skew."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal", "rn")
    )


@query(
    "q_distinct_count",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS uniq_users, count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def q_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E12 — distinct aggregation (exact form; approx_count_distinct is
    the drop-in at 100 TB when a 2% error is acceptable — HLL sketch,
    single pass, no distinct expand)."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("uniq_users"), F.count("*").alias("n")
    )


@query(
    "q_window_funcs",
    oracle="""
    SELECT c_custkey, c_nationkey,
           ntile(4) OVER w AS quartile,
           round(cume_dist() OVER w, 6) AS cdist,
           first_value(c_custkey) OVER w AS richest_key,
           round(sum(c_acctbal) OVER (PARTITION BY c_nationkey), 2)
             AS nation_total
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def q_window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E10c — analytic-function breadth: ntile, cume_dist, first_value,
    and a whole-partition running sum, all over one shuffle on the
    partition key."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), "c_custkey")
    wp = Window.partitionBy("c_nationkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.first("c_custkey").over(w).alias("richest_key"),
        F.round(F.sum("c_acctbal").over(wp), 2).alias("nation_total"),
    )


@query(
    "q_array_funcs",
    oracle="""
    WITH t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    )
    SELECT doc_id,
           len(toks) AS n,
           list_sort(toks)[1] AS first_sorted,
           list_reverse(toks)[1] AS last_token,
           array_to_string(list_sort(list_distinct(toks))[1:3], ',') AS top3_vocab,
           list_contains(toks, 'spark') AS has_spark
    FROM t
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar-function breadth (sort/reverse/slice/distinct/
    contains/join) — all JVM-side, no UDFs."""
    from ..functions import text as T

    d = load(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).alias("n"),
        F.element_at(F.array_sort(toks), 1).alias("first_sorted"),
        F.element_at(F.reverse(toks), 1).alias("last_token"),
        F.array_join(
            F.slice(F.array_sort(F.array_distinct(toks)), 1, 3), ","
        ).alias("top3_vocab"),
        F.array_contains(toks, "spark").alias("has_spark"),
    )


@query(
    "q_window_tumbling",
    oracle="""
    SELECT date_trunc('hour', ts) AS ws, event_type,
           count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def q_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7 — tumbling event-time window. Same groupBy(window(...)) works
    unchanged as a streaming agg with a watermark (streaming layer)."""
    e = load(spark, sf_dir, "events")
    return e.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    ).select(
        F.col("window.start").alias("ws"), "event_type", "n", "sum_value"
    )


@query(
    "q_window_sliding",
    oracle="""
    SELECT ws, count(*) AS n, round(sum(value), 2) AS sum_value FROM (
      SELECT e.value,
             time_bucket(INTERVAL '15 minutes', e.ts)
               - to_minutes(15 * t.k) AS ws
      FROM events e, (SELECT unnest(range(4)) AS k) t
    ) GROUP BY ws
    """,
)
def q_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E8 — sliding window (1h length, 15m slide): every event lands in
    exactly 4 overlapping windows; the oracle enumerates them."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("window.start").alias("ws"), "n", "sum_value")
    )


@query(
    "q_session_window",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL '30 minutes' AS session_end,
           count(*) AS n_events
    FROM numbered GROUP BY user_id, sid
    """,
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E9 — session window (30-minute gap). Spark's session_window merges
    events whose gap is < 30m (window end is exclusive, so an exact-30m
    gap starts a new session — the oracle's >= mirrors that). In
    streaming mode the identical expression runs with a watermark."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "q_setops_all",
    oracle="""
    SELECT nk, count(*) AS n FROM (
      SELECT nk FROM (
        SELECT c_nationkey AS nk FROM customer
        INTERSECT ALL
        SELECT s_nationkey AS nk FROM supplier
      )
      EXCEPT ALL
      SELECT n_nationkey AS nk FROM nation WHERE n_regionkey < 2
    ) GROUP BY nk
    """,
)
def q_setops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E11b — the BAG-semantics set operations (INTERSECT ALL / EXCEPT
    ALL): multiplicity-aware — a key occurring 70× in customers and 3×
    in suppliers intersects to 3 copies, and EXCEPT ALL subtracts
    per-occurrence, not per-value. Spark plans both as aggregate+join on
    counts (no row explosion); the final groupBy makes the multiset
    hash-comparable."""
    cust = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    supp = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    nat01 = (
        load(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey") < 2)
        .select(F.col("n_nationkey").alias("nk"))
    )
    return (
        cust.intersectAll(supp)
        .exceptAll(nat01)
        .groupBy("nk")
        .agg(F.count("*").alias("n"))
    )
