"""Analytics breadth, round 2: serial autocorrelation, linear gap
interpolation, referential-integrity audit, per-column table profiling,
graph degree distribution, and mergeable-HLL distinct sketches.

The reference has no analytics layer at all (SURVEY.md §2.9); these
extend the X-series with the remaining warehouse-operational queries a
drop-in engine needs: data-quality audits (FK orphans, column profile),
time-series diagnostics (autocorrelation, interpolation — the linear
sibling of q_gap_fill's LOCF), and the degree histogram over the same
shipment graph q_pagerank walks.

Scale notes (100 TB):
- FK audit: each check is a left-anti join; dim sides (nation/region/
  customer/orders keys) broadcast, the fact side never shuffles. The
  UNION of per-check counts is a handful of scalar rows.
- Column profile: ONE full-scan aggregate computes every column's
  stats map-side (count/nulls/distinct/min/max per column in a single
  agg row), then explodes to the per-column report — never one scan
  per column.
- Autocorrelation: lag window + corr aggregate share the event_type
  partitioning — one shuffle total.
- Interpolation: same one-shuffle shape as q_gap_fill; prev/next
  anchors come from two IGNORE NULLS window passes over the same
  partitioning, which EnsureRequirements collapses onto one exchange.
- Degree distribution: two cascaded aggregates, the second over a
  domain of size ≤ max-degree (tiny).
- HLL sketches: constant-size mergeable state per group — the
  re-aggregatable distinct-count store; union(groups) ≡ global is the
  property that lets a 100 TB corpus keep per-partition sketches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load
from .registry import query


@query(
    "q_autocorr",
    oracle="""
    WITH lagged AS (
      SELECT event_type, value,
             lag(value) OVER (PARTITION BY event_type
                              ORDER BY ts, event_id) AS prev_value
      FROM events
    )
    SELECT event_type,
           round(corr(value, prev_value), 6) AS acf_lag1,
           count(prev_value) AS n_pairs
    FROM lagged GROUP BY event_type
    """,
)
def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 serial autocorrelation per series: pair each value with its
    predecessor ((ts, event_id) order — unique tie-break) and correlate.
    The standard white-noise / trend diagnostic over metric streams;
    lag window and corr share one event_type shuffle."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    lagged = e.withColumn("prev_value", F.lag("value").over(w))
    return lagged.groupBy("event_type").agg(
        F.round(F.corr("value", "prev_value"), 6).alias("acf_lag1"),
        F.count("prev_value").alias("n_pairs"),
    )


@query(
    "q_interpolate",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
      FROM events
    ),
    calendar AS (
      SELECT et.event_type, cal.hr
      FROM (SELECT DISTINCT event_type FROM events) et
      CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
                  FROM bounds) cal
    ),
    hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             avg(value) AS v
      FROM events GROUP BY 1, 2
    ),
    joined AS (
      SELECT c.event_type, c.hr, h.v,
             epoch_us(c.hr) AS t,
             last_value(h.v IGNORE NULLS) OVER (
               PARTITION BY c.event_type ORDER BY c.hr
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
             last_value(CASE WHEN h.v IS NOT NULL THEN epoch_us(c.hr) END
                        IGNORE NULLS) OVER (
               PARTITION BY c.event_type ORDER BY c.hr
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
             first_value(h.v IGNORE NULLS) OVER (
               PARTITION BY c.event_type ORDER BY c.hr
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN h.v IS NOT NULL THEN epoch_us(c.hr) END
                         IGNORE NULLS) OVER (
               PARTITION BY c.event_type ORDER BY c.hr
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt
      FROM calendar c LEFT JOIN hourly h
        ON c.event_type = h.event_type AND c.hr = h.hr
    )
    SELECT event_type, hr,
           CASE WHEN v IS NULL THEN 1 ELSE 0 END AS is_gap,
           round(CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NOT NULL AND nv IS NOT NULL
               THEN pv + (nv - pv) * (t - pt) / (nt - pt)
             ELSE coalesce(pv, nv)
           END, 6) AS v_interp
    FROM joined
    """,
)
def q_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear gap interpolation (timescale ``interpolate`` shape, the
    sibling of q_gap_fill's LOCF): densify hourly buckets onto the
    calendar, then fill each gap on the line between its last observed
    and next observed neighbor — edge gaps fall back to the available
    side. Anchors come from IGNORE NULLS frames, so arbitrarily long
    gap runs interpolate in one pass, no iteration."""
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.avg("value").alias("v"))
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    calendar = (
        e.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hr"),
        )
    )
    back = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    fwd = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    t = F.unix_micros(F.col("hr"))
    obs_t = F.when(F.col("v").isNotNull(), t)
    j = (
        calendar.join(hourly, ["event_type", "hr"], "left")
        .withColumn("t", t)
        .withColumn("pv", F.last("v", ignorenulls=True).over(back))
        .withColumn("pt", F.last(obs_t, ignorenulls=True).over(back))
        .withColumn("nv", F.first("v", ignorenulls=True).over(fwd))
        .withColumn("nt", F.first(obs_t, ignorenulls=True).over(fwd))
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        F.col("t") - F.col("pt")
    ) / (F.col("nt") - F.col("pt"))
    return j.select(
        "event_type",
        "hr",
        F.when(F.col("v").isNull(), 1).otherwise(0).alias("is_gap"),
        F.round(
            F.when(F.col("v").isNotNull(), F.col("v"))
            .when(
                F.col("pv").isNotNull() & F.col("nv").isNotNull(), interp
            )
            .otherwise(F.coalesce("pv", "nv")),
            6,
        ).alias("v_interp"),
    )


@query(
    "q_fk_orphans",
    oracle="""
    SELECT 'lineitem->orders' AS fk, count(*) AS n_orphans
    FROM lineitem l WHERE NOT EXISTS
      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'lineitem->part', count(*) FROM lineitem l WHERE NOT EXISTS
      (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
    UNION ALL
    SELECT 'lineitem->supplier', count(*) FROM lineitem l WHERE NOT EXISTS
      (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
    UNION ALL
    SELECT 'orders->customer', count(*) FROM orders o WHERE NOT EXISTS
      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'customer->nation', count(*) FROM customer c WHERE NOT EXISTS
      (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
    UNION ALL
    SELECT 'nation->region', count(*) FROM nation n WHERE NOT EXISTS
      (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey)
    """,
)
def q_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan count per foreign key, each
    as a left-anti join against the referenced key set. Genuinely small
    dims (nation/region/supplier/part at this ratio) are broadcast; for
    the big parents (orders, customer — billions of rows at 100 TB) the
    anti-join is left to AQE, which picks a shuffle anti-join (or
    converts to broadcast at runtime if the pruned key column turns out
    small) — a forced broadcast there would OOM the driver."""
    t = {n: load(spark, sf_dir, n) for n in
         ("lineitem", "orders", "part", "supplier", "customer", "nation", "region")}
    # (fk_name, child, child_key, parent, parent_key, parent_is_small)
    checks = [
        ("lineitem->orders", t["lineitem"], "l_orderkey",
         t["orders"], "o_orderkey", False),
        ("lineitem->part", t["lineitem"], "l_partkey",
         t["part"], "p_partkey", True),
        ("lineitem->supplier", t["lineitem"], "l_suppkey",
         t["supplier"], "s_suppkey", True),
        ("orders->customer", t["orders"], "o_custkey",
         t["customer"], "c_custkey", False),
        ("customer->nation", t["customer"], "c_nationkey",
         t["nation"], "n_nationkey", True),
        ("nation->region", t["nation"], "n_regionkey",
         t["region"], "r_regionkey", True),
    ]
    out = None
    for fk_name, child, ck, parent, pk, small in checks:
        keys = parent.select(pk)
        orphans = child.join(
            F.broadcast(keys) if small else keys,
            child[ck] == F.col(pk),
            "left_anti",
        ).agg(F.count("*").alias("n_orphans")).select(
            F.lit(fk_name).alias("fk"), "n_orphans"
        )
        out = orphans if out is None else out.unionAll(orphans)
    return out


@query(
    "q_profile_table",
    oracle="""
    SELECT 'o_orderkey' AS col, count(o_orderkey) AS n_filled,
           count(*) - count(o_orderkey) AS n_null,
           count(DISTINCT o_orderkey) AS n_distinct,
           CAST(min(o_orderkey) AS VARCHAR) AS min_s,
           CAST(max(o_orderkey) AS VARCHAR) AS max_s
    FROM orders
    UNION ALL
    SELECT 'o_custkey', count(o_custkey), count(*) - count(o_custkey),
           count(DISTINCT o_custkey),
           CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(o_orderstatus),
           count(*) - count(o_orderstatus), count(DISTINCT o_orderstatus),
           min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(o_orderpriority),
           count(*) - count(o_orderpriority), count(DISTINCT o_orderpriority),
           min(o_orderpriority), max(o_orderpriority)
    FROM orders
    """,
)
def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data profile (filled/null/distinct/min/max) of the
    orders table — the dataset-card / data-quality summary pass. ONE
    aggregate row computes every column's stats in a single scan
    (count and count-distinct combine map-side), then a literal
    unpivot emits the per-column report; never one scan per column.
    min/max stringified so heterogeneous column types share a schema."""
    o = load(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    aggs = []
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__filled"),
            (F.count("*") - F.count(c)).alias(f"{c}__null"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__filled, {c}__null, {c}__distinct, {c}__min, {c}__max"
        for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col, n_filled, n_null, n_distinct, min_s, max_s)"
        )
    )


@query(
    "q_degree_dist",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT l.l_suppkey AS s, o.o_custkey AS c
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    deg AS (SELECT c, count(*) AS degree FROM edges GROUP BY c)
    SELECT degree, count(*) AS n_customers
    FROM deg GROUP BY degree
    """,
)
def q_degree_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the supplier↔customer shipment graph
    (same graph q_pagerank walks): distinct edges → per-customer degree
    → degree histogram. Two cascaded aggregates; the second groups over
    ≤ max-degree values, so it collapses to a broadcast-sized result
    regardless of corpus size."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c"))
        .distinct()
    )
    deg = edges.groupBy("c").agg(F.count("*").alias("degree"))
    return deg.groupBy("degree").agg(F.count("*").alias("n_customers"))


@query("q_hll_merge")  # rows-only: Datasketches HLL has no DuckDB twin
def q_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL via
    hll_sketch_agg / hll_union_agg / hll_sketch_estimate): per-type
    user sketches plus the 'ALL' row re-aggregated by UNIONING THE
    SKETCHES, not rescanning — the constant-size state that lets a
    100 TB store keep per-partition distinct counts and roll them up.
    Deterministic for a fixed sketch impl, but DuckDB's HLL is a
    different estimator → rows-only; exactness vs count(DISTINCT) is
    asserted in tests/test_scale_ops.py."""
    e = load(spark, sf_dir, "events")
    per_type = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    groups = per_type.select(
        "event_type", F.hll_sketch_estimate("sk").alias("est_users")
    )
    merged = per_type.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.lit("ALL").alias("event_type"),
        F.hll_sketch_estimate("sk").alias("est_users"),
    )
    return groups.unionAll(merged)


@query(
    "q_rolling_corr",
    oracle="""
    SELECT event_id, event_type,
           round(corr(value, CAST(epoch_us(ts) AS DOUBLE)) OVER (
             PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN 49 PRECEDING AND CURRENT ROW), 6) AS trend_corr
    FROM events
    """,
)
def q_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling value↔time correlation over a trailing 50-event frame —
    the windowed-trend detector (corr as a WINDOW aggregate, not just
    grouped): near +1 sustained climb, near 0 noise. One window pass
    sharing the event_type shuffle with every other per-series op.

    Spelled covar/(sd*sd) under try_divide rather than F.corr: ANSI
    mode makes corr THROW on a zero-variance frame (the 8x scale probe
    hit this — replicated corpora duplicate timestamps, and a frame of
    identical ts has var(t)=0), while DuckDB's corr returns NULL there;
    try_divide restores the NULL semantics at any scale."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-49, Window.currentRow)
    )
    t = F.unix_micros("ts").cast("double")
    v = F.col("value")
    corr = F.try_divide(
        F.covar_samp(v, t).over(w),
        F.stddev_samp(v).over(w) * F.stddev_samp(t).over(w),
    )
    return e.select(
        "event_id",
        "event_type",
        F.round(corr, 6).alias("trend_corr"),
    )


@query(
    "q_cumulative_distinct",
    oracle="""
    WITH flagged AS (
      SELECT event_id, event_type, ts,
             CASE WHEN row_number() OVER (
               PARTITION BY event_type, user_id ORDER BY ts, event_id) = 1
             THEN 1 ELSE 0 END AS is_first
      FROM events
    )
    SELECT event_id, event_type,
           CAST(sum(is_first) OVER (
             PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS users_so_far
    FROM flagged
    """,
)
def q_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count (cumulative unique users per series) —
    COUNT(DISTINCT) is not a window function in either engine, so the
    standard rewrite: flag each user's first occurrence (row_number = 1
    over (series, user)) and running-sum the flags. Two windows, both
    hash-partitioned on the series key, no distinct state at all."""
    e = load(spark, sf_dir, "events")
    w_first = Window.partitionBy("event_type", "user_id").orderBy(
        "ts", "event_id"
    )
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = e.withColumn(
        "is_first",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0),
    )
    return flagged.select(
        "event_id",
        "event_type",
        F.sum("is_first").over(w_run).alias("users_so_far"),
    )


@query(
    "q_rfm_segment",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey,
             max(o_orderdate) AS last_order,
             count(*) AS frequency,
             round(sum(o_totalprice), 2) AS monetary
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, last_order, frequency, monetary,
           ntile(4) OVER (ORDER BY last_order, o_custkey) AS r_quartile,
           ntile(4) OVER (ORDER BY frequency, o_custkey) AS f_quartile,
           ntile(4) OVER (ORDER BY monetary, o_custkey) AS m_quartile
    FROM rfm
    """,
)
def q_rfm_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (recency/frequency/monetary quartiles)
    — the classic warehouse scoring query: one grouped aggregate, three
    ntile windows over the customer-sized result (tie-broken on the key
    for cross-engine determinism). The windows order a table that is
    |customers|, not |orders| — aggregate first, rank small."""
    o = load(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    return rfm.select(
        "o_custkey",
        "last_order",
        "frequency",
        "monetary",
        F.ntile(4).over(Window.orderBy("last_order", "o_custkey")).alias(
            "r_quartile"
        ),
        F.ntile(4).over(Window.orderBy("frequency", "o_custkey")).alias(
            "f_quartile"
        ),
        F.ntile(4).over(Window.orderBy("monetary", "o_custkey")).alias(
            "m_quartile"
        ),
    )


@query(
    "q_percent_total",
    oracle="""
    WITH rev AS (
      SELECT n.n_regionkey, c.c_nationkey,
             round(sum(o.o_totalprice), 2) AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_regionkey, c.c_nationkey
    )
    SELECT c_nationkey, n_regionkey, revenue,
           round(revenue * 100.0 / sum(revenue) OVER (
             PARTITION BY n_regionkey), 4) AS pct_of_region,
           round(revenue * 100.0 / sum(revenue) OVER (), 4) AS pct_of_total
    FROM rev
    """,
)
def q_percent_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's revenue share of its region and of
    the grand total via window sums over the AGGREGATED (nation-sized)
    table — the share-of-total report pattern. The empty-frame global
    window is fine precisely because it runs over 25 rows, not the fact
    table."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_regionkey", "c_nationkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    w_region = Window.partitionBy("n_regionkey")
    w_all = Window.partitionBy()
    return rev.select(
        "c_nationkey",
        "n_regionkey",
        "revenue",
        F.round(
            F.col("revenue") * 100.0 / F.sum("revenue").over(w_region), 4
        ).alias("pct_of_region"),
        F.round(
            F.col("revenue") * 100.0 / F.sum("revenue").over(w_all), 4
        ).alias("pct_of_total"),
    )


@query(
    "q_bitmap_distinct",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS distinct_users
    FROM events GROUP BY event_type
    """,
)
def q_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via mergeable bitmaps (Spark 4
    bitmap_bucket_number / bitmap_construct_agg / bitmap_or_agg /
    bitmap_count): per-(group, bucket) bitmaps OR-merge into the group
    total — the re-aggregatable EXACT middle ground between
    count(DISTINCT) (exact, not mergeable across rollups without the
    raw keys) and HLL (mergeable, approximate). A 100 TB store keeps
    per-partition bitmaps and rolls them up by OR; the oracle's plain
    count(DISTINCT) proves bit-exactness."""
    e = load(spark, sf_dir, "events")
    # bitmap positions are 1-based: id 0 would land at position -1 and
    # vanish (measured: 149 vs 150 distinct). Shift the key domain +1 —
    # a pure relabeling, so counts are unchanged.
    e = e.withColumn("uid1", F.col("user_id") + 1)
    buckets = e.groupBy(
        "event_type",
        F.expr("bitmap_bucket_number(uid1)").alias("bucket"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(uid1))").alias("b")
    )
    return buckets.groupBy("event_type").agg(
        F.expr("bitmap_count(bitmap_or_agg(b))").cast("long").alias(
            "distinct_users"
        )
    )


@query(
    "q_rolling_median",
    oracle="""
    SELECT event_id, event_type,
           round(CAST(quantile_cont(value, 0.5) OVER (
             PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN 24 PRECEDING AND CURRENT ROW) AS DOUBLE), 6)
             AS med_25
    FROM events
    """,
)
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling exact median over a trailing 25-event frame — the robust
    smoother (q_moving_avg's mean is outlier-sensitive; the median
    ignores spikes entirely). Exact interpolated percentile as a WINDOW
    aggregate; both engines use the linear-interpolation estimator."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-24, Window.currentRow)
    )
    return e.select(
        "event_id",
        "event_type",
        F.round(
            F.expr("percentile(value, 0.5)").over(w), 6
        ).alias("med_25"),
    )


_LATERAL_SQL = """
SELECT r.r_name, x.s_name, x.s_acctbal
FROM region r,
LATERAL (
  SELECT s.s_name, round(s.s_acctbal, 2) AS s_acctbal
  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_regionkey = r.r_regionkey
  ORDER BY s.s_acctbal DESC, s.s_suppkey LIMIT 2) x
"""


@query("q_lateral_topk", oracle=_LATERAL_SQL)
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT: top-2
    suppliers per region written as a per-row dependent subquery — the
    SQL-standard alternative to the window-rank rewrite
    (q_rank_topk_per_group), planned by Catalyst as a decorrelated
    rank join rather than N subquery executions. Identical SQL runs on
    both engines."""
    from ..sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


@query(
    "q_anomaly_zscore",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    scored AS (
      SELECT event_type, hr, cnt,
             avg(cnt) OVER w AS mu,
             stddev_samp(cnt) OVER w AS sd
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY hr
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, hr, cnt,
           round((cnt - mu) / sd, 6) AS z
    FROM scored
    WHERE sd > 0 AND abs((cnt - mu) / sd) > 2
    """,
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X178 — event-rate anomaly detection: hourly counts per event
    type scored against the TRAILING 24-hour window's mean/stddev
    (frame excludes the current hour — the score must not see itself);
    |z| > 2 rows are the alert stream. The ops-monitoring twin of
    q_drift_psi's offline distribution check.

    Plan: one count aggregation collapses events to |types|x|hours|
    rows, so the window pass runs over a tiny keyed series; at 100 TB
    the only full-data stage is the combinable hourly count."""
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count("*").alias("cnt"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(-24, -1)
    )
    scored = hourly.select(
        "event_type",
        "hr",
        "cnt",
        F.avg("cnt").over(w).alias("mu"),
        F.stddev_samp("cnt").over(w).alias("sd"),
    )
    z = (F.col("cnt") - F.col("mu")) / F.col("sd")
    return scored.filter((F.col("sd") > 0) & (F.abs(z) > 2)).select(
        "event_type", "hr", "cnt", F.round(z, 6).alias("z")
    )


@query(
    "q_funnel_timing",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS first_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, v.first_view, min(e.ts) AS first_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.first_view
      GROUP BY e.user_id, v.first_view
    ),
    d AS (
      SELECT CAST(date_diff('second', first_view, first_click) AS BIGINT)
               AS secs
      FROM c
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           round(quantile_cont(secs, 0.5), 6) AS p50_secs,
           round(quantile_cont(secs, 0.9), 6) AS p90_secs,
           round(avg(secs), 6) AS mean_secs
    FROM d
    """,
)
def q_funnel_timing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X179 — funnel latency: for users who clicked after their first
    view (q_funnel's first transition), the view→click delay
    distribution (median / p90 / mean seconds). Conversion COUNTS say
    whether a funnel works; conversion TIMES say where it drags — the
    product-analytics companion the count-only funnel can't answer.

    Plan: two min-aggregations on user_id and one same-key join — the
    delay column is |converting users| long, so the percentile pass is
    over a reduced table, not raw events."""
    e = load(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("first_view"))
        .groupBy("user_id", "first_view")
        .agg(F.min("ts").alias("first_click"))
    )
    secs = (
        F.unix_timestamp("first_click") - F.unix_timestamp("first_view")
    ).cast("bigint")
    d = c.select(secs.alias("secs"))
    return d.agg(
        F.count("*").alias("n_converted"),
        F.round(F.expr("percentile(secs, 0.5)"), 6).alias("p50_secs"),
        F.round(F.expr("percentile(secs, 0.9)"), 6).alias("p90_secs"),
        F.round(F.avg("secs"), 6).alias("mean_secs"),
    )


@query(
    "q_outlier_ensemble",
    oracle="""
    WITH stats AS (
      SELECT avg(o_totalprice) AS mu, stddev_samp(o_totalprice) AS sd,
             quantile_cont(o_totalprice, 0.25) AS q1,
             quantile_cont(o_totalprice, 0.75) AS q3,
             median(o_totalprice) AS med
      FROM orders
    ), mad AS (
      SELECT median(abs(o_totalprice - s.med)) AS mad_v
      FROM orders CROSS JOIN stats s
    ), flagged AS (
      SELECT o.o_orderkey,
             CASE WHEN abs(o.o_totalprice - s.mu) / s.sd > 3
                  THEN 1 ELSE 0 END AS f_z,
             CASE WHEN o.o_totalprice > s.q3 + 1.5 * (s.q3 - s.q1)
                    OR o.o_totalprice < s.q1 - 1.5 * (s.q3 - s.q1)
                  THEN 1 ELSE 0 END AS f_iqr,
             CASE WHEN abs(o.o_totalprice - s.med)
                       / (1.4826 * m.mad_v) > 3.5
                  THEN 1 ELSE 0 END AS f_mad
      FROM orders o CROSS JOIN stats s CROSS JOIN mad m
    )
    SELECT CAST(sum(f_z) AS BIGINT) AS n_zscore,
           CAST(sum(f_iqr) AS BIGINT) AS n_iqr,
           CAST(sum(f_mad) AS BIGINT) AS n_mad,
           CAST(sum(CASE WHEN f_z + f_iqr + f_mad >= 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_majority,
           CAST(sum(CASE WHEN f_z + f_iqr + f_mad = 3 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_unanimous
    FROM flagged
    """,
)
def q_outlier_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-screen ensemble: z-score (>3σ), Tukey IQR fence, and
    modified-z on MAD (>3.5) each vote on order totals; majority and
    unanimous counts quantify how much the screens disagree — the
    robustness check a data-quality gate runs before trusting any one
    rule (X108/X112/X115's screens, composed). Two scalar stats rows
    broadcast; the fact table is scanned once for stats, once for
    voting, nothing shuffles but scalars."""
    o = load(spark, sf_dir, "orders")
    stats = o.agg(
        F.avg("o_totalprice").alias("mu"),
        F.stddev_samp("o_totalprice").alias("sd"),
        F.expr("percentile(o_totalprice, 0.25)").alias("q1"),
        F.expr("percentile(o_totalprice, 0.75)").alias("q3"),
        F.median("o_totalprice").alias("med"),
    )
    mad = (
        o.crossJoin(F.broadcast(stats))
        .agg(
            F.median(F.abs(F.col("o_totalprice") - F.col("med"))).alias(
                "mad_v"
            )
        )
    )
    f = o.crossJoin(F.broadcast(stats)).crossJoin(F.broadcast(mad))
    f_z = F.when(
        F.abs(F.col("o_totalprice") - F.col("mu")) / F.col("sd") > 3, 1
    ).otherwise(0)
    iqr = F.col("q3") - F.col("q1")
    f_iqr = F.when(
        (F.col("o_totalprice") > F.col("q3") + 1.5 * iqr)
        | (F.col("o_totalprice") < F.col("q1") - 1.5 * iqr),
        1,
    ).otherwise(0)
    f_mad = F.when(
        F.abs(F.col("o_totalprice") - F.col("med"))
        / (1.4826 * F.col("mad_v"))
        > 3.5,
        1,
    ).otherwise(0)
    voted = f.select(
        f_z.alias("f_z"), f_iqr.alias("f_iqr"), f_mad.alias("f_mad")
    )
    total = F.col("f_z") + F.col("f_iqr") + F.col("f_mad")
    return voted.agg(
        F.sum("f_z").cast("long").alias("n_zscore"),
        F.sum("f_iqr").cast("long").alias("n_iqr"),
        F.sum("f_mad").cast("long").alias("n_mad"),
        F.sum(F.when(total >= 2, 1).otherwise(0)).cast("long").alias(
            "n_majority"
        ),
        F.sum(F.when(total == 3, 1).otherwise(0)).cast("long").alias(
            "n_unanimous"
        ),
    )
