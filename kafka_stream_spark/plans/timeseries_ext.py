"""Time-series extensions, round 3 (X210-X212): changepoint
detection, seasonal decomposition, and marketing attribution.

Shared scale shape: the event log collapses to a per-day (or
per-user-ordered) table in one combinable shuffle; every window after
that runs over the collapsed table. Day-of-week is computed as
(days since 1970-01-01) % 7 — engine-neutral, sidestepping the
Spark-vs-DuckDB dayofweek numbering mismatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load
from .registry import query


@query(
    "q_cusum",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, count(*) AS n
      FROM events GROUP BY 1
    ), stats AS (
      SELECT avg(n) AS mu, stddev_samp(n) AS sd FROM daily
    ), walk AS (
      SELECT day,
             sum((n - mu) / sd) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
      FROM daily CROSS JOIN stats
    )
    SELECT day AS change_day, round(abs(s), 4) AS cusum_peak,
           (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n_days
    FROM walk ORDER BY round(abs(s), 4) DESC, day LIMIT 1
    """,
)
def q_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint screen on the daily event-count series: the
    day where the cumulative sum of standardized deviations peaks in
    magnitude is the maximum-likelihood single changepoint of a mean
    shift. One combinable daily rollup, a broadcast two-scalar stats
    row, then a cumulative window over the day table (thousands of
    rows at any corpus size); argmax on the ROUNDED statistic so the
    pick is ULP-stable across engines."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").alias("n")
    )
    stats = daily.agg(
        F.avg("n").alias("mu"), F.stddev_samp("n").alias("sd")
    )
    n_days = daily.agg(F.count("*").cast("long").alias("n_days"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    walk = daily.crossJoin(F.broadcast(stats)).withColumn(
        "s", F.sum((F.col("n") - F.col("mu")) / F.col("sd")).over(w)
    )
    return (
        walk.withColumn("cusum_peak", F.round(F.abs("s"), 4))
        .orderBy(F.desc("cusum_peak"), "day")
        .limit(1)
        .crossJoin(F.broadcast(n_days))
        .select(F.col("day").alias("change_day"), "cusum_peak", "n_days")
    )


@query(
    "q_seasonal_index",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, sum(value) AS total
      FROM events GROUP BY 1
    ), dow AS (
      SELECT date_diff('day', DATE '1970-01-01', day) % 7 AS dow, total
      FROM daily
    ), base AS (SELECT avg(total) AS overall FROM daily)
    SELECT CAST(dow AS BIGINT) AS dow, CAST(count(*) AS BIGINT) AS n_days,
           round(avg(total), 4) AS avg_total,
           round(avg(total) / overall, 4) AS seasonal_index
    FROM dow CROSS JOIN base GROUP BY dow, overall
    """,
)
def q_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal indices (avg daily total ÷ overall avg
    daily total) — the multiplicative-decomposition seasonal factor a
    forecaster divides out before trend fitting. Two combinable
    aggregations and a broadcast scalar; dow = epoch-days % 7 keeps
    the bucketing engine-neutral."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum("value").alias("total")
    )
    epoch = F.lit("1970-01-01").cast("date")
    dow = daily.select(
        (F.datediff(F.col("day"), epoch) % 7).cast("long").alias("dow"),
        "total",
    )
    base = daily.agg(F.avg("total").alias("overall"))
    return (
        dow.crossJoin(F.broadcast(base))
        .groupBy("dow", "overall")
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.round(F.avg("total"), 4).alias("avg_total"),
            F.round(F.avg("total") / F.first("overall"), 4).alias(
                "seasonal_index"
            ),
        )
        .select("dow", "n_days", "avg_total", "seasonal_index")
    )


@query(
    "q_attribution",
    oracle="""
    WITH touches AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_conv,
             CASE WHEN event_type = 'click' THEN
               CASE CAST(json_extract(props, '$.k') AS BIGINT) % 3
                 WHEN 0 THEN 'organic' WHEN 1 THEN 'paid' ELSE 'social' END
             END AS channel,
             value
      FROM events WHERE event_type IN ('click', 'purchase')
    ), carried AS (
      SELECT user_id, is_conv, value,
             last_value(channel IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, is_conv, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_touch
      FROM touches
    )
    SELECT coalesce(last_touch, 'unattributed') AS channel,
           CAST(count(*) AS BIGINT) AS n_purchases,
           round(sum(value), 4) AS revenue
    FROM carried WHERE is_conv = 1 GROUP BY 1
    """,
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch revenue attribution: each purchase credits the
    user's most recent preceding click's channel (channel derived
    deterministically from the click's props payload; same-timestamp
    clicks sort before the purchase via the is_conv ordering key).
    The carry is a per-user ordered window with IGNORE NULLS last() —
    partitioned by user, so it parallelizes across the cluster with
    one shuffle on user_id; no self-join of the event log against
    itself."""
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    k = F.get_json_object("props", "$.k").cast("long")
    touches = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "is_conv"
        ),
        F.when(
            F.col("event_type") == "click",
            F.when(k % 3 == 0, "organic")
            .when(k % 3 == 1, "paid")
            .otherwise("social"),
        ).alias("channel"),
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_conv", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = touches.withColumn(
        "last_touch", F.last("channel", ignorenulls=True).over(w)
    )
    return (
        carried.filter(F.col("is_conv") == 1)
        .groupBy(
            F.coalesce(F.col("last_touch"), F.lit("unattributed")).alias(
                "channel"
            )
        )
        .agg(
            F.count("*").cast("long").alias("n_purchases"),
            F.round(F.sum("value"), 4).alias("revenue"),
        )
    )


@query(
    "q_clamped_balance",
    oracle="""
    SELECT user_id,
           round(list_reduce(
             list_prepend(0.0, list(
               CASE WHEN event_type = 'view' THEN value ELSE -value END
               ORDER BY ts, event_id)),
             (acc, x) -> greatest(acc + x, 0.0)), 4) AS final_balance,
           CAST(count(*) AS BIGINT) AS n_txns
    FROM events WHERE event_type IN ('view', 'click')
    GROUP BY user_id
    """,
)
def q_clamped_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Floor-clamped running balance b := max(b + x, 0) per user
    (credits = view values, debits = click values, ordered by
    (ts, event_id)). The clamp makes this a genuine nonlinear
    recurrence — NOT expressible as any window aggregate (a clamp in
    the middle changes every later prefix sum), so it needs a Python
    fold. The scale form here is a SORTED-PARTITION STREAMING fold:
    repartition on user_id, sortWithinPartitions (a local sort, no
    global ordering), then ONE mapInPandas pass that folds every group
    in the partition while carrying the open group's state across
    Arrow batch boundaries. A naive groupBy().applyInPandas spends an
    Arrow round-trip per key — 1.9× slower here (6.2s → 3.2s at
    sf0.1) and worse the smaller the groups get. The oracle folds the
    same sequence with DuckDB's list_reduce lambda — identical
    operation order, so doubles match bit-for-bit before the final
    round."""
    import pandas as pd

    e = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "click"))
        .select(
            "user_id",
            "ts",
            "event_id",
            F.when(F.col("event_type") == "view", F.col("value"))
            .otherwise(-F.col("value"))
            .alias("signed"),
        )
        .repartition("user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
    )

    def fold_stream(batches):
        open_uid = None
        bal = 0.0
        n = 0

        def emit():
            return {"user_id": open_uid, "raw_balance": bal, "n_txns": n}

        for pdf in batches:
            done = []
            for uid, x in zip(pdf["user_id"], pdf["signed"]):
                if uid != open_uid:
                    if open_uid is not None:
                        done.append(emit())
                    open_uid, bal, n = uid, 0.0, 0
                bal = max(bal + x, 0.0)
                n += 1
            if done:
                yield pd.DataFrame(done)
        if open_uid is not None:
            yield pd.DataFrame([emit()])

    # round Spark-side: F.round is HALF_UP like DuckDB's round for the
    # non-negative clamped balance, where Python's round() is banker's
    return e.mapInPandas(
        fold_stream, "user_id long, raw_balance double, n_txns long"
    ).select(
        "user_id",
        F.round("raw_balance", 4).alias("final_balance"),
        "n_txns",
    )


@query(
    "q_growth_rate",
    oracle="""
    WITH monthly AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             sum(o_totalprice) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT month, round(revenue, 4) AS revenue,
           round(100.0 * (revenue - lag(revenue) OVER (ORDER BY month))
                 / lag(revenue) OVER (ORDER BY month), 4) AS mom_pct
    FROM monthly ORDER BY month
    """,
)
def q_growth_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth — the ubiquitous dashboard
    ratio, spelled as a lag window over the monthly rollup (the
    combinable groupBy touches the fact table once; the global-order
    lag runs over |months| rows). First month's growth is NULL by
    definition."""
    o = load(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(F.sum("o_totalprice").alias("revenue"))
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "month",
        F.round("revenue", 4).alias("revenue"),
        F.round(100.0 * (F.col("revenue") - prev) / prev, 4).alias("mom_pct"),
    ).orderBy("month")


@query(
    "q_holt_forecast",
    oracle="""
    WITH RECURSIVE monthly AS (
      SELECT c.c_mktsegment AS segment,
             CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month,
             sum(o.o_totalprice) AS revenue
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ), seq AS (
      SELECT segment, revenue,
             row_number() OVER (PARTITION BY segment ORDER BY month) AS i
      FROM monthly
    ), n AS (SELECT segment, max(i) AS n FROM seq GROUP BY segment),
    holt(segment, i, l, b) AS (
      SELECT segment, 1, CAST(revenue AS DOUBLE), CAST(0.0 AS DOUBLE)
      FROM seq WHERE i = 1
      UNION ALL
      SELECT s.segment, h.i + 1,
             0.5 * s.revenue + 0.5 * (h.l + h.b),
             0.3 * (0.5 * s.revenue + 0.5 * (h.l + h.b) - h.l) + 0.7 * h.b
      FROM holt h JOIN seq s ON s.segment = h.segment AND s.i = h.i + 1
    )
    SELECT h.segment, CAST(n.n AS BIGINT) AS n_months,
           round(h.l, 4) AS level, round(h.b, 4) AS trend,
           round(h.l + h.b, 4) AS forecast_1,
           round(h.l + 3 * h.b, 4) AS forecast_3
    FROM holt h JOIN n ON h.segment = n.segment AND h.i = n.n
    """,
)
def q_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing (α=0.5, β=0.3, l₀=first
    value, b₀=0) over each market segment's monthly revenue, with 1-
    and 3-step-ahead linear forecasts. The coupled level/trend
    recurrence — like X214's clamp — cannot be a window aggregate, so
    each segment's series folds inside applyInPandas after one
    combinable monthly rollup; the shuffle carries (segment, month,
    revenue) only. The oracle steps the identical recurrence with a
    recursive CTE (a struct-accumulator list_reduce fold was tried
    first and abandoned — DuckDB v1.0.0 evaluates multi-field struct
    lambdas inconsistently), so doubles agree bit-for-bit before
    rounding."""
    import pandas as pd

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    monthly = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        )
        .agg(F.sum("o_totalprice").alias("revenue"))
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("month")
        vals = list(pdf["revenue"])
        l, b = vals[0], 0.0
        for x in vals[1:]:
            l_new = 0.5 * x + 0.5 * (l + b)
            b = 0.3 * (l_new - l) + 0.7 * b
            l = l_new
        return pd.DataFrame(
            {
                "segment": [pdf["segment"].iloc[0]],
                "n_months": [len(vals)],
                "level_raw": [l],
                "trend_raw": [b],
            }
        )

    return (
        monthly.groupBy("segment")
        .applyInPandas(
            fit, "segment string, n_months long, level_raw double, trend_raw double"
        )
        .select(
            "segment",
            "n_months",
            F.round("level_raw", 4).alias("level"),
            F.round("trend_raw", 4).alias("trend"),
            F.round(F.col("level_raw") + F.col("trend_raw"), 4).alias(
                "forecast_1"
            ),
            F.round(F.col("level_raw") + 3 * F.col("trend_raw"), 4).alias(
                "forecast_3"
            ),
        )
    )


@query(
    "q_lttb",
    oracle="""
    WITH series AS (
      SELECT event_type AS etype,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
             count(*) AS y
      FROM events GROUP BY 1, 2
    ), sized AS (
      SELECT etype, x, y,
             row_number() OVER (PARTITION BY etype ORDER BY x) AS rn,
             count(*) OVER (PARTITION BY etype) AS n
      FROM series
    ), bucketed AS (
      SELECT *, CAST(floor((rn - 1) * 12.0 / n) AS BIGINT) AS bucket
      FROM sized
    ), bstats AS (
      SELECT etype, bucket, avg(x) AS ax, avg(y) AS ay
      FROM bucketed GROUP BY 1, 2
    ), anchors AS (
      SELECT etype, bucket,
             lag(ax) OVER (PARTITION BY etype ORDER BY bucket) AS px,
             lag(ay) OVER (PARTITION BY etype ORDER BY bucket) AS py,
             lead(ax) OVER (PARTITION BY etype ORDER BY bucket) AS nx,
             lead(ay) OVER (PARTITION BY etype ORDER BY bucket) AS ny
      FROM bstats
    ), scored AS (
      SELECT b.etype, b.bucket, b.x, b.y, b.rn, b.n,
             CASE
               WHEN b.bucket = 0 THEN CAST(-b.rn AS DOUBLE)
               WHEN b.bucket = 11 THEN CAST(b.rn AS DOUBLE)
               ELSE round(abs((a.px - a.nx) * (b.y - a.py)
                            - (a.px - b.x) * (a.ny - a.py)), 6)
             END AS score
      FROM bucketed b JOIN anchors a
        ON b.etype = a.etype AND b.bucket = a.bucket
    ), picked AS (
      SELECT etype, bucket, x, y,
             row_number() OVER (PARTITION BY etype, bucket
                                ORDER BY score DESC, x) AS pick
      FROM scored
    )
    SELECT etype, CAST(bucket AS BIGINT) AS bucket,
           CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y
    FROM picked WHERE pick = 1
    """,
)
def q_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB-style series downsampling (12 points per event type),
    bucket-AVERAGE-anchored: each middle bucket keeps the point whose
    triangle with the neighboring buckets' centroids is largest;
    bucket 0 keeps the first point, the last bucket the last point.
    Anchoring on bucket averages instead of the previously-selected
    point (classic LTTB) removes the sequential selection chain, so
    the whole downsample is windows + one join over the per-bucket
    stats — embarrassingly parallel across series and buckets, which
    is what a 100 TB dashboard tier needs. (The sequential classic
    variant is available through the X214/X218 applyInPandas fold
    pattern when exact LTTB output is required.) Argmax runs on the
    ROUNDED area with an x tie-break — ULP-stable across engines."""
    e = load(spark, sf_dir, "events")
    epoch = F.lit("1970-01-01").cast("date")
    series = e.groupBy(
        F.col("event_type").alias("etype"),
        F.datediff(F.col("ts").cast("date"), epoch).alias("x"),
    ).agg(F.count("*").alias("y"))
    w_rn = Window.partitionBy("etype").orderBy("x")
    w_n = Window.partitionBy("etype")
    sized = series.withColumn("rn", F.row_number().over(w_rn)).withColumn(
        "n", F.count("*").over(w_n)
    )
    bucketed = sized.withColumn(
        "bucket",
        F.floor((F.col("rn") - 1) * 12.0 / F.col("n")).cast("long"),
    )
    bstats = bucketed.groupBy("etype", "bucket").agg(
        F.avg("x").alias("ax"), F.avg("y").alias("ay")
    )
    w_b = Window.partitionBy("etype").orderBy("bucket")
    anchors = bstats.select(
        "etype",
        "bucket",
        F.lag("ax").over(w_b).alias("px"),
        F.lag("ay").over(w_b).alias("py"),
        F.lead("ax").over(w_b).alias("nx"),
        F.lead("ay").over(w_b).alias("ny"),
    )
    scored = bucketed.join(anchors, ["etype", "bucket"]).withColumn(
        "score",
        F.when(F.col("bucket") == 0, (-F.col("rn")).cast("double"))
        .when(F.col("bucket") == 11, F.col("rn").cast("double"))
        .otherwise(
            F.round(
                F.abs(
                    (F.col("px") - F.col("nx")) * (F.col("y") - F.col("py"))
                    - (F.col("px") - F.col("x")) * (F.col("ny") - F.col("py"))
                ),
                6,
            )
        ),
    )
    w_pick = Window.partitionBy("etype", "bucket").orderBy(
        F.desc("score"), "x"
    )
    return (
        scored.withColumn("pick", F.row_number().over(w_pick))
        .filter(F.col("pick") == 1)
        .select(
            "etype",
            F.col("bucket").cast("long").alias("bucket"),
            F.col("x").cast("long").alias("x"),
            F.col("y").cast("long").alias("y"),
        )
    )


@query(
    "q_segmented_trend",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
             count(*) AS y
      FROM events GROUP BY 1, 2
    ), stats AS (
      SELECT avg(y) AS mu, stddev_samp(y) AS sd FROM daily
    ), walk AS (
      SELECT day,
             sum((y - mu) / sd) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
      FROM daily CROSS JOIN stats
    ), cp AS (
      SELECT day AS change_day FROM walk
      ORDER BY round(abs(s), 4) DESC, day LIMIT 1
    )
    SELECT cp.change_day,
           CAST(count(*) FILTER (WHERE d.day <= cp.change_day) AS BIGINT)
             AS n_before,
           CAST(count(*) FILTER (WHERE d.day > cp.change_day) AS BIGINT)
             AS n_after,
           round(regr_slope(d.y, d.x)
             FILTER (WHERE d.day <= cp.change_day), 6) AS slope_before,
           round(regr_slope(d.y, d.x)
             FILTER (WHERE d.day > cp.change_day), 6) AS slope_after
    FROM daily d CROSS JOIN cp GROUP BY cp.change_day
    """,
)
def q_segmented_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segmented (piecewise-linear) trend: fit separate least-squares
    slopes before and after the CUSUM-selected changepoint — the
    composition a monitoring system actually runs (X210 finds WHERE
    the break is, this quantifies HOW the trend changed). The
    changepoint is a broadcast one-row dim; both slopes come from ONE
    conditional-aggregation pass over the daily rollup (regr_slope
    under FILTER), so the series is scanned once."""
    e = load(spark, sf_dir, "events")
    epoch = F.lit("1970-01-01").cast("date")
    daily = e.groupBy(
        F.col("ts").cast("date").alias("day"),
        F.datediff(F.col("ts").cast("date"), epoch).alias("x"),
    ).agg(F.count("*").alias("y"))
    stats = daily.agg(
        F.avg("y").alias("mu"), F.stddev_samp("y").alias("sd")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    walk = daily.crossJoin(F.broadcast(stats)).withColumn(
        "s", F.sum((F.col("y") - F.col("mu")) / F.col("sd")).over(w)
    )
    cp = (
        walk.withColumn("peak", F.round(F.abs("s"), 4))
        .orderBy(F.desc("peak"), "day")
        .limit(1)
        .select(F.col("day").alias("change_day"))
    )
    before = F.col("day") <= F.col("change_day")
    return (
        daily.crossJoin(F.broadcast(cp))
        .groupBy("change_day")
        .agg(
            F.count(F.when(before, 1)).cast("long").alias("n_before"),
            F.count(F.when(~before, 1)).cast("long").alias("n_after"),
            F.round(
                F.regr_slope(
                    F.when(before, F.col("y")), F.when(before, F.col("x"))
                ),
                6,
            ).alias("slope_before"),
            F.round(
                F.regr_slope(
                    F.when(~before, F.col("y")), F.when(~before, F.col("x"))
                ),
                6,
            ).alias("slope_after"),
        )
        .select(
            "change_day", "n_before", "n_after", "slope_before", "slope_after"
        )
    )


@query(
    "q_runs_test",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, count(*) AS n FROM events GROUP BY 1
    ), med AS (SELECT median(n) AS m FROM daily),
    signs AS (
      SELECT day, CASE WHEN n > m THEN 1 ELSE 0 END AS s
      FROM daily CROSS JOIN med WHERE n <> m
    ), runs AS (
      SELECT s,
             CASE WHEN lag(s) OVER (ORDER BY day) IS NULL
                    OR lag(s) OVER (ORDER BY day) <> s
                  THEN 1 ELSE 0 END AS new_run
      FROM signs
    ), agg AS (
      SELECT sum(new_run) AS r, sum(s) AS n1, count(*) - sum(s) AS n2
      FROM runs
    )
    SELECT CAST(r AS BIGINT) AS n_runs, CAST(n1 AS BIGINT) AS n_above,
           CAST(n2 AS BIGINT) AS n_below,
           round((r - (2.0 * n1 * n2 / (n1 + n2) + 1))
             / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                    / (pow(n1 + n2, 2) * (n1 + n2 - 1))), 4) AS z
    FROM agg
    """,
)
def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the daily-count series (above/below
    the median, median-ties dropped per the standard recipe): too few
    runs ⇒ trending/sticky, too many ⇒ oscillating — the randomness
    gate before interpreting any autocorrelation. A run starts where
    lag(s) differs; counting run-starts is one window + one aggregate
    over the collapsed day table."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").alias("n")
    )
    med = daily.agg(F.median("n").alias("m"))
    signs = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("n") != F.col("m"))
        .select(
            "day", F.when(F.col("n") > F.col("m"), 1).otherwise(0).alias("s")
        )
    )
    w = Window.orderBy("day")
    runs = signs.select(
        "s",
        F.when(
            F.lag("s").over(w).isNull() | (F.lag("s").over(w) != F.col("s")),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    agg = runs.agg(
        F.sum("new_run").alias("r"),
        F.sum("s").alias("n1"),
        (F.count("*") - F.sum("s")).alias("n2"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    mu = 2.0 * n1 * n2 / (n1 + n2) + 1
    var = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        / (F.pow(n1 + n2, 2) * (n1 + n2 - 1))
    )
    return agg.select(
        r.cast("long").alias("n_runs"),
        n1.cast("long").alias("n_above"),
        n2.cast("long").alias("n_below"),
        F.round((r - mu) / F.sqrt(var), 4).alias("z"),
    )


@query(
    "q_ljung_box",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS DOUBLE) AS x
      FROM events GROUP BY 1
    ), mu AS (SELECT avg(x) AS m, count(*) AS n FROM daily),
    lagged AS (
      SELECT x - m AS e,
             lag(x, 1) OVER (ORDER BY day) - m AS e1,
             lag(x, 2) OVER (ORDER BY day) - m AS e2,
             lag(x, 3) OVER (ORDER BY day) - m AS e3,
             lag(x, 4) OVER (ORDER BY day) - m AS e4,
             lag(x, 5) OVER (ORDER BY day) - m AS e5,
             n
      FROM daily CROSS JOIN mu
    ), acf AS (
      SELECT max(n) AS n,
             sum(e * e) AS c0,
             sum(e * e1) AS c1, sum(e * e2) AS c2, sum(e * e3) AS c3,
             sum(e * e4) AS c4, sum(e * e5) AS c5
      FROM lagged
    )
    SELECT CAST(n AS BIGINT) AS n,
           round(c1 / c0, 6) AS rho1,
           round(n * (n + 2.0) * (
             pow(c1 / c0, 2) / (n - 1) + pow(c2 / c0, 2) / (n - 2)
             + pow(c3 / c0, 2) / (n - 3) + pow(c4 / c0, 2) / (n - 4)
             + pow(c5 / c0, 2) / (n - 5)), 4) AS lb_stat
    FROM acf
    """,
)
def q_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test (lags 1-5) on the daily series:
    Q = n(n+2)Σρ²ₖ/(n−k), the joint white-noise test that
    complements X126's single-lag ACF. All five lag products come
    from ONE window pass over the collapsed day table (5 lag columns,
    then one aggregate) — not five self-joins; χ²₅ critical value at
    5% is 11.07."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").cast("double").alias("x")
    )
    mu = daily.agg(F.avg("x").alias("m"), F.count("*").alias("n"))
    w = Window.orderBy("day")
    lagged = daily.crossJoin(F.broadcast(mu)).select(
        (F.col("x") - F.col("m")).alias("e"),
        *[
            (F.lag("x", k).over(w) - F.col("m")).alias(f"e{k}")
            for k in range(1, 6)
        ],
        "n",
    )
    acf = lagged.agg(
        F.max("n").alias("n"),
        F.sum(F.col("e") * F.col("e")).alias("c0"),
        *[
            F.sum(F.col("e") * F.col(f"e{k}")).alias(f"c{k}")
            for k in range(1, 6)
        ],
    )
    n = F.col("n")
    terms = sum(
        (
            F.pow(F.col(f"c{k}") / F.col("c0"), 2) / (n - k)
            for k in range(2, 6)
        ),
        F.pow(F.col("c1") / F.col("c0"), 2) / (n - 1),
    )
    return acf.select(
        n.cast("long").alias("n"),
        F.round(F.col("c1") / F.col("c0"), 6).alias("rho1"),
        F.round(n * (n + 2.0) * terms, 4).alias("lb_stat"),
    )


@query(
    "q_business_days",
    oracle="""
    WITH spans AS (
      SELECT o.o_orderpriority,
             date_diff('day', DATE '1970-01-01', o.o_orderdate) AS ea,
             date_diff('day', DATE '1970-01-01', max(l.l_shipdate)) AS eb
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderpriority, o.o_orderkey, o.o_orderdate
    ), counted AS (
      SELECT o_orderpriority, eb - ea AS cal_days,
             (5 * ((eb + 3) // 7) + least((eb + 3) % 7, 5))
             - (5 * ((ea + 3) // 7) + least((ea + 3) % 7, 5)) AS bus_days
      FROM spans WHERE eb >= ea
    )
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
           round(avg(cal_days), 4) AS avg_cal_days,
           round(avg(bus_days), 4) AS avg_bus_days
    FROM counted GROUP BY o_orderpriority
    """,
)
def q_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-day (Mon-Fri) lead time from order date to last
    shipment, per priority class — SLA reporting needs working days,
    not calendar days. No calendar explode and no UDF: weekdays in
    [epoch, d) has the closed form 5·⌊m/7⌋ + min(m mod 7, 5) with
    m = epoch-days + 3 (1970-01-01 was a Thursday, 3 days past
    Monday), so the span count is a difference of two such terms —
    pure integer arithmetic, identical in both engines, O(1) per row
    where a generate_series calendar join would be O(span)."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    epoch = F.lit("1970-01-01").cast("date")

    def g(e):
        m = e + 3
        return 5 * F.floor(m / 7) + F.least(m % 7, F.lit(5))

    spans = (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority", "o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("ship"))
        .select(
            "o_orderpriority",
            F.datediff(F.col("o_orderdate"), epoch).alias("ea"),
            F.datediff(F.col("ship"), epoch).alias("eb"),
        )
        .filter(F.col("eb") >= F.col("ea"))
    )
    counted = spans.select(
        "o_orderpriority",
        (F.col("eb") - F.col("ea")).alias("cal_days"),
        (g(F.col("eb")) - g(F.col("ea"))).alias("bus_days"),
    )
    return counted.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.round(F.avg("cal_days"), 4).alias("avg_cal_days"),
        F.round(F.avg("bus_days"), 4).alias("avg_bus_days"),
    )
