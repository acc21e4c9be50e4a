"""Time-series operators over the event stream: calendar gap-fill with
forward-fill, and event-time range-frame moving averages.

The reference processes events in arrival order with no event-time
semantics at all (SURVEY.md §2.8 T4) — these are the hypertable-style
operations a stream-analytics engine layers on top: densify a sparse
per-key series onto a regular calendar (gap-fill + LOCF interpolation)
and smooth it with a time-interval window frame.

Scale notes: gap-fill's calendar is generated per key from two scalar
bounds (a tiny broadcast), so the only real shuffle is the bucket
aggregate itself; the forward-fill window re-uses the same (key)
partitioning, and Spark's EnsureRequirements collapses the two exchanges
into one. The RANGE-frame moving average is a single window over
(key, time) — at 100 TB both partition by key and stay skew-safe as long
as per-key history fits an executor (else pre-aggregate to buckets first,
exactly what the gap-fill query does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load
from .registry import query


@query(
    "q_gap_fill",
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
             round(sum(value), 2) AS sum_v, count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT c.event_type, c.hr,
           coalesce(h.n, 0) AS n,
           CASE WHEN h.hr IS NULL THEN 1 ELSE 0 END AS is_gap,
           last_value(h.sum_v IGNORE NULLS) OVER (
             PARTITION BY c.event_type ORDER BY c.hr
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_v
    FROM calendar c LEFT JOIN hourly h
      ON c.event_type = h.event_type AND c.hr = h.hr
    """,
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification + forward-fill (LOCF): aggregate the sparse
    event stream to hourly buckets, expand every key onto the full hour
    calendar via ``sequence()`` + explode, left-join, and carry the last
    observed value across gaps with ``last(..., ignorenulls)``. The
    timescale "time_bucket_gapfill + locf" pattern in four declarative
    steps — no UDF, no driver loop."""
    e = load(spark, sf_dir, "events")
    hourly = (
        e.groupBy("event_type", F.date_trunc("hour", "ts").alias("hr"))
        .agg(F.round(F.sum("value"), 2).alias("sum_v"), F.count("*").alias("n"))
    )
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
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("hr"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        calendar.join(hourly, ["event_type", "hr"], "left")
        .select(
            "event_type",
            "hr",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.when(F.col("sum_v").isNull(), 1).otherwise(0).alias("is_gap"),
            F.last("sum_v", ignorenulls=True).over(w).alias("filled_v"),
        )
    )


@query(
    "q_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                          > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT *, CAST(sum(new_session) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM numbered GROUP BY user_id, session_id
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization by the gaps-and-islands pattern: flag a new
    session when the gap to the previous event (per user, ordered by
    (ts, event_id) — the unique tie-break keeps lag deterministic)
    exceeds 30 minutes, then a running sum of flags numbers the
    sessions. The BATCH twin of q_session_window's streaming
    ``session_window`` — same 30-minute timeout, but replayable over
    the historical log with a plain window, no state store. One shuffle
    on user_id serves both windows and the final aggregate."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    flagged = e.withColumn(
        "new_session",
        F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0),
    )
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = flagged.withColumn("session_id", F.sum("new_session").over(run))
    return numbered.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@query(
    "q_moving_avg",
    oracle="""
    SELECT event_id, event_type,
           round(avg(value) OVER (
             PARTITION BY event_type ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 6)
             AS mavg_1h,
           count(*) OVER (
             PARTITION BY event_type ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             AS n_in_window
    FROM events
    """,
)
def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time moving average: RANGE frame of the trailing hour per
    event type, keyed on microsecond epoch so the frame is a true time
    interval (not a row count — sparse and dense regions get the same
    1-hour lookback). Ties in ts land in the same frame in both engines
    (RANGE peers), so no tie-break column is needed."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return e.select(
        "event_id",
        "event_type",
        F.round(F.avg("value").over(w), 6).alias("mavg_1h"),
        F.count("*").over(w).alias("n_in_window"),
    )


@query(
    "q_scd2",
    oracle="""
    SELECT user_id, event_type, value AS version_value,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id, event_type
                          ORDER BY ts, event_id) AS valid_to,
           CASE WHEN lead(ts) OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS is_current
    FROM events
    """,
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 from a changelog: each version of
    a key gets a validity interval [valid_from, valid_to) with valid_to =
    next version's timestamp (NULL = still current). The interval table
    q_range_join / as-of lookups consume, built from the same log
    q_cdc_latest compacts — one lead() window on the key, deterministic
    via the (ts, event_id) tie-break. At scale: one shuffle on the key;
    incremental maintenance re-windows only keys present in the new
    batch plus their prior current rows."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return e.select(
        "user_id",
        "event_type",
        F.col("value").alias("version_value"),
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
    )


@query(
    "q_time_weighted_avg",
    oracle="""
    WITH d AS (
      SELECT event_type, value,
             epoch_us(lead(ts) OVER (PARTITION BY event_type
                                     ORDER BY ts, event_id))
               - epoch_us(ts) AS dt_us
      FROM events)
    SELECT event_type,
           round(sum(value * dt_us) / sum(dt_us), 6) AS twa,
           round(avg(value), 6) AS plain_avg,
           count(*) AS n_intervals
    FROM d WHERE dt_us IS NOT NULL GROUP BY event_type
    """,
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (the timescale `time_weight('LOCF')` shape):
    each observation holds until the next one, so its weight is the
    interval length — Σ v·Δt / Σ Δt. Irregularly-sampled series make
    plain avg() lie (burst periods dominate); the query returns both so
    the difference is visible. One lead() window then one aggregate,
    both on the same key partitioning."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    dt_us = F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")
    d = e.select("event_type", "value", dt_us.alias("dt_us")).filter(
        F.col("dt_us").isNotNull()
    )
    return d.groupBy("event_type").agg(
        F.round(F.sum(F.col("value") * F.col("dt_us")) / F.sum("dt_us"), 6).alias(
            "twa"
        ),
        F.round(F.avg("value"), 6).alias("plain_avg"),
        F.count("*").alias("n_intervals"),
    )


@query(
    "q_ohlc",
    oracle="""
    WITH ordered AS (
      SELECT event_type, date_trunc('hour', ts) AS hr, value,
             row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn_open,
             row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_close
      FROM events)
    SELECT event_type, hr,
           max(CASE WHEN rn_open = 1 THEN value END) AS open,
           round(max(value), 6) AS high,
           round(min(value), 6) AS low,
           max(CASE WHEN rn_close = 1 THEN value END) AS close,
           count(*) AS n_ticks,
           round(sum(value), 2) AS volume
    FROM ordered GROUP BY event_type, hr
    """,
)
def q_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick bars per (series, hour) — the financial rollup
    the reference's stock-announcement domain implies but never computes
    (its MySQL sinks store raw rows only, kafka_s.py:470-556). open and
    close are the first/last tick under the deterministic (ts, event_id)
    order, expressed as rank-1 conditional aggregates so the whole bar
    is ONE window pass + ONE aggregate on the same (series, bucket)
    key — no self-joins. This is also the continuous-rollup store shape
    (X39) a streaming deployment maintains incrementally."""
    e = load(spark, sf_dir, "events").withColumn(
        "hr", F.date_trunc("hour", "ts")
    )
    key = ["event_type", "hr"]
    asc = Window.partitionBy(*key).orderBy("ts", "event_id")
    desc = Window.partitionBy(*key).orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ordered = e.select(
        "event_type",
        "hr",
        "value",
        F.row_number().over(asc).alias("rn_open"),
        F.row_number().over(desc).alias("rn_close"),
    )
    return ordered.groupBy(*key).agg(
        F.max(F.when(F.col("rn_open") == 1, F.col("value"))).alias("open"),
        F.round(F.max("value"), 6).alias("high"),
        F.round(F.min("value"), 6).alias("low"),
        F.max(F.when(F.col("rn_close") == 1, F.col("value"))).alias("close"),
        F.count("*").alias("n_ticks"),
        F.round(F.sum("value"), 2).alias("volume"),
    )


@query(
    "q_max_concurrency",
    oracle="""
    WITH deltas AS (
      SELECT event_type, ts AS t, 1 AS delta, event_id FROM events
      UNION ALL
      SELECT event_type, ts + INTERVAL 10 MINUTE, -1, event_id FROM events
    ),
    run AS (
      SELECT event_type,
             CAST(sum(delta) OVER (
               PARTITION BY event_type ORDER BY t, delta, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS active
      FROM deltas
    )
    SELECT event_type, max(active) AS max_concurrent
    FROM run GROUP BY event_type
    """,
)
def q_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap analytics by sweep line: each event holds a
    resource for 10 minutes; the peak number of simultaneously-open
    intervals per event_type is the classic capacity-planning question
    the reference's single-threaded consumer could never ask
    (kafka_s.py:155-159 — one record in flight at a time).

    Sweep line as relational ops: explode each interval into a +1/-1
    delta row, running-sum per key in (time, delta) order (-1 sorts
    first, so touching intervals never overlap), take the max. Two
    narrow columns cross the shuffle; the window and the final max reuse
    ONE (event_type) partitioning. At 100 TB this stays a single
    pass — no interval self-join, which is the O(n²) trap."""
    e = load(spark, sf_dir, "events")
    starts = e.select(
        "event_type",
        F.col("ts").alias("t"),
        F.lit(1).alias("delta"),
        "event_id",
    )
    ends = e.select(
        "event_type",
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("t"),
        F.lit(-1).alias("delta"),
        "event_id",
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = starts.union(ends).withColumn("active", F.sum("delta").over(w))
    return run.groupBy("event_type").agg(
        F.max("active").alias("max_concurrent")
    )


_EWMA_ALPHA = 0.25
_EWMA_DEPTH = 16


def _ewma_weights() -> list[float]:
    return [(1.0 - _EWMA_ALPHA) ** k for k in range(_EWMA_DEPTH)]


@query(
    "q_ewma",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_id, value,
             {', '.join(f"lag(value, {k}) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS l{k}" for k in range(1, _EWMA_DEPTH))}
      FROM events
    )
    SELECT user_id, event_id, round(value, 6) AS value,
           round((value
                  {' '.join(f"+ CASE WHEN l{k} IS NOT NULL THEN l{k} * {(1.0 - _EWMA_ALPHA) ** k!r} ELSE 0 END" for k in range(1, _EWMA_DEPTH))})
                 / (1
                  {' '.join(f"+ CASE WHEN l{k} IS NOT NULL THEN {(1.0 - _EWMA_ALPHA) ** k!r} ELSE 0 END" for k in range(1, _EWMA_DEPTH))}),
                 6) AS ewma
    FROM ordered
    """,
)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per user series — the decay
    smoothing every monitoring/trading stack wants and the reference's
    row-at-a-time loop could only do with driver-held state. Bounded to
    the last 16 observations (weight (1-α)^k < 1% beyond that at
    α=0.25) and normalized over the weights actually present, so the
    expression is a FIXED unrolled sum of lag() terms: one window pass,
    whole-stage codegen, zero driver state, identical semantics in the
    SQL oracle. At 100 TB it partitions by user and scales like any
    other single window."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    weights = _ewma_weights()
    lags = [F.col("value")] + [
        F.lag("value", k).over(w) for k in range(1, _EWMA_DEPTH)
    ]
    num = lags[0]
    den = F.lit(1.0)
    for k in range(1, _EWMA_DEPTH):
        num = num + F.when(lags[k].isNotNull(), lags[k] * weights[k]).otherwise(0.0)
        den = den + F.when(lags[k].isNotNull(), F.lit(weights[k])).otherwise(0.0)
    return e.select(
        "user_id",
        "event_id",
        F.round("value", 6).alias("value"),
        F.round(num / den, 6).alias("ewma"),
    )


@query(
    "q_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ),
    t AS (
      SELECT prev_type, event_type, count(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, event_type, n,
           round(n * 1.0 / CAST(sum(n) OVER (PARTITION BY prev_type)
                                AS BIGINT), 6) AS p
    FROM t
    """,
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current) — the sequence-mining
    summary behind session-flow and funnel diagnostics (the model the
    CEP operator q_event_pattern matches against, learned from data).

    One lag() window in (user, time) order, one (prev, next) count
    aggregate, and a vocabulary-sized window normalization — the big
    data crosses the wire once, partitioned by user; the transition
    table itself is |types|² rows."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    t = seq.groupBy("prev_type", "event_type").agg(F.count("*").alias("n"))
    tot = Window.partitionBy("prev_type")
    return t.select(
        "prev_type",
        "event_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(tot), 6).alias("p"),
    )
