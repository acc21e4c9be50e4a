"""Round-4 breadth, part K: rolling regression beta, seasonality
strength, peak detection, hash-split uplift, and
difference-in-differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import hashing
from ..sources.tables import load
from .registry import query

# ---------------------------------------------------------------------------
# X332 — rolling regression slope (trailing beta)
# ---------------------------------------------------------------------------


@query(
    "q_rolling_beta",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(count(*) AS DOUBLE) AS v,
             CAST(date_diff('day', DATE '2024-01-01',
                            CAST(date_trunc('day', ts) AS DATE)) AS DOUBLE)
               AS t
      FROM events GROUP BY 1, 2
    ), win AS (
      SELECT event_type, d,
             count(*) OVER w AS n,
             sum(t) OVER w AS st, sum(v) OVER w AS sv,
             sum(t * v) OVER w AS stv, sum(t * t) OVER w AS stt
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, d,
           round((n * stv - st * sv) / (n * stt - st * st), 6) AS beta
    FROM win WHERE n = 14
    """,
)
def q_rolling_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X332 — rolling regression slope: the 14-day trailing OLS beta of
    daily event volume on time per series — the trend-strength signal
    X154's rolling correlation normalizes away (corr says 'moving
    together'; beta says 'how fast'). All five sufficient statistics
    come from ONE shared trailing frame (WINDOW clause / reused
    WindowSpec), so it costs a single partitioned sort — not five."""
    daily = load(spark, sf_dir, "events").groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).agg(F.count("*").cast("double").alias("v"))
    daily = daily.withColumn(
        "t",
        F.datediff(F.col("d"), F.lit("2024-01-01").cast("date")).cast(
            "double"
        ),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-13, 0)
    )
    win = daily.select(
        "event_type",
        "d",
        F.count("*").over(w).alias("n"),
        F.sum("t").over(w).alias("st"),
        F.sum("v").over(w).alias("sv"),
        F.sum(F.col("t") * F.col("v")).over(w).alias("stv"),
        F.sum(F.col("t") * F.col("t")).over(w).alias("stt"),
    )
    beta = (F.col("n") * F.col("stv") - F.col("st") * F.col("sv")) / (
        F.col("n") * F.col("stt") - F.col("st") * F.col("st")
    )
    return win.filter(F.col("n") == 14).select(
        "event_type", "d", F.round(beta, 6).alias("beta")
    )


# ---------------------------------------------------------------------------
# X333 — seasonality strength (STL variance ratio)
# ---------------------------------------------------------------------------


@query(
    "q_seasonality_strength",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ), trended AS (
      SELECT event_type, d, n,
             avg(CAST(n AS DOUBLE)) OVER (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS trend
      FROM daily
    ), seasonal AS (
      SELECT event_type, d, n, trend,
             avg(n - trend) OVER (
               PARTITION BY event_type,
                            date_diff('day', DATE '1995-01-01', d) % 7)
               AS seas
      FROM trended
    ), parts AS (
      SELECT event_type,
             count(*) AS n_days,
             sum((n - trend) * (n - trend)) / count(*)
               - pow(sum(n - trend) / count(*), 2) AS var_detr,
             sum((n - trend - seas) * (n - trend - seas)) / count(*)
               - pow(sum(n - trend - seas) / count(*), 2) AS var_resid
      FROM seasonal GROUP BY event_type
    )
    SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
           round(var_detr, 4) AS var_detrended,
           round(var_resid, 4) AS var_residual,
           round(greatest(0.0, 1.0 - var_resid / var_detr), 6)
             AS seasonal_strength
    FROM parts
    """,
)
def q_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X333 — seasonality strength (Hyndman's F_s = max(0, 1 −
    var(resid)/var(detrended)) from the X274 STL parts): the one-number
    'does this series deserve a seasonal model' gate that decides
    between X218's Holt and a seasonal variant, and ranks thousands of
    series by seasonality for monitoring. Same two windows as X274
    plus one variance rollup; population variances spelled as explicit
    moment arithmetic."""
    daily = load(spark, sf_dir, "events").groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).agg(F.count("*").alias("n"))
    w_tr = Window.partitionBy("event_type").orderBy("d").rowsBetween(-3, 3)
    trended = daily.withColumn(
        "trend", F.avg(F.col("n").cast("double")).over(w_tr)
    )
    dow = F.datediff(F.col("d"), F.lit("1995-01-01").cast("date")) % 7
    seasonal = trended.withColumn(
        "seas",
        F.avg(F.col("n") - F.col("trend")).over(
            Window.partitionBy("event_type", dow)
        ),
    )
    detr = F.col("n") - F.col("trend")
    resid = detr - F.col("seas")
    parts = seasonal.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        (
            F.sum(detr * detr) / F.count("*")
            - F.pow(F.sum(detr) / F.count("*"), 2)
        ).alias("var_detr"),
        (
            F.sum(resid * resid) / F.count("*")
            - F.pow(F.sum(resid) / F.count("*"), 2)
        ).alias("var_resid"),
    )
    return parts.select(
        "event_type",
        F.col("n_days").cast("long").alias("n_days"),
        F.round("var_detr", 4).alias("var_detrended"),
        F.round("var_resid", 4).alias("var_residual"),
        F.round(
            F.greatest(F.lit(0.0), 1.0 - F.col("var_resid") / F.col("var_detr")),
            6,
        ).alias("seasonal_strength"),
    )


# ---------------------------------------------------------------------------
# X334 — peak detection with prominence floor
# ---------------------------------------------------------------------------


@query(
    "q_peaks",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(count(*) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    ), ctx AS (
      SELECT event_type, d, v,
             lag(v) OVER w AS pv, lead(v) OVER w AS nv,
             avg(v) OVER (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS loc_mean
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY d)
    )
    SELECT event_type, d, round(v, 1) AS v,
           round(v - loc_mean, 4) AS prominence
    FROM ctx
    WHERE pv IS NOT NULL AND nv IS NOT NULL
      AND v > pv AND v >= nv
      AND v - loc_mean >= 5.0
    """,
)
def q_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X334 — peak detection: strict local maxima (v > prev, v >= next
    — the asymmetric tie rule that keeps plateau edges from double-
    reporting) with a prominence floor of 5 events over the centered
    7-day local mean — the alerting primitive between X178's global
    z-score (misses local spikes on trends) and X210's CUSUM (detects
    level SHIFTS, not spikes). Two windows per series, both
    partitioned."""
    daily = load(spark, sf_dir, "events").groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).agg(F.count("*").cast("double").alias("v"))
    w = Window.partitionBy("event_type").orderBy("d")
    ctx = daily.select(
        "event_type",
        "d",
        "v",
        F.lag("v").over(w).alias("pv"),
        F.lead("v").over(w).alias("nv"),
        F.avg("v").over(w.rowsBetween(-3, 3)).alias("loc_mean"),
    )
    return ctx.filter(
        F.col("pv").isNotNull()
        & F.col("nv").isNotNull()
        & (F.col("v") > F.col("pv"))
        & (F.col("v") >= F.col("nv"))
        & (F.col("v") - F.col("loc_mean") >= 5.0)
    ).select(
        "event_type",
        "d",
        F.round("v", 1).alias("v"),
        F.round(F.col("v") - F.col("loc_mean"), 4).alias("prominence"),
    )


# ---------------------------------------------------------------------------
# X335 — hash-split uplift report
# ---------------------------------------------------------------------------


@query(
    "q_uplift",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             {hashing.token_hash_sql("'t:' || CAST(user_id AS VARCHAR)")}
               % 2 = 0 AS treated,
             CASE WHEN sum(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) >= 14
                  THEN 1 ELSE 0 END AS converted
      FROM events GROUP BY user_id
    ), g AS (
      SELECT treated, count(*) AS n, sum(converted) AS k,
             sum(converted) * 1.0 / count(*) AS p
      FROM u GROUP BY treated
    )
    SELECT t.n AS n_treated, CAST(t.k AS BIGINT) AS conv_treated,
           c.n AS n_control, CAST(c.k AS BIGINT) AS conv_control,
           round(t.p - c.p, 6) AS uplift,
           round((t.p - c.p)
                 / sqrt(t.p * (1 - t.p) / t.n + c.p * (1 - c.p) / c.n), 6)
             AS z
    FROM (SELECT * FROM g WHERE treated) t
    CROSS JOIN (SELECT * FROM g WHERE NOT treated) c
    """,
)
def q_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X335 — uplift report over a deterministic hash split: users
    assigned to treatment by key hash (the X60 split discipline — the
    assignment every real experiment platform uses, reproducible and
    join-free), per-arm conversion (user made >= 14
    purchases — the synthetic stream's every-user-buys saturation makes
    the raw any-purchase rate degenerate at 1.0), absolute uplift, and
    the unpooled two-proportion z — X199's test composed with hash assignment into
    the one-stop experiment readout. Two rollups, one broadcast
    combine."""
    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        (
            F.sum((F.col("event_type") == "purchase").cast("int")) >= 14
        ).cast("int").alias("converted")
    ).withColumn(
        "treated",
        hashing.token_hash(
            F.concat(F.lit("t:"), F.col("user_id").cast("string"))
        )
        % 2
        == 0,
    )
    g = u.groupBy("treated").agg(
        F.count("*").alias("n"),
        F.sum("converted").alias("k"),
        (F.sum("converted") * 1.0 / F.count("*")).alias("p"),
    )
    t = g.filter("treated").select(
        F.col("n").alias("n_treated"),
        F.col("k").cast("long").alias("conv_treated"),
        F.col("p").alias("pt"),
    )
    c = g.filter("NOT treated").select(
        F.col("n").alias("n_control"),
        F.col("k").cast("long").alias("conv_control"),
        F.col("p").alias("pc"),
    )
    se = F.sqrt(
        F.col("pt") * (1 - F.col("pt")) / F.col("n_treated")
        + F.col("pc") * (1 - F.col("pc")) / F.col("n_control")
    )
    return t.crossJoin(F.broadcast(c)).select(
        "n_treated",
        "conv_treated",
        "n_control",
        "conv_control",
        F.round(F.col("pt") - F.col("pc"), 6).alias("uplift"),
        F.round((F.col("pt") - F.col("pc")) / se, 6).alias("z"),
    )


# ---------------------------------------------------------------------------
# X336 — difference-in-differences
# ---------------------------------------------------------------------------


@query(
    "q_did",
    oracle="""
    WITH cells AS (
      SELECT c.c_mktsegment = 'BUILDING' AS treated,
             year(o.o_orderdate) >= 1999 AS post,
             count(*) AS n,
             avg(o.o_totalprice) AS m,
             var_samp(o.o_totalprice) AS v
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE year(o.o_orderdate) BETWEEN 1997 AND 2000
      GROUP BY 1, 2
    )
    SELECT round(tt.m - tc.m - (ct.m - cc.m), 2) AS did_estimate,
           round(sqrt(tt.v / tt.n + tc.v / tc.n + ct.v / ct.n + cc.v / cc.n),
                 2) AS se,
           round((tt.m - tc.m - (ct.m - cc.m))
                 / sqrt(tt.v / tt.n + tc.v / tc.n + ct.v / ct.n + cc.v / cc.n),
                 6) AS z,
           CAST(tt.n + tc.n + ct.n + cc.n AS BIGINT) AS n_orders
    FROM (SELECT * FROM cells WHERE treated AND post) tt
    CROSS JOIN (SELECT * FROM cells WHERE treated AND NOT post) tc
    CROSS JOIN (SELECT * FROM cells WHERE NOT treated AND post) ct
    CROSS JOIN (SELECT * FROM cells WHERE NOT treated AND NOT post) cc
    """,
)
def q_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X336 — difference-in-differences: (treated post − treated pre)
    − (control post − control pre) on mean order value, BUILDING
    segment as the treated group and 1999 as the policy break — the
    workhorse quasi-experimental estimator when you can't randomize
    (X335's uplift needs assignment; DiD needs only parallel trends).
    SE from the four cells' variances (Welch-style). One joined rollup
    into a 2x2 cell table + scalar algebra."""
    o = load(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").between(1997, 2000)
    )
    c = load(spark, sf_dir, "customer")
    cells = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            (F.col("c_mktsegment") == "BUILDING").alias("treated"),
            (F.year("o_orderdate") >= 1999).alias("post"),
        )
        .agg(
            F.count("*").alias("n"),
            F.avg("o_totalprice").alias("m"),
            F.var_samp("o_totalprice").alias("v"),
        )
    )

    def cell(tr: bool, po: bool, tag: str) -> DataFrame:
        return cells.filter(
            (F.col("treated") == tr) & (F.col("post") == po)
        ).select(
            F.col("n").alias(f"n_{tag}"),
            F.col("m").alias(f"m_{tag}"),
            F.col("v").alias(f"v_{tag}"),
        )

    j = (
        cell(True, True, "tt")
        .crossJoin(F.broadcast(cell(True, False, "tc")))
        .crossJoin(F.broadcast(cell(False, True, "ct")))
        .crossJoin(F.broadcast(cell(False, False, "cc")))
    )
    did = F.col("m_tt") - F.col("m_tc") - (F.col("m_ct") - F.col("m_cc"))
    se = F.sqrt(
        F.col("v_tt") / F.col("n_tt")
        + F.col("v_tc") / F.col("n_tc")
        + F.col("v_ct") / F.col("n_ct")
        + F.col("v_cc") / F.col("n_cc")
    )
    return j.select(
        F.round(did, 2).alias("did_estimate"),
        F.round(se, 2).alias("se"),
        F.round(did / se, 6).alias("z"),
        (
            F.col("n_tt") + F.col("n_tc") + F.col("n_ct") + F.col("n_cc")
        ).cast("long").alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# X337 — ranking-quality evaluation (MRR + NDCG of the IVF index)
# ---------------------------------------------------------------------------


def _rank_eval_oracle() -> str:
    from .llm_ext import _exact_topk_oracle, _ivf_oracle

    return f"""
    WITH exact3 AS (
      SELECT q_id, n_id, rn AS ern FROM ({_exact_topk_oracle(3)})
    ), ivf AS (
      SELECT q_id, n_id, rn FROM ({_ivf_oracle()})
    ), judged AS (
      SELECT i.q_id, i.rn,
             COALESCE(4 - e.ern, 0) AS rel
      FROM ivf i LEFT JOIN exact3 e
        ON e.q_id = i.q_id AND e.n_id = i.n_id
    ), idcg AS (
      SELECT 3.0 / log2(2) + 2.0 / log2(3) + 1.0 / log2(4) AS v
    )
    SELECT j.q_id,
           round(sum(j.rel / log2(j.rn + 1)) / max(idcg.v), 6) AS ndcg_at_3,
           round(COALESCE(1.0 / min(CASE WHEN j.rel > 0 THEN j.rn END), 0.0),
                 6) AS mrr
    FROM judged j CROSS JOIN idcg GROUP BY j.q_id
    """


@query("q_rank_eval", oracle=_rank_eval_oracle())
def q_rank_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X337 — graded ranking evaluation of the IVF index: NDCG@3
    (relevance 3/2/1 for the exact top-3 neighbors, position-discounted
    by 1/log2(rank+1)) and MRR (reciprocal rank of the first truly-
    relevant hit) per query — the ORDER-aware metrics X86's recall@k
    can't see (an index that returns the right set in the wrong order
    scores identical recall but lower NDCG). Both pipelines run as
    queries; the judgment join is keys-only."""
    from .llm_ext import q_ann_ivf, q_cosine_topk

    exact3 = q_cosine_topk(spark, sf_dir).filter(F.col("rn") <= 3).select(
        F.col("q_id").alias("e_q"),
        F.col("n_id").alias("e_n"),
        F.col("rn").alias("ern"),
    )
    ivf = q_ann_ivf(spark, sf_dir).select("q_id", "n_id", "rn")
    judged = ivf.join(
        exact3,
        (F.col("q_id") == F.col("e_q")) & (F.col("n_id") == F.col("e_n")),
        "left",
    ).select(
        "q_id",
        "rn",
        F.coalesce(4 - F.col("ern"), F.lit(0)).alias("rel"),
    )
    idcg = (
        F.lit(3.0) / F.log2(F.lit(2.0))
        + F.lit(2.0) / F.log2(F.lit(3.0))
        + F.lit(1.0) / F.log2(F.lit(4.0))
    )
    return judged.groupBy("q_id").agg(
        F.round(
            F.sum(F.col("rel") / F.log2(F.col("rn") + 1)) / idcg, 6
        ).alias("ndcg_at_3"),
        F.round(
            F.coalesce(
                1.0
                / F.min(F.when(F.col("rel") > 0, F.col("rn"))),
                F.lit(0.0),
            ),
            6,
        ).alias("mrr"),
    )


# ---------------------------------------------------------------------------
# X338 — event-time lateness audit (watermark sizing)
# ---------------------------------------------------------------------------


@query(
    "q_lateness_audit",
    oracle="""
    WITH arr AS (
      SELECT event_type, ts,
             max(ts) OVER (PARTITION BY event_type ORDER BY event_id
               ROWS UNBOUNDED PRECEDING) AS high_water
      FROM events
    ), late AS (
      SELECT event_type,
             greatest(0, date_diff('second', ts, high_water)) AS late_s
      FROM arr
    )
    SELECT event_type, count(*) AS n_events,
           CAST(sum(CASE WHEN late_s > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_late,
           CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY late_s)
             AS BIGINT) AS p50_late_s,
           CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY late_s)
             AS BIGINT) AS p95_late_s,
           CAST(max(late_s) AS BIGINT) AS max_late_s
    FROM late GROUP BY event_type
    """,
)
def q_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X338 — out-of-orderness audit: per stream, how far behind the
    running event-time high-water mark (in ARRIVAL order — event_id
    here) events actually arrive — the empirical distribution that
    SIZES the watermark every windowed query in this engine declares
    (T4/E7/X72: a 2-hour allowance is a claim; this query is the
    evidence). p95/max lateness say what a given allowance would drop;
    discrete percentiles for the X134 determinism rule. One window in
    arrival order + one rollup."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    arr = ev.select(
        "event_type",
        "ts",
        F.max("ts").over(w).alias("high_water"),
    )
    late = arr.select(
        "event_type",
        F.greatest(
            F.lit(0),
            F.unix_timestamp("high_water") - F.unix_timestamp("ts"),
        ).alias("late_s"),
    )
    return late.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum((F.col("late_s") > 0).cast("long")).alias("n_late"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY late_s)")
        .cast("long")
        .alias("p50_late_s"),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY late_s)")
        .cast("long")
        .alias("p95_late_s"),
        F.max("late_s").cast("long").alias("max_late_s"),
    )
