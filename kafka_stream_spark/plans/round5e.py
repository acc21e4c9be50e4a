"""Round-5 batch E: dynamic causal, session tuning, tail risk, serial-
error regression — plus two streaming-engine rows registered in
streaming/pipeline.py (X545 dropDuplicatesWithinWatermark dedup, X546
state-store reader) with pytest witnesses.

Gated here: the DiD event study (X541 — the leads/lags plot every
modern applied panel analysis reports, extending X336's static DiD),
session gap-threshold sweep (X542 — the sessionization-parameter
frontier, sibling of X503's watermark advisor), empirical tail
dependence (X543 — the copula-tail risk number correlation misses),
and Cochrane-Orcutt AR(1)-corrected trend regression (X544 — closing
the loop between X64's OLS and X257's Ljung-Box: when the diagnostic
fires, this is the fix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load
from .registry import query

# ---------------------------------------------------------------------------
# X541 — difference-in-differences event study (leads and lags)
# ---------------------------------------------------------------------------

_ES_POLICY = "1998-01-01"
_ES_SPAN = 4


@query(
    "q_event_study",
    oracle=f"""
    WITH f AS (
      SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
               AS treat,
             CAST(datediff('month', TIMESTAMP '{_ES_POLICY}',
                           date_trunc('month', o.o_orderdate)) AS INTEGER)
               AS rel_month,
             o.o_totalprice AS y
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), g AS (
      SELECT rel_month, treat, count(*) AS n,
             round(sum(y), 2) AS s
      FROM f WHERE rel_month BETWEEN -{_ES_SPAN} AND {_ES_SPAN}
      GROUP BY rel_month, treat
    ), d AS (
      SELECT rel_month,
             max(CASE WHEN treat = 1 THEN s / n END)
             - max(CASE WHEN treat = 0 THEN s / n END) AS diff
      FROM g GROUP BY rel_month
    ), ref AS (SELECT diff AS d0 FROM d WHERE rel_month = -1)
    SELECT rel_month, round(diff, 4) AS diff,
           round(diff - (SELECT d0 FROM ref), 4) AS es_coef,
           rel_month >= 0 AS post
    FROM d
    """,
)
def q_event_study(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X541 — DiD EVENT STUDY: per relative month k ∈ [−{_ES_SPAN},
    {_ES_SPAN}] around the policy date, the treated-vs-control gap in
    mean order value, normalized to k = −1 (the standard leads/lags
    specification).  Pre-period coefficients ≈ 0 are the parallel-
    trends diagnostic that X336's single post-coefficient DiD silently
    assumes; this query PRINTS that diagnostic.

    Means are rounded-sum / count ratios (engine-exact); the k = −1
    reference is a broadcast scalar.  Scale: one fact pass into an
    18-cell aggregate."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    f = o.join(
        F.broadcast(c.select("c_custkey", "c_mktsegment")),
        o.o_custkey == F.col("c_custkey"),
    ).select(
        F.when(F.col("c_mktsegment") == "BUILDING", 1)
        .otherwise(0)
        .alias("treat"),
        (
            F.months_between(
                F.date_trunc("month", "o_orderdate"),
                F.lit(_ES_POLICY).cast("timestamp"),
            )
        )
        .cast("int")
        .alias("rel_month"),
        F.col("o_totalprice").alias("y"),
    )
    g = (
        f.filter(F.col("rel_month").between(-_ES_SPAN, _ES_SPAN))
        .groupBy("rel_month", "treat")
        .agg(F.count("*").alias("n"), F.round(F.sum("y"), 2).alias("s"))
    )
    d = g.groupBy("rel_month").agg(
        (
            F.max(F.when(F.col("treat") == 1, F.col("s") / F.col("n")))
            - F.max(F.when(F.col("treat") == 0, F.col("s") / F.col("n")))
        ).alias("diff")
    )
    ref = d.filter(F.col("rel_month") == -1).select(
        F.col("diff").alias("d0")
    )
    return d.crossJoin(F.broadcast(ref)).select(
        "rel_month",
        F.round("diff", 4).alias("diff"),
        F.round(F.col("diff") - F.col("d0"), 4).alias("es_coef"),
        (F.col("rel_month") >= 0).alias("post"),
    )


# ---------------------------------------------------------------------------
# X542 — sessionization gap-threshold sweep
# ---------------------------------------------------------------------------

_GAPS_MIN = (5, 15, 30, 60)


@query(
    "q_session_gap_sweep",
    oracle=f"""
    WITH g AS (
      SELECT user_id,
             CAST(epoch_us(ts) - epoch_us(lag(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id)) AS DOUBLE)
               / 1000000.0 / 60 AS gap_min
      FROM events
    ), nu AS (SELECT count(DISTINCT user_id) AS n_users FROM events),
    sw AS (
      SELECT thr.t AS gap_threshold_min,
             count(CASE WHEN g.gap_min > thr.t THEN 1 END) AS n_breaks
      FROM g CROSS JOIN (SELECT unnest([{", ".join(str(t) for t in _GAPS_MIN)}])
                          AS t) thr
      GROUP BY thr.t
    )
    SELECT CAST(gap_threshold_min AS BIGINT) AS gap_threshold_min,
           CAST(n_breaks + nu.n_users AS BIGINT) AS n_sessions,
           round((n_breaks + nu.n_users) * 1.0 / nu.n_users, 6)
             AS sessions_per_user
    FROM sw CROSS JOIN nu
    """,
)
def q_session_gap_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X542 — sessionization-parameter sweep: session counts at gap
    thresholds {_GAPS_MIN} minutes, computed from ONE pass of per-user
    inter-event gaps (each threshold is a conditional count over the
    same gap column — no re-sessionization per candidate).  The
    tuning-curve companion to X71/E9 (which sessionize at a FIXED
    gap) and the session analog of X503's watermark advisor: where
    the curve's elbow sits is how practitioners pick the timeout.

    Counts are integers; sessions = breaks + users exactly.  Scale:
    one user-partitioned window over the facts, then a 4-row
    aggregate; the threshold grid is a broadcast literal."""
    ev = load(spark, sf_dir, "events")
    wg = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id",
        (
            (
                F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(wg)
            ).cast("double")
            / 1000000.0
            / 60
        ).alias("gap_min"),
    )
    nu = ev.agg(F.countDistinct("user_id").alias("n_users"))
    thr = spark.sql(
        f"SELECT explode(array({', '.join(str(t) for t in _GAPS_MIN)}))"
        " AS t"
    )
    sw = (
        g.crossJoin(F.broadcast(thr))
        .groupBy("t")
        .agg(
            F.count(
                F.when(F.col("gap_min") > F.col("t"), 1)
            ).alias("n_breaks")
        )
    )
    return sw.crossJoin(F.broadcast(nu)).select(
        F.col("t").cast("long").alias("gap_threshold_min"),
        (F.col("n_breaks") + F.col("n_users")).cast("long").alias(
            "n_sessions"
        ),
        F.round(
            (F.col("n_breaks") + F.col("n_users")) / F.col("n_users"), 6
        ).alias("sessions_per_user"),
    )


# ---------------------------------------------------------------------------
# X543 — empirical tail dependence
# ---------------------------------------------------------------------------

_TAIL_QS = (0.9, 0.95)


@query(
    "q_tail_dependence",
    oracle=f"""
    WITH cu AS (
      SELECT o_custkey,
             round(avg(o_totalprice), 6) AS x,
             round(max(o_totalprice), 6) AS y
      FROM orders GROUP BY o_custkey
    ), r AS (
      SELECT x, y,
             row_number() OVER (ORDER BY x, o_custkey) AS rx,
             row_number() OVER (ORDER BY y, o_custkey) AS ry,
             count(*) OVER () AS n
      FROM cu
    ), qgrid AS (SELECT CAST(unnest(
                   [{", ".join(str(q) for q in _TAIL_QS)}]) AS DOUBLE)
                   AS q),
    j AS (
      SELECT qg.q, r.n,
             CASE WHEN r.rx > ceil(qg.q * r.n)
                   AND r.ry > ceil(qg.q * r.n) THEN 1 ELSE 0 END AS up,
             CASE WHEN r.rx <= floor((1 - qg.q) * r.n)
                   AND r.ry <= floor((1 - qg.q) * r.n) THEN 1 ELSE 0
               END AS lo
      FROM r CROSS JOIN qgrid qg
    )
    SELECT q, CAST(any_value(n) AS BIGINT) AS n,
           round(sum(up) * 1.0
                 / (any_value(n) - ceil(q * any_value(n))), 6)
             AS lambda_upper,
           round(sum(lo) * 1.0
                 / greatest(floor((1 - q) * any_value(n)), 1), 6)
             AS lambda_lower
    FROM j GROUP BY q
    """,
)
def q_tail_dependence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X543 — empirical tail-dependence coefficients between a
    customer's MEAN and MAX order value: λ_U(q) = P(both above their
    q-quantile)/(1−q) and λ_L(q) mirrored in the lower tail, at
    q ∈ {_TAIL_QS}.  The copula-tail number that Pearson/Spearman
    (X249/X261) cannot see — two metrics can correlate 0.9 overall
    yet decouple exactly in the extreme tail (or vice versa), which
    is where risk lives (the EVT family X349/X476 models one margin;
    this measures the JOINT tail).

    Rank-based: quantile membership via row_number with key
    tie-breaks, so both engines pick identical tail sets; λ's are
    count ratios.  Scale: two global rank windows (sortable by any
    range-partitioner at volume) + a grid aggregate."""
    o = load(spark, sf_dir, "orders")
    cu = o.groupBy("o_custkey").agg(
        F.round(F.avg("o_totalprice"), 6).alias("x"),
        F.round(F.max("o_totalprice"), 6).alias("y"),
    )
    r = cu.select(
        "x",
        "y",
        F.row_number().over(Window.orderBy("x", "o_custkey")).alias("rx"),
        F.row_number().over(Window.orderBy("y", "o_custkey")).alias("ry"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    qg = spark.sql(
        "SELECT explode(array("
        + ", ".join(f"CAST({q} AS DOUBLE)" for q in _TAIL_QS)
        + ")) AS q"
    )
    j = r.crossJoin(F.broadcast(qg)).select(
        "q",
        "n",
        F.when(
            (F.col("rx") > F.ceil(F.col("q") * F.col("n")))
            & (F.col("ry") > F.ceil(F.col("q") * F.col("n"))),
            1,
        )
        .otherwise(0)
        .alias("up"),
        F.when(
            (F.col("rx") <= F.floor((1 - F.col("q")) * F.col("n")))
            & (F.col("ry") <= F.floor((1 - F.col("q")) * F.col("n"))),
            1,
        )
        .otherwise(0)
        .alias("lo"),
    )
    return j.groupBy("q").agg(
        F.first("n").cast("long").alias("n"),
        F.round(
            F.sum("up")
            / (F.first("n") - F.ceil(F.col("q") * F.first("n"))),
            6,
        ).alias("lambda_upper"),
        F.round(
            F.sum("lo")
            / F.greatest(
                F.floor((1 - F.col("q")) * F.first("n")), F.lit(1)
            ),
            6,
        ).alias("lambda_lower"),
    )


# ---------------------------------------------------------------------------
# X544 — Cochrane-Orcutt AR(1)-corrected trend regression
# ---------------------------------------------------------------------------


@query(
    "q_cochrane_orcutt",
    oracle="""
    WITH m0 AS (
      SELECT date_trunc('month', o_orderdate) AS mon,
             round(sum(o_totalprice) / 1e6, 6) AS y
      FROM orders GROUP BY 1
    ), tx AS (
      SELECT y, row_number() OVER (ORDER BY mon) AS t FROM m0
    ), s AS (
      SELECT count(*) AS n, round(sum(t), 4) AS sx,
             round(sum(y), 4) AS sy, round(sum(t * t), 4) AS sxx,
             round(sum(t * y), 4) AS sxy
      FROM tx
    ), ols AS (
      SELECT n,
             (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
             (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
               AS a
      FROM s
    ), e AS (
      SELECT tx.t, tx.y - ols.a - ols.b * tx.t AS e,
             lag(tx.y - ols.a - ols.b * tx.t)
               OVER (ORDER BY tx.t) AS ep,
             lag(tx.y) OVER (ORDER BY tx.t) AS yp,
             tx.y, ols.a AS a0, ols.b AS b0
      FROM tx CROSS JOIN ols
    ), rho AS (
      SELECT any_value(a0) AS a0, any_value(b0) AS b0,
             sum(e * ep) / sum(ep * ep) AS rho
      FROM e WHERE ep IS NOT NULL
    ), star AS (
      SELECT e.y - r.rho * e.yp AS ys,
             e.t - r.rho * (e.t - 1) AS xs,
             r.rho, r.a0, r.b0
      FROM e CROSS JOIN rho r WHERE e.yp IS NOT NULL
    ), s2 AS (
      SELECT any_value(rho) AS rho, any_value(a0) AS a0,
             any_value(b0) AS b0,
             count(*) AS n, sum(xs) AS sx, sum(ys) AS sy,
             sum(xs * xs) AS sxx, sum(xs * ys) AS sxy
      FROM star
    )
    SELECT round(rho, 6) AS rho_ar1,
           round(b0, 6) AS slope_ols,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
             AS slope_co,
           round(((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                  / n) / (1 - rho), 6) AS intercept_co
    FROM s2
    """,
)
def q_cochrane_orcutt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X544 — Cochrane-Orcutt estimation of the monthly-revenue trend:
    OLS first pass → AR(1) coefficient ρ from the residual lag
    regression → quasi-differenced re-fit (y*ₜ = yₜ − ρyₜ₋₁ on
    x*ₜ = t − ρ(t−1)), intercept recovered by /(1−ρ).  This is the
    textbook FIX for what X257 (Ljung-Box) diagnoses: serially
    correlated errors make plain OLS standard errors lie; X64/X322
    fit the line, this query fits it honestly.

    First-pass sums rounded (engine-exact closed forms); ρ and the
    transformed fit derive from those identical doubles.  Scale: the
    series is a month-grain rollup — window + scalar algebra over ~80
    rows after one fact pass."""
    o = load(spark, sf_dir, "orders")
    m0 = o.groupBy(F.date_trunc("month", "o_orderdate").alias("mon")).agg(
        F.round(F.sum("o_totalprice") / 1e6, 6).alias("y")
    )
    tx = m0.select(
        "y", F.row_number().over(Window.orderBy("mon")).alias("t")
    )
    s = tx.agg(
        F.count("*").alias("n"),
        F.round(F.sum("t"), 4).alias("sx"),
        F.round(F.sum("y"), 4).alias("sy"),
        F.round(F.sum(F.col("t") * F.col("t")), 4).alias("sxx"),
        F.round(F.sum(F.col("t") * F.col("y")), 4).alias("sxy"),
    )
    bnum = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    bden = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    ols = s.select(
        "n",
        (bnum / bden).alias("b"),
        ((F.col("sy") - bnum / bden * F.col("sx")) / F.col("n")).alias("a"),
    )
    wt = Window.orderBy("t")
    e = tx.crossJoin(F.broadcast(ols)).select(
        "t",
        "y",
        (F.col("y") - F.col("a") - F.col("b") * F.col("t")).alias("e"),
        F.lag(F.col("y") - F.col("a") - F.col("b") * F.col("t"))
        .over(wt)
        .alias("ep"),
        F.lag("y").over(wt).alias("yp"),
        F.col("a").alias("a0"),
        F.col("b").alias("b0"),
    )
    rho = e.filter(F.col("ep").isNotNull()).agg(
        F.first("a0").alias("a0"),
        F.first("b0").alias("b0"),
        (F.sum(F.col("e") * F.col("ep")) / F.sum(F.col("ep") * F.col("ep"))).alias(
            "rho"
        ),
    )
    star = (
        e.drop("a0", "b0")
        .filter(F.col("yp").isNotNull())
        .crossJoin(F.broadcast(rho))
        .select(
            (F.col("y") - F.col("rho") * F.col("yp")).alias("ys"),
            (F.col("t") - F.col("rho") * (F.col("t") - 1)).alias("xs"),
            "rho",
            "a0",
            "b0",
        )
    )
    s2 = star.agg(
        F.first("rho").alias("rho"),
        F.first("a0").alias("a0"),
        F.first("b0").alias("b0"),
        F.count("*").alias("n"),
        F.sum("xs").alias("sx"),
        F.sum("ys").alias("sy"),
        F.sum(F.col("xs") * F.col("xs")).alias("sxx"),
        F.sum(F.col("xs") * F.col("ys")).alias("sxy"),
    )
    return s2.select(
        F.round("rho", 6).alias("rho_ar1"),
        F.round("b0", 6).alias("slope_ols"),
        F.round(bnum / bden, 6).alias("slope_co"),
        F.round(
            ((F.col("sy") - bnum / bden * F.col("sx")) / F.col("n"))
            / (1 - F.col("rho")),
            6,
        ).alias("intercept_co"),
    )
