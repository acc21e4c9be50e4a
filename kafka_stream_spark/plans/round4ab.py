"""Round-4 batch AB: operations research + rolling observability
(X465-X469).

Five operators with no family member yet: ROLLING 7-day distinct
users (the windowed COUNT DISTINCT SQL windows famously cannot
express — solved as a bounded range join against the day spine, plus
the DAU/WAU stickiness ratio); Erlang C staffing (the call-center
queueing formula, factorials as log-sum folds so both engines share
the arithmetic); greedy knapsack selection with its LP-relaxation
bound (budgeted campaign selection, the 1-D cousin of X267's packing);
gains/losses streaks (gaps-and-islands on signs); and Lincoln-Petersen
/ Chapman capture-recapture population estimation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load
from .registry import query

# ---------------------------------------------------------------------------
# X465 — rolling 7-day distinct users (DAU/WAU stickiness)
# ---------------------------------------------------------------------------


@query(
    "q_rolling_distinct",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events
    ), days AS (SELECT DISTINCT d FROM ud),
    lo AS (SELECT min(d) AS d0 FROM days),
    dau AS (SELECT d, count(*) AS dau FROM ud GROUP BY d),
    wau AS (
      SELECT days.d, count(DISTINCT ud.user_id) AS wau
      FROM days JOIN ud
        ON ud.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
      GROUP BY days.d
    )
    SELECT w.d, CAST(a.dau AS BIGINT) AS dau,
           CAST(w.wau AS BIGINT) AS wau_rolling_7d,
           round(a.dau * 1.0 / w.wau, 4) AS stickiness
    FROM wau w JOIN dau a ON w.d = a.d CROSS JOIN lo
    WHERE w.d >= lo.d0 + INTERVAL 6 DAY
    """,
)
def q_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X465 — rolling 7-day distinct users per day with the DAU/WAU
    stickiness ratio (the product-analytics north-star X284's fixed
    calendar weeks approximate): windowed COUNT DISTINCT is
    inexpressible as a SQL window frame, so the rolling set is a
    bounded range join of the day spine against the DISTINCT user-day
    table — |days| × 7 × daily-actives rows, independent of raw event
    volume. Complete 7-day windows only."""
    ud = (
        load(spark, sf_dir, "events")
        .select(
            "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    days = ud.select("d").distinct()
    lo = days.agg(F.min("d").alias("d0"))
    dau = ud.groupBy("d").agg(F.count("*").alias("dau"))
    spine = days.select(F.col("d").alias("wd"))
    wau = (
        spine.join(
            ud,
            F.col("d").between(F.date_sub(F.col("wd"), 6), F.col("wd")),
        )
        .groupBy("wd")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        wau.join(dau, wau.wd == dau.d)
        .crossJoin(F.broadcast(lo))
        .filter(F.col("wd") >= F.date_add(F.col("d0"), 6))
        .select(
            F.col("wd").alias("d"),
            F.col("dau").cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau_rolling_7d"),
            F.round(F.col("dau") * 1.0 / F.col("wau"), 4).alias(
                "stickiness"
            ),
        )
    )


# ---------------------------------------------------------------------------
# X466 — Erlang C staffing
# ---------------------------------------------------------------------------


@query(
    "q_erlang_c",
    oracle="""
    WITH lam AS (
      SELECT count(*) * 1.0
               / (date_diff('hour', min(ts), max(ts)) + 1) AS lph
      FROM events WHERE event_type = 'purchase'
    ), a AS (SELECT lph, lph * 5.0 / 60 AS erlangs FROM lam),
    cs AS (SELECT unnest(generate_series(1, 8)) AS c),
    terms AS (
      SELECT cs.c, a.erlangs, a.lph, k.k,
             exp(k.k * ln(a.erlangs)
                 - coalesce(list_aggregate(list_transform(range(k.k),
                     i -> ln(i + 1.0)), 'sum'), 0.0)) AS term
      FROM cs CROSS JOIN a
      CROSS JOIN (SELECT unnest(generate_series(0, 8)) AS k) k
      WHERE k.k < cs.c
    ), sums AS (
      SELECT c, any_value(erlangs) AS a, any_value(lph) AS lph,
             sum(term) AS s
      FROM terms GROUP BY c
    ), top AS (
      SELECT c, a, lph, s,
             exp(c * ln(a)
                 - list_aggregate(list_transform(range(c),
                     i -> ln(i + 1.0)), 'sum')) AS ac
      FROM sums
    )
    SELECT CAST(c AS BIGINT) AS n_agents,
           round(a, 4) AS offered_erlangs,
           round(a / c, 4) AS utilization,
           round((ac * c / (c - a)) / (s + ac * c / (c - a)), 6)
             AS p_wait,
           round((ac * c / (c - a)) / (s + ac * c / (c - a))
                 * 5.0 / (c - a), 4) AS asa_minutes
    FROM top WHERE a / c < 1
    """,
)
def q_erlang_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X466 — Erlang C staffing table: purchase arrivals per hour ×
    5-minute handle time = offered erlangs A; for every agent count c
    with ρ<1, the wait probability C(c,A) = (Aᶜ/c!·c/(c−A)) /
    (Σ_{k<c}Aᵏ/k! + Aᶜ/c!·c/(c−A)) and the average speed of answer —
    the queueing formula every workforce-management tool runs on
    X351's λ and ρ. Factorials are log-sum folds (exp(k·lnA − Σln i)),
    identical arithmetic in both engines; everything is k≤8 scalar
    rows."""
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    # hour difference must match DuckDB date_diff('hour', ...) which
    # counts hour-boundary crossings — compute via epoch-hours floor.
    lam = e.agg(
        (
            F.count("*")
            * 1.0
            / (
                F.floor(F.unix_micros(F.max("ts")) / 3.6e9)
                - F.floor(F.unix_micros(F.min("ts")) / 3.6e9)
                + 1
            )
        ).alias("lph")
    )
    a = lam.select("lph", (F.col("lph") * 5.0 / 60).alias("erlangs"))
    cs = spark.range(1, 9).select(F.col("id").alias("c"))
    ks = spark.range(0, 9).select(F.col("id").alias("k"))
    log_fact = lambda n: F.aggregate(  # noqa: E731
        F.sequence(F.lit(1), n.cast("int")),
        F.lit(0.0),
        lambda acc, i: acc + F.log(i.cast("double")),
    )
    terms = (
        cs.crossJoin(F.broadcast(a))
        .crossJoin(F.broadcast(ks))
        .filter(F.col("k") < F.col("c"))
        .select(
            "c",
            "erlangs",
            "lph",
            F.exp(
                F.col("k") * F.log("erlangs")
                - F.when(F.col("k") == 0, F.lit(0.0)).otherwise(
                    log_fact(F.col("k"))
                )
            ).alias("term"),
        )
    )
    sums = terms.groupBy("c").agg(
        F.any_value("erlangs").alias("a"),
        F.any_value("lph").alias("lph"),
        F.sum("term").alias("s"),
    )
    ac = F.exp(F.col("c") * F.log("a") - log_fact(F.col("c")))
    top = sums.select("c", "a", "lph", "s", ac.alias("ac"))
    tail = F.col("ac") * F.col("c") / (F.col("c") - F.col("a"))
    pw = tail / (F.col("s") + tail)
    return top.filter(F.col("a") / F.col("c") < 1).select(
        F.col("c").cast("long").alias("n_agents"),
        F.round("a", 4).alias("offered_erlangs"),
        F.round(F.col("a") / F.col("c"), 4).alias("utilization"),
        F.round(pw, 6).alias("p_wait"),
        F.round(pw * 5.0 / (F.col("c") - F.col("a")), 4).alias(
            "asa_minutes"
        ),
    )


# ---------------------------------------------------------------------------
# X467 — greedy knapsack with LP-relaxation bound
# ---------------------------------------------------------------------------


@query(
    "q_knapsack_greedy",
    oracle="""
    WITH items AS (
      SELECT l_partkey % 50 AS band,
             sum(l_extendedprice * (1 - l_discount)) AS value,
             sum(l_quantity) AS cost
      FROM lineitem GROUP BY 1
    ), budget AS (SELECT sum(cost) * 0.1 AS b FROM items),
    ranked AS (
      SELECT band, value, cost, value / cost AS ratio,
             sum(cost) OVER (ORDER BY value / cost DESC, band) AS cum
      FROM items
    ), sel AS (
      SELECT r.*, bu.b, r.cum <= bu.b AS selected
      FROM ranked r CROSS JOIN budget bu
    ), summary AS (
      SELECT sum(CASE WHEN selected THEN value ELSE 0 END) AS greedy_v,
             any_value(b) AS b,
             sum(CASE WHEN selected THEN cost ELSE 0 END) AS used
      FROM sel
    ), frac AS (
      SELECT s.greedy_v
             + coalesce(max(CASE WHEN NOT x.selected
                 AND x.cum - x.cost < s.b
                 THEN (s.b - (x.cum - x.cost)) / x.cost * x.value
                 END), 0) AS lp_bound,
             s.greedy_v, s.b, s.used
      FROM sel x CROSS JOIN summary s
      GROUP BY s.greedy_v, s.b, s.used
    )
    SELECT CAST(x.band AS BIGINT) AS band,
           round(x.value, 2) AS value, round(x.cost, 2) AS cost,
           round(x.ratio, 4) AS ratio,
           round(f.greedy_v, 2) AS total_value,
           round(f.lp_bound, 2) AS lp_bound,
           round(f.greedy_v / f.lp_bound, 6) AS efficiency
    FROM sel x CROSS JOIN frac f WHERE x.selected
    """,
)
def q_knapsack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X467 — budgeted selection as a greedy knapsack over part bands
    (value = net revenue, cost = units, budget = 10% of total cost):
    take bands in value/cost ratio order while the cumulative cost
    fits, and report the FRACTIONAL-relaxation bound (greedy value +
    the partial next item — the LP optimum, so efficiency =
    greedy/bound certifies how close greedy got, Dantzig's argument).
    The campaign/assortment-selection shape; X267's bin packing is
    its multi-knapsack sibling. Windows over 50 item rows."""
    items = (
        load(spark, sf_dir, "lineitem")
        .groupBy((F.col("l_partkey") % 50).alias("band"))
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("value"),
            F.sum("l_quantity").alias("cost"),
        )
    )
    budget = items.agg((F.sum("cost") * 0.1).alias("b"))
    ratio = F.col("value") / F.col("cost")
    ranked = items.select(
        "band",
        "value",
        "cost",
        ratio.alias("ratio"),
        F.sum("cost")
        .over(Window.orderBy(ratio.desc(), "band"))
        .alias("cum"),
    )
    sel = ranked.crossJoin(F.broadcast(budget)).withColumn(
        "selected", F.col("cum") <= F.col("b")
    ).localCheckpoint(eager=True)
    summary = sel.agg(
        F.sum(F.when(F.col("selected"), F.col("value")).otherwise(0.0)).alias(
            "greedy_v"
        ),
        F.any_value("b").alias("b"),
    )
    frac = (
        sel.crossJoin(F.broadcast(summary.select("greedy_v")))
        .agg(
            F.any_value("greedy_v").alias("greedy_v"),
            (
                F.any_value("greedy_v")
                + F.coalesce(
                    F.max(
                        F.when(
                            (~F.col("selected"))
                            & (F.col("cum") - F.col("cost") < F.col("b")),
                            (F.col("b") - (F.col("cum") - F.col("cost")))
                            / F.col("cost")
                            * F.col("value"),
                        )
                    ),
                    F.lit(0.0),
                )
            ).alias("lp_bound"),
        )
    )
    return (
        sel.filter(F.col("selected"))
        .crossJoin(F.broadcast(frac))
        .select(
            F.col("band").cast("long").alias("band"),
            F.round("value", 2).alias("value"),
            F.round("cost", 2).alias("cost"),
            F.round("ratio", 4).alias("ratio"),
            F.round("greedy_v", 2).alias("total_value"),
            F.round("lp_bound", 2).alias("lp_bound"),
            F.round(F.col("greedy_v") / F.col("lp_bound"), 6).alias(
                "efficiency"
            ),
        )
    )


# ---------------------------------------------------------------------------
# X468 — gains/losses streaks
# ---------------------------------------------------------------------------


@query(
    "q_streaks",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', l_shipdate) AS DATE) AS d,
             sum(l_extendedprice * (1 - l_discount)) AS rev
      FROM lineitem GROUP BY 1
    ), sgn AS (
      SELECT d, CASE WHEN rev > lag(rev) OVER (ORDER BY d) THEN 1
                     WHEN rev < lag(rev) OVER (ORDER BY d) THEN -1
                     ELSE 0 END AS s
      FROM daily
    ), brk AS (
      SELECT d, s,
             CASE WHEN s = lag(s) OVER (ORDER BY d) THEN 0 ELSE 1 END
               AS new_run
      FROM sgn WHERE s <> 0
    ), runs AS (
      SELECT d, s, sum(new_run) OVER (ORDER BY d) AS run_id FROM brk
    ), agg AS (
      SELECT run_id, any_value(s) AS s, count(*) AS len,
             min(d) AS start_d, max(d) AS end_d
      FROM runs GROUP BY run_id
    )
    SELECT CAST((SELECT count(*) FROM daily) AS BIGINT) AS n_days,
           CAST(max(CASE WHEN s = 1 THEN len END) AS BIGINT)
             AS longest_up_streak,
           min(CASE WHEN s = 1 AND len = (SELECT max(len) FROM agg
                 WHERE s = 1) THEN start_d END) AS longest_up_start,
           CAST(max(CASE WHEN s = -1 THEN len END) AS BIGINT)
             AS longest_down_streak,
           min(CASE WHEN s = -1 AND len = (SELECT max(len) FROM agg
                 WHERE s = -1) THEN start_d END) AS longest_down_start,
           CAST(max(CASE WHEN end_d = (SELECT max(end_d) FROM agg)
                 THEN len END) AS BIGINT) AS current_streak_len,
           CAST(max(CASE WHEN end_d = (SELECT max(end_d) FROM agg)
                 THEN s END) AS BIGINT) AS current_streak_sign
    FROM agg
    """,
)
def q_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X468 — winning/losing streaks in daily revenue: sign of the
    day-over-day change, gaps-and-islands runs, longest up and down
    streaks with their start dates and the streak the series currently
    sits in — the momentum summary a trading desk or KPI review reads
    next to X109's smoothers (a 9-day down streak triggers review
    regardless of magnitude; flat days break runs). Windows over the
    collapsed daily series only."""
    daily = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.to_date(F.date_trunc("day", "l_shipdate")).alias("d"))
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("rev")
        )
    )
    wd = Window.orderBy("d")
    sgn = daily.select(
        "d",
        F.when(F.col("rev") > F.lag("rev").over(wd), 1)
        .when(F.col("rev") < F.lag("rev").over(wd), -1)
        .otherwise(0)
        .alias("s"),
    )
    brk = sgn.filter(F.col("s") != 0).select(
        "d",
        "s",
        F.when(F.col("s") == F.lag("s").over(wd), 0)
        .otherwise(1)
        .alias("new_run"),
    )
    runs = brk.select(
        "d", "s", F.sum("new_run").over(wd).alias("run_id")
    )
    agg = runs.groupBy("run_id").agg(
        F.any_value("s").alias("s"),
        F.count("*").alias("len"),
        F.min("d").alias("start_d"),
        F.max("d").alias("end_d"),
    ).localCheckpoint(eager=True)
    nd = daily.agg(F.count("*").alias("n_days"))
    mx_up = agg.filter(F.col("s") == 1).agg(F.max("len").alias("mu"))
    mx_dn = agg.filter(F.col("s") == -1).agg(F.max("len").alias("md"))
    last = agg.agg(F.max("end_d").alias("last_d"))
    j = (
        agg.crossJoin(F.broadcast(nd))
        .crossJoin(F.broadcast(mx_up))
        .crossJoin(F.broadcast(mx_dn))
        .crossJoin(F.broadcast(last))
    )
    return j.agg(
        F.any_value("n_days").cast("long").alias("n_days"),
        F.max(F.when(F.col("s") == 1, F.col("len")))
        .cast("long")
        .alias("longest_up_streak"),
        F.min(
            F.when(
                (F.col("s") == 1) & (F.col("len") == F.col("mu")),
                F.col("start_d"),
            )
        ).alias("longest_up_start"),
        F.max(F.when(F.col("s") == -1, F.col("len")))
        .cast("long")
        .alias("longest_down_streak"),
        F.min(
            F.when(
                (F.col("s") == -1) & (F.col("len") == F.col("md")),
                F.col("start_d"),
            )
        ).alias("longest_down_start"),
        F.max(
            F.when(F.col("end_d") == F.col("last_d"), F.col("len"))
        )
        .cast("long")
        .alias("current_streak_len"),
        F.max(F.when(F.col("end_d") == F.col("last_d"), F.col("s")))
        .cast("long")
        .alias("current_streak_sign"),
    )


# ---------------------------------------------------------------------------
# X469 — capture-recapture population estimation
# ---------------------------------------------------------------------------


@query(
    "q_capture_recapture",
    oracle="""
    WITH b AS (
      SELECT min(ts) AS lo, max(ts) AS hi FROM events
    ), tagged AS (
      SELECT DISTINCT e.user_id,
             CASE WHEN epoch(e.ts) - epoch(b.lo)
                       < (epoch(b.hi) - epoch(b.lo)) / 2
                  THEN 0 ELSE 1 END AS half
      FROM events e CROSS JOIN b
    ), cells AS (
      SELECT count(DISTINCT CASE WHEN half = 0 THEN user_id END) AS n1,
             count(DISTINCT CASE WHEN half = 1 THEN user_id END) AS n2,
             (SELECT count(*) FROM (
                SELECT user_id FROM tagged GROUP BY user_id
                HAVING count(*) = 2)) AS m,
             count(DISTINCT user_id) AS observed
      FROM tagged
    )
    SELECT CAST(n1 AS BIGINT) AS n_first_window,
           CAST(n2 AS BIGINT) AS n_second_window,
           CAST(m AS BIGINT) AS n_recaptured,
           CAST(observed AS BIGINT) AS n_observed_total,
           round(n1 * 1.0 * n2 / m, 2) AS lincoln_petersen,
           round((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1, 2)
             AS chapman_estimate,
           round(sqrt((n1 + 1.0) * (n2 + 1.0) * (n1 - m)
                      * (n2 - m) / (pow(m + 1.0, 2) * (m + 2.0))), 2)
             AS chapman_se
    FROM cells
    """,
)
def q_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X469 — Lincoln-Petersen / Chapman capture-recapture estimate of
    the active-user population from two observation windows (first vs
    second half of the horizon): N̂ = n₁n₂/m with Chapman's
    small-sample correction and its standard error — ecology's
    population estimator, used in analytics to size the population a
    logging pipeline only SAMPLES (observed-total alongside shows the
    estimator's bias when, as here, the panel is mostly recaptured).
    One distinct pass, scalar algebra."""
    e = load(spark, sf_dir, "events")
    b = e.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
    tagged = (
        e.crossJoin(F.broadcast(b))
        .select(
            "user_id",
            F.when(
                F.unix_micros("ts") - F.unix_micros("lo")
                < (F.unix_micros("hi") - F.unix_micros("lo")) / 2,
                0,
            )
            .otherwise(1)
            .alias("half"),
        )
        .distinct()
    )
    per_user = tagged.groupBy("user_id").agg(
        F.count("*").alias("n_halves")
    )
    cells = tagged.agg(
        F.countDistinct(
            F.when(F.col("half") == 0, F.col("user_id"))
        ).alias("n1"),
        F.countDistinct(
            F.when(F.col("half") == 1, F.col("user_id"))
        ).alias("n2"),
        F.countDistinct("user_id").alias("observed"),
    )
    m = per_user.filter(F.col("n_halves") == 2).agg(
        F.count("*").alias("m")
    )
    j = cells.crossJoin(F.broadcast(m))
    n1, n2, mm = F.col("n1"), F.col("n2"), F.col("m")
    chapman = (n1 + 1.0) * (n2 + 1.0) / (mm + 1.0) - 1
    se = F.sqrt(
        (n1 + 1.0)
        * (n2 + 1.0)
        * (n1 - mm)
        * (n2 - mm)
        / (F.pow(mm + 1.0, 2) * (mm + 2.0))
    )
    return j.select(
        n1.cast("long").alias("n_first_window"),
        n2.cast("long").alias("n_second_window"),
        mm.cast("long").alias("n_recaptured"),
        F.col("observed").cast("long").alias("n_observed_total"),
        F.round(n1 * 1.0 * n2 / mm, 2).alias("lincoln_petersen"),
        F.round(chapman, 2).alias("chapman_estimate"),
        F.round(se, 2).alias("chapman_se"),
    )
