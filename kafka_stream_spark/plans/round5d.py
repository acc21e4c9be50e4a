"""Round-5 batch D: attribution, reconciliation, causal + robust fits.

Six components: Markov removal-effect attribution (X535 — the
graph-based channel-attribution standard, complementing X273's
heuristic splits and X433's Shapley), hierarchical forecast
reconciliation (X536 — bottom-up vs top-down coherence, the ops
question every per-segment forecast eventually hits), stratified
(sub-classification) average-treatment-effect (X537 — Cochran's
propensity-stratification ATE, the missing member of the causal
family DiD/IV/RDD/QTE/CUPED), deterministic RANSAC (X538 — consensus
robust fit; Huber X241 and Theil-Sen X347 are its M-/rank-based
cousins), Matryoshka embedding-truncation recall (X539 — the MRL-era
dimension/quality frontier for vector search), and sample L-moments
(X540 — the order-statistics shape family EVT practice fits
distributions with, beyond X55's central moments).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import vectors
from ..functions.hashing import token_hash, token_hash_sql
from ..sources.tables import load
from .registry import query

# ---------------------------------------------------------------------------
# X535 — Markov removal-effect attribution
# ---------------------------------------------------------------------------

_MK_STEPS = 12
_MK_CHANNELS = ("click", "error", "signup", "view")


def _mk_step_sql(prev: str, out: str) -> str:
    return f"""
    {out} AS MATERIALIZED (
      SELECT v.scen, p.t AS st, sum(v.mass * p.p) AS mass
      FROM {prev} v JOIN probs p ON v.scen = p.scen AND v.st = p.f
      GROUP BY v.scen, p.t)"""


def _mk_chain_sql() -> str:
    parts = []
    prev = "v0"
    for i in range(1, _MK_STEPS + 1):
        parts.append(_mk_step_sql(prev, f"v{i}"))
        prev = f"v{i}"
    return ",".join(parts)


@query(
    "q_markov_attribution",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'purchase' THEN 'CONV'
                  ELSE event_type END AS st,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS i
      FROM events
    ), firstconv AS (
      SELECT user_id, min(i) AS ci FROM ev WHERE st = 'CONV'
      GROUP BY user_id
    ), j AS (
      SELECT ev.user_id, ev.st, ev.i
      FROM ev LEFT JOIN firstconv f ON ev.user_id = f.user_id
      WHERE f.ci IS NULL OR ev.i <= f.ci
    ), hops AS (
      SELECT user_id, st,
             coalesce(lag(st) OVER (PARTITION BY user_id ORDER BY i),
                      'START') AS prev
      FROM j
      UNION ALL
      SELECT last.user_id, 'NULL' AS st, last.st AS prev
      FROM (SELECT user_id, max(i) AS mi FROM j GROUP BY user_id) mx
      JOIN j AS last ON last.user_id = mx.user_id AND last.i = mx.mi
      WHERE last.st <> 'CONV'
    ), m AS (
      SELECT prev AS f, st AS t, count(*) AS n FROM hops
      GROUP BY prev, st
    ), scen AS (
      SELECT unnest(['none', 'click', 'error', 'signup', 'view'])
        AS scen
    ), ms AS (
      SELECT s.scen, m.f,
             CASE WHEN m.t = s.scen THEN 'NULL' ELSE m.t END AS t,
             sum(m.n) AS n
      FROM m CROSS JOIN scen s
      WHERE m.f <> s.scen
      GROUP BY s.scen, m.f, CASE WHEN m.t = s.scen THEN 'NULL'
                                 ELSE m.t END
    ), probs AS MATERIALIZED (
      SELECT scen, f, t,
             n * 1.0 / sum(n) OVER (PARTITION BY scen, f) AS p
      FROM ms
      UNION ALL
      SELECT scen, s, s, 1.0
      FROM scen CROSS JOIN (SELECT unnest(['CONV', 'NULL']) AS s)
    ), v0 AS (
      SELECT scen, 'START' AS st, CAST(1.0 AS DOUBLE) AS mass
      FROM scen
    ), {_mk_chain_sql()},
    pconv AS (
      SELECT scen, sum(mass) AS p FROM v{_MK_STEPS}
      WHERE st = 'CONV' GROUP BY scen
    ), base AS (SELECT p AS p0 FROM pconv WHERE scen = 'none'),
    eff AS (
      SELECT scen AS channel, p AS p_removed,
             1 - p / (SELECT p0 FROM base) AS e
      FROM pconv WHERE scen <> 'none'
    )
    SELECT channel, round((SELECT p0 FROM base), 6) AS p_base,
           round(p_removed, 6) AS p_removed,
           round(e, 6) AS removal_effect,
           round(e / sum(e) OVER (), 6) AS attribution_share
    FROM eff
    """,
)
def q_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X535 — Markov removal-effect attribution (Anderl et al.):
    user journeys (event-time ordered, truncated at first purchase →
    CONV, non-converters → NULL) become a first-order transition
    matrix; each channel's credit is the RELATIVE DROP in conversion
    probability when that channel's node is removed (transitions into
    it re-routed to NULL), normalized across channels.  Conversion
    probability is the absorbed CONV mass after {_MK_STEPS} power
    steps of the scenario-keyed chain — all five scenarios (baseline +
    4 removals) advance through the SAME joins, one (scenario, state)
    vector table, {_MK_STEPS} unrolled in the oracle.

    This is the data-driven attribution the heuristics X273
    (first/last/linear/decay) and X433 (Shapley over visit sets)
    bracket: it uses sequence structure, not just set membership.

    Scale: journey→transition extraction is fact-volume work (windows
    per user); everything after operates on the channel×channel
    matrix — constant-size state advanced a constant number of
    rounds."""
    ev = load(spark, sf_dir, "events")
    wi = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = ev.select(
        "user_id",
        F.when(F.col("event_type") == "purchase", "CONV")
        .otherwise(F.col("event_type"))
        .alias("st"),
        F.row_number().over(wi).alias("i"),
    )
    fc = (
        e.filter(F.col("st") == "CONV")
        .groupBy("user_id")
        .agg(F.min("i").alias("ci"))
    )
    j = e.join(fc, "user_id", "left").filter(
        F.col("ci").isNull() | (F.col("i") <= F.col("ci"))
    )
    wj = Window.partitionBy("user_id").orderBy("i")
    hops_mid = j.select(
        "user_id",
        "st",
        F.coalesce(F.lag("st").over(wj), F.lit("START")).alias("prev"),
    )
    last = (
        j.withColumn(
            "rmax",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.desc("i"))
            ),
        )
        .filter((F.col("rmax") == 1) & (F.col("st") != "CONV"))
        .select(
            "user_id", F.lit("NULL").alias("st"), F.col("st").alias("prev")
        )
    )
    hops = hops_mid.unionByName(last)
    m = hops.groupBy(
        F.col("prev").alias("f"), F.col("st").alias("t")
    ).agg(F.count("*").alias("n"))
    # literal dims via JVM-side explode (createDataFrame pays a Python
    # serialization round-trip per call — measured ~5 s here)
    scen = spark.sql(
        "SELECT explode(array('none', 'click', 'error', 'signup',"
        " 'view')) AS scen"
    )
    ms = (
        m.crossJoin(F.broadcast(scen))
        .filter(F.col("f") != F.col("scen"))
        .groupBy(
            "scen",
            "f",
            F.when(F.col("t") == F.col("scen"), "NULL")
            .otherwise(F.col("t"))
            .alias("t"),
        )
        .agg(F.sum("n").alias("n"))
    )
    wrow = Window.partitionBy("scen", "f")
    absorb = scen.crossJoin(
        spark.sql("SELECT explode(array('CONV', 'NULL')) AS s")
    ).select(
        "scen", F.col("s").alias("f"), F.col("s").alias("t"),
        F.lit(1.0).alias("p"),
    )
    probs = (
        ms.withColumn("p", F.col("n") / F.sum("n").over(wrow))
        .select("scen", "f", "t", "p")
        .unionByName(absorb)
        .repartition(1)
        .localCheckpoint(eager=True)
    )
    def matmul(ma: DataFrame, mb: DataFrame) -> DataFrame:
        """Scenario-keyed (f,t,p) matrix product — one join + one agg."""
        a = ma.alias("ma")
        b_ = mb.alias("mb")
        return (
            a.join(
                b_,
                (F.col("ma.scen") == F.col("mb.scen"))
                & (F.col("ma.t") == F.col("mb.f")),
            )
            .groupBy(
                F.col("ma.scen").alias("scen"),
                F.col("ma.f").alias("f"),
                F.col("mb.t").alias("t"),
            )
            .agg(F.sum(F.col("ma.p") * F.col("mb.p")).alias("p"))
        )

    # P^12 by repeated squaring: O(log K) joins instead of K vector steps
    # (8x8-per-scenario operands — association differs from the oracle's
    # sequential unroll only at ULP, absorbed by the 6-dp rounding).
    # Each product checkpoints: thinning these was MEASURED SLOWER
    # (2.65 s → 3.27 s isolated) — un-materialized products duplicate
    # their shuffle stages inside one deep DAG, costing more than the
    # ~0.35 s/checkpoint they save. The query's wall time is
    # checkpoint-scheduling-bound and varies ±25% between bench rounds
    # at identical code (r5 1.91 s, r6 1.58 s, r7 2.02 s — normalized
    # cost flat); treat sub-1.5× calibration-normalized drifts here as
    # noise.
    p2 = matmul(probs, probs).localCheckpoint(eager=True)
    p4 = matmul(p2, p2).localCheckpoint(eager=True)
    p8 = matmul(p4, p4).localCheckpoint(eager=True)
    p12 = matmul(p8, p4)
    pconv = (
        p12.filter((F.col("f") == "START") & (F.col("t") == "CONV"))
        .groupBy("scen")
        .agg(F.sum("p").alias("p"))
    )
    base = pconv.filter(F.col("scen") == "none").select(
        F.col("p").alias("p0")
    )
    eff = (
        pconv.filter(F.col("scen") != "none")
        .crossJoin(F.broadcast(base))
        .select(
            F.col("scen").alias("channel"),
            "p0",
            F.col("p").alias("p_removed"),
            (1 - F.col("p") / F.col("p0")).alias("e"),
        )
    )
    wall = Window.partitionBy()
    return eff.select(
        "channel",
        F.round("p0", 6).alias("p_base"),
        F.round("p_removed", 6).alias("p_removed"),
        F.round("e", 6).alias("removal_effect"),
        F.round(F.col("e") / F.sum("e").over(wall), 6).alias(
            "attribution_share"
        ),
    )


# ---------------------------------------------------------------------------
# X536 — hierarchical forecast reconciliation
# ---------------------------------------------------------------------------


@query(
    "q_forecast_reconcile",
    oracle="""
    WITH m0 AS (
      SELECT c.c_mktsegment AS segment,
             date_trunc('month', o.o_orderdate) AS mon,
             round(sum(o.o_totalprice) / 1e6, 6) AS y
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ), lastm AS (
      SELECT max(mon) AS lm FROM m0
      WHERE mon < (SELECT max(mon) FROM m0)
    ),
    actual AS (
      SELECT segment, y FROM m0 CROSS JOIN lastm WHERE mon = lm
    ), train AS (
      SELECT m0.*, row_number() OVER (PARTITION BY segment
                                      ORDER BY mon DESC) AS rdesc
      FROM m0 CROSS JOIN lastm WHERE mon < lm
    ), bu AS (
      SELECT segment, round(sum(y) / 3, 6) AS f_bu
      FROM train WHERE rdesc <= 3 GROUP BY segment
    ), tot AS (
      SELECT mon, sum(y) AS yt,
             row_number() OVER (ORDER BY mon DESC) AS rdesc
      FROM train GROUP BY mon
    ), direct AS (
      SELECT round(sum(yt) / 3, 6) AS f_total FROM tot WHERE rdesc <= 3
    ), share AS (
      SELECT segment,
             sum(y) / sum(sum(y)) OVER () AS w
      FROM train WHERE rdesc <= 12 GROUP BY segment
    )
    SELECT b.segment, b.f_bu,
           round(d.f_total * s.w, 6) AS f_td,
           round(a.y, 6) AS actual,
           round(abs(b.f_bu - a.y), 6) AS ae_bu,
           round(abs(d.f_total * s.w - a.y), 6) AS ae_td,
           round(d.f_total - sum(b.f_bu) OVER (), 6)
             AS coherence_gap
    FROM bu b
    JOIN share s ON b.segment = s.segment
    JOIN actual a ON b.segment = a.segment
    CROSS JOIN direct d
    """,
)
def q_forecast_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X536 — hierarchical forecast reconciliation on the segment→total
    revenue hierarchy, the last FULL month held out (the trailing
    partial month is excluded entirely): bottom-up (each segment's
    own 3-month moving average, summed) vs top-down (a direct total
    forecast allocated by trailing-12-month revenue shares — the
    'forecast proportions' method), with per-segment absolute errors
    against the held-out actual and the coherence gap the two
    approaches disagree by.  Reconciliation is the question every
    per-segment forecast deployment hits (Hyndman's coherency
    problem); the forecasting ladder (X218/X277/X340/X531) produces
    the inputs, this query makes them coherent.

    All arithmetic derives from 6-dp-rounded monthly sums — integer-
    style determinism.  Scale: one fact rollup to segment×month, then
    constant-size window work."""
    o = load(spark, sf_dir, "orders")
    cst = load(spark, sf_dir, "customer")
    m0 = (
        o.join(
            F.broadcast(cst.select("c_custkey", "c_mktsegment")),
            o.o_custkey == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.date_trunc("month", "o_orderdate").alias("mon"),
        )
        .agg(F.round(F.sum("o_totalprice") / 1e6, 6).alias("y"))
        .localCheckpoint(eager=True)
    )
    maxm = m0.agg(F.max("mon").alias("mm"))
    lastm = (
        m0.crossJoin(F.broadcast(maxm))
        .filter(F.col("mon") < F.col("mm"))
        .agg(F.max("mon").alias("lm"))
    )
    actual = m0.crossJoin(F.broadcast(lastm)).filter(
        F.col("mon") == F.col("lm")
    ).select("segment", "y")
    train = (
        m0.crossJoin(F.broadcast(lastm))
        .filter(F.col("mon") < F.col("lm"))
        .withColumn(
            "rdesc",
            F.row_number().over(
                Window.partitionBy("segment").orderBy(F.desc("mon"))
            ),
        )
    )
    bu = (
        train.filter(F.col("rdesc") <= 3)
        .groupBy("segment")
        .agg(F.round(F.sum("y") / 3, 6).alias("f_bu"))
    )
    tot = (
        train.groupBy("mon")
        .agg(F.sum("y").alias("yt"))
        .withColumn(
            "rdesc",
            F.row_number().over(Window.orderBy(F.desc("mon"))),
        )
    )
    direct = tot.filter(F.col("rdesc") <= 3).agg(
        F.round(F.sum("yt") / 3, 6).alias("f_total")
    )
    wall = Window.partitionBy()
    share = (
        train.filter(F.col("rdesc") <= 12)
        .groupBy("segment")
        .agg(F.sum("y").alias("sy"))
        .withColumn("w", F.col("sy") / F.sum("sy").over(wall))
    )
    return (
        bu.join(share.select("segment", "w"), "segment")
        .join(actual.select("segment", F.col("y").alias("ya")), "segment")
        .crossJoin(F.broadcast(direct))
        .select(
            "segment",
            "f_bu",
            F.round(F.col("f_total") * F.col("w"), 6).alias("f_td"),
            F.round("ya", 6).alias("actual"),
            F.round(F.abs(F.col("f_bu") - F.col("ya")), 6).alias("ae_bu"),
            F.round(
                F.abs(F.col("f_total") * F.col("w") - F.col("ya")), 6
            ).alias("ae_td"),
            F.round(
                F.col("f_total") - F.sum("f_bu").over(wall), 6
            ).alias("coherence_gap"),
        )
    )


# ---------------------------------------------------------------------------
# X537 — stratified (sub-classification) average treatment effect
# ---------------------------------------------------------------------------

_ATE_BAL = 4300


@query(
    "q_stratified_ate",
    oracle=f"""
    WITH cu AS (
      SELECT o_custkey, round(sum(o_totalprice), 2) AS spend
      FROM orders GROUP BY o_custkey
    ), d AS (
      SELECT c.c_mktsegment AS stratum,
             CASE WHEN c.c_acctbal > {_ATE_BAL} THEN 1 ELSE 0 END AS tr,
             cu.spend
      FROM cu JOIN customer c ON c.c_custkey = cu.o_custkey
    ), g AS (
      SELECT stratum,
             count(*) AS n_s,
             sum(tr) AS n1, count(*) - sum(tr) AS n0,
             round(sum(CASE WHEN tr = 1 THEN spend END), 2) AS s1,
             round(sum(CASE WHEN tr = 0 THEN spend END), 2) AS s0
      FROM d GROUP BY stratum
    ), e AS (
      SELECT stratum, n_s, n1, n0,
             s1 / n1 - s0 / n0 AS diff_s,
             n_s * 1.0 / sum(n_s) OVER () AS w
      FROM g
    )
    SELECT stratum, CAST(n_s AS BIGINT) AS n_s,
           CAST(n1 AS BIGINT) AS n_treated,
           CAST(n0 AS BIGINT) AS n_control,
           round(diff_s, 4) AS diff_s,
           round(w, 6) AS weight,
           round(sum(diff_s * w) OVER (), 4) AS ate_stratified
    FROM e
    """,
)
def q_stratified_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X537 — average treatment effect by sub-classification
    (Cochran 1968, the original propensity-stratification design):
    'treatment' = high account balance, outcome = lifetime spend,
    confounder strata = market segment; within-stratum mean
    differences are combined with population-share weights,
    ATE = Σₛ (nₛ/n)(ȳ₁ₛ − ȳ₀ₛ).  The missing member of the engine's
    causal family — X336 DiD exploits time, X479 IV an instrument,
    X480 RDD a threshold, X326 CUPED a covariate; stratification is
    the design used when only categorical confounders are observed.

    Per-stratum sums rounded before the mean ratios (the engine-exact
    pattern); weights are count ratios.  Scale: one fact rollup, one
    broadcast dim join, then 5-row arithmetic."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    cu = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("spend")
    )
    d = cu.join(
        F.broadcast(c.select("c_custkey", "c_acctbal", "c_mktsegment")),
        cu.o_custkey == F.col("c_custkey"),
    ).select(
        F.col("c_mktsegment").alias("stratum"),
        F.when(F.col("c_acctbal") > _ATE_BAL, 1).otherwise(0).alias("tr"),
        "spend",
    )
    g = d.groupBy("stratum").agg(
        F.count("*").alias("n_s"),
        F.sum("tr").alias("n1"),
        (F.count("*") - F.sum("tr")).alias("n0"),
        F.round(F.sum(F.when(F.col("tr") == 1, F.col("spend"))), 2).alias(
            "s1"
        ),
        F.round(F.sum(F.when(F.col("tr") == 0, F.col("spend"))), 2).alias(
            "s0"
        ),
    )
    wall = Window.partitionBy()
    e = g.select(
        "stratum",
        "n_s",
        "n1",
        "n0",
        (F.col("s1") / F.col("n1") - F.col("s0") / F.col("n0")).alias(
            "diff_s"
        ),
        (F.col("n_s") / F.sum("n_s").over(wall)).alias("w"),
    )
    return e.select(
        "stratum",
        F.col("n_s").cast("long").alias("n_s"),
        F.col("n1").cast("long").alias("n_treated"),
        F.col("n0").cast("long").alias("n_control"),
        F.round("diff_s", 4).alias("diff_s"),
        F.round("w", 6).alias("weight"),
        F.round(
            F.sum(F.col("diff_s") * F.col("w")).over(wall), 4
        ).alias("ate_stratified"),
    )


# ---------------------------------------------------------------------------
# X538 — deterministic RANSAC line fit
# ---------------------------------------------------------------------------

_RS_MODELS = 15
_RS_TAU = 5.0


def _rs_points_sql() -> str:
    nz = token_hash_sql("CAST(event_id AS VARCHAR) || ':n'")
    oc = token_hash_sql("CAST(event_id AS VARCHAR) || ':o'")
    oy = token_hash_sql("CAST(event_id AS VARCHAR) || ':y'")
    return f"""
    pts AS MATERIALIZED (
      SELECT event_id, round(value, 6) AS x,
             CASE WHEN {oc} % 100 < 10
                  THEN ({oy} % 50000) / 100.0
                  ELSE 3 * round(value, 6) + 20
                       + (({nz} % 2001) - 1000) / 500.0 END AS y
      FROM events
    )"""


@query(
    "q_ransac_line",
    oracle=f"""
    WITH {_rs_points_sql()},
    sampled AS (
      SELECT gs.m, p.x, p.y,
             row_number() OVER (
               PARTITION BY gs.m
               ORDER BY {token_hash_sql(
                   "CAST(p.event_id AS VARCHAR) || ':' "
                   "|| CAST(gs.m AS VARCHAR)")}, p.event_id) AS rk
      FROM pts p CROSS JOIN generate_series(1, {_RS_MODELS}) AS gs(m)
    ), models AS (
      SELECT m,
             max(CASE WHEN rk = 1 THEN x END) AS x1,
             max(CASE WHEN rk = 1 THEN y END) AS y1,
             max(CASE WHEN rk = 2 THEN x END) AS x2,
             max(CASE WHEN rk = 2 THEN y END) AS y2
      FROM sampled WHERE rk <= 2 GROUP BY m
    ), lines AS (
      SELECT m, (y2 - y1) / (x2 - x1) AS b,
             y1 - (y2 - y1) / (x2 - x1) * x1 AS a
      FROM models WHERE abs(x2 - x1) > 1e-9
    ), votes AS (
      SELECT l.m, l.a, l.b, count(*) AS n_in
      FROM lines l JOIN pts p
        ON abs(p.y - l.a - l.b * p.x) <= {_RS_TAU}
      GROUP BY l.m, l.a, l.b
    ), best AS (
      SELECT m, a, b, n_in FROM votes
      ORDER BY n_in DESC, m LIMIT 1
    ), inl AS (
      SELECT p.x, p.y FROM pts p CROSS JOIN best
      WHERE abs(p.y - best.a - best.b * p.x) <= {_RS_TAU}
    ), refit AS (
      SELECT count(*) AS n, round(sum(x), 4) AS sx,
             round(sum(y), 4) AS sy, round(sum(x * x), 4) AS sxx,
             round(sum(x * y), 4) AS sxy
      FROM inl
    )
    SELECT CAST(best.m AS BIGINT) AS model_id,
           CAST(best.n_in AS BIGINT) AS n_inliers,
           round(best.n_in * 1.0 / (SELECT count(*) FROM pts), 6)
             AS inlier_frac,
           round((refit.n * refit.sxy - refit.sx * refit.sy)
                 / (refit.n * refit.sxx - refit.sx * refit.sx), 6)
             AS slope_refit,
           round((refit.sy - (refit.n * refit.sxy - refit.sx * refit.sy)
                  / (refit.n * refit.sxx - refit.sx * refit.sx)
                  * refit.sx) / refit.n, 6) AS intercept_refit
    FROM best CROSS JOIN refit
    """,
)
def q_ransac_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X538 — RANSAC (Fischler-Bolles) robust line fit, fully
    deterministic: the controlled dataset plants y = 3x + 20 with
    ±2 hash-noise and 10% gross hash-outliers (uniform [0, 500]);
    {_RS_MODELS} minimal 2-point models are drawn by ranking points
    on the portable md5 of (point, model-index) — the same
    replayable-sampling device as X526 — each model votes inliers
    within τ = {_RS_TAU}, the max-consensus model wins (index
    tie-break), and the final line is re-fit by OLS on its inlier
    set.  Consensus is the third robust-regression paradigm next to
    Huber's M-estimation (X241) and Theil-Sen's rank slope (X347) —
    the one that survives >50% structured outliers.

    OLS sums rounded before the closed-form solve (engine-exact).
    Scale: model candidates are a {_RS_MODELS}-row broadcast; the
    vote join is a broadcast fan-out over the fact table — one wide
    pass, no pairwise blowup."""
    ev = load(spark, sf_dir, "events")
    x = F.round("value", 6)
    nz = token_hash(F.concat(F.col("event_id").cast("string"), F.lit(":n")))
    oc = token_hash(F.concat(F.col("event_id").cast("string"), F.lit(":o")))
    oy = token_hash(F.concat(F.col("event_id").cast("string"), F.lit(":y")))
    pts = ev.select(
        "event_id",
        x.alias("x"),
        F.when(oc % 100 < 10, (oy % 50000) / 100.0)
        .otherwise(3 * x + 20 + ((nz % 2001) - 1000) / 500.0)
        .alias("y"),
    ).localCheckpoint(eager=True)
    sampled = pts.select(
        "event_id",
        "x",
        "y",
        F.explode(F.sequence(F.lit(1), F.lit(_RS_MODELS))).alias("m"),
    ).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("m").orderBy(
                token_hash(
                    F.concat(
                        F.col("event_id").cast("string"),
                        F.lit(":"),
                        F.col("m").cast("string"),
                    )
                ),
                "event_id",
            )
        ),
    )
    models = (
        sampled.filter(F.col("rk") <= 2)
        .groupBy("m")
        .agg(
            F.max(F.when(F.col("rk") == 1, F.col("x"))).alias("x1"),
            F.max(F.when(F.col("rk") == 1, F.col("y"))).alias("y1"),
            F.max(F.when(F.col("rk") == 2, F.col("x"))).alias("x2"),
            F.max(F.when(F.col("rk") == 2, F.col("y"))).alias("y2"),
        )
    )
    b = (F.col("y2") - F.col("y1")) / (F.col("x2") - F.col("x1"))
    lines = models.filter(
        F.abs(F.col("x2") - F.col("x1")) > 1e-9
    ).select("m", b.alias("b"), (F.col("y1") - b * F.col("x1")).alias("a"))
    votes = (
        F.broadcast(lines)
        .join(
            pts,
            F.abs(
                pts.y - F.col("a") - F.col("b") * pts.x
            )
            <= _RS_TAU,
        )
        .groupBy("m", "a", "b")
        .agg(F.count("*").alias("n_in"))
    )
    best = votes.orderBy(F.desc("n_in"), "m").limit(1)
    inl = pts.crossJoin(F.broadcast(best)).filter(
        F.abs(F.col("y") - F.col("a") - F.col("b") * F.col("x")) <= _RS_TAU
    )
    refit = inl.agg(
        F.count("*").alias("n"),
        F.round(F.sum("x"), 4).alias("sx"),
        F.round(F.sum("y"), 4).alias("sy"),
        F.round(F.sum(F.col("x") * F.col("x")), 4).alias("sxx"),
        F.round(F.sum(F.col("x") * F.col("y")), 4).alias("sxy"),
    )
    npts = pts.agg(F.count("*").alias("np"))
    slope = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    return (
        best.crossJoin(F.broadcast(refit))
        .crossJoin(F.broadcast(npts))
        .select(
            F.col("m").cast("long").alias("model_id"),
            F.col("n_in").cast("long").alias("n_inliers"),
            F.round(F.col("n_in") / F.col("np"), 6).alias("inlier_frac"),
            F.round(slope, 6).alias("slope_refit"),
            F.round(
                (F.col("sy") - slope * F.col("sx")) / F.col("n"), 6
            ).alias("intercept_refit"),
        )
    )


# ---------------------------------------------------------------------------
# X539 — Matryoshka embedding-truncation recall sweep
# ---------------------------------------------------------------------------

_MRL_DIMS = (8, 16, 32, 64)


def _mrl_scored_sql(d: int) -> str:
    qe = f"q.embedding[1:{d}]"
    ce = f"c.embedding[1:{d}]"
    return f"""
      SELECT {d} AS dim, q.vec_id AS q_id, c.vec_id AS n_id,
             round({vectors.cosine_sql(qe, ce)}, 6) AS score
      FROM qs q, embeddings c WHERE q.vec_id <> c.vec_id"""


@query(
    "q_matryoshka_recall",
    oracle=f"""
    WITH qs AS MATERIALIZED (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10
    ), scored AS (
      {" UNION ALL ".join(_mrl_scored_sql(d) for d in _MRL_DIMS)}
    ), ranked AS (
      SELECT dim, q_id, n_id,
             row_number() OVER (PARTITION BY dim, q_id
                                ORDER BY score DESC, n_id) AS rn
      FROM scored
    ), top3 AS MATERIALIZED (
      SELECT dim, q_id, n_id FROM ranked WHERE rn <= 3
    ), hits AS (
      SELECT t.dim, t.q_id, count(g.n_id) AS n_hits
      FROM top3 t LEFT JOIN (SELECT q_id, n_id FROM top3
                             WHERE dim = 64) g
        ON t.q_id = g.q_id AND t.n_id = g.n_id
      GROUP BY t.dim, t.q_id)
    SELECT dim, CAST(count(*) AS BIGINT) AS n_queries,
           round(sum(n_hits) / (3.0 * count(*)), 6) AS recall_at_3
    FROM hits GROUP BY dim
    """,
)
def q_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X539 — Matryoshka-representation-learning truncation sweep:
    recall@3 of cosine search over PREFIX-TRUNCATED embeddings (dims
    8/16/32/64) against the full-dimension ground truth — the
    dimension/quality frontier that decides how much of an MRL-style
    embedding a vector index actually needs to store (64→8 is an 8×
    index-size cut; this query prints what it costs in recall).
    Companion to X86 (IVF recall) and X510 (IVF-PQ refine): those
    sweep index parameters, this sweeps the representation itself.

    Exact brute-force on the bounded query panel (vec_id < 10 — the
    repo's all-pairs-twin convention); scores rounded to 6 dp with
    neighbor-id tie-break, so ranking is engine-exact.  Scale path at
    corpus size: the same truncation wrapped over the IVF route
    (X30), queries never cross-joined to the full corpus."""
    emb = load(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    cs = emb.select(
        F.col("vec_id").alias("n_id"), F.col("embedding").alias("ce")
    )
    scored = None
    for d in _MRL_DIMS:
        s = (
            F.broadcast(qs)
            .crossJoin(cs)
            .filter(F.col("q_id") != F.col("n_id"))
            .select(
                F.lit(d).alias("dim"),
                "q_id",
                "n_id",
                F.round(
                    vectors.cosine(f"slice(qe, 1, {d})", f"slice(ce, 1, {d})"),
                    6,
                ).alias("score"),
            )
        )
        scored = s if scored is None else scored.unionByName(s)
    top3 = (
        scored.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("dim", "q_id").orderBy(
                    F.desc("score"), "n_id"
                )
            ),
        )
        .filter(F.col("rn") <= 3)
        .select("dim", "q_id", "n_id")
        .localCheckpoint(eager=True)
    )
    gt = top3.filter(F.col("dim") == 64).select(
        F.col("q_id").alias("g_q"), F.col("n_id").alias("g_n")
    )
    hits = (
        top3.join(
            gt,
            (F.col("q_id") == F.col("g_q"))
            & (F.col("n_id") == F.col("g_n")),
            "left",
        )
        .groupBy("dim", "q_id")
        .agg(F.count("g_n").alias("n_hits"))
    )
    return hits.groupBy("dim").agg(
        F.count("*").cast("long").alias("n_queries"),
        F.round(F.sum("n_hits") / (3.0 * F.count("*")), 6).alias(
            "recall_at_3"
        ),
    )


# ---------------------------------------------------------------------------
# X540 — sample L-moments
# ---------------------------------------------------------------------------


@query(
    "q_l_moments",
    oracle="""
    WITH x AS (
      SELECT c_mktsegment AS segment, c_custkey,
             round(c_acctbal, 6) AS v,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal, c_custkey) AS i,
             count(*) OVER (PARTITION BY c_mktsegment) AS n
      FROM customer
    ), b AS (
      SELECT segment, any_value(n) AS n,
             sum(v) / any_value(n) AS b0,
             sum(v * (i - 1.0) / (n - 1)) / any_value(n) AS b1,
             sum(v * (i - 1.0) * (i - 2.0)
                 / ((n - 1.0) * (n - 2))) / any_value(n) AS b2,
             sum(v * (i - 1.0) * (i - 2.0) * (i - 3.0)
                 / ((n - 1.0) * (n - 2) * (n - 3))) / any_value(n) AS b3
      FROM x GROUP BY segment
    ), l AS (
      SELECT segment, n, b0 AS l1, 2 * b1 - b0 AS l2,
             6 * b2 - 6 * b1 + b0 AS l3,
             20 * b3 - 30 * b2 + 12 * b1 - b0 AS l4
      FROM b
    )
    SELECT segment, CAST(n AS BIGINT) AS n,
           round(l1, 4) AS l1, round(l2, 4) AS l2,
           round(l3, 4) AS l3, round(l4, 4) AS l4,
           round(l3 / l2, 6) AS l_skew,
           round(l4 / l2, 6) AS l_kurt
    FROM l
    """,
)
def q_l_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X540 — sample L-moments (Hosking 1990) of account balance per
    segment: probability-weighted order-statistic sums b₀..b₃ →
    λ₁ (location), λ₂ (L-scale), τ₃ = λ₃/λ₂ (L-skewness),
    τ₄ = λ₄/λ₂ (L-kurtosis).  Linear in the data, so finite for any
    distribution with a mean and far more outlier-resistant than the
    cubed/fourth-power central moments (X55) — the shape family EVT
    practice (X349 Gumbel, X476 GPD) fits distributions with, and a
    direct robust companion to X169's winsorized stats.

    The weights (i−1)···/(n−1)··· are exact rationals of the rank, so
    both engines sum identical term values; statistics rounded at the
    end (4 dp for the λ's, 6 for the ratios).  Scale: one rank window
    per group + one aggregate — the same two-pass shape as every
    order-statistics query here."""
    c = load(spark, sf_dir, "customer")
    wi = Window.partitionBy("c_mktsegment").orderBy(
        "c_acctbal", "c_custkey"
    )
    wn = Window.partitionBy("c_mktsegment")
    x = c.select(
        F.col("c_mktsegment").alias("segment"),
        F.round("c_acctbal", 6).alias("v"),
        F.row_number().over(wi).alias("i"),
        F.count("*").over(wn).alias("n"),
    )
    i, n, v = F.col("i"), F.col("n"), F.col("v")
    b = x.groupBy("segment").agg(
        F.first("n").alias("n"),
        (F.sum(v) / F.first("n")).alias("b0"),
        (F.sum(v * (i - 1.0) / (n - 1)) / F.first("n")).alias("b1"),
        (
            F.sum(v * (i - 1.0) * (i - 2.0) / ((n - 1.0) * (n - 2)))
            / F.first("n")
        ).alias("b2"),
        (
            F.sum(
                v
                * (i - 1.0)
                * (i - 2.0)
                * (i - 3.0)
                / ((n - 1.0) * (n - 2) * (n - 3))
            )
            / F.first("n")
        ).alias("b3"),
    )
    l2 = 2 * F.col("b1") - F.col("b0")
    l3 = 6 * F.col("b2") - 6 * F.col("b1") + F.col("b0")
    l4 = (
        20 * F.col("b3") - 30 * F.col("b2") + 12 * F.col("b1") - F.col("b0")
    )
    return b.select(
        "segment",
        F.col("n").cast("long").alias("n"),
        F.round("b0", 4).alias("l1"),
        F.round(l2, 4).alias("l2"),
        F.round(l3, 4).alias("l3"),
        F.round(l4, 4).alias("l4"),
        F.round(l3 / l2, 6).alias("l_skew"),
        F.round(l4 / l2, 6).alias("l_kurt"),
    )
