"""Round-4 batch AE: the causal-inference completion (X478-X482).

With DiD (X336), synthetic control (X454), CUPED (X326), uplift
(X335), propensity stratification, mSPRT (X423), SRM (X387), power
(X439) and wear-off (X457) already in the engine, this batch closes
the textbook: two-way fixed effects (the panel workhorse),
instrumental variables in Wald form (the one-instrument closed form),
regression discontinuity (local linear jump at a cutoff), quantile
treatment effects (where the mean effect hides distributional
shifts), and Kish's design effect (what X432's raking weights cost in
effective sample size). All closed-form sufficient-statistics plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load
from .registry import query

# ---------------------------------------------------------------------------
# X478 — two-way fixed effects (within estimator)
# ---------------------------------------------------------------------------


@query(
    "q_fixed_effects",
    oracle="""
    WITH panel AS (
      SELECT l_partkey % 20 AS unit,
             year(l_shipdate) * 12 + month(l_shipdate) AS t,
             sum(l_extendedprice * (1 - l_discount)) / 1e3 AS y,
             sum(l_quantity) AS x
      FROM lineitem GROUP BY 1, 2
    ), mu AS (SELECT unit, avg(y) AS uy, avg(x) AS ux
              FROM panel GROUP BY unit),
    mt AS (SELECT t, avg(y) AS ty, avg(x) AS tx FROM panel GROUP BY t),
    g AS (SELECT avg(y) AS gy, avg(x) AS gx FROM panel),
    within AS (
      SELECT p.y - mu.uy - mt.ty + g.gy AS wy,
             p.x - mu.ux - mt.tx + g.gx AS wx
      FROM panel p JOIN mu ON p.unit = mu.unit
                   JOIN mt ON p.t = mt.t CROSS JOIN g
    ), fit AS (
      SELECT count(*) AS n, sum(wx * wy) AS sxy, sum(wx * wx) AS sxx,
             sum(wy * wy) AS syy
      FROM within
    )
    SELECT CAST(n AS BIGINT) AS n_cells,
           round(sxy / sxx, 8) AS beta_within,
           round(pow(sxy, 2) / (sxx * syy), 6) AS partial_r2
    FROM fit
    """,
)
def q_fixed_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X478 — two-way fixed-effects (within) estimator on the
    (band × month) revenue panel: demean by unit, by time, add back
    the grand mean, then OLS on the residuals — the panel-data
    workhorse that absorbs EVERY time-invariant band trait and every
    common month shock before estimating the quantity-revenue slope
    (X336's DiD is its 2×2 special case; the balanced-panel within
    transform is the exact FWL projection). Three mean rollups + one
    broadcast re-join + one scalar fold."""
    panel = (
        load(spark, sf_dir, "lineitem")
        .groupBy(
            (F.col("l_partkey") % 20).alias("unit"),
            (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("t"),
        )
        .agg(
            (
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                )
                / 1e3
            ).alias("y"),
            F.sum("l_quantity").alias("x"),
        )
    )
    mu = panel.groupBy("unit").agg(
        F.avg("y").alias("uy"), F.avg("x").alias("ux")
    )
    mt = panel.groupBy("t").agg(
        F.avg("y").alias("ty"), F.avg("x").alias("tx")
    )
    g = panel.agg(F.avg("y").alias("gy"), F.avg("x").alias("gx"))
    within = (
        panel.join(F.broadcast(mu), "unit")
        .join(F.broadcast(mt), "t")
        .crossJoin(F.broadcast(g))
        .select(
            (
                F.col("y") - F.col("uy") - F.col("ty") + F.col("gy")
            ).alias("wy"),
            (
                F.col("x") - F.col("ux") - F.col("tx") + F.col("gx")
            ).alias("wx"),
        )
    )
    fit = within.agg(
        F.count("*").alias("n"),
        F.sum(F.col("wx") * F.col("wy")).alias("sxy"),
        F.sum(F.col("wx") * F.col("wx")).alias("sxx"),
        F.sum(F.col("wy") * F.col("wy")).alias("syy"),
    )
    return fit.select(
        F.col("n").cast("long").alias("n_cells"),
        F.round(F.col("sxy") / F.col("sxx"), 8).alias("beta_within"),
        F.round(
            F.pow(F.col("sxy"), 2) / (F.col("sxx") * F.col("syy")), 6
        ).alias("partial_r2"),
    )


# ---------------------------------------------------------------------------
# X479 — instrumental variables (Wald estimator)
# ---------------------------------------------------------------------------


@query(
    "q_iv_wald",
    oracle="""
    WITH x AS (
      SELECT CAST(l_quantity AS DOUBLE) AS endo,
             l_extendedprice * (1 - l_discount) / 1e3 AS y,
             CASE WHEN l_partkey % 2 = 0 THEN 1.0 ELSE 0 END AS z
      FROM lineitem
    ), m AS (
      SELECT count(*) AS n, avg(endo) AS mx, avg(y) AS my, avg(z) AS mz
      FROM x
    ), s AS (
      SELECT m.n,
             sum((z - m.mz) * (y - m.my)) AS szy,
             sum((z - m.mz) * (endo - m.mx)) AS szx,
             sum((endo - m.mx) * (y - m.my)) AS sxy,
             sum((endo - m.mx) * (endo - m.mx)) AS sxx,
             sum((z - m.mz) * (z - m.mz)) AS szz
      FROM x CROSS JOIN m GROUP BY m.n
    )
    SELECT CAST(n AS BIGINT) AS n,
           round(szy / szx, 8) AS beta_iv,
           round(sxy / sxx, 8) AS beta_ols,
           round(szx / szz, 8) AS first_stage_coef,
           round(pow(szx, 2) / (szz * sxx), 6) AS instrument_strength_r2
    FROM s
    """,
)
def q_iv_wald(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X479 — instrumental-variables estimation in the Wald /
    indirect-least-squares closed form: β_IV = cov(z,y)/cov(z,x) for
    the quantity→revenue effect, instrumented by part-key parity (a
    stand-in exogenous assignment; with a real instrument this IS
    2SLS with one instrument and one endogenous regressor), printed
    against naive OLS and with the first-stage strength R² — weak
    instruments (R²≈0) make β_IV explode, which is why the first
    stage is always reported. One moments pass, scalar algebra."""
    x = load(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("double").alias("endo"),
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount")) / 1e3
        ).alias("y"),
        (F.col("l_partkey") % 2 == 0).cast("double").alias("z"),
    )
    m = x.agg(
        F.count("*").alias("n"),
        F.avg("endo").alias("mx"),
        F.avg("y").alias("my"),
        F.avg("z").alias("mz"),
    )
    dz = F.col("z") - F.col("mz")
    dx = F.col("endo") - F.col("mx")
    dy = F.col("y") - F.col("my")
    s = (
        x.crossJoin(F.broadcast(m))
        .groupBy("n")
        .agg(
            F.sum(dz * dy).alias("szy"),
            F.sum(dz * dx).alias("szx"),
            F.sum(dx * dy).alias("sxy"),
            F.sum(dx * dx).alias("sxx"),
            F.sum(dz * dz).alias("szz"),
        )
    )
    return s.select(
        F.col("n").cast("long").alias("n"),
        F.round(F.col("szy") / F.col("szx"), 8).alias("beta_iv"),
        F.round(F.col("sxy") / F.col("sxx"), 8).alias("beta_ols"),
        F.round(F.col("szx") / F.col("szz"), 8).alias(
            "first_stage_coef"
        ),
        F.round(
            F.pow(F.col("szx"), 2) / (F.col("szz") * F.col("sxx")), 6
        ).alias("instrument_strength_r2"),
    )


# ---------------------------------------------------------------------------
# X480 — regression discontinuity
# ---------------------------------------------------------------------------


@query(
    "q_rdd",
    oracle="""
    WITH x AS (
      SELECT value - 15.0 AS r,
             CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0 END AS y
      FROM events WHERE value BETWEEN 5 AND 25
    ), sides AS (
      SELECT CASE WHEN r >= 0 THEN 1 ELSE 0 END AS side, r, y FROM x
    ), fits AS (
      SELECT side, count(*) AS n, avg(r) AS mr, avg(y) AS my,
             sum(r * y) AS sry, sum(r * r) AS srr
      FROM sides GROUP BY side
    ), coefs AS (
      SELECT side, n,
             (sry - n * mr * my) / (srr - n * mr * mr) AS b,
             my - (sry - n * mr * my) / (srr - n * mr * mr) * mr AS a
      FROM fits
    ), wide AS (
      SELECT max(CASE WHEN side = 0 THEN a END) AS a0,
             max(CASE WHEN side = 0 THEN b END) AS b0,
             max(CASE WHEN side = 0 THEN n END) AS n0,
             max(CASE WHEN side = 1 THEN a END) AS a1,
             max(CASE WHEN side = 1 THEN b END) AS b1,
             max(CASE WHEN side = 1 THEN n END) AS n1
      FROM coefs
    )
    SELECT CAST(n0 AS BIGINT) AS n_below, CAST(n1 AS BIGINT) AS n_above,
           round(a0, 6) AS intercept_below,
           round(a1, 6) AS intercept_above,
           round(b0, 8) AS slope_below, round(b1, 8) AS slope_above,
           round(a1 - a0, 6) AS rd_jump
    FROM wide
    """,
)
def q_rdd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X480 — sharp regression discontinuity at the value=15 cutoff
    (±10 bandwidth): separate local-linear fits of the purchase rate
    on the centered running variable on each side, RD estimate = the
    intercept jump at the cutoff — the quasi-experimental design for
    threshold-assigned treatments (discounts kick in above a score,
    alerts above a level), identifying a causal effect with NO
    randomization where X199's naive comparison of above-vs-below
    would absorb the slope. Two per-side moment folds."""
    x = load(spark, sf_dir, "events").filter(
        F.col("value").between(5, 25)
    ).select(
        (F.col("value") - 15.0).alias("r"),
        (F.col("event_type") == "purchase").cast("double").alias("y"),
    )
    fits = (
        x.withColumn("side", (F.col("r") >= 0).cast("int"))
        .groupBy("side")
        .agg(
            F.count("*").alias("n"),
            F.avg("r").alias("mr"),
            F.avg("y").alias("my"),
            F.sum(F.col("r") * F.col("y")).alias("sry"),
            F.sum(F.col("r") * F.col("r")).alias("srr"),
        )
    )
    b = (F.col("sry") - F.col("n") * F.col("mr") * F.col("my")) / (
        F.col("srr") - F.col("n") * F.col("mr") * F.col("mr")
    )
    coefs = fits.select(
        "side", "n", b.alias("b"), (F.col("my") - b * F.col("mr")).alias("a")
    )
    wide = coefs.agg(
        F.max(F.when(F.col("side") == 0, F.col("a"))).alias("a0"),
        F.max(F.when(F.col("side") == 0, F.col("b"))).alias("b0"),
        F.max(F.when(F.col("side") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("side") == 1, F.col("a"))).alias("a1"),
        F.max(F.when(F.col("side") == 1, F.col("b"))).alias("b1"),
        F.max(F.when(F.col("side") == 1, F.col("n"))).alias("n1"),
    )
    return wide.select(
        F.col("n0").cast("long").alias("n_below"),
        F.col("n1").cast("long").alias("n_above"),
        F.round("a0", 6).alias("intercept_below"),
        F.round("a1", 6).alias("intercept_above"),
        F.round("b0", 8).alias("slope_below"),
        F.round("b1", 8).alias("slope_above"),
        F.round(F.col("a1") - F.col("a0"), 6).alias("rd_jump"),
    )


# ---------------------------------------------------------------------------
# X481 — quantile treatment effects
# ---------------------------------------------------------------------------


@query(
    "q_qte",
    oracle="""
    WITH x AS (
      SELECT user_id % 2 AS arm, value FROM events
    ), vc AS (
      SELECT arm, value, count(*) AS c FROM x GROUP BY arm, value
    ), cum AS (
      SELECT arm, value,
             sum(c) OVER (PARTITION BY arm ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS le,
             sum(c) OVER (PARTITION BY arm) AS n
      FROM vc
    ), deciles AS (SELECT unnest(generate_series(1, 9)) AS p10),
    cuts AS (
      SELECT d.p10, c.arm, min(c.value) AS value
      FROM deciles d JOIN cum c
        ON c.le >= CAST(ceil(c.n * d.p10 / 10.0) AS BIGINT)
      GROUP BY d.p10, c.arm
    ), wide AS (
      SELECT p10,
             max(CASE WHEN arm = 0 THEN value END) AS q0,
             max(CASE WHEN arm = 1 THEN value END) AS q1
      FROM cuts GROUP BY p10
    )
    SELECT CAST(p10 * 10 AS BIGINT) AS percentile,
           round(q0, 4) AS q_control, round(q1, 4) AS q_treatment,
           round(q1 - q0, 4) AS qte
    FROM wide
    """,
)
def q_qte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X481 — quantile treatment effects: the arm-1 minus arm-0 value
    distribution compared decile by decile (discrete rank-p order
    statistics, engine-identical) — the distributional readout that
    catches what the mean effect hides (a treatment that helps the
    p90 and hurts the p10 can average to zero; X199 would call it
    null). Order statistics come from cumulative counts over the
    bounded per-arm VALUE DOMAIN (the ECOD spelling — no rank window
    ever sorts the fact table), cut against a 9-row decile grid."""
    x = load(spark, sf_dir, "events").select(
        (F.col("user_id") % 2).alias("arm"), "value"
    )
    vc = x.groupBy("arm", "value").agg(F.count("*").alias("c"))
    cum = vc.select(
        "arm",
        "value",
        F.sum("c")
        .over(
            Window.partitionBy("arm")
            .orderBy("value")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("le"),
        F.sum("c").over(Window.partitionBy("arm")).alias("n"),
    )
    deciles = spark.range(1, 10).select(F.col("id").alias("p10"))
    cuts = (
        cum.crossJoin(F.broadcast(deciles))
        .filter(
            F.col("le")
            >= F.ceil(F.col("n") * F.col("p10") / 10.0).cast("long")
        )
        .groupBy("p10", "arm")
        .agg(F.min("value").alias("value"))
    )
    wide = cuts.groupBy("p10").agg(
        F.max(F.when(F.col("arm") == 0, F.col("value"))).alias("q0"),
        F.max(F.when(F.col("arm") == 1, F.col("value"))).alias("q1"),
    )
    return wide.select(
        (F.col("p10") * 10).cast("long").alias("percentile"),
        F.round("q0", 4).alias("q_control"),
        F.round("q1", 4).alias("q_treatment"),
        F.round(F.col("q1") - F.col("q0"), 4).alias("qte"),
    )


# ---------------------------------------------------------------------------
# X482 — Kish design effect
# ---------------------------------------------------------------------------


@query(
    "q_design_effect",
    oracle="""
    WITH cells AS (
      SELECT doc_id % 4 AS band, lang, count(*) AS n
      FROM documents GROUP BY 1, 2
    ), tot AS (SELECT sum(n) AS t, count(DISTINCT band) AS nb,
                      count(DISTINCT lang) AS nl FROM cells),
    target AS (
      SELECT c.band, c.lang, c.n,
             (t.t / (t.nb * t.nl)) / c.n AS w
      FROM cells c CROSS JOIN tot t
    ), weights AS (
      SELECT n, w, n * w AS sw, n * w * w AS sww FROM target
    ), s AS (
      SELECT sum(n) AS n, sum(sw) AS sw, sum(sww) AS sww FROM weights
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           round(n * sww / (sw * sw), 6) AS design_effect,
           CAST(round(n / (n * sww / (sw * sw)), 0) AS BIGINT)
             AS effective_sample_size,
           round(1.0 / (n * sww / (sw * sw)), 6) AS efficiency
    FROM s
    """,
)
def q_design_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X482 — Kish's design effect for cell-balancing weights (each
    (band, lang) cell weighted to the uniform target, the single-step
    version of X432's raking): DEFF = n·Σw²/(Σw)² over documents,
    effective sample size n/DEFF — the price of weighting that every
    weighted estimate's CI must be widened by (X244 computes the same
    ESS for class weights; this is the survey-statistics original).
    One cell rollup, scalar algebra."""
    cells = (
        load(spark, sf_dir, "documents")
        .groupBy((F.col("doc_id") % 4).alias("band"), "lang")
        .agg(F.count("*").alias("n"))
    )
    tot = cells.agg(
        F.sum("n").alias("t"),
        F.countDistinct("band").alias("nb"),
        F.countDistinct("lang").alias("nl"),
    )
    target = cells.crossJoin(F.broadcast(tot)).select(
        "n",
        (
            (F.col("t") / (F.col("nb") * F.col("nl"))) / F.col("n")
        ).alias("w"),
    )
    s = target.agg(
        F.sum("n").alias("n"),
        F.sum(F.col("n") * F.col("w")).alias("sw"),
        F.sum(F.col("n") * F.col("w") * F.col("w")).alias("sww"),
    )
    deff = F.col("n") * F.col("sww") / (F.col("sw") * F.col("sw"))
    return s.select(
        F.col("n").cast("long").alias("n_docs"),
        F.round(deff, 6).alias("design_effect"),
        F.round(F.col("n") / deff, 0).cast("long").alias(
            "effective_sample_size"
        ),
        F.round(1.0 / deff, 6).alias("efficiency"),
    )
