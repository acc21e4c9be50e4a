"""Round-5 batch G: experiment interference, paired nonparametrics,
model explanation — plus the banded-DTW operator (X555,
operators/dtw.py, pytest-pinned: genuinely sequential DP per pair,
the documented Pandas-UDF boundary).

Gated: network-interference diagnostic (X552 — SUTVA is the
assumption every A/B readout silently makes on a connected
marketplace; this measures the exposure gradient that would violate
it), Wilcoxon signed-rank (X553 — the PAIRED nonparametric test
completing the grid X195 Mann-Whitney × X285 paired-t left open),
exact Shapley attributions for a linear model (X554 — for linear
models φⱼ = βⱼ(xⱼ−x̄ⱼ) is EXACT, no sampling; the explanation row for
the X322 OLS family), and the Friedman test (X556 — k related
samples by within-block ranks; with k=3 the χ²(2) tail is exp(−x/2),
closed-form in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load
from .registry import query
from .round4o import _ERF_SQL, _p_two_sided

# ---------------------------------------------------------------------------
# X552 — network-interference (SUTVA) diagnostic
# ---------------------------------------------------------------------------


@query(
    "q_network_interference",
    oracle="""
    WITH sc AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), tr AS (
      SELECT c_custkey AS c,
             CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS t
      FROM customer
    ), sup AS (
      SELECT sc.s, count(*) AS n_cust, sum(tr.t) AS n_treat
      FROM sc JOIN tr ON sc.c = tr.c GROUP BY sc.s
    ), expo AS (
      SELECT sc.c, any_value(tr.t) AS t,
             round(avg((sup.n_treat - tr.t) * 1.0 / (sup.n_cust - 1)),
                   6) AS exposure
      FROM sc JOIN tr ON sc.c = tr.c JOIN sup ON sc.s = sup.s
      WHERE sup.n_cust > 1
      GROUP BY sc.c
    ), spend AS (
      SELECT o_custkey AS c, round(sum(o_totalprice), 2) AS y
      FROM orders GROUP BY o_custkey
    ), ctl AS (
      SELECT e.exposure AS x, spend.y
      FROM expo e JOIN spend ON e.c = spend.c WHERE e.t = 0
    ), fit AS (
      SELECT count(*) AS n, round(sum(x), 4) AS sx,
             round(sum(y), 2) AS sy, round(sum(x * x), 4) AS sxx,
             round(sum(x * y), 2) AS sxy
      FROM ctl
    ), bins AS (
      SELECT least(CAST(floor(x * 5) AS BIGINT), 4) AS bin,
             count(*) AS n, round(sum(y), 2) AS sy,
             round(sum(x), 4) AS sx
      FROM ctl GROUP BY 1
    )
    SELECT b.bin AS exposure_bin, CAST(b.n AS BIGINT) AS n_controls,
           round(b.sx / b.n, 6) AS mean_exposure,
           round(b.sy / b.n, 2) AS mean_spend,
           round((f.n * f.sxy - f.sx * f.sy)
                 / (f.n * f.sxx - f.sx * f.sx), 4)
             AS interference_slope
    FROM bins b CROSS JOIN fit f
    """,
)
def q_network_interference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X552 — network-interference diagnostic: every CONTROL
    customer's treated-neighbor EXPOSURE (the supplier-neighborhood
    mean — for each of its suppliers, the treated share of that
    supplier's other customers, averaged) against its outcome.  Under
    SUTVA the exposure gradient is flat; a nonzero slope is the
    spillover signature that invalidates the naive A/B readout (the
    diagnostic behind cluster-randomized designs).  Neighborhood
    means are computed from SUPPLIER-LEVEL counts — no
    customer-pair materialization, so the 13M co-purchase pairs this
    graph implies are never built.

    Exposure is a ratio of integer counts; outcome sums rounded.
    Scale: two fact rollups + an edge-keyed join — the exposure
    formulation is the thing to copy at 100 TB, where materializing
    neighbor pairs is the classic OOM."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    cst = load(spark, sf_dir, "customer")
    sc = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    tr = cst.select(
        F.col("c_custkey").alias("c"),
        F.when(F.col("c_mktsegment") == "BUILDING", 1)
        .otherwise(0)
        .alias("t"),
    )
    sct = sc.join(F.broadcast(tr), "c")
    sup = sct.groupBy("s").agg(
        F.count("*").alias("n_cust"), F.sum("t").alias("n_treat")
    )
    expo = (
        sct.join(F.broadcast(sup), "s")
        .filter(F.col("n_cust") > 1)
        .groupBy("c")
        .agg(
            F.first("t").alias("t"),
            F.round(
                F.avg(
                    (F.col("n_treat") - F.col("t"))
                    / (F.col("n_cust") - 1)
                ),
                6,
            ).alias("exposure"),
        )
    )
    spend = o.groupBy(F.col("o_custkey").alias("c")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("y")
    )
    ctl = (
        expo.filter(F.col("t") == 0)
        .join(spend, "c")
        .select(F.col("exposure").alias("x"), "y")
    )
    fit = ctl.agg(
        F.count("*").alias("n"),
        F.round(F.sum("x"), 4).alias("sx"),
        F.round(F.sum("y"), 2).alias("sy"),
        F.round(F.sum(F.col("x") * F.col("x")), 4).alias("sxx"),
        F.round(F.sum(F.col("x") * F.col("y")), 2).alias("sxy"),
    )
    bins = ctl.groupBy(
        F.least(F.floor(F.col("x") * 5).cast("long"), F.lit(4)).alias("bin")
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum("y"), 2).alias("bsy"),
        F.round(F.sum("x"), 4).alias("bsx"),
    )
    slope = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    return bins.crossJoin(
        F.broadcast(fit.select(F.round(slope, 4).alias("slope")))
    ).select(
        F.col("bin").alias("exposure_bin"),
        F.col("n").cast("long").alias("n_controls"),
        F.round(F.col("bsx") / F.col("n"), 6).alias("mean_exposure"),
        F.round(F.col("bsy") / F.col("n"), 2).alias("mean_spend"),
        F.col("slope").alias("interference_slope"),
    )


# ---------------------------------------------------------------------------
# X553 — Wilcoxon signed-rank test (paired, nonparametric)
# ---------------------------------------------------------------------------

_WX_CUT = "1998-01-01"


@query(
    "q_wilcoxon_signed_rank",
    oracle=f"""
    WITH halves AS (
      SELECT o_custkey,
             round(sum(CASE WHEN o_orderdate < TIMESTAMP '{_WX_CUT}'
                            THEN o_totalprice END), 2) AS s1,
             count(CASE WHEN o_orderdate < TIMESTAMP '{_WX_CUT}'
                        THEN 1 END) AS n1,
             round(sum(CASE WHEN o_orderdate >= TIMESTAMP '{_WX_CUT}'
                            THEN o_totalprice END), 2) AS s2,
             count(CASE WHEN o_orderdate >= TIMESTAMP '{_WX_CUT}'
                        THEN 1 END) AS n2
      FROM orders GROUP BY o_custkey
    ), d AS (
      SELECT round(s2 / n2 - s1 / n1, 6) AS d
      FROM halves WHERE n1 > 0 AND n2 > 0
        AND round(s2 / n2 - s1 / n1, 6) <> 0
    ), rk AS (
      SELECT ad, n_t,
             coalesce(sum(n_t) OVER (ORDER BY ad
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + (n_t + 1) / 2.0 AS r
      FROM (SELECT abs(d) AS ad, count(*) AS n_t FROM d GROUP BY abs(d))
    ), scored AS (
      SELECT d.d, rk.r FROM d JOIN rk ON abs(d.d) = rk.ad
    ), agg AS (
      SELECT count(*) AS n,
             sum(CASE WHEN d > 0 THEN r ELSE 0 END) AS w_plus,
             (SELECT sum(n_t * n_t * n_t - n_t) FROM rk) AS tie3
      FROM scored
    ), z AS (
      SELECT n, w_plus,
             (w_plus - n * (n + 1) / 4.0)
             / sqrt(n * (n + 1.0) * (2 * n + 1) / 24 - tie3 / 48.0)
               AS z
      FROM agg
    )
    SELECT CAST(n AS BIGINT) AS n_pairs, round(w_plus, 2) AS w_plus,
           round(z, 6) AS z,
           round(1 - {_ERF_SQL.format(z='abs(z)')}, 8) AS p_value
    FROM z
    """,
)
def q_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X553 — Wilcoxon signed-rank: each customer is its own control
    (pre- vs post-{_WX_CUT} mean order value), differences ranked by
    magnitude with MIDRANKS for ties (the X261 cumulative-count
    device), W⁺ = sum of positive-difference ranks, normal
    approximation with the exact tie correction Σ(t³−t)/48.
    Completes the engine's test grid: X195 is unpaired-nonparametric,
    X285 paired-parametric — this is the paired-nonparametric cell,
    the right test when per-pair differences are non-normal.

    Differences derive from rounded sums; ranks are exact rationals.
    Scale: one fact rollup per customer + a value-domain rank (the
    tie-group table is |distinct magnitudes|, not |rows|)."""
    o = load(spark, sf_dir, "orders")
    cut = F.lit(_WX_CUT).cast("timestamp")
    halves = o.groupBy("o_custkey").agg(
        F.round(
            F.sum(F.when(F.col("o_orderdate") < cut, F.col("o_totalprice"))),
            2,
        ).alias("s1"),
        F.count(F.when(F.col("o_orderdate") < cut, 1)).alias("n1"),
        F.round(
            F.sum(
                F.when(F.col("o_orderdate") >= cut, F.col("o_totalprice"))
            ),
            2,
        ).alias("s2"),
        F.count(F.when(F.col("o_orderdate") >= cut, 1)).alias("n2"),
    )
    dd = (
        halves.filter((F.col("n1") > 0) & (F.col("n2") > 0))
        .select(
            F.round(
                F.col("s2") / F.col("n2") - F.col("s1") / F.col("n1"), 6
            ).alias("d")
        )
        .filter(F.col("d") != 0)
    )
    grp = dd.groupBy(F.abs("d").alias("ad")).agg(
        F.count("*").alias("n_t")
    )
    wr = Window.orderBy("ad").rowsBetween(
        Window.unboundedPreceding, -1
    )
    rk = grp.select(
        "ad",
        "n_t",
        (
            F.coalesce(F.sum("n_t").over(wr), F.lit(0))
            + (F.col("n_t") + 1) / 2.0
        ).alias("r"),
    )
    tie3 = rk.agg(
        F.sum(
            F.col("n_t") * F.col("n_t") * F.col("n_t") - F.col("n_t")
        ).alias("tie3")
    )
    scored = dd.join(rk, F.abs(dd.d) == rk.ad)
    agg = (
        scored.agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("d") > 0, F.col("r")).otherwise(0.0)).alias(
                "w_plus"
            ),
        )
        .crossJoin(F.broadcast(tie3))
    )
    n, w = F.col("n"), F.col("w_plus")
    z = (w - n * (n + 1) / 4.0) / F.sqrt(
        n * (n + 1.0) * (2 * n + 1) / 24 - F.col("tie3") / 48.0
    )
    return agg.select(
        n.cast("long").alias("n_pairs"),
        F.round(w, 2).alias("w_plus"),
        F.round(z, 6).alias("z"),
        F.round(_p_two_sided(z), 8).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# X554 — exact Shapley attributions for a linear model
# ---------------------------------------------------------------------------


@query(
    "q_linear_shap",
    oracle="""
    WITH feat AS (
      SELECT c.c_custkey, round(c.c_acctbal, 6) AS x1,
             CAST(cu.n_orders AS DOUBLE) AS x2, cu.y
      FROM customer c
      JOIN (SELECT o_custkey, count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS y
            FROM orders GROUP BY o_custkey) cu
        ON cu.o_custkey = c.c_custkey
    ), m AS (
      SELECT count(*) AS n,
             round(sum(x1), 4) AS s1, round(sum(x2), 4) AS s2,
             round(sum(x1 * x1), 4) AS s11, round(sum(x2 * x2), 4) AS s22,
             round(sum(x1 * x2), 4) AS s12,
             round(sum(y), 2) AS sy, round(sum(x1 * y), 2) AS s1y,
             round(sum(x2 * y), 2) AS s2y
      FROM feat
    ), solved AS (
      SELECT n, s1, s2,
             (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
              + s2 * (s1 * s12 - s11 * s2)) AS det,
             (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
              + s2 * (s1 * s2y - s1y * s2)) AS det_b1,
             (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
              + sy * (s1 * s12 - s11 * s2)) AS det_b2
      FROM m
    ), betas AS (
      SELECT det_b1 / det AS b1, det_b2 / det AS b2,
             s1 * 1.0 / n AS m1, s2 * 1.0 / n AS m2
      FROM solved
    ), shap AS (
      SELECT 'acctbal' AS feature, b.b1 AS beta,
             sum(abs(b.b1 * (f.x1 - b.m1))) AS tot_abs,
             count(*) AS n
      FROM feat f CROSS JOIN betas b GROUP BY b.b1
      UNION ALL
      SELECT 'n_orders', b.b2,
             sum(abs(b.b2 * (f.x2 - b.m2))), count(*)
      FROM feat f CROSS JOIN betas b GROUP BY b.b2
    )
    SELECT feature, round(beta, 6) AS beta,
           round(tot_abs / n, 4) AS mean_abs_shap,
           round(tot_abs / sum(tot_abs) OVER (), 6) AS importance_share
    FROM shap
    """,
)
def q_linear_shap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X554 — EXACT Shapley feature attributions: for a linear model
    the Shapley value collapses to φⱼ(i) = βⱼ(xᵢⱼ − x̄ⱼ) — no
    coalition sampling, no approximation (the closed form KernelSHAP
    converges to).  Model: spend ~ acctbal + order count, fit by the
    same Cramer 3×3 closed form as X322; reported per feature as mean
    |φ| and importance share — the global explanation a model card
    wants next to X433's ATTRIBUTION Shapley (that one divides
    conversion credit, this one divides a prediction).

    Moment sums rounded before the solve; attributions are identical
    closed-form arithmetic in both engines.  Scale: one moment pass +
    one |φ| pass, both fact-volume scans with broadcast betas."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    cu = o.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("y"),
    )
    feat = c.join(cu, c.c_custkey == cu.o_custkey).select(
        F.round("c_acctbal", 6).alias("x1"),
        F.col("n_orders").cast("double").alias("x2"),
        "y",
    )
    m = feat.agg(
        F.count("*").alias("n"),
        F.round(F.sum("x1"), 4).alias("s1"),
        F.round(F.sum("x2"), 4).alias("s2"),
        F.round(F.sum(F.col("x1") * F.col("x1")), 4).alias("s11"),
        F.round(F.sum(F.col("x2") * F.col("x2")), 4).alias("s22"),
        F.round(F.sum(F.col("x1") * F.col("x2")), 4).alias("s12"),
        F.round(F.sum("y"), 2).alias("sy"),
        F.round(F.sum(F.col("x1") * F.col("y")), 2).alias("s1y"),
        F.round(F.sum(F.col("x2") * F.col("y")), 2).alias("s2y"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    s11, s22, s12 = F.col("s11"), F.col("s22"), F.col("s12")
    sy, s1y, s2y = F.col("sy"), F.col("s1y"), F.col("s2y")
    det = (
        n * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s12 - s11 * s2)
    )
    det_b1 = (
        n * (s1y * s22 - s12 * s2y)
        - sy * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s2y - s1y * s2)
    )
    det_b2 = (
        n * (s11 * s2y - s1y * s12)
        - s1 * (s1 * s2y - s1y * s2)
        + sy * (s1 * s12 - s11 * s2)
    )
    betas = m.select(
        (det_b1 / det).alias("b1"),
        (det_b2 / det).alias("b2"),
        (s1 * 1.0 / n).alias("m1"),
        (s2 * 1.0 / n).alias("m2"),
    )
    fb = feat.crossJoin(F.broadcast(betas))
    shap1 = fb.groupBy("b1").agg(
        F.sum(F.abs(F.col("b1") * (F.col("x1") - F.col("m1")))).alias(
            "tot_abs"
        ),
        F.count("*").alias("cnt"),
    ).select(
        F.lit("acctbal").alias("feature"),
        F.col("b1").alias("beta"),
        "tot_abs",
        "cnt",
    )
    shap2 = fb.groupBy("b2").agg(
        F.sum(F.abs(F.col("b2") * (F.col("x2") - F.col("m2")))).alias(
            "tot_abs"
        ),
        F.count("*").alias("cnt"),
    ).select(
        F.lit("n_orders").alias("feature"),
        F.col("b2").alias("beta"),
        "tot_abs",
        "cnt",
    )
    shap = shap1.unionByName(shap2)
    wall = Window.partitionBy()
    return shap.select(
        "feature",
        F.round("beta", 6).alias("beta"),
        F.round(F.col("tot_abs") / F.col("cnt"), 4).alias("mean_abs_shap"),
        F.round(
            F.col("tot_abs") / F.sum("tot_abs").over(wall), 6
        ).alias("importance_share"),
    )


# ---------------------------------------------------------------------------
# X556 — Friedman test (k related samples)
# ---------------------------------------------------------------------------

_FR_CUTS = ("1997-01-01", "1999-01-01")


@query(
    "q_friedman_test",
    oracle=f"""
    WITH per AS (
      SELECT o_custkey,
             CASE WHEN o_orderdate < TIMESTAMP '{_FR_CUTS[0]}' THEN 0
                  WHEN o_orderdate < TIMESTAMP '{_FR_CUTS[1]}' THEN 1
                  ELSE 2 END AS period,
             o_totalprice
      FROM orders
    ), cell AS (
      SELECT o_custkey, period,
             round(sum(o_totalprice), 2) / count(*) AS m
      FROM per GROUP BY o_custkey, period
    ), blocks AS (
      SELECT o_custkey FROM cell GROUP BY o_custkey
      HAVING count(*) = 3
    ), rk AS (
      SELECT c.o_custkey, c.period,
             row_number() OVER (PARTITION BY c.o_custkey
                                ORDER BY c.m, c.period) AS r
      FROM cell c JOIN blocks b ON c.o_custkey = b.o_custkey
    ), rs AS (
      SELECT period, sum(r) AS rj, count(*) AS n
      FROM rk GROUP BY period
    ), stat AS (
      SELECT any_value(n) AS n,
             12.0 / (any_value(n) * 3 * 4) * sum(rj * rj)
               - 3 * any_value(n) * 4 AS chi2
      FROM rs
    )
    SELECT rs.period, round(rs.rj * 1.0 / rs.n, 6) AS mean_rank,
           CAST(st.n AS BIGINT) AS n_blocks,
           round(st.chi2, 6) AS chi2,
           round(exp(-st.chi2 / 2), 8) AS p_value
    FROM rs CROSS JOIN stat st
    """,
)
def q_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X556 — Friedman test: does mean order value differ across three
    eras, judged WITHIN each customer (blocks remove between-customer
    level differences — the repeated-measures ANOVA's nonparametric
    twin, completing X283/X289 which compare independent groups)?
    Each complete block ranks its three period means, χ²_F =
    12/(nk(k+1))·ΣRⱼ² − 3n(k+1); with k = 3 the χ²(2) survival
    function is exactly exp(−x/2) — a closed form both engines
    evaluate identically, no incomplete-gamma approximation.

    Period means derive from rounded sums; ranks use a period
    tie-break (continuous means make true ties measure-zero).
    Scale: customer-keyed rollup + per-block rank over 3 rows."""
    o = load(spark, sf_dir, "orders")
    period = (
        F.when(
            F.col("o_orderdate") < F.lit(_FR_CUTS[0]).cast("timestamp"), 0
        )
        .when(
            F.col("o_orderdate") < F.lit(_FR_CUTS[1]).cast("timestamp"), 1
        )
        .otherwise(2)
    )
    cell = o.groupBy("o_custkey", period.alias("period")).agg(
        (F.round(F.sum("o_totalprice"), 2) / F.count("*")).alias("m")
    )
    blocks = (
        cell.groupBy("o_custkey")
        .agg(F.count("*").alias("k"))
        .filter(F.col("k") == 3)
        .select("o_custkey")
    )
    rk = cell.join(blocks, "o_custkey").select(
        "o_custkey",
        "period",
        F.row_number()
        .over(Window.partitionBy("o_custkey").orderBy("m", "period"))
        .alias("r"),
    )
    rs = rk.groupBy("period").agg(
        F.sum("r").alias("rj"), F.count("*").alias("n")
    )
    stat = rs.agg(
        F.first("n").alias("nb"),
        (
            12.0 / (F.first("n") * 3 * 4) * F.sum(F.col("rj") * F.col("rj"))
            - 3 * F.first("n") * 4
        ).alias("chi2"),
    )
    return rs.crossJoin(F.broadcast(stat)).select(
        "period",
        F.round(F.col("rj") / F.col("n"), 6).alias("mean_rank"),
        F.col("nb").cast("long").alias("n_blocks"),
        F.round("chi2", 6).alias("chi2"),
        F.round(F.exp(-F.col("chi2") / 2), 8).alias("p_value"),
    )
