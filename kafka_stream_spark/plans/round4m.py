"""Round-4 batch M: statistical process control + classical inference
completions (X353-X360).

The reference pipeline gates records with hand-written threshold rules
(/root/reference/kafka_stream/kafka_s.py:300-340); the industrial
version of that gate is SPC — control charts, capability indices, and
the variance-homogeneity / paired-contingency tests that decide whether
a threshold is even meaningful. Everything here is sufficient-statistics
algebra over one or two scans: no UDFs, no windows over the raw fact
table beyond grouped quantiles, every aggregate map-side combinable.
At 100 TB each query reduces to a handful of per-group scalars before
any join, and every join is against a broadcast one-row frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load
from .registry import query

# ---------------------------------------------------------------------------
# X353 — X-bar/R control chart
# ---------------------------------------------------------------------------


@query(
    "q_xbar_r",
    oracle="""
    WITH sg AS (
      SELECT event_id // 5 AS sg, avg(value) AS xbar,
             max(value) - min(value) AS r, count(*) AS n
      FROM events GROUP BY 1
    ), ok AS (SELECT * FROM sg WHERE n = 5),
    chart AS (
      SELECT count(*) AS n_sub, avg(xbar) AS xbb, avg(r) AS rbar
      FROM ok
    )
    SELECT CAST(c.n_sub AS BIGINT) AS n_subgroups,
           round(c.xbb, 6) AS xbar_bar, round(c.rbar, 6) AS r_bar,
           round(c.xbb + 0.577 * c.rbar, 6) AS ucl_x,
           round(c.xbb - 0.577 * c.rbar, 6) AS lcl_x,
           round(2.114 * c.rbar, 6) AS ucl_r,
           CAST(sum(CASE WHEN o.xbar > c.xbb + 0.577 * c.rbar
                           OR o.xbar < c.xbb - 0.577 * c.rbar
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_out_x,
           CAST(sum(CASE WHEN o.r > 2.114 * c.rbar THEN 1 ELSE 0 END)
                AS BIGINT) AS n_out_r
    FROM ok o CROSS JOIN chart c
    GROUP BY c.n_sub, c.xbb, c.rbar
    """,
)
def q_xbar_r(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X353 — X-bar/R control chart (Shewhart, subgroup size 5): rational
    subgroups of 5 consecutive events, subgroup mean and range, chart
    limits from the standard n=5 constants (A2=0.577, D3=0, D4=2.114),
    and the count of out-of-control subgroups on each chart — the
    monitoring layer a production rules engine (reference kafka_s.py's
    hand thresholds) should sit behind. One grouped rollup into ~n/5
    subgroup scalars, one broadcast of the 3-scalar chart row back over
    them; partial (incomplete trailing) subgroups excluded as in
    practice."""
    sg = (
        load(spark, sf_dir, "events")
        .groupBy((F.col("event_id") / 5).cast("long").alias("sg"))
        .agg(
            F.avg("value").alias("xbar"),
            (F.max("value") - F.min("value")).alias("r"),
            F.count("*").alias("n"),
        )
        .filter(F.col("n") == 5)
    )
    chart = sg.agg(
        F.count("*").alias("n_sub"),
        F.avg("xbar").alias("xbb"),
        F.avg("r").alias("rbar"),
    )
    ucl_x = F.col("xbb") + 0.577 * F.col("rbar")
    lcl_x = F.col("xbb") - 0.577 * F.col("rbar")
    ucl_r = 2.114 * F.col("rbar")
    return (
        sg.crossJoin(F.broadcast(chart))
        .groupBy("n_sub", "xbb", "rbar")
        .agg(
            F.sum(
                ((F.col("xbar") > ucl_x) | (F.col("xbar") < lcl_x)).cast(
                    "int"
                )
            ).alias("out_x"),
            F.sum((F.col("r") > ucl_r).cast("int")).alias("out_r"),
        )
        .select(
            F.col("n_sub").cast("long").alias("n_subgroups"),
            F.round("xbb", 6).alias("xbar_bar"),
            F.round("rbar", 6).alias("r_bar"),
            F.round(ucl_x, 6).alias("ucl_x"),
            F.round(lcl_x, 6).alias("lcl_x"),
            F.round(ucl_r, 6).alias("ucl_r"),
            F.col("out_x").cast("long").alias("n_out_x"),
            F.col("out_r").cast("long").alias("n_out_r"),
        )
    )


# ---------------------------------------------------------------------------
# X354 — process capability (Cp / Cpk)
# ---------------------------------------------------------------------------


@query(
    "q_cpk",
    oracle="""
    WITH s AS (
      SELECT event_type, count(*) AS n, avg(value) AS m,
             sum(value * value) AS ss,
             sum(CASE WHEN value < 0 OR value > 30 THEN 1 ELSE 0 END)
               AS n_oos
      FROM events GROUP BY event_type
    ), v AS (
      SELECT *, sqrt((ss - n * m * m) / (n - 1)) AS sd FROM s
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           round(m, 4) AS mean_value, round(sd, 6) AS sd,
           round(30.0 / (6 * sd), 6) AS cp,
           round(least((30.0 - m) / (3 * sd), m / (3 * sd)), 6) AS cpk,
           round(n_oos * 1000000.0 / n, 2) AS ppm_out
    FROM v
    """,
)
def q_cpk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X354 — process capability indices per event type against spec
    limits [LSL=0, USL=30]: Cp = (USL-LSL)/6s (potential), Cpk =
    min((USL-m)/3s, (m-LSL)/3s) (centering-penalized actual), plus the
    observed defect rate in ppm — the vocabulary quality engineering
    uses to say whether X353's in-control process actually meets spec.
    Sample sd in explicit-moments form so both engines run identical
    arithmetic. One map-side-combinable rollup, k scalar rows out."""
    s = (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.avg("value").alias("m"),
            F.sum(F.col("value") * F.col("value")).alias("ss"),
            F.sum(
                ((F.col("value") < 0) | (F.col("value") > 30)).cast("int")
            ).alias("n_oos"),
        )
    )
    sd = F.sqrt(
        (F.col("ss") - F.col("n") * F.col("m") * F.col("m"))
        / (F.col("n") - 1)
    )
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round("m", 4).alias("mean_value"),
        F.round(sd, 6).alias("sd"),
        F.round(F.lit(30.0) / (6 * sd), 6).alias("cp"),
        F.round(
            F.least(
                (F.lit(30.0) - F.col("m")) / (3 * sd),
                F.col("m") / (3 * sd),
            ),
            6,
        ).alias("cpk"),
        F.round(F.col("n_oos") * 1000000.0 / F.col("n"), 2).alias(
            "ppm_out"
        ),
    )


# ---------------------------------------------------------------------------
# X355 — Brown-Forsythe (median-based Levene) variance homogeneity
# ---------------------------------------------------------------------------


@query(
    "q_levene",
    oracle="""
    WITH x AS (
      SELECT l_returnflag AS g, CAST(l_quantity AS DOUBLE) AS v
      FROM lineitem
    ), med AS (
      SELECT g, CAST(quantile_cont(v, 0.5) AS DOUBLE) AS med
      FROM x GROUP BY g
    ), z AS (
      SELECT x.g, abs(x.v - med.med) AS z FROM x JOIN med USING (g)
    ), grp AS (
      SELECT g, count(*) AS n, avg(z) AS m, sum(z * z) AS ss
      FROM z GROUP BY g
    ), tot AS (SELECT count(*) AS nt, avg(z) AS gm FROM z),
    parts AS (
      SELECT (SELECT count(*) FROM grp) AS k, tot.nt,
             sum(grp.n * (grp.m - tot.gm) * (grp.m - tot.gm)) AS ssb,
             sum(grp.ss - grp.n * grp.m * grp.m) AS ssw
      FROM grp CROSS JOIN tot GROUP BY tot.nt
    )
    SELECT CAST(k AS BIGINT) AS k_groups, CAST(nt AS BIGINT) AS n_total,
           round((ssb / (k - 1)) / (ssw / (nt - k)), 6) AS w_stat
    FROM parts
    """,
)
def q_levene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X355 — Brown-Forsythe test (Levene's test with group MEDIANS):
    one-way ANOVA on |v - median_g|, the robust pre-check that decides
    whether X283's plain ANOVA or X196's Welch correction applies.
    Exact grouped median (same interpolated percentile in both
    engines), one re-join of the k medians (broadcast), then the X283
    sufficient-statistics F — the raw column is scanned twice and
    shuffled never."""
    x = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        F.col("l_quantity").cast("double").alias("v"),
    )
    med = x.groupBy("g").agg(F.expr("percentile(v, 0.5)").alias("med"))
    z = x.join(F.broadcast(med), "g").select(
        "g", F.abs(F.col("v") - F.col("med")).alias("z")
    )
    grp = z.groupBy("g").agg(
        F.count("*").alias("n"),
        F.avg("z").alias("m"),
        F.sum(F.col("z") * F.col("z")).alias("ss"),
    )
    tot = z.agg(F.count("*").alias("nt"), F.avg("z").alias("gm"))
    parts = (
        grp.crossJoin(F.broadcast(tot))
        .groupBy("nt")
        .agg(
            F.count("*").alias("k"),
            F.sum(
                F.col("n")
                * (F.col("m") - F.col("gm"))
                * (F.col("m") - F.col("gm"))
            ).alias("ssb"),
            F.sum(
                F.col("ss") - F.col("n") * F.col("m") * F.col("m")
            ).alias("ssw"),
        )
    )
    return parts.select(
        F.col("k").cast("long").alias("k_groups"),
        F.col("nt").cast("long").alias("n_total"),
        F.round(
            (F.col("ssb") / (F.col("k") - 1))
            / (F.col("ssw") / (F.col("nt") - F.col("k"))),
            6,
        ).alias("w_stat"),
    )


# ---------------------------------------------------------------------------
# X356 — Bartlett's test
# ---------------------------------------------------------------------------


@query(
    "q_bartlett",
    oracle="""
    WITH x AS (
      SELECT l_returnflag AS g, CAST(l_quantity AS DOUBLE) AS v
      FROM lineitem
    ), grp AS (
      SELECT g, count(*) AS n, avg(v) AS m, sum(v * v) AS ss
      FROM x GROUP BY g
    ), v2 AS (
      SELECT g, n, (ss - n * m * m) / (n - 1) AS s2 FROM grp
    ), agg AS (
      SELECT count(*) AS k, sum(n) AS nt,
             sum((n - 1) * s2) AS pooled_num,
             sum((n - 1) * ln(s2)) AS sum_ln,
             sum(1.0 / (n - 1)) AS sum_inv
      FROM v2
    )
    SELECT CAST(k AS BIGINT) AS k_groups, CAST(nt AS BIGINT) AS n_total,
           round(((nt - k) * ln(pooled_num / (nt - k)) - sum_ln)
                 / (1 + (sum_inv - 1.0 / (nt - k)) / (3 * (k - 1))),
                 6) AS chi2_stat
    FROM agg
    """,
)
def q_bartlett(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X356 — Bartlett's chi-square test of equal variances: the
    likelihood-ratio companion to X355's rank-robust Brown-Forsythe
    (Bartlett is more powerful under normality, BF survives heavy
    tails; dashboards run both). chi2 = [(N-k)·ln(sp²) - Σ(n_i-1)·ln
    (s_i²)] / C with the standard C correction. Pure
    sufficient-statistics: one grouped rollup to k rows, one scalar
    fold — nothing but k scalars ever crosses the wire."""
    x = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        F.col("l_quantity").cast("double").alias("v"),
    )
    grp = x.groupBy("g").agg(
        F.count("*").alias("n"),
        F.avg("v").alias("m"),
        F.sum(F.col("v") * F.col("v")).alias("ss"),
    )
    s2 = (F.col("ss") - F.col("n") * F.col("m") * F.col("m")) / (
        F.col("n") - 1
    )
    v2 = grp.select("g", "n", s2.alias("s2"))
    agg = v2.agg(
        F.count("*").alias("k"),
        F.sum("n").alias("nt"),
        F.sum((F.col("n") - 1) * F.col("s2")).alias("pooled_num"),
        F.sum((F.col("n") - 1) * F.log("s2")).alias("sum_ln"),
        F.sum(1.0 / (F.col("n") - 1)).alias("sum_inv"),
    )
    nk = F.col("nt") - F.col("k")
    stat = (nk * F.log(F.col("pooled_num") / nk) - F.col("sum_ln")) / (
        1 + (F.col("sum_inv") - 1.0 / nk) / (3 * (F.col("k") - 1))
    )
    return agg.select(
        F.col("k").cast("long").alias("k_groups"),
        F.col("nt").cast("long").alias("n_total"),
        F.round(stat, 6).alias("chi2_stat"),
    )


# ---------------------------------------------------------------------------
# X357 — G-test of independence
# ---------------------------------------------------------------------------


@query(
    "q_gtest",
    oracle="""
    WITH x AS (
      SELECT event_type AS r, CASE WHEN value > 10 THEN 1 ELSE 0 END AS c
      FROM events
    ), cell AS (SELECT r, c, count(*) AS o FROM x GROUP BY r, c),
    rt AS (SELECT r, sum(o) AS rn FROM cell GROUP BY r),
    ct AS (SELECT c, sum(o) AS cn FROM cell GROUP BY c),
    n AS (SELECT sum(o) AS nn FROM cell)
    SELECT CAST((SELECT count(*) FROM rt) AS BIGINT) AS n_rows,
           CAST((SELECT count(*) FROM ct) AS BIGINT) AS n_cols,
           CAST(((SELECT count(*) FROM rt) - 1)
                * ((SELECT count(*) FROM ct) - 1) AS BIGINT) AS df,
           round(2 * sum(cell.o
                 * ln(cell.o / (rt.rn * ct.cn * 1.0 / n.nn))), 6)
             AS g_stat
    FROM cell JOIN rt USING (r) JOIN ct USING (c) CROSS JOIN n
    """,
)
def q_gtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X357 — G-test (log-likelihood ratio) of independence over the
    event_type × (value>10) contingency table: G = 2·ΣO·ln(O/E), the
    information-theoretic twin of X114's chi-square (G is additive
    across table partitions, which chi-square is not — the reason
    corpus-linguistics keyness pipelines standardize on it; X315's
    log-odds scoring is its two-class shadow). One cell rollup, row /
    column margins re-derived from the k×2 cells (broadcast joins)."""
    x = load(spark, sf_dir, "events").select(
        F.col("event_type").alias("r"),
        (F.col("value") > 10).cast("int").alias("c"),
    )
    cell = x.groupBy("r", "c").agg(F.count("*").alias("o"))
    rt = cell.groupBy("r").agg(F.sum("o").alias("rn"))
    ct = cell.groupBy("c").agg(F.sum("o").alias("cn"))
    n = cell.agg(F.sum("o").alias("nn"))
    dims = cell.agg(
        F.countDistinct("r").alias("nr"), F.countDistinct("c").alias("nc")
    )
    j = (
        cell.join(F.broadcast(rt), "r")
        .join(F.broadcast(ct), "c")
        .crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(dims))
    )
    e = F.col("rn") * F.col("cn") * 1.0 / F.col("nn")
    return (
        j.groupBy("nr", "nc")
        .agg(F.sum(2 * F.col("o") * F.log(F.col("o") / e)).alias("g"))
        .select(
            F.col("nr").cast("long").alias("n_rows"),
            F.col("nc").cast("long").alias("n_cols"),
            ((F.col("nr") - 1) * (F.col("nc") - 1))
            .cast("long")
            .alias("df"),
            F.round("g", 6).alias("g_stat"),
        )
    )


# ---------------------------------------------------------------------------
# X358 — McNemar's paired test
# ---------------------------------------------------------------------------


@query(
    "q_mcnemar",
    oracle="""
    WITH u AS (
      SELECT user_id, date_trunc('day', ts) AS d,
             max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a1,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS a2
      FROM events GROUP BY user_id, date_trunc('day', ts)
    ), cells AS (
      SELECT count(*) AS n,
             sum(CASE WHEN a1 = 1 AND a2 = 0 THEN 1 ELSE 0 END) AS b,
             sum(CASE WHEN a1 = 0 AND a2 = 1 THEN 1 ELSE 0 END) AS c
      FROM u
    )
    SELECT CAST(n AS BIGINT) AS n_units, CAST(b AS BIGINT) AS b,
           CAST(c AS BIGINT) AS c,
           round((abs(b - c) - 1) * (abs(b - c) - 1) * 1.0 / (b + c), 6)
             AS chi2_stat
    FROM cells
    """,
)
def q_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X358 — McNemar's test on paired binary outcomes per user-day
    unit (clicked vs purchased that day): only the DISCORDANT cells
    b, c matter; chi2 = (|b-c|-1)²/(b+c) with Edwards' continuity
    correction. The correct test when X199's two-proportion z would
    double-count the same units on both sides (before/after feature
    launches, matched A/A audits). One per-unit rollup (map-side
    combinable max), one scalar fold."""
    u = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", F.date_trunc("day", "ts").alias("d"))
        .agg(
            F.max((F.col("event_type") == "click").cast("int")).alias(
                "a1"
            ),
            F.max((F.col("event_type") == "purchase").cast("int")).alias(
                "a2"
            ),
        )
    )
    cells = u.agg(
        F.count("*").alias("n"),
        F.sum(((F.col("a1") == 1) & (F.col("a2") == 0)).cast("int")).alias(
            "b"
        ),
        F.sum(((F.col("a1") == 0) & (F.col("a2") == 1)).cast("int")).alias(
            "c"
        ),
    )
    d = F.abs(F.col("b") - F.col("c")) - 1
    return cells.select(
        F.col("n").cast("long").alias("n_units"),
        F.col("b").cast("long").alias("b"),
        F.col("c").cast("long").alias("c"),
        F.round(d * d * 1.0 / (F.col("b") + F.col("c")), 6).alias(
            "chi2_stat"
        ),
    )


# ---------------------------------------------------------------------------
# X359 — odds ratio with Wald confidence interval
# ---------------------------------------------------------------------------


@query(
    "q_odds_ratio",
    oracle="""
    WITH u AS (
      SELECT user_id, date_trunc('day', ts) AS d,
             max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS ex,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS outc
      FROM events GROUP BY user_id, date_trunc('day', ts)
    ), cells AS (
      SELECT sum(CASE WHEN ex = 1 AND outc = 1 THEN 1 ELSE 0 END) AS a,
             sum(CASE WHEN ex = 1 AND outc = 0 THEN 1 ELSE 0 END) AS b,
             sum(CASE WHEN ex = 0 AND outc = 1 THEN 1 ELSE 0 END) AS c,
             sum(CASE WHEN ex = 0 AND outc = 0 THEN 1 ELSE 0 END) AS d
      FROM u
    )
    SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
           CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
           round(a * d * 1.0 / (b * c), 6) AS odds_ratio,
           round(exp(ln(a * d * 1.0 / (b * c))
                 - 1.96 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 6)
             AS ci_lo,
           round(exp(ln(a * d * 1.0 / (b * c))
                 + 1.96 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 6)
             AS ci_hi
    FROM cells
    """,
)
def q_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X359 — odds ratio of purchase given prior view exposure, with the
    Wald 95% CI on the log-odds scale (se = sqrt(Σ 1/cell)) — the
    epidemiology-standard effect size that X199's z-test and X242's
    kappa both stop short of; CI-crossing-1 is the decision rule.
    User-day units (the per-user grain is degenerate here: every user
    eventually views and purchases). One per-unit rollup, one 4-cell
    scalar fold, arithmetic identical in both engines."""
    u = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", F.date_trunc("day", "ts").alias("d"))
        .agg(
            F.max((F.col("event_type") == "view").cast("int")).alias("ex"),
            F.max((F.col("event_type") == "purchase").cast("int")).alias(
                "outc"
            ),
        )
    )
    cells = u.agg(
        F.sum(((F.col("ex") == 1) & (F.col("outc") == 1)).cast("int")).alias("a"),
        F.sum(((F.col("ex") == 1) & (F.col("outc") == 0)).cast("int")).alias("b"),
        F.sum(((F.col("ex") == 0) & (F.col("outc") == 1)).cast("int")).alias("c"),
        F.sum(((F.col("ex") == 0) & (F.col("outc") == 0)).cast("int")).alias("d"),
    )
    orr = F.col("a") * F.col("d") * 1.0 / (F.col("b") * F.col("c"))
    se = F.sqrt(
        1.0 / F.col("a")
        + 1.0 / F.col("b")
        + 1.0 / F.col("c")
        + 1.0 / F.col("d")
    )
    return cells.select(
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        F.col("c").cast("long").alias("c"),
        F.col("d").cast("long").alias("d"),
        F.round(orr, 6).alias("odds_ratio"),
        F.round(F.exp(F.log(orr) - 1.96 * se), 6).alias("ci_lo"),
        F.round(F.exp(F.log(orr) + 1.96 * se), 6).alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# X360 — Grubbs' maximum studentized deviate
# ---------------------------------------------------------------------------


@query(
    "q_grubbs",
    oracle="""
    WITH x AS (
      SELECT l_returnflag AS g, CAST(l_extendedprice AS DOUBLE) AS v
      FROM lineitem
    ), s AS (
      SELECT g, count(*) AS n, avg(v) AS m, sum(v * v) AS ss
      FROM x GROUP BY g
    ), v2 AS (
      SELECT g, n, m, sqrt((ss - n * m * m) / (n - 1)) AS sd FROM s
    ), dev AS (
      SELECT x.g, x.v, abs(x.v - v2.m) AS d, v2.n, v2.m, v2.sd
      FROM x JOIN v2 USING (g)
    ), mx AS (
      SELECT g, max(d) AS maxd FROM dev GROUP BY g
    )
    SELECT dev.g AS group_key, CAST(any_value(dev.n) AS BIGINT) AS n,
           round(any_value(dev.m), 4) AS mean_v,
           round(any_value(dev.sd), 4) AS sd_v,
           round(any_value(dev.d) / any_value(dev.sd), 6) AS g_stat,
           max(dev.v) AS suspect_value
    FROM dev JOIN mx ON dev.g = mx.g AND dev.d = mx.maxd
    GROUP BY dev.g
    """,
)
def q_grubbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X360 — Grubbs' test statistic per group: G = max|v - mean|/sd,
    the single-outlier screen that complements X247's ensemble (IQR /
    MAD / z) by naming the exact suspect observation. Deterministic
    suspect under ties: the largest value among max-deviate rows.
    Sufficient statistics broadcast back over one re-scan; only the
    max-deviate rows (≤ a handful per group) reach the final fold."""
    x = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        F.col("l_extendedprice").cast("double").alias("v"),
    )
    s = x.groupBy("g").agg(
        F.count("*").alias("n"),
        F.avg("v").alias("m"),
        F.sum(F.col("v") * F.col("v")).alias("ss"),
    )
    v2 = s.select(
        "g",
        "n",
        "m",
        F.sqrt(
            (F.col("ss") - F.col("n") * F.col("m") * F.col("m"))
            / (F.col("n") - 1)
        ).alias("sd"),
    )
    dev = x.join(F.broadcast(v2), "g").select(
        "g", "v", F.abs(F.col("v") - F.col("m")).alias("d"), "n", "m", "sd"
    )
    mx = dev.groupBy("g").agg(F.max("d").alias("maxd"))
    top = dev.join(
        F.broadcast(mx),
        (dev.g == mx.g) & (dev.d == mx.maxd),
    ).drop(mx.g)
    return top.groupBy("g").agg(
        F.any_value("n").cast("long").alias("n"),
        F.round(F.any_value("m"), 4).alias("mean_v"),
        F.round(F.any_value("sd"), 4).alias("sd_v"),
        F.round(F.any_value("d") / F.any_value("sd"), 6).alias("g_stat"),
        F.max("v").alias("suspect_value"),
    ).withColumnRenamed("g", "group_key")
