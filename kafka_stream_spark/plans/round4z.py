"""Round-4 batch Z: normality diagnostics, econometrics, and curve
geometry (X451-X458).

The probit helper X450 introduced immediately pays for itself: Q-Q
points and the PPCC normality coefficient are one query now. The rest
are public classics each closing a family: ZCA whitening (the
preprocessing X248's PCA implies), Kneedle knee detection (the
principled version of X379's hand-picked hub cap), synthetic control
(Abadie's counterfactual, on the X322 OLS machinery), Bass diffusion
(innovation/imitation adoption fitting), Laspeyres/Paasche/Fisher
price indices, treatment wear-off slopes, and Taylor's fluctuation-
scaling law.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load
from .registry import query
from .round4y import probit, probit_sql

# ---------------------------------------------------------------------------
# X451 — Q-Q plot points + PPCC normality
# ---------------------------------------------------------------------------


@query(
    "q_qq_plot",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', l_shipdate) AS DATE) AS d,
             sum(l_extendedprice * (1 - l_discount)) AS rev
      FROM lineitem GROUP BY 1
    ), ret AS (
      SELECT d, ln(rev / lag(rev) OVER (ORDER BY d)) AS r FROM daily
    ), ranked AS (
      SELECT r, row_number() OVER (ORDER BY r, d) AS i,
             count(*) OVER () AS n
      FROM ret WHERE r IS NOT NULL
    ), pts AS (
      SELECT i, n, r,
             {probit_sql('(i - 0.5) / n')} AS z
      FROM ranked
    ), fit AS (
      SELECT count(*) AS n, sum(r * z) AS srz, sum(r) AS sr,
             sum(z) AS sz, sum(r * r) AS srr, sum(z * z) AS szz
      FROM pts
    ), ppcc AS (
      SELECT (n * srz - sr * sz)
               / sqrt((n * srr - sr * sr) * (n * szz - sz * sz)) AS rho
      FROM fit
    )
    SELECT CAST(p.i AS BIGINT) AS decile_rank,
           round(p.z, 6) AS theoretical_z,
           round(p.r, 6) AS observed_return,
           round(c.rho, 6) AS ppcc,
           round(c.rho * c.rho, 6) AS w_prime
    FROM pts p CROSS JOIN ppcc c
    WHERE p.i % greatest(p.n // 10, 1) = 0
    """,
)
def q_qq_plot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X451 — Q-Q plot of daily log-returns against normal quantiles
    (Hazen positions (i−½)/n through the shared Acklam Φ⁻¹) plus the
    probability-plot correlation coefficient: PPCC ρ and ρ² ≈ the
    Shapiro-Francia W′ statistic — the graphical+scalar normality
    readout that says WHERE X250's Jarque-Bera number comes from
    (heavy tails bend the ends). Every ~n/10-th point emitted so the
    output stays bounded; the fit uses all points."""
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
    ret = daily.select(
        "d", F.log(F.col("rev") / F.lag("rev").over(wd)).alias("r")
    ).filter(F.col("r").isNotNull())
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = ret.select(
        "r",
        F.row_number().over(Window.orderBy("r", "d")).alias("i"),
        F.count("*").over(wall).alias("n"),
    )
    pts = ranked.select(
        "i",
        "n",
        "r",
        probit((F.col("i") - 0.5) / F.col("n")).alias("z"),
    ).localCheckpoint(eager=True)
    fit = pts.agg(
        F.count("*").alias("n"),
        F.sum(F.col("r") * F.col("z")).alias("srz"),
        F.sum("r").alias("sr"),
        F.sum("z").alias("sz"),
        F.sum(F.col("r") * F.col("r")).alias("srr"),
        F.sum(F.col("z") * F.col("z")).alias("szz"),
    )
    rho = (F.col("n") * F.col("srz") - F.col("sr") * F.col("sz")) / F.sqrt(
        (F.col("n") * F.col("srr") - F.col("sr") * F.col("sr"))
        * (F.col("n") * F.col("szz") - F.col("sz") * F.col("sz"))
    )
    ppcc = fit.select(rho.alias("rho"))
    return (
        pts.crossJoin(F.broadcast(ppcc))
        .filter(
            F.col("i")
            % F.greatest((F.col("n") / 10).cast("long"), F.lit(1))
            == 0
        )
        .select(
            F.col("i").cast("long").alias("decile_rank"),
            F.round("z", 6).alias("theoretical_z"),
            F.round("r", 6).alias("observed_return"),
            F.round("rho", 6).alias("ppcc"),
            F.round(F.col("rho") * F.col("rho"), 6).alias("w_prime"),
        )
    )


# ---------------------------------------------------------------------------
# X452 — ZCA whitening (2 features, closed form)
# ---------------------------------------------------------------------------


@query(
    "q_zca_whitening",
    oracle="""
    WITH x AS (
      SELECT CAST(l_quantity AS DOUBLE) AS a,
             CAST(l_extendedprice AS DOUBLE) / 10000 AS b
      FROM lineitem
    ), m AS (
      SELECT count(*) AS n, avg(a) AS ma, avg(b) AS mb,
             sum(a * a) / count(*) - avg(a) * avg(a) AS vaa,
             sum(a * b) / count(*) - avg(a) * avg(b) AS vab,
             sum(b * b) / count(*) - avg(b) * avg(b) AS vbb
      FROM x
    ), eig AS (
      SELECT n, ma, mb, vaa, vab, vbb,
             (vaa + vbb) / 2
               + sqrt(pow((vaa - vbb) / 2, 2) + vab * vab) AS l1,
             (vaa + vbb) / 2
               - sqrt(pow((vaa - vbb) / 2, 2) + vab * vab) AS l2
      FROM m
    ), w AS (
      -- ZCA: W = C^(-1/2) = Q diag(1/sqrt(l)) Q^T, spelled via the
      -- 2x2 identity C^(-1/2) = (C + sqrt(l1*l2) I) / (sqrt(l1*l2)
      -- ... normalized); use the closed form with s = sqrt(l1)+sqrt(l2),
      -- p = sqrt(l1*l2):  C^(-1/2) = (C + p*I) / (s*p)
      SELECT n, ma, mb, vaa, vab, vbb, l1, l2,
             (vbb + sqrt(l1 * l2))
               / ((sqrt(l1) + sqrt(l2)) * sqrt(l1 * l2)) AS w11,
             -vab / ((sqrt(l1) + sqrt(l2)) * sqrt(l1 * l2)) AS w12,
             (vaa + sqrt(l1 * l2))
               / ((sqrt(l1) + sqrt(l2)) * sqrt(l1 * l2)) AS w22
      FROM eig
    ), check_ AS (
      SELECT w.*,
             w11 * (vaa * w11 + vab * w12)
               + w12 * (vab * w11 + vbb * w12) AS c11,
             w11 * (vaa * w12 + vab * w22)
               + w12 * (vab * w12 + vbb * w22) AS c12,
             w12 * (vaa * w12 + vab * w22)
               + w22 * (vab * w12 + vbb * w22) AS c22
      FROM w
    )
    SELECT CAST(n AS BIGINT) AS n,
           round(l1, 6) AS eig_1, round(l2, 6) AS eig_2,
           round(w11, 6) AS w11, round(w12, 6) AS w12,
           round(w22, 6) AS w22,
           round(c11, 6) AS whitened_var_1,
           round(c12, 6) AS whitened_cov,
           round(c22, 6) AS whitened_var_2
    FROM check_
    """,
)
def q_zca_whitening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X452 — ZCA whitening transform for (quantity, price/10⁴) in
    closed 2×2 form: eigenvalues from the trace/determinant identity,
    W = C^(−1/2) = (C + √(λ₁λ₂)·I) / ((√λ₁+√λ₂)·√(λ₁λ₂)) — the
    symmetric inverse square root, i.e. the whitening that stays
    CLOSEST to the original axes (Mahalanobis/ZCA), with the whitened
    covariance recomputed as the built-in identity check (should be
    I). The preprocessing X341's Mahalanobis distance implies and
    X248's PCA rotates away from. One moment pass, scalar algebra."""
    x = load(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("double").alias("a"),
        (F.col("l_extendedprice").cast("double") / 10000).alias("b"),
    )
    m = x.agg(
        F.count("*").alias("n"),
        F.avg("a").alias("ma"),
        F.avg("b").alias("mb"),
        (
            F.sum(F.col("a") * F.col("a")) / F.count("*")
            - F.avg("a") * F.avg("a")
        ).alias("vaa"),
        (
            F.sum(F.col("a") * F.col("b")) / F.count("*")
            - F.avg("a") * F.avg("b")
        ).alias("vab"),
        (
            F.sum(F.col("b") * F.col("b")) / F.count("*")
            - F.avg("b") * F.avg("b")
        ).alias("vbb"),
    )
    half_tr = (F.col("vaa") + F.col("vbb")) / 2
    disc = F.sqrt(
        F.pow((F.col("vaa") - F.col("vbb")) / 2, 2)
        + F.col("vab") * F.col("vab")
    )
    eig = m.select(
        "*", (half_tr + disc).alias("l1"), (half_tr - disc).alias("l2")
    )
    s = F.sqrt("l1") + F.sqrt("l2")
    pr = F.sqrt(F.col("l1") * F.col("l2"))
    w = eig.select(
        "*",
        ((F.col("vbb") + pr) / (s * pr)).alias("w11"),
        (-F.col("vab") / (s * pr)).alias("w12"),
        ((F.col("vaa") + pr) / (s * pr)).alias("w22"),
    )
    c11 = F.col("w11") * (
        F.col("vaa") * F.col("w11") + F.col("vab") * F.col("w12")
    ) + F.col("w12") * (
        F.col("vab") * F.col("w11") + F.col("vbb") * F.col("w12")
    )
    c12 = F.col("w11") * (
        F.col("vaa") * F.col("w12") + F.col("vab") * F.col("w22")
    ) + F.col("w12") * (
        F.col("vab") * F.col("w12") + F.col("vbb") * F.col("w22")
    )
    c22 = F.col("w12") * (
        F.col("vaa") * F.col("w12") + F.col("vab") * F.col("w22")
    ) + F.col("w22") * (
        F.col("vab") * F.col("w12") + F.col("vbb") * F.col("w22")
    )
    return w.select(
        F.col("n").cast("long").alias("n"),
        F.round("l1", 6).alias("eig_1"),
        F.round("l2", 6).alias("eig_2"),
        F.round("w11", 6).alias("w11"),
        F.round("w12", 6).alias("w12"),
        F.round("w22", 6).alias("w22"),
        F.round(c11, 6).alias("whitened_var_1"),
        F.round(c12, 6).alias("whitened_cov"),
        F.round(c22, 6).alias("whitened_var_2"),
    )


# ---------------------------------------------------------------------------
# X453 — Kneedle knee detection
# ---------------------------------------------------------------------------


@query(
    "q_knee_detection",
    oracle="""
    WITH deg AS (
      SELECT x.a, count(*) AS d FROM (
        SELECT l.l_suppkey * 2 AS a, o.o_custkey * 2 + 1 AS b
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2) x
      GROUP BY x.a
    ), curve AS (
      SELECT d, row_number() OVER (ORDER BY d, a) AS i,
             count(*) OVER () AS n,
             min(d) OVER () AS dmin, max(d) OVER () AS dmax
      FROM deg
    ), norm AS (
      SELECT i, d,
             (i - 1.0) / (n - 1) AS xn,
             (d - dmin) * 1.0 / (dmax - dmin) AS yn
      FROM curve
    ), diff AS (
      SELECT i, d, xn, yn, yn - xn AS kneedle
      FROM norm
    ), best AS (
      SELECT i, d, kneedle,
             row_number() OVER (ORDER BY kneedle DESC, i) AS rn
      FROM diff
    )
    SELECT CAST(b.i AS BIGINT) AS knee_rank,
           CAST(b.d AS BIGINT) AS knee_degree,
           round(b.kneedle, 6) AS kneedle_score,
           CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((SELECT max(d) FROM deg) AS BIGINT) AS max_degree
    FROM best b WHERE b.rn = 1
    """,
)
def q_knee_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X453 — Kneedle knee detection (Satopää et al.) on the sorted
    supplier-degree curve: min-max normalize both axes, the knee is
    the argmax of (y − x) — the point of maximum curvature where the
    curve leaves the diagonal. THIS is the principled version of
    X379's hand-picked hub cap (the knee degree is where 'normal
    nodes end and hubs begin'), and the same recipe picks DBSCAN's
    eps from a k-distance curve or a scree cutoff from X248's
    eigenvalues. Windows run over the node-degree table only."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    deg = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            (F.col("l_suppkey") * 2).alias("a"),
            (F.col("o_custkey") * 2 + 1).alias("b"),
        )
        .distinct()
        .groupBy("a")
        .agg(F.count("*").alias("d"))
        .localCheckpoint(eager=True)
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    curve = deg.select(
        "d",
        F.row_number().over(Window.orderBy("d", "a")).alias("i"),
        F.count("*").over(wall).alias("n"),
        F.min("d").over(wall).alias("dmin"),
        F.max("d").over(wall).alias("dmax"),
    )
    norm = curve.select(
        "i",
        "d",
        ((F.col("i") - 1.0) / (F.col("n") - 1)).alias("xn"),
        (
            (F.col("d") - F.col("dmin"))
            * 1.0
            / (F.col("dmax") - F.col("dmin"))
        ).alias("yn"),
    )
    diff = norm.select(
        "i", "d", (F.col("yn") - F.col("xn")).alias("kneedle")
    )
    stats = deg.agg(
        F.count("*").alias("n_nodes"), F.max("d").alias("max_degree")
    )
    best = diff.withColumn(
        "rn",
        F.row_number().over(Window.orderBy(F.col("kneedle").desc(), "i")),
    ).filter(F.col("rn") == 1)
    return best.crossJoin(F.broadcast(stats)).select(
        F.col("i").cast("long").alias("knee_rank"),
        F.col("d").cast("long").alias("knee_degree"),
        F.round("kneedle", 6).alias("kneedle_score"),
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.col("max_degree").cast("long").alias("max_degree"),
    )


# ---------------------------------------------------------------------------
# X454 — synthetic control
# ---------------------------------------------------------------------------


@query(
    "q_synthetic_control",
    oracle="""
    WITH wk AS (
      SELECT doc_id % 4 AS unit,
             CAST(n_chars AS DOUBLE) AS y, doc_id // 50 AS t
      FROM documents
    ), series AS (
      SELECT unit, t, avg(y) AS y FROM wk GROUP BY unit, t
    ), wide AS (
      SELECT t,
             max(CASE WHEN unit = 0 THEN y END) AS y0,
             max(CASE WHEN unit = 1 THEN y END) AS x1,
             max(CASE WHEN unit = 2 THEN y END) AS x2,
             max(CASE WHEN unit = 3 THEN y END) AS x3
      FROM series GROUP BY t
    ), pre AS (SELECT * FROM wide WHERE t < 6),
    mm AS (
      SELECT avg(y0) AS my, avg(x1) AS m1, avg(x2) AS m2 FROM pre
    ), sums AS (
      SELECT any_value(mm.my) AS my, any_value(mm.m1) AS m1,
             any_value(mm.m2) AS m2,
             sum((x1 - mm.m1) * (x1 - mm.m1)) AS s11,
             sum((x1 - mm.m1) * (x2 - mm.m2)) AS s12,
             sum((x2 - mm.m2) * (x2 - mm.m2)) AS s22,
             sum((x1 - mm.m1) * (y0 - mm.my)) AS s1y,
             sum((x2 - mm.m2) * (y0 - mm.my)) AS s2y
      FROM pre CROSS JOIN mm
    ), beta AS (
      SELECT my, m1, m2,
             (s1y * s22 - s2y * s12)
               / (s11 * s22 - s12 * s12) AS b1,
             (s2y * s11 - s1y * s12)
               / (s11 * s22 - s12 * s12) AS b2
      FROM sums
    )
    SELECT CAST(w.t AS BIGINT) AS period,
           w.t >= 6 AS is_post,
           round(w.y0, 4) AS actual,
           round(b.my + b.b1 * (w.x1 - b.m1)
                      + b.b2 * (w.x2 - b.m2), 4) AS synthetic,
           round(w.y0 - (b.my + b.b1 * (w.x1 - b.m1)
                              + b.b2 * (w.x2 - b.m2)), 4) AS gap
    FROM wide w CROSS JOIN beta b
    """,
)
def q_synthetic_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X454 — synthetic control (Abadie's method, regression-weights
    form): fit donor weights for unit 0 from donors 1-2 on the
    PRE-period only (centered 2×2 normal equations — the X322
    machinery), then project the synthetic counterfactual through the
    post period; the post-period gap is the treatment-effect series a
    single-unit intervention leaves (what X336's DiD averages into one
    number, here per period with the fit diagnosed in the pre-period
    gaps). Collapses to a 4×T panel before any fitting."""
    wk = load(spark, sf_dir, "documents").select(
        (F.col("doc_id") % 4).alias("unit"),
        F.col("n_chars").cast("double").alias("y"),
        (F.col("doc_id") / 50).cast("long").alias("t"),
    )
    series = wk.groupBy("unit", "t").agg(F.avg("y").alias("y"))
    wide = series.groupBy("t").agg(
        F.max(F.when(F.col("unit") == 0, F.col("y"))).alias("y0"),
        F.max(F.when(F.col("unit") == 1, F.col("y"))).alias("x1"),
        F.max(F.when(F.col("unit") == 2, F.col("y"))).alias("x2"),
        F.max(F.when(F.col("unit") == 3, F.col("y"))).alias("x3"),
    ).localCheckpoint(eager=True)
    pre = wide.filter(F.col("t") < 6)
    mm = pre.agg(
        F.avg("y0").alias("my"),
        F.avg("x1").alias("m1"),
        F.avg("x2").alias("m2"),
    )
    cen = pre.crossJoin(F.broadcast(mm))
    d1 = F.col("x1") - F.col("m1")
    d2 = F.col("x2") - F.col("m2")
    dy = F.col("y0") - F.col("my")
    sums = cen.agg(
        F.any_value("my").alias("my"),
        F.any_value("m1").alias("m1"),
        F.any_value("m2").alias("m2"),
        F.sum(d1 * d1).alias("s11"),
        F.sum(d1 * d2).alias("s12"),
        F.sum(d2 * d2).alias("s22"),
        F.sum(d1 * dy).alias("s1y"),
        F.sum(d2 * dy).alias("s2y"),
    )
    det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
    beta = sums.select(
        "my",
        "m1",
        "m2",
        (
            (F.col("s1y") * F.col("s22") - F.col("s2y") * F.col("s12"))
            / det
        ).alias("b1"),
        (
            (F.col("s2y") * F.col("s11") - F.col("s1y") * F.col("s12"))
            / det
        ).alias("b2"),
    )
    synth = F.col("my") + F.col("b1") * (F.col("x1") - F.col("m1")) + F.col(
        "b2"
    ) * (F.col("x2") - F.col("m2"))
    return wide.crossJoin(F.broadcast(beta)).select(
        F.col("t").cast("long").alias("period"),
        (F.col("t") >= 6).alias("is_post"),
        F.round("y0", 4).alias("actual"),
        F.round(synth, 4).alias("synthetic"),
        F.round(F.col("y0") - synth, 4).alias("gap"),
    )


# ---------------------------------------------------------------------------
# X455 — Bass diffusion fit
# ---------------------------------------------------------------------------


@query(
    "q_bass_diffusion",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             min(CAST(date_trunc('month', o_orderdate) AS DATE)) AS wk
      FROM orders GROUP BY o_custkey
    ), adopt AS (
      SELECT wk, count(*) AS n_t FROM firsts GROUP BY wk
    ), cum AS (
      SELECT wk, n_t,
             coalesce(sum(n_t) OVER (ORDER BY wk
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS big_n
      FROM adopt
    ), m AS (
      SELECT count(*) AS k, avg(n_t) AS my, avg(big_n) AS m1,
             avg(big_n * big_n) AS m2
      FROM cum
    ), s AS (
      SELECT m.k, m.my, m.m1, m.m2,
             sum((big_n - m.m1) * (big_n - m.m1)) AS s11,
             sum((big_n - m.m1) * (big_n * big_n - m.m2)) AS s12,
             sum((big_n * big_n - m.m2) * (big_n * big_n - m.m2)) AS s22,
             sum((big_n - m.m1) * (n_t - m.my)) AS s1y,
             sum((big_n * big_n - m.m2) * (n_t - m.my)) AS s2y
      FROM cum CROSS JOIN m GROUP BY m.k, m.my, m.m1, m.m2
    ), coefs AS (
      SELECT k, my, m1, m2,
             (s1y * s22 - s2y * s12) / (s11 * s22 - s12 * s12) AS b,
             (s2y * s11 - s1y * s12) / (s11 * s22 - s12 * s12) AS c
      FROM s
    ), abc AS (
      SELECT k, b, c, my - b * m1 - c * m2 AS a FROM coefs
    )
    SELECT CAST(k AS BIGINT) AS n_weeks,
           round(a, 6) AS coef_a, round(b, 6) AS coef_b,
           round(c, 8) AS coef_c,
           round((-b - sqrt(greatest(b * b - 4 * a * c, 0))) / (2 * c),
                 2) AS market_size_m,
           round(a / ((-b - sqrt(greatest(b * b - 4 * a * c, 0)))
                      / (2 * c)), 6) AS innovation_p,
           round(b + a / ((-b - sqrt(greatest(b * b - 4 * a * c, 0)))
                          / (2 * c)), 6) AS imitation_q
    FROM abc
    """,
)
def q_bass_diffusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X455 — Bass diffusion fit on monthly first-order customer
    adoption:
    the discrete Bass identity n_t = a + b·N_{t-1} + c·N²_{t-1}
    estimated by the X322 two-feature OLS, then unpacked into market
    size m = (−b−√(b²−4ac))/2c, innovation p = a/m, imitation
    q = b + p — Bass's original estimation recipe, the adoption
    forecaster behind every 'when does this product saturate'
    question (X416's growth accounting measures the same curve
    descriptively). The panel is one row per week before any
    fitting."""
    firsts = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.min(
                F.to_date(F.date_trunc("month", "o_orderdate"))
            ).alias("wk")
        )
    )
    adopt = firsts.groupBy("wk").agg(F.count("*").alias("n_t"))
    wprev = Window.orderBy("wk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = adopt.select(
        "wk",
        "n_t",
        F.coalesce(F.sum("n_t").over(wprev), F.lit(0)).alias("big_n"),
    )
    m = cum.agg(
        F.count("*").alias("k"),
        F.avg("n_t").alias("my"),
        F.avg("big_n").alias("m1"),
        F.avg(F.col("big_n") * F.col("big_n")).alias("m2"),
    )
    cen = cum.crossJoin(F.broadcast(m))
    d1 = F.col("big_n") - F.col("m1")
    d2 = F.col("big_n") * F.col("big_n") - F.col("m2")
    dy = F.col("n_t") - F.col("my")
    s = cen.groupBy("k", "my", "m1", "m2").agg(
        F.sum(d1 * d1).alias("s11"),
        F.sum(d1 * d2).alias("s12"),
        F.sum(d2 * d2).alias("s22"),
        F.sum(d1 * dy).alias("s1y"),
        F.sum(d2 * dy).alias("s2y"),
    )
    det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
    b = (F.col("s1y") * F.col("s22") - F.col("s2y") * F.col("s12")) / det
    c = (F.col("s2y") * F.col("s11") - F.col("s1y") * F.col("s12")) / det
    abc = s.select(
        "k",
        b.alias("b"),
        c.alias("c"),
        (F.col("my") - b * F.col("m1") - c * F.col("m2")).alias("a"),
    )
    msize = (
        -F.col("b")
        - F.sqrt(
            F.greatest(
                F.col("b") * F.col("b") - 4 * F.col("a") * F.col("c"),
                F.lit(0.0),
            )
        )
    ) / (2 * F.col("c"))
    return abc.select(
        F.col("k").cast("long").alias("n_weeks"),
        F.round("a", 6).alias("coef_a"),
        F.round("b", 6).alias("coef_b"),
        F.round("c", 8).alias("coef_c"),
        F.round(msize, 2).alias("market_size_m"),
        F.round(F.col("a") / msize, 6).alias("innovation_p"),
        F.round(F.col("b") + F.col("a") / msize, 6).alias("imitation_q"),
    )


# ---------------------------------------------------------------------------
# X456 — Laspeyres / Paasche / Fisher price indices
# ---------------------------------------------------------------------------


@query(
    "q_price_index",
    oracle="""
    WITH px AS (
      SELECT l_partkey % 50 AS band, year(l_shipdate) AS yr,
             sum(l_extendedprice) / sum(l_quantity) AS p,
             sum(l_quantity) AS q
      FROM lineitem WHERE year(l_shipdate) IN (1995, 1996)
      GROUP BY 1, 2
    ), wide AS (
      SELECT band,
             max(CASE WHEN yr = 1995 THEN p END) AS p0,
             max(CASE WHEN yr = 1995 THEN q END) AS q0,
             max(CASE WHEN yr = 1996 THEN p END) AS p1,
             max(CASE WHEN yr = 1996 THEN q END) AS q1
      FROM px GROUP BY band
      HAVING count(*) = 2
    ), s AS (
      SELECT count(*) AS n_bands,
             sum(p1 * q0) / sum(p0 * q0) AS laspeyres,
             sum(p1 * q1) / sum(p0 * q1) AS paasche
      FROM wide
    )
    SELECT CAST(n_bands AS BIGINT) AS n_bands,
           round(laspeyres, 6) AS laspeyres,
           round(paasche, 6) AS paasche,
           round(sqrt(laspeyres * paasche), 6) AS fisher_ideal
    FROM s
    """,
)
def q_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X456 — Laspeyres, Paasche, and Fisher-ideal price indices
    between 1995 and 1996 over part bands: base-weighted vs
    current-weighted price relatives and their geometric mean — the
    national-statistics trinity (CPI is Laspeyres-flavored; Fisher is
    the 'ideal' that passes the reversal tests) that X265's elasticity
    and X345's rate/mix decomposition sit beside. One two-year rollup
    to a 50-band panel; bands present in both years only."""
    px = (
        load(spark, sf_dir, "lineitem")
        .filter(F.year("l_shipdate").isin(1995, 1996))
        .groupBy(
            (F.col("l_partkey") % 50).alias("band"),
            F.year("l_shipdate").alias("yr"),
        )
        .agg(
            (F.sum("l_extendedprice") / F.sum("l_quantity")).alias("p"),
            F.sum("l_quantity").alias("q"),
        )
    )
    wide = (
        px.groupBy("band")
        .agg(
            F.count("*").alias("cnt"),
            F.max(F.when(F.col("yr") == 1995, F.col("p"))).alias("p0"),
            F.max(F.when(F.col("yr") == 1995, F.col("q"))).alias("q0"),
            F.max(F.when(F.col("yr") == 1996, F.col("p"))).alias("p1"),
            F.max(F.when(F.col("yr") == 1996, F.col("q"))).alias("q1"),
        )
        .filter(F.col("cnt") == 2)
    )
    s = wide.agg(
        F.count("*").alias("n_bands"),
        (
            F.sum(F.col("p1") * F.col("q0"))
            / F.sum(F.col("p0") * F.col("q0"))
        ).alias("laspeyres"),
        (
            F.sum(F.col("p1") * F.col("q1"))
            / F.sum(F.col("p0") * F.col("q1"))
        ).alias("paasche"),
    )
    return s.select(
        F.col("n_bands").cast("long").alias("n_bands"),
        F.round("laspeyres", 6).alias("laspeyres"),
        F.round("paasche", 6).alias("paasche"),
        F.round(
            F.sqrt(F.col("laspeyres") * F.col("paasche")), 6
        ).alias("fisher_ideal"),
    )


# ---------------------------------------------------------------------------
# X457 — treatment wear-off slope
# ---------------------------------------------------------------------------


@query(
    "q_wearoff",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             avg(CASE WHEN user_id % 2 = 1 AND event_type = 'purchase'
                      THEN 1.0 WHEN user_id % 2 = 1 THEN 0 END) AS r1,
             avg(CASE WHEN user_id % 2 = 0 AND event_type = 'purchase'
                      THEN 1.0 WHEN user_id % 2 = 0 THEN 0 END) AS r0
      FROM events GROUP BY 1
    ), lifts AS (
      SELECT d, r1 - r0 AS lift,
             row_number() OVER (ORDER BY d) - 1 AS t
      FROM daily WHERE r1 IS NOT NULL AND r0 IS NOT NULL
    ), m AS (
      SELECT count(*) AS n, avg(t) AS mt, avg(lift) AS ml,
             sum(t * lift) AS stl, sum(t * t) AS stt
      FROM lifts
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           round(ml, 6) AS mean_lift,
           round((stl - n * mt * ml) / (stt - n * mt * mt), 8)
             AS lift_slope_per_day,
           round(ml - (stl - n * mt * ml) / (stt - n * mt * mt) * mt, 6)
             AS lift_at_day0,
           (stl - n * mt * ml) / (stt - n * mt * mt) < 0
             AS wearing_off
    FROM m
    """,
)
def q_wearoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X457 — novelty/wear-off detection: the daily treatment-control
    purchase-rate lift regressed on experiment day — a negative slope
    means the effect X199's pooled z-test reports is a decaying
    novelty artifact, not a steady-state gain (Kohavi's novelty-effect
    check; the temporal derivative X336's DiD assumes away). One daily
    rollup, one OLS fold over days."""
    e = load(spark, sf_dir, "events")
    arm1 = F.col("user_id") % 2 == 1
    pur = (F.col("event_type") == "purchase").cast("double")
    daily = e.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).agg(
        F.avg(F.when(arm1, pur)).alias("r1"),
        F.avg(F.when(~arm1, pur)).alias("r0"),
    )
    lifts = (
        daily.filter(F.col("r1").isNotNull() & F.col("r0").isNotNull())
        .select(
            "d",
            (F.col("r1") - F.col("r0")).alias("lift"),
            (F.row_number().over(Window.orderBy("d")) - 1).alias("t"),
        )
    )
    m = lifts.agg(
        F.count("*").alias("n"),
        F.avg("t").alias("mt"),
        F.avg("lift").alias("ml"),
        F.sum(F.col("t") * F.col("lift")).alias("stl"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
    )
    slope = (F.col("stl") - F.col("n") * F.col("mt") * F.col("ml")) / (
        F.col("stt") - F.col("n") * F.col("mt") * F.col("mt")
    )
    return m.select(
        F.col("n").cast("long").alias("n_days"),
        F.round("ml", 6).alias("mean_lift"),
        F.round(slope, 8).alias("lift_slope_per_day"),
        F.round(F.col("ml") - slope * F.col("mt"), 6).alias(
            "lift_at_day0"
        ),
        (slope < 0).alias("wearing_off"),
    )


# ---------------------------------------------------------------------------
# X458 — Taylor's fluctuation-scaling law
# ---------------------------------------------------------------------------


@query(
    "q_taylor_law",
    oracle="""
    WITH daily AS (
      SELECT l_partkey % 50 AS band,
             CAST(date_trunc('day', l_shipdate) AS DATE) AS d,
             sum(l_quantity) AS q
      FROM lineitem GROUP BY 1, 2
    ), s AS (
      SELECT band, count(*) AS n, avg(q) AS m,
             (sum(q * q) - count(*) * avg(q) * avg(q)) / (count(*) - 1)
               AS v
      FROM daily GROUP BY band
    ), lq AS (
      -- logs quantize to 1e-9 integers so the 50-band fit sums are
      -- EXACT (int128) and order-independent: raw double sums diverged
      -- between engines in the last ulp and flipped round(6) at sf0.1
      SELECT CAST(round(ln(m) * 1000000000) AS HUGEINT) AS lx,
             CAST(round(ln(v) * 1000000000) AS HUGEINT) AS ly
      FROM s WHERE v > 0
    ), fit AS (
      SELECT count(*) AS k,
             CAST(sum(lx) AS DOUBLE) / 1e9 AS sx,
             CAST(sum(ly) AS DOUBLE) / 1e9 AS sy,
             CAST(sum(lx * ly) AS DOUBLE) / 1e18 AS sxy,
             CAST(sum(lx * lx) AS DOUBLE) / 1e18 AS sxx
      FROM lq
    )
    SELECT CAST(k AS BIGINT) AS n_bands,
           round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6)
             AS taylor_exponent,
           round(exp((sy - (k * sxy - sx * sy)
                      / (k * sxx - sx * sx) * sx) / k), 6)
             AS taylor_coefficient
    FROM fit
    """,
)
def q_taylor_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X458 — Taylor's power law (fluctuation scaling) across part
    bands: variance ≈ a·mean^b of daily demand, b from the log-log
    fit — b=1 is Poisson-like, b→2 means fluctuations scale with the
    mean itself (multiplicative demand), which decides whether X420's
    safety stock should scale with √mean or with mean. One grouped
    moment pass to 50 (mean, var) points, then the scalar fit."""
    daily = (
        load(spark, sf_dir, "lineitem")
        .groupBy(
            (F.col("l_partkey") % 50).alias("band"),
            F.to_date(F.date_trunc("day", "l_shipdate")).alias("d"),
        )
        .agg(F.sum("l_quantity").alias("q"))
    )
    s = daily.groupBy("band").agg(
        F.count("*").alias("n"),
        F.avg("q").alias("m"),
        (
            (
                F.sum(F.col("q") * F.col("q"))
                - F.count("*") * F.avg("q") * F.avg("q")
            )
            / (F.count("*") - 1)
        ).alias("v"),
    )
    dec = "decimal(38,0)"
    lq = s.filter(F.col("v") > 0).select(
        F.round(F.log("m") * 1e9).cast(dec).alias("lx"),
        F.round(F.log("v") * 1e9).cast(dec).alias("ly"),
    )
    fit = lq.agg(
        F.count("*").alias("k"),
        (F.sum("lx").cast("double") / 1e9).alias("sx"),
        (F.sum("ly").cast("double") / 1e9).alias("sy"),
        (F.sum(F.col("lx") * F.col("ly")).cast("double") / 1e18).alias("sxy"),
        (F.sum(F.col("lx") * F.col("lx")).cast("double") / 1e18).alias("sxx"),
    )
    b = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return fit.select(
        F.col("k").cast("long").alias("n_bands"),
        F.round(b, 6).alias("taylor_exponent"),
        F.round(
            F.exp((F.col("sy") - b * F.col("sx")) / F.col("k")), 6
        ).alias("taylor_coefficient"),
    )
