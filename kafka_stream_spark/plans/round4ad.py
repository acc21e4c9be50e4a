"""Round-4 batch AD: modern deterministic outliers, tail EVT, and
graph-based keywords (X475-X477).

ECOD (Li et al. 2022) is the modern outlier detector that needs no
tuning and no randomness — pure ECDF tail log-probabilities, so unlike
isolation forests it is exactly reproducible and fully oracled;
peaks-over-threshold with a method-of-moments GPD fit is the OTHER
half of extreme-value theory (X349 fits block maxima; POT uses every
exceedance, the efficient estimator when data are scarce); TextRank
(Mihalcea & Tarau) runs X74's PageRank on the word co-occurrence graph
— the graph-centrality member of the keyword shelf next to X170's
tf-idf and X426's RAKE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text
from ..sources.tables import load
from .registry import query

# ---------------------------------------------------------------------------
# X475 — ECOD outlier detection
# ---------------------------------------------------------------------------


@query(
    "q_ecod",
    oracle="""
    WITH x AS (
      SELECT l_orderkey, l_linenumber,
             CAST(l_quantity AS DOUBLE) AS f1,
             CAST(l_extendedprice AS DOUBLE) AS f2,
             CAST(l_discount AS DOUBLE) AS f3
      FROM lineitem
    ), n AS (SELECT count(*) AS n FROM x),
    ranked AS (
      SELECT l_orderkey, l_linenumber, f1, f2, f3,
             rank() OVER (ORDER BY f1) AS r1,
             rank() OVER (ORDER BY f2) AS r2,
             rank() OVER (ORDER BY f3) AS r3,
             count(*) OVER (ORDER BY f1 RANGE BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS le1,
             count(*) OVER (ORDER BY f2 RANGE BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS le2,
             count(*) OVER (ORDER BY f3 RANGE BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS le3
      FROM x
    ), scored AS (
      SELECT l_orderkey, l_linenumber,
             -(ln(least(le1 * 1.0 / nn.n, 1 - le1 * 1.0 / nn.n
                        + 1.0 / nn.n))
               + ln(least(le2 * 1.0 / nn.n, 1 - le2 * 1.0 / nn.n
                          + 1.0 / nn.n))
               + ln(least(le3 * 1.0 / nn.n, 1 - le3 * 1.0 / nn.n
                          + 1.0 / nn.n))) AS ecod
      FROM ranked CROSS JOIN n nn
    )
    SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
           CAST(l_linenumber AS BIGINT) AS l_linenumber,
           round(ecod, 6) AS ecod_score
    FROM (SELECT *, row_number() OVER
            (ORDER BY round(ecod, 6) DESC, l_orderkey, l_linenumber)
              AS rn
          FROM scored)
    WHERE rn <= 15
    """,
)
def q_ecod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X475 — ECOD outlier scores (Li et al. 2022) over three lineitem
    features: per dimension, the empirical CDF's tail log-probability
    −ln(min(F(x), 1−F(x)+1/n)) summed across dimensions — the
    parameter-free, RANDOMNESS-free modern outlier detector (isolation
    forests need seeds; ECOD needs only ranks), which is why it can
    sit under the full value-hash gate. Ties share ECDF mass exactly:
    F(x) comes from cumulative counts over the DISTINCT value domain
    (a tiny window) re-joined to the fact table on the value key — no
    global window ever touches the fact table. Top-15."""
    x = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("double").alias("f1"),
        F.col("l_extendedprice").cast("double").alias("f2"),
        F.col("l_discount").cast("double").alias("f3"),
    )
    n = x.agg(F.count("*").alias("n"))
    # ECDF via cumulative counts over DISTINCT values, not a global
    # window over the fact table: the window runs on the value domain
    # (|quantity| = 50, |discount| = 11), and the fact table re-joins
    # on the value key — the 8x probe showed the global-window form
    # scan-bound at exp 0.79; this is the distributable spelling.
    ranked = x
    for i in (1, 2, 3):
        vc = x.groupBy(F.col(f"f{i}").alias("val")).agg(
            F.count("*").alias("c")
        )
        cum = vc.select(
            "val",
            F.sum("c")
            .over(
                Window.orderBy("val").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            )
            .alias(f"le{i}"),
        )
        ranked = ranked.join(
            F.broadcast(cum.withColumnRenamed("val", f"f{i}")),
            f"f{i}",
        )
    j = ranked.crossJoin(F.broadcast(n))

    def tail(i: int):
        p = F.col(f"le{i}") * 1.0 / F.col("n")
        return F.log(F.least(p, 1 - p + 1.0 / F.col("n")))

    scored = j.select(
        "l_orderkey",
        "l_linenumber",
        (-(tail(1) + tail(2) + tail(3))).alias("ecod"),
    )
    wr = Window.orderBy(
        F.round("ecod", 6).desc(), "l_orderkey", "l_linenumber"
    )
    return (
        scored.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 15)
        .select(
            F.col("l_orderkey").cast("long").alias("l_orderkey"),
            F.col("l_linenumber").cast("long").alias("l_linenumber"),
            F.round("ecod", 6).alias("ecod_score"),
        )
    )


# ---------------------------------------------------------------------------
# X476 — peaks-over-threshold GPD fit
# ---------------------------------------------------------------------------


@query(
    "q_peaks_over_threshold",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', l_shipdate) AS DATE) AS d,
             sum(l_extendedprice * (1 - l_discount)) / 1e6 AS v
      FROM lineitem GROUP BY 1
    ), ranked AS (
      SELECT v, row_number() OVER (ORDER BY v, d) AS rn,
             count(*) OVER () AS n_days
      FROM daily
    ), u AS (
      SELECT v AS u, n_days FROM ranked
      WHERE rn = CAST(ceil(n_days * 0.9) AS BIGINT)
    ), exc AS (
      SELECT d.v - uu.u AS y, uu.u, uu.n_days
      FROM daily d CROSS JOIN u uu WHERE d.v > uu.u
    ), mom AS (
      SELECT any_value(u) AS u, any_value(n_days) AS n_days,
             count(*) AS k, avg(y) AS m,
             (sum(y * y) - count(*) * avg(y) * avg(y)) / (count(*) - 1)
               AS s2
      FROM exc
    ), fit AS (
      SELECT u, n_days, k, m, s2,
             0.5 * (1 - m * m / s2) AS xi,
             0.5 * m * (m * m / s2 + 1) AS sigma
      FROM mom
    )
    SELECT CAST(n_days AS BIGINT) AS n_days,
           CAST(k AS BIGINT) AS n_exceedances,
           round(u, 4) AS threshold,
           round(m, 4) AS mean_excess,
           round(xi, 6) AS gpd_shape_xi,
           round(sigma, 6) AS gpd_scale_sigma,
           round(u + sigma / xi
                 * (pow(10.0 * 365 * k * 1.0 / n_days, xi) - 1), 4)
             AS return_level_10y
    FROM fit
    """,
)
def q_peaks_over_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X476 — peaks-over-threshold extreme-value fit on daily revenue
    ($M): exceedances over the p90 threshold (the discrete rank-0.9 order
    statistic, engine-identical), GPD shape/scale by
    method of moments (ξ = ½(1 − m²/s²), σ = ½m(m²/s² + 1) — Hosking
    & Wallis), and the 10-year return level u + σ/ξ·((10·365·k/n)^ξ−1)
    — the second pillar of EVT next to X349's Gumbel block maxima
    (POT uses EVERY tail observation, so it dominates when extremes
    are scarce; ξ>0 here corroborates X437's heavy-tail Hill read).
    One exact quantile + one moment fold over the exceedance rows."""
    daily = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.to_date(F.date_trunc("day", "l_shipdate")).alias("d"))
        .agg(
            (
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                )
                / 1e6
            ).alias("v")
        )
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = daily.select(
        "v",
        F.row_number().over(Window.orderBy("v", "d")).alias("rn"),
        F.count("*").over(wall).alias("n_days"),
    )
    u = ranked.filter(
        F.col("rn") == F.ceil(F.col("n_days") * 0.9).cast("long")
    ).select(F.col("v").alias("u"), "n_days")
    exc = (
        daily.crossJoin(F.broadcast(u))
        .filter(F.col("v") > F.col("u"))
        .select((F.col("v") - F.col("u")).alias("y"), "u", "n_days")
    )
    mom = exc.agg(
        F.any_value("u").alias("u"),
        F.any_value("n_days").alias("n_days"),
        F.count("*").alias("k"),
        F.avg("y").alias("m"),
        (
            (
                F.sum(F.col("y") * F.col("y"))
                - F.count("*") * F.avg("y") * F.avg("y")
            )
            / (F.count("*") - 1)
        ).alias("s2"),
    )
    ratio = F.col("m") * F.col("m") / F.col("s2")
    xi = 0.5 * (1 - ratio)
    sigma = 0.5 * F.col("m") * (ratio + 1)
    rl = F.col("u") + sigma / xi * (
        F.pow(
            10.0 * 365 * F.col("k") * 1.0 / F.col("n_days"), xi
        )
        - 1
    )
    return mom.select(
        F.col("n_days").cast("long").alias("n_days"),
        F.col("k").cast("long").alias("n_exceedances"),
        F.round("u", 4).alias("threshold"),
        F.round("m", 4).alias("mean_excess"),
        F.round(xi, 6).alias("gpd_shape_xi"),
        F.round(sigma, 6).alias("gpd_scale_sigma"),
        F.round(rl, 4).alias("return_level_10y"),
    )


# ---------------------------------------------------------------------------
# X477 — TextRank keywords
# ---------------------------------------------------------------------------


@query(
    "q_textrank",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, w, i FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w,
               unnest(range(len(string_split(text, ' ')))) AS i
        FROM documents)
      WHERE w <> '' AND length(w) >= 4
    ), edges0 AS (
      SELECT DISTINCT a.w AS u, b.w AS v
      FROM tok a JOIN tok b
        ON a.doc_id = b.doc_id AND b.i - a.i BETWEEN 1 AND 3
       AND a.w <> b.w
    ), sym AS (
      SELECT u, v FROM edges0 UNION SELECT v, u FROM edges0
    ), deg AS (SELECT u, count(*) AS d FROM sym GROUP BY u),
    nodes AS (SELECT u, count(*) OVER () AS nn FROM deg),
    r0 AS (SELECT u, 1.0 / any_value(nn) AS r FROM nodes GROUP BY u),
    r1 AS (
      SELECT s.v AS u,
             0.15 / any_value(n2.nn)
             + 0.85 * sum(r0.r / dg.d) AS r
      FROM sym s JOIN r0 ON s.u = r0.u JOIN deg dg ON s.u = dg.u
      CROSS JOIN (SELECT any_value(nn) AS nn FROM nodes) n2
      GROUP BY s.v
    ), r2 AS (
      SELECT s.v AS u,
             0.15 / any_value(n2.nn)
             + 0.85 * sum(r1.r / dg.d) AS r
      FROM sym s JOIN r1 ON s.u = r1.u JOIN deg dg ON s.u = dg.u
      CROSS JOIN (SELECT any_value(nn) AS nn FROM nodes) n2
      GROUP BY s.v
    ), r3 AS (
      SELECT s.v AS u,
             0.15 / any_value(n2.nn)
             + 0.85 * sum(r2.r / dg.d) AS r
      FROM sym s JOIN r2 ON s.u = r2.u JOIN deg dg ON s.u = dg.u
      CROSS JOIN (SELECT any_value(nn) AS nn FROM nodes) n2
      GROUP BY s.v
    )
    SELECT t.u AS keyword, round(t.r, 8) AS textrank,
           CAST(dg.d AS BIGINT) AS degree
    FROM (SELECT r3.u, r3.r, row_number() OVER
            (ORDER BY round(r3.r, 8) DESC, r3.u) AS rn FROM r3) t
    JOIN deg dg ON t.u = dg.u
    WHERE t.rn <= 15
    """,
)
def q_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X477 — TextRank keywords (Mihalcea & Tarau): PageRank (d=0.85,
    three unrolled iterations from uniform) on the word co-occurrence
    graph (words of length ≥4 within a 3-token window, symmetrized,
    degree-normalized), top-15 — the graph-centrality keyword family
    member: X170's tf-idf scores rarity, X426's RAKE scores phrase
    cohesion, TextRank scores CONNECTIVITY (a word central to many
    contexts ranks even at modest frequency). Each iteration is one
    edge⋈rank join — the X74 superstep on a vocabulary-sized graph."""
    tok = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("i", "w")
        )
        .filter((F.col("w") != "") & (F.length("w") >= 4))
    )
    a = tok.select("doc_id", F.col("w").alias("u"), F.col("i").alias("ia"))
    b = tok.select("doc_id", F.col("w").alias("v"), F.col("i").alias("ib"))
    edges0 = (
        a.join(b, "doc_id")
        .filter(
            (F.col("ib") - F.col("ia")).between(1, 3)
            & (F.col("u") != F.col("v"))
        )
        .select("u", "v")
        .distinct()
    )
    sym = (
        edges0.unionByName(
            edges0.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = sym.groupBy("u").agg(F.count("*").alias("d"))
    nn = deg.agg(F.count("*").alias("nn"))
    r = deg.crossJoin(F.broadcast(nn)).select(
        "u", (1.0 / F.col("nn")).alias("r")
    )
    for _ in range(3):
        contrib = (
            sym.join(r, "u")
            .join(deg, "u")
            .groupBy(F.col("v").alias("u2"))
            .agg(F.sum(F.col("r") / F.col("d")).alias("c"))
        )
        r = contrib.crossJoin(F.broadcast(nn)).select(
            F.col("u2").alias("u"),
            (0.15 / F.col("nn") + 0.85 * F.col("c")).alias("r"),
        )
    wr = Window.orderBy(F.round("r", 8).desc(), "u")
    return (
        r.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 15)
        .join(deg, "u")
        .select(
            F.col("u").alias("keyword"),
            F.round("r", 8).alias("textrank"),
            F.col("d").cast("long").alias("degree"),
        )
    )
