"""Round-4 breadth, part I: partial autocorrelation (Durbin-Levinson),
CUPED variance reduction, Cochran-Armitage trend test, and bounded
spatial nearest-neighbor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load
from .registry import query

# ---------------------------------------------------------------------------
# X325 — PACF via Durbin-Levinson (lags 1..3)
# ---------------------------------------------------------------------------


def _acf_sql(k: int) -> str:
    """Pearson r of (v_t, v_{t-k}) pairs per event_type, explicit
    sufficient statistics, rounded to 8."""
    return f"""
    a{k} AS (
      SELECT event_type,
             lag(v, {k}) OVER (PARTITION BY event_type ORDER BY d) AS x,
             v AS y
      FROM daily
    ), r{k} AS (
      SELECT event_type,
             round((count(*) * sum(x * y) - sum(x) * sum(y))
               / sqrt((count(*) * sum(x * x) - sum(x) * sum(x))
                      * (count(*) * sum(y * y) - sum(y) * sum(y))), 8)
               AS r
      FROM a{k} WHERE x IS NOT NULL GROUP BY event_type
    )"""


@query(
    "q_pacf",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(count(*) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    ), {_acf_sql(1)}, {_acf_sql(2)}, {_acf_sql(3)},
    dl AS (
      SELECT r1.event_type, r1.r AS c1, r2.r AS c2, r3.r AS c3,
             (r2.r - r1.r * r1.r) / (1 - r1.r * r1.r) AS p2
      FROM r1 JOIN r2 ON r2.event_type = r1.event_type
              JOIN r3 ON r3.event_type = r1.event_type
    )
    SELECT event_type, c1 AS acf1, c2 AS acf2, c3 AS acf3,
           round(c1, 6) AS pacf1,
           round(p2, 6) AS pacf2,
           round((c3 - (c1 * (1 - p2)) * c2 - p2 * c1)
                 / (1 - (c1 * (1 - p2)) * c1 - p2 * c2), 6) AS pacf3
    FROM dl
    """,
)
def q_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X325 — partial autocorrelation (lags 1-3) of the daily
    event-count series per type via the Durbin-Levinson recursion —
    the AR-order diagnostic read next to X126's ACF and X257's
    Ljung-Box (ACF says 'correlated'; PACF says 'how many AR terms').
    Each lag's r is Pearson over aligned (v_t, v_{t-k}) pairs with
    EXPLICIT sufficient-statistic arithmetic, rounded to 8 BEFORE the
    recursion so the near-1 denominators can't amplify engine
    summation-order ULPs. One rollup + three lag windows per series +
    scalar algebra."""
    daily = load(spark, sf_dir, "events").groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).agg(F.count("*").cast("double").alias("v"))
    w = Window.partitionBy("event_type").orderBy("d")

    def acf(k: int) -> DataFrame:
        pairs = daily.select(
            "event_type",
            F.lag("v", k).over(w).alias("x"),
            F.col("v").alias("y"),
        ).filter(F.col("x").isNotNull())
        r = (
            F.count("*") * F.sum(F.col("x") * F.col("y"))
            - F.sum("x") * F.sum("y")
        ) / F.sqrt(
            (F.count("*") * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x"))
            * (F.count("*") * F.sum(F.col("y") * F.col("y")) - F.sum("y") * F.sum("y"))
        )
        return pairs.groupBy("event_type").agg(
            F.round(r, 8).alias(f"c{k}")
        )

    j = acf(1).join(acf(2), "event_type").join(acf(3), "event_type")
    p2 = (F.col("c2") - F.col("c1") * F.col("c1")) / (
        1 - F.col("c1") * F.col("c1")
    )
    j = j.withColumn("p2", p2)
    phi21 = F.col("c1") * (1 - F.col("p2"))
    pacf3 = (
        F.col("c3") - phi21 * F.col("c2") - F.col("p2") * F.col("c1")
    ) / (1 - phi21 * F.col("c1") - F.col("p2") * F.col("c2"))
    return j.select(
        "event_type",
        F.col("c1").alias("acf1"),
        F.col("c2").alias("acf2"),
        F.col("c3").alias("acf3"),
        F.round("c1", 6).alias("pacf1"),
        F.round("p2", 6).alias("pacf2"),
        F.round(pacf3, 6).alias("pacf3"),
    )


# ---------------------------------------------------------------------------
# X326 — CUPED variance reduction
# ---------------------------------------------------------------------------


@query(
    "q_cuped",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             sum(CASE WHEN year(o_orderdate) IN (1996, 1997)
                 THEN o_totalprice ELSE 0 END) AS pre,
             sum(CASE WHEN year(o_orderdate) IN (1998, 1999)
                 THEN o_totalprice ELSE 0 END) AS post
      FROM orders GROUP BY o_custkey
    ), s AS (
      SELECT count(*) AS n, avg(pre) AS mpre, avg(post) AS mpost,
             sum(pre * post) AS spp, sum(pre * pre) AS sp2,
             sum(post * post) AS so2
      FROM per_cust
    ), theta AS (
      SELECT n, mpre, mpost,
             (spp / n - mpre * mpost) / (sp2 / n - mpre * mpre) AS th,
             so2 / n - mpost * mpost AS var_post,
             sp2 / n - mpre * mpre AS var_pre,
             spp / n - mpre * mpost AS cov_pp
      FROM s
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           round(th, 6) AS theta,
           round(var_post, 2) AS var_post,
           round(var_post - cov_pp * cov_pp / var_pre, 2) AS var_adjusted,
           round(1.0 - (var_post - cov_pp * cov_pp / var_pre) / var_post, 6)
             AS var_reduction
    FROM theta
    """,
)
def q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X326 — CUPED (Deng et al. 2013, controlled-experiment variance
    reduction using pre-period data): theta = cov(pre, post)/var(pre)
    over per-customer revenue, adjusted-metric variance =
    var(post) − cov²/var(pre), and the achieved variance-reduction
    fraction (= ρ², the reason every A/B platform ships CUPED — the
    same experiment needs (1−ρ²)× the traffic). Sits on X199's
    z-test: run CUPED first, test the adjusted metric. One per-entity
    rollup + one sufficient-statistics fold."""
    pre_years = F.year("o_orderdate").isin(1996, 1997)
    post_years = F.year("o_orderdate").isin(1998, 1999)
    per_cust = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.when(pre_years, F.col("o_totalprice")).otherwise(0.0)).alias("pre"),
            F.sum(F.when(post_years, F.col("o_totalprice")).otherwise(0.0)).alias("post"),
        )
    )
    s = per_cust.agg(
        F.count("*").alias("n"),
        F.avg("pre").alias("mpre"),
        F.avg("post").alias("mpost"),
        F.sum(F.col("pre") * F.col("post")).alias("spp"),
        F.sum(F.col("pre") * F.col("pre")).alias("sp2"),
        F.sum(F.col("post") * F.col("post")).alias("so2"),
    )
    var_post = F.col("so2") / F.col("n") - F.col("mpost") * F.col("mpost")
    var_pre = F.col("sp2") / F.col("n") - F.col("mpre") * F.col("mpre")
    cov_pp = F.col("spp") / F.col("n") - F.col("mpre") * F.col("mpost")
    var_adj = var_post - cov_pp * cov_pp / var_pre
    return s.select(
        F.col("n").cast("long").alias("n_customers"),
        F.round(cov_pp / var_pre, 6).alias("theta"),
        F.round(var_post, 2).alias("var_post"),
        F.round(var_adj, 2).alias("var_adjusted"),
        F.round(1.0 - var_adj / var_post, 6).alias("var_reduction"),
    )


# ---------------------------------------------------------------------------
# X327 — Cochran-Armitage trend test
# ---------------------------------------------------------------------------


@query(
    "q_trend_test",
    oracle="""
    WITH g AS (
      SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS s,
             count(*) AS n,
             sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS r
      FROM orders GROUP BY 1
    ), tot AS (
      SELECT sum(n) AS nn, sum(r) AS rr,
             sum(s * r) AS sr, sum(s * n) AS sn,
             sum(CAST(s AS DOUBLE) * s * n) AS s2n
      FROM g
    )
    SELECT CAST(nn AS BIGINT) AS n_total, CAST(rr AS BIGINT) AS n_success,
           round(sr - CAST(sn AS DOUBLE) * rr / nn, 4) AS t_stat,
           round((sr - CAST(sn AS DOUBLE) * rr / nn)
                 / sqrt((CAST(rr AS DOUBLE) / nn) * (1 - CAST(rr AS DOUBLE) / nn)
                        * (s2n - CAST(sn AS DOUBLE) * sn / nn)), 6) AS z
    FROM tot
    """,
)
def q_trend_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X327 — Cochran-Armitage test for trend: is the 'F' (finished)
    rate monotonically related to the ORDERED priority levels (scores
    1..5 from the priority prefix)? The dose-response sibling of X114's
    chi-square — chi-square asks 'any association', trend asks
    'ordered association', with far more power when the ordering is
    real. T = Σ s_i (r_i − n_i R/N), Var = p̄(1−p̄)(Σ s²n − (Σ sn)²/N);
    all sufficient statistics from one rollup."""
    o = load(spark, sf_dir, "orders")
    g = o.groupBy(
        F.substring("o_orderpriority", 1, 1).cast("int").alias("s")
    ).agg(
        F.count("*").alias("n"),
        F.sum((F.col("o_orderstatus") == "F").cast("long")).alias("r"),
    )
    tot = g.agg(
        F.sum("n").alias("nn"),
        F.sum("r").alias("rr"),
        F.sum(F.col("s") * F.col("r")).alias("sr"),
        F.sum(F.col("s") * F.col("n")).alias("sn"),
        F.sum(F.col("s").cast("double") * F.col("s") * F.col("n")).alias(
            "s2n"
        ),
    )
    t = F.col("sr") - F.col("sn").cast("double") * F.col("rr") / F.col("nn")
    p = F.col("rr").cast("double") / F.col("nn")
    var = p * (1 - p) * (
        F.col("s2n") - F.col("sn").cast("double") * F.col("sn") / F.col("nn")
    )
    return tot.select(
        F.col("nn").cast("long").alias("n_total"),
        F.col("rr").cast("long").alias("n_success"),
        F.round(t, 4).alias("t_stat"),
        F.round(t / F.sqrt(var), 6).alias("z"),
    )


# ---------------------------------------------------------------------------
# X328 — bounded spatial nearest neighbor
# ---------------------------------------------------------------------------


@query(
    "q_geo_nearest",
    oracle="""
    WITH pts AS (
      SELECT c_custkey AS k,
             (('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 6))::BIGINT
               % 9000) / 100.0 - 45 AS lat,
             (('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 7, 6))::BIGINT
               % 36000) / 100.0 - 180 AS lon
      FROM customer
    ),
    pairs AS (
      SELECT a.k AS k1, b.k AS k2,
             round(2 * 6371.0 * asin(sqrt(
               pow(sin(radians(b.lat - a.lat) / 2), 2)
               + cos(radians(a.lat)) * cos(radians(b.lat))
                 * pow(sin(radians(b.lon - a.lon) / 2), 2))), 3) AS dist_km
      FROM pts a JOIN pts b ON a.k < b.k
    ), within AS (
      SELECT k1, k2, dist_km FROM pairs WHERE dist_km <= 100.0
    ), sym AS (
      SELECT k1 AS k, k2 AS nn, dist_km FROM within
      UNION ALL SELECT k2, k1, dist_km FROM within
    ), ranked AS (
      SELECT k, nn, dist_km,
             row_number() OVER (PARTITION BY k
               ORDER BY dist_km, nn) AS rn
      FROM sym
    )
    SELECT k, nn, dist_km FROM ranked WHERE rn = 1
    """,
)
def q_geo_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X328 — bounded nearest neighbor: each point's closest other
    point WITHIN 100 km ((dist, key) tie-break; points with no
    neighbor in range are absent — the honest contract, since a cell
    grid can only certify nearest-within-radius, and unbounded NN
    escalates to wider rings). Reuses the X208 cell-blocked radius
    join for candidates (the oracle brute-forces the same pair set),
    symmetrizes, and takes one ranking window per point. The standard
    store-to-nearest-store / sensor-pairing shape."""
    from .geo import _radius_pairs

    pairs = _radius_pairs(spark, sf_dir)
    sym = pairs.select(
        F.col("k1").alias("k"), F.col("k2").alias("nn"), "dist_km"
    ).union(
        pairs.select(
            F.col("k2").alias("k"), F.col("k1").alias("nn"), "dist_km"
        )
    )
    w = Window.partitionBy("k").orderBy("dist_km", "nn")
    return (
        sym.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("k", "nn", "dist_km")
    )
