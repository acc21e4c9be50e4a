"""Round-11 batch F (X760): KPSS stationarity test.

Reference scope note: §2.13 mandate extensions, reference-free — the
trend-stationarity complement to the existing unit-root/temporal
battery (Ljung-Box, Mann-Kendall, Page-Hinkley, CUSUM): KPSS's null
is STATIONARITY, so it catches the drifting-metric case the others
frame in reverse.

Determinism: daily sums quantize to 1e-4 units (killing float
sum-order ulps), every cumulative/autocovariance core is exact int128
algebra, and only the final statistic is a double division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load
from .registry import query

_KPSS_L = 2  # Bartlett lag window


_KPSS_ORACLE = f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(round(sum(value) * 10000) AS BIGINT) AS yq
      FROM events GROUP BY 1, 2),
    o AS (
      SELECT event_type, yq,
             row_number() OVER (PARTITION BY event_type ORDER BY d) AS t,
             count(*) OVER (PARTITION BY event_type) AS tt,
             CAST(sum(yq) OVER (PARTITION BY event_type) AS HUGEINT)
               AS tot,
             CAST(sum(yq) OVER (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS HUGEINT) AS cum
      FROM daily),
    b AS (
      SELECT event_type, t, tt,
             CAST(tt AS HUGEINT) * yq - tot AS bt,
             CAST(tt AS HUGEINT) * cum
               - CAST(t AS HUGEINT) * tot AS at
      FROM o),
    lagged AS (
      SELECT event_type, t, tt, bt, at,
             lag(bt, 1) OVER (PARTITION BY event_type ORDER BY t) AS bt1,
             lag(bt, 2) OVER (PARTITION BY event_type ORDER BY t) AS bt2
      FROM b),
    agg AS (
      SELECT event_type, CAST(any_value(tt) AS BIGINT) AS t_n,
             sum(CAST(at AS DOUBLE) * CAST(at AS DOUBLE)) AS sa2,
             sum(CAST(bt AS DOUBLE) * CAST(bt AS DOUBLE)) AS g0,
             sum(CASE WHEN bt1 IS NOT NULL
                 THEN CAST(bt AS DOUBLE) * CAST(bt1 AS DOUBLE)
                 ELSE 0 END) AS g1,
             sum(CASE WHEN bt2 IS NOT NULL
                 THEN CAST(bt AS DOUBLE) * CAST(bt2 AS DOUBLE)
                 ELSE 0 END) AS g2
      FROM lagged GROUP BY event_type)
    SELECT event_type, t_n,
           round((sa2 / (CAST(t_n AS DOUBLE) * t_n * t_n * t_n))
                 / ((g0 + 2 * (2.0 / 3.0) * g1 + 2 * (1.0 / 3.0) * g2)
                    / (CAST(t_n AS DOUBLE) * t_n * t_n)), 6) AS kpss_stat,
           CAST((sa2 / (CAST(t_n AS DOUBLE) * t_n * t_n * t_n))
                / ((g0 + 2 * (2.0 / 3.0) * g1 + 2 * (1.0 / 3.0) * g2)
                   / (CAST(t_n AS DOUBLE) * t_n * t_n)) > 0.463
                AS BIGINT) AS reject_5pct
    FROM agg ORDER BY event_type
    """


@query("q_kpss", oracle=_KPSS_ORACLE)
def q_kpss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X760 — KPSS level-stationarity test (Kwiatkowski et al. 1992)
    per event_type over the daily-value series: η = (T⁻²Σ S_t²) / σ̂²_lr
    with S_t the cumulative demeaned partial sums and σ̂²_lr the
    Bartlett long-run variance at lag {_KPSS_L}.  The null is
    STATIONARITY (reject ⇒ the metric drifts) — the mirror-image
    framing of the battery's other drift tests, and the standard
    pre-check before trusting an ARMA/seasonal model of a pipeline
    metric.  reject_5pct compares against the 0.463 asymptotic
    critical value.

    Exactness: daily sums quantize to 1e-4 integers; the demeaned and
    partial-sum cores multiply through by T (B_t = T·y_t − Σy,
    A_t = T·cumsum_t − t·Σy) so every term is exact int128 before the
    final double division — both engines fold identical integers in
    any order.

    Scale: one daily rollup (combinable), then day-grain windows per
    event_type — the series length is calendar-bounded however large
    the event log."""
    from pyspark.sql.window import Window as W

    dec = "decimal(38,0)"
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.to_date(F.date_trunc("day", "ts")).alias("d"),
        )
        .agg(F.round(F.sum("value") * 10000).cast("long").alias("yq"))
    )
    wp = W.partitionBy("event_type")
    wo = wp.orderBy("d")
    o = daily.select(
        "event_type",
        F.col("yq").cast(dec).alias("yq"),
        F.row_number().over(wo).cast(dec).alias("t"),
        F.count("*").over(wp).cast(dec).alias("tt"),
        F.sum("yq").over(wp).cast(dec).alias("tot"),
        F.sum("yq")
        .over(wo.rowsBetween(W.unboundedPreceding, 0))
        .cast(dec)
        .alias("cum"),
    )
    b = o.select(
        "event_type",
        "t",
        "tt",
        (F.col("tt") * F.col("yq") - F.col("tot")).alias("bt"),
        (F.col("tt") * F.col("cum") - F.col("t") * F.col("tot")).alias("at"),
    )
    wlag = W.partitionBy("event_type").orderBy("t")
    lagged = b.select(
        "event_type",
        "tt",
        "bt",
        "at",
        F.lag("bt", 1).over(wlag).alias("bt1"),
        F.lag("bt", 2).over(wlag).alias("bt2"),
    )
    agg = lagged.groupBy("event_type").agg(
        F.any_value("tt").cast("long").alias("t_n"),
        F.sum(F.col("at").cast("double") * F.col("at").cast("double")).alias(
            "sa2"
        ),
        F.sum(F.col("bt").cast("double") * F.col("bt").cast("double")).alias(
            "g0"
        ),
        F.sum(
            F.when(
                F.col("bt1").isNotNull(),
                F.col("bt").cast("double") * F.col("bt1").cast("double"),
            ).otherwise(0.0)
        ).alias("g1"),
        F.sum(
            F.when(
                F.col("bt2").isNotNull(),
                F.col("bt").cast("double") * F.col("bt2").cast("double"),
            ).otherwise(0.0)
        ).alias("g2"),
    )
    tn = F.col("t_n").cast("double")
    num = F.col("sa2") / (tn * tn * tn * tn)
    lrv = (
        F.col("g0")
        + 2 * (2.0 / 3.0) * F.col("g1")
        + 2 * (1.0 / 3.0) * F.col("g2")
    ) / (tn * tn * tn)
    return agg.select(
        "event_type",
        "t_n",
        F.round(num / lrv, 6).alias("kpss_stat"),
        (num / lrv > 0.463).cast("long").alias("reject_5pct"),
    ).orderBy("event_type")
