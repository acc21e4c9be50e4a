"""Round-5 batch I: anomaly-monitoring closure.

X561 — seasonal-hybrid robust-z anomaly detection (the S-H-ESD
topology popularized by Twitter's anomaly detection: remove the
seasonal component, then iteratively test the most extreme residual
against a robust dispersion estimate re-fit after each removal).
X562 — the EWMA control chart (Lucas-Saccucci): the SPC member for
SMALL sustained shifts, completing X353 x̄-R (large shifts), X210
CUSUM (drift), X474 p-chart (proportions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load
from .registry import query

# ---------------------------------------------------------------------------
# X561 — seasonal-hybrid robust-z (S-H-ESD-style) anomalies
# ---------------------------------------------------------------------------

_SH_THRESH = 3.5
_SH_ROUNDS = 3


def _sh_round_sql(prev: str, idx: int) -> str:
    rem = f"rm{idx}"
    out = f"r{idx}"
    return f"""
    med{idx} AS (SELECT quantile_cont(res, 0.5) AS md FROM {prev}),
    mad{idx} AS (SELECT quantile_cont(abs(res - md), 0.5) AS mad
                 FROM {prev} CROSS JOIN med{idx}),
    {rem} AS MATERIALIZED (
      SELECT dt, res,
             abs(res - md) / (1.4826 * mad) AS score
      FROM {prev} CROSS JOIN med{idx} CROSS JOIN mad{idx}
      WHERE abs(res - md) / (1.4826 * mad) > {_SH_THRESH}
      ORDER BY abs(res - md) / (1.4826 * mad) DESC, dt LIMIT 1),
    {out} AS MATERIALIZED (
      SELECT p.dt, p.res FROM {prev} p
      WHERE p.dt NOT IN (SELECT dt FROM {rem}))"""


@query(
    "q_shesd",
    oracle=f"""
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS dt,
             round(sum(o_totalprice) / 1e6, 6) AS y,
             dayofweek(o_orderdate) AS dow
      FROM orders GROUP BY 1, 3
    ), s AS (
      SELECT dow, quantile_cont(y, 0.5) AS med FROM d GROUP BY dow
    ), r0 AS MATERIALIZED (
      SELECT d.dt, d.y - s.med AS res FROM d JOIN s ON d.dow = s.dow
    ),
    {",".join(_sh_round_sql(f'r{i}', i + 1) for i in range(_SH_ROUNDS))}
    SELECT * FROM (
      {" UNION ALL ".join(
          f"SELECT {i + 1} AS round, dt, round(score, 4) AS score"
          f" FROM rm{i + 1}" for i in range(_SH_ROUNDS))}
    ) ORDER BY round
    """,
)
def q_shesd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X561 — seasonal-hybrid robust anomaly detection on daily
    revenue: the day-of-week MEDIAN profile is subtracted (medians,
    not means — one anomalous Tuesday must not drag the Tuesday
    baseline), then up to {_SH_ROUNDS} rounds of 'flag the most
    extreme residual if its Iglewicz-Hoaglin robust z
    |r−med|/(1.4826·MAD) exceeds {_SH_THRESH}, remove it, RE-FIT
    median and MAD' — the re-fit is the ESD insight that makes
    multi-anomaly detection work (a second anomaly hides behind the
    first's inflation of plain z-scores; X360 Grubbs and X178
    z-alerts both have that masking problem).

    Medians select/average identical rounded inputs in both engines;
    removal order is pinned by (score, date).  Scale: a day-grain
    rollup, then constant rounds over the residual table — the
    per-round medians are the only global steps, each a single
    value-domain aggregate."""
    o = load(spark, sf_dir, "orders")
    d = o.groupBy(
        F.col("o_orderdate").cast("date").alias("dt"),
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
    ).agg(F.round(F.sum("o_totalprice") / 1e6, 6).alias("y"))
    s = d.groupBy("dow").agg(F.median("y").alias("med"))
    r = (
        d.join(F.broadcast(s), "dow")
        .select("dt", (F.col("y") - F.col("med")).alias("res"))
        .localCheckpoint(eager=True)
    )
    out = []
    for i in range(1, _SH_ROUNDS + 1):
        med = r.agg(F.median("res").alias("md"))
        wm = r.crossJoin(F.broadcast(med))
        mad = wm.agg(
            F.median(F.abs(F.col("res") - F.col("md"))).alias("mad")
        )
        scored = wm.crossJoin(F.broadcast(mad)).withColumn(
            "score",
            F.abs(F.col("res") - F.col("md")) / (1.4826 * F.col("mad")),
        )
        rm = (
            scored.filter(F.col("score") > _SH_THRESH)
            .orderBy(F.desc("score"), "dt")
            .limit(1)
            .select("dt", "score")
            .localCheckpoint(eager=True)
        )
        out.append(
            rm.select(
                F.lit(i).alias("round"),
                "dt",
                F.round("score", 4).alias("score"),
            )
        )
        r = r.join(rm.select("dt"), "dt", "left_anti").localCheckpoint(
            eager=True
        )
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res.orderBy("round")


# ---------------------------------------------------------------------------
# X562 — EWMA control chart
# ---------------------------------------------------------------------------

_EC_LAMBDA = 0.3
_EC_L = 3.0
_EC_DEPTH = 12
_EC_TOP = 10


@query(
    "q_ewma_chart",
    oracle=f"""
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS dt,
             round(sum(o_totalprice) / 1e6, 6) AS y
      FROM orders GROUP BY 1
    ), st AS (
      SELECT count(*) AS n, round(sum(y), 4) AS sy,
             round(sum(y * y), 4) AS syy
      FROM d
    ), base AS (
      SELECT sy / n AS mu,
             sqrt(greatest((syy - sy * sy / n) / (n - 1), 1e-12)) AS sd
      FROM st
    ), lagged AS (
      SELECT dt, y,
             row_number() OVER (ORDER BY dt) AS i,
             {', '.join(
                 f"lag(y, {k}) OVER (ORDER BY dt) AS l{k}"
                 for k in range(1, _EC_DEPTH))}
      FROM d
    ), z AS (
      SELECT dt, i, b.mu, b.sd,
             {_EC_LAMBDA} * (y
               {' '.join(
                   f"+ coalesce(l{k}, b.mu) * {(1.0 - _EC_LAMBDA) ** k!r}"
                   for k in range(1, _EC_DEPTH))})
             + {(1.0 - _EC_LAMBDA) ** _EC_DEPTH!r} * b.mu AS ewma
      FROM lagged CROSS JOIN base b
    ), lim AS (
      SELECT dt, ewma, mu,
             {_EC_L} * sd * sqrt({_EC_LAMBDA} / (2 - {_EC_LAMBDA})
               * (1 - pow(1.0 - {_EC_LAMBDA}, 2 * least(i, {_EC_DEPTH}))))
               AS hw
      FROM z
    )
    SELECT dt, round(ewma, 6) AS ewma,
           round(mu - hw, 6) AS lcl, round(mu + hw, 6) AS ucl,
           round(abs(ewma - mu) / hw, 6) AS excursion,
           abs(ewma - mu) / hw > 1 AS out_of_control
    FROM lim
    ORDER BY excursion DESC, dt LIMIT {_EC_TOP}
    """,
)
def q_ewma_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X562 — EWMA control chart (λ={_EC_LAMBDA}, L={_EC_L}) on daily
    revenue: the chart statistic zᵢ = λxᵢ + (1−λ)zᵢ₋₁ unrolled to
    depth {_EC_DEPTH} with the tail mass (1−λ)^{_EC_DEPTH} anchored
    at the target μ (truncation weight 0.7^12 ≈ 1.4% — documented),
    against the exact time-varying limits
    ±L·σ·√(λ/(2−λ)·(1−(1−λ)^{{2i}})).  EWMA charts catch SMALL
    sustained shifts the X353 Shewhart chart misses and localize them
    faster than X210's CUSUM resets — the missing member of the SPC
    family.  Output: the {_EC_TOP} largest excursions relative to
    their limit, flagged.

    μ and σ derive from rounded global sums; the unrolled recursion
    uses literal (1−λ)ᵏ weights — identical doubles in both engines.
    Scale: a day-grain rollup and one window with {_EC_DEPTH} lags —
    the truncation is exactly what makes the statistic
    window-expressible instead of sequentially stateful."""
    o = load(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").cast("date").alias("dt")).agg(
        F.round(F.sum("o_totalprice") / 1e6, 6).alias("y")
    )
    st = d.agg(
        F.count("*").alias("n"),
        F.round(F.sum("y"), 4).alias("sy"),
        F.round(F.sum(F.col("y") * F.col("y")), 4).alias("syy"),
    )
    base = st.select(
        (F.col("sy") / F.col("n")).alias("mu"),
        F.sqrt(
            F.greatest(
                (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n"))
                / (F.col("n") - 1),
                F.lit(1e-12),
            )
        ).alias("sd"),
    )
    wo = Window.orderBy("dt")
    lagged = d.select(
        "dt",
        "y",
        F.row_number().over(wo).alias("i"),
        *[
            F.lag("y", k).over(wo).alias(f"l{k}")
            for k in range(1, _EC_DEPTH)
        ],
    )
    zb = lagged.crossJoin(F.broadcast(base))
    ewma = F.col("y")
    for k in range(1, _EC_DEPTH):
        ewma = ewma + F.coalesce(F.col(f"l{k}"), F.col("mu")) * (
            (1.0 - _EC_LAMBDA) ** k
        )
    ewma = _EC_LAMBDA * ewma + ((1.0 - _EC_LAMBDA) ** _EC_DEPTH) * F.col(
        "mu"
    )
    hw = (
        _EC_L
        * F.col("sd")
        * F.sqrt(
            _EC_LAMBDA
            / (2 - _EC_LAMBDA)
            * (
                1
                - F.pow(
                    F.lit(1.0 - _EC_LAMBDA),
                    2 * F.least(F.col("i"), F.lit(_EC_DEPTH)),
                )
            )
        )
    )
    lim = zb.select(
        "dt",
        ewma.alias("ewma"),
        F.col("mu"),
        hw.alias("hw"),
    )
    exc = F.abs(F.col("ewma") - F.col("mu")) / F.col("hw")
    return (
        lim.select(
            "dt",
            F.round("ewma", 6).alias("ewma"),
            F.round(F.col("mu") - F.col("hw"), 6).alias("lcl"),
            F.round(F.col("mu") + F.col("hw"), 6).alias("ucl"),
            F.round(exc, 6).alias("excursion"),
            (exc > 1).alias("out_of_control"),
        )
        .orderBy(F.desc("excursion"), "dt")
        .limit(_EC_TOP)
    )
