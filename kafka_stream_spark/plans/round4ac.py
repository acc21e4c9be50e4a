"""Round-4 batch AC: signal decomposition, motif discovery, and rank
fusion (X470-X474).

The Haar transform and the matrix profile are the two modern
time-series primitives the battery still lacked: Haar localizes WHERE
variance lives in time (X460's periodogram only says at what period),
and the matrix profile (Yeh et al.) finds motifs and discords — the
'most repeated' and 'most anomalous' subsequences — with one
definition. Rank fusion (Borda / Copeland / reciprocal-rank fusion)
is how hybrid search combines X111's BM25 with X3's vector ranking;
Burrows' Delta is stylometry's distance between sources; the p-chart
completes X353's SPC pair for attribute (proportion) data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load
from .registry import query

# ---------------------------------------------------------------------------
# X470 — Haar wavelet energy decomposition
# ---------------------------------------------------------------------------


@query(
    "q_haar_wavelet",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', l_shipdate) AS DATE) AS d,
             sum(l_extendedprice * (1 - l_discount)) / 1e6 AS v
      FROM lineitem GROUP BY 1
    ), idx AS (
      SELECT v, row_number() OVER (ORDER BY d) - 1 AS i FROM daily
    ),
    l1 AS (
      SELECT i // 2 AS i,
             avg(v) AS a,
             (max(CASE WHEN i % 2 = 0 THEN v END)
              - max(CASE WHEN i % 2 = 1 THEN v END)) / 2 AS det
      FROM idx GROUP BY i // 2 HAVING count(*) = 2
    ),
    l2 AS (
      SELECT i // 2 AS i, avg(a) AS a,
             (max(CASE WHEN i % 2 = 0 THEN a END)
              - max(CASE WHEN i % 2 = 1 THEN a END)) / 2 AS det
      FROM l1 GROUP BY i // 2 HAVING count(*) = 2
    ),
    l3 AS (
      SELECT i // 2 AS i, avg(a) AS a,
             (max(CASE WHEN i % 2 = 0 THEN a END)
              - max(CASE WHEN i % 2 = 1 THEN a END)) / 2 AS det
      FROM l2 GROUP BY i // 2 HAVING count(*) = 2
    ),
    e AS (
      SELECT 1 AS level, 2 AS scale_days, count(*) AS n_coeffs,
             sum(det * det) AS energy FROM l1
      UNION ALL
      SELECT 2, 4, count(*), sum(det * det) FROM l2
      UNION ALL
      SELECT 3, 8, count(*), sum(det * det) FROM l3
    ), tot AS (SELECT sum(energy) AS te FROM e)
    SELECT CAST(level AS BIGINT) AS level,
           CAST(scale_days AS BIGINT) AS scale_days,
           CAST(n_coeffs AS BIGINT) AS n_coeffs,
           round(energy, 6) AS detail_energy,
           round(energy / t.te, 6) AS energy_share
    FROM e CROSS JOIN tot t
    """,
)
def q_haar_wavelet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X470 — three-level Haar wavelet decomposition of daily revenue
    ($M): each level pairs adjacent samples into an average
    (approximation) and half-difference (detail); the detail-energy
    share per level says WHICH time scale (2/4/8 days) carries the
    variance — the time-localized complement to X460's periodogram
    (a one-day spike loads Haar level 1 but smears across every
    Fourier period). Each level is one pairing groupBy over the
    collapsed (and halving) series; incomplete trailing pairs drop as
    in the standard dyadic transform."""
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
    cur = daily.select(
        (F.row_number().over(Window.orderBy("d")) - 1).alias("i"),
        F.col("v").alias("a"),
    )
    levels = []
    for lvl in range(1, 4):
        paired = (
            cur.groupBy((F.col("i") / 2).cast("long").alias("i2"))
            .agg(
                F.count("*").alias("cnt"),
                F.avg("a").alias("a"),
                (
                    (
                        F.max(
                            F.when(F.col("i") % 2 == 0, F.col("a"))
                        )
                        - F.max(
                            F.when(F.col("i") % 2 == 1, F.col("a"))
                        )
                    )
                    / 2
                ).alias("det"),
            )
            .filter(F.col("cnt") == 2)
            .select(F.col("i2").alias("i"), "a", "det")
            .localCheckpoint(eager=True)
        )
        levels.append(
            paired.agg(
                F.lit(lvl).cast("long").alias("level"),
                F.lit(2**lvl).cast("long").alias("scale_days"),
                F.count("*").cast("long").alias("n_coeffs"),
                F.sum(F.col("det") * F.col("det")).alias("energy"),
            )
        )
        cur = paired.select("i", "a")
    e = levels[0].unionByName(levels[1]).unionByName(levels[2])
    tot = e.agg(F.sum("energy").alias("te"))
    return e.crossJoin(F.broadcast(tot)).select(
        "level",
        "scale_days",
        "n_coeffs",
        F.round("energy", 6).alias("detail_energy"),
        F.round(F.col("energy") / F.col("te"), 6).alias("energy_share"),
    )


# ---------------------------------------------------------------------------
# X471 — matrix profile (motifs + discords)
# ---------------------------------------------------------------------------

_MP_M = 4


@query(
    "q_matrix_profile",
    oracle=f"""
    WITH wk AS (
      SELECT CAST(date_trunc('week', l_shipdate) AS DATE) AS w,
             sum(l_extendedprice * (1 - l_discount)) / 1e6 AS v
      FROM lineitem GROUP BY 1
    ), idx AS (
      SELECT v, row_number() OVER (ORDER BY w) - 1 AS i FROM wk
    ), subs AS (
      SELECT s.i, avg(x.v) AS m,
             sqrt(greatest(avg(x.v * x.v) - avg(x.v) * avg(x.v), 1e-12))
               AS sd,
             count(*) AS n
      FROM (SELECT DISTINCT i FROM idx) s
      JOIN idx x ON x.i BETWEEN s.i AND s.i + {_MP_M - 1}
      GROUP BY s.i HAVING count(*) = {_MP_M}
    ), dots AS (
      SELECT a.i AS i, b.i AS j, sum(xa.v * xb.v) AS dot
      FROM subs a JOIN subs b ON abs(a.i - b.i) >= {_MP_M}
      JOIN idx xa ON xa.i BETWEEN a.i AND a.i + {_MP_M - 1}
      JOIN idx xb ON xb.i = b.i + (xa.i - a.i)
      GROUP BY a.i, b.i
    ), dist AS (
      SELECT d.i, d.j,
             round(sqrt(greatest(2 * {_MP_M} * (1 -
               (d.dot - {_MP_M} * sa.m * sb.m)
               / ({_MP_M} * sa.sd * sb.sd)), 0)), 6) AS nd
      FROM dots d JOIN subs sa ON d.i = sa.i JOIN subs sb ON d.j = sb.i
    ), profile AS (
      SELECT i, nd AS mp, j AS nn FROM (
        SELECT i, j, nd, row_number() OVER
          (PARTITION BY i ORDER BY nd, j) AS rn
        FROM dist) WHERE rn = 1
    ), ranked AS (
      SELECT i, mp, nn,
             row_number() OVER (ORDER BY mp DESC, i) AS discord_rank,
             row_number() OVER (ORDER BY mp, i) AS motif_rank
      FROM profile
    )
    SELECT CAST(i AS BIGINT) AS window_start,
           round(mp, 6) AS profile_dist,
           CAST(nn AS BIGINT) AS nearest_neighbor,
           CASE WHEN discord_rank <= 3 THEN 'discord'
                ELSE 'motif' END AS kind,
           CAST(CASE WHEN discord_rank <= 3 THEN discord_rank
                     ELSE motif_rank END AS BIGINT) AS rank_in_kind
    FROM ranked WHERE discord_rank <= 3 OR motif_rank <= 3
    """,
)
def q_matrix_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X471 — matrix profile (Yeh et al.) of the weekly revenue series
    at window m=4: for every length-4 subsequence, the z-normalized
    distance to its nearest non-overlapping neighbor (exclusion zone
    |i−j| ≥ m) — the minima are MOTIFS (most repeated shapes), the
    maxima are DISCORDS (most anomalous weeks), one definition for
    both questions X97's patterns and X178's z-alerts ask separately.
    Top-3 of each emitted. The O(n²) dot table is built on the
    ~360-week collapsed series; distances round before the min so
    both engines pick identical neighbors."""
    wk = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.to_date(F.date_trunc("week", "l_shipdate")).alias("w"))
        .agg(
            (
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                )
                / 1e6
            ).alias("v")
        )
    )
    idx = wk.select(
        (F.row_number().over(Window.orderBy("w")) - 1).alias("i"), "v"
    ).localCheckpoint(eager=True)
    m = _MP_M
    starts = idx.select("i")
    xa = idx.select(F.col("i").alias("xi"), F.col("v").alias("xv"))
    subs = (
        starts.join(
            xa,
            F.col("xi").between(F.col("i"), F.col("i") + m - 1),
        )
        .groupBy("i")
        .agg(
            F.count("*").alias("n"),
            F.avg("xv").alias("m"),
            F.sqrt(
                F.greatest(
                    F.avg(F.col("xv") * F.col("xv"))
                    - F.avg("xv") * F.avg("xv"),
                    F.lit(1e-12),
                )
            ).alias("sd"),
        )
        .filter(F.col("n") == m)
        .select("i", "m", "sd")
        .localCheckpoint(eager=True)
    )
    a = subs.select(F.col("i").alias("ai"))
    b = subs.select(F.col("i").alias("bj"))
    pairs = a.crossJoin(b).filter(
        F.abs(F.col("ai") - F.col("bj")) >= m
    )
    va = idx.select(F.col("i").alias("pa"), F.col("v").alias("va"))
    vb = idx.select(F.col("i").alias("pb"), F.col("v").alias("vb"))
    dots = (
        pairs.join(
            va, F.col("pa").between(F.col("ai"), F.col("ai") + m - 1)
        )
        .join(vb, F.col("pb") == F.col("bj") + (F.col("pa") - F.col("ai")))
        .groupBy("ai", "bj")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("dot"))
    )
    sa = subs.select(
        F.col("i").alias("ai"), F.col("m").alias("ma"), F.col("sd").alias("sda")
    )
    sb = subs.select(
        F.col("i").alias("bj"), F.col("m").alias("mb"), F.col("sd").alias("sdb")
    )
    nd = F.round(
        F.sqrt(
            F.greatest(
                2
                * m
                * (
                    1
                    - (F.col("dot") - m * F.col("ma") * F.col("mb"))
                    / (m * F.col("sda") * F.col("sdb"))
                ),
                F.lit(0.0),
            )
        ),
        6,
    )
    dist = (
        dots.join(F.broadcast(sa), "ai")
        .join(F.broadcast(sb), "bj")
        .select("ai", "bj", nd.alias("nd"))
    )
    wnn = Window.partitionBy("ai").orderBy("nd", "bj")
    profile = (
        dist.withColumn("rnn", F.row_number().over(wnn))
        .filter(F.col("rnn") == 1)
        .select("ai", F.col("nd").alias("mp"), F.col("bj").alias("nn"))
    )
    ranked = profile.select(
        "ai",
        "mp",
        "nn",
        F.row_number()
        .over(Window.orderBy(F.col("mp").desc(), "ai"))
        .alias("discord_rank"),
        F.row_number()
        .over(Window.orderBy("mp", "ai"))
        .alias("motif_rank"),
    )
    return ranked.filter(
        (F.col("discord_rank") <= 3) | (F.col("motif_rank") <= 3)
    ).select(
        F.col("ai").cast("long").alias("window_start"),
        F.round("mp", 6).alias("profile_dist"),
        F.col("nn").cast("long").alias("nearest_neighbor"),
        F.when(F.col("discord_rank") <= 3, "discord")
        .otherwise("motif")
        .alias("kind"),
        F.when(F.col("discord_rank") <= 3, F.col("discord_rank"))
        .otherwise(F.col("motif_rank"))
        .cast("long")
        .alias("rank_in_kind"),
    )


# ---------------------------------------------------------------------------
# X472 — rank fusion (Borda / Copeland / RRF)
# ---------------------------------------------------------------------------


@query(
    "q_rank_fusion",
    oracle="""
    WITH stats AS (
      SELECT l_partkey % 30 AS band,
             sum(l_extendedprice * (1 - l_discount)) AS rev,
             sum(l_quantity) AS qty,
             count(DISTINCT l_orderkey) AS ords
      FROM lineitem GROUP BY 1
    ), ranks AS (
      SELECT band,
             row_number() OVER (ORDER BY rev DESC, band) AS r1,
             row_number() OVER (ORDER BY qty DESC, band) AS r2,
             row_number() OVER (ORDER BY ords DESC, band) AS r3,
             count(*) OVER () AS n
      FROM stats
    ), scored AS (
      SELECT band, r1, r2, r3,
             (n - r1) + (n - r2) + (n - r3) AS borda,
             round(1.0 / (60 + r1) + 1.0 / (60 + r2)
                   + 1.0 / (60 + r3), 8) AS rrf
      FROM ranks
    ), cope AS (
      SELECT a.band,
             sum(CASE WHEN (CASE WHEN a.r1 < b.r1 THEN 1 ELSE 0 END
                          + CASE WHEN a.r2 < b.r2 THEN 1 ELSE 0 END
                          + CASE WHEN a.r3 < b.r3 THEN 1 ELSE 0 END)
                        >= 2 THEN 1 ELSE 0 END) AS wins
      FROM scored a JOIN scored b ON a.band <> b.band
      GROUP BY a.band
    )
    SELECT CAST(s.band AS BIGINT) AS band,
           CAST(s.r1 AS BIGINT) AS rank_revenue,
           CAST(s.r2 AS BIGINT) AS rank_quantity,
           CAST(s.r3 AS BIGINT) AS rank_orders,
           CAST(s.borda AS BIGINT) AS borda_score,
           s.rrf AS rrf_score,
           CAST(c.wins AS BIGINT) AS copeland_wins
    FROM (SELECT *, row_number() OVER
            (ORDER BY rrf DESC, band) AS rn FROM scored) s
    JOIN cope c ON s.band = c.band
    WHERE s.rn <= 10
    """,
)
def q_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X472 — rank fusion of three part-band rankings (revenue,
    quantity, distinct orders): Borda counts, Copeland pairwise
    majority wins, and reciprocal-rank fusion (RRF, k=60 — the hybrid-
    search standard that combines X111's BM25 list with a vector
    list), top-10 by RRF. Voting-theoretic consensus where averaging
    raw scores would be scale-dependent; the Copeland pair join runs
    on the 30-band rank table. Deterministic ranks via (metric, band)
    tie-breaks."""
    stats = (
        load(spark, sf_dir, "lineitem")
        .groupBy((F.col("l_partkey") % 30).alias("band"))
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("rev"),
            F.sum("l_quantity").alias("qty"),
            F.countDistinct("l_orderkey").alias("ords"),
        )
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranks = stats.select(
        "band",
        F.row_number()
        .over(Window.orderBy(F.col("rev").desc(), "band"))
        .alias("r1"),
        F.row_number()
        .over(Window.orderBy(F.col("qty").desc(), "band"))
        .alias("r2"),
        F.row_number()
        .over(Window.orderBy(F.col("ords").desc(), "band"))
        .alias("r3"),
        F.count("*").over(wall).alias("n"),
    )
    scored = ranks.select(
        "band",
        "r1",
        "r2",
        "r3",
        (
            (F.col("n") - F.col("r1"))
            + (F.col("n") - F.col("r2"))
            + (F.col("n") - F.col("r3"))
        ).alias("borda"),
        F.round(
            1.0 / (60 + F.col("r1"))
            + 1.0 / (60 + F.col("r2"))
            + 1.0 / (60 + F.col("r3")),
            8,
        ).alias("rrf"),
    ).localCheckpoint(eager=True)
    b = scored.select(
        F.col("band").alias("b2"),
        F.col("r1").alias("b_r1"),
        F.col("r2").alias("b_r2"),
        F.col("r3").alias("b_r3"),
    )
    maj = (
        (F.col("r1") < F.col("b_r1")).cast("int")
        + (F.col("r2") < F.col("b_r2")).cast("int")
        + (F.col("r3") < F.col("b_r3")).cast("int")
        >= 2
    )
    cope = (
        scored.crossJoin(F.broadcast(b))
        .filter(F.col("band") != F.col("b2"))
        .groupBy("band")
        .agg(F.sum(maj.cast("int")).alias("wins"))
    )
    wr = Window.orderBy(F.col("rrf").desc(), "band")
    return (
        scored.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 10)
        .join(cope, "band")
        .select(
            F.col("band").cast("long").alias("band"),
            F.col("r1").cast("long").alias("rank_revenue"),
            F.col("r2").cast("long").alias("rank_quantity"),
            F.col("r3").cast("long").alias("rank_orders"),
            F.col("borda").cast("long").alias("borda_score"),
            F.col("rrf").alias("rrf_score"),
            F.col("wins").cast("long").alias("copeland_wins"),
        )
    )


# ---------------------------------------------------------------------------
# X473 — Burrows' Delta stylometry
# ---------------------------------------------------------------------------


@query(
    "q_burrows_delta",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS w
      FROM documents
    ), nonempty AS (SELECT source, w FROM tok WHERE w <> ''),
    top_words AS (
      SELECT w FROM (
        SELECT w, count(*) AS cf,
               row_number() OVER (ORDER BY count(*) DESC, w) AS rn
        FROM nonempty GROUP BY w) WHERE rn <= 50
    ), src_tot AS (
      SELECT source, count(*) AS nt FROM nonempty GROUP BY source
    ), freq AS (
      SELECT t.source, tw.w,
             count(n.w) * 1000.0 / any_value(t.nt) AS f
      FROM src_tot t CROSS JOIN top_words tw
      LEFT JOIN nonempty n ON n.source = t.source AND n.w = tw.w
      GROUP BY t.source, tw.w
    ), wstats AS (
      SELECT w, avg(f) AS mf,
             sqrt(greatest(avg(f * f) - avg(f) * avg(f), 1e-12)) AS sf
      FROM freq GROUP BY w
    ), z AS (
      SELECT f.source, f.w, (f.f - ws.mf) / ws.sf AS z
      FROM freq f JOIN wstats ws ON f.w = ws.w
    ), delta AS (
      SELECT a.source AS source_a, b.source AS source_b,
             round(avg(abs(a.z - b.z)), 6) AS burrows_delta
      FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT source_a, source_b, burrows_delta
    FROM (SELECT *, row_number() OVER
            (ORDER BY burrows_delta, source_a, source_b) AS rn
          FROM delta)
    WHERE rn <= 15
    """,
)
def q_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X473 — Burrows' Delta between sources: z-score the per-source
    rates (per 1000 tokens) of the 50 most frequent words across
    sources, Delta = mean |z difference| per source pair, 15 closest
    pairs — stylometry's standard authorship distance (function-word
    profiles survive topic changes), the attribution complement to
    X400's vocabulary overlap (which asks WHAT sources share; Delta
    asks HOW they use the common core). All joins run on the
    50-word × k-source grid."""
    tok = (
        load(spark, sf_dir, "documents")
        .select("source", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
    )
    top_words = (
        tok.groupBy("w")
        .agg(F.count("*").alias("cf"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.col("cf").desc(), "w")
            ),
        )
        .filter(F.col("rn") <= 50)
        .select("w")
    )
    src_tot = tok.groupBy("source").agg(F.count("*").alias("nt"))
    counts = (
        tok.join(F.broadcast(top_words), "w")
        .groupBy("source", "w")
        .agg(F.count("*").alias("c"))
    )
    freq = (
        src_tot.crossJoin(F.broadcast(top_words))
        .join(counts, ["source", "w"], "left")
        .select(
            "source",
            "w",
            (
                F.coalesce("c", F.lit(0)) * 1000.0 / F.col("nt")
            ).alias("f"),
        )
    )
    wstats = freq.groupBy("w").agg(
        F.avg("f").alias("mf"),
        F.sqrt(
            F.greatest(
                F.avg(F.col("f") * F.col("f")) - F.avg("f") * F.avg("f"),
                F.lit(1e-12),
            )
        ).alias("sf"),
    )
    z = freq.join(F.broadcast(wstats), "w").select(
        "source", "w", ((F.col("f") - F.col("mf")) / F.col("sf")).alias("z")
    )
    a = z.select("w", F.col("source").alias("source_a"), F.col("z").alias("za"))
    b = z.select("w", F.col("source").alias("source_b"), F.col("z").alias("zb"))
    delta = (
        a.join(b, "w")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.round(
                F.avg(F.abs(F.col("za") - F.col("zb"))), 6
            ).alias("burrows_delta")
        )
    )
    wr = Window.orderBy("burrows_delta", "source_a", "source_b")
    return (
        delta.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 15)
        .select("source_a", "source_b", "burrows_delta")
    )


# ---------------------------------------------------------------------------
# X474 — p-chart (attribute control chart)
# ---------------------------------------------------------------------------


@query(
    "q_p_chart",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             count(*) AS n,
             sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS x
      FROM events GROUP BY 1
    ), pbar AS (
      SELECT sum(x) * 1.0 / sum(n) AS p FROM daily
    )
    SELECT d.d, CAST(d.n AS BIGINT) AS n_events,
           round(d.x * 1.0 / d.n, 6) AS p_day,
           round(p.p, 6) AS p_bar,
           round(p.p + 3 * sqrt(p.p * (1 - p.p) / d.n), 6) AS ucl,
           round(greatest(p.p - 3 * sqrt(p.p * (1 - p.p) / d.n), 0), 6)
             AS lcl,
           d.x * 1.0 / d.n > p.p + 3 * sqrt(p.p * (1 - p.p) / d.n)
             OR d.x * 1.0 / d.n
                < greatest(p.p - 3 * sqrt(p.p * (1 - p.p) / d.n), 0)
             AS out_of_control
    FROM daily d CROSS JOIN pbar p
    """,
)
def q_p_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X474 — p-chart for the daily error proportion: centerline p̄,
    per-day 3σ binomial limits p̄ ± 3√(p̄(1−p̄)/nᵢ) (variable limits —
    each day's sample size sets its own), out-of-control flags — the
    ATTRIBUTE-data member of the SPC pair (X353's X-bar/R charts
    measurements; this charts proportions, the service-ops defect
    monitor). One daily rollup + broadcast centerline."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date(F.date_trunc("day", "ts")).alias("d"))
        .agg(
            F.count("*").alias("n"),
            F.sum(
                (F.col("event_type") == "error").cast("int")
            ).alias("x"),
        )
    )
    pbar = daily.agg(
        (F.sum("x") * 1.0 / F.sum("n")).alias("p")
    )
    j = daily.crossJoin(F.broadcast(pbar))
    sig = F.sqrt(F.col("p") * (1 - F.col("p")) / F.col("n"))
    ucl = F.col("p") + 3 * sig
    lcl = F.greatest(F.col("p") - 3 * sig, F.lit(0.0))
    pd = F.col("x") * 1.0 / F.col("n")
    return j.select(
        "d",
        F.col("n").cast("long").alias("n_events"),
        F.round(pd, 6).alias("p_day"),
        F.round("p", 6).alias("p_bar"),
        F.round(ucl, 6).alias("ucl"),
        F.round(lcl, 6).alias("lcl"),
        ((pd > ucl) | (pd < lcl)).alias("out_of_control"),
    )
