"""Round-4 flagship composition: the END-TO-END pretraining corpus
build — quality gate → benchmark holdout + decontamination → stratified
mixing → sequence packing — as ONE declarative plan with a full
value-hash oracle. A user of this engine runs their whole data build as
a single query; every stage is also individually gate-pinned (X99,
X90, X92, X267).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.hashing import token_hash, token_hash_sql
from ..sources.tables import load
from .datasetops import BENCH_MOD, _GRAMS_SQL, corpus_flags, grams_of
from .llm_ext2 import _CTX
from .registry import query

# ---------------------------------------------------------------------------
# X339 — end-to-end pretraining data build
# ---------------------------------------------------------------------------


@query(
    "q_pretrain_build",
    oracle=f"""
    WITH g AS (SELECT * FROM {_GRAMS_SQL}),
    bench_grams AS (
      SELECT DISTINCT gram FROM g WHERE doc_id % {BENCH_MOD} = 0),
    hits AS (
      SELECT DISTINCT g.doc_id FROM g JOIN bench_grams USING (gram)
      WHERE g.doc_id % {BENCH_MOD} <> 0),
    flags AS (
      SELECT d.doc_id, d.source, d.text,
             len(string_split(d.text, ' ')) AS n_words,
             (len(string_split(d.text, ' ')) >= 30
              AND d.n_chars * 1.0 / len(string_split(d.text, ' '))
                  BETWEEN 3 AND 13) AS q,
             d.doc_id % {BENCH_MOD} = 0 AS bench,
             h.doc_id IS NOT NULL AS cont,
             {token_hash_sql("CAST(d.doc_id AS VARCHAR)")} % 10000
               < (CASE WHEN CAST(substr(d.source, 4) AS INT) < 5 THEN 10000
                       WHEN CAST(substr(d.source, 4) AS INT) < 10 THEN 5000
                       WHEN CAST(substr(d.source, 4) AS INT) < 15 THEN 2500
                       ELSE 1000 END) AS kept
      FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id),
    survivors AS (
      SELECT doc_id, source,
             len(list_filter(string_split(text, ' '), t -> t <> ''))
               AS n_tok
      FROM flags WHERE q AND NOT bench AND NOT cont AND kept),
    pieces AS (
      SELECT doc_id, source,
             unnest(range(CAST(ceil(n_tok / {_CTX}.0) AS BIGINT)))
               AS piece_id,
             n_tok
      FROM survivors WHERE n_tok > 0),
    sized AS (
      SELECT doc_id, source, piece_id,
             least({_CTX}, n_tok - piece_id * {_CTX}) AS piece_len
      FROM pieces),
    placed AS (
      SELECT source, piece_len,
             CAST(ceil(sum(piece_len) OVER (
                 PARTITION BY source
                 ORDER BY piece_len DESC, doc_id, piece_id
                 ROWS UNBOUNDED PRECEDING) / {_CTX}.0) AS BIGINT)
               AS window_id
      FROM sized)
    SELECT source,
           count(*) AS n_pieces,
           CAST(count(DISTINCT window_id) AS BIGINT) AS n_windows,
           CAST(sum(piece_len) AS BIGINT) AS real_tokens,
           round(CAST(sum(piece_len) AS DOUBLE)
                 / (count(DISTINCT window_id) * {_CTX}), 4) AS pack_eff
    FROM placed GROUP BY source
    """,
)
def q_pretrain_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X339 — the END-TO-END pretraining data build as one plan:
    quality gate (X99's word-count + mean-word-length) → benchmark
    holdout + 5-gram decontamination (X90, broadcast semi-join) →
    stratified hash-threshold mixing (X92) → shard-local sequence
    packing of the SURVIVORS into 128-token windows (X267's
    running-sum bins), reporting per source the packed-window count,
    surviving token budget, and achieved packing efficiency — the
    numbers a training run is actually provisioned from.

    This is the engine's closing argument: every stage is a
    Column-expression transformation on the same lazy plan (flags in
    one pass, one broadcast semi-join, one shard-partitioned packing
    window), so the whole corpus build runs in ONE job with no
    intermediate materialization — at 100 TB the naive
    stage-per-dataset pipeline writes the corpus three times; this
    writes one summary table. Each constituent stage remains
    individually hash-pinned (X99/X90/X92/X267)."""
    d = load(spark, sf_dir, "documents")
    g = grams_of(d)
    bench_grams = (
        g.filter(F.col("doc_id") % BENCH_MOD == 0).select("gram").distinct()
    )
    hits = (
        g.filter(F.col("doc_id") % BENCH_MOD != 0)
        .join(F.broadcast(bench_grams), "gram", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    flags = corpus_flags(d, hits)
    survivors = (
        flags.filter(
            F.col("q") & ~F.col("bench") & ~F.col("cont") & F.col("kept")
        )
        .join(d.select("doc_id", "text"), "doc_id")
        .select(
            "doc_id",
            "source",
            F.size(
                F.filter(F.split("text", " "), lambda t: t != "")
            ).alias("n_tok"),
        )
        .filter(F.col("n_tok") > 0)
    )
    pieces = survivors.select(
        "doc_id",
        "source",
        F.explode(
            F.sequence(
                F.lit(0),
                F.ceil(F.col("n_tok") / float(_CTX)).cast("long") - 1,
            )
        ).alias("piece_id"),
        "n_tok",
    ).select(
        "doc_id",
        "source",
        "piece_id",
        F.least(
            F.lit(_CTX), F.col("n_tok") - F.col("piece_id") * _CTX
        ).alias("piece_len"),
    )
    w_cum = (
        Window.partitionBy("source")
        .orderBy(F.desc("piece_len"), F.asc("doc_id"), F.asc("piece_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = pieces.select(
        "source",
        "piece_len",
        F.ceil(F.sum("piece_len").over(w_cum) / float(_CTX))
        .cast("long")
        .alias("window_id"),
    )
    return placed.groupBy("source").agg(
        F.count("*").alias("n_pieces"),
        F.countDistinct("window_id").cast("long").alias("n_windows"),
        F.sum("piece_len").cast("long").alias("real_tokens"),
        F.round(
            F.sum("piece_len").cast("double")
            / (F.countDistinct("window_id") * _CTX),
            4,
        ).alias("pack_eff"),
    )


# ---------------------------------------------------------------------------
# X340 — Holt-Winters additive (triple exponential smoothing)
# ---------------------------------------------------------------------------

import pandas as pd  # noqa: E402

_HW_A, _HW_B, _HW_G, _HW_M = 0.5, 0.3, 0.3, 7


@query(
    "q_holt_winters",
    oracle=f"""
    WITH RECURSIVE daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(count(*) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    ), seq AS (
      SELECT event_type, v,
             row_number() OVER (PARTITION BY event_type ORDER BY d) AS i
      FROM daily
    ), n AS (SELECT event_type, max(i) AS n FROM seq GROUP BY event_type),
    hw(event_type, i, l, b, q1, q2, q3, q4, q5, q6, q7) AS (
      SELECT event_type, 1, v, CAST(0.0 AS DOUBLE),
             CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
             CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
             CAST(0.0 AS DOUBLE)
      FROM seq WHERE i = 1
      UNION ALL
      SELECT s.event_type, h.i + 1,
             {_HW_A} * (s.v - h.q1) + {1 - _HW_A} * (h.l + h.b),
             {_HW_B} * (({_HW_A} * (s.v - h.q1) + {1 - _HW_A} * (h.l + h.b))
                        - h.l) + {1 - _HW_B} * h.b,
             h.q2, h.q3, h.q4, h.q5, h.q6, h.q7,
             {_HW_G} * (s.v - ({_HW_A} * (s.v - h.q1)
                               + {1 - _HW_A} * (h.l + h.b)))
               + {1 - _HW_G} * h.q1
      FROM hw h JOIN seq s ON s.event_type = h.event_type AND s.i = h.i + 1
    )
    SELECT h.event_type, CAST(n.n AS BIGINT) AS n_days,
           round(h.l, 4) AS level, round(h.b, 4) AS trend,
           round(h.q7, 4) AS last_seasonal,
           round(h.l + h.b + h.q1, 4) AS forecast_1
    FROM hw h JOIN n ON h.event_type = n.event_type AND h.i = n.n
    """,
)
def q_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X340 — Holt-Winters ADDITIVE triple exponential smoothing
    (alpha=0.5, beta=0.3, gamma=0.3, season length 7) over each
    type's daily event counts — completing the forecasting ladder
    X109 (SES) → X218 (Holt) → here (seasonal), with the 1-step
    forecast l + b + s_{t+1-m}. The coupled level/trend/seasonal
    recurrence folds per series inside applyInPandas after one
    combinable daily rollup (the X218 pattern); the seasonal state is
    a 7-slot queue carried through the fold. The oracle steps the
    IDENTICAL recurrence in a recursive CTE whose row carries the same
    7-slot queue as columns — doubles agree bit-for-bit before
    rounding. Seasonal slots initialize to 0 (additive deviations), so
    the first cycle learns the season from gamma."""
    daily = load(spark, sf_dir, "events").groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).agg(F.count("*").cast("double").alias("v"))

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d")
        vals = list(pdf["v"])
        l, b = vals[0], 0.0
        q = [0.0] * _HW_M
        for x in vals[1:]:
            s_old = q[0]
            l_new = _HW_A * (x - s_old) + (1 - _HW_A) * (l + b)
            b = _HW_B * (l_new - l) + (1 - _HW_B) * b
            s_new = _HW_G * (x - l_new) + (1 - _HW_G) * s_old
            l = l_new
            q = q[1:] + [s_new]
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_days": [len(vals)],
                "level": [l],
                "trend": [b],
                "last_seasonal": [q[-1]],
                "forecast_1": [l + b + q[0]],
            }
        )

    fitted = daily.groupBy("event_type").applyInPandas(
        fit,
        "event_type string, n_days long, level double, trend double, "
        "last_seasonal double, forecast_1 double",
    )
    return fitted.select(
        "event_type",
        "n_days",
        F.round("level", 4).alias("level"),
        F.round("trend", 4).alias("trend"),
        F.round("last_seasonal", 4).alias("last_seasonal"),
        F.round("forecast_1", 4).alias("forecast_1"),
    )


# ---------------------------------------------------------------------------
# X341 — Mahalanobis-distance outlier screen (2-feature, closed form)
# ---------------------------------------------------------------------------


@query(
    "q_mahalanobis",
    oracle="""
    WITH x AS (
      SELECT doc_id, CAST(n_chars AS DOUBLE) AS x1,
             CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
               AS DOUBLE) AS x2
      FROM documents
    ), m AS (
      SELECT count(*) AS n, avg(x1) AS m1, avg(x2) AS m2 FROM x
    ), c AS (
      SELECT m.n, m.m1, m.m2,
             sum((x.x1 - m.m1) * (x.x1 - m.m1)) / m.n AS s11,
             sum((x.x1 - m.m1) * (x.x2 - m.m2)) / m.n AS s12,
             sum((x.x2 - m.m2) * (x.x2 - m.m2)) / m.n AS s22
      FROM x CROSS JOIN m GROUP BY m.n, m.m1, m.m2
    ), scored AS (
      SELECT x.doc_id,
             round(( c.s22 * (x.x1 - c.m1) * (x.x1 - c.m1)
                   - 2 * c.s12 * (x.x1 - c.m1) * (x.x2 - c.m2)
                   + c.s11 * (x.x2 - c.m2) * (x.x2 - c.m2))
                   / (c.s11 * c.s22 - c.s12 * c.s12), 6) AS d2
      FROM x CROSS JOIN c
    ), ranked AS (
      SELECT doc_id, d2,
             row_number() OVER (ORDER BY d2 DESC, doc_id) AS rn
      FROM scored
    )
    SELECT doc_id, d2 FROM ranked WHERE rn <= 15
    """,
)
def q_mahalanobis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X341 — Mahalanobis-distance outlier screen on (chars, words):
    d² = (x−μ)ᵀ Σ⁻¹ (x−μ) with the 2x2 covariance inverted in closed
    form — the CORRELATION-AWARE member of the X247 outlier ensemble
    (z-score and IQR see each axis alone and miss points that are
    normal marginally but break the chars~words relationship — exactly
    the mojibake/boilerplate signature in a text corpus). One moment
    pass, a broadcast Σ, a map-side quadratic form, and a top-15
    ranked cut with id tie-break."""
    d = load(spark, sf_dir, "documents")
    x = d.select(
        "doc_id",
        F.col("n_chars").cast("double").alias("x1"),
        F.size(F.filter(F.split("text", " "), lambda t: t != ""))
        .cast("double")
        .alias("x2"),
    )
    m = x.agg(
        F.count("*").alias("n"), F.avg("x1").alias("m1"), F.avg("x2").alias("m2")
    )
    c = (
        x.crossJoin(F.broadcast(m))
        .groupBy("n", "m1", "m2")
        .agg(
            (F.sum((F.col("x1") - F.col("m1")) * (F.col("x1") - F.col("m1"))) / F.col("n")).alias("s11"),
            (F.sum((F.col("x1") - F.col("m1")) * (F.col("x2") - F.col("m2"))) / F.col("n")).alias("s12"),
            (F.sum((F.col("x2") - F.col("m2")) * (F.col("x2") - F.col("m2"))) / F.col("n")).alias("s22"),
        )
    )
    dx1 = F.col("x1") - F.col("m1")
    dx2 = F.col("x2") - F.col("m2")
    d2 = (
        F.col("s22") * dx1 * dx1
        - 2 * F.col("s12") * dx1 * dx2
        + F.col("s11") * dx2 * dx2
    ) / (F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12"))
    scored = x.crossJoin(F.broadcast(c)).select(
        "doc_id", F.round(d2, 6).alias("d2")
    )
    w = Window.orderBy(F.desc("d2"), "doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 15)
        .select("doc_id", "d2")
    )


# ---------------------------------------------------------------------------
# X342 — average precision (threshold-level AP)
# ---------------------------------------------------------------------------


@query(
    "q_avg_precision",
    oracle="""
    WITH scored AS (
      SELECT value AS score,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE event_type IN ('purchase', 'view')
    ), by_val AS (
      SELECT score, count(*) AS n, sum(y) AS n1 FROM scored GROUP BY score
    ), cum AS (
      SELECT score, n, n1,
             sum(n) OVER (ORDER BY score DESC ROWS UNBOUNDED PRECEDING)
               AS cn,
             sum(n1) OVER (ORDER BY score DESC ROWS UNBOUNDED PRECEDING)
               AS tp
      FROM by_val
    ), tot AS (SELECT sum(n1) AS np, sum(n - n1) AS nn FROM by_val)
    SELECT CAST(t.np AS BIGINT) AS n_pos, CAST(t.nn AS BIGINT) AS n_neg,
           round(sum((c.n1 * 1.0 / t.np) * (c.tp * 1.0 / c.cn)), 6)
             AS avg_precision
    FROM cum c CROSS JOIN tot t GROUP BY t.np, t.nn
    """,
)
def q_avg_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X342 — average precision (the area under the PR curve by the
    threshold-level sum AP = Σ_t ΔR_t · P_t, scikit's
    average_precision_score definition — exact under ties because
    thresholds are DISTINCT scores, unlike the rank-walk spelling):
    the single-number PR summary X255's 5-point sweep samples and
    X252's AUC can't replace under class imbalance (AUC is
    prevalence-blind; AP is anchored to the positive class). Same
    collapsed-score frame as q_roc_auc: one rollup + one cumulative
    window over distinct scores."""
    scored = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "view"))
        .select(
            F.col("value").alias("score"),
            (F.col("event_type") == "purchase").cast("int").alias("y"),
        )
    )
    by_val = scored.groupBy("score").agg(
        F.count("*").alias("n"), F.sum("y").alias("n1")
    )
    w = (
        Window.orderBy(F.desc("score"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = by_val.select(
        "n",
        "n1",
        F.sum("n").over(w).alias("cn"),
        F.sum("n1").over(w).alias("tp"),
    )
    tot = by_val.agg(
        F.sum("n1").alias("np"), F.sum(F.col("n") - F.col("n1")).alias("nn")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("np", "nn")
        .agg(
            F.round(
                F.sum(
                    (F.col("n1") * 1.0 / F.col("np"))
                    * (F.col("tp") * 1.0 / F.col("cn"))
                ),
                6,
            ).alias("avg_precision")
        )
        .select(
            F.col("np").cast("long").alias("n_pos"),
            F.col("nn").cast("long").alias("n_neg"),
            "avg_precision",
        )
    )


# ---------------------------------------------------------------------------
# X343 — Lorenz curve points (decile concentration profile)
# ---------------------------------------------------------------------------


@query(
    "q_lorenz",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey, sum(o_totalprice) AS rev FROM orders GROUP BY 1
    ), ranked AS (
      SELECT rev,
             ntile(10) OVER (ORDER BY rev, o_custkey) AS decile
      FROM per_cust
    ), tot AS (SELECT sum(rev) AS t, count(*) AS n FROM per_cust),
    d AS (
      SELECT decile, count(*) AS n_cust, sum(rev) AS rev
      FROM ranked GROUP BY decile
    )
    SELECT d.decile,
           CAST(d.n_cust AS BIGINT) AS n_customers,
           round(d.rev / tot.t, 6) AS rev_share,
           round(sum(d.rev) OVER (ORDER BY d.decile
                 ROWS UNBOUNDED PRECEDING) / tot.t, 6) AS cum_share
    FROM d CROSS JOIN tot
    """,
)
def q_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X343 — Lorenz curve points: per revenue decile (customers
    ranked ascending, key tie-break), the decile's revenue share and
    the cumulative share — the CURVE behind X197's Gini scalar (the
    'bottom 50% hold x%' readout a concentration number can't give)
    and X264's ABC classes at fixed population cuts. One per-entity
    rollup, one ntile window, one 10-row cumulative sum."""
    per_cust = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    ranked = per_cust.select(
        "rev",
        F.ntile(10).over(Window.orderBy("rev", "o_custkey")).alias("decile"),
    )
    tot = per_cust.agg(F.sum("rev").alias("t"))
    d = ranked.groupBy("decile").agg(
        F.count("*").alias("n_cust"), F.sum("rev").alias("rev_d")
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        d.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            F.col("n_cust").cast("long").alias("n_customers"),
            F.round(F.col("rev_d") / F.col("t"), 6).alias("rev_share"),
            F.round(F.sum("rev_d").over(w) / F.col("t"), 6).alias(
                "cum_share"
            ),
        )
    )


# ---------------------------------------------------------------------------
# X344 — summed-area table (2-D prefix sums)
# ---------------------------------------------------------------------------


@query(
    "q_summed_area",
    oracle="""
    WITH grid AS (
      SELECT o_custkey % 8 AS gx,
             (year(o_orderdate) * 12 + month(o_orderdate)) % 8 AS gy,
             round(sum(o_totalprice), 2) AS v
      FROM orders GROUP BY 1, 2
    ), dense AS (
      SELECT x.gx, y.gy, COALESCE(g.v, 0.0) AS v
      FROM (SELECT unnest(range(8)) AS gx) x
      CROSS JOIN (SELECT unnest(range(8)) AS gy) y
      LEFT JOIN grid g ON g.gx = x.gx AND g.gy = y.gy
    ), rowcum AS (
      SELECT gx, gy,
             sum(v) OVER (PARTITION BY gx ORDER BY gy
               ROWS UNBOUNDED PRECEDING) AS rc
      FROM dense
    ), sat AS (
      SELECT gx, gy,
             sum(rc) OVER (PARTITION BY gy ORDER BY gx
               ROWS UNBOUNDED PRECEDING) AS s
      FROM rowcum
    )
    SELECT CAST(gx AS BIGINT) AS gx, CAST(gy AS BIGINT) AS gy,
           round(s, 2) AS sat
    FROM sat
    """,
)
def q_summed_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X344 — summed-area table (integral image) over the (customer-
    bucket × month-bucket) revenue grid: SAT[x, y] = Σ of all cells
    with gx' <= x and gy' <= y, built from two chained partitioned
    cumulative windows (row-direction then column-direction) — after
    which ANY rectangle aggregate is four lookups (SAT[x2,y2] −
    SAT[x1−1,y2] − SAT[x2,y1−1] + SAT[x1−1,y1−1]), the
    O(1)-per-query structure behind OLAP range acceleration and
    Viola-Jones-style feature scans. The grid densifies missing cells
    to 0 first (a prefix sum over a sparse grid would skip cells and
    break the rectangle identity). Cell values rounded before the
    cumulative passes so both engines accumulate identical doubles in
    identical window order."""
    o = load(spark, sf_dir, "orders")
    grid = o.groupBy(
        (F.col("o_custkey") % 8).alias("gx"),
        ((F.year("o_orderdate") * 12 + F.month("o_orderdate")) % 8).alias(
            "gy"
        ),
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("v"))
    axis = F.explode(F.sequence(F.lit(0), F.lit(7)))
    xs = o.sparkSession.range(1).select(axis.alias("gx"))
    ys = o.sparkSession.range(1).select(axis.alias("gy"))
    dense = (
        xs.crossJoin(ys)
        .join(grid, ["gx", "gy"], "left")
        .select("gx", "gy", F.coalesce("v", F.lit(0.0)).alias("v"))
    )
    w_row = (
        Window.partitionBy("gx")
        .orderBy("gy")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_col = (
        Window.partitionBy("gy")
        .orderBy("gx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    rowcum = dense.withColumn("rc", F.sum("v").over(w_row))
    return rowcum.select(
        F.col("gx").cast("long").alias("gx"),
        F.col("gy").cast("long").alias("gy"),
        F.round(F.sum("rc").over(w_col), 2).alias("sat"),
    )


# ---------------------------------------------------------------------------
# X345 — rate/mix-shift decomposition
# ---------------------------------------------------------------------------


@query(
    "q_mix_shift",
    oracle="""
    WITH per AS (
      SELECT c.c_mktsegment AS seg,
             year(o.o_orderdate) >= 1999 AS post,
             count(*) AS n,
             avg(o.o_totalprice) AS rate
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE year(o.o_orderdate) BETWEEN 1997 AND 2000
      GROUP BY 1, 2
    ), tot AS (
      SELECT post, sum(n) AS tn FROM per GROUP BY post
    ), shares AS (
      SELECT p.seg, p.post, p.rate, p.n * 1.0 / t.tn AS share
      FROM per p JOIN tot t ON t.post = p.post
    ), wide AS (
      SELECT a.seg,
             a.share AS share_pre, b.share AS share_post,
             a.rate AS rate_pre, b.rate AS rate_post
      FROM (SELECT * FROM shares WHERE NOT post) a
      JOIN (SELECT * FROM shares WHERE post) b ON b.seg = a.seg
    )
    SELECT seg,
           round((share_post - share_pre) * (rate_pre + rate_post) / 2, 2)
             AS mix_effect,
           round((rate_post - rate_pre) * (share_pre + share_post) / 2, 2)
             AS rate_effect,
           round(share_post * rate_post - share_pre * rate_pre, 2)
             AS total_effect
    FROM wide
    """,
)
def q_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X345 — rate/mix-shift decomposition of the average-order-value
    change between periods: each segment's contribution splits into a
    MIX effect (its share of orders moved) and a RATE effect (its own
    average moved), using the symmetric midpoint weighting that makes
    the two effects sum exactly to the total per segment — the
    'why did the average move' BI decomposition (Oaxaca-Blinder's
    two-way special case). Two rollups + one self-join on segment."""
    o = load(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").between(1997, 2000)
    )
    c = load(spark, sf_dir, "customer")
    per = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            (F.year("o_orderdate") >= 1999).alias("post"),
        )
        .agg(F.count("*").alias("n"), F.avg("o_totalprice").alias("rate"))
    )
    tot = per.groupBy("post").agg(F.sum("n").alias("tn"))
    shares = per.join(tot, "post").select(
        "seg", "post", "rate", (F.col("n") * 1.0 / F.col("tn")).alias("share")
    )
    pre = shares.filter(~F.col("post")).select(
        "seg",
        F.col("share").alias("share_pre"),
        F.col("rate").alias("rate_pre"),
    )
    post = shares.filter("post").select(
        F.col("seg").alias("seg2"),
        F.col("share").alias("share_post"),
        F.col("rate").alias("rate_post"),
    )
    wide = pre.join(post, pre.seg == post.seg2)
    return wide.select(
        "seg",
        F.round(
            (F.col("share_post") - F.col("share_pre"))
            * (F.col("rate_pre") + F.col("rate_post"))
            / 2,
            2,
        ).alias("mix_effect"),
        F.round(
            (F.col("rate_post") - F.col("rate_pre"))
            * (F.col("share_pre") + F.col("share_post"))
            / 2,
            2,
        ).alias("rate_effect"),
        F.round(
            F.col("share_post") * F.col("rate_post")
            - F.col("share_pre") * F.col("rate_pre"),
            2,
        ).alias("total_effect"),
    )


# ---------------------------------------------------------------------------
# X346 — Kendall's tau-b
# ---------------------------------------------------------------------------


@query(
    "q_kendall_tau",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             count(*) AS x,
             CAST(round(sum(value), 0) AS BIGINT) AS yv
      FROM events GROUP BY 1, 2
    ), pairs AS (
      SELECT a.event_type,
             CASE WHEN (a.x - b.x) * (a.yv - b.yv) > 0 THEN 1 ELSE 0 END
               AS conc,
             CASE WHEN (a.x - b.x) * (a.yv - b.yv) < 0 THEN 1 ELSE 0 END
               AS disc,
             CASE WHEN a.x = b.x AND a.yv <> b.yv THEN 1 ELSE 0 END AS tx,
             CASE WHEN a.yv = b.yv AND a.x <> b.x THEN 1 ELSE 0 END AS ty
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.d < b.d
    )
    SELECT event_type,
           CAST(sum(conc) AS BIGINT) AS concordant,
           CAST(sum(disc) AS BIGINT) AS discordant,
           round((sum(conc) - sum(disc))
                 / sqrt((sum(conc) + sum(disc) + sum(tx))
                        * (sum(conc) + sum(disc) + sum(ty))), 6) AS tau_b
    FROM pairs GROUP BY event_type
    """,
)
def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X346 — Kendall's tau-b between daily event count and daily
    value total per series: concordant/discordant pair counting with
    the tie-corrected denominator — the rank-correlation triple's last
    member (Pearson X249, Spearman X261; Kendall is the one with a
    clean probabilistic reading, P(concordant) − P(discordant)). The
    pair join runs on the POST-ROLLUP daily grain (≤31 rows per
    series), so the O(n²) pair space is the tiny series length, not
    the event table — the same collapse discipline as the midrank
    tests."""
    daily = load(spark, sf_dir, "events").groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).agg(
        F.count("*").alias("x"),
        F.round(F.sum("value"), 0).cast("long").alias("yv"),
    )
    a = daily.select(
        "event_type", F.col("d").alias("da"), F.col("x").alias("xa"), F.col("yv").alias("ya")
    )
    b = daily.select(
        F.col("event_type").alias("et2"),
        F.col("d").alias("db"),
        F.col("x").alias("xb"),
        F.col("yv").alias("yb"),
    )
    pairs = a.join(
        b, (F.col("event_type") == F.col("et2")) & (F.col("da") < F.col("db"))
    ).select(
        "event_type",
        (((F.col("xa") - F.col("xb")) * (F.col("ya") - F.col("yb")) > 0).cast("long")).alias("conc"),
        (((F.col("xa") - F.col("xb")) * (F.col("ya") - F.col("yb")) < 0).cast("long")).alias("disc"),
        ((F.col("xa") == F.col("xb")) & (F.col("ya") != F.col("yb"))).cast("long").alias("tx"),
        ((F.col("ya") == F.col("yb")) & (F.col("xa") != F.col("xb"))).cast("long").alias("ty"),
    )
    return pairs.groupBy("event_type").agg(
        F.sum("conc").alias("concordant"),
        F.sum("disc").alias("discordant"),
        F.round(
            (F.sum("conc") - F.sum("disc"))
            / F.sqrt(
                (F.sum("conc") + F.sum("disc") + F.sum("tx"))
                * (F.sum("conc") + F.sum("disc") + F.sum("ty"))
            ),
            6,
        ).alias("tau_b"),
    )


# ---------------------------------------------------------------------------
# X347 — Theil-Sen robust slope
# ---------------------------------------------------------------------------


@query(
    "q_theil_sen",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '2024-01-01',
                       CAST(date_trunc('day', ts) AS DATE)) AS t,
             CAST(count(*) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    ), slopes AS (
      SELECT a.event_type,
             round((b.v - a.v) / (b.t - a.t), 8) AS s
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.t < b.t
    )
    SELECT event_type, count(*) AS n_pairs,
           round(percentile_disc(0.5) WITHIN GROUP (ORDER BY s), 8)
             AS ts_slope
    FROM slopes GROUP BY event_type
    """,
)
def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X347 — Theil-Sen estimator: the median of all pairwise slopes
    per daily series — the robust trend line next to X241's Huber
    (Huber downweights outliers iteratively; Theil-Sen is exact,
    breakdown point 29%, zero tuning). The O(n²) pair space is the
    POST-ROLLUP series length (≤31 points, ≤465 slopes per series),
    the same collapse discipline as X346; slopes rounded before the
    DISCRETE median so both engines pick the identical element."""
    daily = load(spark, sf_dir, "events").groupBy(
        "event_type",
        F.datediff(
            F.to_date(F.date_trunc("day", "ts")),
            F.lit("2024-01-01").cast("date"),
        ).alias("t"),
    ).agg(F.count("*").cast("double").alias("v"))
    a = daily.select(
        "event_type", F.col("t").alias("ta"), F.col("v").alias("va")
    )
    b = daily.select(
        F.col("event_type").alias("et2"),
        F.col("t").alias("tb"),
        F.col("v").alias("vb"),
    )
    slopes = a.join(
        b, (F.col("event_type") == F.col("et2")) & (F.col("ta") < F.col("tb"))
    ).select(
        "event_type",
        F.round(
            (F.col("vb") - F.col("va")) / (F.col("tb") - F.col("ta")), 8
        ).alias("s"),
    )
    return slopes.groupBy("event_type").agg(
        F.count("*").alias("n_pairs"),
        F.round(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY s)"), 8
        ).alias("ts_slope"),
    )


# ---------------------------------------------------------------------------
# X348 — Shannon diversity / evenness
# ---------------------------------------------------------------------------


@query(
    "q_diversity",
    oracle="""
    WITH c AS (
      SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2
    ), tot AS (
      SELECT source, sum(n) AS tn, count(*) AS k FROM c GROUP BY source
    )
    SELECT c.source,
           CAST(max(tot.k) AS BIGINT) AS n_langs,
           round(-sum((c.n * 1.0 / tot.tn) * ln(c.n * 1.0 / tot.tn)), 6)
             AS shannon_h,
           round(CASE WHEN max(tot.k) = 1 THEN 1.0
                 ELSE -sum((c.n * 1.0 / tot.tn) * ln(c.n * 1.0 / tot.tn))
                      / ln(max(tot.k)) END, 6) AS evenness,
           round(1.0 - sum((c.n * 1.0 / tot.tn) * (c.n * 1.0 / tot.tn)), 6)
             AS simpson
    FROM c JOIN tot ON tot.source = c.source
    GROUP BY c.source
    """,
)
def q_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X348 — diversity indices of each source's language mix: Shannon
    H, Pielou evenness (H / ln k, the 0-1 'how balanced' score), and
    Gini-Simpson (probability two random docs differ in language) —
    the ecology-standard triple, used verbatim in corpus curation to
    flag monoculture sources before X92's mixing re-weights them (and
    the distribution-level complement to X67's within-document
    character entropy). One (source, lang) rollup + one per-source
    fold."""
    c = (
        load(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.count("*").alias("n"))
    )
    tot = c.groupBy("source").agg(
        F.sum("n").alias("tn"), F.count("*").alias("k")
    )
    p = F.col("n") * 1.0 / F.col("tn")
    h = -F.sum(p * F.log(p))
    return (
        c.join(tot, "source")
        .groupBy("source")
        .agg(
            F.max("k").cast("long").alias("n_langs"),
            F.round(h, 6).alias("shannon_h"),
            F.round(
                F.when(F.max("k") == 1, 1.0).otherwise(
                    h / F.log(F.max("k").cast("double"))
                ),
                6,
            ).alias("evenness"),
            F.round(1.0 - F.sum(p * p), 6).alias("simpson"),
        )
    )


# ---------------------------------------------------------------------------
# X349 — extreme-value (Gumbel) fit on block maxima
# ---------------------------------------------------------------------------


@query(
    "q_extreme_value",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
             round(sum(o_totalprice), 2) AS rev
      FROM orders GROUP BY 1
    ), blocks AS (
      SELECT year(d) * 12 + month(d) AS m, max(rev) AS mx
      FROM daily GROUP BY 1
    ), s AS (
      SELECT count(*) AS n, avg(mx) AS mean,
             sqrt(sum(mx * mx) / count(*) - avg(mx) * avg(mx)) AS sd
      FROM blocks
    )
    SELECT CAST(n AS BIGINT) AS n_blocks,
           round(mean, 2) AS mean_max,
           round(sd * sqrt(6.0) / pi(), 4) AS beta,
           round(mean - 0.5772156649 * sd * sqrt(6.0) / pi(), 2) AS mu,
           round(mean - 0.5772156649 * sd * sqrt(6.0) / pi()
                 - sd * sqrt(6.0) / pi() * ln(-ln(1.0 - 1.0 / 12)), 2)
             AS return_level_12
    FROM s
    """,
)
def q_extreme_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X349 — Gumbel extreme-value fit on monthly block maxima of
    daily revenue (method of moments: beta = sd·sqrt(6)/pi, mu = mean −
    gamma·beta) with the 12-block return level mu − beta·ln(−ln(1−1/12))
    — the capacity-planning question ('how big a day should we
    provision for per year') that percentiles of the ordinary
    distribution systematically underestimate, answered by EVT's
    block-maxima theorem. Two rollups + scalar algebra; population sd
    spelled explicitly."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.to_date(F.date_trunc("day", "o_orderdate")).alias("d"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    )
    blocks = daily.groupBy(
        (F.year("d") * 12 + F.month("d")).alias("m")
    ).agg(F.max("rev").alias("mx"))
    s = blocks.agg(
        F.count("*").alias("n"),
        F.avg("mx").alias("mean"),
        F.sqrt(
            F.sum(F.col("mx") * F.col("mx")) / F.count("*")
            - F.avg("mx") * F.avg("mx")
        ).alias("sd"),
    )
    import math

    beta = F.col("sd") * math.sqrt(6.0) / math.pi
    mu = F.col("mean") - 0.5772156649 * beta
    return s.select(
        F.col("n").cast("long").alias("n_blocks"),
        F.round("mean", 2).alias("mean_max"),
        F.round(beta, 4).alias("beta"),
        F.round(mu, 2).alias("mu"),
        F.round(
            mu - beta * F.log(-F.log(F.lit(1.0) - F.lit(1.0) / 12)), 2
        ).alias("return_level_12"),
    )


# ---------------------------------------------------------------------------
# X350 — Simpson's paradox detector
# ---------------------------------------------------------------------------


@query(
    "q_simpson_check",
    oracle="""
    WITH x AS (
      SELECT l_returnflag AS g,
             CAST(l_quantity AS DOUBLE) AS x,
             CAST(l_discount AS DOUBLE) AS y
      FROM lineitem
    ), grp AS (
      SELECT g, count(*) AS n,
             (count(*) * sum(x * y) - sum(x) * sum(y))
               / (count(*) * sum(x * x) - sum(x) * sum(x)) AS slope
      FROM x GROUP BY g
    ), pooled AS (
      SELECT (count(*) * sum(x * y) - sum(x) * sum(y))
               / (count(*) * sum(x * x) - sum(x) * sum(x)) AS slope
      FROM x
    )
    SELECT g.g AS group_key, CAST(g.n AS BIGINT) AS n,
           round(g.slope, 8) AS group_slope,
           round(p.slope, 8) AS pooled_slope,
           (g.slope > 0) <> (p.slope > 0) AS sign_reversed
    FROM grp g CROSS JOIN pooled p
    """,
)
def q_simpson_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X350 — Simpson's-paradox detector: the pooled quantity~discount
    regression slope next to every within-group slope, flagging groups
    whose trend REVERSES the pooled one — the aggregation trap every
    self-serve analytics layer should surface before someone reads the
    pooled number (the lurking-variable warning X336's DiD and X326's
    CUPED both exist to avoid). One grouped + one global
    sufficient-statistics pass over the same scan."""
    x = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        F.col("l_quantity").cast("double").alias("x"),
        F.col("l_discount").cast("double").alias("y"),
    )

    def slope_agg():
        return (
            F.count("*") * F.sum(F.col("x") * F.col("y"))
            - F.sum("x") * F.sum("y")
        ) / (
            F.count("*") * F.sum(F.col("x") * F.col("x"))
            - F.sum("x") * F.sum("x")
        )

    grp = x.groupBy("g").agg(
        F.count("*").alias("n"), slope_agg().alias("gslope")
    )
    pooled = x.agg(slope_agg().alias("pslope"))
    return grp.crossJoin(F.broadcast(pooled)).select(
        F.col("g").alias("group_key"),
        F.col("n").cast("long").alias("n"),
        F.round("gslope", 8).alias("group_slope"),
        F.round("pslope", 8).alias("pooled_slope"),
        ((F.col("gslope") > 0) != (F.col("pslope") > 0)).alias(
            "sign_reversed"
        ),
    )


# ---------------------------------------------------------------------------
# X351 — Little's law audit (L = λW)
# ---------------------------------------------------------------------------


@query(
    "q_littles_law",
    oracle="""
    WITH spans AS (
      SELECT CAST(o.o_orderdate AS DATE) AS arr,
             CAST(l.l_shipdate AS DATE) AS dep
      FROM orders o
      JOIN (SELECT l_orderkey, max(l_shipdate) AS l_shipdate
            FROM lineitem GROUP BY l_orderkey) l
        ON l.l_orderkey = o.o_orderkey
    ), bounds AS (
      SELECT min(arr) AS lo, max(dep) AS hi, count(*) AS n,
             avg(date_diff('day', arr, dep)) AS w_days
      FROM spans
    ), events_pm AS (
      SELECT s.arr, s.dep, b.lo, b.hi, b.n, b.w_days FROM spans s
      CROSS JOIN bounds b
    ), l_avg AS (
      SELECT any_value(n) AS n, any_value(w_days) AS w_days,
             any_value(date_diff('day', lo, hi) + 1) AS horizon,
             sum(date_diff('day', arr, dep) + 1) * 1.0
               / any_value(date_diff('day', lo, hi) + 1) AS l_direct
      FROM events_pm
    )
    SELECT CAST(n AS BIGINT) AS n_orders,
           CAST(horizon AS BIGINT) AS horizon_days,
           round(n * 1.0 / horizon, 6) AS lambda_per_day,
           round(w_days + 1, 4) AS w_days,
           round(l_direct, 4) AS l_direct,
           round((n * 1.0 / horizon) * (w_days + 1), 4) AS l_littles,
           round(l_direct / ((n * 1.0 / horizon) * (w_days + 1)), 6)
             AS ratio
    FROM l_avg
    """,
)
def q_littles_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X351 — Little's law audit L = λ·W over order fulfillment: the
    time-average number of open orders computed DIRECTLY (sum of each
    order's open-days over the horizon — the integral of X108's
    concurrency curve) against λ·W from arrival rate × mean residence —
    queueing theory's distribution-free identity, used as a
    CONSISTENCY CHECK on instrumentation (ratio far from 1 means the
    arrival, residence, or concurrency pipeline disagrees about
    clock/horizon conventions). Inclusive day counting (+1) applied
    identically to W and the direct integral. One join + two scalar
    rollups."""
    o = load(spark, sf_dir, "orders")
    li = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("dep_ts"))
    )
    spans = o.join(li, o.o_orderkey == li.l_orderkey).select(
        F.to_date("o_orderdate").alias("arr"),
        F.to_date("dep_ts").alias("dep"),
    )
    bounds = spans.agg(
        F.min("arr").alias("lo"),
        F.max("dep").alias("hi"),
        F.count("*").alias("n"),
        F.avg(F.datediff("dep", "arr")).alias("w_days"),
    )
    j = spans.crossJoin(F.broadcast(bounds))
    horizon = F.datediff(F.col("lo"), F.col("hi")) * -1 + 1
    agg = j.agg(
        F.any_value("n").alias("n"),
        F.any_value("w_days").alias("w_days"),
        F.any_value(horizon).alias("horizon"),
        (
            F.sum(F.datediff("dep", "arr") + 1) * 1.0
            / F.any_value(horizon)
        ).alias("l_direct"),
    )
    lam = F.col("n") * 1.0 / F.col("horizon")
    w = F.col("w_days") + 1
    return agg.select(
        F.col("n").cast("long").alias("n_orders"),
        F.col("horizon").cast("long").alias("horizon_days"),
        F.round(lam, 6).alias("lambda_per_day"),
        F.round(w, 4).alias("w_days"),
        F.round("l_direct", 4).alias("l_direct"),
        F.round(lam * w, 4).alias("l_littles"),
        F.round(F.col("l_direct") / (lam * w), 6).alias("ratio"),
    )


# ---------------------------------------------------------------------------
# X352 — XYZ demand-variability classes
# ---------------------------------------------------------------------------


@query(
    "q_xyz_class",
    oracle="""
    WITH monthly AS (
      SELECT l_partkey % 50 AS part_band,
             year(l_shipdate) * 12 + month(l_shipdate) AS m,
             sum(l_quantity) AS q
      FROM lineitem GROUP BY 1, 2
    ), s AS (
      SELECT part_band, count(*) AS n_months, avg(q) AS mean_q,
             sqrt(sum(q * q) / count(*) - avg(q) * avg(q)) / avg(q) AS cv
      FROM monthly GROUP BY part_band
    )
    SELECT part_band, CAST(n_months AS BIGINT) AS n_months,
           round(mean_q, 2) AS mean_monthly_qty,
           round(cv, 6) AS cv,
           CASE WHEN cv < 0.5 THEN 'X' WHEN cv < 1.0 THEN 'Y'
                ELSE 'Z' END AS xyz_class
    FROM s
    """,
)
def q_xyz_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X352 — XYZ demand-variability classification (the second axis
    of the ABC-XYZ inventory matrix; X264 supplies the ABC revenue
    axis): coefficient of variation of monthly demand per part band,
    cut at the standard 0.5/1.0 thresholds — X (steady, forecastable
    with X218/X340), Y (seasonal-ish), Z (erratic, safety-stock-driven).
    Population CV spelled as explicit moments; one monthly rollup +
    one per-band fold."""
    monthly = (
        load(spark, sf_dir, "lineitem")
        .groupBy(
            (F.col("l_partkey") % 50).alias("part_band"),
            (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("m"),
        )
        .agg(F.sum("l_quantity").alias("q"))
    )
    cv = (
        F.sqrt(
            F.sum(F.col("q") * F.col("q")) / F.count("*")
            - F.avg("q") * F.avg("q")
        )
        / F.avg("q")
    )
    s = monthly.groupBy("part_band").agg(
        F.count("*").alias("n_months"),
        F.avg("q").alias("mean_q"),
        cv.alias("cv"),
    )
    return s.select(
        "part_band",
        F.col("n_months").cast("long").alias("n_months"),
        F.round("mean_q", 2).alias("mean_monthly_qty"),
        F.round("cv", 6).alias("cv"),
        F.when(F.col("cv") < 0.5, "X")
        .when(F.col("cv") < 1.0, "Y")
        .otherwise("Z")
        .alias("xyz_class"),
    )
