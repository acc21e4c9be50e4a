"""Round-7 batch B (X609-X610): count-data overdispersion models —
the two members the stats battery lacked between Poisson rate tests
(X237 family) and the distribution-fit family (Weibull X-, Benford):
negative-binomial moment fitting with a Poisson-dispersion test, and
Tweedie variance-power estimation via the mean-variance power law.

Reference scope: §2.13 mandate components (the reference has no
statistics surface); both are one-pass moment computations — exact
integer or rounded-sum inputs, so the cross-engine doubles are
identical by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load
from .registry import query


@query(
    "q_negbin_fit",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2),
    sums AS (
      SELECT event_type, count(*) AS n,
             CAST(sum(c) AS BIGINT) AS s1,
             CAST(sum(c * c) AS BIGINT) AS s2
      FROM daily GROUP BY event_type)
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           round(s1 * 1.0 / n, 6) AS mean_c,
           round((s2 - s1 * 1.0 * s1 / n) / (n - 1), 6) AS var_c,
           round(((s2 - s1 * 1.0 * s1 / n) / (n - 1)) / (s1 * 1.0 / n), 6)
             AS dispersion_ratio,
           round((s1 * 1.0 / n) * (s1 * 1.0 / n)
                 / (((s2 - s1 * 1.0 * s1 / n) / (n - 1)) - s1 * 1.0 / n), 6)
             AS nb_r,
           round((s1 * 1.0 / n)
                 / ((s2 - s1 * 1.0 * s1 / n) / (n - 1)), 6) AS nb_p,
           round(sqrt(2 * (n - 1) * ((s2 - s1 * 1.0 * s1 / n) / (n - 1))
                      / (s1 * 1.0 / n))
                 - sqrt(2.0 * (n - 1) - 1), 6) AS disp_z
    FROM sums
    """,
)
def q_negbin_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X609 — negative-binomial moment fit + Poisson-dispersion test on
    daily event counts per type: the count-data model between Poisson
    (variance = mean) and "just use a z-test". Method-of-moments
    r = m²/(s²−m), p = m/s² (the standard NB2 parameterization), the
    dispersion ratio s²/m (Poisson ⇒ 1), and the Wilson-Hilferty-style
    normal approximation z = √(2D) − √(2(n−1)−1) of the dispersion
    statistic D = (n−1)s²/m ~ χ²(n−1) under Poisson — the test that
    says whether the NB fit is even needed.

    Cross-engine determinism is structural: every statistic derives
    from the EXACT integer sums (Σc, Σc², n) — no doubles until the
    final divisions, which both engines compute identically.
    Plan: two map-side-combinable aggregations, 5 output rows at any
    scale."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").cast("long").alias("c"))
    sums = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("c").cast("long").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    mean_c = s1 * 1.0 / n
    var_c = (s2 - s1 * 1.0 * s1 / n) / (n - 1)
    return sums.select(
        "event_type",
        n.cast("long").alias("n_days"),
        F.round(mean_c, 6).alias("mean_c"),
        F.round(var_c, 6).alias("var_c"),
        F.round(var_c / mean_c, 6).alias("dispersion_ratio"),
        F.round(mean_c * mean_c / (var_c - mean_c), 6).alias("nb_r"),
        F.round(mean_c / var_c, 6).alias("nb_p"),
        F.round(
            F.sqrt(2 * (n - 1) * var_c / mean_c)
            - F.sqrt(2.0 * (n - 1) - 1),
            6,
        ).alias("disp_z"),
    )


@query(
    "q_tweedie_power",
    oracle="""
    WITH weekly AS (
      SELECT l_suppkey, date_trunc('week', l_shipdate) AS wk,
             round(sum(l_extendedprice), 2) AS rev
      FROM lineitem GROUP BY 1, 2),
    per_supp AS (
      SELECT l_suppkey, count(*) AS nw,
             round(sum(rev), 4) AS s1, round(sum(rev * rev), 4) AS s2
      FROM weekly GROUP BY l_suppkey HAVING count(*) >= 8),
    mv AS (
      SELECT l_suppkey,
             ln(s1 / nw) AS x,
             ln((s2 - s1 * s1 / nw) / (nw - 1)) AS y
      FROM per_supp
      WHERE s1 > 0 AND (s2 - s1 * s1 / nw) / (nw - 1) > 0),
    reg AS (
      SELECT count(*) AS n,
             round(sum(x), 6) AS sx, round(sum(y), 6) AS sy,
             round(sum(x * x), 6) AS sxx, round(sum(x * y), 6) AS sxy,
             round(sum(y * y), 6) AS syy
      FROM mv)
    SELECT CAST(n AS BIGINT) AS n_suppliers,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
             AS var_power,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,
                 6) AS log_phi,
           round(pow(n * sxy - sx * sy, 2)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM reg
    """,
)
def q_tweedie_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X610 — Tweedie variance-power estimation via the mean-variance
    power law (Jørgensen; the standard actuarial/revenue-modeling
    diagnostic): per-supplier weekly revenue gives (mean, variance)
    pairs; Var = φ·μ^p means ln(var) is linear in ln(mean) with slope
    p — p∈(1,2) is the compound Poisson-gamma regime that justifies a
    Tweedie GLM for zero-inflated continuous revenue, p≈2 is gamma.
    One OLS on the log-log moments, round-the-sums discipline (the
    per-supplier sums round at 4 before the logs, the regression sums
    at 6 before the slope — ln() differs at ULP between engines but
    the rounded sums absorb it).

    Plan: weekly rollup → per-supplier moments → 1-row regression;
    every stage is a map-side-combinable aggregate."""
    li = load(spark, sf_dir, "lineitem")
    weekly = li.groupBy(
        "l_suppkey", F.date_trunc("week", "l_shipdate").alias("wk")
    ).agg(F.round(F.sum("l_extendedprice"), 2).alias("rev"))
    per_supp = (
        weekly.groupBy("l_suppkey")
        .agg(
            F.count("*").alias("nw"),
            F.round(F.sum("rev"), 4).alias("s1"),
            F.round(F.sum(F.col("rev") * F.col("rev")), 4).alias("s2"),
        )
        .filter(F.col("nw") >= 8)
    )
    nw, s1, s2 = F.col("nw"), F.col("s1"), F.col("s2")
    var_ = (s2 - s1 * s1 / nw) / (nw - 1)
    mv = per_supp.filter((s1 > 0) & (var_ > 0)).select(
        F.log(s1 / nw).alias("x"), F.log(var_).alias("y")
    )
    reg = mv.agg(
        F.count("*").alias("n"),
        F.round(F.sum("x"), 6).alias("sx"),
        F.round(F.sum("y"), 6).alias("sy"),
        F.round(F.sum(F.col("x") * F.col("x")), 6).alias("sxx"),
        F.round(F.sum(F.col("x") * F.col("y")), 6).alias("sxy"),
        F.round(F.sum(F.col("y") * F.col("y")), 6).alias("syy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return reg.select(
        n.cast("long").alias("n_suppliers"),
        F.round(slope, 6).alias("var_power"),
        F.round((sy - slope * sx) / n, 6).alias("log_phi"),
        F.round(
            F.pow(n * sxy - sx * sy, F.lit(2))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# X611 — preference-pair construction (DPO/RLHF data prep)
# ---------------------------------------------------------------------------

from ..functions import text  # noqa: E402

_PP_K = 4
_PP_MARGIN = 0.05

_QUALITY_SQL = f"""
    q AS (
      SELECT doc_id, lang, source,
             round(0.4 * least(len({text.tokens_sql('text')}) / 100.0, 1.0)
                 + 0.3 * (1.0 - round(CAST({text.stopword_ratio_sql(text.tokens_sql('text'))} AS DOUBLE), 6))
                 + 0.3 * least(round(CAST(list_aggregate(list_transform({text.tokens_sql('text')}, x -> len(x)), 'sum') AS DOUBLE)
                   / greatest(len({text.tokens_sql('text')}), 1), 6) / 10.0, 1.0), 6) AS quality
      FROM documents)
"""


@query(
    "q_preference_pairs",
    oracle=f"""
    WITH {_QUALITY_SQL},
    ranked AS (
      SELECT doc_id, lang, source, quality,
             row_number() OVER (PARTITION BY lang, source
               ORDER BY quality DESC, doc_id) AS rk_hi,
             row_number() OVER (PARTITION BY lang, source
               ORDER BY quality ASC, doc_id) AS rk_lo
      FROM q)
    SELECT h.lang, h.source, CAST(h.rk_hi AS BIGINT) AS pair_rank,
           h.doc_id AS chosen_id, l.doc_id AS rejected_id,
           h.quality AS chosen_q, l.quality AS rejected_q,
           round(h.quality - l.quality, 6) AS margin
    FROM ranked h
    JOIN ranked l ON l.lang = h.lang AND l.source = h.source
                 AND l.rk_lo = h.rk_hi
    WHERE h.rk_hi <= {_PP_K}
      AND h.doc_id <> l.doc_id
      AND h.quality - l.quality >= {_PP_MARGIN}
    """,
)
def q_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X611 — preference-pair construction for DPO/reward-model
    training: within each (lang, source) group — the "same prompt
    distribution" proxy — the k-th best document by the E4d quality
    score pairs with the k-th worst (extreme pairing, k ≤ 4), kept
    only when the quality margin clears a confidence threshold (0.05)
    — the standard "don't train on ambiguous pairs" filter. Emits
    full (chosen, rejected, margin) lineage. Deterministic: ranks on
    the ROUNDED score with doc_id tiebreak.

    Plan: one score pass + two window ranks per group + a group-local
    self-join on rank index — each group's pair count is capped at k,
    so output is O(k · groups) at any scale."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    toks = text.tokens(F.col("text"))
    n_tokens = F.size(toks)
    sw = F.round(text.stopword_ratio(toks).cast("double"), 6)
    avg_len = F.round(
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).cast("double")
        / F.greatest(n_tokens, F.lit(1)),
        6,
    )
    quality = F.round(
        0.4 * F.least(n_tokens / 100.0, F.lit(1.0))
        + 0.3 * (1.0 - sw)
        + 0.3 * F.least(avg_len / 10.0, F.lit(1.0)),
        6,
    )
    q = d.select("doc_id", "lang", "source", quality.alias("quality"))
    w_hi = Window.partitionBy("lang", "source").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    w_lo = Window.partitionBy("lang", "source").orderBy(
        F.asc("quality"), F.asc("doc_id")
    )
    ranked = q.withColumn("rk_hi", F.row_number().over(w_hi)).withColumn(
        "rk_lo", F.row_number().over(w_lo)
    )
    h = ranked.filter(F.col("rk_hi") <= _PP_K).select(
        "lang",
        "source",
        F.col("rk_hi").cast("long").alias("pair_rank"),
        F.col("doc_id").alias("chosen_id"),
        F.col("quality").alias("chosen_q"),
    )
    lo = ranked.select(
        F.col("lang").alias("l_lang"),
        F.col("source").alias("l_source"),
        F.col("rk_lo").alias("l_rk"),
        F.col("doc_id").alias("rejected_id"),
        F.col("quality").alias("rejected_q"),
    )
    return (
        h.join(
            lo,
            (F.col("l_lang") == F.col("lang"))
            & (F.col("l_source") == F.col("source"))
            & (F.col("l_rk") == F.col("pair_rank")),
        )
        .filter(
            (F.col("chosen_id") != F.col("rejected_id"))
            & (F.col("chosen_q") - F.col("rejected_q") >= _PP_MARGIN)
        )
        .select(
            "lang",
            "source",
            "pair_rank",
            "chosen_id",
            "rejected_id",
            "chosen_q",
            "rejected_q",
            F.round(F.col("chosen_q") - F.col("rejected_q"), 6).alias(
                "margin"
            ),
        )
    )


# ---------------------------------------------------------------------------
# X612 — temporal scene-change detection over the certified video stack
# ---------------------------------------------------------------------------

from .llm_ext2 import frame_phash_sql  # noqa: E402

#: hamming threshold (of 64 aHash bits) above which consecutive frames
#: count as a cut
SCENE_THRESH = 16


@query(
    "q_scene_changes",
    oracle=f"""
    WITH fh AS ({frame_phash_sql((0, 1, 2, 3))}),
    lagged AS (
      SELECT vec_id, frame_idx, phash,
             lag(phash) OVER (PARTITION BY vec_id ORDER BY frame_idx)
               AS prev
      FROM fh)
    SELECT vec_id, frame_idx,
           CAST(bit_count(xor(phash, prev)) AS BIGINT) AS hamming,
           bit_count(xor(phash, prev)) > {SCENE_THRESH} AS is_cut
    FROM lagged WHERE prev IS NOT NULL
    """,
)
def q_scene_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X612 — temporal scene-change (cut) detection: decode EVERY frame
    of the embedding-derived AVI through the certified RIFF/DIB stack
    (X268 gates the encoder+walker+aHash arithmetic; this adds the
    TEMPORAL layer), fingerprint each frame, and flag consecutive-frame
    aHash hamming distances above SCENE_THRESH of 64 bits — the
    standard shot-boundary heuristic every video-curation pipeline
    runs before frame sampling (sample per shot, not per stride). The
    oracle recomputes all four frame hashes arithmetically and replays
    the lag/xor/popcount, so the cut decisions themselves are
    value-hash-gated.

    Scale: decode+hash is the same Arrow-batched mapInPandas pass as
    X268 (no pixel shuffles); the temporal pass shuffles 16-byte
    fingerprint rows once on doc_id."""
    from ..operators.multimodal import encode_avi, video_frames
    from ..session import default_parallelism
    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings").repartition(
        default_parallelism()
    )
    px = F.transform(
        F.col("embedding"),
        lambda v: F.least(
            F.greatest(
                F.round((v.cast("double") + F.lit(1.0)) * F.lit(127.5), 0)
                .cast("bigint"),
                F.lit(0),
            ),
            F.lit(255),
        ),
    )
    quant = emb.select(F.col("vec_id").alias("doc_id"), px.alias("px"))

    def build(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for vals in pdf["px"]:
                g = [int(v) for v in vals]
                frames = []
                for f in range(4):
                    rot = g[16 * f :] + g[: 16 * f]
                    frames.append(b"".join(bytes((p, p, p)) for p in rot))
                payloads.append(encode_avi(8, 8, frames))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    avis = quant.mapInPandas(build, schema="doc_id long, payload binary")
    fh = video_frames(avis, every_n=1).select(
        F.col("doc_id").alias("vec_id"), "frame_idx", "phash"
    )
    w = Window.partitionBy("vec_id").orderBy("frame_idx")
    lagged = fh.withColumn("prev", F.lag("phash").over(w)).filter(
        F.col("prev").isNotNull()
    )
    ham = F.bit_count(F.col("phash").bitwiseXOR(F.col("prev")))
    return lagged.select(
        "vec_id",
        "frame_idx",
        ham.cast("long").alias("hamming"),
        (ham > SCENE_THRESH).alias("is_cut"),
    )
