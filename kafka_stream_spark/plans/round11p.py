"""Round-11 batch P (X790–X792): local differential privacy,
LLM-watermark detection, and matryoshka-embedding truncation audits.

Reference scope note: §2.13 mandate extensions, reference-free.

- X790 q_rr_frequency: k-ary randomized-response frequency estimation
  (generalized RR, the local-DP primitive telemetry pipelines ship):
  each report flips to a uniform symbol with probability f = 1/4,
  derandomized through the engine's portable hash so both engines
  perturb identically; the unbiased debiasing estimator
  n̂ = (k·n_rep − f·N)/(k·(1−f)) is exact integer arithmetic.
- X791 q_watermark_detect: Kirchenbauer-style green-list watermark
  detector — token t following prev is "green" iff a portable hash of
  (prev, t) falls in the γ = 1/4 band; per-doc z-score of the green
  fraction, per-language calibration readout.  On unwatermarked text
  the z distribution must center on 0 — the null-calibration audit a
  detector ships with.
- X792 q_matryoshka_audit: retrieval-quality cost of truncating
  embeddings to their first 16 dims (the MRL deployment question):
  exact top-5 under the full 64-dim cosine vs top-5 under the 16-dim
  prefix for a FIXED-SIZE query sample (64 queries — the
  q_ann_ivf_recall capped-sample rule, keeping the audit linear in
  the corpus), reporting overlap@5 and rank-1 agreement.

Determinism: hashes are the portable md5-derived integers; counts
are exact; z-scores and overlaps are computed from exact integers
with identical double expressions, rounded before comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions import text as textfn
from ..functions import vectors as _vec
from ..functions.hashing import token_hash, token_hash_sql
from ..sources.tables import load
from .registry import query

# ---------------------------------------------------------------------------
# X790 — k-ary randomized-response frequency estimation (local DP)
# ---------------------------------------------------------------------------

_RR_FNUM, _RR_FDEN = 1, 4  # flip probability f = 1/4

_RR_ORACLE = f"""
    WITH types AS (
      SELECT event_type AS et,
             row_number() OVER (ORDER BY event_type) - 1 AS tix
      FROM (SELECT DISTINCT event_type FROM events)),
    k AS (SELECT count(*) AS k FROM types),
    coin AS (
      SELECT e.event_id, e.event_type,
             {token_hash_sql("CAST(e.event_id AS VARCHAR) || '|rr1'")}
               % {_RR_FDEN} AS flip,
             {token_hash_sql("CAST(e.event_id AS VARCHAR) || '|rr2'")}
               AS pick
      FROM events e),
    reported AS (
      SELECT c.event_id,
             CASE WHEN c.flip <> 0 THEN c.event_type
                  ELSE (SELECT t.et FROM types t, k
                        WHERE t.tix = c.pick % k.k) END AS rep
      FROM coin c),
    nrep AS (SELECT rep AS et, count(*) AS n_rep FROM reported GROUP BY 1),
    ntrue AS (SELECT event_type AS et, count(*) AS n_true
              FROM events GROUP BY 1),
    tot AS (SELECT count(*) AS nn FROM events)
    SELECT t.et AS event_type,
           CAST(r.n_rep AS BIGINT) AS n_reported,
           CAST(t.n_true AS BIGINT) AS n_true,
           round(({_RR_FDEN}.0 * k.k * r.n_rep - tot.nn * k.k
                  * {_RR_FNUM}.0 / k.k)
                 / ({_RR_FDEN}.0 * k.k - {_RR_FNUM}.0 * k.k), 4)
             AS n_estimated
    FROM ntrue t JOIN nrep r ON r.et = t.et, k, tot
    ORDER BY event_type
    """


@query("q_rr_frequency", oracle=_RR_ORACLE)
def q_rr_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X790 — generalized randomized response (k-ary, flip prob
    f = {_RR_FNUM}/{_RR_FDEN}): the local-DP frequency-estimation
    primitive — each event reports its true stream with probability
    1−f, otherwise a uniformly hashed symbol, and the collector
    debiases with n̂(v) = (n_rep(v) − N·f/k)/(1−f).  Derandomized
    through the portable hash so the gate replays the identical
    perturbation; the output carries reported, true, and debiased
    counts side by side — the estimator-calibration audit.

    Exactness: coin and pick are portable hash residues; counts are
    exact; the debias formula is one rational expression over exact
    integers, rounded 4 dp.

    Scale: two map-side hash projections + one count shuffle; the
    type dimension broadcasts."""
    ev = load(spark, sf_dir, "events")
    types = (
        ev.select(F.col("event_type").alias("et"))
        .distinct()
        .withColumn(
            "tix", F.row_number().over(W.orderBy("et")) - 1
        )
    )
    k = types.count()
    n_total = ev.count()
    coin = ev.select(
        "event_id",
        "event_type",
        (
            token_hash(F.concat(F.col("event_id").cast("string"), F.lit("|rr1")))
            % _RR_FDEN
        ).alias("flip"),
        (
            token_hash(F.concat(F.col("event_id").cast("string"), F.lit("|rr2")))
            % k
        ).alias("tix"),
    )
    reported = (
        coin.join(F.broadcast(types), "tix")
        .select(
            F.when(F.col("flip") != 0, F.col("event_type"))
            .otherwise(F.col("et"))
            .alias("rep")
        )
        .groupBy(F.col("rep").alias("et"))
        .agg(F.count("*").alias("n_rep"))
    )
    ntrue = ev.groupBy(F.col("event_type").alias("et")).agg(
        F.count("*").alias("n_true")
    )
    est = (
        F.lit(float(_RR_FDEN)) * k * F.col("n_rep")
        - F.lit(float(n_total)) * k * _RR_FNUM / k
    ) / (F.lit(float(_RR_FDEN)) * k - F.lit(float(_RR_FNUM)) * k)
    return (
        ntrue.join(reported, "et")
        .select(
            F.col("et").alias("event_type"),
            F.col("n_rep").cast("long").alias("n_reported"),
            F.col("n_true").cast("long").alias("n_true"),
            F.round(est, 4).alias("n_estimated"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# X791 — green-list watermark detection (null-calibration audit)
# ---------------------------------------------------------------------------

_WM_GAMMA_NUM, _WM_GAMMA_DEN = 1, 4  # green-list fraction γ = 1/4
_WM_MIN_TOKENS = 20
_WM_Z_FLAG = 4.0

_WM_ORACLE = f"""
    WITH tok AS MATERIALIZED (
      SELECT doc_id, lang, {textfn.tokens_sql('lower(text)')} AS t
      FROM documents WHERE len({textfn.tokens_sql('lower(text)')})
        >= {_WM_MIN_TOKENS}),
    post AS MATERIALIZED (
      SELECT doc_id, lang, unnest(t) AS term,
             unnest(range(1, len(t) + 1)) AS pos, t
      FROM tok),
    bg AS (
      SELECT doc_id, lang,
             CASE WHEN ({token_hash_sql(
                 "t[pos - 1] || '#wm#' || term")})
                  % {_WM_GAMMA_DEN} < {_WM_GAMMA_NUM}
                  THEN 1 ELSE 0 END AS green
      FROM post WHERE pos >= 2),
    per_doc AS (
      SELECT doc_id, lang, sum(green) AS g, count(*) AS nt
      FROM bg GROUP BY 1, 2),
    z AS (
      SELECT doc_id, lang,
             CAST(round(1000000.0 * (g - nt * {_WM_GAMMA_NUM}.0
                    / {_WM_GAMMA_DEN})
                  / sqrt(nt * ({_WM_GAMMA_NUM}.0 / {_WM_GAMMA_DEN})
                         * (1 - {_WM_GAMMA_NUM}.0 / {_WM_GAMMA_DEN})))
               AS BIGINT) AS z6
      FROM per_doc)
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(sum(z6) AS DOUBLE) / count(*) / 1e6, 6) AS mean_z,
           round(CAST(max(z6) AS DOUBLE) / 1e6, 6) AS max_z,
           CAST(sum(CASE WHEN z6 > {int(_WM_Z_FLAG * 1e6)} THEN 1
                    ELSE 0 END) AS BIGINT) AS n_flagged
    FROM z GROUP BY lang ORDER BY lang
    """


@query("q_watermark_detect", oracle=_WM_ORACLE)
def q_watermark_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X791 — green-list LLM-watermark detector (Kirchenbauer et al.
    2023): token t following prev is GREEN iff a portable hash of
    (prev, t) lands in the γ = {_WM_GAMMA_NUM}/{_WM_GAMMA_DEN} band;
    per-doc z = (g − γn)/√(nγ(1−γ)), flagged above z = {_WM_Z_FLAG}.
    Run over an unwatermarked corpus this is the detector's
    NULL-CALIBRATION audit: mean z per language must sit near 0 and
    nothing should flag — the false-positive budget a deployment
    certifies before filtering any crawl against model-generated
    text.

    Exactness: green membership is a portable hash residue; g and n
    are exact integers; z quantizes 1e-6 per doc before the language
    mean.

    Scale: one explode + map-side hash + doc rollup — postings-linear,
    no joins."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "lang", textfn.tokens(F.lower(F.col("text"))).alias("t")
    ).filter(F.size("t") >= _WM_MIN_TOKENS)
    post = tok.select(
        "doc_id",
        "lang",
        F.posexplode("t").alias("p0", "term"),
        F.col("t"),
    ).filter(F.col("p0") >= 1)
    gamma = _WM_GAMMA_NUM / _WM_GAMMA_DEN
    green = post.select(
        "doc_id",
        "lang",
        (
            token_hash(
                F.concat(
                    F.element_at("t", F.col("p0").cast("int")),
                    F.lit("#wm#"),
                    F.col("term"),
                )
            )
            % _WM_GAMMA_DEN
            < _WM_GAMMA_NUM
        )
        .cast("int")
        .alias("green"),
    )
    per_doc = green.groupBy("doc_id", "lang").agg(
        F.sum("green").alias("g"), F.count("*").alias("nt")
    )
    z6 = F.round(
        F.lit(1e6)
        * (F.col("g") - F.col("nt") * gamma)
        / F.sqrt(F.col("nt") * gamma * (1 - gamma))
    ).cast("long")
    z = per_doc.select("doc_id", "lang", z6.alias("z6"))
    return (
        z.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.sum("z6").cast("double") / F.count("*") / 1e6, 6).alias(
                "mean_z"
            ),
            F.round(F.max("z6").cast("double") / 1e6, 6).alias("max_z"),
            F.sum(
                (F.col("z6") > int(_WM_Z_FLAG * 1e6)).cast("int")
            )
            .cast("long")
            .alias("n_flagged"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# X792 — matryoshka-truncation retrieval audit
# ---------------------------------------------------------------------------

_MAT_PREFIX = 16
_MAT_K = 5
_MAT_NQ = 64  # fixed-size query sample (the capped-audit rule)

_MAT_ORACLE = f"""
    WITH corpus AS (
      SELECT vec_id AS n_id, embedding AS emb FROM embeddings),
    qs AS (
      SELECT q_id, q_emb FROM (
        SELECT vec_id AS q_id, embedding AS q_emb,
               row_number() OVER (ORDER BY vec_id) AS qrn
        FROM embeddings WHERE vec_id % 17 = 3)
      WHERE qrn <= {_MAT_NQ}),
    full_top AS (
      SELECT q_id, n_id, rn FROM (
        SELECT q.q_id, c.n_id,
               row_number() OVER (PARTITION BY q.q_id
                 ORDER BY round({_vec.cosine_sql('q.q_emb', 'c.emb')}, 6)
                   DESC, c.n_id) AS rn
        FROM qs q CROSS JOIN corpus c WHERE c.n_id <> q.q_id)
      WHERE rn <= {_MAT_K}),
    pref_top AS (
      SELECT q_id, n_id, rn FROM (
        SELECT q.q_id, c.n_id,
               row_number() OVER (PARTITION BY q.q_id
                 ORDER BY round({_vec.cosine_sql(
                     f'q.q_emb[1:{_MAT_PREFIX}]',
                     f'c.emb[1:{_MAT_PREFIX}]')}, 6)
                   DESC, c.n_id) AS rn
        FROM qs q CROSS JOIN corpus c WHERE c.n_id <> q.q_id)
      WHERE rn <= {_MAT_K}),
    per_q AS (
      SELECT f.q_id,
             count(p.n_id) AS hits,
             max(CASE WHEN f.rn = 1 AND p.rn = 1 THEN 1 ELSE 0 END)
               AS top1
      FROM full_top f LEFT JOIN pref_top p
        ON p.q_id = f.q_id AND p.n_id = f.n_id
      GROUP BY f.q_id)
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           round(CAST(sum(hits) AS DOUBLE) / (count(*) * {_MAT_K}), 6)
             AS overlap_at_{_MAT_K},
           round(CAST(sum(top1) AS DOUBLE) / count(*), 6) AS top1_agree
    FROM per_q
    """


@query("q_matryoshka_audit", oracle=_MAT_ORACLE)
def q_matryoshka_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X792 — matryoshka-truncation retrieval audit (the MRL
    deployment question: how much recall does serving the first
    {_MAT_PREFIX} of 64 dims cost?): exact top-{_MAT_K} under the
    full cosine vs the {_MAT_PREFIX}-dim prefix cosine for a
    FIXED-SIZE {_MAT_NQ}-query sample, reporting mean overlap@{_MAT_K}
    and rank-1 agreement — the go/no-go number before switching the
    ANN tier to truncated vectors.

    The query sample is capped (row_number ≤ {_MAT_NQ} over the
    residue class) — the q_ann_ivf_recall rule that keeps a per-build
    audit LINEAR in the corpus instead of growing the query set with
    it.

    Exactness: both rankings round scores to 6 with id tie-breaks;
    overlap/agreement are exact integer ratios.

    Scale: {_MAT_NQ}·n scored pairs — one broadcast of the query
    sample against a single corpus scan, no shuffle beyond the
    per-query top-k windows."""
    emb = load(spark, sf_dir, "embeddings")
    qs = (
        emb.filter(F.col("vec_id") % 17 == 3)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
        )
        .withColumn("qrn", F.row_number().over(W.orderBy("q_id")))
        .filter(F.col("qrn") <= _MAT_NQ)
        .drop("qrn")
    )
    corpus = emb.select(
        F.col("vec_id").alias("n_id"), F.col("embedding").alias("emb")
    )
    pairs = corpus.crossJoin(F.broadcast(qs)).filter(
        F.col("n_id") != F.col("q_id")
    )
    w_q = W.partitionBy("q_id")
    full_top = (
        pairs.withColumn(
            "rn",
            F.row_number().over(
                w_q.orderBy(
                    F.desc(
                        F.round(_vec.cosine("q_emb", "emb"), 6)
                    ),
                    F.asc("n_id"),
                )
            ),
        )
        .filter(F.col("rn") <= _MAT_K)
        .select("q_id", "n_id", "rn")
    )
    pref = lambda c: F.slice(c, 1, _MAT_PREFIX)  # noqa: E731
    pref_top = (
        pairs.withColumn(
            "rn",
            F.row_number().over(
                w_q.orderBy(
                    F.desc(
                        F.round(
                            _vec.cosine(
                                f"slice(q_emb, 1, {_MAT_PREFIX})",
                                f"slice(emb, 1, {_MAT_PREFIX})",
                            ),
                            6,
                        )
                    ),
                    F.asc("n_id"),
                )
            ),
        )
        .filter(F.col("rn") <= _MAT_K)
        .select(
            F.col("q_id").alias("pq"),
            F.col("n_id").alias("pn"),
            F.col("rn").alias("prn"),
        )
    )
    per_q = (
        full_top.join(
            pref_top,
            (F.col("pq") == F.col("q_id")) & (F.col("pn") == F.col("n_id")),
            "left",
        )
        .groupBy("q_id")
        .agg(
            F.count("pn").alias("hits"),
            F.max(
                ((F.col("rn") == 1) & (F.col("prn") == 1)).cast("int")
            ).alias("top1"),
        )
    )
    return per_q.agg(
        F.count("*").alias("n_queries"),
        F.round(
            F.sum("hits").cast("double") / (F.count("*") * _MAT_K), 6
        ).alias(f"overlap_at_{_MAT_K}"),
        F.round(F.sum("top1").cast("double") / F.count("*"), 6).alias(
            "top1_agree"
        ),
    )
