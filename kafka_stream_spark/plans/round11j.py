"""Round-11 batch J (X767–X771): index-quality eval, shrinkage
estimation, robust filtering, overdispersion, diversity spectra.

Reference scope note: §2.13 mandate extensions, reference-free.

- X767 q_ann_ivf_recall: recall@k of the PERSISTED IVF index (X748's
  serving path) against exact brute-force top-k — the index-quality
  eval run after every build, ON the deployed layout rather than a
  rebuilt twin.
- X768 q_james_stein: James-Stein / empirical-Bayes shrinkage of
  per-group means toward the grand mean — the canonical fix for
  small-cell segment metrics (dominates the MLE for ≥3 groups).
- X769 q_hampel: rolling-window Hampel outlier filter (±3-day
  window, 3×MAD) over daily series — the robust despiker run before
  any forecasting model sees a metric.
- X770 q_beta_binomial: Beta-Binomial overdispersion fit (method of
  moments) for per-user conversion counts — whether conversion rates
  vary MORE than binomial across users (X-negbin's cousin for rates).
- X771 q_renyi_entropy: Rényi entropy spectrum (α = 0, 1, 2, ∞) of
  the token distribution — richness, Shannon, collision, and
  min-entropy in one profile; the diversity panel a corpus mix is
  judged by.

Determinism: counts are exact integers; c·ln c terms quantize 1e-9
before vocabulary sums (the q_taylor_law discipline); medians/MADs
select from 1e-4-quantized integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as _text
from ..operators import ann as _ann
from ..sources.tables import load
from .registry import query

# ---------------------------------------------------------------------------
# X767 — recall@k of the persisted IVF index vs exact top-k
# ---------------------------------------------------------------------------

_IR_K = 5
_IR_QMOD, _IR_QRES = 17, 3  # same serving-shaped query batch as X748
#: the recall audit uses a FIXED-SIZE query sample (the smallest
#: _IR_NQ sampled ids): production recall evals are constant-sized
#: per build, so the |Q|·n exact side stays n-linear as the corpus
#: grows (the uncapped form probed exp 1.04 at 8×)
_IR_NQ = 100

_IR_SQRT_EVERY_SQL = (
    "greatest(2, CAST(floor(sqrt(CAST((SELECT count(*) FROM corpus) "
    "AS DOUBLE))) AS BIGINT))"
)


def _ir_oracle() -> str:
    from ..functions import vectors

    cos = vectors.cosine_sql("q.q_emb", "x.emb")
    ivf = _ann.ivf_search_sql(
        "corpus", "qs", "cent", k=_IR_K, nprobe=2, prefix="ir_"
    )
    return f"""
    WITH corpus AS (
      SELECT vec_id AS n_id, embedding AS emb FROM embeddings),
    qs AS (
      SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
      WHERE vec_id % {_IR_QMOD} = {_IR_QRES}
      ORDER BY vec_id LIMIT {_IR_NQ}),
    cent AS (
      SELECT n_id AS c_id, emb AS c_emb FROM corpus
      WHERE n_id % {_IR_SQRT_EVERY_SQL} = 0),
    {ivf},
    exact AS (
      SELECT q_id, n_id FROM (
        SELECT q.q_id, x.n_id,
               row_number() OVER (PARTITION BY q.q_id
                 ORDER BY round({cos}, 6) DESC, x.n_id) AS rn
        FROM qs q CROSS JOIN corpus x WHERE x.n_id <> q.q_id)
      WHERE rn <= {_IR_K}),
    hit AS (
      SELECT e.q_id,
             CAST(count(i.n_id) AS BIGINT) AS n_hit
      FROM exact e LEFT JOIN ir_topk i
        ON i.q_id = e.q_id AND i.n_id = e.n_id
      GROUP BY e.q_id)
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           CAST(sum(n_hit) AS BIGINT) AS n_hits,
           round(sum(n_hit) * 1.0 / (count(*) * {_IR_K}), 6)
             AS recall_at_{_IR_K}
    FROM hit
    """


@query("q_ann_ivf_recall", oracle=_ir_oracle())
def q_ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X767 — recall@{_IR_K} of the persisted IVF index: the serving
    path's answers (X748's ivf_search_indexed, read from the on-disk
    layout) measured against exact brute-force top-{_IR_K} — the
    index-quality number every ANN deployment tracks per build, here
    evaluated ON the deployed index rather than an inline rebuild
    (q_ann_recall's form).  The hash gate pins search AND measurement.

    Scale: the exact side is |Q|·n and exists to MEASURE the index —
    serving itself never runs it; the eval runs on a query sample at
    build time, the standard recall-audit protocol."""
    from .round11 import ensure_embedding_index

    idx = ensure_embedding_index(spark, sf_dir)
    emb = load(spark, sf_dir, "embeddings")
    qs = (
        emb.filter(F.col("vec_id") % _IR_QMOD == _IR_QRES)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
        )
        .orderBy("q_id")
        .limit(_IR_NQ)
    )
    served = _ann.ivf_search_indexed(spark, idx, qs, k=_IR_K, nprobe=2)
    from ..session import default_parallelism

    # the exact brute-force side (|Q|·n cosines) would otherwise run on
    # the single scan split (guide §2.6)
    corpus = emb.repartition(default_parallelism()).select(
        F.col("vec_id").alias("n_id"), F.col("embedding").alias("emb")
    )
    from pyspark.sql.window import Window as W

    from ..functions import vectors as _vec

    scored = F.broadcast(qs).crossJoin(corpus).filter(
        F.col("n_id") != F.col("q_id")
    ).withColumn(
        "score", F.round(_vec.cosine("q_emb", "emb"), 6)
    )
    exact = (
        scored.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("q_id").orderBy(F.desc("score"), "n_id")
            ),
        )
        .filter(F.col("rn") <= _IR_K)
        .select("q_id", "n_id")
    )
    sv = served.select(
        F.col("q_id").alias("sq_id"), F.col("n_id").alias("s_id")
    )
    hit = (
        exact.join(
            sv,
            (F.col("q_id") == F.col("sq_id"))
            & (F.col("n_id") == F.col("s_id")),
            "left",
        )
        .groupBy("q_id")
        .agg(F.count("s_id").alias("n_hit"))
    )
    return hit.agg(
        F.count("*").cast("long").alias("n_queries"),
        F.sum("n_hit").cast("long").alias("n_hits"),
        F.round(
            F.sum("n_hit") * 1.0 / (F.count("*") * _IR_K), 6
        ).alias(f"recall_at_{_IR_K}"),
    )


# ---------------------------------------------------------------------------
# X768 — James-Stein shrinkage of per-group means
# ---------------------------------------------------------------------------

_JS_MOD = 50  # groups = customer key bands

_JS_ORACLE = f"""
    WITH g AS (
      SELECT c_custkey % {_JS_MOD} AS grp,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
      FROM customer),
    per AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(bal_c) AS HUGEINT) AS s,
             CAST(sum(bal_c * bal_c) AS HUGEINT) AS s2
      FROM g GROUP BY grp),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(s) AS HUGEINT) AS st,
             CAST(sum(n) AS HUGEINT) AS nt,
             avg(CAST(s AS DOUBLE) / n) AS mbar,
             sum((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                 / (n - 1) / n) / count(*) AS vbar,
             sum((CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
               AS sq
      FROM per),
    dev AS (
      SELECT sum((CAST(p.s AS DOUBLE) / p.n - t.mbar)
                 * (CAST(p.s AS DOUBLE) / p.n - t.mbar)) AS ssd
      FROM per p CROSS JOIN tot t),
    shrink AS (
      SELECT greatest(0.0, 1 - (t.k - 3) * t.vbar / d.ssd) AS b, t.mbar
      FROM tot t CROSS JOIN dev d)
    SELECT p.grp, p.n,
           round(CAST(p.s AS DOUBLE) / p.n / 100.0, 4) AS mle_mean,
           round((sh.mbar + sh.b * (CAST(p.s AS DOUBLE) / p.n - sh.mbar))
                 / 100.0, 4) AS js_mean,
           round(sh.b, 6) AS shrink_weight
    FROM per p CROSS JOIN shrink sh
    ORDER BY p.grp
    """


@query("q_james_stein", oracle=_JS_ORACLE)
def q_james_stein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X768 — James-Stein / empirical-Bayes shrinkage of per-group
    means toward the grand mean: ĵ_g = m̄ + b·(m_g − m̄) with
    b = max(0, 1 − (k−3)·v̄ / Σ(m_g − m̄)²) — the estimator that
    DOMINATES the per-group MLE for k ≥ 3 groups (Stein's paradox),
    and the standard fix for small-cell segment dashboards where raw
    per-cell means are mostly noise.  v̄ is the mean squared standard
    error of a group mean.

    Exactness: balances quantize to integer cents; all moments are
    exact int128 sums; the shrink weight and outputs are closed-form
    doubles from identical integers.

    Scale: one combinable groupBy to k cells + one broadcast scalar."""
    g = load(spark, sf_dir, "customer").select(
        (F.col("c_custkey") % _JS_MOD).alias("grp"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"),
    )
    dec = "decimal(38,0)"
    per = g.groupBy("grp").agg(
        F.count("*").alias("n"),
        F.sum(F.col("bal_c").cast(dec)).alias("s"),
        F.sum((F.col("bal_c") * F.col("bal_c")).cast(dec)).alias("s2"),
    )
    m = F.col("s").cast("double") / F.col("n")
    tot = per.agg(
        F.count("*").alias("k"),
        F.avg(m).alias("mbar"),
        F.avg(
            (
                F.col("s2").cast("double")
                - F.col("s").cast("double") * F.col("s").cast("double")
                / F.col("n")
            )
            / (F.col("n") - 1)
            / F.col("n")
        ).alias("vbar"),
    )
    dev = per.crossJoin(F.broadcast(tot)).agg(
        F.sum((m - F.col("mbar")) * (m - F.col("mbar"))).alias("ssd")
    )
    shrink = (
        tot.crossJoin(F.broadcast(dev))
        .select(
            F.greatest(
                F.lit(0.0),
                1 - (F.col("k") - 3) * F.col("vbar") / F.col("ssd"),
            ).alias("b"),
            "mbar",
        )
    )
    return (
        per.crossJoin(F.broadcast(shrink))
        .select(
            "grp",
            F.col("n").cast("long").alias("n"),
            F.round(m / 100.0, 4).alias("mle_mean"),
            F.round(
                (F.col("mbar") + F.col("b") * (m - F.col("mbar"))) / 100.0,
                4,
            ).alias("js_mean"),
            F.round("b", 6).alias("shrink_weight"),
        )
        .orderBy("grp")
    )


# ---------------------------------------------------------------------------
# X769 — rolling Hampel outlier filter
# ---------------------------------------------------------------------------

_HAM_W = 3  # +- days
_HAM_T = 3.0  # MAD multiples

_HAM_ORACLE = f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(round(sum(value) * 10000) AS BIGINT) AS yq
      FROM events GROUP BY 1, 2),
    w AS (
      SELECT event_type, d, yq,
             CAST(round(median(yq) OVER (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN {_HAM_W} PRECEDING AND {_HAM_W} FOLLOWING))
               AS BIGINT) AS med
      FROM daily),
    m AS (
      SELECT event_type, d, yq, med,
             CAST(round(median(abs(yq - med)) OVER (PARTITION BY event_type
               ORDER BY d ROWS BETWEEN {_HAM_W} PRECEDING
               AND {_HAM_W} FOLLOWING)) AS BIGINT) AS mad
      FROM w)
    SELECT event_type, d,
           round(yq / 10000.0, 4) AS y,
           round(med / 10000.0, 4) AS rolling_median,
           CAST(abs(yq - med) > {_HAM_T} * 1.4826 * mad AS BIGINT)
             AS is_outlier,
           round(CASE WHEN abs(yq - med) > {_HAM_T} * 1.4826 * mad
                 THEN med ELSE yq END / 10000.0, 4) AS filtered
    FROM m ORDER BY event_type, d
    """


@query("q_hampel", oracle=_HAM_ORACLE)
def q_hampel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X769 — rolling Hampel filter (±{_HAM_W}-day window, {_HAM_T}×
    scaled MAD): flag and replace spikes with the rolling median — the
    robust despiker run on every metric before a forecaster sees it
    (unlike a global z-score, it adapts to level shifts; unlike
    smoothing, it leaves non-outliers untouched).  Note the MAD here
    is the rolling median absolute deviation AROUND the rolling
    median, the textbook Hampel identifier.

    Exactness: daily sums quantize to 1e-4 integers; medians select
    from those integers (rounded to integer after the odd/even-window
    midpoint average), so both engines pick identical values.

    Scale: day-grain windows per stream — series length is
    calendar-bounded regardless of event volume."""
    from pyspark.sql.window import Window as W

    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.to_date(F.date_trunc("day", "ts")).alias("d"),
        )
        .agg(F.round(F.sum("value") * 10000).cast("long").alias("yq"))
    )
    wroll = (
        W.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-_HAM_W, _HAM_W)
    )
    w = daily.withColumn(
        "med",
        F.round(F.expr("percentile(yq, 0.5)").over(wroll)).cast("long"),
    )
    m = w.withColumn(
        "mad",
        F.round(
            F.expr("percentile(abs(yq - med), 0.5)").over(wroll)
        ).cast("long"),
    )
    is_out = F.abs(F.col("yq") - F.col("med")) > _HAM_T * 1.4826 * F.col(
        "mad"
    )
    return m.select(
        "event_type",
        "d",
        F.round(F.col("yq") / 10000.0, 4).alias("y"),
        F.round(F.col("med") / 10000.0, 4).alias("rolling_median"),
        is_out.cast("long").alias("is_outlier"),
        F.round(
            F.when(is_out, F.col("med")).otherwise(F.col("yq")) / 10000.0,
            4,
        ).alias("filtered"),
    ).orderBy("event_type", "d")


# ---------------------------------------------------------------------------
# X770 — Beta-Binomial overdispersion fit (method of moments)
# ---------------------------------------------------------------------------

_BB_ORACLE = """
    WITH u AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x
      FROM events GROUP BY user_id),
    f AS (SELECT * FROM u WHERE n >= 5),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             avg(CAST(x AS DOUBLE) / n) AS p1,
             avg((CAST(x AS DOUBLE) / n) * (CAST(x AS DOUBLE) / n)) AS p2,
             avg(CAST(n AS DOUBLE)) AS nbar
      FROM f),
    fit AS (
      SELECT k, p1, nbar,
             (p2 - p1 * p1) AS vhat,
             p1 * (1 - p1) AS vbin,
             CASE WHEN p2 - p1 * p1 > p1 * (1 - p1) / nbar THEN
               (p1 * (1 - p1) - (p2 - p1 * p1))
               / ((p2 - p1 * p1) - p1 * (1 - p1) / nbar)
             ELSE 0.0 END AS s
      FROM mom)
    SELECT k AS n_users, round(p1, 6) AS mean_rate,
           round(vhat, 6) AS var_rate,
           round(vbin / nbar, 6) AS var_binomial,
           round(CASE WHEN s > 0 THEN p1 * s ELSE 0 END, 6) AS alpha,
           round(CASE WHEN s > 0 THEN (1 - p1) * s ELSE 0 END, 6) AS beta,
           CAST(vhat > vbin / nbar AS BIGINT) AS overdispersed
    FROM fit
    """


@query("q_beta_binomial", oracle=_BB_ORACLE)
def q_beta_binomial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X770 — Beta-Binomial overdispersion fit for per-user conversion
    rates (method of moments): do users' purchase rates vary MORE than
    one shared binomial p allows?  If the empirical variance of per-
    user rates exceeds the binomial p(1−p)/n̄, fit Beta(α, β) by
    moments (s = α+β from the variance ratio) — the gate before
    trusting a pooled conversion metric, and X-negbin's cousin for
    rates instead of counts.

    Scale: one user-grain rollup (combinable) + one scalar fit."""
    u = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("x"),
        )
        .filter(F.col("n") >= 5)
    )
    r = F.col("x").cast("double") / F.col("n")
    mom = u.agg(
        F.count("*").alias("k"),
        F.avg(r).alias("p1"),
        F.avg(r * r).alias("p2"),
        F.avg(F.col("n").cast("double")).alias("nbar"),
    )
    vhat = F.col("p2") - F.col("p1") * F.col("p1")
    vbin = F.col("p1") * (1 - F.col("p1"))
    s = F.when(
        vhat > vbin / F.col("nbar"),
        (vbin - vhat) / (vhat - vbin / F.col("nbar")),
    ).otherwise(F.lit(0.0))
    return mom.select(
        F.col("k").cast("long").alias("n_users"),
        F.round("p1", 6).alias("mean_rate"),
        F.round(vhat, 6).alias("var_rate"),
        F.round(vbin / F.col("nbar"), 6).alias("var_binomial"),
        F.round(
            F.when(s > 0, F.col("p1") * s).otherwise(0.0), 6
        ).alias("alpha"),
        F.round(
            F.when(s > 0, (1 - F.col("p1")) * s).otherwise(0.0), 6
        ).alias("beta"),
        (vhat > vbin / F.col("nbar")).cast("long").alias("overdispersed"),
    )


# ---------------------------------------------------------------------------
# X771 — Rényi entropy spectrum of the token distribution
# ---------------------------------------------------------------------------

_RENYI_ORACLE = f"""
    WITH cnt AS (
      SELECT u.tok, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT {_text.tokens_sql('text')} AS t FROM documents),
           unnest(t) AS u(tok)
      GROUP BY u.tok),
    tot AS (SELECT CAST(sum(c) AS HUGEINT) AS n,
                   CAST(count(*) AS BIGINT) AS v,
                   CAST(max(c) AS BIGINT) AS cmax,
                   CAST(sum(c * c) AS HUGEINT) AS c2 FROM cnt),
    sh AS (
      SELECT CAST(sum(CAST(round(c * ln(c) * 1000000000) AS HUGEINT))
                  AS DOUBLE) / 1e9 AS sclc
      FROM cnt)
    SELECT t.v AS vocab_size,
           CAST(t.n AS BIGINT) AS n_tokens,
           round(ln(t.v), 6) AS h0_hartley,
           round(ln(CAST(t.n AS DOUBLE)) - sh.sclc / CAST(t.n AS DOUBLE), 6)
             AS h1_shannon,
           round(-ln(CAST(t.c2 AS DOUBLE)
                 / (CAST(t.n AS DOUBLE) * CAST(t.n AS DOUBLE))), 6)
             AS h2_collision,
           round(-ln(CAST(t.cmax AS DOUBLE) / CAST(t.n AS DOUBLE)), 6)
             AS hinf_min
    FROM tot t CROSS JOIN sh
    """


@query("q_renyi_entropy", oracle=_RENYI_ORACLE)
def q_renyi_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X771 — Rényi entropy spectrum of the corpus token distribution:
    H₀ = ln V (richness/Hartley), H₁ = Shannon, H₂ = −ln Σp²
    (collision entropy — the log-inverse of the unigram collision
    rate that drives exact-dup hash load), H∞ = −ln p_max
    (min-entropy — worst-case predictability).  The spectrum's decay
    H₀ ≫ H∞ diagnoses head-heaviness a single Shannon number hides —
    the diversity panel for judging a corpus mix.

    Exactness: counts are exact integers; c·ln c quantizes 1e-9 before
    the vocabulary sum; Σc² accumulates int128.

    Scale: one token-count shuffle (map-side combine) into a
    vocabulary-sized rollup; the spectrum is four scalars."""
    cnt = (
        load(spark, sf_dir, "documents")
        .select(F.explode(_text.tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    dec = "decimal(38,0)"
    tot = cnt.agg(
        F.sum(F.col("c").cast(dec)).alias("n"),
        F.count("*").alias("v"),
        F.max("c").alias("cmax"),
        F.sum((F.col("c") * F.col("c")).cast(dec)).alias("c2"),
        (
            F.sum(
                F.round(F.col("c") * F.log("c") * 1e9).cast(dec)
            ).cast("double")
            / 1e9
        ).alias("sclc"),
    )
    n = F.col("n").cast("double")
    return tot.select(
        F.col("v").cast("long").alias("vocab_size"),
        F.col("n").cast("long").alias("n_tokens"),
        F.round(F.log(F.col("v").cast("double")), 6).alias("h0_hartley"),
        F.round(F.log(n) - F.col("sclc") / n, 6).alias("h1_shannon"),
        F.round(
            -F.log(F.col("c2").cast("double") / (n * n)), 6
        ).alias("h2_collision"),
        F.round(
            -F.log(F.col("cmax").cast("double") / n), 6
        ).alias("hinf_min"),
    )
