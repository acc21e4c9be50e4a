"""Round-10 batch G (X745): MoE routing telemetry.

Reference scope note: §2.13 mandate extensions, reference-free.

- X745 q_moe_balance: Switch-Transformer load-balance audit — expert
  token shares, mean gate probabilities, and the auxiliary balance
  loss E·Σ f_e·P̄_e.

Determinism contract as the other round-10 batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.hashing import token_hash, token_hash_sql
from ..functions import text as _text
from ..sources.tables import load
from .registry import query
from .round9b import _half_up_col, _half_up_sql

# ---------------------------------------------------------------------------
# X745 — MoE (Switch) load-balance audit
# ---------------------------------------------------------------------------

_MOE_E = 8  # experts


def _moe_logit_sql(e: str, tok: str) -> str:
    inner = f"concat({tok}, '#', CAST({e} AS VARCHAR))"
    return f"(({token_hash_sql(inner)}) % 2001 - 1000)"


_MOE_ORACLE = f"""
    WITH cnt AS (
      SELECT u.tok, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT {_text.tokens_sql('text')} AS t FROM documents),
           unnest(t) AS u(tok)
      GROUP BY u.tok),
    lg AS (
      SELECT cnt.tok, cnt.c, e.e,
             {_moe_logit_sql('e.e', 'cnt.tok')} AS l3
      FROM cnt CROSS JOIN (SELECT unnest(range({_MOE_E})) AS e) e),
    sm AS (
      SELECT tok, c, e, l3,
             CAST(round(1000000.0 * exp(l3 / 1000.0)
                  / sum(exp(l3 / 1000.0)) OVER (PARTITION BY tok))
                  AS BIGINT) AS p6,
             row_number() OVER (PARTITION BY tok
                                ORDER BY l3 DESC, e) AS rk
      FROM lg),
    per AS (
      SELECT e,
             sum(CASE WHEN rk = 1 THEN c ELSE 0 END) AS routed,
             sum(c * p6) AS pw,
             sum(c) AS n
      FROM sm GROUP BY e),
    tot AS (SELECT sum(routed) AS nt FROM per)
    SELECT CAST(p.e AS BIGINT) AS expert,
           CAST(p.routed AS BIGINT) AS n_tokens,
           {_half_up_sql('1000000 * p.routed', 't.nt')} / 1000000.0
             AS token_share,
           {_half_up_sql('p.pw', 'p.n')} / 1000000.0 AS mean_gate,
           {_half_up_sql(
               str(_MOE_E)
               + ' * sum(' + _half_up_sql('1000000 * p.routed', 't.nt')
               + ' * ' + _half_up_sql('p.pw', 'p.n')
               + ') OVER ()', '1000000')} / 1000000.0 AS aux_loss
    FROM per p CROSS JOIN tot t
    ORDER BY p.e
    """


@query("q_moe_balance", oracle=_MOE_ORACLE)
def q_moe_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X745 — mixture-of-experts load-balance audit (Shazeer 2017 /
    Switch Transformer): for a top-1 token router, the telemetry every
    MoE trainer watches — per-expert routed token share f_e, mean gate
    probability P̄_e, and the auxiliary loss E·Σ f_e·P̄_e (= 1 under
    perfect balance; > 1 signals expert collapse, the failure mode the
    aux loss penalizes). The router is a deterministic hash logit per
    (token type, expert) with softmax over E = {_MOE_E}; routing by
    integer-logit argmax (tiebreak expert id).

    Spark-first: the work runs on token TYPES with counts (one
    combinable vocab aggregate), not token instances — softmax rows =
    vocab × E regardless of corpus size. Per-(type, expert) softmax
    probabilities are libm on identical integer logits, quantized
    micro before count-weighted sums (X708 discipline).

    Scale: explode + vocab-sized count, then vocab × E cells; final
    state is E rows."""
    docs = load(spark, sf_dir, "documents")
    cnt = (
        docs.select(F.explode(_text.tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("c"))
    )
    edf = spark.range(_MOE_E).select(F.col("id").cast("int").alias("e"))
    lg = cnt.crossJoin(F.broadcast(edf)).select(
        "tok",
        "c",
        "e",
        (
            token_hash(
                F.concat(F.col("tok"), F.lit("#"), F.col("e").cast("string"))
            )
            % 2001
            - 1000
        ).alias("l3"),
    )
    wtok = W.partitionBy("tok")
    sm = lg.select(
        "tok",
        "c",
        "e",
        "l3",
        F.round(
            1000000.0
            * F.exp(F.col("l3") / 1000.0)
            / F.sum(F.exp(F.col("l3") / 1000.0)).over(wtok),
        )
        .cast("long")
        .alias("p6"),
        F.row_number().over(wtok.orderBy(F.desc("l3"), "e")).alias("rk"),
    )
    per = sm.groupBy("e").agg(
        F.sum(F.when(F.col("rk") == 1, F.col("c")).otherwise(0)).alias(
            "routed"
        ),
        F.sum(F.col("c") * F.col("p6")).alias("pw"),
        F.sum("c").alias("n"),
    )
    nt = per.agg(F.sum("routed")).collect()[0][0]
    share6 = _half_up_col("1000000 * routed", str(nt))
    gate6 = _half_up_col("pw", "n")
    wall = W.orderBy("e").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    scored = per.select(
        F.col("e").cast("long").alias("expert"),
        F.col("routed").cast("long").alias("n_tokens"),
        share6.alias("share6"),
        gate6.alias("gate6"),
    )
    return scored.select(
        "expert",
        "n_tokens",
        (F.col("share6") / 1000000.0).alias("token_share"),
        (F.col("gate6") / 1000000.0).alias("mean_gate"),
        (
            _half_up_col(
                f"{_MOE_E} * sum(share6 * gate6) OVER "
                "(ORDER BY expert ROWS BETWEEN UNBOUNDED PRECEDING "
                "AND UNBOUNDED FOLLOWING)",
                "1000000",
            )
            / 1000000.0
        ).alias("aux_loss"),
    ).orderBy("expert")


# ---------------------------------------------------------------------------
# X746 — instruction-likeness mining (SFT data discovery)
# ---------------------------------------------------------------------------

_IM_VERBS = (
    "write", "explain", "describe", "list", "create", "make",
    "find", "give", "show", "tell", "summarize", "compare",
    # imperative data-verbs (tech-prose imperatives: "join the rows",
    # "filter the table", ...)
    "scan", "filter", "join", "merge", "sort", "group", "select",
    "count",
)
_IM_MIN_SCORE = 3


def _im_verbs_sql() -> str:
    return ", ".join(f"'{v}'" for v in _IM_VERBS)


_IM_ORACLE = f"""
    WITH feats AS (
      SELECT source,
             CASE WHEN lower(t[1]) IN ({_im_verbs_sql()})
                  THEN 1 ELSE 0 END AS starts_imp,
             CASE WHEN length(text) - length(replace(text, '?', '')) > 0
                  THEN 1 ELSE 0 END AS has_q,
             CASE WHEN len(regexp_extract_all(text, '[0-9]+\\.')) >= 2
                  THEN 1 ELSE 0 END AS numbered,
             len(list_filter(t, x -> lower(x) IN ({_im_verbs_sql()})))
               AS n_imp,
             len(t) AS n_tok
      FROM (SELECT source, text, {{toks}} AS t FROM documents)
      WHERE len(t) > 0),
    scored AS (
      SELECT source,
             3 * starts_imp + 2 * has_q + 2 * numbered
             + CAST({{dens}} AS BIGINT) AS score
      FROM feats)
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN score >= {_IM_MIN_SCORE} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_instruction_like,
           {{share}} / 1000000.0 AS share,
           {{mean}} / 1000000.0 AS mean_score
    FROM scored GROUP BY source ORDER BY source
    """


def _im_oracle() -> str:
    from ..functions import text as _t

    return _IM_ORACLE.format(
        toks=_t.tokens_sql("text"),
        dens=_half_up_sql("10 * 1000000 * n_imp", "1000000 * n_tok"),
        share=_half_up_sql(
            "1000000 * sum(CASE WHEN score >= " + str(_IM_MIN_SCORE)
            + " THEN 1 ELSE 0 END)",
            "count(*)",
        ),
        mean=_half_up_sql("1000000 * sum(score)", "count(*)"),
    )


@query("q_instruction_mining", oracle=_im_oracle())
def q_instruction_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X746 — instruction-likeness mining: the cheap heuristic pass
    that discovers SFT-able documents inside a web corpus (the
    longform-QA / instruction-mining recipe: imperative opener,
    question marks, numbered-list structure, imperative-verb density)
    — the step BEFORE an expensive classifier, sizing each source's
    instruction-data yield. Score = 3·starts_imperative + 2·has_? +
    2·numbered_list + round(10·imperative_density); a doc is
    instruction-like at score ≥ {_IM_MIN_SCORE}.

    Determinism: all features are integer counts/regex matches; the
    density contribution is one half-up integer ratio; shares and
    means are half-up micro.

    Scale: one projection with a token slice + regexp counts (no
    pairwise anything) + a combinable per-source rollup."""
    docs = load(spark, sf_dir, "documents")
    t = _text.tokens(F.col("text"))
    verbs = list(_IM_VERBS)
    feats = docs.select(
        "source",
        F.lower(F.element_at(t, 1)).isin(verbs).cast("int").alias(
            "starts_imp"
        ),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", r"\?", ""))
            > 0
        )
        .cast("int")
        .alias("has_q"),
        (
            F.size(F.expr(r"regexp_extract_all(text, '[0-9]+\\.', 0)")) >= 2
        )
        .cast("int")
        .alias("numbered"),
        F.size(
            F.filter(t, lambda x: F.lower(x).isin(verbs))
        ).alias("n_imp"),
        F.size(t).alias("n_tok"),
    ).filter(F.col("n_tok") > 0)
    scored = feats.select(
        "source",
        (
            3 * F.col("starts_imp")
            + 2 * F.col("has_q")
            + 2 * F.col("numbered")
            + _half_up_col("10 * 1000000 * n_imp", "1000000 * n_tok")
        ).alias("score"),
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(
                F.when(F.col("score") >= _IM_MIN_SCORE, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_instruction_like"),
            (
                _half_up_col(
                    "1000000 * sum(CASE WHEN score >= "
                    + str(_IM_MIN_SCORE)
                    + " THEN 1 ELSE 0 END)",
                    "count(*)",
                )
                / 1000000.0
            ).alias("share"),
            (
                _half_up_col("1000000 * sum(score)", "count(*)") / 1000000.0
            ).alias("mean_score"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# X747 — held-out n-gram novelty / OOV rate
# ---------------------------------------------------------------------------

_NV_HOLD = 5  # doc_id % 5 == 0 → held out (the X737 split)

_NV_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, lang, {{toks}} AS t FROM documents),
    tr_uni AS (
      SELECT lang, u.tok FROM toks, unnest(t) AS u(tok)
      WHERE doc_id % {_NV_HOLD} <> 0 GROUP BY lang, u.tok),
    tr_bi AS (
      SELECT lang, h, w
      FROM (SELECT lang, t[CAST(i + 1 AS INT)] AS h,
                   t[CAST(i + 2 AS INT)] AS w
            FROM toks, unnest(range(len(t) - 1)) AS r(i)
            WHERE doc_id % {_NV_HOLD} <> 0)
      GROUP BY lang, h, w),
    te_uni AS (
      SELECT lang, u.tok, CAST(count(*) AS BIGINT) AS c
      FROM toks, unnest(t) AS u(tok)
      WHERE doc_id % {_NV_HOLD} = 0 GROUP BY lang, u.tok),
    te_bi AS (
      SELECT lang, h, w, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT lang, t[CAST(i + 1 AS INT)] AS h,
                   t[CAST(i + 2 AS INT)] AS w
            FROM toks, unnest(range(len(t) - 1)) AS r(i)
            WHERE doc_id % {_NV_HOLD} = 0)
      GROUP BY lang, h, w),
    uni AS (
      SELECT te.lang,
             CAST(sum(te.c) AS BIGINT) AS n_uni,
             CAST(sum(CASE WHEN tr.tok IS NULL THEN te.c ELSE 0 END)
                  AS BIGINT) AS oov
      FROM te_uni te LEFT JOIN tr_uni tr
        ON tr.lang = te.lang AND tr.tok = te.tok
      GROUP BY te.lang),
    bi AS (
      SELECT te.lang,
             CAST(sum(te.c) AS BIGINT) AS n_bi,
             CAST(sum(CASE WHEN tr.h IS NULL THEN te.c ELSE 0 END)
                  AS BIGINT) AS novel
      FROM te_bi te LEFT JOIN tr_bi tr
        ON tr.lang = te.lang AND tr.h = te.h AND tr.w = te.w
      GROUP BY te.lang)
    SELECT u.lang, u.n_uni AS n_test_tokens,
           {{oov}} / 1000000.0 AS oov_rate,
           b.n_bi AS n_test_bigrams,
           {{nov}} / 1000000.0 AS novel_bigram_rate
    FROM uni u JOIN bi b ON b.lang = u.lang
    ORDER BY u.lang
    """


def _nv_oracle() -> str:
    from ..functions import text as _t

    return _NV_ORACLE.format(
        toks=_t.tokens_sql("text"),
        oov=_half_up_sql("1000000 * u.oov", "u.n_uni"),
        nov=_half_up_sql("1000000 * b.novel", "b.n_bi"),
    )


@query("q_heldout_novelty", oracle=_nv_oracle())
def q_heldout_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X747 — held-out n-gram novelty (distinct from X421's batch-temporal novelty curve): on the deterministic X737
    train/held-out split, the held-out OOV token rate and novel
    (train-unseen) bigram rate per language — the memorization-vs-
    generalization meter for LM training data (a near-zero novel
    rate means the held-out set is effectively memorized train data —
    leakage; a very high rate means the corpus is too fragmented for
    an n-gram prior to transfer). Complements X-decontaminate (cross-
    corpus overlap) with the WITHIN-corpus split view, and X738's
    Chao1 (how much vocabulary is unseen ANYWHERE) with how much the
    train half already covers.

    Determinism: membership via anti-join semantics (LEFT JOIN + NULL
    test on grouped keys), counts exact integers, two half-up ratios.

    Scale: vocabulary/bigram-table-keyed joins — corpus-linear
    explode-counts, no pairwise stage."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", _text.tokens(F.col("text")).alias("t")
    )
    train = toks.filter(F.col("doc_id") % _NV_HOLD != 0)
    test = toks.filter(F.col("doc_id") % _NV_HOLD == 0)

    def unis(df, counted):
        u = df.select("lang", F.explode("t").alias("tok"))
        if counted:
            return u.groupBy("lang", "tok").agg(
                F.count("*").cast("long").alias("c")
            )
        return u.groupBy("lang", "tok").agg(F.lit(1).alias("one")).drop(
            "one"
        )

    def bis(df, counted):
        b = (
            df.filter(F.size("t") >= 2)
            .select(
                "lang",
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(t) - 2), "
                        "i -> struct(t[i] AS h, t[i + 1] AS w))"
                    )
                ).alias("hw"),
            )
            .select("lang", F.col("hw.h").alias("h"), F.col("hw.w").alias("w"))
        )
        if counted:
            return b.groupBy("lang", "h", "w").agg(
                F.count("*").cast("long").alias("c")
            )
        return b.groupBy("lang", "h", "w").agg(F.lit(1).alias("one")).drop(
            "one"
        )

    tr_uni = unis(train, False).withColumn("seen", F.lit(1))
    te_uni = unis(test, True)
    uni = (
        te_uni.join(tr_uni, ["lang", "tok"], "left")
        .groupBy("lang")
        .agg(
            F.sum("c").cast("long").alias("n_uni"),
            F.sum(F.when(F.col("seen").isNull(), F.col("c")).otherwise(0))
            .cast("long")
            .alias("oov"),
        )
    )
    tr_bi = bis(train, False).withColumn("seen", F.lit(1))
    te_bi = bis(test, True)
    bi = (
        te_bi.join(tr_bi, ["lang", "h", "w"], "left")
        .groupBy("lang")
        .agg(
            F.sum("c").cast("long").alias("n_bi"),
            F.sum(F.when(F.col("seen").isNull(), F.col("c")).otherwise(0))
            .cast("long")
            .alias("novel"),
        )
    )
    return (
        uni.join(bi, "lang")
        .select(
            "lang",
            F.col("n_uni").alias("n_test_tokens"),
            (_half_up_col("1000000 * oov", "n_uni") / 1000000.0).alias(
                "oov_rate"
            ),
            F.col("n_bi").alias("n_test_bigrams"),
            (_half_up_col("1000000 * novel", "n_bi") / 1000000.0).alias(
                "novel_bigram_rate"
            ),
        )
        .orderBy("lang")
    )
