"""Round-11 batch Q (X793–X794): membership-inference scoring and
serving-cache reuse audits.

Reference scope note: §2.13 mandate extensions, reference-free.

- X793 q_mink_prob: Min-K% Prob membership inference (Shi et al.
  2023) — score every doc by the mean of its LOWEST 20% token
  log-probs under a JM-smoothed bigram LM trained on the member
  split; report the member/non-member score gap.  The canonical
  "was this in the training set" audit, run with the engine's own LM
  so no model weights are needed.
- X794 q_prefix_cache: prefix-cache reuse audit (the vLLM automatic
  prefix-caching savings estimate): sort prompts per language, LCP
  with the sorted predecessor via one lag window (no pairwise join),
  report the token fraction a longest-common-prefix cache would
  serve — the number that decides whether prefix caching pays for a
  given workload.

Determinism: log-probs quantize 1e-9 per token; bottom-k selection
ranks quantized integers with positional tie-breaks; LCPs are exact
integers from a leading-ones scan (array_position / list_position).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions import text as textfn
from ..sources.tables import load
from .registry import query

# ---------------------------------------------------------------------------
# X793 — Min-K% Prob membership inference
# ---------------------------------------------------------------------------

_MK_HOLD = 5  # doc_id % 5 == 0 → non-member (held out of LM training)
_MK_PCT = 20  # score = mean of the lowest 20% token log-probs

_MINK_ORACLE = f"""
    WITH tok AS MATERIALIZED (
      SELECT doc_id, {textfn.tokens_sql('text')} AS t FROM documents
      WHERE len({textfn.tokens_sql('text')}) >= 2),
    train AS (SELECT * FROM tok WHERE doc_id % {_MK_HOLD} <> 0),
    uni AS (
      SELECT w, count(*) AS cu FROM (
        SELECT unnest(t) AS w FROM train) GROUP BY 1),
    nn AS (SELECT sum(cu) AS n FROM uni),
    bi AS (
      SELECT t[p] AS h, t[p + 1] AS w, count(*) AS cb FROM (
        SELECT t, unnest(range(1, len(t))) AS p FROM train)
      GROUP BY 1, 2),
    hh AS (SELECT h, sum(cb) AS ch FROM bi GROUP BY 1),
    post AS (
      SELECT doc_id, t[p] AS h, t[p + 1] AS w, p
      FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS p FROM tok)),
    lp AS (
      SELECT post.doc_id, post.p,
             CAST(round(1e9 * ln(
               (coalesce(bi.cb, 0) * 1.0 / hh.ch
                + uni.cu * 1.0 / nn.n) / 2)) AS BIGINT) AS lp9
      FROM post
      JOIN uni ON uni.w = post.w
      JOIN hh ON hh.h = post.h
      LEFT JOIN bi ON bi.h = post.h AND bi.w = post.w
      CROSS JOIN nn),
    ranked AS (
      SELECT doc_id, lp9,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY lp9, p) AS r,
             count(*) OVER (PARTITION BY doc_id) AS m
      FROM lp),
    per_doc AS (
      SELECT doc_id,
             CAST(sum(lp9) AS HUGEINT) AS s9,
             count(*) AS kk
      FROM ranked
      WHERE r * 100 <= {_MK_PCT} * m + 100 - 1  -- r <= ceil(0.2 m)
      GROUP BY doc_id)
    SELECT CASE WHEN doc_id % {_MK_HOLD} = 0 THEN 'non-member'
                ELSE 'member' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(sum(s9 / kk) AS DOUBLE) / count(*) / 1e9, 6)
             AS mean_mink
    FROM (SELECT doc_id,
                 CAST(s9 AS DOUBLE) AS s9, kk
          FROM per_doc)
    GROUP BY 1 ORDER BY 1
    """


@query("q_mink_prob", oracle=_MINK_ORACLE)
def q_mink_prob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X793 — Min-K% Prob membership inference (Shi et al. 2023): a
    doc's score is the mean of its lowest {_MK_PCT}% token log-probs
    under a λ=1/2 JM-smoothed bigram LM trained on the member split
    (doc_id % {_MK_HOLD} ≠ 0) — members' worst tokens are less
    surprising to a model that saw them, so the member/non-member
    mean gap is the contamination/memorization signal.  The audit
    every training-set release runs against extraction claims, here
    with the engine's own LM (no weights needed).

    Tokens whose word or history is unseen in training are excluded
    (same inner-join rule both engines); log-probs quantize 1e-9 per
    token and bottom-k ranks on the quantized integer with positional
    tie-break.

    Scale: count-table joins on (h, w) — explode-grain, combinable;
    the per-doc bottom-k is one window over doc partitions."""
    tok = (
        load(spark, sf_dir, "documents")
        .select("doc_id", textfn.tokens(F.col("text")).alias("t"))
        .filter(F.size("t") >= 2)
    )
    train = tok.filter(F.col("doc_id") % _MK_HOLD != 0)
    uni = (
        train.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cu"))
    )
    n_train = uni.agg(F.sum("cu")).collect()[0][0]
    bi = (
        train.select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 2),"
                    " i -> struct(t[i] AS h, t[i + 1] AS w))"
                )
            ).alias("hw")
        )
        .select("hw.h", "hw.w")
        .groupBy("h", "w")
        .agg(F.count("*").alias("cb"))
    )
    hh = bi.groupBy("h").agg(F.sum("cb").alias("ch"))
    post = tok.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, size(t) - 2),"
                " i -> struct(t[i] AS h, t[i + 1] AS w))"
            )
        ).alias("p0", "hw"),
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "hw.h", "hw.w")
    lp = (
        post.join(uni, "w")
        .join(hh, "h")
        .join(bi, ["h", "w"], "left")
        .select(
            "doc_id",
            "p",
            F.round(
                F.lit(1e9)
                * F.log(
                    (
                        F.coalesce("cb", F.lit(0)) * 1.0 / F.col("ch")
                        + F.col("cu") * 1.0 / F.lit(float(n_train))
                    )
                    / 2
                )
            )
            .cast("long")
            .alias("lp9"),
        )
    )
    ranked = lp.select(
        "doc_id",
        "lp9",
        F.row_number()
        .over(W.partitionBy("doc_id").orderBy("lp9", "p"))
        .alias("r"),
        F.count("*").over(W.partitionBy("doc_id")).alias("m"),
    )
    per_doc = (
        ranked.filter(F.col("r") * 100 <= _MK_PCT * F.col("m") + 100 - 1)
        .groupBy("doc_id")
        .agg(
            (F.sum("lp9").cast("double") / F.count("*")).alias("s9k")
        )
    )
    return (
        per_doc.groupBy(
            F.when(F.col("doc_id") % _MK_HOLD == 0, "non-member")
            .otherwise("member")
            .alias("split")
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.round(
                F.sum("s9k") / F.count("*") / 1e9, 6
            ).alias("mean_mink"),
        )
        .orderBy("split")
    )


# ---------------------------------------------------------------------------
# X794 — prefix-cache reuse audit
# ---------------------------------------------------------------------------

_PC_PROMPT = 64  # prompt = first 64 tokens

_PREFIX_ORACLE = f"""
    WITH tok AS MATERIALIZED (
      SELECT doc_id, lang,
             {textfn.tokens_sql('lower(text)')}[1:{_PC_PROMPT}] AS t
      FROM documents),
    srt AS (
      SELECT doc_id, lang, t,
             lag(t) OVER (PARTITION BY lang ORDER BY t, doc_id) AS pt
      FROM tok),
    pos AS (
      SELECT doc_id, lang, len(t) AS n,
             least(len(t), coalesce(len(pt), 0)) AS m,
             (pt IS NULL) AS first_row,
             list_position(
               list_transform(
                 range(1, least(len(t), coalesce(len(pt), 0)) + 1),
                 i -> CASE WHEN t[i] = pt[i] THEN 1 ELSE 0 END),
               0) AS p0
      FROM srt),
    lcps AS (
      -- list_position returns 0 (not NULL) when no mismatch exists:
      -- 0 → the whole min-length prefix matches → lcp = m
      SELECT doc_id, lang, n,
             CASE WHEN first_row THEN 0
                  WHEN p0 = 0 THEN m
                  ELSE p0 - 1 END AS lcp
      FROM pos)
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(lcp) AS BIGINT) AS cached_tokens,
           CAST(sum(n) AS BIGINT) AS total_tokens,
           round(CAST(sum(lcp) AS DOUBLE) / greatest(sum(n), 1), 6)
             AS reuse_frac,
           CAST(sum(CASE WHEN lcp = n AND n > 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_fully_cached
    FROM lcps GROUP BY lang ORDER BY lang
    """


@query("q_prefix_cache", oracle=_PREFIX_ORACLE)
def q_prefix_cache(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X794 — prefix-cache reuse audit (the automatic-prefix-caching
    savings estimate a serving tier computes before enabling it):
    prompts (first {_PC_PROMPT} tokens) sort per language, each
    prompt's longest common prefix with its sorted predecessor comes
    from ONE lag window (sorted-neighbor LCP lower-bounds the optimal
    prefix-tree reuse — no pairwise join), and the per-language
    report is the token fraction a prefix cache would serve plus the
    fully-cached prompt count.

    Exactness: LCP is the index of the first mismatch in a 0/1
    leading-match array (array_position / list_position, exact
    integers); fractions are single rounded ratios of exact sums.

    Scale: the sort is per-language range-partitioned (the lag's
    window); everything else is map-side token work — no joins."""
    tok = load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.slice(textfn.tokens(F.lower(F.col("text"))), 1, _PC_PROMPT).alias(
            "t"
        ),
    )
    srt = tok.withColumn(
        "pt", F.lag("t").over(W.partitionBy("lang").orderBy("t", "doc_id"))
    )
    m = F.least(F.size("t"), F.size("pt"))
    la = F.zip_with(
        F.slice("t", 1, m), F.slice("pt", 1, m),
        lambda x, y: F.when(x == y, 1).otherwise(0),
    )
    pos = F.array_position(la, 0)
    lcp = F.when(F.col("pt").isNull(), 0).otherwise(
        F.when(pos == 0, m).otherwise(pos - 1)
    )
    lcps = srt.select(
        "lang", F.size("t").alias("n"), lcp.cast("long").alias("lcp")
    )
    return (
        lcps.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("lcp").cast("long").alias("cached_tokens"),
            F.sum("n").cast("long").alias("total_tokens"),
            F.round(
                F.sum("lcp").cast("double")
                / F.greatest(F.sum("n"), F.lit(1)),
                6,
            ).alias("reuse_frac"),
            F.sum(
                ((F.col("lcp") == F.col("n")) & (F.col("n") > 0)).cast(
                    "int"
                )
            )
            .cast("long")
            .alias("n_fully_cached"),
        )
        .orderBy("lang")
    )
