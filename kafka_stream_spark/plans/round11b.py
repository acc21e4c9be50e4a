"""Round-11 batch B (X749–X751): RLHF optimization telemetry.

Reference scope note: §2.13 mandate extensions, reference-free — the
audits an RLHF/post-training data pipeline runs over rollout logs.

- X749 q_ppo_clip_stats: PPO-clip telemetry — per-source ratio clip
  fraction at ε=0.2, mean importance ratio, and the k1/k3 approx-KL
  estimators (Schulman's KL-approximation note) every PPO trainer
  watches to catch policy collapse or a stale reference.
- X750 q_rloo_baseline: REINFORCE-leave-one-out advantages (RLOO,
  Kool et al. 2019 / Ahmadian et al. 2024) — per-sample advantage
  against the mean of the OTHER samples in its prompt group, the
  variance-reduced group baseline GRPO-family trainers use.
- X751 q_reward_length_bias: reward-vs-length bias audit — mean
  reward per length decile plus the Pearson correlation, the
  length-hacking detector run before a reward model is trusted.

Determinism contract: token-level logprob deltas / advantages /
rewards are derived from the portable 60-bit md5 hash
(functions/hashing.token_hash) quantized to milli-units, so both
engines fold the identical numbers; doubles appear only in final
exp/ln/sqrt steps, rounded 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as _text
from ..functions.hashing import token_hash, token_hash_sql
from ..sources.tables import load
from .registry import query

# ---------------------------------------------------------------------------
# X749 — PPO clip-fraction / approx-KL telemetry
# ---------------------------------------------------------------------------

_PPO_EPS_MILLI = 200  # ε = 0.2 on the ratio scale


def _ppo_delta_sql(tok: str, doc: str) -> str:
    """Milli-logprob delta (new − old) per token position ∈ [-500, 500]."""
    inner = f"concat(CAST({doc} AS VARCHAR), '#', {tok}, '#ppo')"
    return f"(({token_hash_sql(inner)}) % 1001 - 500)"


def _ppo_adv_sql(tok: str, doc: str) -> str:
    """Milli-advantage per token position ∈ [-1000, 1000]."""
    inner = f"concat(CAST({doc} AS VARCHAR), '#', {tok}, '#adv')"
    return f"(({token_hash_sql(inner)}) % 2001 - 1000)"


_PPO_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id, source, u.tok,
             {_ppo_delta_sql('u.tok', 'doc_id')} AS dm,
             {_ppo_adv_sql('u.tok', 'doc_id')} AS am
      FROM (SELECT doc_id, source, {_text.tokens_sql('text')} AS t
            FROM documents),
           unnest(t) AS u(tok)),
    r AS (
      SELECT source, dm, am,
             exp(dm / 1000.0) AS ratio
      FROM tok),
    agg AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_tokens,
             avg(ratio) AS mean_ratio,
             avg(CASE WHEN (am > 0 AND dm > {_PPO_EPS_MILLI})
                        OR (am < 0 AND dm < -{_PPO_EPS_MILLI})
                      THEN 1.0 ELSE 0.0 END) AS clip_frac,
             avg(-dm / 1000.0) AS kl1,
             avg((ratio - 1.0) - dm / 1000.0) AS kl3
      FROM r GROUP BY source)
    SELECT source, n_tokens,
           round(mean_ratio, 6) AS mean_ratio,
           round(clip_frac, 6) AS clip_frac,
           round(kl1, 6) AS approx_kl1,
           round(kl3, 6) AS approx_kl3
    FROM agg ORDER BY source
    """


@query("q_ppo_clip_stats", oracle=_PPO_ORACLE)
def q_ppo_clip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X749 — PPO-clip telemetry over token-level rollout logs: for
    each source (≈ rollout shard), the fraction of tokens where the
    clipped surrogate BINDS (ratio outside [1−ε, 1+ε] on the side the
    advantage pushes — positive advantage clips high, negative clips
    low: exactly when clip(·) replaces the raw ratio in
    min(r·A, clip(r)·A)), the mean importance ratio, and two
    approx-KL estimators (k1 = E[−log r], k3 = E[(r−1) − log r],
    Schulman's unbiased/low-variance pair) — the dashboard row that
    catches a collapsing policy or stale reference before reward
    drifts.  Token logprob deltas are hash-derived milli-integers, so
    log r = Δ/1000 is EXACT on both engines and only exp is floating.

    Scale: one projection pass over exploded tokens into a combinable
    per-source aggregate — map-side partials, one narrow shuffle."""
    toks = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.explode(_text.tokens(F.col("text"))).alias("tok")
    )
    key = F.concat(
        F.col("doc_id").cast("string"), F.lit("#"), F.col("tok")
    )
    dm = (token_hash(F.concat(key, F.lit("#ppo"))) % 1001 - 500).alias("dm")
    am = (token_hash(F.concat(key, F.lit("#adv"))) % 2001 - 1000).alias("am")
    r = toks.select("source", dm, am).withColumn(
        "ratio", F.exp(F.col("dm") / 1000.0)
    )
    binds = (
        (F.col("am") > 0) & (F.col("dm") > _PPO_EPS_MILLI)
    ) | ((F.col("am") < 0) & (F.col("dm") < -_PPO_EPS_MILLI))
    return (
        r.groupBy("source")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg("ratio"), 6).alias("mean_ratio"),
            F.round(
                F.avg(F.when(binds, 1.0).otherwise(0.0)), 6
            ).alias("clip_frac"),
            F.round(F.avg(-F.col("dm") / 1000.0), 6).alias("approx_kl1"),
            F.round(
                F.avg((F.col("ratio") - 1.0) - F.col("dm") / 1000.0), 6
            ).alias("approx_kl3"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# X750 — RLOO (leave-one-out) group-baseline advantages
# ---------------------------------------------------------------------------

_RLOO_N = 4  # samples per prompt group

_RLOO_ORACLE = f"""
    WITH s AS (
      SELECT user_id AS prompt_id, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS k
      FROM events),
    grp AS (
      SELECT prompt_id, event_id, k, value,
             count(*) OVER (PARTITION BY prompt_id) AS n,
             sum(value) OVER (PARTITION BY prompt_id) AS tot
      FROM s WHERE k <= {_RLOO_N})
    SELECT prompt_id, event_id, CAST(k AS BIGINT) AS k,
           CAST(n AS BIGINT) AS n,
           round(value - (tot - value) / (n - 1), 6) AS advantage
    FROM grp WHERE n >= 2
    """


@query("q_rloo_baseline", oracle=_RLOO_ORACLE)
def q_rloo_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X750 — RLOO advantages: each prompt group's first {_RLOO_N}
    rollouts (events per user, stream-ordered) get advantage
    A_i = r_i − mean(r_j, j≠i) — the leave-one-out baseline that is
    unbiased (unlike the include-self group mean) and needs no value
    network; the group-relative credit assignment GRPO/RLOO trainers
    use.  Groups with a single rollout drop (LOO undefined).

    Scale: two windows over the SAME (prompt_id)-partitioned shuffle —
    Catalyst collapses them into one exchange; advantage math is
    per-row arithmetic on (value, group sum, group count)."""
    from pyspark.sql.window import Window as W

    s = (
        load(spark, sf_dir, "events")
        .select(
            F.col("user_id").alias("prompt_id"), "event_id", "ts", "value"
        )
        .withColumn(
            "k",
            F.row_number().over(
                W.partitionBy("prompt_id").orderBy("ts", "event_id")
            ),
        )
        .filter(F.col("k") <= _RLOO_N)
    )
    wg = W.partitionBy("prompt_id")
    grp = s.select(
        "prompt_id",
        "event_id",
        F.col("k").cast("long").alias("k"),
        "value",
        F.count("*").over(wg).alias("n"),
        F.sum("value").over(wg).alias("tot"),
    ).filter(F.col("n") >= 2)
    return grp.select(
        "prompt_id",
        "event_id",
        "k",
        F.col("n").cast("long").alias("n"),
        F.round(
            F.col("value")
            - (F.col("tot") - F.col("value")) / (F.col("n") - 1),
            6,
        ).alias("advantage"),
    )


# ---------------------------------------------------------------------------
# X751 — reward-vs-length bias audit
# ---------------------------------------------------------------------------


def _rlb_reward_sql() -> str:
    """Milli-reward with a deliberate mild length coupling, so the
    audit has signal to find: r = hash-milli + 200·ln(1 + n_tok)."""
    h = token_hash_sql("concat(CAST(doc_id AS VARCHAR), '#rw')")
    return f"(({h}) % 2001 - 1000) / 1000.0 + 0.2 * ln(1 + n_tok)"


_RLB_ORACLE = f"""
    WITH d AS (
      SELECT doc_id, len({_text.tokens_sql('text')}) AS n_tok
      FROM documents),
    r AS (
      SELECT doc_id, n_tok, {_rlb_reward_sql()} AS reward FROM d),
    dec AS (
      SELECT n_tok, reward,
             ntile(10) OVER (ORDER BY n_tok, doc_id) AS decile
      FROM r),
    per AS (
      SELECT decile, CAST(count(*) AS BIGINT) AS n,
             round(avg(n_tok), 4) AS mean_len,
             round(avg(reward), 6) AS mean_reward
      FROM dec GROUP BY decile),
    corr AS (
      SELECT round(
        (avg(n_tok * reward) - avg(n_tok) * avg(reward))
        / (stddev_pop(n_tok) * stddev_pop(reward)), 6) AS c
      FROM r)
    SELECT CAST(decile AS BIGINT) AS decile, n, mean_len, mean_reward,
           corr.c AS len_reward_corr
    FROM per CROSS JOIN corr ORDER BY decile
    """


@query("q_reward_length_bias", oracle=_RLB_ORACLE)
def q_reward_length_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X751 — reward-model length-bias audit: mean reward per response
    length decile plus the corpus Pearson correlation(length, reward)
    — the first check run before trusting a reward model, because
    RLHF's best-known failure mode is the policy discovering that
    LONGER answers score higher (length hacking).  A monotone decile
    profile + a large positive correlation is the red flag; the
    synthetic rewards here carry a deliberate 0.2·ln(1+len) coupling
    so the gate pins a non-trivial profile.

    Scale: the decile split is one ntile window over a (len, id)-sorted
    projection of doc-grain scalars; moments for the correlation are
    one combinable aggregate — nothing exceeds doc-grain rows."""
    from pyspark.sql.window import Window as W

    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(_text.tokens(F.col("text"))).alias("n_tok")
    )
    h = token_hash(
        F.concat(F.col("doc_id").cast("string"), F.lit("#rw"))
    )
    r = d.select(
        "doc_id",
        "n_tok",
        ((h % 2001 - 1000) / 1000.0 + 0.2 * F.log(1 + F.col("n_tok"))).alias(
            "reward"
        ),
    )
    dec = r.withColumn(
        "decile", F.ntile(10).over(W.orderBy("n_tok", "doc_id"))
    )
    per = dec.groupBy("decile").agg(
        F.count("*").alias("n"),
        F.round(F.avg("n_tok"), 4).alias("mean_len"),
        F.round(F.avg("reward"), 6).alias("mean_reward"),
    )
    corr = r.agg(
        F.round(
            (
                F.avg(F.col("n_tok") * F.col("reward"))
                - F.avg("n_tok") * F.avg("reward")
            )
            / (F.stddev_pop("n_tok") * F.stddev_pop("reward")),
            6,
        ).alias("c")
    )
    return (
        per.crossJoin(F.broadcast(corr))
        .select(
            F.col("decile").cast("long").alias("decile"),
            "n",
            "mean_len",
            "mean_reward",
            F.col("c").alias("len_reward_corr"),
        )
        .orderBy("decile")
    )
