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
