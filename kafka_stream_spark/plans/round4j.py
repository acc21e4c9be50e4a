"""Round-4 breadth, part J: one ALS half-step (matrix factorization),
empirical-Bayes rate shrinkage, and unigram^0.75 negative sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import hashing
from ..sources.tables import load
from .registry import query

# ---------------------------------------------------------------------------
# X329 — one ALS half-step (solve user factors against fixed item factors)
# ---------------------------------------------------------------------------

_ALS_LAMBDA = 0.1


def _item_factor_sql(i: int) -> str:
    """Deterministic 2-d item factor from the item key (hash-derived,
    in [-1, 1] — the fixed side of the half-step)."""
    h = hashing.token_hash_sql(f"'f{i}:' || CAST(l_partkey AS VARCHAR)")
    return f"(({h} % 2000) / 1000.0 - 1.0)"


@query(
    "q_als_step",
    oracle=f"""
    WITH r AS (
      SELECT o.o_custkey AS u, l.l_partkey,
             CAST(l.l_quantity AS DOUBLE) AS rating,
             {_item_factor_sql(1)} AS f1,
             {_item_factor_sql(2)} AS f2
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ), s AS (
      SELECT u, count(*) AS n,
             sum(f1 * f1) + {_ALS_LAMBDA} AS a11,
             sum(f1 * f2) AS a12,
             sum(f2 * f2) + {_ALS_LAMBDA} AS a22,
             sum(f1 * rating) AS b1,
             sum(f2 * rating) AS b2
      FROM r GROUP BY u
    )
    SELECT u, CAST(n AS BIGINT) AS n_ratings,
           round((b1 * a22 - b2 * a12) / (a11 * a22 - a12 * a12), 6) AS w1,
           round((b2 * a11 - b1 * a12) / (a11 * a22 - a12 * a12), 6) AS w2
    FROM s WHERE u % 10 = 0
    """,
)
def q_als_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X329 — one ALS half-step (Zhou et al. 2008, the Netflix-era
    alternating least squares): with rank-2 item factors FIXED
    (deterministic hash-derived here; in the full loop they come from
    the previous half-step), every user's factor vector solves an
    independent regularized 2x2 least-squares — closed-form Cramer on
    per-user sufficient statistics, so the whole half-step is ONE
    groupBy(user) aggregation (the insight that makes ALS the
    canonical distributed factorizer: users decouple given items, and
    vice versa). Ratings = order quantities on the customer-part
    matrix; 10% user sample in the output cut."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")

    def item_factor(i: int):
        h = hashing.token_hash(
            F.concat(F.lit(f"f{i}:"), F.col("l_partkey").cast("string"))
        )
        return (h % 2000) / 1000.0 - 1.0

    r = li.join(o, o.o_orderkey == li.l_orderkey).select(
        F.col("o_custkey").alias("u"),
        F.col("l_quantity").cast("double").alias("rating"),
        item_factor(1).alias("f1"),
        item_factor(2).alias("f2"),
    )
    s = r.groupBy("u").agg(
        F.count("*").alias("n"),
        (F.sum(F.col("f1") * F.col("f1")) + _ALS_LAMBDA).alias("a11"),
        F.sum(F.col("f1") * F.col("f2")).alias("a12"),
        (F.sum(F.col("f2") * F.col("f2")) + _ALS_LAMBDA).alias("a22"),
        F.sum(F.col("f1") * F.col("rating")).alias("b1"),
        F.sum(F.col("f2") * F.col("rating")).alias("b2"),
    )
    det = F.col("a11") * F.col("a22") - F.col("a12") * F.col("a12")
    return s.filter(F.col("u") % 10 == 0).select(
        "u",
        F.col("n").cast("long").alias("n_ratings"),
        F.round(
            (F.col("b1") * F.col("a22") - F.col("b2") * F.col("a12")) / det, 6
        ).alias("w1"),
        F.round(
            (F.col("b2") * F.col("a11") - F.col("b1") * F.col("a12")) / det, 6
        ).alias("w2"),
    )


# ---------------------------------------------------------------------------
# X330 — empirical-Bayes rate shrinkage
# ---------------------------------------------------------------------------


@query(
    "q_eb_shrinkage",
    oracle="""
    WITH g AS (
      SELECT source, count(*) AS n,
             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS k,
             sum(CASE WHEN lang = 'en' THEN 1.0 ELSE 0 END) / count(*) AS p
      FROM documents GROUP BY source
    ), mom AS (
      SELECT avg(p) AS mu,
             sum((p - (SELECT avg(p) FROM g)) * (p - (SELECT avg(p) FROM g)))
               / (count(*) - 1) AS varp,
             avg(1.0 / n) AS mean_inv_n
      FROM g
    ), prior AS (
      SELECT mu,
             greatest(varp - mu * (1 - mu) * mean_inv_n, 1e-6)
               / (mu * (1 - mu)) AS tau,
             mu * (greatest(mu * (1 - mu)
                   / greatest(varp - mu * (1 - mu) * mean_inv_n, 1e-6) - 1,
                   1.0)) AS alpha,
             (1 - mu) * (greatest(mu * (1 - mu)
                   / greatest(varp - mu * (1 - mu) * mean_inv_n, 1e-6) - 1,
                   1.0)) AS beta
      FROM mom
    )
    SELECT g.source, CAST(g.n AS BIGINT) AS n, CAST(g.k AS BIGINT) AS k,
           round(g.p, 6) AS raw_rate,
           round((g.k + p.alpha) / (g.n + p.alpha + p.beta), 6)
             AS shrunk_rate
    FROM g CROSS JOIN prior p
    """,
)
def q_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X330 — empirical-Bayes (beta-binomial) shrinkage of per-source
    English rates: a method-of-moments beta prior fitted from the
    across-group rate distribution (sampling variance subtracted from
    the observed variance, floored), then every group's rate shrinks
    toward the grand mean in proportion to its sample size — the
    standard fix for ranking small-sample rates (a 2/3 source should
    not outrank a 210/500 one). Robinson's 'add alpha and beta' recipe
    as two rollups + a broadcast prior; the same shape serves CTR,
    defect-rate, and conversion leaderboards."""
    g = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("lang") == "en").cast("long")).alias("k"),
            (
                F.sum((F.col("lang") == "en").cast("double")) / F.count("*")
            ).alias("p"),
        )
    )
    # keep everything in the plan: broadcast the grand mean, then the
    # moment fold (no driver scalars)
    gm = g.agg(F.avg("p").alias("mu"))
    mom = (
        g.crossJoin(F.broadcast(gm))
        .agg(
            F.any_value("mu").alias("mu"),
            (
                F.sum((F.col("p") - F.col("mu")) * (F.col("p") - F.col("mu")))
                / (F.count("*") - 1)
            ).alias("varp"),
            F.avg(1.0 / F.col("n")).alias("mean_inv_n"),
        )
    )
    excess = F.greatest(
        F.col("varp") - F.col("mu") * (1 - F.col("mu")) * F.col("mean_inv_n"),
        F.lit(1e-6),
    )
    strength = F.greatest(
        F.col("mu") * (1 - F.col("mu")) / excess - 1, F.lit(1.0)
    )
    prior = mom.select(
        "mu",
        (F.col("mu") * strength).alias("alpha"),
        ((1 - F.col("mu")) * strength).alias("beta"),
    )
    return g.crossJoin(F.broadcast(prior)).select(
        "source",
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
        F.round("p", 6).alias("raw_rate"),
        F.round(
            (F.col("k") + F.col("alpha"))
            / (F.col("n") + F.col("alpha") + F.col("beta")),
            6,
        ).alias("shrunk_rate"),
    )


# ---------------------------------------------------------------------------
# X331 — unigram^0.75 negative sampling
# ---------------------------------------------------------------------------


@query(
    "q_negative_sampling",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split(lower(text), ' '),
                                t -> t <> '')) AS tok
      FROM documents
    ), vocab AS (
      SELECT tok, pow(count(*), 0.75) AS w,
             row_number() OVER (ORDER BY count(*) DESC, tok) AS rn
      FROM toks GROUP BY tok
    ), top AS (SELECT tok, w, rn FROM vocab WHERE rn <= 64),
    cum AS (
      SELECT tok, rn,
             COALESCE(sum(w) OVER (ORDER BY rn
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / (SELECT sum(w) FROM top) AS lo,
             sum(w) OVER (ORDER BY rn ROWS UNBOUNDED PRECEDING)
               / (SELECT sum(w) FROM top) AS hi
      FROM top
    ), draws AS (
      SELECT d.doc_id, gs.j,
             ({hashing.token_hash_sql(
                 "CAST(d.doc_id AS VARCHAR) || '#' || CAST(gs.j AS VARCHAR)")}
              % 1000000) / 1000000.0 AS u
      FROM documents d, generate_series(0, 1) AS gs(j)
      WHERE d.doc_id % 10 = 0
    )
    SELECT dr.doc_id, dr.j AS draw_id, c.tok AS negative,
           round(dr.u, 6) AS u
    FROM draws dr JOIN cum c ON dr.u >= c.lo AND dr.u < c.hi
    """,
)
def q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X331 — word2vec-style negative sampling (Mikolov et al. 2013):
    draw negatives from the unigram distribution raised to 3/4 (the
    published smoothing that upweights the tail). Deterministic spelling:
    the 64-token candidate table carries cumulative probability
    intervals [lo, hi); each (doc, draw) gets a hash-derived uniform u
    and a RANGE JOIN u ∈ [lo, hi) picks its negative — inverse-CDF
    sampling as relational algebra, reproducible across runs and
    engines (no rand() in the plan, the X60/X181 discipline). The
    interval table broadcasts; draws never shuffle."""
    toks = load(spark, sf_dir, "documents").select(
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
        ).alias("tok")
    )
    w_rank = Window.orderBy(F.desc("c"), "tok")
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("c"))
        .withColumn("w", F.pow("c", 0.75))
        .withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= 64)
    )
    tot = vocab.agg(F.sum("w").alias("tw"))
    w_cum = Window.orderBy("rn")
    cum = (
        vocab.crossJoin(F.broadcast(tot))
        .withColumn(
            "lo",
            F.coalesce(
                F.sum("w").over(w_cum.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0.0),
            )
            / F.col("tw"),
        )
        .withColumn(
            "hi",
            F.sum("w").over(w_cum.rowsBetween(Window.unboundedPreceding, 0))
            / F.col("tw"),
        )
        .select("tok", "lo", "hi")
    )
    draws = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(1))).alias("j"),
        )
        .withColumn(
            "u",
            (
                hashing.token_hash(
                    F.concat_ws("#", F.col("doc_id"), F.col("j"))
                )
                % 1_000_000
            )
            / 1_000_000.0,
        )
    )
    return (
        draws.join(
            F.broadcast(cum),
            (F.col("u") >= F.col("lo")) & (F.col("u") < F.col("hi")),
        )
        .select(
            "doc_id",
            F.col("j").alias("draw_id"),
            F.col("tok").alias("negative"),
            F.round("u", 6).alias("u"),
        )
    )
