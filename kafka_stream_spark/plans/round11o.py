"""Round-11 batch O (X785–X786): routed-family conversions onto the
persisted √n-codebook IVF index (the X748 serving path).

Reference scope note: §2.13 mandate extensions (similarity search /
data valuation), reference-free.

The round-10/11 64× probes established the pattern: any routed query
that rebuilds its every=50 coarse quantizer per run pays n·(n/50)
routing — a quadratic wall (q_margin_mining_routed measured exp 0.97
at 64×, facility location 1.02 before its conversion) — while the
persisted √n-codebook index amortizes the build into corpus state
(facility location measured 0.74 after conversion).  These two keys
convert the remaining heavy routed families:

- X785 q_margin_mining_indexed: Artetxe-Schwenk ratio-margin bitext
  mining served from TWO persisted per-side indexes (√n_side
  codebooks) — queries of each side route through the OTHER side's
  stored codebook + inverted lists; the every=50 key
  (q_margin_mining_routed) stays registered as the gate-pinned
  fixed-codebook contract twin.
- X786 q_knn_shapley_indexed: truncated KNN-Shapley valuation served
  from the persisted index of the valuation corpus (residue-1 √n
  codebook — the corpus excludes vec_id%25==0 anchors, so residue 0
  could go empty whenever √n lands on a multiple of 25); per-anchor
  suffix recursion unchanged from X680.

Determinism: codebooks are floor-sqrt modulus rules replayed by the
DuckDB oracles (ivf_search_sql), scores round to 6 before every
comparison, ties break on ids — a hash match pins index contents,
routing, and the downstream margin / Shapley math together.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..operators import ann as _ann
from ..sources.tables import load
from .registry import query
from .round9 import _KS_K, _KST_M, _MM_NK, _MM_NPROBE, _MM_TAU

# ---------------------------------------------------------------------------
# X785 — margin mining served from persisted per-side indexes
# ---------------------------------------------------------------------------


def ensure_side_index(spark: SparkSession, sf_dir: str, side: int) -> str:
    """Build-once accessor for one translation side's persisted IVF
    index (side = label % 2, √n_side modulus codebook): the bitext
    miner's steady state keeps one index per language side and only
    queries cross-side."""
    corpus = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("label") % 2 == side)
        .select(F.col("vec_id").alias("n_id"), F.col("embedding").alias("emb"))
    )
    n = corpus.count()
    idx = _ann.default_index_dir(sf_dir, f"embeddings_side{side}", n)
    _ann.build_ivf_index(corpus, idx, every=_ann.sqrt_every(n))
    return idx


_SIDE_EVERY_SQL = {
    s: (
        "greatest(2, CAST(floor(sqrt(CAST((SELECT count(*) FROM "
        f"{cte}) AS DOUBLE))) AS BIGINT))"
    )
    for s, cte in ((0, "xsc"), (1, "ysc"))
}

_MMI_ORACLE = f"""
    WITH xsq AS (
      SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
      WHERE label % 2 = 0),
    xsc AS (
      SELECT vec_id AS n_id, embedding AS emb FROM embeddings
      WHERE label % 2 = 0),
    ysq AS (
      SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
      WHERE label % 2 = 1),
    ysc AS (
      SELECT vec_id AS n_id, embedding AS emb FROM embeddings
      WHERE label % 2 = 1),
    centx AS (
      SELECT n_id AS c_id, emb AS c_emb FROM xsc
      WHERE n_id % {_SIDE_EVERY_SQL[0]} = 0),
    centy AS (
      SELECT n_id AS c_id, emb AS c_emb FROM ysc
      WHERE n_id % {_SIDE_EVERY_SQL[1]} = 0),
    {_ann.ivf_search_sql("ysc", "xsq", "centy", k=_MM_NK,
                         nprobe=_MM_NPROBE, prefix="xy_")},
    {_ann.ivf_search_sql("xsc", "ysq", "centx", k=_MM_NK,
                         nprobe=_MM_NPROBE, prefix="yx_")},
    mx AS (
      SELECT q_id AS x_id, round(avg(score), 10) AS mx
      FROM xy_topk GROUP BY q_id),
    my AS (
      SELECT q_id AS y_id, round(avg(score), 10) AS my
      FROM yx_topk GROUP BY q_id),
    cand AS (
      SELECT DISTINCT x_id, y_id, c FROM (
        SELECT q_id AS x_id, n_id AS y_id, score AS c FROM xy_topk
        UNION ALL
        SELECT n_id AS x_id, q_id AS y_id, score AS c FROM yx_topk)),
    mg AS (
      SELECT cand.x_id, cand.y_id,
             round(cand.c / ((mx.mx + my.my) / 2), 6) AS margin
      FROM cand JOIN mx ON mx.x_id = cand.x_id
      JOIN my ON my.y_id = cand.y_id),
    bx AS (
      SELECT x_id, y_id, margin FROM (
        SELECT x_id, y_id, margin,
               row_number() OVER (PARTITION BY x_id
                 ORDER BY margin DESC, y_id) AS r
        FROM mg) WHERE r = 1),
    by_ AS (
      SELECT x_id, y_id FROM (
        SELECT x_id, y_id,
               row_number() OVER (PARTITION BY y_id
                 ORDER BY margin DESC, x_id) AS r
        FROM mg) WHERE r = 1)
    SELECT bx.x_id, bx.y_id, bx.margin
    FROM bx JOIN by_ ON by_.x_id = bx.x_id AND by_.y_id = bx.y_id
    WHERE bx.margin >= {_MM_TAU}
    ORDER BY bx.x_id
    """


@query("q_margin_mining_indexed", oracle=_MMI_ORACLE)
def q_margin_mining_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X785 — ratio-margin bitext mining (Artetxe & Schwenk 2019)
    served from PERSISTED per-side IVF indexes: each side's codebook
    (√n_side modulus) + inverted lists are corpus state built once by
    operators/ann.build_ivf_index; side-0 queries route through
    side-1's stored index and vice versa, then the standard
    mutual-best ratio-margin filter (margin = cosine / mean of the
    two endpoints' top-{_MM_NK} neighborhood means, τ = {_MM_TAU}).

    This converts the heaviest remaining routed family off the
    build-each-run every=50 quantizer: the round-11 64× probe of
    q_margin_mining_routed measured exp 0.97 (corpus-sized query sets
    paying n·(n/50) routing); with the index persisted, per-run cost
    is |Q|·nprobe·√n routing + candidate scoring.  The every=50 key
    stays registered as the fixed-codebook contract twin.

    Scale: index build amortizes across rounds (ensure_side_index);
    searches read only probed inverted-list files (layout partitioned
    by centroid_id); mutual-best reductions are max_by aggregates —
    map-side combinable, no row_number shuffle."""
    idx_x = ensure_side_index(spark, sf_dir, 0)
    idx_y = ensure_side_index(spark, sf_dir, 1)
    emb = load(spark, sf_dir, "embeddings")
    xq = emb.filter(F.col("label") % 2 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    yq = emb.filter(F.col("label") % 2 == 1).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    # each side's search result feeds TWO consumers (neighborhood mean
    # + the candidate union); materialize the |Q|·k frames once instead
    # of re-running the probed search and its index reads (guide §2.4)
    txy = _ann.ivf_search_indexed(
        spark, idx_y, xq, k=_MM_NK, nprobe=_MM_NPROBE
    ).localCheckpoint(eager=True)
    tyx = _ann.ivf_search_indexed(
        spark, idx_x, yq, k=_MM_NK, nprobe=_MM_NPROBE
    ).localCheckpoint(eager=True)
    mx = txy.groupBy(F.col("q_id").alias("x_id")).agg(
        F.round(F.avg("score"), 10).alias("mx")
    )
    my = tyx.groupBy(F.col("q_id").alias("y_id")).agg(
        F.round(F.avg("score"), 10).alias("my")
    )
    cand = (
        txy.select(
            F.col("q_id").alias("x_id"),
            F.col("n_id").alias("y_id"),
            F.col("score").alias("c"),
        )
        .unionByName(
            tyx.select(
                F.col("n_id").alias("x_id"),
                F.col("q_id").alias("y_id"),
                F.col("score").alias("c"),
            )
        )
        .distinct()
    )
    mg = (
        cand.join(mx, "x_id")
        .join(my, "y_id")
        .select(
            "x_id",
            "y_id",
            F.round(
                F.col("c") / ((F.col("mx") + F.col("my")) / 2), 6
            ).alias("margin"),
        )
    )
    bx = (
        mg.groupBy("x_id")
        .agg(
            F.max_by(
                F.struct("y_id", "margin"),
                F.struct(F.col("margin"), -F.col("y_id")),
            ).alias("b")
        )
        .select(
            "x_id",
            F.col("b.y_id").alias("y_id"),
            F.col("b.margin").alias("margin"),
        )
    )
    by = (
        mg.groupBy("y_id")
        .agg(
            F.max_by(
                F.struct("x_id", "margin"),
                F.struct(F.col("margin"), -F.col("x_id")),
            ).alias("b")
        )
        .select(F.col("b.x_id").alias("x_id"), "y_id")
    )
    return (
        bx.join(by, ["x_id", "y_id"])
        .filter(F.col("margin") >= _MM_TAU)
        .select("x_id", "y_id", "margin")
        .orderBy("x_id")
    )


# ---------------------------------------------------------------------------
# X786 — truncated KNN-Shapley served from the persisted index
# ---------------------------------------------------------------------------

_KSI_EVERY_SQL = (
    "greatest(2, CAST(floor(sqrt(CAST((SELECT count(*) FROM corpus) "
    "AS DOUBLE))) AS BIGINT))"
)

_KSI_ORACLE = f"""
    WITH corpus AS (
      SELECT vec_id AS n_id, embedding AS emb, label AS tlbl
      FROM embeddings WHERE vec_id % 25 <> 0),
    anchors AS (
      SELECT vec_id AS q_id, embedding AS q_emb, label AS albl
      FROM embeddings WHERE vec_id % 25 = 0),
    cent AS (
      SELECT n_id AS c_id, emb AS c_emb FROM corpus
      WHERE n_id % {_KSI_EVERY_SQL} = 1),
    {_ann.ivf_search_sql("corpus", "anchors", "cent", k=_KST_M,
                         nprobe=_MM_NPROBE, corpus_extra=("tlbl",),
                         query_extra=("albl",), prefix="ks_")},
    ranked AS (
      SELECT q_id, n_id, tlbl, rn AS rk,
             CASE WHEN tlbl = albl THEN 1.0 ELSE 0.0 END AS d,
             count(*) OVER (PARTITION BY q_id) AS m
      FROM ks_topk),
    terms AS (
      SELECT q_id, n_id, tlbl, rk,
             round(CASE WHEN rk = m THEN
                     d * least(rk, {_KS_K}) / (rk * 1.0 * {_KS_K})
                   ELSE
                     (d - lead(d) OVER (PARTITION BY q_id ORDER BY rk))
                     * least(rk, {_KS_K}) / (rk * 1.0 * {_KS_K})
                   END, 10) AS term
      FROM ranked),
    svals AS (
      SELECT q_id, n_id, tlbl,
             round(sum(term) OVER (PARTITION BY q_id ORDER BY rk DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 10)
               AS sv
      FROM terms)
    SELECT n_id, CAST(count(*) AS BIGINT) AS n_anchors,
           round(sum(sv), 8) AS shapley
    FROM svals GROUP BY n_id
    ORDER BY shapley DESC, n_id
    LIMIT 40
    """


def ensure_valuation_index(spark: SparkSession, sf_dir: str) -> str:
    """Build-once accessor for the valuation corpus' persisted index
    (vec_id % 25 != 0, residue-1 √n codebook — residue 0 could go
    empty whenever √n lands on a multiple of 25)."""
    corpus = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 25 != 0)
        .select(F.col("vec_id").alias("n_id"), F.col("embedding").alias("emb"))
    )
    n = corpus.count()
    idx = _ann.default_index_dir(sf_dir, "embeddings_no25_r1", n)
    _ann.build_ivf_index(corpus, idx, every=_ann.sqrt_every(n), residue=1)
    return idx


@query("q_knn_shapley_indexed", oracle=_KSI_ORACLE)
def q_knn_shapley_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X786 — truncated KNN-Shapley (TKNN, X680's estimator) served
    from the PERSISTED valuation-corpus index: anchors route through
    the stored √n residue-1 codebook into stored inverted lists; the
    per-anchor suffix recursion with boundary term δ_m·min(m,K)/(mK)
    is unchanged.  Labels come from an id-lookup join against the
    corpus (the index stores vectors, not payloads — the serving
    pattern graph ANN uses for rescoring).  Top-40 most valuable
    points by summed Shapley value.

    Converts the second 64×-flagged routed family (X680 measured 0.91
    at 64× on the every=50 build-each-run path; the probe twin
    through the persisted index measured 0.88 with the intrinsic
    n·√n candidate volume flat per-core under cluster scaling).

    Scale: |anchors|·nprobe·cell scored pairs, windows partition by
    anchor; the valuation sum is one n_id-keyed rollup."""
    idx = ensure_valuation_index(spark, sf_dir)
    emb = load(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("albl"),
    )
    labels = emb.filter(F.col("vec_id") % 25 != 0).select(
        F.col("vec_id").alias("n_id"), F.col("label").alias("tlbl")
    )
    topm = _ann.ivf_search_indexed(
        spark, idx, anchors.select("q_id", "q_emb"), k=_KST_M,
        nprobe=_MM_NPROBE,
    )
    ranked = (
        topm.join(anchors.select("q_id", "albl"), "q_id")
        .join(labels, "n_id")
        .select(
            "q_id",
            "n_id",
            "tlbl",
            F.col("rn").alias("rk"),
            F.when(F.col("tlbl") == F.col("albl"), 1.0)
            .otherwise(0.0)
            .alias("d"),
        )
        .withColumn("m", F.count("*").over(W.partitionBy("q_id")))
    )
    w_rk = W.partitionBy("q_id").orderBy("rk")
    frac = F.least(F.col("rk"), F.lit(_KS_K)) / (F.col("rk") * 1.0 * _KS_K)
    terms = ranked.select(
        "q_id",
        "n_id",
        "tlbl",
        "rk",
        F.round(
            F.when(F.col("rk") == F.col("m"), F.col("d") * frac).otherwise(
                (F.col("d") - F.lead("d").over(w_rk)) * frac
            ),
            10,
        ).alias("term"),
    )
    svals = terms.select(
        "q_id",
        "n_id",
        F.round(
            F.sum("term").over(
                W.partitionBy("q_id")
                .orderBy(F.desc("rk"))
                .rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
            10,
        ).alias("sv"),
    )
    return (
        svals.groupBy("n_id")
        .agg(
            F.count("*").alias("n_anchors"),
            F.round(F.sum("sv"), 8).alias("shapley"),
        )
        .orderBy(F.desc("shapley"), "n_id")
        .limit(40)
    )


# ---------------------------------------------------------------------------
# X788 — hard-negative mining served from the persisted index
# ---------------------------------------------------------------------------

_HNI_EVERY_SQL = (
    "greatest(2, CAST(floor(sqrt(CAST((SELECT count(*) FROM corpus) "
    "AS DOUBLE))) AS BIGINT))"
)

_HNI_ORACLE = f"""
    WITH corpus AS (
      SELECT vec_id AS n_id, embedding AS emb, label AS clbl
      FROM embeddings),
    anchors AS (
      SELECT vec_id AS q_id, embedding AS q_emb, label AS albl
      FROM embeddings WHERE vec_id % 25 = 0),
    cent AS (
      SELECT n_id AS c_id, emb AS c_emb FROM corpus
      WHERE n_id % {_HNI_EVERY_SQL} = 0),
    {_ann.ivf_search_sql(
        "corpus", "anchors", "cent", k=3, nprobe=2,
        corpus_extra=("clbl",), query_extra=("albl",),
        pair_filter="a.clbl <> p.albl", prefix="hn_",
    )}
    SELECT q_id AS aid, n_id AS cand, clbl, score AS cos_sim
    FROM hn_topk
    """


@query("q_hard_negatives_indexed", oracle=_HNI_ORACLE)
def q_hard_negatives_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X788 — hard-negative mining served from the PERSISTED
    whole-corpus index (X748's ensure_embedding_index — the exact
    layout the serving-path key reads, shared, so one build amortizes
    across both): anchors route through the stored √n codebook into
    stored inverted lists; labels attach to the lists by an id-lookup
    broadcast join (the index stores vectors, not payloads) and the
    label-mismatch predicate prunes candidates BEFORE the top-3 cut,
    exactly as in the every=50 contract twin (q_hard_negatives).

    The third routed-family conversion: with the index persisted the
    per-run cost is |anchors|·nprobe·√n — no assignment pass, no
    linear codebook growth.

    Scale: probed-list file reads only; the labels dim broadcasts."""
    from .round11 import ensure_embedding_index

    idx = ensure_embedding_index(spark, sf_dir)
    emb = load(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("albl"),
    )
    labels = emb.select(
        F.col("vec_id").alias("n_id"), F.col("label").alias("clbl")
    )
    centroids = spark.read.parquet(f"{idx}/centroids")
    assigned = (
        spark.read.parquet(f"{idx}/assigned")
        .withColumn("centroid_id", F.col("centroid_id").cast("long"))
        .join(F.broadcast(labels), "n_id")
    )
    top3 = _ann.ivf_search(
        corpus=None,
        queries=anchors,
        k=3,
        nprobe=2,
        centroids=centroids,
        assigned=assigned,
        pair_filter=F.col("clbl") != F.col("albl"),
    )
    return top3.select(
        F.col("q_id").alias("aid"),
        F.col("n_id").alias("cand"),
        "clbl",
        F.col("score").alias("cos_sim"),
    )
