"""Round-9 batch (X647+): production twins for the two round-8 perf-weak
operators, then the round's new LLM-data components.

Reference scope note: the reference pipeline (kafka_s.py) has no
similarity or state-estimation surface; these are §2.13 mandate
extensions, reference-free by design.

- X647 q_margin_mining_routed: margin-based bitext mining with
  candidates AND margin denominators routed through operators/ann
  ivf_search — the production path q_margin_mining's docstring
  promised (VERDICT r8 missing #1), hash-pinned by an oracle that
  replays the identical routing (the q_semantic_dedup_routed /
  q_hard_negatives pattern).
- X648 q_kalman_1d_grouped: the scale-safe Kalman fold (VERDICT r8
  wrong #2) — applyInPandas per event_type running the SAME rounded
  recurrence as q_kalman_1d, so the identical recursive-CTE oracle
  pins it; Kalman is sequential in t but embarrassingly parallel
  across keys, so this replaces q_kalman_1d's per-day driver job loop
  with ONE shuffle and zero driver-side iteration.

Scale notes: the routed miner touches nprobe inverted lists per query
instead of the full opposite population — the same sub-linear candidate
set every other similarity family here uses; the Kalman fold's per-key
series (one row per key per DAY) is bounded by the calendar, thousands
of rows per Arrow batch at any corpus size.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import ann as _ann
from ..session import default_parallelism
from ..sources.tables import load
from .registry import query
from .round8 import _KALMAN_ORACLE, _KF_P0, _KF_Q, _KF_R

# ---------------------------------------------------------------------------
# X647 — ANN-routed margin-based bitext mining
# ---------------------------------------------------------------------------

_MM_NK = 4  # neighborhood depth = ANN k: the denominator IS the top-k mean
_MM_TAU = 1.02
_MM_EVERY = 50  # deterministic coarse quantizer (gate-pinned instance)
_MM_NPROBE = 2

_MM_ROUTED_ORACLE = f"""
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
      WHERE n_id % {_MM_EVERY} = 0),
    centy AS (
      SELECT n_id AS c_id, emb AS c_emb FROM ysc
      WHERE n_id % {_MM_EVERY} = 0),
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
        SELECT *, row_number() OVER (PARTITION BY x_id
                 ORDER BY margin DESC, y_id) AS rn FROM mg)
      WHERE rn = 1),
    by_ AS (
      SELECT x_id, y_id FROM (
        SELECT *, row_number() OVER (PARTITION BY y_id
                 ORDER BY margin DESC, x_id) AS rn FROM mg)
      WHERE rn = 1)
    SELECT bx.x_id, bx.y_id, bx.margin
    FROM bx JOIN by_ ON bx.x_id = by_.x_id AND bx.y_id = by_.y_id
    WHERE bx.margin >= {_MM_TAU}
    ORDER BY bx.x_id
    """


@query("q_margin_mining_routed", oracle=_MM_ROUTED_ORACLE)
def q_margin_mining_routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X647 — margin-based bitext mining (Artetxe & Schwenk 2019) on the
    ANN path: q_margin_mining's production twin (VERDICT r8 missing #1).
    Candidate pairs come from TWO ivf_search calls (X→Y and Y→X, k=4,
    nprobe=2) instead of an all-pairs cross join, and the ratio-margin
    denominator — each endpoint's mean top-4 neighborhood cosine — is
    read straight off the same ANN result sets, which is exactly why
    the CCMatrix recipe is minable at scale: the margin needs only
    LOCAL neighborhoods. Mutual-best + tau filtering as in
    q_margin_mining; pairs whose endpoint lacks an ANN neighborhood
    drop (no denominator → no margin), the documented routed-recall
    trade. The DuckDB oracle replays the identical routing via
    ivf_search_sql, so the hash gate pins the routed path itself.

    Scale: each query scores nprobe inverted lists (sub-linear
    candidates, probed in SCALE.md), the codebook broadcasts, and the
    mutual-best aggregates combine map-side — no all-pairs stage
    anywhere. The gate instance uses the deterministic every-50th
    quantizer; production trains k ~ sqrt(n) centroids
    (operators/semdedup.train_centroids) on the same search path.

    Round-11 restructure (VERDICT r10 "What's wrong #3"): the two
    directional ivf_search calls are FUSED into one side-tagged plan —
    each search was a separate stage chain, and the eager
    localCheckpoint on mg was the confirmed bench-variance point. The
    fused form tags every vector with side = label % 2, assigns
    corpus vectors to same-side centroids and routes queries to
    opposite-side centroids, so one assignment pass + one probe pass +
    one top-k window serve BOTH directions (verified row-identical to
    the two-call form). The two mutual-best row_number windows became
    max_by aggregates (map-side combinable), and the persist replaces
    the eager localCheckpoint."""
    from pyspark import StorageLevel
    from pyspark.sql.window import Window as W

    from ..functions import vectors as _vec

    emb = load(spark, sf_dir, "embeddings").select(
        (F.col("label") % 2).alias("side"), "vec_id", "embedding"
    )
    cent = emb.filter(F.col("vec_id") % _MM_EVERY == 0).select(
        F.col("side").alias("c_side"),
        F.col("vec_id").alias("c_id"),
        F.col("embedding").alias("c_emb"),
    )
    corpus = emb.select(
        "side", F.col("vec_id").alias("n_id"), F.col("embedding").alias("emb")
    )
    # Round 13 (guide §2.3/§2.6): fan the corpus/query sides out before
    # the n×centroid cosine passes (single-split scan = one core), and
    # compute assignment/routing as per-row expressions over the
    # per-SIDE codebook folded to one broadcast array — the r12 form
    # expanded every vector |centroids| ways and sorted the expansion
    # through (n_id)/(q_id) window exchanges.  struct ordering ASC over
    # ((-rounded cosine), c_id) == the windows' (cscore DESC, c_id ASC).
    cent_by_side = F.broadcast(
        cent.groupBy("c_side").agg(
            F.collect_list(F.struct("c_id", "c_emb")).alias("_cents")
        )
    )
    _cos_assign = _vec.cosine_spark_sql("emb", "c.c_emb")
    assigned = (
        corpus.repartition(default_parallelism())
        .join(cent_by_side, F.col("side") == F.col("c_side"))
        .select(
            "side",
            F.expr(
                f"array_min(transform(_cents, c -> struct("
                f"nanvl((-round({_cos_assign}, 6)), CAST('-Infinity' AS DOUBLE)) AS ns, c.c_id AS c_id))).c_id"
            ).alias("centroid_id"),
            "n_id",
            "emb",
        )
    )
    queries = emb.select(
        F.col("side").alias("q_side"),
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
    )
    _cos_probe = _vec.cosine_spark_sql("q_emb", "c.c_emb")
    probes = (
        queries.repartition(default_parallelism())
        .join(cent_by_side, F.col("q_side") != F.col("c_side"))
        .select(
            "q_side",
            "q_id",
            "q_emb",
            F.explode(
                F.expr(
                    f"transform(slice(array_sort(transform(_cents, "
                    f"c -> struct(nanvl((-round({_cos_probe}, 6)), CAST('-Infinity' AS DOUBLE)) AS ns, "
                    f"c.c_id AS c_id))), 1, {_MM_NPROBE}), s -> s.c_id)"
                )
            ).alias("centroid_id"),
        )
    )
    candj = probes.join(assigned, "centroid_id").filter(
        F.col("q_id") != F.col("n_id")
    )
    scored = candj.withColumn(
        "score", F.round(_vec.cosine("q_emb", "emb"), 6)
    )
    w_top = W.partitionBy("q_id").orderBy(F.desc("score"), "n_id")
    t_all = (
        scored.withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") <= _MM_NK)
        .select("q_side", "q_id", "n_id", "score")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    txy = t_all.filter(F.col("q_side") == 0)
    tyx = t_all.filter(F.col("q_side") == 1)
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
            "x_id", F.col("b.y_id").alias("y_id"), F.col("b.margin").alias("margin")
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
    out = (
        bx.join(by, ["x_id", "y_id"])
        .filter(F.col("margin") >= _MM_TAU)
        .select("x_id", "y_id", "margin")
        # eager checkpoint of the (tiny) mutual-best result so t_all's
        # cached partitions can be released HERE instead of leaking
        # across the 85-query single-session gate run (the llm_ext
        # cleanup pattern); t_all serves its 4 reads during this one
        # materialization.
        .localCheckpoint(eager=True)
    )
    t_all.unpersist()
    return out.orderBy("x_id")


# ---------------------------------------------------------------------------
# X648 — grouped Kalman fold (applyInPandas, zero driver-side steps)
# ---------------------------------------------------------------------------


def _round_half_up(v: float, n: int) -> float:
    """Replicate Spark F.round on DoubleType: BigDecimal.valueOf(d)
    (shortest-roundtrip decimal string, == Python repr) then HALF_UP.
    Python's built-in round is banker's — NOT this."""
    return float(
        Decimal(repr(v)).quantize(Decimal(f"1e-{n}"), rounding=ROUND_HALF_UP)
    )


@query("q_kalman_1d_grouped", oracle=_KALMAN_ORACLE)
def q_kalman_1d_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X648 — q_kalman_1d's scale-safe production fold (VERDICT r8
    wrong #2): the identical 1-D constant-level Kalman recurrence
    (gain K = (P+Q)/(P+Q+R) rounded 8, state x ← x + K·(y−x) rounded
    6, variance P ← (1−K)(P+Q) rounded 8) as ONE applyInPandas over
    event_type — Kalman is sequential in t but embarrassingly parallel
    across keys, so the per-day driver job loop (q_kalman_1d runs one
    Spark job per DAY of series) collapses to a single shuffle plus a
    per-key Arrow-batched scan. Per-step rounding replicates Spark
    F.round's BigDecimal-HALF-UP semantics in pandas (see
    _round_half_up), so the SAME recursive-CTE oracle that pins
    q_kalman_1d pins this; q_kalman_1d stays registered as the
    unrolled correctness twin.

    Scale: the shuffled series is one row per (key, day) — calendar-
    bounded, thousands of rows per group at any corpus size; the fold
    never touches the driver."""
    e = load(spark, sf_dir, "events")
    counts = e.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count("*").cast("long").alias("y")
    )

    def kf(pdf):
        import pandas as pd

        pdf = pdf.sort_values("d")
        x, p = 0.0, _KF_P0
        ks, xs, ps = [], [], []
        for y in pdf["y"]:
            k = _round_half_up((p + _KF_Q) / (p + _KF_Q + _KF_R), 8)
            x = _round_half_up(x + k * (float(y) - x), 6)
            p = _round_half_up((1 - k) * (p + _KF_Q), 8)
            ks.append(k)
            xs.append(x)
            ps.append(p)
        return pd.DataFrame(
            {
                "event_type": pdf["event_type"].values,
                "d": pdf["d"].values,
                "y": pdf["y"].values,
                "k_gain": ks,
                "x_hat": xs,
                "p_var": ps,
            }
        )

    return counts.groupBy("event_type").applyInPandas(
        kf,
        schema="event_type string, d date, y long, "
        "k_gain double, x_hat double, p_var double",
    )


# ---------------------------------------------------------------------------
# X649 — retrieval evaluation: nDCG@10 / MRR@10 / recall@10 over ANN results
# ---------------------------------------------------------------------------

_EVAL_K = 10


def _dcg_weight_sql(rank: str) -> str:
    return f"(1.0 / log2({rank} + 1.0))"


_NDCG_ORACLE = f"""
    WITH corpus AS (
      SELECT vec_id AS n_id, embedding AS emb, label AS clbl
      FROM embeddings),
    anchors AS (
      SELECT vec_id AS q_id, embedding AS q_emb, label AS albl
      FROM embeddings WHERE vec_id % 25 = 0),
    cent AS (
      SELECT n_id AS c_id, emb AS c_emb FROM corpus WHERE n_id % 50 = 0),
    {{ivf}},
    rel_tot AS (
      SELECT a.q_id, count(*) AS n_rel
      FROM anchors a JOIN corpus c
        ON c.clbl = a.albl AND c.n_id <> a.q_id
      GROUP BY a.q_id),
    hits AS (
      SELECT q_id, rn,
             CASE WHEN clbl = albl THEN 1 ELSE 0 END AS rel
      FROM ivf_topk),
    per_q AS (
      SELECT h.q_id,
             round(sum(h.rel * {_dcg_weight_sql('h.rn')}), 10) AS dcg,
             CAST(sum(h.rel) AS BIGINT) AS n_hit,
             CAST(min(CASE WHEN h.rel = 1 THEN h.rn END) AS BIGINT)
               AS first_rel
      FROM hits h GROUP BY h.q_id),
    idcg AS (
      SELECT r.q_id,
             round(sum(CASE WHEN d.d <= least(r.n_rel, {_EVAL_K})
                       THEN {_dcg_weight_sql('d.d')} ELSE 0 END), 10)
               AS idcg, r.n_rel
      FROM rel_tot r CROSS JOIN
           (SELECT unnest(range(1, {_EVAL_K} + 1)) AS d) d
      GROUP BY r.q_id, r.n_rel),
    scored AS (
      SELECT p.q_id,
             round(p.dcg / i.idcg, 10) AS ndcg,
             round(CASE WHEN p.first_rel IS NULL THEN 0.0
                   ELSE 1.0 / p.first_rel END, 10) AS rr,
             round(p.n_hit * 1.0 / least(i.n_rel, {_EVAL_K}), 10)
               AS recall
      FROM per_q p JOIN idcg i ON i.q_id = p.q_id)
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           round(avg(ndcg), 6) AS mean_ndcg,
           round(avg(rr), 6) AS mean_mrr,
           round(avg(recall), 6) AS mean_recall
    FROM scored
    """.format(ivf=_ann.ivf_search_sql(
        "corpus", "anchors", "cent", k=_EVAL_K, nprobe=_MM_NPROBE,
        corpus_extra=("clbl",), query_extra=("albl",)))


@query("q_ndcg_mrr", oracle=_NDCG_ORACLE)
def q_ndcg_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X649 — retrieval-quality evaluation (nDCG@10, MRR@10, recall@10)
    of the ANN serving path itself: anchors (4% sample) search the
    corpus through operators/ann.ivf_search, a hit is a same-label
    neighbor, and the three standard ranking metrics aggregate per
    anchor then average. This is the eval harness an embedding-based
    retrieval/dedup deployment runs after every index build; the
    DuckDB oracle replays the identical routing (ivf_search_sql), so
    the measured numbers are pinned, not sampled. IDCG truncates at
    min(R, k) with R = the anchor's total same-label population —
    textbook nDCG. Per-anchor values round(10) before the round(6)
    means; ranks use the ANN's (score DESC, n_id) tie-break.

    Scale: metric cost is one groupBy over the ANN result set (q×k
    rows) plus a label-count broadcast — negligible next to the
    search it audits."""
    emb = load(spark, sf_dir, "embeddings")
    corpus = emb.select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").alias("emb"),
        F.col("label").alias("clbl"),
    )
    anchors = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("albl"),
    )
    topk = _ann.ivf_search(
        corpus, anchors, k=_EVAL_K, nprobe=_MM_NPROBE,
        every=_MM_EVERY, residue=0,
    )
    rel_tot = (
        anchors.join(
            corpus,
            (corpus["clbl"] == anchors["albl"])
            & (corpus["n_id"] != anchors["q_id"]),
        )
        .groupBy("q_id")
        .agg(F.count("*").alias("n_rel"))
    )
    dcg_w = 1.0 / F.log2(F.col("rn") + 1.0)
    per_q = (
        topk.withColumn("rel", (F.col("clbl") == F.col("albl")).cast("int"))
        .groupBy("q_id")
        .agg(
            F.round(F.sum(F.col("rel") * dcg_w), 10).alias("dcg"),
            F.sum("rel").cast("long").alias("n_hit"),
            F.min(F.when(F.col("rel") == 1, F.col("rn")))
            .cast("long")
            .alias("first_rel"),
        )
    )
    depths = spark.range(1, _EVAL_K + 1).select(F.col("id").alias("d"))
    idcg = (
        rel_tot.crossJoin(F.broadcast(depths))
        .groupBy("q_id", "n_rel")
        .agg(
            F.round(
                F.sum(
                    F.when(
                        F.col("d") <= F.least(F.col("n_rel"), F.lit(_EVAL_K)),
                        1.0 / F.log2(F.col("d") + 1.0),
                    ).otherwise(0.0)
                ),
                10,
            ).alias("idcg")
        )
    )
    scored = per_q.join(idcg, "q_id").select(
        "q_id",
        F.round(F.col("dcg") / F.col("idcg"), 10).alias("ndcg"),
        F.round(
            F.when(F.col("first_rel").isNull(), 0.0).otherwise(
                1.0 / F.col("first_rel")
            ),
            10,
        ).alias("rr"),
        F.round(
            F.col("n_hit") / F.least(F.col("n_rel"), F.lit(_EVAL_K)), 10
        ).alias("recall"),
    )
    return scored.agg(
        F.count("*").cast("long").alias("n_queries"),
        F.round(F.avg("ndcg"), 6).alias("mean_ndcg"),
        F.round(F.avg("rr"), 6).alias("mean_mrr"),
        F.round(F.avg("recall"), 6).alias("mean_recall"),
    )


# ---------------------------------------------------------------------------
# X650 — pass@k (unbiased estimator, Chen et al. 2021)
# ---------------------------------------------------------------------------

_PASS_THRESH = 100.0
_PASS_KS = (1, 5, 10)


def _pass_prod_sql(k: int) -> str:
    """1 - prod_{i=0..k-1} round(greatest(n-c-i,0)/(n-i), 10), factors
    multiplied left-to-right — identical association on both engines."""
    factors = " * ".join(
        f"round(greatest(n - c - {i}, 0) * 1.0 / (n - {i}), 10)"
        for i in range(k)
    )
    return f"round(1.0 - {factors}, 10)"


_PASS_ORACLE = "\nUNION ALL\n".join(
    f"""
    SELECT CAST({k} AS BIGINT) AS k,
           CAST(count(*) AS BIGINT) AS n_prompts,
           round(avg(p), 6) AS mean_pass
    FROM (
      SELECT {_pass_prod_sql(k)} AS p
      FROM (SELECT user_id, count(*) AS n,
                   sum(CASE WHEN value >= {_PASS_THRESH} THEN 1 ELSE 0 END)
                     AS c
            FROM events GROUP BY user_id)
      WHERE n >= {k})
    """
    for k in _PASS_KS
)


@query("q_pass_at_k", oracle=_PASS_ORACLE)
def q_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X650 — pass@k with the unbiased estimator (Chen et al. 2021,
    Codex): per prompt (user) with n trials and c passes
    (value >= 100), pass@k = 1 − C(n−c,k)/C(n,k), computed as the
    telescoped product Π (n−c−i)/(n−i) — no factorials, no overflow —
    with each factor rounded(10) and multiplied left-to-right so both
    engines run the identical float sequence. Averaged over prompts
    with n ≥ k for k ∈ (1, 5, 10): THE completion-eval curve every
    code/reasoning benchmark reports.

    Scale: one groupBy(user) for (n, c), then constant arithmetic per
    prompt — map-side combinable counts, nothing else."""
    e = load(spark, sf_dir, "events")
    nc = e.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum((F.col("value") >= _PASS_THRESH).cast("int")).alias("c"),
    )
    return pass_at_k_from_counts(nc)


def pass_at_k_from_counts(nc: DataFrame) -> DataFrame:
    """(user_id, n, c) → the q_pass_at_k output shape. Shared by the
    batch query and the streaming counts store's read side
    (streaming/pipeline.pass_at_k_from_store), so incremental == batch
    is by construction — (n, c) are additive integers, the cleanest
    possible merged-store state."""
    outs = []
    for k in _PASS_KS:
        prod = None
        for i in range(k):
            fac = F.round(
                F.greatest(F.col("n") - F.col("c") - i, F.lit(0))
                * 1.0
                / (F.col("n") - i),
                10,
            )
            prod = fac if prod is None else prod * fac
        p = F.round(1.0 - prod, 10)
        outs.append(
            nc.filter(F.col("n") >= k)
            .select(p.alias("p"))
            .agg(
                F.lit(k).cast("long").alias("k"),
                F.count("*").cast("long").alias("n_prompts"),
                F.round(F.avg("p"), 6).alias("mean_pass"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# ---------------------------------------------------------------------------
# X651 — rank-biased overlap between two rankings (Webber et al. 2010)
# ---------------------------------------------------------------------------

_RBO_K = 50
_RBO_P = 0.5  # top-weightedness; 0.5^d is float-EXACT (power of two)

_RBO_ORACLE = f"""
    WITH ra AS (
      SELECT user_id, row_number() OVER (
               ORDER BY sum(CAST(round(value * 100) AS BIGINT)) DESC,
                        user_id) AS r
      FROM events GROUP BY user_id),
    rb AS (
      SELECT user_id, row_number() OVER (
               ORDER BY count(*) DESC, user_id) AS r
      FROM events GROUP BY user_id),
    pairs AS (
      SELECT greatest(ra.r, rb.r) AS mx
      FROM ra JOIN rb ON ra.user_id = rb.user_id
      WHERE ra.r <= {_RBO_K} AND rb.r <= {_RBO_K}),
    depths AS (SELECT unnest(range(1, {_RBO_K} + 1)) AS d),
    xd AS (
      SELECT d.d,
             (SELECT count(*) FROM pairs WHERE pairs.mx <= d.d) AS x
      FROM depths d),
    terms AS (
      SELECT round(power({_RBO_P}, d - 1) * x / d, 10) AS term,
             CASE WHEN d = {_RBO_K} THEN x END AS x_at_k
      FROM xd)
    SELECT CAST({_RBO_K} AS BIGINT) AS k,
           round((1 - {_RBO_P}) * sum(term), 6) AS rbo,
           round(max(x_at_k) * 1.0 / {_RBO_K}, 6) AS overlap_at_k
    FROM terms
    """


@query("q_rbo", oracle=_RBO_ORACLE)
def q_rbo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X651 — rank-biased overlap (Webber, Moffat & Zobel 2010) between
    the revenue ranking and the activity ranking of users:
    RBO@K = (1−p)·Σ_{{d≤K}} p^(d−1)·|A_d ∩ B_d|/d — the top-weighted,
    non-conjoint rank-similarity measure used to compare retrieval
    runs, feed rankers, and leaderboard versions (Kendall tau treats
    depth 1 and depth 1000 alike; RBO does not). p = 0.5 here: every
    p^(d−1) is a power of two, float-exact on both engines. Revenue
    ranks sum integer cents (associative); overlap-at-depth X_d comes
    from each shared user's max(rank_a, rank_b) — integers until the
    final rounded terms.

    Scale: two user-grain aggregates + a K-row depth table; the
    windowed rankings are the only shuffles."""
    e = load(spark, sf_dir, "events")
    from pyspark.sql.window import Window as W

    ra = (
        e.groupBy("user_id")
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("s"))
        .select(
            "user_id",
            F.row_number()
            .over(W.orderBy(F.desc("s"), "user_id"))
            .alias("r_a"),
        )
    )
    rb = (
        e.groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
        .select(
            "user_id",
            F.row_number()
            .over(W.orderBy(F.desc("cnt"), "user_id"))
            .alias("r_b"),
        )
    )
    pairs = (
        ra.join(rb, "user_id")
        .filter((F.col("r_a") <= _RBO_K) & (F.col("r_b") <= _RBO_K))
        .select(F.greatest("r_a", "r_b").alias("mx"))
    )
    depths = spark.range(1, _RBO_K + 1).select(F.col("id").alias("d"))
    xd = (
        depths.crossJoin(pairs)
        .groupBy("d")
        .agg(F.sum((F.col("mx") <= F.col("d")).cast("long")).alias("x"))
    )
    terms = xd.select(
        F.round(
            F.pow(F.lit(_RBO_P), F.col("d") - 1) * F.col("x") / F.col("d"),
            10,
        ).alias("term"),
        F.when(F.col("d") == _RBO_K, F.col("x")).alias("x_at_k"),
    )
    return terms.agg(
        F.lit(_RBO_K).cast("long").alias("k"),
        F.round((1 - _RBO_P) * F.sum("term"), 6).alias("rbo"),
        F.round(F.max("x_at_k") * 1.0 / _RBO_K, 6).alias("overlap_at_k"),
    )


# ---------------------------------------------------------------------------
# X652 — importance-sampling diagnostics (ESS, clipping)
# ---------------------------------------------------------------------------

_ESS_CAP = 5.0

_ESS_ORACLE = f"""
    WITH b AS (
      SELECT least(CAST(floor(value / 50) AS BIGINT), 9) AS bucket,
             event_type
      FROM events WHERE event_type IN ('click', 'purchase')),
    nb AS (
      SELECT bucket,
             sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS nc_b,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS np_b
      FROM b GROUP BY bucket),
    tot AS (
      SELECT sum(nc_b) AS nc, sum(np_b) AS np FROM nb),
    w AS (
      SELECT nb.bucket, nb.nc_b,
             round((nb.np_b * 1.0 / tot.np) / (nb.nc_b * 1.0 / tot.nc), 10)
               AS w_b
      FROM nb, tot WHERE nb.nc_b > 0),
    s AS (
      SELECT sum(nc_b * w_b) AS sw,
             sum(nc_b * round(w_b * w_b, 10)) AS sw2,
             max(w_b) AS max_w,
             sum(nc_b * least(w_b, {_ESS_CAP})) AS swc,
             sum(nc_b * round(least(w_b, {_ESS_CAP})
                              * least(w_b, {_ESS_CAP}), 10)) AS swc2
      FROM w)
    SELECT CAST(tot.nc AS BIGINT) AS n_proposal,
           CAST(tot.np AS BIGINT) AS n_target,
           round(s.sw * s.sw / s.sw2, 6) AS ess,
           round(s.sw * s.sw / s.sw2 / tot.nc, 6) AS ess_frac,
           round(s.max_w, 6) AS max_w,
           round(s.swc * s.swc / s.swc2, 6) AS ess_clipped,
           round(s.swc / s.sw, 6) AS clip_mass
    FROM s, tot
    """


@query("q_ess_diagnostics", oracle=_ESS_ORACLE)
def q_ess_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X652 — importance-sampling diagnostics for distribution shift:
    reweight the click population to the purchase population via the
    bucketed density ratio w(b) = P_target(b)/P_proposal(b) (10
    fixed-width value buckets — count ratios, exact integers until
    the one rounded division), then report Kish effective sample size
    (Σw)²/Σw², its fraction of n, the max weight, and the same under
    weight clipping at 5 (the truncated-IS estimator every off-policy
    eval uses when ESS collapses). Low ESS says the proposal barely
    covers the target — THE go/no-go check before reweighted training
    or off-policy evaluation.

    Scale: one bucket-grain aggregate (10 rows) after a dual-filter
    scan; everything else is scalar arithmetic."""
    e = load(spark, sf_dir, "events")
    b = e.filter(F.col("event_type").isin("click", "purchase")).select(
        F.least(F.floor(F.col("value") / 50).cast("long"), F.lit(9)).alias(
            "bucket"
        ),
        "event_type",
    )
    nb = b.groupBy("bucket").agg(
        F.sum((F.col("event_type") == "click").cast("long")).alias("nc_b"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias(
            "np_b"
        ),
    )
    tot = nb.agg(
        F.sum("nc_b").alias("nc"), F.sum("np_b").alias("np")
    )
    w = (
        nb.crossJoin(F.broadcast(tot))
        .filter(F.col("nc_b") > 0)
        .select(
            "nc_b",
            F.round(
                (F.col("np_b") * 1.0 / F.col("np"))
                / (F.col("nc_b") * 1.0 / F.col("nc")),
                10,
            ).alias("w_b"),
        )
    )
    wc = F.least(F.col("w_b"), F.lit(_ESS_CAP))
    s = w.agg(
        F.sum(F.col("nc_b") * F.col("w_b")).alias("sw"),
        F.sum(
            F.col("nc_b") * F.round(F.col("w_b") * F.col("w_b"), 10)
        ).alias("sw2"),
        F.max("w_b").alias("max_w"),
        F.sum(F.col("nc_b") * wc).alias("swc"),
        F.sum(F.col("nc_b") * F.round(wc * wc, 10)).alias("swc2"),
    )
    return s.crossJoin(tot).select(
        F.col("nc").cast("long").alias("n_proposal"),
        F.col("np").cast("long").alias("n_target"),
        F.round(F.col("sw") * F.col("sw") / F.col("sw2"), 6).alias("ess"),
        F.round(
            F.col("sw") * F.col("sw") / F.col("sw2") / F.col("nc"), 6
        ).alias("ess_frac"),
        F.round("max_w", 6).alias("max_w"),
        F.round(F.col("swc") * F.col("swc") / F.col("swc2"), 6).alias(
            "ess_clipped"
        ),
        F.round(F.col("swc") / F.col("sw"), 6).alias("clip_mass"),
    )


# ---------------------------------------------------------------------------
# X653 — generation diversity: distinct-n ratios per language
# ---------------------------------------------------------------------------

from ..functions import text as _text  # noqa: E402
from .round8b import _ngrams, _ngrams_sql  # noqa: E402

_DISTINCT_ORACLE = "\nUNION ALL\n".join(
    f"""
    SELECT lang, CAST({n} AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS total_grams,
           CAST(count(DISTINCT g) AS BIGINT) AS distinct_grams,
           round(count(DISTINCT g) * 1.0 / count(*), 6) AS distinct_ratio
    FROM (
      SELECT lang, unnest({_ngrams_sql(_text.tokens_sql('text'), n)}) AS g
      FROM documents)
    GROUP BY lang
    """
    for n in (1, 2, 3)
)


@query("q_distinct_n", oracle=_DISTINCT_ORACLE)
def q_distinct_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X653 — distinct-n (Li et al. 2016): the fraction of n-gram
    tokens that are unique, per language, for n = 1..3 — the standard
    corpus/generation diversity dial (mode-collapsed generations and
    template-heavy crawls both crater distinct-2). Pure
    explode→count-distinct per order; the repetition complement of
    q_intra_doc_repetition (within-doc) at corpus grain.

    Scale: one (lang, gram) shuffle per order — word-count shaped;
    count(DISTINCT) over 16-byte-ish grams, never texts."""
    # tokenize once (checkpointed, parallel) — the three n-gram orders
    # below each re-ran the corpus tokenization over the single-split
    # scan (guide §2.4/§2.6)
    toks = (
        load(spark, sf_dir, "documents")
        .repartition(default_parallelism())
        .select("lang", _text.tokens(F.col("text")).alias("t"))
        .localCheckpoint(eager=True)
    )
    outs = []
    for n in (1, 2, 3):
        grams = toks.select(
            "lang",
            F.explode(_ngrams(F.col("t"), n)).alias("g"),
        )
        outs.append(
            grams.groupBy("lang").agg(
                F.lit(n).cast("long").alias("n"),
                F.count("*").cast("long").alias("total_grams"),
                F.countDistinct("g").cast("long").alias("distinct_grams"),
                F.round(
                    F.countDistinct("g") * 1.0 / F.count("*"), 6
                ).alias("distinct_ratio"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.select(
        "lang", "n", "total_grams", "distinct_grams", "distinct_ratio"
    )


# ---------------------------------------------------------------------------
# X654 — dataset cartography (training-dynamics data map)
# ---------------------------------------------------------------------------

_DM_THRESH = 100.0

_DATA_MAP_ORACLE = f"""
    WITH pd AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             round(sum(CASE WHEN value >= {_DM_THRESH} THEN 1 ELSE 0 END)
                   * 1.0 / count(*), 10) AS p
      FROM events GROUP BY user_id, CAST(ts AS DATE)),
    mo AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_epochs,
             round(avg(p), 10) AS m1,
             round(avg(round(p * p, 10)), 10) AS m2,
             round(avg(CASE WHEN p > 0.5 THEN 1.0 ELSE 0.0 END), 10)
               AS corr
      FROM pd GROUP BY user_id)
    SELECT user_id, n_epochs,
           round(m1, 6) AS confidence,
           round(sqrt(greatest(round(m2 - round(m1 * m1, 10), 10), 0)), 6)
             AS variability,
           round(corr, 6) AS correctness,
           CASE WHEN sqrt(greatest(round(m2 - round(m1 * m1, 10), 10), 0))
                     >= 0.2 THEN 'ambiguous'
                WHEN m1 >= 0.5 THEN 'easy' ELSE 'hard' END AS quadrant
    FROM mo
    """


@query("q_data_map", oracle=_DATA_MAP_ORACLE)
def q_data_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X654 — dataset cartography (Swayamdipta et al. 2020): treat each
    day as a training epoch and each user as a sample; the per-epoch
    "correctness" p is the fraction of that sample's events clearing
    the reward bar. Confidence = mean_epoch(p), variability =
    population std of p, correctness = fraction of epochs with p > ½;
    the (confidence, variability) plane splits the data into
    easy-to-learn / ambiguous / hard-to-learn — the map used to pick
    fine-tuning subsets (ambiguous helps most) and to flag label noise
    (hard + low variability). Moments from rounded per-epoch values;
    std via the rounded m2 − m1² identity on both engines.

    Scale: two grouped aggregates (user×day, then user) — the same
    shuffle a daily rollup already pays."""
    e = load(spark, sf_dir, "events")
    cells = e.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.sum((F.col("value") >= _DM_THRESH).cast("long")).alias("n_pass"),
        F.count("*").alias("n"),
    )
    return data_map_from_cells(cells)


def data_map_from_cells(cells: DataFrame) -> DataFrame:
    """(user_id, d, n_pass, n) epoch cells → the q_data_map output
    shape. Shared by the batch query and the streaming cells store's
    read side (streaming/pipeline.data_map_from_store): the cell
    counts are additive integers, so the live map equals the batch map
    by associativity."""
    pd_ = cells.select(
        "user_id",
        F.round(F.col("n_pass") * 1.0 / F.col("n"), 10).alias("p"),
    )
    mo = pd_.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_epochs"),
        F.round(F.avg("p"), 10).alias("m1"),
        F.round(F.avg(F.round(F.col("p") * F.col("p"), 10)), 10).alias(
            "m2"
        ),
        F.round(
            F.avg(F.when(F.col("p") > 0.5, 1.0).otherwise(0.0)), 10
        ).alias("corr"),
    )
    var = F.greatest(
        F.round(F.col("m2") - F.round(F.col("m1") * F.col("m1"), 10), 10),
        F.lit(0.0),
    )
    return mo.select(
        "user_id",
        "n_epochs",
        F.round("m1", 6).alias("confidence"),
        F.round(F.sqrt(var), 6).alias("variability"),
        F.round("corr", 6).alias("correctness"),
        F.when(F.sqrt(var) >= 0.2, "ambiguous")
        .when(F.col("m1") >= 0.5, "easy")
        .otherwise("hard")
        .alias("quadrant"),
    )


# ---------------------------------------------------------------------------
# X655 — Dawid-Skene label model (2 unrolled EM rounds, binary)
# ---------------------------------------------------------------------------

_DS_EPS = 1e-6


def _ds_clamp_sql(x: str) -> str:
    return f"least(greatest({x}, {_DS_EPS}), 1 - {_DS_EPS})"


_DAWID_SKENE_ORACLE = f"""
    WITH votes AS (
      SELECT user_id AS item, event_type AS annot,
             CASE WHEN sum(CAST(round(value * 100) AS BIGINT))
                       > 3500 * count(*) THEN 1 ELSE 0 END AS v
      FROM events GROUP BY user_id, event_type),
    q0 AS (
      SELECT item, round(avg(v * 1.0), 10) AS q
      FROM votes GROUP BY item),
    acc1 AS (
      SELECT v.annot,
             round({_ds_clamp_sql(
                 "sum(CASE WHEN v.v = 1 THEN q0.q ELSE 1 - q0.q END)"
                 " / count(*)")}, 10) AS acc
      FROM votes v JOIN q0 ON q0.item = v.item
      GROUP BY v.annot),
    pi1 AS (SELECT round(avg(q), 10) AS pi FROM q0),
    ll AS (
      SELECT v.item,
             round(sum(round(ln(CASE WHEN v.v = 1 THEN a.acc
                                ELSE 1 - a.acc END), 10)), 10) AS s1,
             round(sum(round(ln(CASE WHEN v.v = 0 THEN a.acc
                                ELSE 1 - a.acc END), 10)), 10) AS s0
      FROM votes v JOIN acc1 a ON a.annot = v.annot
      GROUP BY v.item),
    q1 AS (
      SELECT ll.item,
             round(1.0 / (1.0 + exp(
               round((round(ln(1 - pi1.pi), 10) + ll.s0)
                     - (round(ln(pi1.pi), 10) + ll.s1), 10))), 10) AS q
      FROM ll, pi1),
    acc2 AS (
      SELECT v.annot,
             CAST(count(*) AS BIGINT) AS n_items,
             round({_ds_clamp_sql(
                 "sum(CASE WHEN v.v = 1 THEN q1.q ELSE 1 - q1.q END)"
                 " / count(*)")}, 10) AS acc
      FROM votes v JOIN q1 ON q1.item = v.item
      GROUP BY v.annot)
    SELECT annot AS annotator, n_items,
           round(acc, 6) AS accuracy,
           round((SELECT avg(q) FROM q1), 6) AS prevalence
    FROM acc2
    """


@query("q_dawid_skene", oracle=_DAWID_SKENE_ORACLE)
def q_dawid_skene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X655 — Dawid-Skene label model (1979; the weak-supervision /
    rater-quality workhorse behind Snorkel-style labeling and RLHF
    rater audits), binary symmetric-accuracy variant, 2 unrolled EM
    rounds: items = users, annotators = event types, a vote is
    whether the annotator's integer-cent average for the item clears
    the bar (exact integer comparison). Init posterior = majority
    fraction; M-step re-estimates each annotator's accuracy as its
    posterior-weighted agreement; E-step recomputes item posteriors
    in log space (clamped accuracies, per-term round(10) — the
    unrolled-iteration discipline). Output: per-annotator estimated
    accuracy + the class prevalence — the numbers that tell you which
    rater stream to trust and how much.

    Scale: votes are one (user, event_type) aggregate; each EM round
    is one join + one annotator-grain groupBy — annotators are few,
    items arbitrarily many."""
    e = load(spark, sf_dir, "events")
    votes = e.groupBy(
        F.col("user_id").alias("item"), F.col("event_type").alias("annot")
    ).agg(
        F.when(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            > 3500 * F.count("*"),
            1,
        )
        .otherwise(0)
        .alias("v")
    )
    q0 = votes.groupBy("item").agg(
        F.round(F.avg(F.col("v") * 1.0), 10).alias("q")
    )

    def clamp(c):
        return F.least(
            F.greatest(c, F.lit(_DS_EPS)), F.lit(1 - _DS_EPS)
        )

    acc1 = (
        votes.join(q0, "item")
        .groupBy("annot")
        .agg(
            F.round(
                clamp(
                    F.sum(
                        F.when(F.col("v") == 1, F.col("q")).otherwise(
                            1 - F.col("q")
                        )
                    )
                    / F.count("*")
                ),
                10,
            ).alias("acc")
        )
    )
    pi1 = q0.agg(F.round(F.avg("q"), 10).alias("pi"))
    ll = (
        votes.join(acc1, "annot")
        .groupBy("item")
        .agg(
            F.round(
                F.sum(
                    F.round(
                        F.log(
                            F.when(F.col("v") == 1, F.col("acc")).otherwise(
                                1 - F.col("acc")
                            )
                        ),
                        10,
                    )
                ),
                10,
            ).alias("s1"),
            F.round(
                F.sum(
                    F.round(
                        F.log(
                            F.when(F.col("v") == 0, F.col("acc")).otherwise(
                                1 - F.col("acc")
                            )
                        ),
                        10,
                    )
                ),
                10,
            ).alias("s0"),
        )
    )
    q1 = ll.crossJoin(F.broadcast(pi1)).select(
        "item",
        F.round(
            1.0
            / (
                1.0
                + F.exp(
                    F.round(
                        (F.round(F.log(1 - F.col("pi")), 10) + F.col("s0"))
                        - (F.round(F.log(F.col("pi")), 10) + F.col("s1")),
                        10,
                    )
                )
            ),
            10,
        ).alias("q"),
    )
    prev = q1.agg(F.round(F.avg("q"), 6).alias("prevalence"))
    acc2 = (
        votes.join(q1, "item")
        .groupBy("annot")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.round(
                clamp(
                    F.sum(
                        F.when(F.col("v") == 1, F.col("q")).otherwise(
                            1 - F.col("q")
                        )
                    )
                    / F.count("*")
                ),
                10,
            ).alias("acc"),
        )
    )
    return acc2.crossJoin(F.broadcast(prev)).select(
        F.col("annot").alias("annotator"),
        "n_items",
        F.round("acc", 6).alias("accuracy"),
        "prevalence",
    )


# ---------------------------------------------------------------------------
# X656 — Krippendorff's alpha (nominal, coincidence-matrix identity)
# ---------------------------------------------------------------------------

_KRIPP_ORACLE = """
    WITH votes AS (
      SELECT user_id AS item, event_type AS annot,
             CASE WHEN sum(CAST(round(value * 100) AS BIGINT))
                       < 3000 * count(*) THEN 0
                  WHEN sum(CAST(round(value * 100) AS BIGINT))
                       < 6000 * count(*) THEN 1 ELSE 2 END AS c
      FROM events GROUP BY user_id, event_type),
    per_item AS (
      SELECT item, count(*) AS m, sum(nc * nc) AS ss
      FROM (SELECT item, c, count(*) AS nc FROM votes GROUP BY item, c)
      GROUP BY item HAVING count(*) >= 0),
    mu AS (
      SELECT v.item, count(*) AS m_u
      FROM votes v GROUP BY v.item HAVING count(*) >= 2),
    du AS (
      SELECT mu.item,
             round((mu.m_u * mu.m_u - pi.ss) * 1.0 / (mu.m_u - 1), 10)
               AS d_u
      FROM mu JOIN (
        SELECT item, sum(nc * nc) AS ss
        FROM (SELECT item, c, count(*) AS nc FROM votes GROUP BY item, c)
        GROUP BY item) pi ON pi.item = mu.item),
    marg AS (
      SELECT sum(n_c * n_c) AS ssc, sum(n_c) AS n
      FROM (SELECT v.c, count(*) AS n_c
            FROM votes v JOIN mu ON mu.item = v.item
            GROUP BY v.c)),
    agg AS (
      SELECT (SELECT round(sum(d_u), 10) FROM du) AS d_o,
             (SELECT round((n * n - ssc) * 1.0 / (n - 1), 10) FROM marg)
               AS d_e,
             (SELECT CAST(count(*) AS BIGINT) FROM mu) AS n_items,
             (SELECT CAST(n AS BIGINT) FROM marg) AS n_votes)
    SELECT n_items, n_votes,
           round(d_o, 6) AS d_o, round(d_e, 6) AS d_e,
           round(1.0 - d_o / d_e, 6) AS alpha
    FROM agg
    """


@query("q_krippendorff_alpha", oracle=_KRIPP_ORACLE)
def q_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X656 — Krippendorff's alpha (nominal data): the chance-corrected
    inter-annotator agreement that, unlike Cohen's/Fleiss' kappa
    (q_cohens_kappa, q_fleiss_kappa), natively handles MISSING votes
    and any number of annotators — the measure annotation guidelines
    actually standardize on (alpha ≥ 0.8 publishable, ≥ 0.667
    tentative). Items = users, annotators = event types, 3 ordinal-ish
    categories from exact integer-cent thresholds. Computed via the
    coincidence identity: per-item disagreement (m_u² − Σ_c n_uc²)/
    (m_u−1) — integers up to the one rounded division — against the
    expected (n² − Σ_c n_c²)/(n−1) over items with ≥ 2 votes.

    Scale: one (item, annotator) aggregate, one (item, category)
    count, two scalar folds."""
    e = load(spark, sf_dir, "events")
    cents = F.sum(F.round(F.col("value") * 100).cast("long"))
    votes = e.groupBy(
        F.col("user_id").alias("item"), F.col("event_type").alias("annot")
    ).agg(
        F.when(cents < 3000 * F.count("*"), 0)
        .when(cents < 6000 * F.count("*"), 1)
        .otherwise(2)
        .alias("c")
    )
    mu = votes.groupBy("item").agg(F.count("*").alias("m_u")).filter(
        F.col("m_u") >= 2
    )
    per_cat = votes.groupBy("item", "c").agg(F.count("*").alias("nc"))
    ss = per_cat.groupBy("item").agg(
        F.sum(F.col("nc") * F.col("nc")).alias("ss")
    )
    du = mu.join(ss, "item").select(
        F.round(
            (F.col("m_u") * F.col("m_u") - F.col("ss"))
            * 1.0
            / (F.col("m_u") - 1),
            10,
        ).alias("d_u")
    )
    d_o = du.agg(F.round(F.sum("d_u"), 10).alias("d_o"))
    marg = (
        votes.join(mu.select("item"), "item")
        .groupBy("c")
        .agg(F.count("*").alias("n_c"))
        .agg(
            F.sum(F.col("n_c") * F.col("n_c")).alias("ssc"),
            F.sum("n_c").alias("n"),
        )
    )
    n_items = mu.agg(F.count("*").cast("long").alias("n_items"))
    return (
        d_o.crossJoin(marg)
        .crossJoin(n_items)
        .select(
            "n_items",
            F.col("n").cast("long").alias("n_votes"),
            F.round("d_o", 6).alias("d_o"),
            F.round(
                (F.col("n") * F.col("n") - F.col("ssc"))
                * 1.0
                / (F.col("n") - 1),
                10,
            ).alias("d_e10"),
        )
        .select(
            "n_items",
            "n_votes",
            "d_o",
            F.round("d_e10", 6).alias("d_e"),
            F.round(1.0 - F.col("d_o") / F.col("d_e10"), 6).alias("alpha"),
        )
    )


# ---------------------------------------------------------------------------
# X657 — DoReMi/Group-DRO-style domain reweighting (unrolled MW rounds)
# ---------------------------------------------------------------------------

_DRM_ETA = 0.5
_DRM_ALPHA = 1.0
_DRM_T = 5


def _doremi_oracle() -> str:
    ctes = [
        """base AS (
      SELECT source,
             round(ln(1.0 + sum(n_chars) / (100.0 * count(*))), 10)
               AS loss
      FROM documents GROUP BY source),
    nd AS (SELECT count(*) AS d FROM base),
    w0 AS (
      SELECT b.source, b.loss, round(1.0 / nd.d, 10) AS w
      FROM base b, nd)"""
    ]
    for t in range(1, _DRM_T + 1):
        p, c = f"w{t - 1}", f"w{t}"
        ctes.append(
            f"""u{t} AS (
      SELECT source, loss,
             round(w * exp({_DRM_ETA} * (loss - {_DRM_ALPHA} * w)), 10)
               AS uw
      FROM {p}),
    s{t} AS (SELECT round(sum(uw), 10) AS z FROM u{t}),
    {c} AS (
      SELECT u.source, u.loss, round(u.uw / s.z, 10) AS w
      FROM u{t} u, s{t} s)"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT w.source, round(w.loss, 6) AS base_loss,
           round(w.w, 6) AS weight,
           round(w.w - 1.0 / nd.d, 6) AS delta_vs_uniform
    FROM w{_DRM_T} w, nd
    """
    )


@query("q_doremi_weights", oracle=_doremi_oracle())
def q_doremi_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X657 — DoReMi-style domain reweighting (Xie et al. 2023 /
    Group-DRO multiplicative weights): per-source excess-loss proxy
    (log char volume per doc — the domains a proxy model finds hard),
    then T=5 unrolled multiplicative-weight rounds
    w ← normalize(w·exp(η(L − α·w))) with a diminishing-returns
    response (−α·w models the proxy learning a domain as it gets
    weight — without it the update degenerates to a one-shot softmax).
    Output: the trained sampling weight per domain vs uniform — the
    mixture a DoReMi run hands the main training job. Per-round
    round(10) on update and normalizer keeps both engines'
    trajectories bit-identical (unrolled-iteration discipline).

    Scale: the data-sized work is ONE groupBy(source) for the loss
    proxy; the MW rounds iterate over a domain-count-sized frame
    (tiny) — driver-side loop count is the constant T, not data."""
    d = load(spark, sf_dir, "documents")
    base = d.groupBy("source").agg(
        F.round(
            F.log(1.0 + F.sum("n_chars") / (100.0 * F.count("*"))), 10
        ).alias("loss")
    )
    nd = base.agg(F.count("*").alias("d"))
    w = base.crossJoin(F.broadcast(nd)).select(
        "source",
        "loss",
        F.round(1.0 / F.col("d"), 10).alias("w"),
    ).localCheckpoint(eager=True)
    for _ in range(_DRM_T):
        u = w.select(
            "source",
            "loss",
            F.round(
                F.col("w")
                * F.exp(_DRM_ETA * (F.col("loss") - _DRM_ALPHA * F.col("w"))),
                10,
            ).alias("uw"),
        )
        z = u.agg(F.round(F.sum("uw"), 10).alias("z"))
        w = u.crossJoin(F.broadcast(z)).select(
            "source",
            "loss",
            F.round(F.col("uw") / F.col("z"), 10).alias("w"),
        ).localCheckpoint(eager=True)
    return w.crossJoin(F.broadcast(nd)).select(
        "source",
        F.round("loss", 6).alias("base_loss"),
        F.round("w", 6).alias("weight"),
        F.round(F.col("w") - 1.0 / F.col("d"), 6).alias("delta_vs_uniform"),
    )


# ---------------------------------------------------------------------------
# X658 — greedy facility-location selection over the ANN-sparsified graph
# ---------------------------------------------------------------------------

_FL_K = 4  # facilities to select (greedy rounds)
_FL_EDGE_K = 5  # ANN out-degree of the similarity graph


def _facility_oracle() -> str:
    ivf = _ann.ivf_search_sql(
        "corpus", "qs", "cent", k=_FL_EDGE_K, nprobe=_MM_NPROBE,
        prefix="fl_",
    )
    ctes = [
        """corpus AS (
      SELECT vec_id AS n_id, embedding AS emb FROM embeddings),
    qs AS (
      SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings),
    cent AS (
      SELECT n_id AS c_id, emb AS c_emb FROM corpus
      WHERE n_id % greatest(2, CAST(floor(sqrt(CAST(
        (SELECT count(*) FROM corpus) AS DOUBLE))) AS BIGINT)) = 0)""",
        ivf,
        """edges AS MATERIALIZED (
      SELECT q_id AS v, n_id AS c, greatest(score, 0.0) AS s
      FROM fl_topk),
    cur0 AS MATERIALIZED (SELECT n_id AS v, 0.0 AS cur FROM corpus)""",
    ]
    # cur{t} is referenced three times downstream (g, cur, tot) — without
    # MATERIALIZED DuckDB inlines the chain and re-evaluates it ~3^K times
    for t in range(1, _FL_K + 1):
        p = t - 1
        ctes.append(
            f"""g{t} AS (
      SELECT e.c, round(sum(greatest(e.s - cur.cur, 0.0)), 10) AS gain
      FROM edges e JOIN cur{p} cur ON cur.v = e.v
      GROUP BY e.c),
    w{t} AS MATERIALIZED (
      SELECT c, gain FROM g{t} ORDER BY gain DESC, c LIMIT 1),
    cur{t} AS MATERIALIZED (
      SELECT cur.v, greatest(cur.cur, coalesce(win.s, 0.0)) AS cur
      FROM cur{p} cur LEFT JOIN (
        SELECT e.v, e.s FROM edges e, w{t} WHERE e.c = w{t}.c) win
        ON win.v = cur.v),
    tot{t} AS (SELECT round(sum(cur), 10) AS tot FROM cur{t})"""
        )
    selects = "\n    UNION ALL\n    ".join(
        f"SELECT CAST({t} AS BIGINT) AS rnd, w{t}.c AS facility, "
        f"round(w{t}.gain, 6) AS gain, round(tot{t}.tot, 6) AS total_cov "
        f"FROM w{t}, tot{t}"
        for t in range(1, _FL_K + 1)
    )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + selects


@query("q_facility_location", oracle=_facility_oracle())
def q_facility_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X658 — greedy facility-location data selection (the canonical
    submodular diverse-subset objective behind CRAIG/coreset curation:
    maximize Σ_v max_{s∈S} sim(v, s)): pick K=4 exemplar vectors so
    every corpus vector is close to some exemplar. The similarity
    graph is SPARSIFIED through the PERSISTED IVF index (round-11
    conversion, VERDICT r10 "Next #3": the round-10 64× probes showed
    the build-each-run every=50 codebook going quadratic, exponent
    1.02, while the persisted √n-codebook twin measured 0.69 — this
    key now routes through operators/ann.ivf_search_indexed via
    round11.ensure_embedding_index, each vector keeping its top-5
    routed neighbors clamped to ≥0) — uncovered edges contribute 0,
    which preserves the greedy (1−1/e) guarantee on the sparsified
    objective and is what makes the operator linear-ish instead of
    the textbook O(n²·K). Each greedy round is one edge-grain
    aggregate (marginal gains), a deterministic (gain DESC, id)
    argmax kept IN-PLAN as a broadcast 1-row frame — no driver
    collect — and a coverage-vector update via left join. The DuckDB
    oracle replays the √n-codebook routing plus all K rounds unrolled.

    Scale: index build amortizes to one corpus scan per corpus; rounds
    are K (a constant); each costs one shuffle over the ANN edge list
    (n·k rows) — the coverage state is one double per vector,
    partitioned by id."""
    from pyspark.sql.window import Window as W

    from .round11 import ensure_embedding_index

    emb = load(spark, sf_dir, "embeddings")
    corpus = emb.select(
        F.col("vec_id").alias("n_id"), F.col("embedding").alias("emb")
    )
    qs = emb.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    idx = ensure_embedding_index(spark, sf_dir)
    edges = (
        _ann.ivf_search_indexed(
            spark, idx, qs, k=_FL_EDGE_K, nprobe=_MM_NPROBE,
        )
        .select(
            F.col("q_id").alias("v"),
            F.col("n_id").alias("c"),
            F.greatest(F.col("score"), F.lit(0.0)).alias("s"),
        )
        .localCheckpoint(eager=True)
    )
    cur = corpus.select(F.col("n_id").alias("v"), F.lit(0.0).alias("cur"))
    outs = []
    for t in range(1, _FL_K + 1):
        gains = (
            edges.join(cur, "v")
            .groupBy("c")
            .agg(
                F.round(
                    F.sum(F.greatest(F.col("s") - F.col("cur"), F.lit(0.0))),
                    10,
                ).alias("gain")
            )
        )
        win = (
            gains.withColumn(
                "rn", F.row_number().over(W.orderBy(F.desc("gain"), "c"))
            )
            .filter(F.col("rn") == 1)
            .select(F.col("c").alias("win_c"), F.col("gain"))
        )
        cov = (
            edges.crossJoin(F.broadcast(win))
            .filter(F.col("c") == F.col("win_c"))
            .select("v", F.col("s").alias("win_s"))
        )
        cur = (
            cur.join(cov, "v", "left")
            .select(
                "v",
                F.greatest(
                    F.col("cur"), F.coalesce(F.col("win_s"), F.lit(0.0))
                ).alias("cur"),
            )
            .localCheckpoint(eager=True)
        )
        tot = cur.agg(F.round(F.sum("cur"), 10).alias("tot"))
        outs.append(
            win.crossJoin(tot).select(
                F.lit(t).cast("long").alias("rnd"),
                F.col("win_c").alias("facility"),
                F.round("gain", 6).alias("gain"),
                F.round("tot", 6).alias("total_cov"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# ---------------------------------------------------------------------------
# X660 — in-batch negative collision audit (contrastive training QA)
# ---------------------------------------------------------------------------

from ..functions import hashing as _hashing  # noqa: E402

_IBC_NBATCH = 16

_INBATCH_ORACLE = f"""
    WITH assigned AS (
      SELECT label,
             {_hashing.token_hash_sql(
                 "concat(CAST(vec_id AS VARCHAR), '|ibc')")}
               % {_IBC_NBATCH} AS b
      FROM embeddings),
    per_bl AS (
      SELECT b, label, count(*) AS n_bl FROM assigned GROUP BY b, label),
    per_b AS (
      SELECT b, sum(n_bl) AS m,
             sum(n_bl * (n_bl - 1) / 2) AS coll
      FROM per_bl GROUP BY b),
    rates AS (
      SELECT b, m, coll,
             round(coll * 1.0 / (m * (m - 1) / 2), 10) AS rate
      FROM per_b WHERE m >= 2),
    marg AS (
      SELECT round(sum(n_l * (n_l - 1.0))
                   / (sum(n_l) * (sum(n_l) - 1.0)), 10) AS exp_rate
      FROM (SELECT label, count(*) AS n_l FROM assigned GROUP BY label))
    SELECT CAST(count(*) AS BIGINT) AS n_batches,
           round(avg(m), 6) AS mean_batch_size,
           round(sum(coll) * 1.0 / sum(m * (m - 1) / 2), 6)
             AS collision_rate,
           round(max(rate), 6) AS max_batch_rate,
           round(max(marg.exp_rate), 6) AS expected_rate
    FROM rates, marg
    """


@query("q_inbatch_collision", oracle=_INBATCH_ORACLE)
def q_inbatch_collision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X660 — in-batch negative collision audit: contrastive training
    (CLIP/DPR/SimCLR-style) treats every other in-batch sample as a
    negative, so two same-label samples in one batch are FALSE
    negatives that corrupt the loss. Assign vectors to batches by the
    portable md5-prefix hash (the q_grouped_cv idiom), count same-label
    pairs per batch (integer C(n,2) sums), and report the realized
    collision rate against the label-marginal expectation Σ n_l(n_l−1)
    / n(n−1) — a healthy random batcher matches it; a skewed shard
    layout exceeds it, and that delta is the actionable number.

    Scale: one (batch, label) count — word-count shaped; batches are a
    hash mod, no shuffle beyond the count itself."""
    emb = load(spark, sf_dir, "embeddings")
    assigned = emb.select(
        "label",
        (
            _hashing.token_hash(
                F.concat(F.col("vec_id").cast("string"), F.lit("|ibc"))
            )
            % _IBC_NBATCH
        ).alias("b"),
    )
    per_bl = assigned.groupBy("b", "label").agg(F.count("*").alias("n_bl"))
    per_b = per_bl.groupBy("b").agg(
        F.sum("n_bl").alias("m"),
        F.sum(F.col("n_bl") * (F.col("n_bl") - 1) / 2).alias("coll"),
    )
    rates = per_b.filter(F.col("m") >= 2).withColumn(
        "rate",
        F.round(
            F.col("coll") * 1.0 / (F.col("m") * (F.col("m") - 1) / 2), 10
        ),
    )
    marg = (
        assigned.groupBy("label")
        .agg(F.count("*").alias("n_l"))
        .agg(
            F.round(
                F.sum(F.col("n_l") * (F.col("n_l") - 1.0))
                / (F.sum("n_l") * (F.sum("n_l") - 1.0)),
                10,
            ).alias("exp_rate")
        )
    )
    return rates.crossJoin(F.broadcast(marg)).agg(
        F.count("*").cast("long").alias("n_batches"),
        F.round(F.avg("m"), 6).alias("mean_batch_size"),
        F.round(
            F.sum("coll") * 1.0 / F.sum(F.col("m") * (F.col("m") - 1) / 2),
            6,
        ).alias("collision_rate"),
        F.round(F.max("rate"), 6).alias("max_batch_rate"),
        F.round(F.max("exp_rate"), 6).alias("expected_rate"),
    )


# ---------------------------------------------------------------------------
# X661 — Chinchilla-optimal training plan vs token supply
# ---------------------------------------------------------------------------

_CHIN_BUDGETS = ("1e18", "1e19", "1e20", "1e21")  # FLOPs grid
_CHIN_TPP = 20.0  # Chinchilla tokens-per-parameter rule of thumb
_CHIN_MAX_EPOCHS = 4.0  # Muennighoff et al. 2023 repeat-value horizon

_CHIN_ORACLE = f"""
    WITH supply AS (
      SELECT lang, CAST(sum(len({_text.tokens_sql('text')})) AS BIGINT)
               AS tokens
      FROM documents GROUP BY lang),
    grid AS (SELECT unnest([{', '.join(_CHIN_BUDGETS)}]) AS c),
    plan AS (
      SELECT s.lang, g.c AS flops, s.tokens AS supply_tokens,
             round(sqrt(g.c / (6.0 * {_CHIN_TPP})), 6) AS n_opt,
             round({_CHIN_TPP} * sqrt(g.c / (6.0 * {_CHIN_TPP})), 6)
               AS d_opt
      FROM supply s CROSS JOIN grid g)
    SELECT lang, flops, supply_tokens, n_opt, d_opt,
           round(d_opt / supply_tokens, 6) AS epochs_needed,
           d_opt / supply_tokens <= {_CHIN_MAX_EPOCHS} AS feasible
    FROM plan
    """


@query("q_chinchilla_plan", oracle=_CHIN_ORACLE)
def q_chinchilla_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X661 — compute-optimal training plan against the corpus' actual
    token supply: for each FLOPs budget C on the grid, the Chinchilla
    allocation (Hoffmann et al. 2022, C ≈ 6·N·D with D ≈ 20·N gives
    N = sqrt(C/120), D = 20N) is checked per language against the
    tokens this corpus can supply; epochs_needed = D_opt/supply, and
    feasibility uses the Muennighoff et al. 2023 data-constrained
    result that repeating data beyond ~4 epochs stops buying loss.
    This is the planning table a pretraining data team actually
    produces before a run: which budgets this corpus can feed, and
    where data (not compute) binds. sqrt is IEEE-correctly-rounded on
    both engines; everything else is one division.

    Scale: the data-sized work is ONE tokenize+count per language;
    the grid is a constant VALUES cross join."""
    d = load(spark, sf_dir, "documents")
    supply = d.groupBy("lang").agg(
        F.sum(F.size(_text.tokens(F.col("text")))).cast("long").alias(
            "tokens"
        )
    )
    grid = spark.createDataFrame(
        [(float(c),) for c in _CHIN_BUDGETS], "c double"
    )
    n_opt = F.round(F.sqrt(F.col("c") / (6.0 * _CHIN_TPP)), 6)
    d_opt = F.round(_CHIN_TPP * F.sqrt(F.col("c") / (6.0 * _CHIN_TPP)), 6)
    return (
        supply.crossJoin(F.broadcast(grid))
        .select(
            "lang",
            F.col("c").alias("flops"),
            F.col("tokens").alias("supply_tokens"),
            n_opt.alias("n_opt"),
            d_opt.alias("d_opt"),
        )
        .withColumn(
            "epochs_needed",
            F.round(F.col("d_opt") / F.col("supply_tokens"), 6),
        )
        .withColumn(
            "feasible",
            F.col("d_opt") / F.col("supply_tokens") <= _CHIN_MAX_EPOCHS,
        )
    )


# ---------------------------------------------------------------------------
# X662 — soft deduplication weights (downweight, don't drop)
# ---------------------------------------------------------------------------

_SOFT_DEDUP_ORACLE = """
    WITH clustered AS (
      SELECT source, n_chars,
             count(*) OVER (PARTITION BY md5(text)) AS csize
      FROM documents)
    SELECT source,
           CAST(count(*) AS BIGINT) AS raw_docs,
           CAST(sum(n_chars) AS BIGINT) AS raw_chars,
           round(sum(n_chars * round(1.0 / csize, 10)), 6)
             AS effective_chars,
           round(1.0 - sum(n_chars * round(1.0 / csize, 10))
                 / sum(n_chars), 6) AS dedup_discount
    FROM clustered GROUP BY source
    """


@query("q_soft_dedup_weights", oracle=_SOFT_DEDUP_ORACLE)
def q_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X662 — soft deduplication (downweighting instead of dropping —
    the SlimPajama-DC / soft-dedup recipe): each document carries
    sampling weight 1/cluster_size over its exact-duplicate cluster
    (md5(text)), so duplicated content contributes once in expectation
    while unique phrasing inside near-identical docs is never
    destroyed. Reported per source: raw vs effective char volume and
    the dedup discount — the corpus-governance companion to the hard
    E1 q_exact_dedup (which keeps one winner per cluster).

    Scale: one window count over the md5 key (the same shuffle exact
    dedup pays), then a source-grain aggregate."""
    d = load(spark, sf_dir, "documents")
    from pyspark.sql.window import Window as W

    clustered = d.select(
        "source",
        "n_chars",
        F.count("*").over(W.partitionBy(F.md5("text"))).alias("csize"),
    )
    w = F.round(1.0 / F.col("csize"), 10)
    return clustered.groupBy("source").agg(
        F.count("*").cast("long").alias("raw_docs"),
        F.sum("n_chars").cast("long").alias("raw_chars"),
        F.round(F.sum(F.col("n_chars") * w), 6).alias("effective_chars"),
        F.round(
            1.0 - F.sum(F.col("n_chars") * w) / F.sum("n_chars"), 6
        ).alias("dedup_discount"),
    )


# ---------------------------------------------------------------------------
# X663 — BBSE label-shift estimation (black-box shift estimator)
# ---------------------------------------------------------------------------

_BBSE_Y, _BBSE_P = 50.0, 40.0  # true-label / predictor thresholds

_BBSE_ORACLE = f"""
    WITH src AS (
      SELECT CASE WHEN value >= {_BBSE_Y} THEN 1 ELSE 0 END AS y,
             CASE WHEN value >= {_BBSE_P} THEN 1 ELSE 0 END AS p
      FROM events WHERE event_type = 'click'),
    tgt AS (
      SELECT CASE WHEN value >= {_BBSE_P} THEN 1 ELSE 0 END AS p
      FROM events WHERE event_type = 'purchase'),
    cm AS (
      SELECT count(*) AS n,
             sum(CASE WHEN p = 0 AND y = 0 THEN 1 ELSE 0 END) AS n00,
             sum(CASE WHEN p = 0 AND y = 1 THEN 1 ELSE 0 END) AS n01,
             sum(CASE WHEN p = 1 AND y = 0 THEN 1 ELSE 0 END) AS n10,
             sum(CASE WHEN p = 1 AND y = 1 THEN 1 ELSE 0 END) AS n11
      FROM src),
    q AS (
      SELECT count(*) AS m,
             sum(CASE WHEN p = 1 THEN 1 ELSE 0 END) AS m1
      FROM tgt),
    solved AS (
      SELECT cm.n, q.m,
             round((cm.n11 * 1.0 / cm.n) * (q.m - q.m1) * 1.0 / q.m
                   - (cm.n01 * 1.0 / cm.n) * (q.m1 * 1.0 / q.m), 10)
               / round((cm.n00 * 1.0 / cm.n) * (cm.n11 * 1.0 / cm.n)
                   - (cm.n01 * 1.0 / cm.n) * (cm.n10 * 1.0 / cm.n), 10)
               AS w0,
             round((cm.n00 * 1.0 / cm.n) * (q.m1 * 1.0 / q.m)
                   - (cm.n10 * 1.0 / cm.n) * (q.m - q.m1) * 1.0 / q.m, 10)
               / round((cm.n00 * 1.0 / cm.n) * (cm.n11 * 1.0 / cm.n)
                   - (cm.n01 * 1.0 / cm.n) * (cm.n10 * 1.0 / cm.n), 10)
               AS w1,
             round((cm.n01 + cm.n11) * 1.0 / cm.n, 10) AS src_prior1
      FROM cm, q)
    SELECT CAST(n AS BIGINT) AS n_source, CAST(m AS BIGINT) AS n_target,
           round(w0, 6) AS w0, round(w1, 6) AS w1,
           round(src_prior1, 6) AS src_prior1,
           round(w1 * src_prior1, 6) AS est_target_prior1
    FROM solved
    """


@query("q_bbse_label_shift", oracle=_BBSE_ORACLE)
def q_bbse_label_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X663 — black-box shift estimation (BBSE, Lipton et al. 2018):
    estimate label-shift importance weights w(y) = q(y)/p(y) for an
    UNLABELED target population from (a) the predictor's confusion
    joint on labeled source data and (b) only the predictor's marginal
    on the target — solving C·w = q, here the closed-form 2×2 inverse.
    Source = click events (label: value ≥ 50, predictor: value ≥ 40 —
    a correlated but imperfect proxy, as BBSE requires), target =
    purchase events. The output weights are what importance-weighted
    retraining / shift-corrected eval consumes; est_target_prior =
    w·p(y) is the shift diagnosis itself. All inputs are integer
    counts; the determinant and numerators round(10) before the one
    division each.

    Scale: two filtered count aggregates (4+1 cells) — map-side
    combinable; the algebra is constant work."""
    e = load(spark, sf_dir, "events")
    src = e.filter(F.col("event_type") == "click").select(
        (F.col("value") >= _BBSE_Y).cast("int").alias("y"),
        (F.col("value") >= _BBSE_P).cast("int").alias("p"),
    )
    tgt = e.filter(F.col("event_type") == "purchase").select(
        (F.col("value") >= _BBSE_P).cast("int").alias("p")
    )
    cm = src.agg(
        F.count("*").alias("n"),
        F.sum(((F.col("p") == 0) & (F.col("y") == 0)).cast("long")).alias(
            "n00"
        ),
        F.sum(((F.col("p") == 0) & (F.col("y") == 1)).cast("long")).alias(
            "n01"
        ),
        F.sum(((F.col("p") == 1) & (F.col("y") == 0)).cast("long")).alias(
            "n10"
        ),
        F.sum(((F.col("p") == 1) & (F.col("y") == 1)).cast("long")).alias(
            "n11"
        ),
    )
    q = tgt.agg(
        F.count("*").alias("m"),
        F.sum((F.col("p") == 1).cast("long")).alias("m1"),
    )
    j = cm.crossJoin(q)
    c00 = F.col("n00") * 1.0 / F.col("n")
    c01 = F.col("n01") * 1.0 / F.col("n")
    c10 = F.col("n10") * 1.0 / F.col("n")
    c11 = F.col("n11") * 1.0 / F.col("n")
    q0 = (F.col("m") - F.col("m1")) * 1.0 / F.col("m")
    q1 = F.col("m1") * 1.0 / F.col("m")
    det = F.round(c00 * c11 - c01 * c10, 10)
    w0 = F.round(c11 * q0 - c01 * q1, 10) / det
    w1 = F.round(c00 * q1 - c10 * q0, 10) / det
    src1 = F.round((F.col("n01") + F.col("n11")) * 1.0 / F.col("n"), 10)
    return j.select(
        F.col("n").cast("long").alias("n_source"),
        F.col("m").cast("long").alias("n_target"),
        F.round(w0, 6).alias("w0"),
        F.round(w1, 6).alias("w1"),
        F.round(src1, 6).alias("src_prior1"),
        F.round(w1 * src1, 6).alias("est_target_prior1"),
    )


# ---------------------------------------------------------------------------
# X664 — multi-source BFS hop distances (unrolled supersteps)
# ---------------------------------------------------------------------------

_BFS_HOPS = 4
_BFS_SEED_MOD = 50  # suppliers with suppkey % 50 == 1 seed the frontier


def _bfs_oracle() -> str:
    ctes = [
        """e0 AS (
      SELECT DISTINCT concat('s', CAST(l_suppkey AS VARCHAR)) AS a,
             concat('c', CAST(o_custkey AS VARCHAR)) AS b
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    sym AS MATERIALIZED (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
    nodes AS MATERIALIZED (SELECT DISTINCT a AS node FROM sym),
    d0 AS MATERIALIZED (
      SELECT node,
             CASE WHEN node LIKE 's%'
                   AND CAST(substr(node, 2) AS BIGINT) % {mod} = 1
                  THEN 0 ELSE NULL END AS d
      FROM nodes)""".format(mod=_BFS_SEED_MOD)
    ]
    for t in range(1, _BFS_HOPS + 1):
        p = t - 1
        ctes.append(
            f"""d{t} AS MATERIALIZED (
      SELECT n.node,
             least(coalesce(n.d, {_BFS_HOPS + 1}),
                   coalesce(f.via, {_BFS_HOPS + 1})) AS dm,
             CASE WHEN least(coalesce(n.d, {_BFS_HOPS + 1}),
                   coalesce(f.via, {_BFS_HOPS + 1})) <= {_BFS_HOPS}
                  THEN least(coalesce(n.d, {_BFS_HOPS + 1}),
                   coalesce(f.via, {_BFS_HOPS + 1})) END AS d
      FROM d{p} n LEFT JOIN (
        SELECT s.b AS node, min(x.d) + 1 AS via
        FROM sym s JOIN d{p} x ON x.node = s.a AND x.d IS NOT NULL
        GROUP BY s.b) f ON f.node = n.node)"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT coalesce(CAST(d AS BIGINT), -1) AS hop,
           CAST(count(*) AS BIGINT) AS n_nodes
    FROM d{_BFS_HOPS} GROUP BY d
    """
    )


@query("q_bfs_hops", oracle=_bfs_oracle())
def q_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X664 — multi-source BFS (4 unrolled Pregel-style supersteps)
    over the supplier↔customer shipment graph (q_pagerank's edge set):
    every 50th supplier seeds the frontier at distance 0, and each
    superstep relaxes dist(v) = min(dist(v), min over in-neighbors
    dist(u)+1) via one edge⋈frontier join + one min-aggregate — the
    canonical iterative-graph shape on Spark (no GraphX needed; hop
    counts are exact integers, nothing to round). Output: nodes per
    hop distance, −1 = unreached within 4 hops — the reachability
    profile used for influence radii and contamination-spread audits.

    Scale: per superstep one node-keyed shuffle over the edge list;
    supersteps are a constant; frontier state is one int per node.
    The oracle unrolls all supersteps (MATERIALIZED — each d_t is
    referenced twice)."""
    # integer vertex keys (supplier k → 2k, customer k → 2k+1 — the
    # graph_ext._edges identity) instead of "s<k>"/"c<k>" strings: every
    # superstep shuffles on the vertex key, and 8-byte longs hash and
    # compare several times faster than strings (guide §2.3 narrower
    # types; same graph, the output is hop-count grain so the key
    # representation is internal). The two directed id spaces are
    # disjoint, so the per-direction DISTINCT already makes the union
    # symmetric-distinct.
    from .graph_ext import _edges

    sym = _edges(spark, sf_dir).localCheckpoint(eager=True)
    nodes = sym.select(F.col("a").alias("node")).distinct()
    dist = nodes.select(
        "node",
        F.when(
            (F.col("node") % 2 == 0)
            & (F.expr(f"(node div 2) % {_BFS_SEED_MOD}") == 1),
            0,
        ).alias("d"),
    ).localCheckpoint(eager=True)
    inf = F.lit(_BFS_HOPS + 1)
    for _ in range(_BFS_HOPS):
        frontier = (
            sym.join(
                dist.filter(F.col("d").isNotNull()).withColumnRenamed(
                    "node", "a"
                ),
                "a",
            )
            .groupBy(F.col("b").alias("node"))
            .agg((F.min("d") + 1).alias("via"))
        )
        dm = F.least(
            F.coalesce(F.col("d"), inf), F.coalesce(F.col("via"), inf)
        )
        dist = (
            dist.join(frontier, "node", "left")
            .select(
                "node", F.when(dm <= _BFS_HOPS, dm).alias("d")
            )
            .localCheckpoint(eager=True)
        )
    return dist.groupBy(
        F.coalesce(F.col("d").cast("long"), F.lit(-1)).alias("hop")
    ).agg(F.count("*").cast("long").alias("n_nodes"))


# ---------------------------------------------------------------------------
# X665 — Neyman allocation (optimal stratified sampling budget)
# ---------------------------------------------------------------------------

_NEYMAN_BUDGET = 1000

_NEYMAN_ORACLE = f"""
    WITH m AS (
      SELECT event_type, count(*) AS n_h,
             sum(CAST(round(value * 100) AS BIGINT)) AS s1c,
             sum(CAST(round(value * 100) AS BIGINT)
                 * CAST(round(value * 100) AS BIGINT)) AS s2c
      FROM events GROUP BY event_type),
    sd AS (
      SELECT event_type, n_h,
             round(sqrt(greatest(
               s2c / (10000.0 * n_h)
               - (s1c / (100.0 * n_h)) * (s1c / (100.0 * n_h)), 0)), 10)
               AS s_h
      FROM m),
    tot AS (SELECT round(sum(n_h * s_h), 10) AS z FROM sd)
    SELECT sd.event_type AS stratum,
           CAST(sd.n_h AS BIGINT) AS n_h,
           round(sd.s_h, 6) AS s_h,
           round(sd.n_h * sd.s_h / tot.z, 6) AS share,
           CAST(round({_NEYMAN_BUDGET} * sd.n_h * sd.s_h / tot.z)
                AS BIGINT) AS n_alloc
    FROM sd, tot
    """


@query("q_neyman_alloc", oracle=_NEYMAN_ORACLE)
def q_neyman_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X665 — Neyman-optimal stratified allocation: split an annotation
    /eval budget of 1000 across strata proportionally to
    N_h·S_h (stratum size × within-stratum std) — the allocation that
    minimizes the stratified mean's variance, and the reason you
    oversample high-variance slices when buying human labels. Moments
    from EXACT integer cents (associative — the jackknife/IV
    contract); one rounded sqrt per stratum.

    Scale: one map-side-combinable aggregate per stratum; the
    allocation is arithmetic over a stratum-count frame."""
    e = load(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    m = e.groupBy("event_type").agg(
        F.count("*").alias("n_h"),
        F.sum(cents).alias("s1c"),
        F.sum(cents * cents).alias("s2c"),
    )
    mean = F.col("s1c") / (100.0 * F.col("n_h"))
    var = F.greatest(
        F.col("s2c") / (10000.0 * F.col("n_h")) - mean * mean, F.lit(0.0)
    )
    sd = m.select(
        "event_type",
        "n_h",
        F.round(F.sqrt(var), 10).alias("s_h"),
    )
    tot = sd.agg(F.round(F.sum(F.col("n_h") * F.col("s_h")), 10).alias("z"))
    return sd.crossJoin(F.broadcast(tot)).select(
        F.col("event_type").alias("stratum"),
        F.col("n_h").cast("long").alias("n_h"),
        F.round("s_h", 6).alias("s_h"),
        F.round(F.col("n_h") * F.col("s_h") / F.col("z"), 6).alias("share"),
        F.round(_NEYMAN_BUDGET * F.col("n_h") * F.col("s_h") / F.col("z"))
        .cast("long")
        .alias("n_alloc"),
    )


# ---------------------------------------------------------------------------
# X667 — maximal marginal relevance re-ranking (unrolled greedy)
# ---------------------------------------------------------------------------

_MMR_LAMBDA = 0.7
_MMR_K = 3  # items to select per query
_MMR_CAND = 8  # ANN candidate pool per query

from ..functions import vectors as _vectors  # noqa: E402


def _mmr_oracle() -> str:
    ivf = _ann.ivf_search_sql(
        "corpus", "anchors", "cent", k=_MMR_CAND, nprobe=_MM_NPROBE,
        prefix="mmr_",
    )
    pair_cos = _vectors.cosine_sql("a.emb", "b.emb")
    ctes = [
        """corpus AS (
      SELECT vec_id AS n_id, embedding AS emb FROM embeddings),
    anchors AS (
      SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
      WHERE vec_id % 25 = 0),
    cent AS (
      SELECT n_id AS c_id, emb AS c_emb FROM corpus
      WHERE n_id % 50 = 0)""",
        ivf,
        f"""cand AS MATERIALIZED (
      SELECT t.q_id, t.n_id, t.score AS rel
      FROM mmr_topk t),
    sims AS MATERIALIZED (
      SELECT ca.q_id, ca.n_id AS i, cb.n_id AS j,
             round({pair_cos}, 6) AS s
      FROM cand ca JOIN cand cb
        ON ca.q_id = cb.q_id AND ca.n_id <> cb.n_id
      JOIN corpus a ON a.n_id = ca.n_id
      JOIN corpus b ON b.n_id = cb.n_id),
    st0 AS MATERIALIZED (
      SELECT q_id, n_id, rel, -1.0 AS maxsim FROM cand)""",
    ]
    for t in range(1, _MMR_K + 1):
        p = t - 1
        # round 1 scores on pure relevance (nothing selected yet)
        score = (
            "rel"
            if t == 1
            else f"round({_MMR_LAMBDA} * rel - {round(1 - _MMR_LAMBDA, 10)}"
            " * greatest(maxsim, 0.0), 10)"
        )
        ctes.append(
            f"""sc{t} AS (
      SELECT q_id, n_id, rel, maxsim, {score} AS score FROM st{p}),
    w{t} AS MATERIALIZED (
      SELECT q_id, n_id AS win, score AS win_score, rel AS win_rel
      FROM (SELECT *, row_number() OVER (PARTITION BY q_id
              ORDER BY score DESC, n_id) AS rn FROM sc{t})
      WHERE rn = 1),
    st{t} AS MATERIALIZED (
      SELECT s.q_id, s.n_id, s.rel,
             greatest(s.maxsim, coalesce(x.s, -1.0)) AS maxsim
      FROM st{p} s
      LEFT JOIN w{t} w ON w.q_id = s.q_id
      LEFT JOIN sims x ON x.q_id = s.q_id AND x.i = s.n_id
                      AND x.j = w.win
      WHERE s.n_id <> (SELECT win FROM w{t} ww WHERE ww.q_id = s.q_id))"""
        )
    selects = "\n    UNION ALL\n    ".join(
        f"SELECT q_id, CAST({t} AS BIGINT) AS rnk, win AS n_id, "
        f"round(win_rel, 6) AS rel, round(win_score, 6) AS mmr_score "
        f"FROM w{t}"
        for t in range(1, _MMR_K + 1)
    )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + selects


@query("q_mmr_rerank", oracle=_mmr_oracle())
def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X667 — maximal marginal relevance re-ranking (Carbonell &
    Goldstein 1998): per query, greedily pick K=3 of the ANN's top-8
    candidates maximizing λ·relevance − (1−λ)·max-similarity-to-
    already-selected — the diversity-aware second stage every RAG
    retriever and dedup-aware search layer runs on top of raw
    cosine top-k. Candidates and relevance come from ivf_search;
    candidate-pair similarities are computed once per query pool
    (K_cand² per query, a constant); each greedy round is a windowed
    argmax + a maxsim update join — all state is (query, candidate)
    grain, no driver iteration. Oracle replays routing + all rounds.

    Scale: per-query constant-size pools make the whole rerank linear
    in query count; the only data-sized stage is the ANN search it
    post-processes."""
    from pyspark.sql.window import Window as W

    emb = load(spark, sf_dir, "embeddings")
    corpus = emb.select(
        F.col("vec_id").alias("n_id"), F.col("embedding").alias("emb")
    )
    anchors = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    cand = (
        _ann.ivf_search(
            corpus, anchors, k=_MMR_CAND, nprobe=_MM_NPROBE,
            every=_MM_EVERY, residue=0,
        )
        .select("q_id", "n_id", F.col("score").alias("rel"))
        .localCheckpoint(eager=True)
    )
    ca = cand.select("q_id", F.col("n_id").alias("i"))
    cb = cand.select(F.col("q_id").alias("q2"), F.col("n_id").alias("j"))
    sims = (
        ca.join(cb, (ca["q_id"] == cb["q2"]) & (ca["i"] != cb["j"]))
        .join(corpus.select(F.col("n_id").alias("i"), F.col("emb").alias("ea")), "i")
        .join(corpus.select(F.col("n_id").alias("j"), F.col("emb").alias("eb")), "j")
        .select(
            "q_id",
            "i",
            "j",
            F.round(_vectors.cosine("ea", "eb"), 6).alias("s"),
        )
        .localCheckpoint(eager=True)
    )
    st = cand.withColumn("maxsim", F.lit(-1.0))
    outs = []
    for t in range(1, _MMR_K + 1):
        score = (
            F.col("rel")
            if t == 1
            else F.round(
                _MMR_LAMBDA * F.col("rel")
                - round(1 - _MMR_LAMBDA, 10)
                * F.greatest(F.col("maxsim"), F.lit(0.0)),
                10,
            )
        )
        sc = st.withColumn("score", score)
        w = W.partitionBy("q_id").orderBy(F.desc("score"), "n_id")
        win = (
            sc.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "q_id",
                F.col("n_id").alias("win"),
                F.col("score").alias("win_score"),
                F.col("rel").alias("win_rel"),
            )
            .localCheckpoint(eager=True)
        )
        outs.append(
            win.select(
                "q_id",
                F.lit(t).cast("long").alias("rnk"),
                F.col("win").alias("n_id"),
                F.round("win_rel", 6).alias("rel"),
                F.round("win_score", 6).alias("mmr_score"),
            )
        )
        upd = sims.join(
            win.select("q_id", F.col("win").alias("j")), ["q_id", "j"]
        ).select("q_id", "i", F.col("s"))
        st = (
            st.join(win.select("q_id", "win"), "q_id")
            .filter(F.col("n_id") != F.col("win"))
            .drop("win")
            .join(
                upd.withColumnRenamed("i", "n_id"), ["q_id", "n_id"], "left"
            )
            .select(
                "q_id",
                "n_id",
                "rel",
                F.greatest(
                    F.col("maxsim"), F.coalesce(F.col("s"), F.lit(-1.0))
                ).alias("maxsim"),
            )
            .localCheckpoint(eager=True)
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# ---------------------------------------------------------------------------
# X668 — model-cascade routing plan (threshold sweep)
# ---------------------------------------------------------------------------

_CASC_SMALL_CORRECT = 200.0  # small model solves items with value <= this
_CASC_COST_SMALL, _CASC_COST_BIG = 1.0, 10.0
_CASC_GRID = (50, 100, 150, 200, 250, 300)

_CASCADE_ORACLE = f"""
    WITH grid AS (SELECT unnest([{', '.join(str(t) for t in _CASC_GRID)}])
                    AS t),
    agg AS (
      SELECT g.t,
             count(*) AS n,
             sum(CASE WHEN e.value > g.t THEN 1 ELSE 0 END) AS n_big,
             sum(CASE WHEN e.value > g.t
                        OR e.value <= {_CASC_SMALL_CORRECT}
                      THEN 1 ELSE 0 END) AS n_correct
      FROM events e CROSS JOIN grid g
      GROUP BY g.t)
    SELECT CAST(t AS BIGINT) AS threshold,
           round(n_big * 1.0 / n, 6) AS frac_big,
           round(n_correct * 1.0 / n, 6) AS quality,
           round(({_CASC_COST_SMALL} * (n - n_big)
                  + ({_CASC_COST_SMALL} + {_CASC_COST_BIG}) * n_big)
                 / n, 6) AS mean_cost,
           round(n_correct * 1.0
                 / ({_CASC_COST_SMALL} * (n - n_big)
                    + ({_CASC_COST_SMALL} + {_CASC_COST_BIG}) * n_big),
                 6) AS quality_per_cost
    FROM agg
    """


@query("q_cascade_plan", oracle=_CASCADE_ORACLE)
def q_cascade_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X668 — model-cascade routing plan (FrugalGPT-style threshold
    sweep): items route to the big model when their difficulty score
    exceeds t, otherwise the small model answers — which is only
    correct on easy items (score ≤ 200 here). For each threshold on
    the grid: big-model traffic share, end-to-end quality, mean cost
    per item (escalation pays BOTH models, the cascade's defining
    cost shape), and quality-per-cost — the frontier a serving team
    reads the operating point off. Integer counts everywhere; the
    grid is a broadcast VALUES cross join, so one scan covers every
    threshold.

    Scale: a single map-side-combinable aggregate over events × a
    constant grid."""
    e = load(spark, sf_dir, "events")
    grid = spark.createDataFrame(
        [(float(t),) for t in _CASC_GRID], "t double"
    )
    agg = (
        e.crossJoin(F.broadcast(grid))
        .groupBy("t")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("value") > F.col("t")).cast("long")).alias(
                "n_big"
            ),
            F.sum(
                (
                    (F.col("value") > F.col("t"))
                    | (F.col("value") <= _CASC_SMALL_CORRECT)
                ).cast("long")
            ).alias("n_correct"),
        )
    )
    cost = (
        _CASC_COST_SMALL * (F.col("n") - F.col("n_big"))
        + (_CASC_COST_SMALL + _CASC_COST_BIG) * F.col("n_big")
    )
    return agg.select(
        F.col("t").cast("long").alias("threshold"),
        F.round(F.col("n_big") * 1.0 / F.col("n"), 6).alias("frac_big"),
        F.round(F.col("n_correct") * 1.0 / F.col("n"), 6).alias("quality"),
        F.round(cost / F.col("n"), 6).alias("mean_cost"),
        F.round(F.col("n_correct") * 1.0 / cost, 6).alias(
            "quality_per_cost"
        ),
    )


# ---------------------------------------------------------------------------
# X669 — curation funnel audit (first-failing-stage attribution)
# ---------------------------------------------------------------------------

_FUNNEL_MIN_TOK = 10
_FUNNEL_LANGS = ("en", "zh", "de")
_FUNNEL_BLOCK = ("error", "spam")
_FUNNEL_MAX_DUP1 = 0.55  # max duplicate-unigram fraction

_FUNNEL_LANG_SQL = ", ".join(f"'{lang}'" for lang in _FUNNEL_LANGS)
_FUNNEL_BLOCK_SQL = " OR ".join(
    f"contains(text, '{kw}')" for kw in _FUNNEL_BLOCK
)

_CURATION_FUNNEL_ORACLE = f"""
    WITH staged AS (
      SELECT doc_id, n_chars,
             CASE
               WHEN len({_text.tokens_sql('text')}) < {_FUNNEL_MIN_TOK}
                 THEN 'S1_too_short'
               WHEN lang NOT IN ({_FUNNEL_LANG_SQL}) THEN 'S2_lang'
               WHEN {_FUNNEL_BLOCK_SQL} THEN 'S3_blocklist'
               WHEN round(1.0
                      - len(list_distinct({_text.tokens_sql('text')})) * 1.0
                        / len({_text.tokens_sql('text')}), 10)
                    > {_FUNNEL_MAX_DUP1} THEN 'S4_repetition'
               ELSE 'S5_kept'
             END AS stage
      FROM documents),
    tot AS (SELECT count(*) AS n, sum(n_chars) AS chars FROM staged)
    SELECT s.stage,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(count(*) * 1.0 / tot.n, 6) AS frac_docs,
           CAST(sum(s.n_chars) AS BIGINT) AS n_chars,
           round(sum(s.n_chars) * 1.0 / tot.chars, 6) AS frac_chars
    FROM staged s, tot
    GROUP BY s.stage, tot.n, tot.chars
    """


@query("q_curation_funnel", oracle=_CURATION_FUNNEL_ORACLE)
def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X669 — curation funnel with first-failing-stage attribution: the
    per-stage kill table every dataset paper publishes (RefinedWeb
    Fig. 2, FineWeb's ablation ladder). Each document is attributed to
    the FIRST filter that rejects it — length, language allowlist,
    blocklist, repetition (duplicate-unigram fraction) — or to the
    surviving bucket, with doc and char volume shares per stage. The
    individual filters exist as standalone operators (Gopher/
    RefinedWeb battery, q_blocklist_filter, q_lang_id); what this adds
    is the ATTRIBUTION: which stage actually costs the corpus, the
    number that decides filter ordering and threshold debates.

    Scale: one projection pass computing the CASE ladder (tokenize
    once; pure Column expressions), one stage-grain aggregate."""
    d = load(spark, sf_dir, "documents")
    cells = funnel_stage_counts(d)
    return funnel_from_cells(cells)


def funnel_stage_attribution(d: DataFrame) -> F.Column:
    """The first-failing-stage CASE ladder over a documents frame."""
    toks = _text.tokens(F.col("text"))
    dup1 = F.round(
        1.0 - F.size(F.array_distinct(toks)) * 1.0 / F.size(toks), 10
    )
    block = None
    for kw in _FUNNEL_BLOCK:
        c = F.col("text").contains(kw)
        block = c if block is None else (block | c)
    return (
        F.when(F.size(toks) < _FUNNEL_MIN_TOK, "S1_too_short")
        .when(~F.col("lang").isin(*_FUNNEL_LANGS), "S2_lang")
        .when(block, "S3_blocklist")
        .when(dup1 > _FUNNEL_MAX_DUP1, "S4_repetition")
        .otherwise("S5_kept")
    )


def funnel_stage_counts(d: DataFrame) -> DataFrame:
    """(stage, n_docs, n_chars_s) additive cells — the merged-store
    state of the streaming funnel (streaming/pipeline.run_streaming_funnel)."""
    return (
        d.select("n_chars", funnel_stage_attribution(d).alias("stage"))
        .groupBy("stage")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars_s"),
        )
    )


def funnel_from_cells(cells: DataFrame) -> DataFrame:
    """Stage cells → the q_curation_funnel output shape; totals derive
    from the cells themselves, so the streaming store needs no second
    state table."""
    tot = cells.agg(
        F.sum("n_docs").alias("n"), F.sum("n_chars_s").alias("chars")
    )
    return cells.crossJoin(F.broadcast(tot)).select(
        "stage",
        "n_docs",
        F.round(F.col("n_docs") * 1.0 / F.col("n"), 6).alias("frac_docs"),
        F.col("n_chars_s").cast("long").alias("n_chars"),
        F.round(F.col("n_chars_s") * 1.0 / F.col("chars"), 6).alias(
            "frac_chars"
        ),
    )


# ---------------------------------------------------------------------------
# X670 — embedding-collapse diagnostic: participation ratio of the
# covariance spectrum (RankMe-style effective rank)
# ---------------------------------------------------------------------------

_ER_DIM = 64

_EMB_RANK_ORACLE = f"""
    WITH n AS (SELECT count(*) AS n FROM embeddings),
    mu AS MATERIALIZED (
      SELECT i.i AS i,
             round(sum(round(CAST(e.embedding[i.i + 1] AS DOUBLE), 10))
                   / max(n.n), 10) AS mu
      FROM embeddings e, range({_ER_DIM}) i(i), n
      GROUP BY i.i),
    m2 AS MATERIALIZED (
      SELECT i.i AS i, j.j AS j,
             round(sum(round(CAST(e.embedding[i.i + 1] AS DOUBLE)
                             * CAST(e.embedding[j.j + 1] AS DOUBLE), 10))
                   / max(n.n), 10) AS m
      FROM embeddings e, range({_ER_DIM}) i(i), range({_ER_DIM}) j(j), n
      GROUP BY i.i, j.j),
    cov AS MATERIALIZED (
      SELECT m2.i, m2.j,
             round(m2.m - ma.mu * mb.mu, 10) AS c
      FROM m2 JOIN mu ma ON ma.i = m2.i JOIN mu mb ON mb.i = m2.j),
    tr AS (
      SELECT round(sum(CASE WHEN i = j THEN c END), 10) AS trace_c,
             round(sum(round(c * c, 10)), 10) AS trace_c2
      FROM cov),
    top AS (
      SELECT i AS top_var_dim, c AS top_var FROM cov
      WHERE i = j ORDER BY c DESC, i LIMIT 1)
    SELECT CAST(n.n AS BIGINT) AS n_vecs,
           CAST({_ER_DIM} AS BIGINT) AS dim,
           round(tr.trace_c, 6) AS total_var,
           round(tr.trace_c * tr.trace_c / tr.trace_c2, 6)
             AS participation_ratio,
           CAST(top.top_var_dim AS BIGINT) AS top_var_dim,
           round(top.top_var, 6) AS top_var
    FROM n, tr, top
    """


@query("q_embedding_rank", oracle=_EMB_RANK_ORACLE)
def q_embedding_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X670 — embedding dimensional-collapse diagnostic: the
    participation ratio trace(C)²/trace(C²) of the embedding
    covariance — an effective-rank measure (the RankMe family, Garrido
    et al. 2023): D for isotropic embeddings, →1 when the space
    collapses onto one direction. THE post-hoc check before trusting
    cosine retrieval/dedup on a new encoder: collapse silently inflates
    every similarity. Both traces come from the exact 64×64 moment
    matrix (per-row products rounded(10), double-explode — no
    eigensolve needed: trace(C²) = Σ C_ij² algebraically). The
    mapInPandas matrix-partial twin (operators/embedstats) is the
    production path for wide batches; pytest pins it to this query.

    Scale: the gate form shuffles n·D² product terms (explode) — fine
    for a diagnostic; the production twin computes per-batch XᵀX
    partials in Arrow (one D×D matrix per batch, reduced on the
    driver), one pass, no explode."""
    # n·D² explode below is the cost; fan the single-split scan out so
    # the explode + per-cell products run on every core (guide §2.6)
    emb = load(spark, sf_dir, "embeddings").repartition(
        default_parallelism()
    )
    n_df = emb.agg(F.count("*").alias("n"))
    ex1 = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "i", "xi"
        ),
        F.col("embedding").cast("array<double>").alias("e"),
    )
    ex2 = ex1.select(
        "i", "xi", F.posexplode(F.col("e")).alias("j", "xj")
    )
    # per-dim means need only the FIRST explode (one xi per (row, i));
    # the old ex2.filter(j == 0) form re-ran the full n·D² explode for
    # the same multiset of addends (guide §1.2: don't compute what you
    # throw away)
    mu = (
        ex1.groupBy("i")
        .agg(F.sum(F.round(F.col("xi"), 10)).alias("s"))
        .crossJoin(F.broadcast(n_df))
        .select("i", F.round(F.col("s") / F.col("n"), 10).alias("mu"))
    )
    m2 = (
        ex2.groupBy("i", "j")
        .agg(F.sum(F.round(F.col("xi") * F.col("xj"), 10)).alias("s"))
        .crossJoin(F.broadcast(n_df))
        .select(
            "i", "j", F.round(F.col("s") / F.col("n"), 10).alias("m")
        )
    )
    mua = mu.select(F.col("i").alias("i"), F.col("mu").alias("mu_i"))
    mub = mu.select(F.col("i").alias("j"), F.col("mu").alias("mu_j"))
    cov = (
        m2.join(F.broadcast(mua), "i")
        .join(F.broadcast(mub), "j")
        .select(
            "i",
            "j",
            F.round(
                F.col("m") - F.col("mu_i") * F.col("mu_j"), 10
            ).alias("c"),
        )
        .localCheckpoint(eager=True)
    )
    tr = cov.agg(
        F.round(
            F.sum(F.when(F.col("i") == F.col("j"), F.col("c"))), 10
        ).alias("trace_c"),
        F.round(F.sum(F.round(F.col("c") * F.col("c"), 10)), 10).alias(
            "trace_c2"
        ),
    )
    from pyspark.sql.window import Window as W

    top = (
        cov.filter(F.col("i") == F.col("j"))
        .withColumn(
            "rn", F.row_number().over(W.orderBy(F.desc("c"), "i"))
        )
        .filter(F.col("rn") == 1)
        .select(
            F.col("i").cast("long").alias("top_var_dim"),
            F.col("c").alias("top_var"),
        )
    )
    return (
        n_df.crossJoin(tr)
        .crossJoin(top)
        .select(
            F.col("n").cast("long").alias("n_vecs"),
            F.lit(_ER_DIM).cast("long").alias("dim"),
            F.round("trace_c", 6).alias("total_var"),
            F.round(
                F.col("trace_c") * F.col("trace_c") / F.col("trace_c2"), 6
            ).alias("participation_ratio"),
            "top_var_dim",
            F.round("top_var", 6).alias("top_var"),
        )
    )


# ---------------------------------------------------------------------------
# X672 — Double ML (cross-fitted partialling-out, closed form)
# ---------------------------------------------------------------------------

_DML_ORACLE = f"""
    WITH base AS (
      SELECT CAST(length(props) AS BIGINT) AS y,
             CAST(user_id % 2 AS BIGINT) AS t,
             least(CAST(floor(value / 50) AS BIGINT), 9) AS b,
             {_hashing.token_hash_sql(
                 "concat(CAST(event_id AS VARCHAR), '|dml')")} % 2 AS f
      FROM events),
    cells AS (
      SELECT f, b, count(*) AS n,
             sum(y) AS sy, sum(t) AS st, sum(y * t) AS syt
      FROM base GROUP BY f, b),
    nuis AS (
      SELECT f AS nf, b,
             round(sy * 1.0 / n, 10) AS my,
             round(st * 1.0 / n, 10) AS mt
      FROM cells),
    contrib AS (
      SELECT c.f, c.b,
             round(c.syt - nu.mt * c.sy - nu.my * c.st
                   + c.n * round(nu.my * nu.mt, 10), 10) AS a_c,
             round(c.st - 2 * nu.mt * c.st
                   + c.n * round(nu.mt * nu.mt, 10), 10) AS b_c
      FROM cells c JOIN nuis nu ON nu.b = c.b AND nu.nf = 1 - c.f),
    agg AS (
      SELECT round(sum(a_c), 10) AS a, round(sum(b_c), 10) AS bb,
             (SELECT count(*) FROM base) AS n
      FROM contrib)
    SELECT CAST(n AS BIGINT) AS n,
           round(a, 6) AS num, round(bb, 6) AS den,
           round(a / bb, 6) AS theta
    FROM agg
    """


@query("q_double_ml", oracle=_DML_ORACLE)
def q_double_ml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X672 — Double/debiased ML (Chernozhukov et al. 2018), the
    partialling-out estimator with 2-fold CROSS-FITTING — the method's
    defining ingredient: each fold's outcome/treatment nuisance means
    m_y(x), m_t(x) are estimated on the OTHER fold (hash-assigned, the
    q_grouped_cv idiom), so overfit nuisances cannot leak into
    θ = Σ ỹt̃ / Σ t̃². Nuisances here are per-covariate-bucket means
    (the closed-form stand-in for the paper's ML regressions). The
    residual sums expand algebraically into per-(fold, bucket) INTEGER
    sums (Σy, Σt, Σyt, n) — the only doubles live at cell grain (~20
    rounded values), so both engines' arithmetic is identical with no
    data-sized float accumulation at any scale factor.

    Scale: one groupBy over (fold, bucket) — map-side combinable; the
    cross-fit join is cell-grain."""
    e = load(spark, sf_dir, "events")
    base = e.select(
        F.length("props").cast("long").alias("y"),
        (F.col("user_id") % 2).cast("long").alias("t"),
        F.least(F.floor(F.col("value") / 50).cast("long"), F.lit(9)).alias(
            "b"
        ),
        (
            _hashing.token_hash(
                F.concat(F.col("event_id").cast("string"), F.lit("|dml"))
            )
            % 2
        ).alias("f"),
    )
    cells = base.groupBy("f", "b").agg(
        F.count("*").alias("n"),
        F.sum("y").alias("sy"),
        F.sum("t").alias("st"),
        F.sum(F.col("y") * F.col("t")).alias("syt"),
    )
    nuis = cells.select(
        F.col("f").alias("nf"),
        "b",
        F.round(F.col("sy") * 1.0 / F.col("n"), 10).alias("my"),
        F.round(F.col("st") * 1.0 / F.col("n"), 10).alias("mt"),
    )
    contrib = cells.join(
        nuis,
        (nuis["b"] == cells["b"]) & (nuis["nf"] == 1 - cells["f"]),
    ).select(
        F.round(
            F.col("syt")
            - F.col("mt") * F.col("sy")
            - F.col("my") * F.col("st")
            + F.col("n") * F.round(F.col("my") * F.col("mt"), 10),
            10,
        ).alias("a_c"),
        F.round(
            F.col("st")
            - 2 * F.col("mt") * F.col("st")
            + F.col("n") * F.round(F.col("mt") * F.col("mt"), 10),
            10,
        ).alias("b_c"),
    )
    n_df = base.agg(F.count("*").alias("n"))
    agg = contrib.agg(
        F.round(F.sum("a_c"), 10).alias("a"),
        F.round(F.sum("b_c"), 10).alias("bb"),
    )
    return agg.crossJoin(n_df).select(
        F.col("n").cast("long").alias("n"),
        F.round("a", 6).alias("num"),
        F.round("bb", 6).alias("den"),
        F.round(F.col("a") / F.col("bb"), 6).alias("theta"),
    )


# ---------------------------------------------------------------------------
# X673 — successive halving tournament (rung-based budget allocation)
# ---------------------------------------------------------------------------

_SH_RUNGS = ((0, 16, 3), (1, 32, 2), (2, 64, 1))  # (rung, budget, keep)


def _sh_oracle() -> str:
    ctes = [
        """obs AS MATERIALIZED (
      SELECT event_type AS arm,
             CAST(round(value * 100) AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS k
      FROM events),
    alive0 AS (SELECT DISTINCT arm FROM obs)"""
    ]
    selects = []
    for rung, budget, keep in _SH_RUNGS:
        ctes.append(
            f"""m{rung} AS (
      SELECT o.arm, round(sum(o.cents) / (100.0 * {budget}), 10) AS mean_r
      FROM obs o JOIN alive{rung} a ON a.arm = o.arm
      WHERE o.k <= {budget} GROUP BY o.arm),
    r{rung} AS MATERIALIZED (
      SELECT arm, mean_r,
             row_number() OVER (ORDER BY mean_r DESC, arm) AS rnk
      FROM m{rung}),
    alive{rung + 1} AS (SELECT arm FROM r{rung} WHERE rnk <= {keep})"""
        )
        selects.append(
            f"SELECT CAST({rung} AS BIGINT) AS rung, arm, "
            f"CAST({budget} AS BIGINT) AS budget, "
            f"round(mean_r, 6) AS mean_reward, "
            f"rnk <= {keep} AS kept FROM r{rung}"
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + "\n    "
        + "\n    UNION ALL\n    ".join(selects)
    )


@query("q_successive_halving", oracle=_sh_oracle())
def q_successive_halving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X673 — successive halving (Jamieson & Talwalkar 2016, the rung
    engine inside Hyperband and every prompt/hparam tournament): arms
    (event types) are evaluated on geometrically growing budgets —
    their first 16/32/64 observations in deterministic (ts, event_id)
    arrival order — and the bottom half is eliminated per rung, so
    total spend concentrates on survivors. Means are exact integer
    cents over a FIXED budget (one division per arm per rung);
    elimination ranks on the rounded mean with arm-name tie-break.
    Output: every rung's leaderboard with kept/cut flags — the
    audit trail of the tournament, not just the winner.

    Scale: one windowed arrival-rank pass, then per-rung arm-grain
    aggregates over k ≤ budget rows — rungs are a constant."""
    from pyspark.sql.window import Window as W

    e = load(spark, sf_dir, "events")
    obs = e.select(
        F.col("event_type").alias("arm"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.row_number()
        .over(W.partitionBy("event_type").orderBy("ts", "event_id"))
        .alias("k"),
    ).localCheckpoint(eager=True)
    alive = obs.select("arm").distinct()
    outs = []
    for rung, budget, keep in _SH_RUNGS:
        m = (
            obs.join(alive, "arm")
            .filter(F.col("k") <= budget)
            .groupBy("arm")
            .agg(
                F.round(F.sum("cents") / (100.0 * budget), 10).alias(
                    "mean_r"
                )
            )
        )
        r = m.withColumn(
            "rnk", F.row_number().over(W.orderBy(F.desc("mean_r"), "arm"))
        ).localCheckpoint(eager=True)
        outs.append(
            r.select(
                F.lit(rung).cast("long").alias("rung"),
                "arm",
                F.lit(budget).cast("long").alias("budget"),
                F.round("mean_r", 6).alias("mean_reward"),
                (F.col("rnk") <= keep).alias("kept"),
            )
        )
        alive = r.filter(F.col("rnk") <= keep).select("arm")
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# ---------------------------------------------------------------------------
# X674 — doubly-robust off-policy value estimate
# ---------------------------------------------------------------------------

_DR_ORACLE = """
    WITH b AS (
      SELECT least(CAST(floor(value / 50) AS BIGINT), 9) AS bucket,
             event_type,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type IN ('click', 'purchase')),
    nb AS (
      SELECT bucket,
             sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS nc_b,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS np_b,
             sum(CASE WHEN event_type = 'click' THEN cents ELSE 0 END)
               AS sc_b
      FROM b GROUP BY bucket),
    tot AS (SELECT sum(nc_b) AS nc, sum(np_b) AS np FROM nb),
    cell AS (
      SELECT nb.bucket, nb.nc_b, nb.np_b, nb.sc_b,
             round(nb.sc_b / (100.0 * nb.nc_b), 10) AS qhat,
             round((nb.np_b * 1.0 / tot.np)
                   / (nb.nc_b * 1.0 / tot.nc), 10) AS w
      FROM nb, tot WHERE nb.nc_b > 0),
    parts AS (
      SELECT round(sum(round(c.w * c.qhat, 10) * c.nc_b), 10) AS ips_num,
             round(sum(round(c.qhat * c.np_b, 10)), 10) AS dm_num,
             round(sum(round(c.w * (round(c.sc_b / 100.0, 10)
                   - c.qhat * c.nc_b), 10)), 10) AS corr_num
      FROM cell c),
    tot2 AS (SELECT nc, np FROM tot)
    SELECT CAST(tot2.nc AS BIGINT) AS n_logged,
           CAST(tot2.np AS BIGINT) AS n_target,
           round(parts.ips_num / tot2.nc, 6) AS v_ips,
           round(parts.dm_num / tot2.np, 6) AS v_dm,
           round(parts.dm_num / tot2.np
                 + parts.corr_num / tot2.nc, 6) AS v_dr
    FROM parts, tot2
    """


@query("q_doubly_robust", oracle=_DR_ORACLE)
def q_doubly_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X674 — doubly-robust off-policy value (Dudík et al. 2011): what
    reward per decision would the TARGET population (purchase traffic)
    earn, estimated only from LOGGED proposal data (click traffic)?
    Three estimators side by side: IPS (density-ratio reweighted
    logged reward — unbiased, high variance), direct method (bucket
    reward model q̂ evaluated under the target distribution — biased
    if q̂ is wrong), and DR = DM + importance-weighted residual
    correction, unbiased if EITHER the weights or q̂ are right. The
    off-policy-eval triple every bandit/RLHF deployment reports.
    X652's diagnostics (ESS) say when to trust these numbers; here
    they are computed — all from per-bucket integer count/cent sums,
    doubles at cell grain only.

    Scale: one bucket-grain aggregate; everything else is a 10-row
    scalar fold. Note the cell-grain algebra: Σ_i w_i r_i over logged
    rows collapses to Σ_b w_b·q̂_b·nc_b because w and q̂ are
    bucket-constant — the estimator never touches row-grain floats."""
    e = load(spark, sf_dir, "events")
    b = e.filter(F.col("event_type").isin("click", "purchase")).select(
        F.least(F.floor(F.col("value") / 50).cast("long"), F.lit(9)).alias(
            "bucket"
        ),
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    nb = b.groupBy("bucket").agg(
        F.sum((F.col("event_type") == "click").cast("long")).alias("nc_b"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias(
            "np_b"
        ),
        F.sum(
            F.when(F.col("event_type") == "click", F.col("cents")).otherwise(
                0
            )
        ).alias("sc_b"),
    )
    tot = nb.agg(F.sum("nc_b").alias("nc"), F.sum("np_b").alias("np"))
    cell = (
        nb.crossJoin(F.broadcast(tot))
        .filter(F.col("nc_b") > 0)
        .select(
            "nc_b",
            "np_b",
            "sc_b",
            F.round(F.col("sc_b") / (100.0 * F.col("nc_b")), 10).alias(
                "qhat"
            ),
            F.round(
                (F.col("np_b") * 1.0 / F.col("np"))
                / (F.col("nc_b") * 1.0 / F.col("nc")),
                10,
            ).alias("w"),
        )
    )
    parts = cell.agg(
        F.round(
            F.sum(F.round(F.col("w") * F.col("qhat"), 10) * F.col("nc_b")),
            10,
        ).alias("ips_num"),
        F.round(F.sum(F.round(F.col("qhat") * F.col("np_b"), 10)), 10).alias(
            "dm_num"
        ),
        F.round(
            F.sum(
                F.round(
                    F.col("w")
                    * (
                        F.round(F.col("sc_b") / 100.0, 10)
                        - F.col("qhat") * F.col("nc_b")
                    ),
                    10,
                )
            ),
            10,
        ).alias("corr_num"),
    )
    return parts.crossJoin(tot).select(
        F.col("nc").cast("long").alias("n_logged"),
        F.col("np").cast("long").alias("n_target"),
        F.round(F.col("ips_num") / F.col("nc"), 6).alias("v_ips"),
        F.round(F.col("dm_num") / F.col("np"), 6).alias("v_dm"),
        F.round(
            F.col("dm_num") / F.col("np") + F.col("corr_num") / F.col("nc"),
            6,
        ).alias("v_dr"),
    )


# ---------------------------------------------------------------------------
# X675 — deletion-impact audit (right-to-erasure planning)
# ---------------------------------------------------------------------------

_DEL_MOD = 97
_DEL_RESIDUE = 5

_DELETION_ORACLE = f"""
    WITH c AS (
      SELECT 'customer' AS tbl,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN c_custkey % {_DEL_MOD} = {_DEL_RESIDUE}
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_affected,
             CAST(count(DISTINCT CASE WHEN c_custkey % {_DEL_MOD}
                      = {_DEL_RESIDUE} THEN c_mktsegment END) AS BIGINT)
               AS n_partitions
      FROM customer),
    o AS (
      SELECT 'orders' AS tbl,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN o_custkey % {_DEL_MOD} = {_DEL_RESIDUE}
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_affected,
             CAST(count(DISTINCT CASE WHEN o_custkey % {_DEL_MOD}
                      = {_DEL_RESIDUE}
                      THEN date_trunc('month', o_orderdate) END) AS BIGINT)
               AS n_partitions
      FROM orders),
    l AS (
      SELECT 'lineitem' AS tbl,
             (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_affected,
             CAST(count(DISTINCT date_trunc('month', li.l_shipdate))
                  AS BIGINT) AS n_partitions
      FROM lineitem li JOIN orders oo ON oo.o_orderkey = li.l_orderkey
      WHERE oo.o_custkey % {_DEL_MOD} = {_DEL_RESIDUE}),
    e AS (
      SELECT 'events' AS tbl,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN user_id % {_DEL_MOD} = {_DEL_RESIDUE}
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_affected,
             CAST(count(DISTINCT CASE WHEN user_id % {_DEL_MOD}
                      = {_DEL_RESIDUE} THEN CAST(ts AS DATE) END)
                  AS BIGINT) AS n_partitions
      FROM events),
    u AS (
      SELECT * FROM c UNION ALL SELECT * FROM o
      UNION ALL SELECT * FROM l UNION ALL SELECT * FROM e)
    SELECT tbl, n_rows, n_affected,
           round(n_affected * 1.0 / n_rows, 6) AS frac_affected,
           n_partitions AS n_partitions_to_rewrite
    FROM u
    """


@query("q_deletion_audit", oracle=_DELETION_ORACLE)
def q_deletion_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X675 — deletion-impact audit (GDPR/CCPA right-to-erasure
    planning): for a deletion cohort (subject key % 97 == 5), the
    blast radius across every table that carries the subject —
    directly keyed (customer, orders, events), or transitively via a
    foreign key (lineitem through orders — erasure must follow the
    join graph). Per table: affected rows, affected fraction, and the
    number of PARTITIONS that must be rewritten (date/month/segment
    grain) — at 100 TB the rewrite count, not the row count, is the
    cost of forgetting, which is why erasure-heavy tables get
    subject-id bucketing. Pure count aggregates + one keyed join.

    Scale: one scan per table with map-side conditional counts; the
    lineitem pass joins against the (filtered, broadcastable) order
    keys of the cohort."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    e = load(spark, sf_dir, "events")

    def hit(key):
        return (F.col(key) % _DEL_MOD == _DEL_RESIDUE).cast("long")

    c = cust.agg(
        F.lit("customer").alias("tbl"),
        F.count("*").cast("long").alias("n_rows"),
        F.sum(hit("c_custkey")).cast("long").alias("n_affected"),
        F.countDistinct(
            F.when(
                F.col("c_custkey") % _DEL_MOD == _DEL_RESIDUE,
                F.col("c_mktsegment"),
            )
        )
        .cast("long")
        .alias("n_partitions"),
    )
    o = orders.agg(
        F.lit("orders").alias("tbl"),
        F.count("*").cast("long").alias("n_rows"),
        F.sum(hit("o_custkey")).cast("long").alias("n_affected"),
        F.countDistinct(
            F.when(
                F.col("o_custkey") % _DEL_MOD == _DEL_RESIDUE,
                F.date_trunc("month", F.col("o_orderdate")),
            )
        )
        .cast("long")
        .alias("n_partitions"),
    )
    li_n = li.agg(F.count("*").alias("nr"))
    lhit = (
        li.join(
            orders.filter(
                F.col("o_custkey") % _DEL_MOD == _DEL_RESIDUE
            ).select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
        )
        .agg(
            F.count("*").cast("long").alias("n_affected"),
            F.countDistinct(
                F.date_trunc("month", F.col("l_shipdate"))
            )
            .cast("long")
            .alias("n_partitions"),
        )
        .crossJoin(F.broadcast(li_n))
        .select(
            F.lit("lineitem").alias("tbl"),
            F.col("nr").cast("long").alias("n_rows"),
            "n_affected",
            "n_partitions",
        )
    )
    ev = e.agg(
        F.lit("events").alias("tbl"),
        F.count("*").cast("long").alias("n_rows"),
        F.sum(hit("user_id")).cast("long").alias("n_affected"),
        F.countDistinct(
            F.when(
                F.col("user_id") % _DEL_MOD == _DEL_RESIDUE,
                F.to_date("ts"),
            )
        )
        .cast("long")
        .alias("n_partitions"),
    )
    u = c.unionByName(o).unionByName(lhit).unionByName(ev)
    return u.select(
        "tbl",
        "n_rows",
        "n_affected",
        F.round(F.col("n_affected") * 1.0 / F.col("n_rows"), 6).alias(
            "frac_affected"
        ),
        F.col("n_partitions").alias("n_partitions_to_rewrite"),
    )


# ---------------------------------------------------------------------------
# X676 — verbosity-bias audit of preference pairs
# ---------------------------------------------------------------------------

from .registry import ORACLES as _ORACLES  # noqa: E402

_VB_MARGIN_HI = 0.1

_VERBOSITY_ORACLE = f"""
    WITH pairs AS (
      SELECT * FROM ({_ORACLES['q_preference_pairs']}) t),
    sized AS (
      SELECT p.margin,
             dc.n_chars AS len_c, dr.n_chars AS len_r
      FROM pairs p
      JOIN documents dc ON dc.doc_id = p.chosen_id
      JOIN documents dr ON dr.doc_id = p.rejected_id)
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           round(sum(CASE WHEN len_c > len_r THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS frac_chosen_longer,
           round(avg(len_c - len_r), 6) AS mean_len_gap,
           round(sum(CASE WHEN margin >= {_VB_MARGIN_HI}
                          AND len_c > len_r THEN 1 ELSE 0 END) * 1.0
                 / greatest(sum(CASE WHEN margin >= {_VB_MARGIN_HI}
                                THEN 1 ELSE 0 END), 1), 6)
             AS frac_longer_high_margin,
           round(sum(CASE WHEN margin < {_VB_MARGIN_HI}
                          AND len_c > len_r THEN 1 ELSE 0 END) * 1.0
                 / greatest(sum(CASE WHEN margin < {_VB_MARGIN_HI}
                                THEN 1 ELSE 0 END), 1), 6)
             AS frac_longer_low_margin
    FROM sized
    """


@query("q_verbosity_bias", oracle=_VERBOSITY_ORACLE)
def q_verbosity_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X676 — verbosity-bias audit of the DPO/reward training pairs
    (X611): if "chosen" is systematically LONGER than "rejected", a
    model trained on these pairs learns verbosity instead of quality —
    the best-documented reward-hacking channel in RLHF (length-
    controlled win rates exist precisely because of it). Reported:
    fraction of pairs where chosen is longer, the mean char gap, and
    the longer-win split between high-/low-confidence pairs (a bias
    that GROWS with margin is baked into the reward, not noise).
    Integer char lengths; the pair set is X611's own output, so the
    audit measures exactly what training would consume.

    Scale: the pair table is O(k · groups); the audit is two
    broadcast-able id joins + one aggregate."""
    from .round7b import q_preference_pairs as _pp

    pairs = _pp(spark, sf_dir)
    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    sized = (
        pairs.join(
            d.select(
                F.col("doc_id").alias("chosen_id"),
                F.col("n_chars").alias("len_c"),
            ),
            "chosen_id",
        )
        .join(
            d.select(
                F.col("doc_id").alias("rejected_id"),
                F.col("n_chars").alias("len_r"),
            ),
            "rejected_id",
        )
        .select("margin", "len_c", "len_r")
    )
    longer = (F.col("len_c") > F.col("len_r")).cast("long")
    hi = (F.col("margin") >= _VB_MARGIN_HI).cast("long")
    return sized.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.round(F.sum(longer) * 1.0 / F.count("*"), 6).alias(
            "frac_chosen_longer"
        ),
        F.round(F.avg(F.col("len_c") - F.col("len_r")), 6).alias(
            "mean_len_gap"
        ),
        F.round(
            F.sum(longer * hi) * 1.0 / F.greatest(F.sum(hi), F.lit(1)), 6
        ).alias("frac_longer_high_margin"),
        F.round(
            F.sum(longer * (1 - hi))
            * 1.0
            / F.greatest(F.sum(1 - hi), F.lit(1)),
            6,
        ).alias("frac_longer_low_margin"),
    )


# ---------------------------------------------------------------------------
# X677 — LLM watermark detection (green-list z-score, Kirchenbauer)
# ---------------------------------------------------------------------------

_WM_GAMMA = 0.25  # green-list fraction (power of two — float-exact)
_WM_MOD = 4  # 1/gamma
_WM_Z_FLAG = 2.0

_GREENLIST_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, {_text.tokens_sql('text')} AS t FROM documents),
    scored AS (
      SELECT doc_id,
             len(t) - 1 AS t_scored,
             len(list_filter(range(len(t) - 1), i ->
               {_hashing.token_hash_sql("concat(t[i + 1], '|', t[i + 2])")}
                 % {_WM_MOD} = 0)) AS n_green
      FROM toks WHERE len(t) >= 2)
    SELECT doc_id, CAST(t_scored AS BIGINT) AS t_scored,
           CAST(n_green AS BIGINT) AS n_green,
           round((n_green - {_WM_GAMMA} * t_scored)
                 / sqrt(t_scored * {_WM_GAMMA} * {1 - _WM_GAMMA}), 6) AS z,
           (n_green - {_WM_GAMMA} * t_scored)
             / sqrt(t_scored * {_WM_GAMMA} * {1 - _WM_GAMMA})
             > {_WM_Z_FLAG} AS flagged
    FROM scored
    """


@query("q_greenlist_watermark", oracle=_GREENLIST_ORACLE)
def q_greenlist_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X677 — LLM watermark detection (Kirchenbauer et al. 2023): a
    soft-watermarked generator biases each token toward a "green list"
    seeded by the PREVIOUS token's hash; the detector needs no model —
    recompute green membership (hash(prev|cur) mod 4 == 0, γ = 1/4)
    over every adjacent pair and test the green count against the
    binomial null: z = (g − γT)/√(Tγ(1−γ)), flag z > 2. THE
    provenance filter a training-data pipeline runs to keep
    watermarked synthetic text out of (or measured inside) a crawl.
    Integer green counts, γ a power of two, √ of an integer product —
    engine-identical arithmetic; one projection pass, no shuffle at
    all until the caller aggregates.

    Scale: per-doc map-side array fold over adjacent pairs — word-count
    cost without the shuffle."""
    d = load(spark, sf_dir, "documents")
    toks = _text.tokens(F.col("text"))
    t = d.select("doc_id", toks.alias("t")).filter(F.size("t") >= 2)
    green = F.size(
        F.filter(
            F.sequence(F.lit(0), F.size("t") - 2),
            lambda i: _hashing.token_hash(
                F.concat(
                    F.element_at(F.col("t"), i + 1),
                    F.lit("|"),
                    F.element_at(F.col("t"), i + 2),
                )
            )
            % _WM_MOD
            == 0,
        )
    )
    scored = t.select(
        "doc_id",
        (F.size("t") - 1).cast("long").alias("t_scored"),
        green.cast("long").alias("n_green"),
    )
    zexpr = (F.col("n_green") - _WM_GAMMA * F.col("t_scored")) / F.sqrt(
        F.col("t_scored") * _WM_GAMMA * (1 - _WM_GAMMA)
    )
    return scored.select(
        "doc_id",
        "t_scored",
        "n_green",
        F.round(zexpr, 6).alias("z"),
        (zexpr > _WM_Z_FLAG).alias("flagged"),
    )


# ---------------------------------------------------------------------------
# X679 — KNN-Shapley data valuation (exact closed form)
# ---------------------------------------------------------------------------

_KS_K = 5  # the KNN classifier's K

_KNN_SHAPLEY_ORACLE = f"""
    WITH anchors AS (
      SELECT vec_id AS q_id, embedding AS q_emb, label AS albl
      FROM embeddings WHERE vec_id % 25 = 0),
    train AS (
      SELECT vec_id AS n_id, embedding AS emb, label AS tlbl
      FROM embeddings WHERE vec_id % 25 <> 0),
    ranked AS MATERIALIZED (
      SELECT a.q_id, t.n_id, t.tlbl,
             CASE WHEN t.tlbl = a.albl THEN 1.0 ELSE 0.0 END AS d,
             row_number() OVER (PARTITION BY a.q_id
               ORDER BY round({_vectors.cosine_sql('t.emb', 'a.q_emb')}, 6)
                        DESC, t.n_id) AS rk,
             count(*) OVER (PARTITION BY a.q_id) AS n
      FROM anchors a CROSS JOIN train t),
    terms AS (
      SELECT q_id, n_id, tlbl, rk,
             round(CASE WHEN rk = n THEN d / n
                   ELSE (d - lead(d) OVER (PARTITION BY q_id ORDER BY rk))
                        * least(rk, {_KS_K}) / (rk * 1.0 * {_KS_K}) END,
                   10) AS term
      FROM ranked),
    svals AS (
      SELECT q_id, n_id, tlbl,
             round(sum(term) OVER (PARTITION BY q_id ORDER BY rk DESC),
                   10) AS s
      FROM terms),
    vals AS (
      SELECT n_id, any_value(tlbl) AS label, round(avg(s), 10) AS v
      FROM svals GROUP BY n_id)
    SELECT n_id AS vec_id, label, round(v, 6) AS shapley_value
    FROM (SELECT *, row_number() OVER (ORDER BY v DESC, n_id) AS rn
          FROM vals)
    WHERE rn <= 20
    """


@query("q_knn_shapley", oracle=_KNN_SHAPLEY_ORACLE)
def q_knn_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X679 — exact KNN-Shapley data valuation (Jia et al. 2019): the
    Shapley value of every training point for a K-NN classifier has a
    CLOSED FORM — rank train points by similarity per test point, then
    the suffix recursion s_k = s_(k+1) + (δ_k − δ_(k+1))·min(k,K)/(kK)
    (δ = label match) telescopes into a windowed suffix sum. Averaged
    over the anchor test set and reporting the top-20 most valuable
    points — the principled "which examples are worth buying/keeping"
    number, exact where TracIn/influence functions approximate.
    Both engines run the identical rank order (rounded cosine,
    id tie-break) and the identical suffix-sum sequence.

    Scale: valuation-set × train ranking is the cost (q·n scored
    pairs, two windows) — run on a sampled valuation set, or route
    candidates through ann.ivf_search with truncated ranks (the
    standard large-n approximation) when q·n bites."""
    from pyspark.sql.window import Window as W

    emb = load(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("albl"),
    )
    train = (
        emb.filter(F.col("vec_id") % 25 != 0)
        .select(
            F.col("vec_id").alias("n_id"),
            F.col("embedding").alias("emb"),
            F.col("label").alias("tlbl"),
        )
        # the q·n cosine pass below is the query's whole cost; the
        # single-split testdata scan would otherwise run it on one core
        # (guide §2.6/§4 — spread CPU-heavy per-row work; same idiom as
        # llm_ext._docs)
        .repartition(default_parallelism())
    )
    ranked = (
        F.broadcast(anchors).crossJoin(train)
        .select(
            "q_id",
            "n_id",
            "tlbl",
            F.when(F.col("tlbl") == F.col("albl"), 1.0)
            .otherwise(0.0)
            .alias("d"),
            F.round(
                _vectors.cosine("emb", "q_emb"), 6
            ).alias("c"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("q_id").orderBy(F.desc("c"), "n_id")
            ),
        )
        .withColumn("n", F.count("*").over(W.partitionBy("q_id")))
        .localCheckpoint(eager=True)
    )
    w_rk = W.partitionBy("q_id").orderBy("rk")
    terms = ranked.select(
        "q_id",
        "n_id",
        "tlbl",
        "rk",
        F.round(
            F.when(F.col("rk") == F.col("n"), F.col("d") / F.col("n")).otherwise(
                (F.col("d") - F.lead("d").over(w_rk))
                * F.least(F.col("rk"), F.lit(_KS_K))
                / (F.col("rk") * 1.0 * _KS_K)
            ),
            10,
        ).alias("term"),
    )
    svals = terms.select(
        "q_id",
        "n_id",
        "tlbl",
        F.round(
            F.sum("term").over(
                W.partitionBy("q_id")
                .orderBy(F.desc("rk"))
                .rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
            10,
        ).alias("s"),
    )
    vals = svals.groupBy("n_id").agg(
        F.any_value("tlbl").alias("label"),
        F.round(F.avg("s"), 10).alias("v"),
    )
    return (
        vals.withColumn(
            "rn", F.row_number().over(W.orderBy(F.desc("v"), "n_id"))
        )
        .filter(F.col("rn") <= 20)
        .select(
            F.col("n_id").alias("vec_id"),
            "label",
            F.round("v", 6).alias("shapley_value"),
        )
    )


# ---------------------------------------------------------------------------
# X680 — ANN-routed (truncated) KNN-Shapley — X679's production twin
# ---------------------------------------------------------------------------

_KST_M = 32  # truncation depth = ANN k

_KNN_SHAPLEY_ROUTED_ORACLE = f"""
    WITH corpus AS (
      SELECT vec_id AS n_id, embedding AS emb, label AS tlbl
      FROM embeddings WHERE vec_id % 25 <> 0),
    anchors AS (
      SELECT vec_id AS q_id, embedding AS q_emb, label AS albl
      FROM embeddings WHERE vec_id % 25 = 0),
    cent AS (
      SELECT n_id AS c_id, emb AS c_emb FROM corpus
      WHERE n_id % {_MM_EVERY} = 1),
    {_ann.ivf_search_sql("corpus", "anchors", "cent", k=_KST_M,
                         nprobe=_MM_NPROBE,
                         corpus_extra=("tlbl",), query_extra=("albl",),
                         prefix="ks_")},
    ranked AS MATERIALIZED (
      SELECT q_id, n_id, tlbl, rn AS rk,
             CASE WHEN tlbl = albl THEN 1.0 ELSE 0.0 END AS d,
             count(*) OVER (PARTITION BY q_id) AS m
      FROM ks_topk),
    terms AS (
      SELECT q_id, n_id, tlbl, rk,
             round(CASE WHEN rk = m
                   THEN d * least(rk, {_KS_K}) / (rk * 1.0 * {_KS_K})
                   ELSE (d - lead(d) OVER (PARTITION BY q_id ORDER BY rk))
                        * least(rk, {_KS_K}) / (rk * 1.0 * {_KS_K}) END,
                   10) AS term
      FROM ranked),
    svals AS (
      SELECT q_id, n_id, tlbl,
             round(sum(term) OVER (PARTITION BY q_id ORDER BY rk DESC),
                   10) AS s
      FROM terms),
    vals AS (
      SELECT n_id, any_value(tlbl) AS label, round(sum(s), 10) AS v,
             CAST(count(*) AS BIGINT) AS n_anchors
      FROM svals GROUP BY n_id)
    SELECT n_id AS vec_id, label, round(v, 6) AS shapley_value, n_anchors
    FROM (SELECT *, row_number() OVER (ORDER BY v DESC, n_id) AS rn
          FROM vals)
    WHERE rn <= 20
    """


@query("q_knn_shapley_routed", oracle=_KNN_SHAPLEY_ROUTED_ORACLE)
def q_knn_shapley_routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X680 — truncated KNN-Shapley on the ANN path: X679's production
    twin (the same exact-vs-routed policy as q_margin_mining /
    q_margin_mining_routed). Candidates come from ivf_search top-32
    per anchor instead of a full ranking; the suffix recursion runs
    within the truncated list with the boundary term
    δ_m·min(m,K)/(mK) — the TKNN-Shapley estimator: beyond rank m,
    per-point terms decay as 1/j and points outside every anchor's
    candidate set receive zero value (which is also the right
    deployment semantics: unretrieved data cannot influence a K-NN
    decision). Values SUM over anchors (truncation makes per-anchor
    participation uneven, so a mean would overweight rarely-retrieved
    points). Oracle replays routing + windows via ivf_search_sql.

    Scale: q·m scored pairs with m constant — linear in the valuation
    set and corpus-independent per anchor, vs the exact form's q·n;
    the twin relationship is pytest-pinned (top-list overlap)."""
    from pyspark.sql.window import Window as W

    emb = load(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 25 != 0).select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").alias("emb"),
        F.col("label").alias("tlbl"),
    )
    anchors = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("albl"),
    )
    # residue=1: the corpus excludes vec_id % 25 == 0, so the default
    # every-50th-residue-0 quantizer would be EMPTY (50 | vec_id => 25 | vec_id)
    topm = _ann.ivf_search(
        corpus, anchors, k=_KST_M, nprobe=_MM_NPROBE,
        every=_MM_EVERY, residue=1,
    )
    ranked = (
        topm.select(
            "q_id",
            "n_id",
            "tlbl",
            F.col("rn").alias("rk"),
            F.when(F.col("tlbl") == F.col("albl"), 1.0)
            .otherwise(0.0)
            .alias("d"),
        )
        .withColumn("m", F.count("*").over(W.partitionBy("q_id")))
        .localCheckpoint(eager=True)
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
        "tlbl",
        F.round(
            F.sum("term").over(
                W.partitionBy("q_id")
                .orderBy(F.desc("rk"))
                .rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
            10,
        ).alias("s"),
    )
    vals = svals.groupBy("n_id").agg(
        F.any_value("tlbl").alias("label"),
        F.round(F.sum("s"), 10).alias("v"),
        F.count("*").cast("long").alias("n_anchors"),
    )
    return (
        vals.withColumn(
            "rn", F.row_number().over(W.orderBy(F.desc("v"), "n_id"))
        )
        .filter(F.col("rn") <= 20)
        .select(
            F.col("n_id").alias("vec_id"),
            "label",
            F.round("v", 6).alias("shapley_value"),
            "n_anchors",
        )
    )
