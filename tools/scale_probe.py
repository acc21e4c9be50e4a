"""Scale probe: replicate the sf0.1 testdata N× (key-offset to preserve
join integrity) into /tmp and compare headline-operator wall time at 1×
vs N×. Answers "would this plan hold at a bigger scale factor" with
measurements instead of guesses. The replicated copies also create real
duplicate clusters, turning the dedup stack probe into its actual
workload (union copies ⇒ every doc gains N-1 near-identical twins).

Usage: python tools/scale_probe.py [copies=8] [query ...]
(with query names, probes only those and MERGES results into
SCALE_PROBE.json — the incremental path for newly added operators)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafka_stream_spark.plans import QUERIES  # noqa: E402
from kafka_stream_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"

PROBE = [
    "q_board_pipeline",
    "q_rule_match",
    "q_tpch_q1",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_window_tumbling",
    "q_session_window",
    "q_asof_join",
    "q_exact_dedup",
    "q_token_counts",
    "q_rank_topk_per_group",
    "q_cosine_topk",
    "q_ann_lsh",
    "q_simhash",
    "q_jaccard_prefix",
    "q_decontaminate",
    "q_dup_ngram_fraction",
    "q_dataset_mix",
    "q_corpus_build",
    "q_zorder_layout",
    "q_event_pattern",
    "q_tpch_q8",
    "q_tpch_q21",
    # round-2 operators
    "q_autocorr",
    "q_interpolate",
    "q_fk_orphans",
    "q_pii_redact",
    "q_variant_json",
    "q_minhash_est",
    "q_degree_dist",
    # round-3 operators
    "q_containment_lsh",
    "q_simhash_dedup",
    "q_bigram_lm",
    "q_bpe_pairs",
    "q_tfidf_cosine",
    "q_keywords",
    "q_token_pmi",
    "q_quantile_sketch",
    "q_winsorize",
    "q_weighted_sample",
    "q_anomaly_zscore",
    "q_label_prop",
    "q_khop_reach",
    # round-3 batch 2: stats / ML / geo / timeseries operators
    "q_mann_whitney",
    "q_kaplan_meier",
    "q_naive_bayes",
    "q_item_cooccur",
    # q_geo_radius_join / q_dbscan are deliberately NOT probed: key-offset
    # replication multiplies point DENSITY in a FIXED metric space, so
    # eps-radius candidates grow quadratically (15k pairs → 627k at 8×)
    # and the 100 km graph percolates into giant components — an artifact
    # of the replication transform, not the plan. A real 8× corpus covers
    # more space at locally-bounded density, where the cell-join's
    # candidate volume grows ~linearly.
    "q_attribution",
    "q_clamped_balance",
    "q_cusum",
    "q_lttb",
    "q_target_encode",
    "q_bootstrap_ci",
    "q_quantile_norm",
    "q_tpch_q2",
    "q_tpch_q11",
    "q_entity_resolution",
    "q_link_predict",
    "q_vocab_drift",
    "q_zipf_fit",
    # round-4: the iterative/LSH family VERDICT r3 asked to see measured
    # (dedup_clusters, sssp, training_pipeline, near_dedup), plus the
    # new round-4 operators. The replicated corpus gives every doc N-1
    # near-identical twins, so the dedup probes run their REAL workload
    # (dense duplicate clusters), not an empty-candidate best case.
    "q_near_dedup",
    "q_dedup_clusters",
    "q_training_pipeline",
    "q_sssp",
    "q_sequence_pack",
    "q_video_frames",
    # q_semantic_dedup is probed but expected ~quadratic HERE ONLY:
    # the gate pins k=8 clusters for oracle determinism, so 8x members
    # per cluster => ~64x within-cluster pairs. SemDeDup's production
    # setting scales k with n (50k clusters for LAION), which bounds
    # cluster width and restores ~linear cost; see SCALE.md.
    "q_semantic_dedup",
    # round-4 session continuation: LM-depth, graph, span-dedup, and
    # tuning operators added after the first SCALE.md refresh.
    # q_mutual_nn is deliberately NOT probed (documented exact all-pairs
    # correctness twin of the IVF path, like q_cosine_topk's exclusion
    # from bench).  q_substring_dedup/q_paragraph_dedup run their REAL
    # workload here: every copy adds 7 cross-doc duplicate twins.
    "q_kneser_ney",
    "q_perplexity_filter",
    "q_substring_dedup",
    "q_paragraph_dedup",
    "q_hits",
    "q_jaccard_neighbors",
    "q_lsh_tuning",
    "q_silhouette",
    "q_binary_segmentation",
    "q_kmv_distinct",
    "q_rake_keyphrases",
    "q_source_similarity",
    "q_growth_accounting",
    "q_process_map",
    # round-5: the unprobed >1s headline tier (VERDICT r4 Next round #3)
    "q_kcore",
    "q_knn_classify",
    "q_ann_ivf",
    "q_profile_table",
    "q_rolling_corr",
    "q_pca_power",
    # round-5: the production (k ~ sqrt(n)) form of semantic dedup —
    # contrast with q_semantic_dedup's gate-pinned k=8 quadratic probe
    "q_semantic_dedup_kscaled",
    # round-5 components
    "q_jpeg_pipeline",
    "q_jpeg_dedup",
    "q_wl_colors",
    "q_dsir_weights",
    "q_pit_join",
    "q_match_recognize",
    "q_intra_doc_repetition",
    "q_weibull_fit",
    "q_pq_codebook",
    "q_ivfpq_recall",
    "q_conductance",
    "q_embedding_decontaminate",
    "q_dedup_best_of_cluster",
    "q_audio_pipeline",
    "q_jpeg_progressive",
    "q_multimodal_manifest",
    # round-6 components
    "q_gif_animation",
    "q_durbin_watson",
    "q_newey_west",
    "q_chow_test",
    "q_dagostino_k2",
    "q_breusch_pagan",
    "q_granger_lag1",
    "q_blocklist_filter",
    "q_stupid_backoff",
    "q_holm_bonferroni",
    "q_ann_operator",
    "q_ntile_cume",
    "q_fim_transform",
    "q_tvf_family",
    "q_aalen_johansen",
    "q_theta_forecast",
    "q_cluster_purity",
    "q_skipgram_pairs",
    "q_icc",
    "q_tost",
    # round-8 additions: the heavy/new-shape tier (metric joins,
    # fingerprint candidate joins, factorization, mining).
    # q_margin_mining is deliberately NOT probed: its gate instance is
    # the documented all-pairs correctness twin (like q_cosine_topk);
    # the production path routes candidates through ann.ivf_search.
    "q_bleu",
    "q_rouge_n",
    "q_winnow_fingerprints",
    "q_cdc_chunks",
    "q_memorization_audit",
    "q_nmf_topics",
    "q_basket_rules",
    "q_apriori3",
    "q_kalman_1d",
    "q_qini_curve",
    "q_bpe_bytes",
]


def _semantic_dedup_kscaled(spark, sf_dir):
    """Probe variant of q_semantic_dedup with SemDeDup's production
    k ~ sqrt(n): k = 8 at the sf0.1 baseline (2000 vectors) and
    8*sqrt(8) ~ 23 at the 8x corpus, so cluster WIDTH stays ~sqrt(n)
    and the pair stage stays ~linear. Same operator, same tau; only
    the gate's determinism pin (fixed k=8) is lifted."""
    import math

    from kafka_stream_spark.operators.semdedup import semantic_dedup
    from kafka_stream_spark.sources.tables import load

    e = load(spark, sf_dir, "embeddings")
    n = e.count()
    k = max(8, int(round(8 * math.sqrt(n / 2000.0))))
    return semantic_dedup(e, k=k, tau=0.4, iters=2)


def _semantic_dedup_routed_kscaled(spark, sf_dir):
    """Probe variant of q_semantic_dedup_routed with BOTH production
    knobs on: IVF-routed candidates (assigned cell ∈ nprobe=2 probed
    cells, the X573 rule) AND SemDeDup's k ~ sqrt(n) codebook (the
    gate pins k=8 for oracle determinism, which is quadratic by
    construction at 64x — same exclusion policy as q_semantic_dedup).
    Cluster width stays ~sqrt(n), so routed candidate volume per
    vector is ~nprobe·sqrt(n) and the pair stage stays ~n^1.5 total
    on fixed cores — sub-linear wall time once the shuffle dominates."""
    import math

    from kafka_stream_spark.operators.semdedup import (
        semantic_dedup_routed,
        train_centroids,
    )
    from kafka_stream_spark.sources.tables import load

    emb = load(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    n = e.count()
    k = max(8, int(round(8 * math.sqrt(n / 2000.0))))
    cent = train_centroids(e, k=k, iters=2)
    return semantic_dedup_routed(emb, cent, tau=0.4, nprobe=2)


def _knn_ivf_scaled(spark, sf_dir):
    """Probe variant of q_knn_classify with the production centroid
    scaling: every ~ sqrt(n) so n_centroids ~ sqrt(n) (the gate pins
    every=50 for oracle determinism). Assignment is then O(n·sqrt(n))
    against a broadcast codebook and each query scores ~nprobe·sqrt(n)
    candidates, vs the pre-round-6 brute force's O(0.05·n²)."""
    import math

    from pyspark.sql.window import Window as W

    from kafka_stream_spark.operators import ann
    from kafka_stream_spark.sources.tables import load

    e = load(spark, sf_dir, "embeddings")
    n = e.count()
    every = max(2, int(round(math.sqrt(n))))
    test = e.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("true_label"),
    )
    train = e.filter(F.col("vec_id") % 20 != 0).select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").alias("emb"),
        F.col("label").alias("lbl"),
    )
    top5 = ann.ivf_search(train, test, k=5, nprobe=2, every=every, residue=1)
    w_vote = W.partitionBy("q_id").orderBy(F.desc("c"), "lbl")
    votes = (
        top5.groupBy("q_id", "true_label", "lbl")
        .agg(F.count("*").alias("c"))
        .withColumn("vr", F.row_number().over(w_vote))
        .filter(F.col("vr") == 1)
    )
    return votes.groupBy(
        "true_label", F.col("lbl").alias("pred_label")
    ).agg(F.count("*").alias("n"))


#: probe-only parameterized variants (not in the oracle registry —
#: their parameters scale with the corpus, which the gate cannot pin)
def _hard_negatives_scaled(spark, sf_dir):
    """Probe variant of q_hard_negatives with every ~ sqrt(n) centroid
    scaling (gate pins every=50) — same ivf_search call, production
    codebook density."""
    import math

    from kafka_stream_spark.operators import ann
    from kafka_stream_spark.sources.tables import load

    e = load(spark, sf_dir, "embeddings")
    n = e.count()
    every = max(2, int(round(math.sqrt(n))))
    corpus = e.select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").alias("emb"),
        F.col("label").alias("clbl"),
    )
    anchors = e.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("albl"),
    )
    top3 = ann.ivf_search(
        corpus,
        anchors,
        k=3,
        nprobe=2,
        every=every,
        pair_filter=F.col("clbl") != F.col("albl"),
    )
    return top3.select(
        F.col("q_id").alias("aid"),
        F.col("n_id").alias("cand"),
        "clbl",
        F.col("score").alias("cos_sim"),
    )


def _graph_ann_indexed(spark, sf_dir):
    """Search-only probe of the production graph-ANN path (round-7
    verdict #1): the √n-codebook index is built ONCE per corpus
    (cached under /tmp keyed by sf_dir — the warm pass pays the build,
    the timed pass only searches), so the measured cost is the
    persisted-index search: codebook-routed seeds + frontier-sized
    beam hops + id-lookup rescoring. Expected ~flat as the corpus
    grows: hop cost is |Q|·beam against the edge table, independent
    of n."""
    import hashlib
    import os

    from kafka_stream_spark.operators import ann
    from kafka_stream_spark.sources.tables import load

    emb = load(spark, sf_dir, "embeddings")
    corpus = emb.select(
        F.col("vec_id").alias("n_id"), F.col("embedding").alias("emb")
    )
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    idx = f"/tmp/annidx_probe_{tag}"
    if not os.path.exists(f"{idx}/edges/_SUCCESS"):
        ann.build_ann_index(corpus, idx, g=8, nprobe=2)
    # FIXED query set across scales (replicas offset ids by 10M):
    # search-only scaling is meaningful only at constant |Q|
    qs = emb.filter(
        (F.col("vec_id") % 25 == 7) & (F.col("vec_id") < 10_000_000)
    ).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    return ann.graph_ann_search_indexed(
        spark, idx, corpus, qs, k=3, beam=8, hops=4, nprobe=2
    )


def _ivf_index_cached(spark, sf_dir, corpus, residue: int):
    """Build-once IVF index (centroids + assignment) persisted under
    /tmp keyed by (sf_dir, residue) — the ann.py 100-TB contract where
    the inverted index is corpus state and assignment drops out of the
    steady-state cost — with the PRODUCTION codebook density
    (centroids ~ sqrt(n), i.e. every ~ sqrt(n) spacing): the gate's
    pinned every=50 makes the codebook grow LINEARLY, so corpus-sized
    query sets pay n x (n/50) in routing — the quadratic wall the 64x
    build-each-time probes hit. A sqrt(n) codebook balances routing
    (n·sqrt(n)) against cell width (sqrt(n)), the standard IVF rule.
    The warm pass pays the build; the timed pass reads two parquet
    tables."""
    import hashlib
    import math
    import os

    from kafka_stream_spark.operators import ann

    tag = hashlib.md5(f"{sf_dir}|{residue}|sqrtn".encode()).hexdigest()[:10]
    base = f"/tmp/ivfidx_probe_{tag}"
    if not os.path.exists(f"{base}/assigned/_SUCCESS"):
        n = corpus.count()
        every = max(2, int(round(math.sqrt(n))))
        cent = ann.deterministic_centroids(corpus, every, residue)
        cent.write.mode("overwrite").parquet(f"{base}/centroids")
        ann.ivf_assign(
            corpus, spark.read.parquet(f"{base}/centroids")
        ).write.mode("overwrite").parquet(f"{base}/assigned")
    return (
        spark.read.parquet(f"{base}/centroids"),
        spark.read.parquet(f"{base}/assigned"),
    )


def _facility_location_indexed(spark, sf_dir):
    """Steady-state probe of q_facility_location (X658): same greedy
    rounds, but the IVF similarity graph is routed through the
    PERSISTED index (_ivf_index_cached) — the 64x probe of the
    build-each-time form showed the gate-pinned every=50 assignment
    (n vectors x n/50 centroids) going quadratic; production amortizes
    that build into corpus state, leaving route + cell join + K
    edge-grain aggregates — linear work, flat per-core."""
    from kafka_stream_spark.operators import ann
    from kafka_stream_spark.plans.round9 import _FL_EDGE_K, _FL_K, _MM_NPROBE
    from kafka_stream_spark.sources.tables import load
    from pyspark.sql.window import Window as W

    emb = load(spark, sf_dir, "embeddings")
    corpus = emb.select(
        F.col("vec_id").alias("n_id"), F.col("embedding").alias("emb")
    )
    qs = emb.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    cent, assigned = _ivf_index_cached(spark, sf_dir, corpus, residue=0)
    edges = (
        ann.ivf_search(
            corpus, qs, k=_FL_EDGE_K, nprobe=_MM_NPROBE,
            centroids=cent, assigned=assigned,
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
        out = out.unionAll(o)
    return out


def _knn_shapley_indexed(spark, sf_dir):
    """Steady-state probe of q_knn_shapley_routed (X680) through the
    persisted IVF index — same reasoning as _facility_location_indexed
    (the 64x build-each-time probe hit the pinned-every assignment
    wall); the steady-state cost is route + cell join + per-anchor
    windows, linear in anchors x cell width."""
    from kafka_stream_spark.operators import ann
    from kafka_stream_spark.plans.round9 import _KS_K, _KST_M, _MM_NPROBE
    from kafka_stream_spark.sources.tables import load
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
    cent, assigned = _ivf_index_cached(spark, sf_dir, corpus, residue=1)
    topm = ann.ivf_search(
        corpus, anchors, k=_KST_M, nprobe=_MM_NPROBE,
        centroids=cent, assigned=assigned,
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


VARIANTS = {
    "q_semantic_dedup_kscaled": _semantic_dedup_kscaled,
    "q_semantic_dedup_routed_kscaled": _semantic_dedup_routed_kscaled,
    "q_knn_ivf_scaled": _knn_ivf_scaled,
    "q_hard_negatives_scaled": _hard_negatives_scaled,
    "q_graph_ann_indexed": _graph_ann_indexed,
    "q_facility_location_indexed": _facility_location_indexed,
    "q_knn_shapley_indexed": _knn_shapley_indexed,
}

KEY_OFFSETS = {
    "documents": {"doc_id": 10_000_000},
    "events": {"event_id": 1_000_000_000, "user_id": 10_000},
    "lineitem": {"l_orderkey": 1_000_000_000},
    "orders": {"o_orderkey": 1_000_000_000, "o_custkey": 10_000_000},
    "customer": {"c_custkey": 10_000_000},
    "embeddings": {"vec_id": 10_000_000},
}
DIMS = ["nation", "region", "part", "supplier"]


def build(
    spark,
    dst: str,
    copies: int,
    natural: bool = False,
    tables=None,
    heaps: bool = False,
) -> None:
    """tables=None builds every table; a set restricts the build to
    just those (the 64x probes touch only documents/embeddings — no
    point materializing a 38M-row lineitem nobody reads)."""
    os.makedirs(dst, exist_ok=True)
    for name, keycols in KEY_OFFSETS.items():
        if tables is not None and name not in tables:
            continue
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        if natural and name == "documents":
            out = _natural_documents(
                spark, df, copies, keycols["doc_id"], heaps=heaps
            )
        elif natural and name == "events":
            out = _natural_events(spark, df, copies, keycols)
        elif natural and name == "embeddings":
            out = _natural_embeddings(df, copies, keycols["vec_id"])
        elif natural and name == "lineitem":
            # graph realism: a growing business adds SUPPLIERS too —
            # offsetting l_suppkey per copy grows the supplier↔customer
            # shipment graph as disjoint communities instead of turning
            # every supplier into an 8×-degree hub (key-offset mode
            # densifies; natural mode grows). l_partkey is left alone
            # (part is an unreplicated dim).
            out = None
            for i in range(copies):
                p = df.withColumn(
                    "l_suppkey", F.col("l_suppkey") + F.lit(i * 1_000_000)
                )
                for c, off in keycols.items():
                    p = p.withColumn(c, F.col(c) + F.lit(i * off))
                out = p if out is None else out.union(p)
        else:
            out = None
            for i in range(copies):
                p = df
                for c, off in keycols.items():
                    p = p.withColumn(c, F.col(c) + F.lit(i * off))
                out = p if out is None else out.union(p)
        out.write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
    for t in DIMS:
        if tables is not None and t not in tables:
            continue
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )


def _natural_events(spark, events, copies: int, keycols):
    """Natural growth for the event stream: key-offset mode replicates
    users INSIDE the same time window, so interval-density queries
    (session overlap, max concurrency) see overlap PAIRS grow ~copies²
    — an output artifact, not algorithm cost. Real traffic growth is
    longitudinal: copies 1..N-1 shift event time by i·(span+1h) so the
    stream covers N disjoint periods at the original density. User and
    event ids still offset (new periods bring new users)."""
    import datetime as _dt

    lo, hi = events.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    span_s = int((hi - lo).total_seconds()) + 3600
    out = None
    for i in range(copies):
        p = events.withColumn(
            "ts",
            F.col("ts") + F.expr(f"INTERVAL {i * span_s} SECONDS"),
        )
        for c, off in keycols.items():
            p = p.withColumn(c, F.col(c) + F.lit(i * off))
        out = p if out is None else out.union(p)
    return out


def _natural_embeddings(emb, copies: int, id_off: int):
    """Natural growth for the vector corpus: key-offset mode gives
    every vector N-1 bit-identical twins, so ANN probes measure a
    duplicate explosion (every query's top-k is its own clones).
    Copies 1..N-1 ROTATE the dimension order by i positions — a
    distance-preserving permutation, so the copy population has the
    same norm/spacing statistics as the original but is genuinely
    distinct (a rotated vector's cosine to its source is ~the corpus
    mean, not 1.0)."""
    dims = len(emb.select("embedding").first()["embedding"])
    out = None
    for i in range(copies):
        r = i % dims
        if r == 0:
            p = emb
        else:
            p = emb.withColumn(
                "embedding",
                F.concat(
                    F.slice("embedding", r + 1, dims - r),
                    F.slice("embedding", 1, r),
                ),
            )
        p = p.withColumn("vec_id", F.col("vec_id") + F.lit(i * id_off))
        out = p if out is None else out.union(p)
    return out


def _natural_documents(
    spark, docs, copies: int, id_off: int, heaps: bool = False
):
    """Natural-growth corpus synthesis (VERDICT r4 Next round #4):
    key-offset replication gives every document N-1 near-identical
    twins, so the dedup-family probes measure a ~28x duplicate-pair
    explosion, not the algorithm. This mode grows the corpus the way a
    real one grows — copies 1..N-1 are GENUINELY NEW documents:
    every token position is re-drawn deterministically
    (xxhash64(doc_id, copy, position)) from the corpus's empirical
    unigram distribution, quantized into 1024 alias slots.

    The X436 Heaps fit on this synthetic corpus measures beta = 0.0
    (a closed 31-token vocabulary), so faithful natural growth keeps
    the vocabulary FIXED while token sequences are fresh — new docs
    share no shingles with old ones beyond chance, exactly like newly
    crawled pages in a fixed language. Lengths and the
    lang/source/doc-count mix are preserved per copy; n_chars is
    recomputed from the synthesized text.

    heaps=True additionally grows the VOCABULARY at Heaps-law rate
    (the multi-decade regime): each drawn token is, with probability
    1/4 (hash-derived), suffixed with its copy's GENERATION tag
    g = floor(sqrt(copy)), so after c copies the corpus holds
    ~vocab·sqrt(c) word types — beta ≈ 0.5, real-text Heaps. Without
    it, a 64x closed-vocabulary corpus packs every 3-token shingle
    into ≤31³ distinct values and shingle-bucket candidate volume
    grows ~quadratically with corpus size — a generator artifact no
    real crawl exhibits (their buckets stay bounded precisely because
    vocabulary grows). Closed-vocab mode remains the single-decade
    (8x) generator for round-7 comparability."""
    rows = (
        docs.select(F.explode(F.split("text", " ")).alias("t"))
        .filter(F.col("t") != "")
        .groupBy("t")
        .count()
        .collect()
    )
    total = sum(r["count"] for r in rows)
    slots: list[str] = []
    for r in sorted(rows, key=lambda r: (-r["count"], r["t"])):
        slots += [r["t"]] * max(1, round(1024 * r["count"] / total))
    slots = (slots + slots)[:1024]  # deterministic pad/trim to 1024
    alias = F.array(*[F.lit(s) for s in slots])

    import math

    out = docs
    for i in range(1, copies):
        toks = F.split(F.col("text"), " ")
        gen = int(math.isqrt(i))

        def draw_factory(_i, _gen):
            def draw(_t, pos):
                base = F.element_at(
                    alias,
                    (
                        F.pmod(
                            F.xxhash64(F.col("doc_id"), F.lit(_i), pos),
                            F.lit(1024),
                        )
                        + 1
                    ).cast("int"),
                )
                if not heaps:
                    return base
                tail = (
                    F.pmod(
                        F.xxhash64(
                            F.col("doc_id"), F.lit(_i), pos, F.lit("v")
                        ),
                        F.lit(4),
                    )
                    == 0
                )
                return F.when(
                    tail, F.concat(base, F.lit(f"~{_gen}"))
                ).otherwise(base)

            return draw

        fresh = F.transform(toks, draw_factory(i, gen))
        p = (
            docs.withColumn("text", F.array_join(fresh, " "))
            .withColumn("doc_id", F.col("doc_id") + F.lit(i * id_off))
            .withColumn("n_chars", F.length("text").cast("long"))
        )
        out = out.unionByName(p)
    return out


def timed_pass(spark, sf_dir: str, probe_list=None) -> dict[str, float]:
    probe_list = probe_list or PROBE

    def run(name):
        fn = VARIANTS.get(name) or QUERIES[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()

    for name in probe_list:  # warm
        run(name)
    out = {}
    for name in probe_list:
        t0 = time.time()
        run(name)
        out[name] = round(time.time() - t0, 2)
    return out


def main() -> None:
    import json
    import math

    args = sys.argv[1:]
    natural = "--natural" in args
    if natural:
        args.remove("--natural")
    heaps = "--heaps" in args
    if heaps:
        args.remove("--heaps")
        natural = True
    tables = None
    for a in list(args):
        if a.startswith("--tables="):
            tables = set(a.split("=", 1)[1].split(","))
            args.remove(a)
    copies = int(args[0]) if args else 8
    subset = args[1:] or None
    dst = f"/tmp/scale{copies}{'nat' if natural else ''}{'hp' if heaps else ''}"
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark, dst, copies, natural=natural, tables=tables, heaps=heaps)
    base = timed_pass(spark, SRC, subset)
    scaled = timed_pass(spark, dst, subset)
    print(f"{'query':28s} {'1x':>7s} {f'{copies}x':>7s} {'ratio':>6s} {'exp':>5s}")
    rows = {}
    for name in subset or PROBE:
        r = scaled[name] / max(base[name], 1e-9)
        # observed scaling exponent: time ~ n^exp  =>  exp = log_c(ratio)
        exp = math.log(max(r, 1e-9)) / math.log(copies)
        key = f"{name}@natural" if natural else name
        if heaps:
            key = f"{key}@heaps"
        if copies != 8:  # default-scale keys stay unsuffixed (history)
            key = f"{key}@{copies}x"
        rows[key] = {
            "t_1x": base[name],
            f"t_{copies}x": scaled[name],
            "ratio": round(r, 2),
            "exponent": round(exp, 2),
        }
        print(f"{name:28s} {base[name]:7.2f} {scaled[name]:7.2f} {r:6.2f} {exp:5.2f}")
    sidecar = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_PROBE.json",
    )
    if subset and os.path.exists(sidecar):
        with open(sidecar) as fh:
            prior = json.load(fh)
        # non-default scales carry an @<copies>x key suffix, so probes
        # at different scales coexist in one sidecar — always merge
        merged = dict(prior.get("probes", {}))
        merged.update(rows)
        rows = merged
    with open(sidecar, "w") as fh:
        json.dump({"copies": 8, "src": SRC, "probes": rows}, fh, indent=1)
    print(f"# wrote {sidecar}")


if __name__ == "__main__":
    main()
