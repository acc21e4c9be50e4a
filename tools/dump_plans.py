"""Regenerate PLANS.md: formatted physical plans of representative
queries with the scale-relevant properties called out. Run after plan
changes: python tools/dump_plans.py
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_stream_spark.plans import QUERIES  # noqa: E402
from kafka_stream_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

SHOWCASE = {
    "q_board_pipeline": "flagship: broadcast dims only — fact side never shuffles",
    "q_rule_match": "rule theta-join: BroadcastNestedLoopJoin, predicate in codegen",
    "q_name_lookup_join": "dim lookup: BroadcastHashJoin, no SortMergeJoin",
    "q_notnull_filter": "pushdown: filters inside PushedFilters of the scan",
    "q_sort_limit": "top-k: TakeOrderedAndProject, no global sort",
    "q_tpch_q5": "6-way join: dims broadcast, one real shuffle chain",
    "q_near_dedup": "MinHash-LSH: shuffle carries (band_key, doc_id) only",
    "q_window_tumbling": "partial aggregation before the exchange",
    "q_training_pipeline": "composed pipeline: quality→dedup→chunk, one plan",
    "q_merge_upsert": "MERGE: one full-outer SortMergeJoin, branch logic in codegen",
    "q_jaccard_prefix": "prefix similarity join: size filter fused in join condition",
    "q_gap_fill": "calendar densify: broadcast bounds, one key-partitioned window",
    "q_fk_orphans": "FK audit: six broadcast anti-joins, fact side never shuffles",
    "q_profile_table": "column profile: ONE scan, stats unpivoted from one agg row",
    "q_elo_ratings": "order-dependent fold: ONE FlatMapGroupsInPandas shuffle, zero driver loops",
    "q_sinkhorn_ot": "OT: bin-count groupBy + fixed-size per-ledger fold in applyInPandas",
    "q_infinigram": "suffix backoff: combinable (prefix,next) groupBys + left-join ladder",
    "q_interpolate": "linear gap-fill: IGNORE NULLS anchors share one exchange",
    "q_bitmap_distinct": "mergeable exact distinct: two cascaded partial aggs, no raw keys upward",
    "q_interval_join": "interval join decomposed: bounded windows exploded to a day equi-join, build side broadcast",
    "q_margin_mining_indexed": "persisted-index serving: probed inverted-list reads, no corpus assignment pass",
    "q_cumulative_distinct": "running distinct rewrite: two windows share one series shuffle",
    "q_minhash_est": "sketch calibration: ids-only window, arrays join in parallel",
    "q_containment_lsh": "banded containment: band-key candidates, verify touches candidates only",
    "q_bigram_lm": "bigram LM: partial-agg count shuffles, vocab broadcast scalar",
    "q_tfidf_cosine": "inverted-index cosine: df-capped postings, pair-key agg",
    "q_quantile_sketch": "portable quantile sketch: 128-ary combinable histogram, broadcast stats",
    "q_label_prop": "LPA round: hash-agg min_by winner, no window sort",
    "q_weighted_sample": "weighted sample: TakeOrderedAndProject over pure projection",
    "q_geo_radius_join": "spatial radius join: cell-key equi-join, haversine verify in-bucket",
    "q_naive_bayes": "NB scoring: broadcast vocabulary model, one explode + per-doc agg",
    "q_item_cooccur": "co-purchase lift: order-key pair join, broadcast item counts",
    "q_mann_whitney": "rank test: midranks over the collapsed distinct-value table",
    "q_clamped_balance": "nonlinear fold: local sort + one streaming mapInPandas pass",
    "q_attribution": "last-touch: per-user IGNORE NULLS carry, one user-key exchange",
    "q_pca_power": "PCA: one moment pass, matrix algebra folded to scalar codegen",
    "q_skyline": "Pareto front: one sorted window, dominance self-join eliminated",
    "q_roc_auc": "AUC: collapsed distinct-score midranks, no per-row ranking",
    "q_tpch_q2": "min-cost supplier: agg+rejoin decorrelation, dims broadcast",
    "q_semantic_dedup": "SemDeDup: cluster-keyed pair join bounds candidates, centroids broadcast",
    "q_sequence_pack": "sequence packing: every window partitioned by the shard key, no global sort",
    "q_video_frames": "AVI decode: Arrow-batched mapInPandas, parallelized input, no shuffle",
    "q_hilbert_layout": "Hilbert key: 8 chained codegen projections, one bucket rollup",
    "q_bloom_join_prune": "bloom pruning: broadcast bit-set membership before any join shuffle",
    "q_kcore": "k-core peel: semi-join liveness + count shuffle per round, edge-sized partitions",
    "q_salted_join": "salted skew join: (key, salt) equi-join, dim replicated 8x, result = plain join",
    "q_sssp": "Bellman-Ford: vertex-keyed min-combine supersteps, edge-sized shuffles",
    "q_kneser_ney": "KN bigram LM: three combinable count rollups + key-aligned scoring re-join",
    "q_substring_dedup": "dup spans: gram-df shuffle + per-doc island windows, int keys only",
    "q_jaccard_neighbors": "wedge join: hub-capped centers (deg<=128) bound the pair fan-out",
    "q_hits": "HITS: edge-score join + node agg per half-step, broadcast L1 normalizers",
    "q_lsh_tuning": "LSH sweep: one signature table, three band-key groupings, no re-scan of text",
    "q_png_pipeline": "PNG gate: Arrow-batched encode/decode maps, zero shuffle, 8-byte rows out",
    # round-5 showcase
    "q_jpeg_pipeline": "JPEG gate: same zero-shuffle Arrow shape through an entropy-coded codec",
    "q_jpeg_dedup": "JPEG near-dup: band-key equi-join carries (band, id, hash) only",
    "q_pit_join": "point-in-time join: custkey equi-join + residual validity range, no interval blowup",
    "q_dsir_weights": "DSIR: 256-bucket stats broadcast back onto the token stream",
    "q_pq_codebook": "PQ: broadcast codebooks, (cid, m, dim) partial-agg training shuffles",
    "q_ivfpq_recall": "IVF-PQ+refine: cell-keyed candidates, ADC tuples, 16-row exact re-rank",
    "q_wl_colors": "WL colors: edge join + vertex hash-agg per round, sorted-neighbor signature",
    "q_match_recognize": "row patterns: one user-keyed fold, then scalar string codegen",
    "q_watermark_advisor": "watermark advisor: distinct lateness domain, no per-row rank",
    "q_shard_balance": "shard audit: four map-side assignments union into one 32-row rollup",
    # round-8 showcase
    "q_winnow_fingerprints": "winnowing: fingerprints from one map-side array fold, df-capped candidate join",
    "q_bleu": "BLEU: per-order (pair, gram) partial-agg counts, key-local clip join, 4 scalar rows up",
    "q_nmf_topics": "NMF: V-keyed products are the only data shuffles, k-sized factor joins broadcast",
    "q_qini_curve": "Qini: per-user rollup, decile ntile, 10-row cumulative window",
    "q_vtrace": "V-trace: ONE FlatMapGroupsInPandas per episode, clipped integer fold",
    "q_wasserstein_1d": "exact EMD: quantization-bounded support grid, integer CDF cross-terms",
    "q_mmd_rff": "kernel MMD: broadcast spectral weights, (label x feature) cell state",
    "q_sprt_decision": "SPRT: one window cumsum LLR walk, integer boundary crossings",
    "q_cms_sketch": "count-min: map-side-mergeable cell aggregate, tracked-key audit join",
    "q_cox_ph": "Cox PH: duration-desc suffix-sum risk sets, ONE scalar per Newton round",
    "q_image_edges": "Sobel via real JPEG: two Arrow-batched hops, zero shuffle",
    "q_cluster_se": "cluster-robust SE: per-cluster rollup, decimal(38,0) quadratics",
    "q_ann_ivf_indexed": "persisted IVF serving: scans read the on-disk index, codebook broadcast, zero rebuild",
    "q_margin_mining_routed": "fused bitext mining: ONE side-tagged search serves both directions, max_by mutual-best",
    "q_space_saving": "Space-Saving: ONE FlatMapGroupsInPandas counter fold, exact-prefix audit join",
    "q_bocpd": "BOCPD: run-length posterior fold per stream, integer half-up trajectory",
    "q_sliced_energy": "sliced energy distance: per-slice sort windows, prefix-sum cross terms, no pairs",
    "q_xor_reconcile": "XOR reconcile: two combinable digest aggregates, constant-size state",
    "q_ktruss": "k-truss: hub-cut edges, single-path triangle join, per-round support agg",
    "q_dgim": "DGIM: log²N bucket fold per stream, exact-window audit column",
}


def plan_of(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # plan node ids vary run to run; strip the trailing detail section to
    # keep the diff small and the overview readable
    overview = plan.split("\n\n")[0]
    pushed = re.findall(r"PushedFilters: \[[^\]]*\]", plan)
    pushed = [p for p in pushed if p != "PushedFilters: []"]
    out = overview
    if pushed:
        out += "\n\n" + "\n".join(sorted(set(pushed)))
    return out


def main() -> None:
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    sections = []
    for name, why in SHOWCASE.items():
        sections.append(f"## {name}\n\n{why}\n\n```\n{plan_of(spark, name)}\n```\n")
    body = (
        "# PLANS — physical plans of representative queries\n\n"
        "Auto-generated by `tools/dump_plans.py` (sf0.01 inputs; structure is\n"
        "scale-independent). What to look for: `BroadcastHashJoin`/`Broadcast\n"
        "NestedLoopJoin` on every dimension join (never SortMergeJoin),\n"
        "`PushedFilters` reaching the parquet scans, `TakeOrderedAndProject`\n"
        "for top-k, `HashAggregate` pairs (partial + final) around exchanges,\n"
        "and WholeStageCodegen spans covering the expression-heavy operators.\n\n"
        + "\n".join(sections)
    )
    with open(os.path.join(os.path.dirname(__file__), "..", "PLANS.md"), "w") as f:
        f.write(body)
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
