"""Semantic property tests for the round-10 batch E operators
(X739–X742)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kafka_stream_spark.plans.round10e import (
    q_boilerplate_prefix,
    q_cluster_se,
    q_f1_threshold,
    q_permutation_entropy,
)
from kafka_stream_spark.sources.tables import load


def test_perm_entropy_near_one_for_exchangeable_values(spark, sf_dir):
    """Event values are effectively exchangeable within an arena, so
    ordinal patterns are near-uniform: normalized PE in (0.9, 1.0+ε];
    and never negative."""
    rows = q_permutation_entropy(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["perm_entropy"] <= 1.0 + 1e-6
        assert r["perm_entropy"] > 0.9
        assert r["n_triples"] > 0


def test_perm_entropy_matches_python_recount(spark, sf_dir):
    e = load(spark, sf_dir, "events").collect()
    from collections import Counter, defaultdict

    series = defaultdict(list)
    for r in sorted(e, key=lambda r: (r["ts"], r["event_id"])):
        series[r["event_type"]].append(r["value"])
    got = {
        r["event_type"]: r for r in q_permutation_entropy(spark, sf_dir).collect()
    }
    for et, vs in series.items():
        pats = Counter()
        for i in range(len(vs) - 2):
            v0, v1, v2 = vs[i], vs[i + 1], vs[i + 2]
            pats[4 * (v1 < v0) + 2 * (v2 < v0) + (v2 < v1)] += 1
        n = sum(pats.values())
        t6 = sum(
            round(1000000.0 * (c / n) * math.log(n / c))
            for c in pats.values()
        )
        want = ((2 * (1000000 * t6) + 1791759) // (2 * 1791759)) / 1000000.0
        assert got[et]["n_triples"] == n
        assert abs(got[et]["perm_entropy"] - want) < 2e-6


def test_cluster_se_dominates_iid(spark, sf_dir):
    """Positive within-cluster correlation (same user repeats) makes
    the cluster-robust SE ≥ the iid SE in expectation; at minimum the
    design effect must be positive and the SEs finite/positive."""
    r = q_cluster_se(spark, sf_dir).collect()[0]
    assert r["se_iid"] > 0 and r["se_cluster"] > 0
    assert r["design_effect"] > 0
    assert abs(
        r["design_effect"] - (r["se_cluster"] / r["se_iid"]) ** 2
    ) < 1e-3
    assert r["n_clusters"] < r["n"]


def test_f1_threshold_is_argmax(spark, sf_dir):
    """Exhaustive Python sweep must find no threshold with a strictly
    better quantized F1."""
    e = load(spark, sf_dir, "events").collect()
    import hashlib

    def th(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    pts = []
    for r in e:
        s = round(r["value"] * 100)
        pts.append((int(s), 1 if th(r["props"]) % 10000 < s else 0))
    p = sum(y for _, y in pts)
    support = sorted({s for s, _ in pts}, reverse=True)
    best = -1
    tp = npred = 0
    from collections import Counter

    by_s = Counter()
    pos_s = Counter()
    for s, y in pts:
        by_s[s] += 1
        pos_s[s] += y
    for s in support:
        tp += pos_s[s]
        npred += by_s[s]
        f16 = round(1000000.0 * 2 * tp / (npred + p))
        best = max(best, f16)
    got = q_f1_threshold(spark, sf_dir).collect()[0]
    assert round(got["f1"] * 1000000) == best
    assert got["tp"] + got["fn"] == p


def test_boilerplate_share_and_counts(spark, sf_dir):
    rows = q_boilerplate_prefix(spark, sf_dir).collect()
    assert rows
    docs = load(spark, sf_dir, "documents")
    n_by_source = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for r in rows:
        assert r["n_docs"] == n_by_source[r["source"]]
        assert 1 <= r["n_modal"] <= r["n_docs"]
        assert 0.0 < r["modal_share"] <= 1.0
