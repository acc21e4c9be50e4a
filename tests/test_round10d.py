"""Semantic property tests for the round-10 batch D operators
(X736–X738)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_stream_spark.plans.round10d import (
    q_chao1,
    q_hdr_quantiles,
    q_jelinek_mercer,
)
from kafka_stream_spark.sources.tables import load


def test_hdr_error_within_bucket_resolution(spark, sf_dir):
    """HdrHistogram with 3 sub-bucket bits guarantees ≤ 1/8 relative
    error; estimates are monotone in q and never above the exact
    value by more than a bucket (the representative is the bucket's
    LOWER bound, so est ≤ exact always)."""
    rows = sorted(q_hdr_quantiles(spark, sf_dir).collect(), key=lambda r: r["q"])
    assert [r["q"] for r in rows] == [50, 90, 99]
    for r in rows:
        assert r["hdr_estimate"] <= r["exact_value"] + 1e-9
        assert r["rel_error"] <= 0.125 + 1e-6
    ests = [r["hdr_estimate"] for r in rows]
    assert ests == sorted(ests)


def test_jm_lambda_in_unit_interval_and_logprob_negative(spark, sf_dir):
    r = q_jelinek_mercer(spark, sf_dir).collect()[0]
    assert 0.0 < r["lam"] < 1.0
    assert r["n_tokens"] > 0
    assert r["avg_logprob"] < 0.0


def test_jm_em_monotone_vs_start(spark, sf_dir):
    """EM increases the held-out likelihood it optimizes along ITS
    OWN trajectory, so the fitted λ must be at least as good as the
    λ=0.5 starting point (not vs arbitrary endpoints — 3 rounds need
    not reach the global optimum). Recomputed independently in
    Python."""
    import math
    from collections import Counter

    docs = load(spark, sf_dir, "documents").collect()
    train_uni = Counter()
    train_bi = Counter()
    train_h = Counter()
    held = Counter()
    for d in docs:
        t = [x for x in d["text"].split(" ") if x]
        if d["doc_id"] % 5 != 0:
            train_uni.update(t)
            for a, b in zip(t, t[1:]):
                train_bi[(a, b)] += 1
                train_h[a] += 1
        else:
            for a, b in zip(t, t[1:]):
                held[(a, b)] += 1
    n_train = sum(train_uni.values())
    lam = q_jelinek_mercer(spark, sf_dir).collect()[0]["lam"]

    def avg_lp(l):
        s = n = 0
        for (h, w), c in held.items():
            if w not in train_uni or h not in train_h:
                continue
            pbi = train_bi.get((h, w), 0) / train_h[h]
            puni = train_uni[w] / n_train
            s += c * math.log(l * pbi + (1 - l) * puni)
            n += c
        return s / n

    assert avg_lp(lam) >= avg_lp(0.5) - 1e-9


def test_chao1_bounds(spark, sf_dir):
    """chao1 ≥ V always (it only ADDS unseen mass); coverage in
    (0, 1]; F1+2·F2 tokens accounted inside N."""
    rows = q_chao1(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["chao1"] >= r["vocab"]
        assert 0.0 < r["coverage"] <= 1.0
        assert r["f1"] + 2 * r["f2"] <= r["n_tokens"]
        assert r["f1"] + r["f2"] <= r["vocab"]
