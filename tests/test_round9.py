"""Semantic invariants for the round-9 batch (X647–X658)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kafka_stream_spark.plans.round9 import (
    _FL_K,
    _MM_TAU,
    q_data_map,
    q_dawid_skene,
    q_distinct_n,
    q_doremi_weights,
    q_ess_diagnostics,
    q_facility_location,
    q_kalman_1d_grouped,
    q_krippendorff_alpha,
    q_margin_mining_routed,
    q_ndcg_mrr,
    q_pass_at_k,
    q_rbo,
)
from kafka_stream_spark.plans.round8 import q_kalman_1d


def test_kalman_grouped_equals_unrolled(spark, sf_dir):
    """The applyInPandas fold must reproduce the unrolled per-step fold
    bit-for-bit — same rounded recurrence, same trajectory."""
    a = {tuple(r) for r in q_kalman_1d(spark, sf_dir).collect()}
    b = {tuple(r) for r in q_kalman_1d_grouped(spark, sf_dir).collect()}
    assert a == b


def test_margin_mining_routed_mutual_and_thresholded(spark, sf_dir):
    rows = q_margin_mining_routed(spark, sf_dir).collect()
    assert all(r["margin"] >= _MM_TAU for r in rows)
    # mutual best ⇒ each x and each y appears at most once
    xs = [r["x_id"] for r in rows]
    ys = [r["y_id"] for r in rows]
    assert len(xs) == len(set(xs)) and len(ys) == len(set(ys))


def test_pass_at_k_monotone_in_k(spark, sf_dir):
    rows = {r["k"]: r for r in q_pass_at_k(spark, sf_dir).collect()}
    assert set(rows) == {1, 5, 10}
    assert rows[1]["mean_pass"] <= rows[5]["mean_pass"] <= rows[10]["mean_pass"]
    assert all(0.0 <= r["mean_pass"] <= 1.0 for r in rows.values())


def test_pass_at_1_is_mean_pass_rate(spark, sf_dir):
    """pass@1 reduces to the mean per-prompt pass fraction c/n."""
    from kafka_stream_spark.sources.tables import load

    e = load(spark, sf_dir, "events")
    expected = (
        e.groupBy("user_id")
        .agg(
            (
                F.sum((F.col("value") >= 100.0).cast("int")) / F.count("*")
            ).alias("f")
        )
        .agg(F.avg("f"))
        .collect()[0][0]
    )
    got = {r["k"]: r for r in q_pass_at_k(spark, sf_dir).collect()}[1][
        "mean_pass"
    ]
    assert abs(got - expected) < 1e-6


def test_rbo_bounds(spark, sf_dir):
    r = q_rbo(spark, sf_dir).collect()[0]
    assert 0.0 <= r["rbo"] <= 1.0
    assert 0.0 <= r["overlap_at_k"] <= 1.0


def test_ess_diagnostics_invariants(spark, sf_dir):
    r = q_ess_diagnostics(spark, sf_dir).collect()[0]
    assert 0 < r["ess"] <= r["n_proposal"]
    assert 0 < r["ess_frac"] <= 1.0
    # density-ratio weights average 1 under the proposal ⇒ max ≥ 1
    assert r["max_w"] >= 1.0
    # truncation reduces weight variance ⇒ clipped ESS can't be lower
    assert r["ess_clipped"] >= r["ess"] - 1e-6
    assert 0 < r["clip_mass"] <= 1.0


def test_ndcg_mrr_bounds(spark, sf_dir):
    r = q_ndcg_mrr(spark, sf_dir).collect()[0]
    for c in ("mean_ndcg", "mean_mrr", "mean_recall"):
        assert 0.0 <= r[c] <= 1.0, c
    assert r["n_queries"] > 0


def test_distinct_n_ratios(spark, sf_dir):
    rows = q_distinct_n(spark, sf_dir).collect()
    assert {r["n"] for r in rows} == {1, 2, 3}
    for r in rows:
        assert 0 < r["distinct_grams"] <= r["total_grams"]
        assert 0.0 < r["distinct_ratio"] <= 1.0


def test_data_map_quadrants_consistent(spark, sf_dir):
    for r in q_data_map(spark, sf_dir).collect():
        assert 0.0 <= r["confidence"] <= 1.0
        assert 0.0 <= r["correctness"] <= 1.0
        if r["quadrant"] == "ambiguous":
            assert r["variability"] >= 0.2 - 1e-6
        elif r["quadrant"] == "easy":
            assert r["confidence"] >= 0.5 and r["variability"] < 0.2 + 1e-6
        else:
            assert r["confidence"] < 0.5 and r["variability"] < 0.2 + 1e-6


def test_dawid_skene_outputs(spark, sf_dir):
    rows = q_dawid_skene(spark, sf_dir).collect()
    assert len(rows) == 5  # one per event_type annotator
    for r in rows:
        assert 0.0 < r["accuracy"] < 1.0
        assert 0.0 <= r["prevalence"] <= 1.0


def test_krippendorff_alpha_bounds(spark, sf_dir):
    r = q_krippendorff_alpha(spark, sf_dir).collect()[0]
    assert r["d_o"] >= 0 and r["d_e"] > 0
    assert r["alpha"] <= 1.0
    assert r["n_votes"] >= 2 * r["n_items"]


def test_doremi_weights_normalized(spark, sf_dir):
    rows = q_doremi_weights(spark, sf_dir).collect()
    s = sum(r["weight"] for r in rows)
    assert abs(s - 1.0) < 1e-4
    assert all(r["weight"] > 0 for r in rows)


def test_facility_location_greedy_invariants(spark, sf_dir):
    rows = sorted(
        q_facility_location(spark, sf_dir).collect(), key=lambda r: r["rnd"]
    )
    assert len(rows) == _FL_K
    gains = [r["gain"] for r in rows]
    # submodularity ⇒ greedy marginal gains are non-increasing
    assert all(a >= b - 1e-9 for a, b in zip(gains, gains[1:]))
    covs = [r["total_cov"] for r in rows]
    assert all(b >= a - 1e-9 for a, b in zip(covs, covs[1:]))
    # selected facilities are distinct (a reselected facility has 0 gain)
    fac = [r["facility"] for r in rows]
    assert len(fac) == len(set(fac))
    # coverage accounting: cov_t - cov_{t-1} == gain_t (same rounding chain)
    for i in range(1, len(rows)):
        assert math.isclose(
            covs[i] - covs[i - 1], gains[i], abs_tol=2e-6
        )
