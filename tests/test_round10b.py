"""Semantic property tests for the round-10 batch B operators
(X718–X725) — the math invariants behind the hash gate."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kafka_stream_spark.plans.round10b import (
    _SPRT_A,
    _SPRT_L0,
    _SPRT_L1,
    _SPRT_THRESH,
    q_bloom_fpr,
    q_cms_sketch,
    q_cvar_loss,
    q_mauve_quantized,
    q_scaling_law_fit,
    q_sprt_decision,
    q_stolcke_prune,
    q_ucb_allocation,
)
from kafka_stream_spark.sources.tables import load


def test_stolcke_kl_is_mutual_information_nonneg(spark, sf_dir):
    """Σ p(h,w)·ln(p(w|h)/p(w)) over the full bigram table IS the
    MLE mutual information I(h; w) ≥ 0; prunable ⊆ all."""
    rows = q_stolcke_prune(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_prunable"] <= r["n_bigrams"]
        assert r["kl_per_token"] >= -1e-6


def test_scaling_law_matches_numpy_polyfit(spark, sf_dir):
    """Closed-form OLS vs an independent float fit on the same
    (quantized) points — loose tolerance, shape guard."""
    e = load(spark, sf_dir, "events").collect()
    got = {
        r["event_type"]: r for r in q_scaling_law_fit(spark, sf_dir).collect()
    }
    from collections import defaultdict

    pts = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for r in e:
        cell = pts[r["event_type"]][r["user_id"]]
        cell[0] += 1
        cell[1] += round(r["value"] * 100)
    for et, users in pts.items():
        xs, ys = [], []
        for n, sc in users.values():
            m6 = (2 * (10000 * sc) + n) // (2 * n)
            xs.append(round(1000.0 * math.log(n)) / 1000.0)
            ys.append(round(1000.0 * math.log(m6 / 1000000.0)) / 1000.0)
        nn = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        slope = (nn * sxy - sx * sy) / (nn * sxx - sx * sx)
        assert abs(got[et]["slope"] - slope) < 0.01
        assert got[et]["n"] == nn


def test_cvar_dominates_var(spark, sf_dir):
    """CVaR (mean of the tail) ≥ VaR (its minimum); k = ceil(n/10)."""
    rows = q_cvar_loss(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["cvar90"] >= r["var90"]
        assert r["k_tail"] == -(-r["n"] // 10)


def test_sprt_decision_matches_python_replay(spark, sf_dir):
    """Replay the LLR walk per arena in plain Python."""
    e = load(spark, sf_dir, "events").collect()
    waves = {}
    for r in sorted(e, key=lambda r: (r["ts"], r["event_id"])):
        waves.setdefault(r["event_type"], []).append(
            int(r["value"] >= _SPRT_THRESH)
        )
    got = {r["event_type"]: r for r in q_sprt_decision(spark, sf_dir).collect()}
    for et, xs in waves.items():
        a = 0
        cross_t, cross_a = None, None
        for t, x in enumerate(xs, start=1):
            a += x
            llr6 = a * _SPRT_L1 + (t - a) * _SPRT_L0
            if cross_t is None and (llr6 >= _SPRT_A or llr6 <= -_SPRT_A):
                cross_t, cross_a = t, a
        r = got[et]
        assert r["n"] == len(xs)
        if cross_t is None:
            assert r["decision"] == "continue" and r["n_steps"] == len(xs)
        else:
            assert r["n_steps"] == cross_t and r["successes"] == cross_a


def test_mauve_frontier_sane(spark, sf_dir):
    """KLs vs a mixture are ≥ 0 (mixture support ⊇ each side), the
    frontier points live in (0, 1], the AUC in [0, 1], and fx is
    monotone DECREASING in λ (more weight on P hurts Q's KL)."""
    rows = sorted(
        q_mauve_quantized(spark, sf_dir).collect(),
        key=lambda r: r["lambda8"],
    )
    assert len(rows) == 7
    for r in rows:
        assert r["kl_p"] >= -1e-6 and r["kl_q"] >= -1e-6
        assert 0.0 < r["fx"] <= 1.0 and 0.0 < r["fy"] <= 1.0
        assert 0.0 <= r["frontier_auc"] <= 1.0
    fx = [r["fx"] for r in rows]
    assert all(fx[i + 1] <= fx[i] + 1e-9 for i in range(len(fx) - 1))


def test_cms_never_underestimates(spark, sf_dir):
    """The count-min guarantee: est(x) ≥ true count, exactly."""
    rows = q_cms_sketch(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["cms_est"] >= r["true_count"]
        assert r["overestimate"] == r["cms_est"] - r["true_count"]


def test_bloom_fpr_bounded_and_predictions_ordered(spark, sf_dir):
    """Measured FPR is a probability; the fill-rate prediction is
    exact-given-independence so the classical approximation should
    be in its neighbourhood (same order of magnitude)."""
    rows = q_bloom_fpr(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_probes"] > 0
        assert 0.0 <= r["fpr"] <= 1.0
        assert 0.0 < r["fill_rate_fpr"] <= 1.0
        assert 0.0 < r["theoretical_fpr"] <= 1.0


def test_ucb_identity_and_rank_permutation(spark, sf_dir):
    """ucb = mean + bonus (to quantization); pull_rank is a
    permutation of 1..n_arms ordered by ucb desc."""
    rows = q_ucb_allocation(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r["ucb"] - (r["mean_reward"] + r["bonus"])) < 2e-6
    ranks = sorted(r["pull_rank"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    by_rank = sorted(rows, key=lambda r: r["pull_rank"])
    for i in range(len(by_rank) - 1):
        assert by_rank[i]["ucb"] >= by_rank[i + 1]["ucb"] - 1e-9
