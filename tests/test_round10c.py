"""Semantic property tests for the round-10 batch C operators
(X727–X734)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kafka_stream_spark.plans.round10c import (
    q_cem_match,
    q_confident_learning,
    q_cox_ph,
    q_gini_stump,
    q_grad_conflict,
    q_platt_scaling,
    q_rfm_segments,
    q_snips_ope,
)
from kafka_stream_spark.sources.tables import load


def test_grad_conflict_cosines_bounded_and_symmetric_pairs(spark, sf_dir):
    rows = q_grad_conflict(spark, sf_dir).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r["label_a"] < r["label_b"]
        assert -1.0 - 1e-9 <= r["cosine"] <= 1.0 + 1e-9
        assert r["conflict"] == (1 if r["cosine"] < 0 else 0)
        seen.add((r["label_a"], r["label_b"]))
    labels = sorted({r["label_a"] for r in rows} | {r["label_b"] for r in rows})
    assert len(seen) == len(labels) * (len(labels) - 1) // 2


def test_gini_stump_beats_trivial_split(spark, sf_dir):
    """The chosen cut's weighted Gini can't exceed the root impurity
    (a stump never makes impurity worse), and both sides are
    non-empty by construction."""
    r = q_gini_stump(spark, sf_dir).collect()
    assert len(r) == 1
    r = r[0]
    assert r["n_left"] > 0 and r["n_right"] > 0
    emb = load(spark, sf_dir, "embeddings").filter(
        F.size("embedding") >= 1
    )
    counts = [
        x["c"]
        for x in emb.groupBy("label").agg(F.count("*").alias("c")).collect()
    ]
    n = sum(counts)
    root = 1.0 - sum((c / n) ** 2 for c in counts)
    assert 0.0 <= r["weighted_gini"] <= root + 1e-6


def test_snips_identity_for_empirical_propensities(spark, sf_dir):
    """With μ = the empirical action shares, Σw = N exactly, so
    SNIPS ≡ IPS; ESS fraction is in (0, 1]."""
    r = q_snips_ope(spark, sf_dir).collect()[0]
    assert r["ips"] == r["snips"]
    assert 0.0 < r["ess_frac"] <= 1.0 + 1e-6
    assert r["k_arms"] >= 2


def test_cem_att_matches_python_recount(spark, sf_dir):
    e = load(spark, sf_dir, "events").collect()
    strata = {}
    for r in e:
        tr = 1 if r["event_type"] == "purchase" else 0
        cents = round(r["value"] * 100)
        key = (r["user_id"] % 8, int(cents) // 2000)
        s = strata.setdefault(key, [0, 0, 0, 0])
        if tr:
            s[0] += 1
            s[2] += cents
        else:
            s[1] += 1
            s[3] += cents

    def sh(a, b):
        m = (2 * abs(a) + b) // (2 * b)
        return m if a >= 0 else -m

    num = den = kept = 0
    for nt, nc, st, sc in strata.values():
        if nt > 0 and nc > 0:
            kept += 1
            num += nt * (sh(10000 * st, nt) - sh(10000 * sc, nc))
            den += nt
    want = sh(num, den) / 1000000.0
    r = q_cem_match(spark, sf_dir).collect()[0]
    assert r["n_strata_kept"] == kept
    assert abs(r["att"] - want) < 2e-6


def test_rfm_segments_partition_users(spark, sf_dir):
    rows = q_rfm_segments(spark, sf_dir).collect()
    assert rows
    e = load(spark, sf_dir, "events")
    n_users = e.select("user_id").distinct().count()
    assert sum(r["n_users"] for r in rows) == n_users
    for r in rows:
        assert len(r["segment"]) == 3
        assert all(ch in "12345" for ch in r["segment"])


def test_platt_calibration_matches_base_rate(spark, sf_dir):
    """After 3 Newton rounds the mean calibrated probability should
    sit near the base rate (the defining property of a fitted
    logistic intercept), and A should be positive (labels were
    constructed to increase with score)."""
    r = q_platt_scaling(spark, sf_dir).collect()[0]
    assert 0.0 < r["base_rate"] < 1.0
    assert abs(r["mean_calibrated_p"] - r["base_rate"]) < 0.05
    assert r["slope_a"] > 0.0


def test_confident_learning_matches_python_recount(spark, sf_dir):
    """Exact recount of the confident-joint off-diagonal in plain
    Python (centroid cosines, class-mean thresholds, argmax with
    class-id tiebreak)."""
    rows = q_confident_learning(spark, sf_dir).collect()
    for r in rows:
        assert r["noisy_label"] != r["suspected_label"]
        assert r["n"] > 0
    vecs = load(spark, sf_dir, "embeddings").collect()
    pts = [
        (
            int(v["vec_id"]),
            int(v["label"]),
            [round(float(x) * 10000) for x in v["embedding"][:16]],
        )
        for v in vecs
        if len(v["embedding"]) >= 16
    ]
    cent: dict[int, list[int]] = {}
    for _, lab, x4 in pts:
        c = cent.setdefault(lab, [0] * 16)
        for k in range(16):
            c[k] += x4[k]
    scores = {}
    for vid, lab, x4 in pts:
        qx = sum(v * v for v in x4)
        if qx == 0:
            continue
        for j, c in cent.items():
            num = sum(a * b for a, b in zip(x4, c))
            qj = sum(v * v for v in c)
            s6 = round(1000000.0 * num / (math.sqrt(qx) * math.sqrt(qj)))
            scores[(vid, j)] = int(s6)
    thr = {}
    for j in cent:
        vals = [
            scores[(vid, j)]
            for vid, lab, _ in pts
            if lab == j and (vid, j) in scores
        ]
        thr[j] = (2 * sum(vals) + len(vals)) // (2 * len(vals))
    want: dict[tuple[int, int], int] = {}
    for vid, lab, _ in pts:
        cands = [
            (scores[(vid, j)], j)
            for j in cent
            if (vid, j) in scores and scores[(vid, j)] >= thr[j]
        ]
        if not cands:
            continue
        best = max(cands, key=lambda t: (t[0], -t[1]))[1]
        if best != lab:
            want[(lab, best)] = want.get((lab, best), 0) + 1
    got = {(r["noisy_label"], r["suspected_label"]): r["n"] for r in rows}
    assert got == want


def test_cox_beta_bounded_and_hr_consistent(spark, sf_dir):
    r = q_cox_ph(spark, sf_dir).collect()[0]
    assert -0.5 <= r["beta"] <= 0.5
    assert abs(r["hazard_ratio"] - round(math.exp(r["beta"]), 6)) < 1e-9
    assert 0 < r["n_events"] <= r["n"]
