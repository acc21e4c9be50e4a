"""Semantic property tests for the round-10 batch F multimodal
feature operators (X743–X744)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_stream_spark.plans.round10f import q_dft_bands, q_image_edges
from kafka_stream_spark.sources.tables import load


def test_image_edges_orientation_counts_bounded(spark, sf_dir):
    """36 interior pixels bound the orientation counts; energy ≥ 0;
    and a flat image (all-equal levels) would give exactly 0 — so
    energy 0 implies both counts 0."""
    rows = q_image_edges(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["edge_energy"] >= 0
        assert 0 <= r["n_vertical"] + r["n_horizontal"] <= 36
        if r["edge_energy"] == 0:
            assert r["n_vertical"] == 0 and r["n_horizontal"] == 0


def test_image_edges_flat_image_is_zero(spark, sf_dir):
    """Synthetic check through the REAL codec: a constant image has
    zero Sobel response after the roundtrip."""
    from kafka_stream_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rgb = bytes((128, 128, 128)) * (64 * 64)
    payload = encode_jpeg(64, 64, rgb, quality=100, subsampling="4:2:0")
    w, h, decoded = decode_jpeg(payload)
    assert w == h == 64
    assert all(
        decoded[(y * 64 + x) * 3] == 128 for y in range(64) for x in range(64)
    )


def test_dft_bands_shares_sum_to_one(spark, sf_dir):
    """Per clip the 4 band shares sum to ~1 (each is half-up
    quantized, so the sum is within 4 micro units)."""
    rows = q_dft_bands(spark, sf_dir).collect()
    assert rows
    by_vec = {}
    for r in rows:
        by_vec.setdefault(r["vec_id"], []).append(r["band_share"])
    for vid, shares in by_vec.items():
        assert len(shares) == 4
        assert abs(sum(shares) - 1.0) < 5e-6
        assert all(0.0 <= s <= 1.0 for s in shares)


def test_dft_pure_tone_concentrates_in_its_bin(spark, sf_dir):
    """End-to-end physics check through the REAL WAV codec: a pure
    bin-3 sine must put ~all its energy in bin 3."""
    import math

    from kafka_stream_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    smp = [
        max(-32768, min(32767, round(30000 * math.sin(2 * math.pi * 3 * t / 64))))
        for t in range(64)
    ]
    payload = encode_wav(smp, sample_rate=8000)
    _r, _c, out = decode_wav(payload)
    assert list(out) == smp
    energies = {}
    for b in (1, 3, 7, 15):
        re = sum(s * math.cos(2 * math.pi * b * t / 64) for t, s in enumerate(out))
        im = sum(s * math.sin(2 * math.pi * b * t / 64) for t, s in enumerate(out))
        energies[b] = re * re + im * im
    assert energies[3] > 1000 * max(energies[1], energies[7], energies[15])


def test_moe_balance_invariants(spark, sf_dir):
    """Shares sum to 1, gates are probabilities averaging ~1/E per
    expert overall, and the aux loss is >= 1 − ε (Cauchy-Schwarz:
    E·Σ f·P ≥ (Σ sqrt(f·P))²... equality at perfect balance; for a
    hash router it sits near 1)."""
    from kafka_stream_spark.plans.round10g import _MOE_E, q_moe_balance

    rows = sorted(
        q_moe_balance(spark, sf_dir).collect(), key=lambda r: r["expert"]
    )
    assert len(rows) == _MOE_E
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert 0.0 <= r["mean_gate"] <= 1.0
        assert r["aux_loss"] == rows[0]["aux_loss"]
    # hash router ≈ balanced: aux within 10% of the perfect-balance 1.0
    assert 0.9 < rows[0]["aux_loss"] < 1.2


def test_instruction_mining_structural_features(spark, sf_dir):
    """The ?-mark and numbered-list features never fire on the
    jargon corpus, so exercise them on a synthetic frame THROUGH the
    registered plan (write a tiny documents table and run the query
    against it), plus live-corpus sanity."""
    import os

    from kafka_stream_spark.plans.round10g import (
        _IM_MIN_SCORE,
        q_instruction_mining,
    )

    rows = q_instruction_mining(spark, sf_dir).collect()
    assert rows and any(r["n_instruction_like"] > 0 for r in rows)
    for r in rows:
        assert 0 <= r["n_instruction_like"] <= r["n_docs"]
        assert 0.0 <= r["share"] <= 1.0

    tmp = "/tmp/im_synth"
    docs = spark.createDataFrame(
        [
            (1, "explain the join plan? 1. scan 2. filter", "en", "s", 8),
            (2, "the quick brown fox", "en", "s", 4),
            (3, "write a summary", "en", "s", 3),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    got = {r["source"]: r for r in q_instruction_mining(spark, tmp).collect()}
    r = got["s"]
    # doc1: starts_imp(3) + has_q(2) + numbered(2) + density -> >= 7
    # doc2: 0; doc3: starts_imp(3) + density
    assert r["n_docs"] == 3
    assert r["n_instruction_like"] == 2


def test_heldout_novelty_rates_bounded_and_recounted(spark, sf_dir):
    """Rates in [0,1]; independent Python recount for one language."""
    from kafka_stream_spark.plans.round10g import q_heldout_novelty

    rows = q_heldout_novelty(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["oov_rate"] <= 1.0
        assert 0.0 <= r["novel_bigram_rate"] <= 1.0

    from kafka_stream_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents").collect()
    lang = sorted({d["lang"] for d in docs})[0]
    tr_u, tr_b = set(), set()
    te_u, te_b = {}, {}
    for d in docs:
        if d["lang"] != lang:
            continue
        t = [x for x in d["text"].split(" ") if x]
        if d["doc_id"] % 5 != 0:
            tr_u.update(t)
            tr_b.update(zip(t, t[1:]))
        else:
            for x in t:
                te_u[x] = te_u.get(x, 0) + 1
            for p in zip(t, t[1:]):
                te_b[p] = te_b.get(p, 0) + 1
    n_uni = sum(te_u.values())
    oov = sum(c for k, c in te_u.items() if k not in tr_u)
    n_bi = sum(te_b.values())
    nov = sum(c for k, c in te_b.items() if k not in tr_b)
    got = {r["lang"]: r for r in rows}[lang]
    assert got["n_test_tokens"] == n_uni
    assert got["n_test_bigrams"] == n_bi
    hu = lambda a, b: (2 * a + b) // (2 * b)  # noqa: E731
    assert abs(got["oov_rate"] - hu(1000000 * oov, n_uni) / 1e6) < 1e-9
    assert (
        abs(got["novel_bigram_rate"] - hu(1000000 * nov, n_bi) / 1e6) < 1e-9
    )
