"""Round-11 batch-L operator invariants: interval join decomposition,
positional phrase retrieval, SimRank, label spreading, sequence mining."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_stream_spark.plans.round11l import (
    _BURST_TOPK,
    _PHRASE_TOPK,
    _SEQ_MINSUP_PCT,
    q_interval_join,
    q_label_spreading,
    q_phrase_search,
    q_seq_patterns,
    q_simrank,
)
from kafka_stream_spark.sources.tables import load


def test_interval_join_windows_bounded_and_exclude_self(spark, sf_dir):
    """Windows are top-K by construction: per burst stream at most
    _BURST_TOPK islands, each spanning ≤ 3·_BURST_TOPK days; joined
    events never carry the burst stream's own type."""
    rows = q_interval_join(spark, sf_dir).collect()
    assert rows, "gate instance must be non-vacuous"
    per_type: dict[str, set[tuple[int, int]]] = {}
    for r in rows:
        assert r["other_type"] != r["burst_type"]
        assert 0 < r["n_users"] <= r["n_events"]
        assert r["d1"] - r["d0"] + 1 <= 3 * _BURST_TOPK
        per_type.setdefault(r["burst_type"], set()).add((r["d0"], r["d1"]))
    for wins in per_type.values():
        assert len(wins) <= _BURST_TOPK
        # islands are maximal: merged windows never touch or overlap
        spans = sorted(wins)
        for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
            assert b0 > a1 + 1


def test_phrase_search_counts_match_direct_recount(spark, sf_dir):
    """The index-join answer for the top phrase equals a direct
    array-lag recount over the corpus (two independent plans)."""
    rows = q_phrase_search(spark, sf_dir).collect()
    assert len(rows) == _PHRASE_TOPK
    top = rows[0]
    assert top["occurrences"] >= top["doc_freq"] >= 1
    from kafka_stream_spark.functions import text as textfn

    d = load(spark, sf_dir, "documents").select(
        "doc_id", textfn.tokens(F.lower(F.col("text"))).alias("t")
    )
    direct = (
        d.select(
            "doc_id",
            F.expr(
                "size(filter(transform(t, (x, i) -> i < size(t) - 1 AND"
                f" x = '{top['t1']}' AND t[i+1] = '{top['t2']}'),"
                " b -> b))"
            ).alias("occ"),
        )
        .agg(
            F.sum("occ").alias("occ"),
            F.sum((F.col("occ") > 0).cast("long")).alias("df"),
        )
        .collect()[0]
    )
    assert direct["occ"] == top["occurrences"]
    assert direct["df"] == top["doc_freq"]


def test_simrank_scores_within_decay_bound(spark, sf_dir):
    """SimRank scores are bounded by the decay: every pair similarity
    sits in [0, C] with C = 0.8, and pairs are canonical a < b."""
    rows = q_simrank(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["brand_a"] < r["brand_b"]
        assert 0.0 <= r["sim"] <= 0.8 + 1e-9


def test_label_spreading_covers_only_nonseeds(spark, sf_dir):
    """Confusion-matrix mass ≤ non-seed customer count; labels are
    real market segments."""
    rows = q_label_spreading(spark, sf_dir).collect()
    assert rows
    cust = load(spark, sf_dir, "customer")
    segs = {
        r["c_mktsegment"]
        for r in cust.select("c_mktsegment").distinct().collect()
    }
    n_nonseed = cust.filter(F.col("c_custkey") % 10 != 0).count()
    total = 0
    for r in rows:
        assert r["true_seg"] in segs and r["pred_seg"] in segs
        total += r["n"]
    assert 0 < total <= n_nonseed


def test_seq_patterns_downward_closure(spark, sf_dir):
    """Every reported triple's support respects the subsequence
    anti-monotone property vs an independently computed pair support:
    sup(a→b→c) ≤ sup(a→b) and ≤ sup(b→c)."""
    from kafka_stream_spark.plans.round11l import _SEQ_WINDOW

    rows = q_seq_patterns(spark, sf_dir).collect()
    assert rows, "gate instance must be non-vacuous"
    ev = load(spark, sf_dir, "events")
    pos = (
        ev.select(
            "user_id",
            "event_type",
            F.row_number()
            .over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("user_id")
                .orderBy("ts", "event_id")
            )
            .alias("pos"),
        )
        .filter(F.col("pos") <= _SEQ_WINDOW)
        .collect()
    )
    n_users = len({r["user_id"] for r in pos})
    seqs: dict[int, list[str]] = {}
    for r in sorted(pos, key=lambda r: (r["user_id"], r["pos"])):
        seqs.setdefault(r["user_id"], []).append(r["event_type"])

    def pair_sup(a: str, b: str) -> int:
        n = 0
        for s in seqs.values():
            if a in s and b in s[s.index(a) + 1 :]:
                n += 1
        return n

    for r in rows:
        assert r["support"] * 100 >= _SEQ_MINSUP_PCT * n_users
        assert r["support"] <= pair_sup(r["a"], r["b"])
        assert r["support"] <= pair_sup(r["b"], r["c"])
