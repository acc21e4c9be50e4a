"""Semantics tests for the dataset-construction operators (datasetops).

Each test recomputes the expected answer independently in plain Python
over the sf0.001 parquet (via duckdb's reader) — no SQL reuse from the
oracle, so a shared misunderstanding can't hide in both sides.
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from kafka_stream_spark.plans.datasetops import BENCH_MOD, NGRAM, ZBITS
from kafka_stream_spark.plans import QUERIES


def _docs(sf_dir: str):
    return duckdb.sql(
        f"SELECT doc_id, text, source, n_chars FROM '{sf_dir}/documents.parquet'"
    ).fetchall()


def _gram_set(text: str) -> set[str]:
    w = text.split(" ")
    return {
        " ".join(w[i : i + NGRAM]) for i in range(len(w) - NGRAM + 1)
    }


def test_decontaminate_matches_python(spark, sf_dir):
    docs = _docs(sf_dir)
    bench_grams: set[str] = set()
    for doc_id, text, _, _ in docs:
        if doc_id % BENCH_MOD == 0:
            bench_grams |= _gram_set(text)
    expected: dict[str, list[int]] = {}
    for doc_id, text, source, _ in docs:
        if doc_id % BENCH_MOD == 0:
            continue
        n, c = expected.setdefault(source, [0, 0])
        expected[source][0] = n + 1
        if _gram_set(text) & bench_grams:
            expected[source][1] = c + 1
    got = {
        r["source"]: [r["n_docs"], r["n_contaminated"]]
        for r in QUERIES["q_decontaminate"](spark, sf_dir).collect()
    }
    assert got == expected
    # sanity: the synthetic corpus has near-dup twins, so some doc
    # outside the benchmark slice must overlap it
    assert sum(c for _, c in expected.values()) > 0


def test_dup_ngram_fraction_matches_python(spark, sf_dir):
    docs = _docs(sf_dir)
    gram_docs: dict[str, int] = {}
    per_doc = {}
    for doc_id, text, source, _ in docs:
        gs = _gram_set(text)
        per_doc[doc_id] = (source, gs)
        for g in gs:
            gram_docs[g] = gram_docs.get(g, 0) + 1
    by_source: dict[str, list] = {}
    for _, (source, gs) in per_doc.items():
        n_dup = sum(1 for g in gs if gram_docs[g] >= 2)
        by_source.setdefault(source, []).append((len(gs), n_dup))
    for r in QUERIES["q_dup_ngram_fraction"](spark, sf_dir).collect():
        rows = by_source[r["source"]]
        assert r["n_docs"] == len(rows)
        avg = sum(d / n for n, d in rows) / len(rows)
        assert r["avg_dup_frac"] == pytest.approx(avg, abs=1e-6)
        assert r["n_docs_half_dup"] == sum(1 for n, d in rows if 2 * d >= n)


def _portable_u(doc_id: int) -> int:
    h = hashlib.md5(str(doc_id).encode()).hexdigest()
    return int(h[:15], 16) % 10000


def _rate_bp(source: str) -> int:
    sid = int(source[3:])
    return 10000 if sid < 5 else 5000 if sid < 10 else 2500 if sid < 15 else 1000


def test_dataset_mix_matches_python(spark, sf_dir):
    expected: dict[str, list[int]] = {}
    for doc_id, _, source, n_chars in _docs(sf_dir):
        tot, kept, chars = expected.setdefault(source, [0, 0, 0])
        expected[source][0] = tot + 1
        if _portable_u(doc_id) < _rate_bp(source):
            expected[source][1] = kept + 1
            expected[source][2] = chars + n_chars
    got = {
        r["source"]: [r["n_total"], r["n_kept"], r["kept_chars"]]
        for r in QUERIES["q_dataset_mix"](spark, sf_dir).collect()
    }
    assert got == expected
    # the mix must actually stratify: a full-keep source retains all,
    # and at least one down-weighted source drops something
    full = [s for s in got if _rate_bp(s) == 10000]
    assert full and all(got[s][0] == got[s][1] for s in full)
    assert any(got[s][1] < got[s][0] for s in got if _rate_bp(s) < 10000)


def test_zorder_buckets_are_local(spark, sf_dir):
    rows = QUERIES["q_zorder_layout"](spark, sf_dir).collect()
    n_orders = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/orders.parquet'"
    ).fetchone()[0]
    assert sum(r["cnt"] for r in rows) == n_orders
    # every z-bucket's bounding box must be a proper sub-rectangle:
    # with 4 bits/dim and 16 buckets, each bucket spans at most half of
    # each dimension's quantized range — locality in BOTH dims, which a
    # single-column sort cannot give.
    gmin_c = min(r["min_cust"] for r in rows)
    gmax_c = max(r["max_cust"] for r in rows)
    gmin_d = min(r["min_day"] for r in rows)
    gmax_d = max(r["max_day"] for r in rows)
    for r in rows:
        c_span = (r["max_cust"] - r["min_cust"]) / max(gmax_c - gmin_c, 1)
        d_span = (r["max_day"] - r["min_day"]) / max(gmax_d - gmin_d, 1)
        assert c_span <= 0.55, (r["zbucket"], c_span)
        assert d_span <= 0.55, (r["zbucket"], d_span)
    assert len(rows) == 1 << ZBITS


def test_count_min_overcount_nonnegative_and_bounded(spark, sf_dir):
    """CMS invariants: estimate >= exact always (min of upper-biased
    counters), and overcount <= eN with e = e/w for the 4x1024 grid."""
    rows = QUERIES["q_count_min"](spark, sf_dir).collect()
    total = sum(r["exact_count"] for r in rows)
    import math

    bound = math.e / 1024 * total
    for r in rows:
        assert r["overcount"] >= 0, r
        assert r["cms_count"] == r["exact_count"] + r["overcount"]
        assert r["overcount"] <= max(bound, 1), r


def test_hll_estimate_within_tolerance(spark, sf_dir):
    """HLL with 256 registers has ~6.5% relative standard error; assert
    every per-type estimate lands within 4 sigma of exact."""
    for r in QUERIES["q_hll_portable"](spark, sf_dir).collect():
        rel = abs(r["hll_estimate"] - r["exact_distinct"]) / max(
            r["exact_distinct"], 1
        )
        assert rel <= 4 * 1.04 / (256 ** 0.5), (r, rel)


def test_triangle_count_invariants(spark, sf_dir):
    """Triangles <= wedges/3 by definition; clustering coefficient in
    [0, 1]; on a twin-family corpus the graph is clique-heavy (high
    coefficient)."""
    r = QUERIES["q_triangle_count"](spark, sf_dir).collect()[0]
    assert 3 * r["n_triangles"] <= r["n_wedges"]
    assert 0.0 <= r["clustering_coeff"] <= 1.0
    assert r["n_edges"] > 0 and r["n_triangles"] > 0
    assert r["clustering_coeff"] > 0.5
