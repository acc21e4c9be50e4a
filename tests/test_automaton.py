"""X805 — Aho-Corasick automaton: classic-paper semantics pinned."""

from __future__ import annotations

from kafka_stream_spark.operators.automaton import (
    build_automaton,
    multi_pattern_counts,
    scan_counts,
)


def counts(text: str, pats: list[str]) -> dict[str, int]:
    a = build_automaton(pats)
    return {pats[i]: n for i, n in scan_counts(text, a).items()}


def test_overlapping_same_pattern():
    assert counts("aaaa", ["aa"]) == {"aa": 3}


def test_nested_and_suffix_output_links():
    # "he"/"she"/"his"/"hers" — the worked example of Aho & Corasick
    # 1975; "ushers" contains she, he, hers (he via she's suffix link)
    got = counts("ushers", ["he", "she", "his", "hers"])
    assert got == {"she": 1, "he": 1, "hers": 1}


def test_shared_prefix_and_nesting():
    got = counts("value table value", ["value", "value table", "table"])
    assert got == {"value": 2, "value table": 1, "table": 1}


def test_no_match_and_empty_text():
    assert counts("", ["x"]) == {}
    assert counts("abc", ["zz"]) == {}


def test_fail_link_mid_pattern():
    # after matching "abab", failing on 'd' must fall back to the "ab"
    # state, then still find "abd"? — classic partial-overlap walk
    assert counts("ababd", ["abd"]) == {"abd": 1}
    assert counts("ababab", ["abab"]) == {"abab": 2}


def test_distributed_scan(spark):
    df = spark.createDataFrame(
        [(1, "spark value table"), (2, "no match here"), (3, "value value")],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_id"], r["pattern"]): r["n_occ"]
        for r in multi_pattern_counts(df, ["value", "value table"]).collect()
    }
    assert rows == {
        (1, "value"): 1,
        (1, "value table"): 1,
        (3, "value"): 2,
    }
