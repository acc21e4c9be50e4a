"""Driver-contract invariants: registry shape, naming, oracle pairing."""

from __future__ import annotations

import re


def test_registry_contract():
    import __spark_entry__ as m

    qs, oracles = m.queries(), m.oracle_sql()
    assert len(qs) >= 80
    # every oracle has an implementation; keys are well-formed
    assert set(oracles) <= set(qs)
    for name in qs:
        assert re.fullmatch(r"q_[a-z0-9_]+", name), name
    # rows-only set is small and intentional
    rows_only = set(qs) - set(oracles)
    assert rows_only == {
        "q_current_ts",       # wall-clock nondeterministic
        "q_approx_distinct",  # HLL estimate is engine-specific
        "q_approx_percentile",  # GK-sketch ranks are engine-specific
        "q_hll_merge",        # DataSketches HLL has no DuckDB twin
        "q_compression_ratio",  # zlib has no SQL analog (pytest-pinned)
    }, rows_only
    # q_uuid3_key is NOT rows-only despite DuckDB's VARCHAR-only md5:
    # its oracle compiles MD5 itself to SQL (functions/md5_sql)


def test_oracles_reference_known_tables_only():
    import __spark_entry__ as m
    from kafka_stream_spark.sources.tables import TABLES

    # oracle SQL may only read the driver's pre-registered views (plus
    # inline VALUES); a stray table name would fail only at driver time
    pat = re.compile(r"\bFROM\s+([a-z_][a-z0-9_]*)\b", re.IGNORECASE)
    known = set(TABLES)
    for name, sql in m.oracle_sql().items():
        # strip -- comments: a comment between the comma and a CTE name
        # would otherwise hide the declaration from the regexes below
        sql = re.sub(r"--[^\n]*", "", sql)
        # collect CTE names declared in this oracle
        ctes = set(re.findall(r"(?:WITH|,)\s*(?:RECURSIVE\s+)?([a-z_][a-z0-9_]*)\s+AS\s*(?:MATERIALIZED\s*)?\(", sql, re.IGNORECASE))
        ctes |= set(re.findall(r"\)\s*,\s*([a-z_][a-z0-9_]*)\s+AS\s*(?:MATERIALIZED\s*)?\(", sql, re.IGNORECASE))
        ctes |= set(re.findall(r"([a-z_][a-z0-9_]*)\s*\(\s*[a-z0-9_, ]*\)\s+AS\s*\(", sql, re.IGNORECASE))
        for tbl in pat.findall(sql):
            assert tbl.lower() in known or tbl.lower() in {c.lower() for c in ctes} or tbl.lower() in {
                "keyed", "matched", "enriched", "scored", "cand", "pairs",
                "chunks", "kept", "coded", "stats", "dims", "active", "marked",
                "numbered", "h", "s", "b", "t", "m", "u", "w", "v", "c", "p",
                "tf", "df", "n", "cdc", "labels", "edges", "reach", "cent",
                "assign_scored", "assigned", "probes", "tf_counts",
                # DuckDB table functions (not table names)
                "range", "generate_series",
            }, (name, tbl)