"""Rule-parse and rule-match semantics (SURVEY.md §7.4 hard part #1):
``、``/``&`` parsing with the asymmetric strip, all-keywords-present
matching, veto rules, empty-filter safety, multi-rule fan-out."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_stream_spark.functions import rules


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_parse_in_rules_or_and(spark):
    v = _one(spark, rules.parse_in_rules(F.lit("a&b、c")))
    assert v == [["a", "b"], ["c"]]


def test_parse_strip_asymmetry(spark):
    # OR-groups are stripped; AND-parts are not (kafka_s.py:243-245)
    v = _one(spark, rules.parse_in_rules(F.lit(" a & b 、 c ")))
    assert v == [["a ", " b"], ["c"]]


def test_parse_filter_rules_drops_empties(spark):
    assert _one(spark, rules.parse_filter_rules(F.lit(""))) == []
    assert _one(spark, rules.parse_filter_rules(F.lit("x、、y"))) == ["x", "y"]


def _match(spark, title: str, in_rules: str, filter_rules: str = "") -> bool:
    return _one(
        spark,
        rules.rule_matches(F.lit(title), F.lit(in_rules), F.lit(filter_rules)),
    )


def test_match_all_and_keywords_required(spark):
    assert _match(spark, "spark is fast", "spark&fast")
    assert not _match(spark, "spark is slow", "spark&fast")


def test_match_any_or_group_suffices(spark):
    assert _match(spark, "only streams here", "spark&fast、streams")


def test_match_is_substring_not_word(spark):
    # reference uses `kw in title` substring semantics (kafka_s.py:264)
    assert _match(spark, "sparkle", "spark")


def test_veto_blocks_match(spark):
    assert not _match(spark, "spark is fast but slow", "spark&fast", "slow")
    assert _match(spark, "spark is fast", "spark&fast", "slow")


def test_empty_filter_rules_never_veto(spark):
    # contains(title, '') is true — empties must be dropped pre-check
    assert _match(spark, "spark is fast", "spark&fast", "")


def test_multi_rule_fanout(spark):
    # one title matching N rules → N rows (kafka_s.py:240-249)
    from kafka_stream_spark.sources import dims

    titles = spark.createDataFrame(
        [("the spark fast stream window",)], schema=["title"]
    )
    r = dims.rules_df(spark)
    cond = rules.rule_matches(
        titles["title"], r["in_rules"], r["filter_rules"]
    )
    matched = titles.join(F.broadcast(r), cond, "inner")
    got = {row["rule_id"] for row in matched.collect()}
    assert got == {1}  # rule 1 via both OR-groups still yields ONE row


def test_oracle_sql_twin_agrees(spark):
    import duckdb

    cases = [
        ("spark is fast", "spark&fast、stream", "slow"),
        ("spark is fast but slow", "spark&fast", "slow"),
        ("stream only", "spark&fast、stream", ""),
        ("nothing here", "spark&fast", ""),
        (" padded ", " pad 、x&y", ""),
    ]
    for title, inr, fr in cases:
        spark_v = _match(spark, title, inr, fr)
        sql = rules.duckdb_match_sql(f"'{title}'", f"'{inr}'", f"'{fr}'")
        duck_v = duckdb.sql(f"SELECT {sql}").fetchone()[0]
        assert spark_v == duck_v, (title, inr, fr)
