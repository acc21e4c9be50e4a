"""Board pipeline: enrichment semantics, board parameterization (§2.12),
stale-carry-over fix (§1.4), dedup determinism."""

from __future__ import annotations



from kafka_stream_spark.plans.pipeline import ASHARE, NEEQ, enrich


def _docs(spark, rows):
    return spark.createDataFrame(rows, schema=["doc_id", "title", "source", "lang"])


def test_enrich_classifies_and_decodes(spark):
    d = _docs(spark, [(1, "the spark pipeline is fast", "src0", "zh")])
    out = enrich(d, spark, NEEQ).collect()
    assert len(out) == 1
    row = out[0]
    assert row["rule_id"] == 1 and row["category_name"] == "性能"
    assert row["emo_label"] == "正向" and row["imp_label"] == "高"
    assert row["site_name"] == "站点0"
    assert row["src_type"] == "新三板公告"
    assert len(row["yqid"]) == 32 and len(row["only_id"]) == 32


def test_enrich_unknown_source_yields_empty_not_stale(spark):
    # reference carried the previous record's companyName on a miss
    # (kafka_s.py:144-148); the engine yields '' deterministically
    d = _docs(spark, [(1, "the spark pipeline is fast", "unknown_src", "zh")])
    row = enrich(d, spark, NEEQ).collect()[0]
    assert row["site_name"] == ""


def test_enrich_veto_rule(spark):
    d = _docs(spark, [(1, "spark is fast but slow", "src0", "zh")])
    out = enrich(d, spark, NEEQ).collect()
    assert all(r["rule_id"] != 1 for r in out)  # rule 1 vetoed by 'slow'
    assert any(r["rule_id"] == 3 for r in out)  # rule 3 matches on 'slow'


def test_board_config_delta(spark):
    # kafka_s vs kafka_a differ only in literals (SURVEY.md §2.12)
    d = _docs(spark, [(1, "the spark pipeline is fast", "src0", "zh")])
    neeq = enrich(d, spark, NEEQ).collect()[0]
    ashare = enrich(d, spark, ASHARE).collect()[0]
    assert neeq["src_type"] == "新三板公告" and ashare["src_type"] == "A股公告"
    assert neeq["yqid"] == ashare["yqid"]  # keys are board-independent


def test_multi_rule_fanout_rows(spark):
    d = _docs(spark, [(7, "the spark fast stream window table scan filter", "src1", "en")])
    out = enrich(d, spark, NEEQ).collect()
    assert {r["rule_id"] for r in out} == {1, 2}
    assert len(out) == 2  # one row per matching rule


def test_entry_contract(spark):
    import __spark_entry__ as m

    df = m.entry(spark)
    assert df.count() > 0
    qs, oracles = m.queries(), m.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 40
