"""Scale-oriented operators: salted aggregation equivalence, bucketed
co-located joins (shuffle-free), broadcast-plan assertions."""

from __future__ import annotations

import io
import contextlib

from pyspark.sql import functions as F

from kafka_stream_spark.operators.skew import salted_agg
from kafka_stream_spark.sources.tables import load


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_salted_agg_equals_plain(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    salted = salted_agg(
        e,
        keys=["event_type"],
        aggs={"n": ("count", "value"), "mx": ("max", "value")},
    ).collect()
    plain = (
        e.groupBy("event_type")
        .agg(F.count("value").alias("n"), F.max("value").alias("mx"))
        .collect()
    )
    assert {(r["event_type"], r["n"], r["mx"]) for r in salted} == {
        (r["event_type"], r["n"], r["mx"]) for r in plain
    }


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """Bucketing both join sides on the key pre-partitions the data so the
    join runs shuffle-free — the 100 TB pattern for repeatedly-joined
    fact tables."""
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    load(spark, sf_dir, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).option("path", str(tmp_path / "b_orders")).saveAsTable("b_orders")
    load(spark, sf_dir, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).option("path", str(tmp_path / "b_lineitem")).saveAsTable("b_lineitem")

    # disable broadcast so the join strategy question is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = _plan(j)
        # bucketed sides must not re-shuffle for the join
        assert "Exchange hashpartitioning" not in plan, plan
        n = j.count()
        plain = load(spark, sf_dir, "orders").join(
            load(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        assert n == plain.count()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_partition_pruning(spark, sf_dir, tmp_path):
    """Hive-partitioned writes + partition pruning: a filter on the
    partition column must appear as PartitionFilters on the scan (only
    the matching directories are read — at 100 TB this is the difference
    between scanning one event type and all of them)."""
    path = str(tmp_path / "events_by_type")
    load(spark, sf_dir, "events").write.partitionBy("event_type").parquet(path)
    df = spark.read.parquet(path).filter(F.col("event_type") == "purchase")
    plan = _plan(df)
    assert "PartitionFilters: [" in plan
    assert "isnotnull(event_type" in plan or "event_type" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    n = df.count()
    expected = (
        load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase").count()
    )
    assert n == expected


def test_dim_joins_broadcast_not_sortmerge(spark, sf_dir):
    from kafka_stream_spark.plans import QUERIES

    for q in ["q_name_lookup_join", "q_industry_join", "q_board_pipeline"]:
        plan = _plan(QUERIES[q](spark, sf_dir))
        assert "SortMergeJoin" not in plan, q
        assert "Broadcast" in plan, q
