"""Semantics pins for the mutation/reshape, timeseries, and prefix-join
operators (plans.mutate / plans.agg_ext / plans.timeseries /
plans.textscale)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kafka_stream_spark.plans.mutate import q_cdc_latest, q_merge_upsert
from kafka_stream_spark.plans.textscale import TAU, q_char_entropy, q_jaccard_prefix
from kafka_stream_spark.plans.timeseries import q_gap_fill


def test_merge_covers_all_three_actions(spark, sf_dir):
    """The merge source/target split must genuinely exercise update,
    insert AND keep branches, and the key stays unique after the merge."""
    out = q_merge_upsert(spark, sf_dir)
    actions = {
        r["merge_action"]: r["n"]
        for r in out.groupBy("merge_action").agg(F.count("*").alias("n")).collect()
    }
    assert set(actions) == {"update", "insert", "keep"}
    assert out.count() == out.select("c_custkey").distinct().count()


def test_cdc_latest_is_one_row_per_key_and_truly_latest(spark, sf_dir):
    out = q_cdc_latest(spark, sf_dir)
    keys = out.select("user_id", "event_type")
    assert keys.count() == keys.distinct().count()
    # the compacted ts per key equals the max ts per key in the raw log
    from kafka_stream_spark.sources.tables import load

    raw_max = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.max("ts").alias("max_ts"))
    )
    joined = out.join(raw_max, ["user_id", "event_type"])
    assert joined.filter(F.col("latest_ts") != F.col("max_ts")).count() == 0


def test_gap_fill_calendar_is_dense_and_locf_carries(spark, sf_dir):
    out = q_gap_fill(spark, sf_dir).cache()
    # dense: every event_type has the same number of hour buckets
    per_type = out.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    assert len({r["n"] for r in per_type}) == 1
    # LOCF: once a type has seen any value, filled_v is never NULL again
    w_ok = out.filter(
        (F.col("is_gap") == 1) & F.col("filled_v").isNull()
    )
    first_seen = (
        out.filter(F.col("is_gap") == 0)
        .groupBy("event_type")
        .agg(F.min("hr").alias("first_hr"))
    )
    bad = w_ok.join(first_seen, "event_type").filter(F.col("hr") > F.col("first_hr"))
    assert bad.count() == 0
    out.unpersist()


def test_prefix_join_equals_brute_force(spark, sf_dir):
    """Completeness of the prefix filter on real data: the candidate-
    pruned join returns EXACTLY the pairs the O(n²) scan finds."""
    from kafka_stream_spark.functions import text
    from kafka_stream_spark.sources.tables import load

    fast = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in q_jaccard_prefix(spark, sf_dir).collect()
    }
    sets = load(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(text.hashed_tokens_mod(F.col("text"))).alias("ts")
    )
    a = sets.select(F.col("doc_id").alias("doc_a"), F.col("ts").alias("ts_a"))
    b = sets.select(F.col("doc_id").alias("doc_b"), F.col("ts").alias("ts_b"))
    inter = F.size(F.array_intersect("ts_a", "ts_b"))
    jacc = inter * F.lit(1.0) / (F.size("ts_a") + F.size("ts_b") - inter)
    brute = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn("jaccard", F.round(jacc, 6))
        .filter(F.col("jaccard") >= TAU)
        .select("doc_a", "doc_b", "jaccard")
        .collect()
    }
    assert fast == brute and len(fast) > 0


def test_char_entropy_bounds(spark, sf_dir):
    """0 ≤ H ≤ log2(distinct chars), attained only at uniform/constant."""
    rows = q_char_entropy(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1e-9 <= r["entropy_bits"] <= math.log2(r["distinct_chars"]) + 1e-9


def test_dynamic_partition_overwrite_touches_only_written_partition(
    spark, sf_dir, tmp_path
):
    """partitionOverwriteMode=dynamic: an overwrite that produces rows
    for ONE partition replaces only that partition — the backfill
    pattern (rewrite one day/source) that at 100 TB must not clobber
    the other 99.9% of the table. Static mode (the default) would drop
    every partition first."""
    from pyspark.sql import functions as F

    from kafka_stream_spark.sources.tables import load

    tbl = str(tmp_path / "events_by_type")
    e = load(spark, sf_dir, "events").select("event_id", "value", "event_type")
    e.write.partitionBy("event_type").parquet(tbl)
    before = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(tbl).groupBy("event_type").agg(
            F.count("*").alias("n")
        ).collect()
    }
    mode_before = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        patch = (
            e.filter(F.col("event_type") == "error")
            .withColumn("value", F.lit(0.0))
            .limit(7)
        )
        patch.write.mode("overwrite").partitionBy("event_type").parquet(tbl)
    finally:
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", mode_before
        )
    after = spark.read.parquet(tbl)
    counts = {
        r["event_type"]: r["n"]
        for r in after.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    # the patched partition shrank to the patch; every other survived
    assert counts["error"] == 7
    for k, n in before.items():
        if k != "error":
            assert counts[k] == n, k
    assert after.filter(
        (F.col("event_type") == "error") & (F.col("value") != 0.0)
    ).count() == 0


def test_managed_table_ddl_insert_analyze(spark, sf_dir, tmp_path):
    """Catalog surface: CREATE TABLE ... USING parquet, INSERT INTO
    (append + column-list), ANALYZE TABLE feeding optimizer statistics,
    DROP TABLE. The reference's DDL lives in MySQL out-of-band; a
    drop-in engine owns its own catalog."""
    from kafka_stream_spark.sources.tables import load

    spark.sql("DROP TABLE IF EXISTS boards_managed")
    spark.sql(
        "CREATE TABLE boards_managed (code STRING, title STRING, score INT) "
        f"USING parquet LOCATION '{tmp_path}/boards_managed'"
    )
    try:
        spark.sql(
            "INSERT INTO boards_managed VALUES "
            "('830001', 'alpha', 2), ('830002', 'beta', 5)"
        )
        spark.sql(
            "INSERT INTO boards_managed (code, title, score) "
            "SELECT source, substr(text, 1, 16), CAST(n_chars % 10 AS INT) "
            f"FROM parquet.`{sf_dir}/documents.parquet` WHERE doc_id < 8"
        )
        n = spark.table("boards_managed").count()
        exp = 2 + load(spark, sf_dir, "documents").filter("doc_id < 8").count()
        assert n == exp

        spark.sql("ANALYZE TABLE boards_managed COMPUTE STATISTICS")
        stats = spark.sql("DESCRIBE EXTENDED boards_managed").collect()
        stat_row = [r for r in stats if r["col_name"] == "Statistics"]
        assert stat_row and "rows" in stat_row[0]["data_type"]
    finally:
        spark.sql("DROP TABLE IF EXISTS boards_managed")
