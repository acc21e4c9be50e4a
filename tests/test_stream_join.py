"""Stream-stream join: correctness vs the batch join, cross-restart
state buffering, and window exclusion."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kafka_stream_spark.streaming.pipeline import run_stream_stream_join

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"
BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _rows(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_stream_stream_join_matches_batch_and_buffers_across_restart(
    spark, tmp_path
):
    clicks_dir = str(tmp_path / "clicks")
    purch_dir = str(tmp_path / "purch")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def t(minutes):
        return BASE + dt.timedelta(minutes=minutes)

    # round 1: clicks only — no purchases yet, join emits nothing but
    # MUST buffer the clicks in state
    clicks1 = [
        (1, t(0), 7, "click", 0.0),
        (2, t(10), 7, "click", 0.0),
        (3, t(0), 8, "click", 0.0),
    ]
    _rows(spark, clicks1).write.mode("append").parquet(clicks_dir)
    _rows(spark, []).write.mode("append").parquet(purch_dir)
    q = run_stream_stream_join(spark, clicks_dir, purch_dir, out, ckpt)
    assert q.awaitTermination(120)

    # round 2 (restart from checkpoint): purchases arrive — one inside
    # the 1h window of user 7's clicks, one 90min after user 8's click
    # (outside the window → excluded), one for a user with no clicks
    purch2 = [
        (100, t(30), 7, "purchase", 9.5),
        (101, t(90), 8, "purchase", 4.0),
        (102, t(30), 9, "purchase", 1.0),
    ]
    _rows(spark, purch2).write.mode("append").parquet(purch_dir)
    q = run_stream_stream_join(spark, clicks_dir, purch_dir, out, ckpt)
    assert q.awaitTermination(120)

    got = {
        (r["click_id"], r["purchase_id"])
        for r in spark.read.parquet(out).collect()
    }
    # user 7's purchase attributes to BOTH in-window clicks (1 and 2),
    # proving round-1 state survived the restart; 101/102 match nothing
    assert got == {(1, 100), (2, 100)}

    # differential: the streaming result equals the batch join
    c = spark.read.parquet(clicks_dir).filter(F.col("event_type") == "click")
    p = spark.read.parquet(purch_dir).filter(F.col("event_type") == "purchase")
    batch = (
        p.alias("p")
        .join(
            c.alias("c"),
            (F.col("p.user_id") == F.col("c.user_id"))
            & (F.col("p.ts") >= F.col("c.ts"))
            & (F.col("p.ts") <= F.col("c.ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select(F.col("c.event_id").alias("click_id"), F.col("p.event_id").alias("purchase_id"))
    )
    assert {(r["click_id"], r["purchase_id"]) for r in batch.collect()} == got


def test_drop_duplicates_within_watermark_bounded_state(spark, tmp_path):
    """The bounded-state streaming dedup: duplicates arriving within the
    watermark horizon are dropped across micro-batches, but state is
    evictable (unlike plain dropDuplicates, whose state grows forever —
    the 100 TB-stream failure mode)."""
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.schema(SCHEMA)
            .parquet(inp)
            .withWatermark("ts", "2 hours")
            .dropDuplicatesWithinWatermark(["event_id"])
        )
        return (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    t0 = BASE
    _rows(
        spark,
        [
            (1, t0, 7, "click", 1.0),
            (1, t0, 7, "click", 1.0),  # in-batch duplicate
            (2, t0, 8, "click", 2.0),
        ],
    ).write.mode("append").parquet(inp)
    assert run().awaitTermination(120)

    # next batch: same event_id again, still within the watermark window
    _rows(spark, [(1, t0, 7, "click", 1.0), (3, t0, 9, "click", 3.0)]).write.mode(
        "append"
    ).parquet(inp)
    assert run().awaitTermination(120)

    ids = sorted(r["event_id"] for r in spark.read.parquet(out).collect())
    assert ids == [1, 2, 3]


def test_stream_stream_left_outer_emits_nulls_after_watermark(spark, tmp_path):
    """Left-outer two-stream join: an unmatched purchase must emit with
    NULL click columns — but only after the watermark proves no match
    can still arrive. Run 1 buffers it silently; a far-future sentinel
    click in run 2 advances the watermark and flushes the null row."""
    clicks_dir = str(tmp_path / "clicks")
    purch_dir = str(tmp_path / "purch")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def t(minutes):
        return BASE + dt.timedelta(minutes=minutes)

    _rows(spark, [(1, t(0), 7, "click", 0.0)]).write.mode("append").parquet(
        clicks_dir
    )
    _rows(
        spark,
        [(100, t(30), 7, "purchase", 9.5), (101, t(30), 9, "purchase", 2.0)],
    ).write.mode("append").parquet(purch_dir)
    q = run_stream_stream_join(
        spark, clicks_dir, purch_dir, out, ckpt, join_type="left_outer"
    )
    assert q.awaitTermination(120)
    after_run1 = {
        (r["purchase_id"], r["click_id"])
        for r in spark.read.parquet(out).collect()
    }
    # the match emits immediately; the unmatched purchase must NOT have
    # produced its null row yet (its window is still open)
    assert after_run1 == {(100, 1)}

    # sentinels 10 days later on BOTH streams: the operator watermark is
    # the MIN across inputs, so each side must advance past every
    # round-1 window before eviction can flush the null row
    _rows(spark, [(2, t(14400), 999, "click", 0.0)]).write.mode(
        "append"
    ).parquet(clicks_dir)
    _rows(spark, [(102, t(14400), 998, "purchase", 0.0)]).write.mode(
        "append"
    ).parquet(purch_dir)
    q = run_stream_stream_join(
        spark, clicks_dir, purch_dir, out, ckpt, join_type="left_outer"
    )
    assert q.awaitTermination(120)

    got = {
        (r["purchase_id"], r["click_id"], r["user_id"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {(100, 1, 7), (101, None, 9)}
