"""Incrementally-maintained SCD2 dimension store: equality with the
batch computation and bucket-level incrementality (untouched partitions
are not rewritten)."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_stream_spark.streaming.pipeline import run_scd2_stream

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"
T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _t(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def _batch_scd2(spark, inp):
    ev = spark.read.parquet(inp)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_type",
        F.col("value").alias("version_value"),
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
    )


def test_scd2_store_equals_batch_and_skips_untouched_buckets(spark, tmp_path):
    inp = str(tmp_path / "in")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    rows1 = [
        (1, _t(0), 1, "profile", 10.0),
        (2, _t(5), 1, "profile", 11.0),
        (3, _t(0), 2, "profile", 20.0),
        (4, _t(0), 3, "settings", 30.0),
    ]
    spark.createDataFrame(rows1, SCHEMA).write.mode("append").parquet(inp)
    assert run_scd2_stream(spark, inp, store, ckpt).awaitTermination(120)

    # untouched-bucket witness: user 2 lives in bucket=2
    b2 = os.path.join(store, "bucket=2")
    mtime_before = max(
        os.path.getmtime(os.path.join(b2, f)) for f in os.listdir(b2)
    )

    # round 2 touches users 1 and 3 only (buckets 1 and 3)
    rows2 = [
        (5, _t(10), 1, "profile", 12.0),
        (6, _t(7), 3, "settings", 31.0),
    ]
    spark.createDataFrame(rows2, SCHEMA).write.mode("append").parquet(inp)
    assert run_scd2_stream(spark, inp, store, ckpt).awaitTermination(120)

    got = {
        (r["user_id"], r["event_type"], r["version_value"]): (
            r["valid_from"],
            r["valid_to"],
            r["is_current"],
        )
        for r in spark.read.parquet(store).drop("bucket").collect()
    }
    want = {
        (r["user_id"], r["event_type"], r["version_value"]): (
            r["valid_from"],
            r["valid_to"],
            r["is_current"],
        )
        for r in _batch_scd2(spark, inp).collect()
    }
    assert got == want
    # user 1 has three chained versions; the middle one closed correctly
    assert got[(1, "profile", 11.0)] == (_t(5), _t(10), 0)

    mtime_after = max(
        os.path.getmtime(os.path.join(b2, f)) for f in os.listdir(b2)
    )
    assert mtime_after == mtime_before, "untouched bucket was rewritten"


def test_scd2_store_absorbs_duplicate_redelivery(spark, tmp_path):
    """A duplicate (user_id, event_type, ts, value) event arriving in a
    LATER micro-batch (or a foreachBatch replay) must not insert a second
    identical version row — the prior-union-batch dedup guarantees no
    duplicate or zero-length [valid_from, valid_to) intervals."""
    inp = str(tmp_path / "in")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    rows1 = [
        (1, _t(0), 1, "profile", 10.0),
        (2, _t(5), 1, "profile", 11.0),
    ]
    spark.createDataFrame(rows1, SCHEMA).write.mode("append").parquet(inp)
    assert run_scd2_stream(spark, inp, store, ckpt).awaitTermination(120)

    # redeliver the SAME logical events (new event_ids — the version key
    # is (user, type, ts, value)) plus one genuinely new version
    rows2 = [
        (3, _t(0), 1, "profile", 10.0),   # duplicate of event 1
        (4, _t(5), 1, "profile", 11.0),   # duplicate of event 2
        (5, _t(9), 1, "profile", 12.0),   # new version
    ]
    spark.createDataFrame(rows2, SCHEMA).write.mode("append").parquet(inp)
    assert run_scd2_stream(spark, inp, store, ckpt).awaitTermination(120)

    rows = spark.read.parquet(store).drop("bucket").collect()
    assert len(rows) == 3  # no duplicate version rows
    by_from = {r["valid_from"]: r for r in rows}
    # intervals chain without zero-length segments
    assert by_from[_t(0)]["valid_to"] == _t(5)
    assert by_from[_t(5)]["valid_to"] == _t(9)
    assert by_from[_t(9)]["valid_to"] is None
    assert by_from[_t(9)]["is_current"] == 1
