"""Streaming metrics listener: progress-based record counting (A3)."""

from __future__ import annotations

from kafka_stream_spark.streaming.metrics import RecordCounter


def test_record_counter_counts_stream_rows(spark, tmp_path):
    counter = RecordCounter()
    spark.streams.addListener(counter)
    try:
        inp = str(tmp_path / "in")
        spark.createDataFrame(
            [(i, float(i)) for i in range(57)], ["user_id", "value"]
        ).write.parquet(inp)
        q = (
            spark.readStream.schema("user_id long, value double")
            .parquet(inp)
            .groupBy("user_id")
            .count()
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        # listener events are dispatched asynchronously on the listener-bus
        # thread — poll briefly rather than asserting immediately
        import time

        deadline = time.time() + 30
        while counter.total_rows() < 57 and time.time() < deadline:
            time.sleep(0.5)
        assert counter.total_rows() == 57
        assert sum(counter.batches.values()) >= 1
    finally:
        spark.streams.removeListener(counter)
