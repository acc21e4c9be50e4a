"""applyInPandasWithState: per-key state across micro-batches + restarts."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_stream_spark.operators.stateful import running_user_stats


def _run(spark, inp, out, ckpt):
    ev = spark.readStream.schema("user_id long, value double").parquet(inp)
    q = (
        running_user_stats(ev)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_state_accumulates_across_restarts(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(
        [(1, 10.0), (1, 5.0), (2, 1.0)], ["user_id", "value"]
    ).write.mode("append").parquet(inp)
    _run(spark, inp, out, ckpt)

    # second batch arrives after a full stop/start: state must carry over
    spark.createDataFrame([(1, 2.0), (3, 7.0)], ["user_id", "value"]).write.mode(
        "append"
    ).parquet(inp)
    _run(spark, inp, out, ckpt)

    latest = (
        spark.read.parquet(out)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n"),
            F.max("sum_value").alias("s"),
            F.max("n_batches").alias("b"),
        )
        .collect()
    )
    got = {r["user_id"]: (r["n"], r["s"], r["b"]) for r in latest}
    assert got[1] == (3, 17.0, 2)  # 2 events batch1 + 1 event batch2
    assert got[2] == (1, 1.0, 1)
    assert got[3] == (1, 7.0, 1)
