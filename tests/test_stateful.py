"""applyInPandasWithState: per-key state across micro-batches + restarts."""

from __future__ import annotations

import pytest
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


def test_event_time_timeout_closes_and_evicts_idle_keys(spark, tmp_path):
    """A key idle past 30 min of EVENT time is closed when the watermark
    passes: terminal closed=1 row emitted, state evicted (a fresh event
    afterwards restarts the count from zero). Deterministic — driven by
    event timestamps, not sleeps."""
    import datetime as dt

    from kafka_stream_spark.operators.stateful import expiring_user_sessions

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    t0 = dt.datetime(2024, 1, 1)

    def t(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    def run():
        ev = spark.readStream.schema(schema).parquet(inp)
        q = (
            expiring_user_sessions(ev)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)

    spark.createDataFrame(
        [(1, t(0), 7, "click", 2.0), (2, t(5), 7, "click", 3.0)], schema
    ).write.mode("append").parquet(inp)
    run()

    # user 8 events at +60min push the watermark (10 min lag) to +50min,
    # past user 7 last-event+30min=+35min -> user 7 times out
    spark.createDataFrame([(3, t(60), 8, "view", 1.0)], schema).write.mode(
        "append"
    ).parquet(inp)
    run()

    rows = spark.read.parquet(out).collect()
    closed7 = [r for r in rows if r["user_id"] == 7 and r["closed"] == 1]
    assert len(closed7) == 1
    assert closed7[0]["n_events"] == 2 and closed7[0]["sum_value"] == 5.0

    # eviction: user 7 reappears -> counts restart from zero
    spark.createDataFrame([(4, t(70), 7, "click", 10.0)], schema).write.mode(
        "append"
    ).parquet(inp)
    run()
    latest7 = [
        r for r in spark.read.parquet(out).collect()
        if r["user_id"] == 7 and r["closed"] == 0
    ]
    assert {(r["n_events"], r["sum_value"]) for r in latest7} >= {(1, 10.0), (2, 5.0)}


def test_transform_with_state_running_stats(spark, tmp_path):
    """Spark 4's transformWithStateInPandas (StatefulProcessor +
    ValueState): running per-user stats equal the batch aggregate.
    The API's driver worker needs google.protobuf, absent in this
    container — the test gates on it and documents the modern-API twin
    of running_user_stats (applyInPandasWithState), which IS exercised
    above."""
    pytest.importorskip("google.protobuf.descriptor")
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle):
            self._st = handle.getValueState("st", "n BIGINT, total DOUBLE")

        def handleInputRows(self, key, rows, timer_values):
            n, total = (
                self._st.get() if self._st.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._st.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n": [n], "total": [total]}
            )

        def close(self):
            pass

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    src, ck, out = (
        str(tmp_path / "in"), str(tmp_path / "ck"), str(tmp_path / "out")
    )
    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(30)],
        "event_id long, user_id long, value double",
    )
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "event_id long, user_id long, value double"
    ).parquet(src)
    res = stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningStats(),
        outputStructType="user_id long, n long, total double",
        outputMode="Update",
        timeMode="None",
    )
    q = (
        res.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {
        (r["user_id"], r["n"], r["total"])
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        (r["user_id"], r["n"], r["total"])
        for r in df.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert got == batch
