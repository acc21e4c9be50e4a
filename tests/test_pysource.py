"""Custom Python DataSource connector (sources/pysource): parallel batch
read, filter pushdown into the source, and the micro-batch stream twin
replaying the same relation."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_stream_spark.sources.pysource import _row, register


def test_batch_read_matches_python_and_parallelizes(spark):
    register(spark)
    df = (
        spark.read.format("cdcgen")
        .option("rows", "500")
        .option("partitions", "8")
        .load()
    )
    assert df.rdd.getNumPartitions() == 8
    got = sorted(tuple(r) for r in df.collect())
    assert got == sorted(_row(i) for i in range(500))


def test_filter_pushdown_into_python_source(spark):
    register(spark)
    df = (
        spark.read.format("cdcgen")
        .option("rows", "500")
        .load()
        .filter(F.col("op") == "i")
    )
    expected = [list(_row(i)) for i in range(500) if _row(i)[1] == "i"]
    assert len(expected) < 500  # the predicate is selective
    assert sorted(map(tuple, expected)) == sorted(tuple(r) for r in df.collect())
    # non-op predicates stay with Spark and still apply
    df2 = (
        spark.read.format("cdcgen")
        .option("rows", "500")
        .load()
        .filter((F.col("op") == "i") & (F.col("seq") >= 250))
    )
    assert sorted(tuple(r) for r in df2.collect()) == sorted(
        tuple(r) for r in expected if r[0] >= 250
    )


def test_in_filter_pushdown_into_python_source(spark):
    register(spark)
    df = (
        spark.read.format("cdcgen")
        .option("rows", "500")
        .load()
        .filter(F.col("op").isin("i", "u"))
    )
    expected = sorted(
        tuple(_row(i)) for i in range(500) if _row(i)[1] in ("i", "u")
    )
    assert len(expected) < 500
    assert expected == sorted(tuple(r) for r in df.collect())
    # conjunction of two op predicates: both must apply (intersection)
    df2 = (
        spark.read.format("cdcgen")
        .option("rows", "500")
        .load()
        .filter(F.col("op").isin("i", "u") & (F.col("op") == "u"))
    )
    expected2 = sorted(tuple(_row(i)) for i in range(500) if _row(i)[1] == "u")
    assert expected2 == sorted(tuple(r) for r in df2.collect())


def test_stream_reader_replays_full_relation(spark, tmp_path):
    register(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("cdcgen")
        .option("rows", "300")
        .option("batch_size", "75")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    # SimpleDataSourceStreamReader has no end-of-data signal (a live feed
    # never ends) — poll the sink until the full relation has landed
    import time

    deadline = time.time() + 360
    while time.time() < deadline:
        try:
            if spark.read.parquet(out).count() >= 300:
                break
        except Exception:
            pass  # sink dir not created yet
        time.sleep(1)
    q.stop()
    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert got == sorted(_row(i) for i in range(300))


def test_cdcgen_pipeline_exactly_once_through_midbatch_crash(spark, tmp_path):
    """The composed reference-replacement story in one witness
    (round-7 verdict #6): custom stream source → enrich/dedup →
    idempotent batch-partitioned sink + versioned merged store, with
    a crash injected MID-BATCH (after the sink write, before the
    store commit) and the query resumed from its checkpoint. Source
    offsets replay the killed batch (readBetweenOffsets), the sink
    overwrite replaces the partial attempt, the store folds exactly
    once — final sink and store must equal the batch-mode computation
    over the same source, with zero duplicates."""
    import time

    from pyspark.sql import functions as F

    from kafka_stream_spark.streaming.pipeline import (
        cdcgen_enrich,
        merged_store_read,
        run_cdcgen_pipeline,
    )

    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    flag = str(tmp_path / "crash_at")
    with open(flag, "w") as fh:
        fh.write("1")  # kill the SECOND micro-batch mid-flight

    ROWS, BATCH = 400, 100
    q = run_cdcgen_pipeline(
        spark, out, state, ckpt, rows=ROWS, batch_size=BATCH, fail_flag=flag
    )
    # poll for the injected failure instead of one fixed await: under
    # full-machine contention (concurrent probes) micro-batches can
    # take minutes to schedule — the condition, not the clock, is the
    # contract being tested
    deadline = time.time() + 600
    while time.time() < deadline and q.exception() is None:
        try:
            q.awaitTermination(5)
        except Exception:
            break  # the crash surfaces as StreamingQueryException
    assert q.exception() is not None, "injected crash never fired"

    # mid-batch partial state is REAL: batch 1's sink partition landed,
    # but the store's latest committed version is still batch 0
    import os

    assert os.path.isdir(os.path.join(out, "batch_id=1"))
    from kafka_stream_spark.streaming.pipeline import (
        merged_store_last_applied,
    )

    assert merged_store_last_applied(state) == 0, (
        "store must still be at batch 0: the crash fired after the "
        "sink write but before batch 1's store commit"
    )

    # resume from the same checkpoint (flag already consumed)
    q2 = run_cdcgen_pipeline(
        spark, out, state, ckpt, rows=ROWS, batch_size=BATCH
    )
    expected = cdcgen_enrich(
        spark.read.format("cdcgen").option("rows", str(ROWS)).load()
    )
    n_expected = expected.count()
    last_batch = ROWS // BATCH - 1
    # wait for BOTH the sink AND the store's commit of the last batch:
    # polling the sink alone can stop the query inside the very
    # sink-written/store-uncommitted window this test exists to prove
    # survivable — stopping there is a crash the NEXT run would heal,
    # but here nothing restarts it
    deadline = time.time() + 600
    while time.time() < deadline:
        try:
            if (
                spark.read.parquet(out).count() >= n_expected
                and merged_store_last_applied(state) >= last_batch
            ):
                break
        except Exception:
            pass
        time.sleep(1)
    q2.stop()

    got = spark.read.parquet(out).drop("batch_id")
    assert got.count() == n_expected, "duplicate or missing sink rows"
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, expected.collect())
    )

    want_store = {
        (r["st_code"], r["n"], r["words"])
        for r in expected.groupBy("st_code")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("n_words").cast("long").alias("words"),
        )
        .collect()
    }
    got_store = {
        (r["st_code"], r["n"], r["words"])
        for r in merged_store_read(spark, state).collect()
    }
    assert got_store == want_store
