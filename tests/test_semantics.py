"""Edge-semantics pins on crafted data: AS-OF tie-breaking, range-join
boundary inclusivity, chunk formula, multimodal fallback."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _events(spark, rows):
    return spark.createDataFrame(
        rows, schema="event_id long, user_id long, ts timestamp, event_type string, value double"
    )


def test_asof_equal_ts_view_counts(spark, monkeypatch, tmp_path):
    """A view at exactly the purchase timestamp is 'as of' it (<=)."""
    from kafka_stream_spark.plans.joins_ext import q_asof_join
    import kafka_stream_spark.plans.joins_ext as jx

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    df = _events(
        spark,
        [
            (1, 7, t, "view", 5.0),
            (2, 7, t, "purchase", 9.0),  # same instant as the view
            (3, 7, t - dt.timedelta(hours=1), "view", 3.0),
            (4, 8, t, "purchase", 1.0),  # user with no views → NULLs
        ],
    )
    monkeypatch.setattr(jx, "load", lambda s, d, n: df)
    out = {r["event_id"]: r for r in q_asof_join(spark, "ignored").collect()}
    assert out[2]["last_view_ts"] == t and out[2]["last_view_value"] == 5.0
    assert out[4]["last_view_ts"] is None and out[4]["last_view_value"] is None


def test_range_join_boundaries(spark, monkeypatch):
    """Interval semantics are [start, end): start included, end excluded."""
    import kafka_stream_spark.plans.joins_ext as jx

    start = dt.datetime(2024, 1, 2, 0, 0, 0)
    end = dt.datetime(2024, 1, 3, 12, 0, 0)  # range 1 in RANGE_ROWS
    df = _events(
        spark,
        [
            (1, 1, start, "click", 1.0),  # == start → in
            (2, 1, end, "click", 1.0),  # == end → out
            (3, 1, end - dt.timedelta(microseconds=1), "click", 1.0),  # in
            (4, 1, start - dt.timedelta(microseconds=1), "click", 1.0),  # out
        ],
    )
    monkeypatch.setattr(jx, "load", lambda s, d, n: df)
    out = jx.q_range_join(spark, "ignored").collect()
    assert len(out) == 1 and out[0]["range_id"] == 1 and out[0]["n_events"] == 2


def test_chunk_formula_edges(spark, monkeypatch):
    import kafka_stream_spark.plans.llm_ext as lx

    def doc(n):
        return " ".join(f"w{i}" for i in range(n))

    df = spark.createDataFrame(
        [(64, doc(64)), (65, doc(65)), (112, doc(112)), (113, doc(113)), (2, doc(2))],
        schema=["doc_id", "text"],
    )
    monkeypatch.setattr(lx, "_docs_parallel", lambda s, d: df)
    out = (
        lx.q_chunk_documents(spark, "ignored")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_chunks"), F.min("chunk_len").alias("min_len"))
        .collect()
    )
    got = {r["doc_id"]: (r["n_chunks"], r["min_len"]) for r in out}
    # size=64, stride=48: n<=64 → 1 chunk; 65..112 → 2; 113..160 → 3
    assert got[64] == (1, 64)
    assert got[65][0] == 2 and got[65][1] == 65 - 48  # tail chunk = 17
    assert got[112] == (2, 64)
    assert got[113][0] == 3
    assert got[2] == (1, 2)


def test_multimodal_image_stub_falls_back(spark):
    """image/* payloads hit the NotImplementedError stub and fall back to
    deterministic byte features — the pipeline stays total."""
    from kafka_stream_spark.operators.multimodal import extract_features

    df = spark.createDataFrame(
        [(1, bytearray(b"\x89PNG fake"), ("image/png", 9))],
        schema="doc_id long, payload binary, meta struct<mime:string,n_chars:long>",
    )
    row = extract_features(df).collect()[0]
    assert row["n_bytes"] == 9
    assert row["decoder"] == "stub-decoder-v0"
    assert len(row["content_hash"]) == 32


def test_pushdown_reaches_parquet_scan(spark, sf_dir):
    """Filter pushdown must land in the scan (PushedFilters non-empty)."""
    import io, contextlib
    from kafka_stream_spark.plans import QUERIES

    df = QUERIES["q_notnull_filter"](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters: [" in plan
    assert "IsNotNull(p_type)" in plan

def test_sample_frames_edges(spark):
    """Frame sampler: tail frame is short, exact-multiple payload has no
    tail, sub-frame payload yields exactly frame 0."""
    import hashlib

    from kafka_stream_spark.operators.multimodal import sample_frames

    rows = [(1, b"a" * 130), (2, b"b" * 128), (3, b"c" * 5)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        (r["doc_id"], r["frame_idx"]): (r["frame_len"], r["frame_hash"])
        for r in sample_frames(df, frame_size=64, stride=2).collect()
    }
    assert set(got) == {(1, 0), (1, 2), (2, 0), (3, 0)}
    assert got[(1, 2)] == (2, hashlib.md5(b"aa").hexdigest())
    assert got[(2, 0)] == (64, hashlib.md5(b"b" * 64).hexdigest())
    assert got[(3, 0)] == (5, hashlib.md5(b"c" * 5).hexdigest())


def test_resize_payloads_contract(spark):
    """Resize plumbing: 1:1 rows, output never exceeds the byte budget,
    short payloads pass through unchanged, transform is deterministic."""
    from kafka_stream_spark.operators.multimodal import resize_payloads

    rows = [(1, b"x" * 500), (2, b"y" * 10), (3, b"")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: (bytes(r["payload"]), r["n_bytes"], r["resizer"])
        for r in resize_payloads(df, target_bytes=96).collect()
    }
    assert len(got) == 3
    assert got[1] == (b"x" * 96, 96, "stub-truncate-v0")
    assert got[2] == (b"y" * 10, 10, "stub-truncate-v0")
    assert got[3] == (b"", 0, "stub-truncate-v0")


def test_binary_file_source_feeds_multimodal_pipeline(spark, tmp_path):
    """The raw-asset ingest path: spark.read.format('binaryFile') lifts
    opaque files (images/audio at production; fixed bytes here) into
    (path, content) rows, which feed operators.multimodal untouched —
    the exact on-ramp a 100 TB media corpus takes into the engine."""
    from kafka_stream_spark.operators.multimodal import extract_features

    payloads = {
        "a.bin": b"alpha-payload-0123456789",
        "b.bin": b"beta-payload-x" * 3,
        "c.bin": b"\x00\x01\x02binary\xff",
    }
    src = tmp_path / "assets"
    src.mkdir()
    for name, data in payloads.items():
        (src / name).write_bytes(data)

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(str(src))
    )
    assert {r["length"] for r in files.collect()} == {
        len(v) for v in payloads.values()
    }

    # extract_features' contract keys assets by a LONG doc_id — derive
    # one from the file name (ascii of the first letter), as an asset
    # catalog would assign ids at ingest
    d = files.select(
        F.ascii(F.element_at(F.split(F.col("path"), "/"), -1)).cast(
            "long"
        ).alias("doc_id"),
        F.col("content").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length("content").cast("long").alias("n_chars"),
        ).alias("meta"),
    )
    feats = {r["doc_id"]: r for r in extract_features(d).collect()}
    import hashlib

    expected = {ord(name[0]): data for name, data in payloads.items()}
    assert set(feats) == set(expected)
    for key, data in expected.items():
        assert feats[key]["n_bytes"] == len(data)
        assert feats[key]["content_hash"] == hashlib.md5(data).hexdigest()


def test_malformed_records_quarantined_not_fatal(spark, tmp_path):
    """Ingest robustness: one bad row must never kill a 100 TB job.
    PERMISSIVE JSON parsing quarantines malformed lines into
    _corrupt_record (nulls elsewhere); DROPMALFORMED CSV silently sheds
    them; FAILFAST is the opt-in strict mode."""
    import pytest

    jpath = tmp_path / "mixed.json"
    jpath.write_text(
        '{"id": 1, "v": 10.5}\n'
        "THIS IS NOT JSON\n"
        '{"id": 2, "v": null}\n'
        '{"id": 3, "v": "not-a-double"}\n'
    )
    schema = "id BIGINT, v DOUBLE, _corrupt_record STRING"
    rows = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(jpath))
        .collect()
    )
    by_corrupt = {r["_corrupt_record"] is not None: [] for r in rows}
    for r in rows:
        by_corrupt[r["_corrupt_record"] is not None].append(r)
    good, bad = by_corrupt[False], by_corrupt[True]
    assert {r["id"] for r in good} == {1, 2}
    assert len(bad) == 2  # the non-JSON line AND the type-mismatch line

    cpath = tmp_path / "mixed.csv"
    cpath.write_text("1,10.5\nnot,a,valid,row,at,all\n3,7.25\n")
    dropped = (
        spark.read.schema("id BIGINT, v DOUBLE")
        .option("mode", "DROPMALFORMED")
        .csv(str(cpath))
        .collect()
    )
    assert {(r["id"], r["v"]) for r in dropped} == {(1, 10.5), (3, 7.25)}

    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    with pytest.raises((PySparkException, Py4JJavaError)):
        spark.read.schema("id BIGINT, v DOUBLE").option(
            "mode", "FAILFAST"
        ).json(str(jpath)).collect()


def test_bounded_micro_batches_maxfiles(spark, tmp_path):
    """Backpressure: maxFilesPerTrigger=1 bounds every micro-batch to
    one input file — the knob that keeps per-batch state and memory flat
    no matter how large the backlog, verified via per-batch row caps."""
    import glob

    src, out, ckpt = (
        str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ck")
    )
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(90)], "id long, v double"
    )
    df.repartition(3).write.mode("overwrite").parquet(src)
    n_files = len(glob.glob(f"{src}/*.parquet"))
    assert n_files == 3

    batches = []
    q = (
        spark.readStream.schema("id long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    for p in q.recentProgress:
        if p["numInputRows"] > 0:
            batches.append(p["numInputRows"])
    assert len(batches) == n_files  # one batch per file
    assert max(batches) <= 90 / 3 + 1
    assert spark.read.parquet(out).count() == 90
