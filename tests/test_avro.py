"""X803/X804 — pure-Python Avro OCF codec + distributed source/sink.

The codec is a from-scratch implementation of the public Apache Avro
1.12 container-file spec (sources/avro.py); these tests pin the wire
layout (zigzag varints, union branches, sync markers, deflate blocks)
and the executor-side round-trip against the parquet source of truth.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafka_stream_spark.sources import avro as A
from kafka_stream_spark.sources.tables import load

FIELDS = [
    ("id", "long", False),
    ("name", "string", True),
    ("score", "double", False),
    ("ok", "boolean", False),
    ("payload", "bytes", True),
]

ROWS = [
    (1, "alpha", 1.5, True, b"\x00\x01"),
    (-42, None, -0.25, False, None),
    (2**62, "", 3.141592653589793, True, b""),
    (0, "unicode é中", 1e-300, False, b"\xff" * 5),
]


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=300, deadline=None)
def test_zigzag_roundtrip(n):
    v, pos = A.dec_long(A.enc_long(n), 0)
    assert v == n and pos == len(A.enc_long(n))


def test_zigzag_known_vectors():
    # spec's worked examples: 0→00, -1→01, 1→02, -2→03, 2→04, -64→7f, 64→80 01
    assert A.enc_long(0) == b"\x00"
    assert A.enc_long(-1) == b"\x01"
    assert A.enc_long(1) == b"\x02"
    assert A.enc_long(-2) == b"\x03"
    assert A.enc_long(-64) == b"\x7f"
    assert A.enc_long(64) == b"\x80\x01"


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_ocf_identity(codec):
    blob = A.encode_ocf(ROWS, FIELDS, codec=codec)
    assert blob[:4] == A.MAGIC
    fields, rows = A.decode_ocf(blob)
    assert fields == FIELDS
    assert rows == ROWS


def test_ocf_multiblock():
    blob = A.encode_ocf(ROWS, FIELDS, block_rows=2)
    # header sync + one sync per block (4 rows / 2 per block = 2 blocks)
    assert blob.count(A.SYNC) == 3
    assert A.decode_ocf(blob)[1] == ROWS


def test_ocf_deflate_compresses():
    rows = [(i, "x" * 200, 0.0, True, None) for i in range(500)]
    raw = A.encode_ocf(rows, FIELDS, codec="null")
    defl = A.encode_ocf(rows, FIELDS, codec="deflate")
    assert len(defl) < len(raw) // 2
    assert A.decode_ocf(defl)[1] == rows


def test_ocf_corruption_detected():
    blob = bytearray(A.encode_ocf(ROWS, FIELDS))
    with pytest.raises(ValueError, match="magic"):
        A.decode_ocf(b"Obj\x02" + bytes(blob[4:]))
    # flip a byte inside the trailing sync marker
    blob[-1] ^= 0xFF
    with pytest.raises(ValueError, match="sync"):
        A.decode_ocf(bytes(blob))


def test_schema_feature_gates():
    with pytest.raises(NotImplementedError):
        A.parse_schema(
            '{"type":"record","name":"r","fields":'
            '[{"name":"a","type":{"type":"array","items":"long"}}]}'
        )
    with pytest.raises(NotImplementedError):
        A.encode_ocf([], FIELDS, codec="snappy")


def test_distributed_roundtrip(spark, tmp_path):
    sf = "/root/testdata/sf0.001"
    e = load(spark, sf, "events").select("event_id", "user_id", "event_type")
    path = str(tmp_path / "avro")
    m1 = A.write_avro(e, path).collect()
    assert sum(r["n_records"] for r in m1) == e.count()
    back = A.read_avro(
        spark, path, "event_id long, user_id long, event_type string"
    )
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in e.collect()}
    # retry idempotence: a second write overwrites the same part files
    m2 = A.write_avro(e, path).collect()
    assert sorted(r["path"] for r in m1) == sorted(r["path"] for r in m2)
    assert back.count() == e.count()
    # by-name projection prunes at the decode boundary
    proj = A.read_avro(spark, path, "event_type string")
    assert proj.columns == ["event_type"]
    assert proj.count() == e.count()


def test_distributed_nullable_union(spark, tmp_path):
    sf = "/root/testdata/sf0.001"
    e = load(spark, sf, "events").select(
        "event_id",
        F.when(F.col("event_type") != "click", F.col("user_id")).alias("v2"),
    )
    n_null = e.filter(F.col("v2").isNull()).count()
    assert n_null > 0
    path = str(tmp_path / "avro_null")
    A.write_avro(e, path, codec="deflate").collect()
    back = A.read_avro(spark, path, "event_id long, v2 long")
    assert back.filter(F.col("v2").isNull()).count() == n_null
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in e.collect()}
