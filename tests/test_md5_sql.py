"""MD5 compiled to SQL (functions/md5_sql): the DuckDB-side oracle for
exact uuid3 keys must agree bit-for-bit with hashlib/uuid for every
single-block input, including the padding edge cases (empty name, name
exactly at the 39-byte block boundary, over-length truncation)."""

from __future__ import annotations

import hashlib
import uuid

import duckdb

from kafka_stream_spark.functions.md5_sql import (
    MAX_NAME_BYTES,
    md5_hex_sql,
    uuid3_hex_sql,
)

NAMES = [
    "",
    "a",
    "hello",
    "web:en:42",
    "doc 7 body 217",
    "punct!@#$%^&*()_+-=[]{};':,.<>/?",
    "x" * MAX_NAME_BYTES,  # exactly fills the single block
]


def _values_src(names) -> str:
    vals = ", ".join(
        "({}, '{}')".format(i, n.replace("'", "''")) for i, n in enumerate(names)
    )
    return f"SELECT * FROM (VALUES {vals}) AS t(id, nm)"


def test_md5_hex_matches_hashlib():
    sql = md5_hex_sql(_values_src(NAMES), ["id"]) + " SELECT id, md5hex FROM dig"
    for i, got in sorted(duckdb.sql(sql).fetchall()):
        want = hashlib.md5(
            uuid.NAMESPACE_DNS.bytes + NAMES[i].encode()
        ).hexdigest()
        assert got == want, f"md5 mismatch for {NAMES[i]!r}"


def test_uuid3_hex_matches_uuid_module():
    sql = uuid3_hex_sql(_values_src(NAMES), ["id"], "k")
    for i, got in sorted(duckdb.sql(sql).fetchall()):
        assert got == uuid.uuid3(uuid.NAMESPACE_DNS, NAMES[i]).hex, (
            f"uuid3 mismatch for {NAMES[i]!r}"
        )


def test_overlong_name_truncates_to_block_boundary():
    long = "y" * (MAX_NAME_BYTES + 20)
    sql = uuid3_hex_sql(_values_src([long]), ["id"], "k")
    ((_, got),) = duckdb.sql(sql).fetchall()
    assert got == uuid.uuid3(uuid.NAMESPACE_DNS, long[:MAX_NAME_BYTES]).hex
