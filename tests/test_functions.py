"""Keys, decodes, text expressions, portable hashing."""

from __future__ import annotations

import uuid

import duckdb
from pyspark.sql import functions as F

from kafka_stream_spark.functions import decode, hashing, keys, text


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


# --- keys ------------------------------------------------------------------


def test_surrogate_key_nulls_coalesce(spark):
    a = _one(spark, keys.surrogate_key(F.lit("x"), F.lit(None).cast("string")))
    b = _one(spark, keys.surrogate_key(F.lit("x"), F.lit("")))
    assert a == b  # null component ≡ empty string (reference convention)


def test_surrogate_key_matches_duckdb(spark):
    s = _one(spark, keys.surrogate_key(F.lit("甲"), F.lit(42)))
    d = duckdb.sql("SELECT md5(concat_ws('||', '甲', '42'))").fetchone()[0]
    assert s == d


def test_uuid3_exact_reference_semantics(spark):
    # kafka_s.py:465-468: uuid3(NAMESPACE_DNS, s) with dashes stripped —
    # the engine-native expression must be bit-for-bit uuid.uuid3
    cases = ["abc标题", "", "a", "14雏鹰债：受托管理事务报告", "x" * 500]
    df = spark.createDataFrame([(s,) for s in cases], ["s"]).select(
        "s", keys.uuid3_key("s").alias("v")
    )
    got = {r["s"]: r["v"] for r in df.collect()}
    for s in cases:
        expected = str(uuid.uuid3(uuid.NAMESPACE_DNS, s)).replace("-", "")
        assert got[s] == expected, s


# --- decodes ---------------------------------------------------------------


def test_emo_imp_decode_and_missing(spark):
    rows = (
        spark.createDataFrame([(1,), (-1,), (0,), (7,)], ["s"])
        .select("s", decode.emo_label(F.col("s")).alias("emo"))
        .collect()
    )
    got = {r["s"]: r["emo"] for r in rows}
    assert got == {1: "正向", -1: "负向", 0: "中性", 7: None}
    rows = (
        spark.createDataFrame([(30,), (10,), (8,), (5,), (3,), (4,)], ["s"])
        .select("s", decode.imp_label(F.col("s")).alias("imp"))
        .collect()
    )
    got = {r["s"]: r["imp"] for r in rows}
    assert got == {30: "高", 10: "中", 8: "中", 5: "低", 3: "低", 4: None}


# --- text ------------------------------------------------------------------


def test_tokens_drop_empties(spark):
    assert _one(spark, text.tokens(F.lit("a  b   c"))) == ["a", "b", "c"]


def test_shingles_short_doc_fallback(spark):
    toks = text.tokens(F.lit("one two"))
    assert _one(spark, text.shingles(toks)) == ["one two"]
    toks3 = text.tokens(F.lit("a b c d"))
    assert _one(spark, text.shingles(toks3)) == ["a b c", "b c d"]


def test_shingle_hashes_short_doc_fallback(spark):
    # <3 tokens → single whole-text hash (dormant on the corpus; pin here)
    t = F.lit("one two")
    th = text.hashed_tokens_mod(t)
    hs = text.shingle_hashes(th, text.tokens(t))
    v = _one(spark, hs)
    assert len(v) == 1 and 0 <= v[0] < hashing.MERSENNE_P


def test_predict_lang_ties_and_none(spark):
    toks = text.tokens(F.lit("word word word"))
    assert _one(spark, text.predict_lang(toks)) == "und"
    toks = text.tokens(F.lit("the der"))  # 1 en hit, 1 de hit → first wins
    assert _one(spark, text.predict_lang(toks)) == "en"
    toks = text.tokens(F.lit("der die und"))
    assert _one(spark, text.predict_lang(toks)) == "de"


# --- portable hashing ------------------------------------------------------


def test_token_hash_matches_duckdb(spark):
    for s in ["hello", "甲乙丙", ""]:
        sp = _one(spark, hashing.token_hash(F.lit(s)))
        du = duckdb.sql(f"SELECT {hashing.token_hash_sql(repr(s))}").fetchone()[0]
        assert sp == du, s


def test_minhash_identical_sets_equal_signatures(spark):
    df = spark.createDataFrame([(1, [10, 20, 30]), (2, [30, 10, 20])], ["id", "hs"])
    sigs = df.select(
        "id", hashing.minhash_signature(F.col("hs").cast("array<long>")).alias("sig")
    ).collect()
    s = {r["id"]: r["sig"] for r in sigs}
    assert s[1] == s[2]  # order-insensitive


def test_simhash_bits_bounded(spark):
    v = _one(
        spark,
        hashing.simhash(F.expr("array(1L, 2L, 95L)")),
    )
    assert 0 <= v < (1 << hashing.SIMHASH_BITS)


def test_simhash_matches_duckdb(spark):
    arr = [5, 9, 1 << 40, 12345678901]
    sp = _one(spark, hashing.simhash(F.expr(f"array({', '.join(str(x) + 'L' for x in arr)})")))
    du = duckdb.sql(
        f"SELECT {hashing.simhash_sql('[' + ', '.join(map(str, arr)) + '::BIGINT]')}"
    ).fetchone()[0]
    assert sp == du


def test_hilbert_xy2d_is_continuous_bijection():
    """The unrolled Hilbert transform must be a bijection whose
    consecutive indices are grid-adjacent cells — the locality property
    q_hilbert_layout's bounding-box claims rest on."""
    from kafka_stream_spark.functions.hilbert import xy2d_py

    n = 16
    cells = {}
    for x in range(n):
        for y in range(n):
            cells[xy2d_py(n, x, y)] = (x, y)
    assert len(cells) == n * n
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = cells[d], cells[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1
