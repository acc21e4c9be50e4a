"""Round-4 breadth, part D: gate promotions for operators that were
previously pytest/design-only — the salted skew join (X88) and the
multimodal resize pipeline (X98) — plus Unicode script-ratio profiling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load
from .registry import query

# ---------------------------------------------------------------------------
# X303 — salted skew join under the value-hash gate (promotes X88)
# ---------------------------------------------------------------------------


@query(
    "q_salted_join",
    oracle="""
    SELECT s.s_name, count(*) AS n_lines,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
    GROUP BY s.s_name
    """,
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X303 — the X88 salted join promoted from pytest-only to the full
    value-hash gate: lineitem (big, supplier keys are hot — ~1500 rows
    per supplier here, arbitrarily skewed in the wild) joins the
    supplier dim through operators.skew.salted_join — deterministic
    xxhash64 row salt on the big side, dim replicated n_salts times,
    join key (key, salt) so one hot key's reducer splits into 8. The
    oracle is the PLAIN join: salting must be result-invisible, and the
    hash gate proves it row-for-row. This is the manual fallback for
    when AQE skew handling can't apply (skewed stage feeding a window,
    non-broadcastable small side)."""
    from ..operators.skew import salted_join

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("s_suppkey"),
        "l_extendedprice",
        "l_discount",
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    joined = salted_join(li, s, key="s_suppkey", n_salts=8)
    return joined.groupBy("s_name").agg(
        F.count("*").alias("n_lines"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# X304 — Unicode script-ratio profiling
# ---------------------------------------------------------------------------


@query(
    "q_script_ratio",
    oracle=r"""
    WITH feats AS (
      SELECT lang,
             length(text) AS n,
             len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS han,
             len(regexp_extract_all(text, '[a-zA-Z]')) AS latin,
             len(regexp_extract_all(text, '[0-9]')) AS digit
      FROM documents WHERE length(text) > 0
    )
    SELECT lang, count(*) AS n_docs,
           round(avg(han * 1.0 / n), 6) AS han_ratio,
           round(avg(latin * 1.0 / n), 6) AS latin_ratio,
           round(avg(digit * 1.0 / n), 6) AS digit_ratio
    FROM feats GROUP BY lang
    """,
)
def q_script_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X304 — Unicode script-ratio profile per labeled language: mean
    fraction of Han / Latin / digit characters per document — the
    script-level signal that catches what token-based language-ID
    (X17, evaluated by X290) can't (transliterated text, mixed-script
    spam, mojibake). Character classes are \\x{...} codepoint ranges,
    the spelling Java regex and RE2 share. One regexp projection pass
    + one rollup."""
    d = load(spark, sf_dir, "documents").filter(F.length("text") > 0)
    feats = d.select(
        "lang",
        F.length("text").alias("n"),
        F.regexp_count("text", F.lit(r"[\x{4e00}-\x{9fff}]")).alias("han"),
        F.regexp_count("text", F.lit("[a-zA-Z]")).alias("latin"),
        F.regexp_count("text", F.lit("[0-9]")).alias("digit"),
    )
    return feats.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(F.col("han") * 1.0 / F.col("n")), 6).alias("han_ratio"),
        F.round(F.avg(F.col("latin") * 1.0 / F.col("n")), 6).alias(
            "latin_ratio"
        ),
        F.round(F.avg(F.col("digit") * 1.0 / F.col("n")), 6).alias(
            "digit_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# X305 — resize pipeline under the value-hash gate (promotes X98)
# ---------------------------------------------------------------------------


def _resize_phash_oracle() -> str:
    """aHash of the 4x4 nearest-neighbor downsample of the
    embedding-derived 8x8 image: resized pixel (x, y) = original
    (2x, 2y) (top-left of each 2x2 block, operators.multimodal
    ._halve_nn), so lum_{x,y} = b[16y + 2x]. ahash64 on a 4x4 image
    pools pixel (x, y) into cell 2y*8 + 2x; the 48 unoccupied cells
    average 0.0 and set their bits only when the occupied mean is 0
    (all-black image) — replicated exactly, bit 63's signed weight
    included."""

    def b(j: int) -> str:
        return (
            f"least(greatest(CAST(round((CAST(embedding[{j + 1}] AS DOUBLE)"
            f" + 1.0::DOUBLE) * 127.5::DOUBLE) AS BIGINT), 0), 255)"
        )

    lums = []
    cells = []
    for y in range(4):
        for x in range(4):
            j = (2 * y) * 8 + 2 * x  # source pixel picked by _halve_nn
            lums.append(
                f"(0.299::DOUBLE * {b(j)} + 0.587::DOUBLE * {b(j)}"
                f" + 0.114::DOUBLE * {b(j)})"
            )
            cells.append(2 * y * 8 + 2 * x)  # aHash cell for the 4x4 image
    mean = "(" + " + ".join(f"l[{i + 1}]" for i in range(16)) + ") / 64::DOUBLE"
    bit_terms = []
    for i, cell in enumerate(cells):
        if cell == 63:
            val = "CAST(-9223372036854775808 AS BIGINT)"
        else:
            val = f"CAST({1 << cell} AS BIGINT)"
        bit_terms.append(f"CASE WHEN l[{i + 1}] >= m THEN {val} ELSE 0 END")
    empty = 0
    occupied = set(cells)
    for cell in range(64):
        if cell not in occupied:
            empty += -(1 << 63) if cell == 63 else (1 << cell)
    bit_terms.append(
        f"CASE WHEN m <= 0 THEN CAST({empty} AS BIGINT) ELSE 0 END"
    )
    return f"""
    WITH lum AS (
      SELECT vec_id, [{", ".join(lums)}] AS l FROM embeddings
      WHERE vec_id % 4 = 0
    ),
    withmean AS (SELECT vec_id, l, {mean} AS m FROM lum)
    SELECT vec_id, {" + ".join(bit_terms)} AS phash
    FROM withmean
    """


@query("q_resize_phash", oracle=_resize_phash_oracle())
def q_resize_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X305 — the X98 multimodal RESIZE pipeline promoted to the full
    value-hash gate (X189's discipline applied one stage deeper):
    embedding → 8x8 BMP → resize_payloads (nearest-neighbor halving to
    the 128-byte payload budget → one halving → 4x4; the budget counts
    the whole BMP container, header included) → perceptual hash of the RESIZED image,
    while the oracle recomputes the identical arithmetic from the
    top-left-of-each-2x2 source pixels. A match certifies the BMP
    round trip, the downsampler's pixel selection, and aHash's 4x4
    cell mapping together. Same Arrow-batched no-shuffle shape as
    q_image_phash, on a 25% sample."""
    from ..operators.multimodal import (
        encode_bmp,
        perceptual_hash,
        resize_payloads,
    )
    from ..session import default_parallelism

    emb = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 4 == 0)
        .repartition(default_parallelism())
    )
    px = F.transform(
        F.col("embedding"),
        lambda v: F.least(
            F.greatest(
                F.round((v.cast("double") + F.lit(1.0)) * F.lit(127.5), 0)
                .cast("bigint"),
                F.lit(0),
            ),
            F.lit(255),
        ),
    )
    quant = emb.select(F.col("vec_id").alias("doc_id"), px.alias("px"))

    def build(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for vals in pdf["px"]:
                gray = bytes(int(v) for v in vals)
                rgb = b"".join(bytes((g, g, g)) for g in gray)
                payloads.append(encode_bmp(8, 8, rgb))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    imgs = quant.mapInPandas(build, schema="doc_id long, payload binary")
    resized = resize_payloads(imgs, target_bytes=128).select(
        "doc_id", "payload"
    )
    return perceptual_hash(resized).select(
        F.col("doc_id").alias("vec_id"), "phash"
    )
