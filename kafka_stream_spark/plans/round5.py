"""Round-5 batch A: the JPEG closure (X483).

The round-4 verdict's top ask: baseline JPEG — the format every real
multimodal corpus is overwhelmingly stored in — decoded in pure
stdlib+numpy under the value-hash gate, the same discipline X440
proved for PNG.  ``operators/jpeg.py`` is a full baseline-sequential
codec (Annex K huffman tables written to and read back from DHT,
zigzag, quality-scaled quantization, orthonormal FDCT/IDCT, 4:2:0
box-subsample + replication upsample, YCbCr<->RGB); the gate query
rides the exactness contract documented there: constant-8x8-block
images with unit quantization tables round-trip bit-exactly, so the
DuckDB oracle can recompute the aHash arithmetically while Spark runs
the real entropy-coded decode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import default_parallelism
from ..sources.tables import load
from .llm_ext import _image_phash_oracle
from .registry import query

# ---------------------------------------------------------------------------
# X483 — baseline JPEG pipeline under the value-hash gate
# ---------------------------------------------------------------------------


@query("q_jpeg_pipeline", oracle=_image_phash_oracle())
def q_jpeg_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X483 — the DOMINANT real-corpus image format under the gate:
    each embedding's 64 quantized levels become a 64x64 image of
    constant 8x8 blocks (one block per level), encoded to a REAL
    baseline JFIF at quality=100 (unit quantization tables) with 4:2:0
    chroma subsampling, decoded back through the full huffman ->
    dequantize -> IDCT -> chroma-upsample -> YCbCr->RGB path, and
    aHashed.  aHash average-pools 64x64 down to 8x8, so each pooling
    cell averages exactly one constant block and the hash equals the
    8x8 aHash the oracle computes arithmetically (llm_ext.
    _image_phash_oracle) — a match proves encoder, decoder, and hash
    agree bit-for-bit on every image, through a real entropy-coded
    compressed container.

    Scale shape: identical to X189/X440 — a JVM-side quantization
    projection, two Arrow-batched mapInPandas hops (encode, then
    decode+hash), no shuffle anywhere, 8 bytes out per image; the
    repartition spreads the single-split testdata scan across cores
    and no-ops on a real multi-file corpus."""
    from ..operators.jpeg import encode_jpeg
    from ..operators.multimodal import perceptual_hash

    emb = load(spark, sf_dir, "embeddings").repartition(
        default_parallelism()
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
                rgb = b"".join(
                    bytes((g, g, g)) * 8 for g in
                    (int(v) for row in range(8) for _ in range(8)
                     for v in vals[row * 8 : row * 8 + 8])
                )
                payloads.append(
                    encode_jpeg(64, 64, rgb, quality=100, subsampling="4:2:0")
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    imgs = quant.mapInPandas(build, schema="doc_id long, payload binary")
    return perceptual_hash(imgs).select(
        F.col("doc_id").alias("vec_id"), "phash"
    )
