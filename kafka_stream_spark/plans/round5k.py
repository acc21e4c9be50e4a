"""Round-5 batch K: codec line extension + Arrow UDF surface.

X568 — GIF87a under the value-hash gate: `operators/gif.py` is a real
LZW codec (variable-width codes, dictionary growth + reset, KwKwK),
and because GIF is lossless for ≤256-color images the gate pins the
full encode→container-walk→LZW-decode→palette path bit-for-bit.
X569 — G.711 μ-law companding: the telephony/speech-corpus sample
codec, integer companding both directions, with the oracle replicating
the same integer logic as a threshold chain.  X570 — the
Arrow-OPTIMIZED Python UDF (`useArrow=True`): the Spark 3.5+ middle
tier between row-pickled UDFs (never used in this engine) and pandas
UDFs — scalar Python semantics, Arrow transport.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import default_parallelism
from ..sources.tables import load
from .llm_ext import _image_phash_oracle
from .registry import query

# ---------------------------------------------------------------------------
# X568 — GIF pipeline under the value-hash gate
# ---------------------------------------------------------------------------


@query("q_gif_pipeline", oracle=_image_phash_oracle())
def q_gif_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X568 — the GIF closure: each embedding's 64 quantized levels
    become an 8×8 grayscale raster, encoded to a REAL GIF87a (palette
    build, variable-width LZW with growth, sub-block framing —
    operators/gif.py), then decoded back through the container walk +
    LZW + palette lookup and aHashed.  GIF is lossless at ≤256
    colors, so the hash must equal the oracle's arithmetic aHash of
    the raw levels — one hash mismatch anywhere in ~N images would
    expose a single wrong pixel in either direction of the codec.
    Extends the codec line BMP/PPM→PNG→JPEG(baseline+progressive)→
    MJPEG with the last everyday raster container.

    Scale shape: identical to X189/X440/X483 — one JVM-side
    quantization projection, two Arrow-batched mapInPandas hops
    (encode; decode+hash), no shuffle, 8 bytes out per image."""
    from ..operators.gif import encode_gif
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
                rgb = b"".join(bytes((int(g),) * 3) for g in vals)
                payloads.append(encode_gif(8, 8, rgb))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    imgs = quant.mapInPandas(build, schema="doc_id long, payload binary")
    return perceptual_hash(imgs).select(
        F.col("doc_id").alias("vec_id"), "phash"
    )


# ---------------------------------------------------------------------------
# X569 — G.711 μ-law companding under the gate
# ---------------------------------------------------------------------------

_Q16 = (
    "list_transform(embedding, e -> CAST(least(greatest("
    "round(CAST(e AS DOUBLE) * 32767.0::DOUBLE, 0), -32768.0), 32767.0)"
    " AS BIGINT))"
)

# integer companding as expressions over sample v (BIGINT)
_M = "(least(CASE WHEN v < 0 THEN -v ELSE v END, 32635) + 132)"
_EXP = (
    f"(CASE WHEN {_M} >= 16384 THEN 7 WHEN {_M} >= 8192 THEN 6"
    f" WHEN {_M} >= 4096 THEN 5 WHEN {_M} >= 2048 THEN 4"
    f" WHEN {_M} >= 1024 THEN 3 WHEN {_M} >= 512 THEN 2"
    f" WHEN {_M} >= 256 THEN 1 ELSE 0 END)"
)
_MANT = f"(({_M} >> ({_EXP} + 3)) & 15)"
_MAG = f"((({_MANT} * 8) + 132) * (1 << {_EXP}) - 132)"
_Y = f"(CASE WHEN v < 0 THEN -{_MAG} ELSE {_MAG} END)"


@query(
    "q_mulaw_audio",
    oracle=f"""
    WITH s AS (SELECT vec_id, {_Q16} AS x FROM embeddings),
    c AS (
      SELECT vec_id, len(x) AS n,
             list_aggregate(list_transform(x, v -> v * v), 'sum') AS sig,
             list_aggregate(list_transform(x, v -> ({_Y} - v) * ({_Y} - v)),
                            'sum') AS err,
             list_aggregate(list_transform(x, v ->
               CASE WHEN {_Y} - v < 0 THEN v - {_Y} ELSE {_Y} - v END),
               'max') AS mx
      FROM s
    )
    SELECT vec_id, CAST(n AS BIGINT) AS n_samples,
           CAST(mx AS BIGINT) AS max_abs_err,
           round(10 * log10(sig * 1.0 / greatest(err, 1)), 4) AS snr_db
    FROM c
    """,
)
def q_mulaw_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X569 — G.711 μ-law companding under the gate: each embedding's
    int16 PCM frame (the X498 audio-pipeline quantization) runs
    through the REAL telephony codec — 2:1 logarithmic compression to
    8-bit codes and back (operators/multimodal.mulaw_encode/decode,
    the reference mask-loop logic) — and the per-frame reconstruction
    error (max |Δ|, SNR in dB) is pinned against an oracle that
    replicates the INTEGER companding as a threshold chain.  A match
    proves both directions of the codec on every sample of every
    frame; this is the format every classic speech corpus
    (e.g. 8 kHz telephony) arrives in.

    Error sums are exact integers computed Python-side (no float
    drift); only the final dB is floating.  Scale: one Arrow hop,
    1 byte/sample intermediate, no shuffle."""
    from ..operators.multimodal import mulaw_decode, mulaw_encode

    emb = load(spark, sf_dir, "embeddings").repartition(
        default_parallelism()
    )
    pcm = F.transform(
        F.col("embedding"),
        lambda e: F.least(
            F.greatest(
                F.round(e.cast("double") * 32767.0, 0), F.lit(-32768.0)
            ),
            F.lit(32767.0),
        ).cast("long"),
    )
    frames = emb.select("vec_id", pcm.alias("x"))

    def run(batches):
        import pandas as pd

        for pdf in batches:
            out = {
                "vec_id": [],
                "n_samples": [],
                "sig": [],
                "err": [],
                "max_abs_err": [],
            }
            for vec_id, xs in zip(pdf["vec_id"], pdf["x"]):
                xs = [int(v) for v in xs]
                ys = mulaw_decode(mulaw_encode(xs))
                out["vec_id"].append(vec_id)
                out["n_samples"].append(len(xs))
                out["sig"].append(sum(v * v for v in xs))
                out["err"].append(
                    sum((a - b) * (a - b) for a, b in zip(ys, xs))
                )
                out["max_abs_err"].append(
                    max(abs(a - b) for a, b in zip(ys, xs))
                )
            yield pd.DataFrame(out)

    stats = frames.mapInPandas(
        run,
        schema=(
            "vec_id long, n_samples long, sig long, err long,"
            " max_abs_err long"
        ),
    )
    return stats.select(
        "vec_id",
        "n_samples",
        "max_abs_err",
        F.round(
            10
            * F.log10(
                F.col("sig") / F.greatest(F.col("err"), F.lit(1))
            ),
            4,
        ).alias("snr_db"),
    )


# ---------------------------------------------------------------------------
# X570 — Arrow-optimized Python UDF
# ---------------------------------------------------------------------------


@query(
    "q_arrow_udf",
    oracle="""
    SELECT c_custkey, upper(reverse(c_name)) AS rev_name,
           length(c_name) AS name_len
    FROM customer WHERE c_custkey < 200
    """,
)
def q_arrow_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X570 — the Arrow-OPTIMIZED scalar Python UDF
    (``F.udf(..., useArrow=True)``, Spark 3.5+): per-row Python
    semantics with Arrow-batch transport — the migration path for
    row-logic that predates pandas UDFs, removing pickle
    serialization without rewriting the function vectorized.  The
    engine's hot paths stay JVM-side or pandas-vectorized (X25-X27);
    this registers the remaining rung of the Python-UDF ladder so the
    API surface is complete, gated against a pure-SQL oracle
    computing the same transform.

    Scale note: Arrow transport makes the per-batch overhead
    constant, but the per-ROW Python bytecode still runs — for string
    kernels at volume prefer the built-in functions this oracle
    uses."""
    rev_upper = F.udf(
        lambda s: None if s is None else s[::-1].upper(),
        "string",
        useArrow=True,
    )
    c = load(spark, sf_dir, "customer")
    return c.filter(F.col("c_custkey") < 200).select(
        "c_custkey",
        rev_upper(F.col("c_name")).alias("rev_name"),
        F.length("c_name").cast("long").alias("name_len"),
    )
