"""Round-6 batch A: GIF89a animation under the value-hash gate.

X571 — the first INTER-FRAME rung of the codec line (round-5 verdict
ask #3): operators/gif.py now speaks GIF89a animation — graphic-control
extensions, per-frame disposal methods, transparency, NETSCAPE loop
block, and inter-frame DELTA RECTANGLES (each frame after the first is
stored as the bounding box of changed pixels with unchanged pixels
transparent, composited back onto the canvas at decode). GIF stays
lossless for ≤255-color frames, so the gate pins the full
compose→delta-encode→LZW→decode→re-compose loop bit-for-bit: the
oracle recomputes each COMPOSED frame arithmetically from the
embedding and any single wrong pixel in the delta extraction, the
transparency routing, or the composition breaks the hash.

Reference parity note: the reference engine (kafka_stream/kafka_s.py)
has no media path; this extends SURVEY §2.14's multimodal family. The
NotImplementedError boundary narrows to true entropy-coded inter-frame
codecs (H.26x/VP9) plus interlaced GIF and local color tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import default_parallelism
from ..sources.tables import load
from .registry import query

# quantized 0-255 gray levels from the embedding, 1-based DuckDB list
_LEVELS = (
    "list_transform(embedding, e -> CAST(least(greatest("
    "round((CAST(e AS DOUBLE) + 1.0) * 127.5, 0), 0), 255) AS BIGINT))"
)

# pos is 1-based; row = (pos-1)//8, col = (pos-1)%8.  Frame deltas:
# frame 1 inverts the top-left 4x4 block, frame 2 additionally inverts
# the bottom-right 4x4 block (disjoint, so composition under disposal
# method 1 is px -> 255-px exactly on the union).
_TL = "((pos - 1) // 8 < 4 AND (pos - 1) % 8 < 4)"
_BR = "((pos - 1) // 8 >= 4 AND (pos - 1) % 8 >= 4)"


@query(
    "q_gif_animation",
    oracle=f"""
    WITH px AS (
      SELECT vec_id, unnest({_LEVELS}) AS v,
             unnest(range(1, len(embedding) + 1)) AS pos
      FROM embeddings
    ), frames AS (
      SELECT vec_id, f.frame_idx,
             CASE
               WHEN f.frame_idx = 0 THEN v
               WHEN f.frame_idx = 1 AND {_TL} THEN 255 - v
               WHEN f.frame_idx = 2 AND ({_TL} OR {_BR}) THEN 255 - v
               ELSE v
             END AS cv
      FROM px CROSS JOIN (
        SELECT unnest(range(0, 3)) AS frame_idx
      ) f
    )
    SELECT vec_id, CAST(frame_idx AS BIGINT) AS frame_idx,
           CAST(sum(cv) AS BIGINT) AS pix_sum,
           CAST(3 AS BIGINT) AS n_frames
    FROM frames GROUP BY vec_id, frame_idx
    """,
)
def q_gif_animation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X571 — GIF89a animation under the gate: each embedding renders a
    3-frame 8×8 grayscale animation (base image; top-left 4×4 block
    inverted; then bottom-right 4×4 block inverted too), encoded as a
    REAL animated GIF89a — frames 1 and 2 are stored as 4×4 delta
    rectangles with transparency under disposal method 1
    (operators/gif.encode_gif_animation) — then decoded back through
    the container walk, per-frame LZW, and canvas COMPOSITION
    (decode_gif_animation). The output is each composed frame's pixel
    sum, which the oracle recomputes arithmetically: a match proves
    delta extraction, transparent-pixel routing, and composition are
    pixel-exact for every frame of every animation.

    Scale shape: one JVM-side quantization projection, one
    Arrow-batched mapInPandas hop (encode+decode+sum per row), no
    shuffle, 3 rows × 24 bytes out per animation."""
    from ..operators.gif import decode_gif_animation, encode_gif_animation

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
    quant = emb.select("vec_id", px.alias("px"))

    def run(batches):
        import pandas as pd

        for pdf in batches:
            ids, fidx, sums, nf = [], [], [], []
            for vec_id, vals in zip(pdf["vec_id"], pdf["px"]):
                base = [int(g) for g in vals]
                f1 = [
                    255 - g if (i // 8 < 4 and i % 8 < 4) else g
                    for i, g in enumerate(base)
                ]
                f2 = [
                    255 - g if (i // 8 >= 4 and i % 8 >= 4) else g
                    for i, g in enumerate(f1)
                ]
                frames = [
                    b"".join(bytes((g,) * 3) for g in fr)
                    for fr in (base, f1, f2)
                ]
                payload = encode_gif_animation(8, 8, frames)
                _w, _h, composed = decode_gif_animation(payload)
                for k, fr in enumerate(composed):
                    ids.append(vec_id)
                    fidx.append(k)
                    sums.append(sum(fr[::3]))
                    nf.append(len(composed))
            yield pd.DataFrame(
                {
                    "vec_id": ids,
                    "frame_idx": fidx,
                    "pix_sum": sums,
                    "n_frames": nf,
                }
            )

    return quant.mapInPandas(
        run,
        schema="vec_id long, frame_idx long, pix_sum long, n_frames long",
    )
