"""Round-10 batch F (X743+): multimodal FEATURE EXTRACTION through
the real codecs — the step after decode that the E6 mandate's
"feature-extract" clause names.

- X743 q_image_edges: Sobel edge energy/orientation through the real
  JPEG encode→decode→average-pool path.
- X744 q_dft_bands: DFT band energies through the real WAV
  encode→decode path (the spectrogram primitive).

Both follow the X483/X495 arithmetic-oracle pattern: the payloads are
REAL containers round-tripped by the pure-Python codecs inside
mapInPandas; the construction makes the expected features exactly
recomputable from the quantization — a hash match proves codec,
pooling/framing, and feature math agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import default_parallelism
from ..sources.tables import load
from .registry import query
from .round9b import _half_up_sql, _half_up_col

# ---------------------------------------------------------------------------
# X743 — Sobel edge features through the real JPEG path
# ---------------------------------------------------------------------------

_IE_ORACLE = """
    WITH lv AS (
      SELECT vec_id, r.r, c.c,
             least(greatest(CAST(round(
               (CAST(embedding[r.r * 8 + c.c + 1] AS DOUBLE) + 1.0)
               * 127.5) AS BIGINT), 0), 255) AS g
      FROM (SELECT * FROM embeddings WHERE len(embedding) >= 64) e
      CROSS JOIN (SELECT unnest(range(8)) AS r) r
      CROSS JOIN (SELECT unnest(range(8)) AS c) c),
    px AS (
      SELECT a.vec_id, a.r, a.c,
             (b00.g - b02.g + 2 * (b10.g - b12.g) + b20.g - b22.g) AS gx,
             (b00.g + 2 * b01.g + b02.g - b20.g - 2 * b21.g - b22.g) AS gy
      FROM lv a
      JOIN lv b00 ON b00.vec_id = a.vec_id AND b00.r = a.r - 1
                 AND b00.c = a.c - 1
      JOIN lv b01 ON b01.vec_id = a.vec_id AND b01.r = a.r - 1
                 AND b01.c = a.c
      JOIN lv b02 ON b02.vec_id = a.vec_id AND b02.r = a.r - 1
                 AND b02.c = a.c + 1
      JOIN lv b10 ON b10.vec_id = a.vec_id AND b10.r = a.r
                 AND b10.c = a.c - 1
      JOIN lv b12 ON b12.vec_id = a.vec_id AND b12.r = a.r
                 AND b12.c = a.c + 1
      JOIN lv b20 ON b20.vec_id = a.vec_id AND b20.r = a.r + 1
                 AND b20.c = a.c - 1
      JOIN lv b21 ON b21.vec_id = a.vec_id AND b21.r = a.r + 1
                 AND b21.c = a.c
      JOIN lv b22 ON b22.vec_id = a.vec_id AND b22.r = a.r + 1
                 AND b22.c = a.c + 1
      WHERE a.r BETWEEN 1 AND 6 AND a.c BETWEEN 1 AND 6)
    SELECT vec_id,
           CAST(sum(abs(gx) + abs(gy)) AS BIGINT) AS edge_energy,
           CAST(sum(CASE WHEN abs(gx) > abs(gy) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_vertical,
           CAST(sum(CASE WHEN abs(gy) > abs(gx) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_horizontal
    FROM px GROUP BY vec_id ORDER BY vec_id
    """


@query("q_image_edges", oracle=_IE_ORACLE)
def q_image_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X743 — Sobel edge features through the REAL image path: each
    embedding becomes a 64×64 constant-block JPEG (the X483
    construction), is round-tripped through the full baseline-JFIF
    encoder/decoder (quality 100, bit-exact), average-pooled 8×8
    (each pooling cell recovers exactly one block level), and run
    through the 3×3 Sobel operator — per-image edge energy
    Σ(|Gx|+|Gy|) over the 6×6 interior plus vertical/horizontal
    orientation counts. Edge statistics are the standard cheap image
    quality/content signals (blur detection, synthetic-image flags,
    layout classification) a multimodal curation pipeline runs right
    after decode. The oracle recomputes the identical INTEGER Sobel
    responses arithmetically from the quantized levels — a match
    proves encoder, decoder, pooling, and convolution agree exactly.

    Scale: one Arrow-batched encode hop + one decode/pool/convolve
    hop, per-row independent, no shuffle; integers out."""
    from ..operators.jpeg import decode_jpeg, encode_jpeg

    # spread the single-split testdata scan across cores before the
    # Python-decode hop (the X483 rule — no-ops on a multi-file corpus)
    emb = (
        load(spark, sf_dir, "embeddings")
        .filter(F.size("embedding") >= 64)
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
    quant = emb.select("vec_id", px.alias("px"))

    def feats(batches):
        import pandas as pd

        for pdf in batches:
            out = {
                "vec_id": [],
                "edge_energy": [],
                "n_vertical": [],
                "n_horizontal": [],
            }
            for vec_id, vals in zip(pdf["vec_id"], pdf["px"]):
                rgb = b"".join(
                    bytes((g, g, g)) * 8
                    for g in (
                        int(v)
                        for row in range(8)
                        for _ in range(8)
                        for v in vals[row * 8 : row * 8 + 8]
                    )
                )
                payload = encode_jpeg(
                    64, 64, rgb, quality=100, subsampling="4:2:0"
                )
                w, h, decoded = decode_jpeg(payload)
                # average-pool 64x64 -> 8x8 on the decoded luma
                grid = [[0] * 8 for _ in range(8)]
                for br in range(8):
                    for bc in range(8):
                        s = 0
                        for yy in range(br * 8, br * 8 + 8):
                            for xx in range(bc * 8, bc * 8 + 8):
                                p = (yy * w + xx) * 3
                                s += decoded[p]  # grayscale: R==G==B
                        grid[br][bc] = (2 * s + 64) // 128  # half-up /64
                energy = nv = nh = 0
                for r in range(1, 7):
                    for c in range(1, 7):
                        gx = (
                            grid[r - 1][c - 1]
                            - grid[r - 1][c + 1]
                            + 2 * (grid[r][c - 1] - grid[r][c + 1])
                            + grid[r + 1][c - 1]
                            - grid[r + 1][c + 1]
                        )
                        gy = (
                            grid[r - 1][c - 1]
                            + 2 * grid[r - 1][c]
                            + grid[r - 1][c + 1]
                            - grid[r + 1][c - 1]
                            - 2 * grid[r + 1][c]
                            - grid[r + 1][c + 1]
                        )
                        energy += abs(gx) + abs(gy)
                        nv += 1 if abs(gx) > abs(gy) else 0
                        nh += 1 if abs(gy) > abs(gx) else 0
                out["vec_id"].append(vec_id)
                out["edge_energy"].append(energy)
                out["n_vertical"].append(nv)
                out["n_horizontal"].append(nh)
            yield pd.DataFrame(out)

    return quant.mapInPandas(
        feats,
        schema=(
            "vec_id long, edge_energy long, n_vertical long, "
            "n_horizontal long"
        ),
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# X744 — DFT band energies through the real WAV path
# ---------------------------------------------------------------------------

_DFT_BINS = (1, 3, 7, 15)

_DFT_ORACLE = f"""
    WITH smp AS (
      SELECT vec_id, t.t,
             least(greatest(CAST(round(
               CAST(embedding[t.t + 1] AS DOUBLE) * 32767.0) AS BIGINT),
               -32768), 32767) AS s
      FROM (SELECT * FROM embeddings WHERE len(embedding) >= 64) e
      CROSS JOIN (SELECT unnest(range(64)) AS t) t),
    terms AS (
      SELECT vec_id, b.b, smp.t,
             CAST(round(1000000.0 * smp.s
                  * cos(2 * pi() * b.b * smp.t / 64.0)) AS BIGINT) AS tc6,
             CAST(round(1000000.0 * smp.s
                  * sin(2 * pi() * b.b * smp.t / 64.0)) AS BIGINT) AS ts6
      FROM smp CROSS JOIN (SELECT unnest([{', '.join(str(b) for b in _DFT_BINS)}]) AS b) b),
    bins AS (
      SELECT vec_id, b,
             CAST(sum(tc6) AS HUGEINT) AS re6,
             CAST(sum(ts6) AS HUGEINT) AS im6
      FROM terms GROUP BY vec_id, b),
    en AS (
      SELECT vec_id, b, re6 * re6 + im6 * im6 AS e
      FROM bins),
    tot AS (
      SELECT vec_id, sum(e) AS te FROM en GROUP BY vec_id)
    SELECT e.vec_id, CAST(e.b AS BIGINT) AS bin,
           {_half_up_sql('1000000 * e.e', 'greatest(t.te, 1)')} / 1000000.0
             AS band_share
    FROM en e JOIN tot t ON t.vec_id = e.vec_id
    ORDER BY e.vec_id, e.b
    """


@query("q_dft_bands", oracle=_DFT_ORACLE)
def q_dft_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X744 — DFT band energies through the REAL audio path: each
    embedding quantizes to 64 int16 PCM samples, round-trips through
    a real RIFF/WAVE container (X495's codec), and the decoded
    samples feed a 4-bin DFT (bins {_DFT_BINS}) — the spectrogram
    primitive behind every audio feature stack (VAD, music/speech
    discrimination, bandwidth checks). Per clip the output is each
    bin's energy SHARE of the 4-bin total.

    Determinism: decoded samples are bit-exact integers; each DFT
    term s_t·cos/sin(2πbt/64) is a libm call on identical doubles
    quantized micro PER TERM before the 64-term integer sum (the
    fold-order-proof discipline); energies are exact int128 squares
    (Python ints / HUGEINT); the share is one half-up micro ratio.

    Scale: one encode hop + one decode/DFT hop, per-row independent,
    no shuffle; bins × clips rows out."""
    import math

    from ..operators.multimodal import decode_wav, encode_wav

    emb = (
        load(spark, sf_dir, "embeddings")
        .filter(F.size("embedding") >= 64)
        .repartition(default_parallelism())
    )
    q = F.transform(
        F.col("embedding"),
        lambda v: F.least(
            F.greatest(
                F.round(v.cast("double") * F.lit(32767.0), 0),
                F.lit(-32768.0),
            ),
            F.lit(32767.0),
        ).cast("bigint"),
    )
    quant = emb.select("vec_id", q.alias("smp"))

    def feats(batches):
        import pandas as pd

        for pdf in batches:
            out = {"vec_id": [], "bin": [], "band_share": []}
            for vec_id, smp in zip(pdf["vec_id"], pdf["smp"]):
                payload = encode_wav(
                    [int(s) for s in smp[:64]], sample_rate=8000
                )
                _rate, _ch, samples = decode_wav(payload)
                energies = []
                for b in _DFT_BINS:
                    re6 = im6 = 0
                    for t, s in enumerate(samples):
                        ang = 2.0 * math.pi * b * t / 64.0
                        re6 += int(
                            math.floor(1000000.0 * s * math.cos(ang) + 0.5)
                        ) if s * math.cos(ang) >= 0 else -int(
                            math.floor(-1000000.0 * s * math.cos(ang) + 0.5)
                        )
                        im6 += int(
                            math.floor(1000000.0 * s * math.sin(ang) + 0.5)
                        ) if s * math.sin(ang) >= 0 else -int(
                            math.floor(-1000000.0 * s * math.sin(ang) + 0.5)
                        )
                    energies.append(re6 * re6 + im6 * im6)
                te = max(sum(energies), 1)
                for b, e in zip(_DFT_BINS, energies):
                    out["vec_id"].append(vec_id)
                    out["bin"].append(b)
                    out["band_share"].append(
                        ((2 * (1000000 * e) + te) // (2 * te)) / 1000000.0
                    )
            yield pd.DataFrame(out)

    return quant.mapInPandas(
        feats, schema="vec_id long, bin long, band_share double"
    ).orderBy("vec_id", "bin")
