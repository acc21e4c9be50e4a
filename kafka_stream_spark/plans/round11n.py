"""Round-11 batch N (X780): audio spectral descriptors through the
real WAV codec path.

Reference scope note: §2.13 mandate extension (E6 feature-extract
clause), reference-free.

- X780 q_audio_descriptors: spectral centroid, 85% rolloff bin, and
  log spectral flatness per clip, computed from a 31-bin DFT of the
  REAL encode→decode WAV round-trip (X744's path) — the three
  summary features every audio-curation filter ranks clips by
  (bandwidth, brightness, tonality vs noise).

Arithmetic-oracle pattern (X483/X495/X744): the payloads are real
RIFF/WAVE containers round-tripped by the pure-Python codec inside
mapInPandas; the oracle recomputes the identical DFT arithmetically,
so a hash match certifies codec + framing + feature math together.

Determinism: decoded samples are bit-exact integers; each DFT term
quantizes micro per term before the integer sum; bin energies become
half-up micro SHARES (exact ints), and all three descriptors derive
from those share integers — ln terms quantized 1e-9, ratios half-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import default_parallelism
from ..sources.tables import load
from .registry import query
from .round9b import _half_up_sql

_AD_BINS = 31  # DFT bins 1..31 over 64 samples (below Nyquist)
_AD_ROLLOFF_PCT = 85

_AD_ORACLE = f"""
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
      FROM smp CROSS JOIN (SELECT unnest(range(1, {_AD_BINS} + 1)) AS b) b),
    bins AS (
      SELECT vec_id, b,
             CAST(sum(tc6) AS HUGEINT) AS re6,
             CAST(sum(ts6) AS HUGEINT) AS im6
      FROM terms GROUP BY vec_id, b),
    en AS (
      SELECT vec_id, b, re6 * re6 + im6 * im6 AS e FROM bins),
    tot AS (SELECT vec_id, sum(e) AS te FROM en GROUP BY vec_id),
    shr AS (
      SELECT e.vec_id, e.b,
             {_half_up_sql('1000000 * e.e', 'greatest(t.te, 1)')} AS s6
      FROM en e JOIN tot t ON t.vec_id = e.vec_id),
    agg AS (
      SELECT vec_id,
             CAST(sum(b * s6) AS HUGEINT) AS sbs,
             CAST(sum(s6) AS HUGEINT) AS ss,
             CAST(sum(CAST(round(1e9 * ln(greatest(s6, 1))) AS BIGINT))
               AS HUGEINT) AS sln
      FROM shr GROUP BY vec_id),
    agg2 AS (
      SELECT vec_id, sbs, ss, sln,
             CAST(round(1e9 * ln(CAST(ss AS DOUBLE) / {_AD_BINS}))
               AS BIGINT) AS l9
      FROM agg),
    roll AS (
      SELECT vec_id, min(b) AS rolloff_bin FROM (
        SELECT vec_id, b,
               sum(s6) OVER (PARTITION BY vec_id ORDER BY b) AS cum,
               sum(s6) OVER (PARTITION BY vec_id) AS stot
        FROM shr)
      WHERE 100 * cum >= {_AD_ROLLOFF_PCT} * stot
      GROUP BY vec_id)
    SELECT a.vec_id,
           {_half_up_sql('1000000 * a.sbs', 'greatest(a.ss, 1)')}
             / 1000000.0 AS centroid,
           CAST(r.rolloff_bin AS BIGINT) AS rolloff_bin,
           ({_half_up_sql(
               f'1000000 * (a.sln - {_AD_BINS} * a.l9)'
               f' + 100000000 * CAST({_AD_BINS} AS HUGEINT) * 1000000000',
               f'CAST({_AD_BINS} AS HUGEINT) * 1000000000')}
             - 100000000) / 1000000.0 AS log_flatness
    FROM agg2 a JOIN roll r ON r.vec_id = a.vec_id
    ORDER BY a.vec_id
    """


@query("q_audio_descriptors", oracle=_AD_ORACLE)
def q_audio_descriptors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X780 — audio spectral descriptors through the REAL audio path:
    each embedding quantizes to 64 int16 PCM samples, round-trips
    through a real RIFF/WAVE container (X495's codec), and the decoded
    samples feed a {_AD_BINS}-bin DFT whose energy SHARES (half-up
    micro integers) yield the three classic clip summaries:

    - spectral centroid  Σb·s_b / Σs_b — perceived brightness;
    - {_AD_ROLLOFF_PCT}% rolloff bin — the bandwidth cut audio
      curation filters low-quality/band-limited clips by;
    - log spectral flatness  mean(ln s_b) − ln(mean s_b) — tonality
      (≈0 for white noise, very negative for pure tones).

    Determinism: decoded samples are bit-exact integers; DFT terms
    quantize micro per term (X744 discipline); shares are exact
    half-up integers; ln(share) terms quantize 1e-9 before the
    integer sum; rolloff is an exact integer-inequality scan.

    Scale: one encode hop + one decode/DFT hop inside mapInPandas —
    per-row independent, Arrow-batched, no shuffle; descriptor rows
    are clip-grain."""
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

    def _q6(x: float) -> int:
        """round-half-away-from-zero(1e6 * x) as exact int."""
        if x >= 0:
            return int(math.floor(1000000.0 * x + 0.5))
        return -int(math.floor(-1000000.0 * x + 0.5))

    def feats(batches):
        import pandas as pd

        for pdf in batches:
            out = {
                "vec_id": [],
                "centroid": [],
                "rolloff_bin": [],
                "log_flatness": [],
            }
            for vec_id, smp in zip(pdf["vec_id"], pdf["smp"]):
                payload = encode_wav(
                    [int(s) for s in smp[:64]], sample_rate=8000
                )
                _rate, _ch, samples = decode_wav(payload)
                energies = []
                for b in range(1, _AD_BINS + 1):
                    re6 = im6 = 0
                    for t, s in enumerate(samples):
                        ang = 2.0 * math.pi * b * t / 64.0
                        re6 += _q6(s * math.cos(ang))
                        im6 += _q6(s * math.sin(ang))
                    energies.append(re6 * re6 + im6 * im6)
                te = max(sum(energies), 1)
                shares = [
                    (2 * (1000000 * e) + te) // (2 * te) for e in energies
                ]
                ss = sum(shares)
                sbs = sum(
                    (i + 1) * s for i, s in enumerate(shares)
                )
                sln = sum(
                    int(
                        math.floor(1e9 * math.log(max(s, 1)) + 0.5)
                    )
                    for s in shares
                )
                cum = 0
                rolloff = _AD_BINS
                for i, s in enumerate(shares):
                    cum += s
                    if 100 * cum >= _AD_ROLLOFF_PCT * ss:
                        rolloff = i + 1
                        break
                l9 = int(
                    math.floor(1e9 * math.log(ss / _AD_BINS) + 0.5)
                )
                den_c = max(ss, 1)
                c6 = (2 * (1000000 * sbs) + den_c) // (2 * den_c)
                # shift the numerator positive before the half-up
                # division: floor (Python //) and truncate-toward-zero
                # (DuckDB //) agree only for non-negative numerators
                den_f = _AD_BINS * 1000000000
                num_f = (
                    1000000 * (sln - _AD_BINS * l9) + 100000000 * den_f
                )
                f6 = (2 * num_f + den_f) // (2 * den_f) - 100000000
                out["vec_id"].append(vec_id)
                out["centroid"].append(c6 / 1000000.0)
                out["rolloff_bin"].append(rolloff)
                out["log_flatness"].append(f6 / 1000000.0)
            yield pd.DataFrame(out)

    return quant.mapInPandas(
        feats,
        schema=(
            "vec_id long, centroid double, rolloff_bin long,"
            " log_flatness double"
        ),
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# X789 — audio resample (decimate-by-2) through the real WAV path
# ---------------------------------------------------------------------------

_RS_SHIFT = 65536  # numerator shift: keeps the half-up division positive

_RS_ORACLE = f"""
    WITH smp AS (
      SELECT vec_id, t.t,
             least(greatest(CAST(round(
               CAST(embedding[t.t + 1] AS DOUBLE) * 32767.0) AS BIGINT),
               -32768), 32767) AS s
      FROM (SELECT * FROM embeddings WHERE len(embedding) >= 64) e
      CROSS JOIN (SELECT unnest(range(64)) AS t) t),
    pairs AS (
      SELECT a.vec_id, a.t // 2 AS j,
             ((2 * (a.s + b.s + 2 * {_RS_SHIFT}) + 2) // 4)
               - {_RS_SHIFT} AS o
      FROM smp a JOIN smp b
        ON b.vec_id = a.vec_id AND b.t = a.t + 1
      WHERE a.t % 2 = 0)
    SELECT vec_id, CAST(count(*) AS BIGINT) AS n_out,
           CAST(4000 AS BIGINT) AS rate_out,
           CAST(sum((j + 1) * o) AS BIGINT) AS checksum,
           CAST(min(o) AS BIGINT) AS s_min,
           CAST(max(o) AS BIGINT) AS s_max
    FROM pairs GROUP BY vec_id ORDER BY vec_id
    """


@query("q_audio_resample", oracle=_RS_ORACLE)
def q_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X789 — audio RESAMPLE through the real codec path, completing
    the mandate's decode / feature-extract / resize(resample) /
    frame-sample quartet for audio (X305 is the image resize twin):
    each clip round-trips 8 kHz WAV → decode → anti-alias 2-tap mean →
    decimate by 2 → RE-ENCODE at 4 kHz → decode again; the output pins
    the resampled stream with a positional checksum Σ(j+1)·s′_j plus
    range stats, so a hash match certifies BOTH codec passes and the
    resampler arithmetic (the oracle recomputes the identical
    arithmetic from the quantization, bypassing the container — the
    X483/X495 arithmetic-oracle pattern).

    Exactness: the 2-tap mean is a shifted-positive half-up integer
    division (floor-vs-truncate divergence neutralized, the X780
    lesson); all stats are exact integers.

    Scale: per-clip independent mapInPandas — two encode hops, two
    decode hops, no shuffle."""
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

    def resample(batches):
        import pandas as pd

        for pdf in batches:
            out = {
                "vec_id": [],
                "n_out": [],
                "rate_out": [],
                "checksum": [],
                "s_min": [],
                "s_max": [],
            }
            for vec_id, smp in zip(pdf["vec_id"], pdf["smp"]):
                payload = encode_wav(
                    [int(s) for s in smp[:64]], sample_rate=8000
                )
                rate, _ch, samples = decode_wav(payload)
                assert rate == 8000
                low = [
                    (
                        2 * (samples[2 * j] + samples[2 * j + 1]
                             + 2 * _RS_SHIFT) + 2
                    )
                    // 4
                    - _RS_SHIFT
                    for j in range(len(samples) // 2)
                ]
                payload2 = encode_wav(low, sample_rate=4000)
                rate2, _ch2, out_s = decode_wav(payload2)
                out["vec_id"].append(vec_id)
                out["n_out"].append(len(out_s))
                out["rate_out"].append(rate2)
                out["checksum"].append(
                    sum((j + 1) * s for j, s in enumerate(out_s))
                )
                out["s_min"].append(min(out_s))
                out["s_max"].append(max(out_s))
            yield pd.DataFrame(out)

    return quant.mapInPandas(
        resample,
        schema=(
            "vec_id long, n_out long, rate_out long, checksum long,"
            " s_min long, s_max long"
        ),
    ).orderBy("vec_id")
