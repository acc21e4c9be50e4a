"""Round-11 batch E (X756–X759): multimodal quality, template mining,
index-routed sampling, and pipeline reconciliation.

Reference scope note: §2.13 mandate extensions, reference-free.

- X756 q_image_contrast: luminance/contrast/clipping statistics
  through the REAL JPEG encode→decode path (the exposure-quality
  filter a multimodal curation pipeline runs right after decode).
- X757 q_template_positions: positional token entropy per source —
  the boilerplate-template detector (a low-entropy position means
  every document from that source carries the same token there).
- X758 q_cluster_quota_sample: cluster-balanced (quota) sampling
  routed through the PERSISTED IVF index (X748) — the
  diversity-preserving downsample used to cap dominant modes.
- X759 q_xor_reconcile: incremental-vs-full pipeline reconciliation
  via per-bucket XOR digests of row hashes — the cheap
  order-independent audit that an incremental ingestion path
  produced exactly the rows a full recompute would.

Determinism: image levels quantize through the bit-exact quality-100
JPEG round-trip (X483 construction); entropies quantize c·ln(c) to
1e-9 integers before summing (the q_taylor_law discipline); sampling
ranks and row digests use the portable 60-bit md5 hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as _text
from ..functions.hashing import token_hash, token_hash_sql
from ..session import default_parallelism
from ..sources.tables import load
from .registry import query
from .round9b import _half_up_sql

# ---------------------------------------------------------------------------
# X756 — luminance / contrast / clipping stats through the real JPEG path
# ---------------------------------------------------------------------------

_IC_LO, _IC_HI = 5, 250  # clipping thresholds on the 0..255 luma scale

_IC_ORACLE = f"""
    WITH lv AS (
      SELECT vec_id, i.i,
             least(greatest(CAST(round(
               (CAST(embedding[i.i + 1] AS DOUBLE) + 1.0)
               * 127.5) AS BIGINT), 0), 255) AS g
      FROM (SELECT * FROM embeddings WHERE len(embedding) >= 64) e
      CROSS JOIN (SELECT unnest(range(64)) AS i) i),
    agg AS (
      SELECT vec_id,
             CAST(sum(g) AS BIGINT) AS sg,
             CAST(sum(g * g) AS BIGINT) AS sg2,
             CAST(max(g) - min(g) AS BIGINT) AS dyn_range,
             CAST(sum(CASE WHEN g <= {_IC_LO} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_under,
             CAST(sum(CASE WHEN g >= {_IC_HI} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_over
      FROM lv GROUP BY vec_id)
    SELECT vec_id,
           {_half_up_sql('1000 * sg', '64')} / 1000.0 AS mean_luma,
           round(sqrt((64.0 * sg2 - CAST(sg AS DOUBLE) * sg) / 4096.0), 6)
             AS rms_contrast,
           dyn_range, n_under, n_over
    FROM agg ORDER BY vec_id
    """


@query("q_image_contrast", oracle=_IC_ORACLE)
def q_image_contrast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X756 — exposure-quality statistics through the REAL image path:
    each embedding becomes a 64×64 constant-block JPEG (the X483
    construction), round-trips the bit-exact quality-100 baseline
    codec, average-pools back to the 8×8 level grid, and reports the
    curation screens run right after decode — mean luminance, RMS
    contrast (population σ of levels), dynamic range, and under/over-
    exposure clipping counts (≤{_IC_LO} / ≥{_IC_HI}).  Low-contrast
    and clipped images are the first drops in a multimodal quality
    funnel.  The oracle recomputes every statistic arithmetically
    from the quantized levels — a hash match proves encoder, decoder,
    pooling, and the moment math agree exactly.

    Scale: one Arrow-batched encode hop + one decode/pool hop,
    per-row independent, no shuffle; integer moments out."""
    from ..operators.jpeg import decode_jpeg, encode_jpeg

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
        import math

        import pandas as pd

        from decimal import ROUND_HALF_UP, Decimal

        for pdf in batches:
            out = {
                "vec_id": [],
                "mean_luma": [],
                "rms_contrast": [],
                "dyn_range": [],
                "n_under": [],
                "n_over": [],
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
                levels = []
                for br in range(8):
                    for bc in range(8):
                        s = 0
                        for yy in range(br * 8, br * 8 + 8):
                            for xx in range(bc * 8, bc * 8 + 8):
                                s += decoded[(yy * w + xx) * 3]
                        levels.append((2 * s + 64) // 128)  # half-up /64
                sg = sum(levels)
                sg2 = sum(g * g for g in levels)
                # half-up(1000·sg / 64) in exact integers (_half_up_sql)
                mean_milli = (2 * 1000 * sg + 64) // 128
                out["vec_id"].append(vec_id)
                out["mean_luma"].append(mean_milli / 1000.0)
                out["rms_contrast"].append(
                    float(
                        Decimal(
                            repr(
                                math.sqrt((64.0 * sg2 - float(sg) * sg) / 4096.0)
                            )
                        ).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP)
                    )
                )
                out["dyn_range"].append(max(levels) - min(levels))
                out["n_under"].append(
                    sum(1 for g in levels if g <= _IC_LO)
                )
                out["n_over"].append(
                    sum(1 for g in levels if g >= _IC_HI)
                )
            yield pd.DataFrame(out)

    return quant.mapInPandas(
        feats,
        schema=(
            "vec_id long, mean_luma double, rms_contrast double, "
            "dyn_range long, n_under long, n_over long"
        ),
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# X757 — positional token entropy (boilerplate template detection)
# ---------------------------------------------------------------------------

_TP_POS = 8  # positions audited

_TP_ORACLE = f"""
    WITH tok AS (
      SELECT source, p.p, ts[p.p + 1] AS w
      FROM (SELECT source, {_text.tokens_sql('text')} AS ts
            FROM documents) d
      CROSS JOIN (SELECT unnest(range({_TP_POS})) AS p) p
      WHERE len(ts) > p.p),
    cnt AS (
      SELECT source, p, w, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY source, p, w),
    ent AS (
      SELECT source, p,
             CAST(sum(c) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_distinct,
             CAST(sum(CAST(round(c * ln(c) * 1000000000) AS HUGEINT))
                  AS DOUBLE) / 1e9 AS sclc
      FROM cnt GROUP BY source, p)
    SELECT source, CAST(p AS BIGINT) AS pos, n, n_distinct,
           round(ln(n) - sclc / n, 6) AS entropy
    FROM ent ORDER BY source, pos
    """


@query("q_template_positions", oracle=_TP_ORACLE)
def q_template_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X757 — boilerplate-template detection via positional token
    entropy: for each source and token position p < {_TP_POS}, the
    Shannon entropy of the token distribution AT that position —
    H = ln(n) − (Σ c·ln c)/n.  A near-zero-entropy position means
    every document from the source starts with the same token there:
    the signature of injected boilerplate/templates that n-gram dedup
    misses (the tail differs) but which poisons a training mix.
    Complements X742's boilerplate-prefix detector (which finds the
    STRING; this measures the per-position determinism that flags a
    source for it).

    Exactness: c·ln(c) quantizes to 1e-9 integers before the
    vocabulary sum (the q_taylor_law order-independence discipline),
    so both engines fold identical numbers.

    Scale: one explode limited to {_TP_POS} leading positions per doc
    (NOT the whole text), one (source, pos, token) count shuffle with
    map-side combine, then a vocabulary-sized rollup."""
    d = load(spark, sf_dir, "documents").select(
        "source", _text.tokens(F.col("text")).alias("ts")
    )
    pos = spark.range(_TP_POS).select(F.col("id").cast("int").alias("p"))
    tok = (
        d.crossJoin(F.broadcast(pos))
        .filter(F.size("ts") > F.col("p"))
        .select(
            "source", "p", F.element_at("ts", F.col("p") + 1).alias("w")
        )
    )
    cnt = tok.groupBy("source", "p", "w").agg(F.count("*").alias("c"))
    dec = "decimal(38,0)"
    ent = cnt.groupBy("source", "p").agg(
        F.sum("c").alias("n"),
        F.count("*").alias("n_distinct"),
        (
            F.sum(
                F.round(F.col("c") * F.log("c") * 1e9).cast(dec)
            ).cast("double")
            / 1e9
        ).alias("sclc"),
    )
    return ent.select(
        "source",
        F.col("p").cast("long").alias("pos"),
        F.col("n").cast("long").alias("n"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.round(F.log("n") - F.col("sclc") / F.col("n"), 6).alias("entropy"),
    ).orderBy("source", "pos")


# ---------------------------------------------------------------------------
# X758 — cluster-balanced quota sampling via the persisted IVF index
# ---------------------------------------------------------------------------

_QS_QUOTA = 5

_QS_SQRT_EVERY_SQL = (
    "greatest(2, CAST(floor(sqrt(CAST((SELECT count(*) FROM corpus) "
    "AS DOUBLE))) AS BIGINT))"
)


def _qs_rank_sql() -> str:
    return token_hash_sql("concat(CAST(n_id AS VARCHAR), '#qs')")


_QS_ORACLE = f"""
    WITH corpus AS (
      SELECT vec_id AS n_id, embedding AS emb FROM embeddings),
    cent AS (
      SELECT n_id AS c_id, emb AS c_emb FROM corpus
      WHERE n_id % {_QS_SQRT_EVERY_SQL} = 0),
    assigned AS (
      SELECT n_id, centroid_id FROM (
        SELECT x.n_id, c.c_id AS centroid_id,
               row_number() OVER (PARTITION BY x.n_id
                 ORDER BY round(
                   {{cos}}, 6) DESC, c.c_id) AS arn
        FROM corpus x CROSS JOIN cent c)
      WHERE arn = 1),
    ranked AS (
      SELECT centroid_id, n_id,
             count(*) OVER (PARTITION BY centroid_id) AS cell_size,
             row_number() OVER (PARTITION BY centroid_id
               ORDER BY {_qs_rank_sql()}, n_id) AS rk
      FROM assigned)
    SELECT centroid_id, n_id AS vec_id, CAST(rk AS BIGINT) AS rk,
           CAST(cell_size AS BIGINT) AS cell_size
    FROM ranked WHERE rk <= {_QS_QUOTA}
    ORDER BY centroid_id, rk
    """


def _qs_oracle() -> str:
    from ..functions import vectors

    return _QS_ORACLE.replace(
        "{cos}", vectors.cosine_sql("x.emb", "c.c_emb")
    )


@query("q_cluster_quota_sample", oracle=_qs_oracle())
def q_cluster_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X758 — cluster-balanced quota sampling: route every vector to
    its IVF cell THROUGH THE PERSISTED INDEX (X748's
    ensure_embedding_index — the assignment is read, not recomputed),
    then keep a deterministic hash-ranked quota of {_QS_QUOTA} per
    cell — the diversity-preserving downsample that caps dominant
    modes (web boilerplate clusters) while guaranteeing every
    populated region of embedding space survives into the training
    mix (the SemDeDup/DSIR-style coverage complement).  cell_size is
    carried so downstream weighting can undo the cap.

    Scale: zero assignment cost at steady state (the index IS the
    cell mapping); the quota rank is one window per cell — cells are
    ~√n wide, so no partition exceeds the cell width.

    Oracle: replays the index contents (floor-√n modulus codebook +
    assignment) and the hash-ranked quota — pinning both the
    persisted layout and the sampling rule."""
    from .round11 import ensure_embedding_index

    idx = ensure_embedding_index(spark, sf_dir)
    assigned = spark.read.parquet(f"{idx}/assigned").select(
        F.col("centroid_id").cast("long").alias("centroid_id"), "n_id"
    )
    from pyspark.sql.window import Window as W

    rk_key = token_hash(
        F.concat(F.col("n_id").cast("string"), F.lit("#qs"))
    )
    ranked = assigned.select(
        "centroid_id",
        "n_id",
        F.count("*").over(W.partitionBy("centroid_id")).alias("cell_size"),
        F.row_number()
        .over(W.partitionBy("centroid_id").orderBy(rk_key, "n_id"))
        .alias("rk"),
    )
    return (
        ranked.filter(F.col("rk") <= _QS_QUOTA)
        .select(
            "centroid_id",
            F.col("n_id").alias("vec_id"),
            F.col("rk").cast("long").alias("rk"),
            F.col("cell_size").cast("long").alias("cell_size"),
        )
        .orderBy("centroid_id", "rk")
    )


# ---------------------------------------------------------------------------
# X759 — incremental-vs-full XOR-digest reconciliation
# ---------------------------------------------------------------------------

_XR_BUCKETS = 32


def _xr_rowhash_sql() -> str:
    return token_hash_sql(
        "concat(CAST(l_orderkey AS VARCHAR), '|', "
        "CAST(l_linenumber AS VARCHAR), '|', "
        "CAST(CAST(l_quantity AS BIGINT) AS VARCHAR), '|', l_returnflag)"
    )


_XR_ORACLE = f"""
    WITH h AS (
      SELECT l_orderkey % {_XR_BUCKETS} AS bucket,
             l_orderkey % 2 AS slice,
             {_xr_rowhash_sql()} AS rh
      FROM lineitem),
    full_scan AS (
      SELECT bucket, bit_xor(rh) AS digest, CAST(count(*) AS BIGINT) AS n
      FROM h GROUP BY bucket),
    slice0 AS (
      SELECT bucket, bit_xor(rh) AS d0, count(*) AS n0
      FROM h WHERE slice = 0 GROUP BY bucket),
    slice1 AS (
      SELECT bucket, bit_xor(rh) AS d1, count(*) AS n1
      FROM h WHERE slice = 1 GROUP BY bucket),
    incr AS (
      SELECT coalesce(s0.bucket, s1.bucket) AS bucket,
             xor(coalesce(s0.d0, 0), coalesce(s1.d1, 0)) AS digest,
             CAST(coalesce(s0.n0, 0) + coalesce(s1.n1, 0) AS BIGINT) AS n
      FROM slice0 s0 FULL JOIN slice1 s1 ON s1.bucket = s0.bucket)
    SELECT f.bucket, f.digest AS digest_full, i.digest AS digest_incr,
           f.n AS n_full, i.n AS n_incr,
           CAST(f.digest = i.digest AND f.n = i.n AS BIGINT) AS consistent
    FROM full_scan f JOIN incr i ON i.bucket = f.bucket
    ORDER BY f.bucket
    """


@query("q_xor_reconcile", oracle=_XR_ORACLE)
def q_xor_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X759 — incremental-vs-full reconciliation via XOR digests: hash
    every row to a 60-bit integer, XOR within {_XR_BUCKETS} buckets,
    and compare the digests a FULL recompute produces against an
    INCREMENTAL path that unions per-slice digests (XOR is
    commutative/associative with identity 0, so slice digests compose
    order-free — the property that makes this THE cheap audit for
    incremental ingestion: any dropped, duplicated, or mutated row
    flips its bucket's digest).  Row counts ride along to catch the
    one case XOR can't (a row ingested twice XORs out).

    Scale: two aggregation passes over the fact table, both
    combinable map-side into {_XR_BUCKETS} integers — digest state is
    constant-size however large the table, and per-slice digests are
    exactly what an incremental pipeline stores per batch."""
    li = load(spark, sf_dir, "lineitem")
    h = li.select(
        (F.col("l_orderkey") % _XR_BUCKETS).alias("bucket"),
        (F.col("l_orderkey") % 2).alias("slice"),
        token_hash(
            F.concat_ws(
                "|",
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
                F.col("l_quantity").cast("long").cast("string"),
                F.col("l_returnflag"),
            )
        ).alias("rh"),
    )
    full_scan = h.groupBy("bucket").agg(
        F.bit_xor("rh").alias("digest_full"),
        F.count("*").alias("n_full"),
    )
    slices = (
        h.groupBy("bucket", "slice")
        .agg(F.bit_xor("rh").alias("d"), F.count("*").alias("n"))
        .groupBy("bucket")
        .agg(
            F.bit_xor("d").alias("digest_incr"),
            F.sum("n").alias("n_incr"),
        )
    )
    return (
        full_scan.join(slices, "bucket")
        .select(
            "bucket",
            "digest_full",
            "digest_incr",
            F.col("n_full").cast("long").alias("n_full"),
            F.col("n_incr").cast("long").alias("n_incr"),
            (
                (F.col("digest_full") == F.col("digest_incr"))
                & (F.col("n_full") == F.col("n_incr"))
            )
            .cast("long")
            .alias("consistent"),
        )
        .orderBy("bucket")
    )
