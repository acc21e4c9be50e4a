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

from pyspark.sql import DataFrame, SparkSession, Window
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


# ---------------------------------------------------------------------------
# X484 — point-in-time join to a versioned (SCD2-style) dimension
# ---------------------------------------------------------------------------


@query(
    "q_pit_join",
    oracle="""
    WITH hist AS (
      SELECT o_custkey, o_orderdate, o_orderkey,
             round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS cum_spend
      FROM orders
    ), vers AS (
      SELECT o_custkey AS custkey,
             CASE WHEN cum_spend < 100000 THEN 'bronze'
                  WHEN cum_spend < 300000 THEN 'silver'
                  ELSE 'gold' END AS tier,
             o_orderdate AS valid_from,
             coalesce(lead(o_orderdate) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey),
               TIMESTAMP '9999-12-31') AS valid_to
      FROM hist
    )
    SELECT v.tier, count(*) AS n_items,
           round(sum(l.l_extendedprice), 2) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN vers v ON v.custkey = o.o_custkey
              AND v.valid_from <= l.l_shipdate
              AND l.l_shipdate < v.valid_to
    GROUP BY v.tier
    """,
)
def q_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X484 — point-in-time (temporal) join: every lineitem joins the
    customer-tier VERSION that was valid at its ship date — the
    correctness-critical pattern for joining facts to an SCD2 dimension
    (X75 builds such dimensions; this query consumes one).  The
    versioned dimension is derived inline: running customer spend
    (rounded to cents BEFORE tiering so both engines branch
    identically) buckets into bronze/silver/gold, each order opening a
    version [orderdate, next orderdate); same-date re-orders produce
    empty intervals that the range predicate drops — latest state wins.

    Scale: the dimension is versions-per-customer (small — dimension
    churn, not fact volume); the PIT join is an equi-join on custkey
    with a residual range predicate, so it hash-partitions on the
    customer key like any other dim join — no interval explosion,
    because versions of ONE customer are disjoint and each fact row
    matches exactly one."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    cum = F.round(
        F.sum("o_totalprice").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
        2,
    )
    vers = o.select(
        F.col("o_custkey").alias("custkey"),
        F.when(cum < 100000, "bronze")
        .when(cum < 300000, "silver")
        .otherwise("gold")
        .alias("tier"),
        F.col("o_orderdate").alias("valid_from"),
        F.coalesce(
            F.lead("o_orderdate").over(w),
            F.lit("9999-12-31").cast("timestamp"),
        ).alias("valid_to"),
    )
    facts = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_custkey", "l_shipdate", "l_extendedprice"
    )
    joined = facts.join(
        vers,
        (vers.custkey == facts.o_custkey)
        & (vers.valid_from <= facts.l_shipdate)
        & (facts.l_shipdate < vers.valid_to),
    )
    return joined.groupBy("tier").agg(
        F.count("*").alias("n_items"),
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# X485 — embedding-space benchmark decontamination
# ---------------------------------------------------------------------------

from ..functions import vectors  # noqa: E402

#: cosine threshold for semantic contamination (same calibrated 0.4 as
#: the SemDeDup family on this synthetic embedding space)
_CONTAM_TAU = 0.4


@query(
    "q_embedding_decontaminate",
    oracle=f"""
    WITH bench AS (
      SELECT vec_id AS bench_id, embedding FROM embeddings
      WHERE vec_id < 50
    ), corpus AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 50
    ), scored AS (
      SELECT c.vec_id, b.bench_id,
             round({vectors.cosine_sql('c.embedding', 'b.embedding')}, 6)
               AS cos_r,
             row_number() OVER (
               PARTITION BY c.vec_id
               ORDER BY round(
                 {vectors.cosine_sql('c.embedding', 'b.embedding')}, 6)
                 DESC, b.bench_id) AS rn
      FROM corpus c CROSS JOIN bench b
    )
    SELECT vec_id, cos_r AS max_cos, cos_r >= {_CONTAM_TAU} AS contaminated,
           CASE WHEN cos_r >= {_CONTAM_TAU} THEN bench_id END
             AS nearest_bench
    FROM scored WHERE rn = 1
    """,
)
def q_embedding_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X485 — SEMANTIC benchmark decontamination: X90 removes training
    docs that share n-grams with a benchmark, but paraphrased
    contamination survives lexical checks — the standard countermeasure
    is embedding similarity against the benchmark set.  Corpus vectors
    whose max cosine to any benchmark vector (here: vec_id < 50 stands
    in as the held-out benchmark) clears tau are flagged, with the
    nearest benchmark item recorded for audit (ties: lowest id at the
    rounded similarity).

    Scale: benchmark sets are tiny relative to a corpus (thousands vs
    billions), so the benchmark side BROADCASTS and the scan is one
    map-side pass over the corpus — no shuffle at all; at extreme
    corpus sizes the q_ann_ivf coarse quantizer prefilters candidates
    and only near-centroid pairs evaluate the exact cosine."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    bench = e.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("bench_id"), F.col("emb").alias("bemb")
    )
    corpus = e.filter(F.col("vec_id") >= 50)
    cos_r = F.round(
        vectors.dot(F.col("emb"), F.col("bemb"))
        / (vectors.norm(F.col("emb")) * vectors.norm(F.col("bemb"))),
        6,
    )
    scored = corpus.crossJoin(F.broadcast(bench)).select(
        "vec_id", "bench_id", cos_r.alias("cos_r")
    )
    best = scored.groupBy("vec_id").agg(
        F.max("cos_r").alias("max_cos"),
        F.min_by(
            "bench_id", F.struct((-F.col("cos_r")).alias("nc"), "bench_id")
        ).alias("arg_bench"),
    )
    contaminated = F.col("max_cos") >= F.lit(_CONTAM_TAU)
    return best.select(
        "vec_id",
        "max_cos",
        contaminated.alias("contaminated"),
        F.when(contaminated, F.col("arg_bench")).alias("nearest_bench"),
    )


# ---------------------------------------------------------------------------
# X486 — token-budget epoch allocation (data-constrained scaling)
# ---------------------------------------------------------------------------


@query(
    "q_epoch_allocation",
    oracle="""
    WITH src AS (
      SELECT source,
             sum(len(list_filter(string_split(text, ' '), t -> t <> '')))
               AS n_tokens
      FROM documents GROUP BY source
    ), tot AS (
      SELECT sum(n_tokens) AS total, count(*) AS n_sources FROM src
    )
    SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
           round(n_tokens * 1.0 / total, 6) AS corpus_share,
           round(least(4.0, (2.0 * total / n_sources) / n_tokens), 6)
             AS epochs,
           CAST(floor(n_tokens
                      * least(4.0, (2.0 * total / n_sources) / n_tokens))
                AS BIGINT) AS effective_tokens,
           ((2.0 * total / n_sources) / n_tokens) > 4.0 AS starved
    FROM src CROSS JOIN tot
    """,
)
def q_epoch_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X486 — token-budget epoch allocation under a repetition cap
    (data-constrained scaling, Muennighoff et al. 2023,
    arXiv:2305.16264: repeating data beyond ~4 epochs returns almost
    nothing): given a training budget of 2x the corpus (uniform target
    share per source), each source gets epochs = min(4, budget_share /
    its tokens); sources whose fair share exceeds the 4-epoch cap are
    flagged STARVED — the signal to go collect more of that source
    rather than repeat it. Complements X92 (mixture sampling) and X229
    (temperature weights): those decide proportions, this decides
    repetition. One rollup + a broadcast scalar; pure map arithmetic."""
    d = load(spark, sf_dir, "documents")
    toks = F.size(F.filter(F.split("text", " "), lambda t: t != ""))
    src = d.groupBy("source").agg(F.sum(toks).alias("n_tokens"))
    tot = src.agg(
        F.sum("n_tokens").alias("total"), F.count("*").alias("n_sources")
    )
    fair = (2.0 * F.col("total") / F.col("n_sources")) / F.col("n_tokens")
    epochs = F.least(F.lit(4.0), fair)
    return src.crossJoin(F.broadcast(tot)).select(
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.col("n_tokens") * 1.0 / F.col("total"), 6).alias(
            "corpus_share"
        ),
        F.round(epochs, 6).alias("epochs"),
        F.floor(F.col("n_tokens") * epochs).cast("long").alias(
            "effective_tokens"
        ),
        (fair > 4.0).alias("starved"),
    )


# ---------------------------------------------------------------------------
# X487 — DSIR hashed-ngram importance weights
# ---------------------------------------------------------------------------

from ..functions.hashing import token_hash, token_hash_sql  # noqa: E402

_DSIR_B = 256  # hash-feature buckets


@query(
    "q_dsir_weights",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(list_filter(string_split(text, ' '), t -> t <> ''))
               AS t
      FROM documents
    ), bucketed AS (
      SELECT doc_id, lang,
             {token_hash_sql('t')} % {_DSIR_B} AS b
      FROM toks
    ), raw AS (
      SELECT b, count(*) AS cr FROM bucketed GROUP BY b
    ), tgt AS (
      SELECT b, count(*) AS ct FROM bucketed WHERE lang = 'en' GROUP BY b
    ), tot AS (
      SELECT (SELECT sum(cr) FROM raw) AS R, (SELECT sum(ct) FROM tgt) AS T
    ), stats AS (
      SELECT raw.b,
             ln((coalesce(ct, 0) + 1.0) / (T + {_DSIR_B}))
               - ln((cr + 1.0) / (R + {_DSIR_B})) AS logratio
      FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN tot
    )
    SELECT k.doc_id, CAST(count(*) AS BIGINT) AS n_tok,
           round(sum(s.logratio), 6) AS dsir_sum,
           round(sum(s.logratio) / count(*), 6) AS dsir_avg
    FROM bucketed k JOIN stats s ON k.b = s.b
    GROUP BY k.doc_id
    """,
)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X487 — DSIR data-selection importance weights (Xie et al. 2023,
    arXiv:2302.03169): hashed unigram features (portable md5 hash →
    256 buckets), bag-of-buckets models for the TARGET domain (lang =
    'en' stands in) and the RAW corpus with add-1 smoothing, and each
    document scored by the summed log-likelihood ratio of its buckets
    — the importance weight DSIR resamples by to tilt a raw corpus
    toward a target domain without training a classifier.  Both the
    length-dependent sum and the per-token average are emitted.

    Scale: two combinable bucket rollups (256 rows — broadcast), one
    map-side join back to the token stream, one per-doc fold; nothing
    pairwise anywhere, the whole plan is ~two scans of the token
    stream. At 100 TB the bucket table is still 256 rows."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.explode(F.filter(F.split("text", " "), lambda t: t != "")).alias(
            "t"
        ),
    )
    bucketed = toks.select(
        "doc_id", "lang", (token_hash(F.col("t")) % _DSIR_B).alias("b")
    )
    raw = bucketed.groupBy("b").agg(F.count("*").alias("cr"))
    tgt = (
        bucketed.filter(F.col("lang") == "en")
        .groupBy("b")
        .agg(F.count("*").alias("ct"))
    )
    tot = raw.agg(F.sum("cr").alias("R")).crossJoin(
        tgt.agg(F.sum("ct").alias("T"))
    )
    stats = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + 1.0)
                    / (F.col("T") + _DSIR_B)
                )
                - F.log((F.col("cr") + 1.0) / (F.col("R") + _DSIR_B))
            ).alias("logratio"),
        )
    )
    return (
        bucketed.join(F.broadcast(stats), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tok"),
            F.round(F.sum("logratio"), 6).alias("dsir_sum"),
            F.round(F.sum("logratio") / F.count("*"), 6).alias("dsir_avg"),
        )
    )


# ---------------------------------------------------------------------------
# X488 — intra-document repetition audit
# ---------------------------------------------------------------------------


@query(
    "q_intra_doc_repetition",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), t -> t <> '') AS tk
      FROM documents
    ), grams AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(tk) - 1),
               i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])) AS g
      FROM toks
    ), cnt AS (
      SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g
    )
    SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
           CAST(count(*) AS BIGINT) AS distinct_grams,
           round(1.0 - count(*) * 1.0 / sum(c), 6) AS rep_ratio,
           CAST(max(c) AS BIGINT) AS max_gram_count
    FROM cnt GROUP BY doc_id
    """,
)
def q_intra_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X488 — WITHIN-document repetition audit: the trigram repetition
    ratio (1 − distinct/total) and the hottest trigram count per doc —
    the standard screen for looped/boilerplate text (degenerate
    generation, scraped templates), complementing X91's CORPUS-level
    duplicate-n-gram fraction: a doc can be globally unique yet
    internally degenerate, and repetition-heavy docs are dropped before
    training. Docs under 3 tokens have no trigrams and are excluded in
    both engines (empty gram list unnests to nothing).

    Scale: trigrams stay (doc_id, gram)-keyed — the shuffle is
    partitioned by doc, never global; one count + one per-doc fold."""
    d = load(spark, sf_dir, "documents")
    tk = F.filter(F.split("text", " "), lambda t: t != "")
    n = F.size(tk)
    grams = F.when(
        n >= 3,
        F.transform(
            F.slice(tk, 1, n - 2),
            lambda x, i: F.concat_ws(
                " ",
                x,
                F.element_at(tk, i + 2),
                F.element_at(tk, i + 3),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    cnt = (
        d.select("doc_id", F.explode(grams).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
    )
    return cnt.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_grams"),
        F.count("*").cast("long").alias("distinct_grams"),
        F.round(1.0 - F.count("*") * 1.0 / F.sum("c"), 6).alias("rep_ratio"),
        F.max("c").cast("long").alias("max_gram_count"),
    )


# ---------------------------------------------------------------------------
# X489 — file-skipping statistics (zone-map pruning audit)
# ---------------------------------------------------------------------------


@query(
    "q_file_skipping",
    oracle="""
    WITH stats AS (
      SELECT CAST(floor(event_id / 256) AS BIGINT) AS file_id,
             min(ts) AS ts_min, max(ts) AS ts_max,
             min(value) AS v_min, max(value) AS v_max,
             count(*) AS n_rows
      FROM events GROUP BY 1
    ), preds AS (
      SELECT 'ts_tail' AS predicate, ts_max >= TIMESTAMP '2024-01-25' AS scanned, n_rows FROM stats
      UNION ALL
      SELECT 'value_high', v_max >= 400.0, n_rows FROM stats
      UNION ALL
      SELECT 'ts_band',
             ts_max >= TIMESTAMP '2024-01-10'
               AND ts_min < TIMESTAMP '2024-01-12', n_rows FROM stats
    ), matched AS (
      SELECT 'ts_tail' AS predicate,
             count(*) FILTER (WHERE ts >= TIMESTAMP '2024-01-25') AS rows_matched
      FROM events
      UNION ALL
      SELECT 'value_high', count(*) FILTER (WHERE value >= 400.0) FROM events
      UNION ALL
      SELECT 'ts_band',
             count(*) FILTER (WHERE ts >= TIMESTAMP '2024-01-10'
                                AND ts < TIMESTAMP '2024-01-12')
      FROM events
    )
    SELECT p.predicate, CAST(count(*) AS BIGINT) AS n_files,
           CAST(count(*) FILTER (WHERE NOT scanned) AS BIGINT)
             AS files_skipped,
           CAST(coalesce(sum(n_rows) FILTER (WHERE scanned), 0) AS BIGINT)
             AS rows_scanned,
           CAST(min(m.rows_matched) AS BIGINT) AS rows_matched,
           round(count(*) FILTER (WHERE NOT scanned) * 1.0 / count(*), 6)
             AS skip_ratio
    FROM preds p JOIN matched m ON p.predicate = m.predicate
    GROUP BY p.predicate
    """,
)
def q_file_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X489 — zone-map file-skipping audit: per-file min/max statistics
    (files simulated as 256-row write-order chunks of events — the
    stand-in for parquet row-group/file footers) evaluated against a
    fixed predicate set, reporting how many files each predicate can
    PRUNE without reading and how many rows the surviving files
    contain vs the rows that actually match.  This is the measurement
    behind every layout decision the engine ships (X93 Z-order, X281
    Hilbert, X149 compaction): skip_ratio near the row selectivity
    means the layout clusters the predicate column well; skip_ratio
    near 0 with low selectivity means the column is scattered and a
    re-cluster pays for itself.  At 100 TB these stats come free from
    the parquet footers; the audit is one metadata-sized aggregate."""
    e = load(spark, sf_dir, "events")
    stats = e.groupBy(
        F.floor(F.col("event_id") / 256).cast("long").alias("file_id")
    ).agg(
        F.min("ts").alias("ts_min"),
        F.max("ts").alias("ts_max"),
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
        F.count("*").alias("n_rows"),
    )
    t25 = F.lit("2024-01-25").cast("timestamp")
    t10 = F.lit("2024-01-10").cast("timestamp")
    t12 = F.lit("2024-01-12").cast("timestamp")
    preds = [
        ("ts_tail", F.col("ts_max") >= t25, F.col("ts") >= t25),
        ("value_high", F.col("v_max") >= 400.0, F.col("value") >= 400.0),
        (
            "ts_band",
            (F.col("ts_max") >= t10) & (F.col("ts_min") < t12),
            (F.col("ts") >= t10) & (F.col("ts") < t12),
        ),
    ]
    out = None
    for name, file_pred, row_pred in preds:
        m = e.agg(
            F.count(F.when(row_pred, 1)).cast("long").alias("rows_matched")
        )
        agg = stats.agg(
            F.count("*").cast("long").alias("n_files"),
            F.count(F.when(~file_pred, 1)).cast("long").alias(
                "files_skipped"
            ),
            F.coalesce(F.sum(F.when(file_pred, F.col("n_rows"))), F.lit(0))
            .cast("long")
            .alias("rows_scanned"),
            F.round(
                F.count(F.when(~file_pred, 1)) * 1.0 / F.count("*"), 6
            ).alias("skip_ratio"),
        ).crossJoin(m)
        row = agg.select(
            F.lit(name).alias("predicate"),
            "n_files",
            "files_skipped",
            "rows_scanned",
            "rows_matched",
            "skip_ratio",
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# X490 — Weisfeiler-Lehman graph fingerprint
# ---------------------------------------------------------------------------

from .graph_ext import _EDGES_SQL, _edges  # noqa: E402


def _wl_round_sql(prev: str, out: str) -> str:
    """One WL relabeling round: new label = portable hash of
    'own|sorted neighbor labels' (md5-derived, identical in Spark)."""
    sig = (
        f"CAST({prev}.lbl AS VARCHAR) || '|' || "
        "array_to_string(list(nb.lbl ORDER BY nb.lbl), ',')"
    )
    return f"""{out} AS (
      SELECT {prev}.a, {token_hash_sql(f"({sig})")} AS lbl
      FROM {prev}
      JOIN sym ON sym.a = {prev}.a
      JOIN {prev} nb ON nb.a = sym.b
      GROUP BY {prev}.a, {prev}.lbl)"""


@query(
    "q_wl_colors",
    oracle=f"""
    WITH {_EDGES_SQL},
    deg AS (SELECT a, count(*) AS lbl FROM sym GROUP BY a),
    {_wl_round_sql('deg', 'wl1')},
    {_wl_round_sql('wl1', 'wl2')}
    SELECT lbl AS color, CAST(count(*) AS BIGINT) AS n_vertices
    FROM wl2 GROUP BY lbl
    """,
)
def q_wl_colors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X490 — Weisfeiler-Lehman color refinement (2 rounds) over the
    shipment graph: labels start as degrees, and each round every
    vertex's label becomes a portable hash of (own label | sorted
    neighbor labels). The final color histogram is the WL fingerprint
    — the standard graph-isomorphism invariant and the feature map of
    WL graph kernels; two snapshots of a pipeline's relationship graph
    can be compared for structural drift by comparing these histograms
    (the graph-shaped complement of X115's distribution PSI).

    Scale: each round is one edge-keyed join + one vertex-keyed
    hash-agg (sort_array over per-vertex neighbor label lists — list
    width = degree, bounded by the same hub discipline as X379);
    rounds are a fixed constant. The md5-derived label hash is the
    engine's portable token_hash, so the DuckDB oracle replays the
    identical relabeling."""
    sym = _edges(spark, sf_dir).persist()
    labels = sym.groupBy("a").agg(F.count("*").alias("lbl"))
    for _ in range(2):
        neigh = sym.join(
            labels.select(F.col("a").alias("b"), F.col("lbl").alias("nlbl")),
            "b",
        ).select("a", "nlbl")
        sigs = neigh.groupBy("a").agg(
            F.array_join(
                F.array_sort(F.collect_list("nlbl")), ","
            ).alias("nsig")
        )
        labels = (
            labels.join(sigs, "a")
            .select(
                "a",
                token_hash(
                    F.concat_ws("|", F.col("lbl").cast("string"), "nsig")
                ).alias("lbl"),
            )
        )
    out = labels.groupBy(F.col("lbl").alias("color")).agg(
        F.count("*").cast("long").alias("n_vertices")
    )
    return out


# ---------------------------------------------------------------------------
# X491 — Weibull reliability fit over inter-purchase gaps
# ---------------------------------------------------------------------------


@query(
    "q_weibull_fit",
    oracle="""
    WITH purch AS (
      SELECT user_id, ts,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS nxt
      FROM events WHERE event_type = 'purchase'
    ), gaps AS (
      SELECT round((epoch_us(nxt) - epoch_us(ts)) / 3600000000.0, 6)
               AS gap_h
      FROM purch WHERE nxt IS NOT NULL
        AND epoch_us(nxt) > epoch_us(ts)
    ), tot AS (SELECT count(*) AS n FROM gaps),
    dv AS (
      SELECT gap_h, count(*) AS c FROM gaps GROUP BY gap_h
    ), ranked AS (
      SELECT gap_h, c,
             sum(c) OVER (ORDER BY gap_h
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - c AS cum_less
      FROM dv
    ), pts AS (
      SELECT c,
             ln(gap_h) AS x,
             ln(-ln(1.0 - ((cum_less + (c + 1) / 2.0) - 0.3) / (n + 0.4)))
               AS y
      FROM ranked CROSS JOIN tot
    ), fit AS (
      SELECT sum(c) AS sw, sum(c * x) AS sx, sum(c * y) AS sy,
             sum(c * x * x) AS sxx, sum(c * x * y) AS sxy
      FROM pts
    )
    SELECT CAST(sw AS BIGINT) AS n_gaps,
           round((sw * sxy - sx * sy) / (sw * sxx - sx * sx), 6) AS shape_k,
           round(exp(-((sy - ((sw * sxy - sx * sy) / (sw * sxx - sx * sx))
                         * sx) / sw)
                     / ((sw * sxy - sx * sy) / (sw * sxx - sx * sx))), 6)
             AS scale_h
    FROM fit
    """,
)
def q_weibull_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X491 — Weibull reliability fit over inter-purchase gaps (the
    X292 series): median-rank regression, the standard closed-form
    estimator — plot ln(-ln(1-F_i)) against ln(t_i) with Bernard's
    approximation F_i = (i-0.3)/(n+0.4) and read shape k off the OLS
    slope, scale λ = exp(-intercept/k).  k < 1 means purchase hazard
    DECREASES with time since last purchase (lapsing users), k > 1
    means building momentum — the churn-model primitive under X198's
    nonparametric KM curve.

    Scale: ranks come from cumulative counts over the DISTINCT gap
    domain (ties get midranks), the ECOD/QTE discipline — no
    fact-table sort; the OLS is one weighted moment fold."""
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        e.select(
            "ts", F.lead("ts").over(w).alias("nxt")
        )
        .filter(
            F.col("nxt").isNotNull()
            & (F.unix_micros("nxt") > F.unix_micros("ts"))
        )
        .select(
            F.round(
                (F.unix_micros("nxt") - F.unix_micros("ts")) / 3.6e9, 6
            ).alias("gap_h")
        )
    )
    dv = gaps.groupBy("gap_h").agg(F.count("*").alias("c"))
    wcum = Window.orderBy("gap_h").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = dv.select(
        "gap_h", "c", (F.sum("c").over(wcum) - F.col("c")).alias("cum_less")
    )
    tot = gaps.agg(F.count("*").alias("n"))
    midrank = F.col("cum_less") + (F.col("c") + 1) / 2.0
    pts = ranked.crossJoin(F.broadcast(tot)).select(
        "c",
        F.log("gap_h").alias("x"),
        F.log(
            -F.log(1.0 - (midrank - 0.3) / (F.col("n") + 0.4))
        ).alias("y"),
    )
    fit = pts.agg(
        F.sum("c").alias("sw"),
        F.sum(F.col("c") * F.col("x")).alias("sx"),
        F.sum(F.col("c") * F.col("y")).alias("sy"),
        F.sum(F.col("c") * F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("c") * F.col("x") * F.col("y")).alias("sxy"),
    )
    slope = (F.col("sw") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("sw") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("sw")
    return fit.select(
        F.col("sw").cast("long").alias("n_gaps"),
        F.round(slope, 6).alias("shape_k"),
        F.round(F.exp(-intercept / slope), 6).alias("scale_h"),
    )
