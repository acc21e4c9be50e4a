"""Dataset-construction operators for LLM training pipelines.

Four operations every large-scale corpus build needs that the dedup /
quality families (llm_ext, textscale) don't yet cover:

* ``q_decontaminate`` — benchmark decontamination: flag corpus documents
  sharing any word 5-gram with a held-out benchmark set (the standard
  n-gram-overlap test-set-contamination check used by GPT-3/PaLM/Llama
  dataset reports). The benchmark here is a deterministic slice of the
  corpus (``doc_id % 97 = 0``) so the oracle can re-derive it.
* ``q_dup_ngram_fraction`` — per-document duplicate-n-gram fraction
  (share of a doc's distinct 5-grams appearing in ≥2 docs corpus-wide),
  the Gopher/RefinedWeb "repetition" signal at corpus rather than
  intra-doc granularity.
* ``q_dataset_mix`` — deterministic stratified sampling with per-source
  mixing weights (dataset mixture construction). Hash-threshold
  sampling, not ``rand()``: reproducible across engines, retries, and
  cluster sizes.
* ``q_zorder_layout`` — Z-order (Morton) clustering key over two scan
  dimensions, with per-bucket min/max ranges proving the locality that
  write-time layout clustering buys for file skipping.

Scale notes (100 TB):
- Benchmark gram sets are tiny (benchmarks are MBs, corpora are TBs) →
  the contamination check is a map-side broadcast semi-join; the corpus
  never shuffles. Here both sides derive from `documents`, so the
  broadcast is on the 1/97 slice.
- The duplicate-gram inverted index shuffles (gram, doc_id) pairs only;
  at production scale hash grams to int64 first (functions.hashing) so
  the shuffle carries 8-byte keys — kept as strings here so the oracle
  join is collision-free by construction.
- Mixing weights as integer basis-point thresholds on a portable hash:
  membership is a pure map-side filter, stable under repartitioning.
- Z-values are integer bit-interleaves; sorting by them at write time
  gives every file a bounding box in BOTH dimensions (the min/max
  columns this query emits are exactly the file-skipping statistics a
  lakehouse format would store).

Reference parity: the reference pipeline has no training-data layer —
these extend SURVEY.md §2.14's X-series (X90–X93).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import token_hash, token_hash_sql
from ..sources.tables import load
from .registry import query

#: words per shingle for the contamination / repetition checks
NGRAM = 5
#: benchmark slice: every 97th doc_id
BENCH_MOD = 97

_GRAMS_SQL = f"""(
  WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS w
             FROM documents),
  idx AS (SELECT doc_id, source, w,
                 unnest(generate_series(1, len(w) - {NGRAM - 1})) AS i
          FROM w)
  SELECT doc_id, source,
         array_to_string(w[i:i + {NGRAM - 1}], ' ') AS gram
  FROM idx)"""


def _grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    return grams_of(load(spark, sf_dir, "documents"))


def grams_of(docs: DataFrame) -> DataFrame:
    """(doc_id, source, gram) — one row per word 5-gram occurrence.

    ``sequence(1, size-4)`` would DESCEND for docs shorter than the
    shingle (Spark generates start-down-to-stop), so short docs are
    filtered out before the transform rather than guarded inside it.
    """
    d = docs.withColumn("w", F.split(F.col("text"), " "))
    return (
        d.filter(F.size("w") >= NGRAM)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(w) - {NGRAM - 1}),"
                    f" i -> concat_ws(' ', slice(w, i, {NGRAM})))"
                )
            ).alias("gram"),
        )
    )


@query(
    "q_decontaminate",
    oracle=f"""
    WITH g AS (SELECT * FROM {_GRAMS_SQL}),
    bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % {BENCH_MOD} = 0),
    probe AS (SELECT DISTINCT doc_id, source FROM documents
              WHERE doc_id % {BENCH_MOD} <> 0),
    hits AS (
      SELECT DISTINCT g.doc_id
      FROM g JOIN bench USING (gram)
      WHERE g.doc_id % {BENCH_MOD} <> 0)
    SELECT p.source,
           count(*) AS n_docs,
           count(h.doc_id) AS n_contaminated
    FROM probe p LEFT JOIN hits h ON p.doc_id = h.doc_id
    GROUP BY p.source
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per source, how many documents share at
    least one word 5-gram with the benchmark slice (``doc_id % 97 = 0``).

    Plan: benchmark grams are DISTINCT'd then broadcast — the corpus-side
    gram stream is filtered map-side by a broadcast LEFT SEMI join, so
    the only shuffle is the final per-source count. At 100 TB the
    benchmark side (real eval suites) is KBs–MBs of grams; the corpus
    never moves. Grams travel as xxhash64 longs: the broadcast table and
    every hash-probe compare 8 bytes, not five-word strings."""
    g = _grams(spark, sf_dir).withColumn("gram", F.xxhash64("gram"))
    bench = (
        g.filter(F.col("doc_id") % BENCH_MOD == 0).select("gram").distinct()
    )
    hits = (
        g.filter(F.col("doc_id") % BENCH_MOD != 0)
        .join(F.broadcast(bench), "gram", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    probe = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % BENCH_MOD != 0)
        .select("doc_id", "source")
    )
    return (
        probe.join(hits, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count("hit").alias("n_contaminated"),
        )
    )


@query(
    "q_dup_ngram_fraction",
    oracle=f"""
    WITH g AS (SELECT DISTINCT doc_id, source, gram FROM {_GRAMS_SQL}),
    df AS (SELECT gram, count(*) AS ndocs FROM g GROUP BY gram),
    per_doc AS (
      SELECT g.doc_id, g.source,
             count(*) AS n_grams,
             sum(CASE WHEN df.ndocs >= 2 THEN 1 ELSE 0 END) AS n_dup
      FROM g JOIN df USING (gram)
      GROUP BY g.doc_id, g.source)
    SELECT source,
           count(*) AS n_docs,
           round(avg(n_dup * 1.0 / n_grams), 6) AS avg_dup_frac,
           CAST(sum(CASE WHEN n_dup * 2 >= n_grams THEN 1 ELSE 0 END)
             AS BIGINT) AS n_docs_half_dup
    FROM per_doc GROUP BY source
    """,
)
def q_dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level duplicate-5-gram fraction per document, aggregated to
    source granularity: the repetition metric Gopher §A1.4 computes
    intra-document, lifted to "how much of this doc is boilerplate that
    exists elsewhere in the corpus".

    Plan: distinct (doc, gram) → gram document-frequency (partial agg,
    the inverted index) → join back → per-doc ratio → per-source avg.
    Two shuffles on the gram key. The gram is collapsed to xxhash64
    BEFORE the first exchange: gram identity is all the metric needs, so
    the shuffles carry 8-byte keys instead of ~30-byte five-word strings
    (the scale form the module docstring prescribes; a 64-bit space makes
    cross-gram collisions vanishingly rare at any corpus size)."""
    g = (
        _grams(spark, sf_dir)
        .select("doc_id", "source", F.xxhash64("gram").alias("gram"))
        .distinct()
    )
    gdf = g.groupBy("gram").agg(F.count("*").alias("ndocs"))
    per_doc = (
        g.join(gdf, "gram")
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.when(F.col("ndocs") >= 2, 1).otherwise(0)).alias("n_dup"),
        )
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(
            F.avg(F.col("n_dup") * F.lit(1.0) / F.col("n_grams")), 6
        ).alias("avg_dup_frac"),
        F.sum(
            F.when(F.col("n_dup") * 2 >= F.col("n_grams"), 1).otherwise(0)
        ).alias("n_docs_half_dup"),
    )


#: per-source sampling rates in basis points of 10_000 (mixing weights):
#: src0–4 keep all, src5–9 half, src10–14 quarter, src15+ 10%.
_MIX_CASE_SQL = """CASE
    WHEN sid < 5 THEN 10000 WHEN sid < 10 THEN 5000
    WHEN sid < 15 THEN 2500 ELSE 1000 END"""


@query(
    "q_dataset_mix",
    oracle=f"""
    WITH t AS (
      SELECT source, n_chars,
             CAST(substr(source, 4) AS INT) AS sid,
             {token_hash_sql("CAST(doc_id AS VARCHAR)")} % 10000 AS u
      FROM documents),
    r AS (SELECT *, {_MIX_CASE_SQL} AS rate_bp FROM t)
    SELECT source,
           count(*) AS n_total,
           CAST(sum(CASE WHEN u < rate_bp THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN u < rate_bp THEN n_chars ELSE 0 END)
                AS BIGINT) AS kept_chars
    FROM r GROUP BY source
    """,
)
def q_dataset_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified dataset mixing: each source stratum keeps
    a configured fraction of documents, membership decided by a portable
    hash of the doc_id against an integer basis-point threshold —
    ``sampleBy`` semantics without ``rand()``, so the sample is
    reproducible across engines, retries, and partitionings (a training
    corpus must be rebuildable bit-for-bit).

    Plan: pure map-side filter + one partial-agg shuffle; at 100 TB the
    sample predicate rides the scan and composes with column pruning."""
    d = load(spark, sf_dir, "documents")
    sid = F.substring("source", 4, 10).cast("int")
    u = token_hash(F.col("doc_id").cast("string")) % 10000
    rate = (
        F.when(sid < 5, 10000)
        .when(sid < 10, 5000)
        .when(sid < 15, 2500)
        .otherwise(1000)
    )
    kept = F.col("u") < F.col("rate_bp")
    return (
        d.select(
            "source", "n_chars", u.alias("u"), rate.alias("rate_bp")
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(kept.cast("long")).alias("n_kept"),
            F.sum(F.when(kept, F.col("n_chars")).otherwise(0)).alias(
                "kept_chars"
            ),
        )
    )


#: Z-order resolution: 4 bits per dimension → 8-bit z-value, 16 buckets.
ZBITS = 4


@query(
    "q_zorder_layout",
    oracle=f"""
    WITH base AS (
      SELECT o_custkey AS ck,
             datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS dy
      FROM orders),
    stats AS (SELECT min(ck) AS minc, max(ck) AS maxc,
                     min(dy) AS mind, max(dy) AS maxd FROM base),
    q AS (
      SELECT ck, dy,
             ((ck - minc) * {1 << ZBITS}) // (maxc - minc + 1) AS qx,
             ((dy - mind) * {1 << ZBITS}) // (maxd - mind + 1) AS qy
      FROM base CROSS JOIN stats),
    z AS (
      SELECT ck, dy,
             {" + ".join(
                 f"((qx >> {i}) & 1) * {1 << (2 * i)}"
                 f" + ((qy >> {i}) & 1) * {1 << (2 * i + 1)}"
                 for i in range(ZBITS)
             )} AS zval
      FROM q)
    SELECT zval // {1 << ZBITS} AS zbucket,
           count(*) AS cnt,
           min(ck) AS min_cust, max(ck) AS max_cust,
           min(dy) AS min_day, max(dy) AS max_day
    FROM z GROUP BY zbucket
    """,
)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (o_custkey, order epoch-day),
    reduced to per-bucket row counts and min/max ranges in BOTH
    dimensions — the bounding-box statistics that make multi-dimensional
    file skipping work. Sorting 100 TB by ``zval`` at write time bounds
    every file's (custkey, date) rectangle, so a point or range predicate
    on EITHER column prunes most files; a plain sort on one column only
    prunes that column.

    All arithmetic is integer (quantize by integer division, interleave
    by shift/mask), so the oracle comparison is exact — no float
    boundary drift between engines."""
    base = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ck"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")).alias("dy"),
    )
    stats = base.agg(
        F.min("ck").alias("minc"),
        F.max("ck").alias("maxc"),
        F.min("dy").alias("mind"),
        F.max("dy").alias("maxd"),
    )
    lvl = 1 << ZBITS
    q = base.crossJoin(F.broadcast(stats)).select(
        "ck",
        "dy",
        F.expr(f"((ck - minc) * {lvl}) DIV (maxc - minc + 1)").alias("qx"),
        F.expr(f"((dy - mind) * {lvl}) DIV (maxd - mind + 1)").alias("qy"),
    )
    zval = None
    for i in range(ZBITS):
        term = F.shiftleft(
            F.shiftright(F.col("qx"), i).bitwiseAND(F.lit(1)), 2 * i
        ) + F.shiftleft(
            F.shiftright(F.col("qy"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
        zval = term if zval is None else zval + term
    z = q.select("ck", "dy", zval.alias("zval"))
    return (
        z.withColumn("zbucket", F.expr(f"zval DIV {lvl}"))
        .groupBy("zbucket")
        .agg(
            F.count("*").alias("cnt"),
            F.min("ck").alias("min_cust"),
            F.max("ck").alias("max_cust"),
            F.min("dy").alias("min_day"),
            F.max("dy").alias("max_day"),
        )
    )


@query(
    "q_corpus_build",
    oracle=f"""
    WITH g AS (SELECT * FROM {_GRAMS_SQL}),
    bench_grams AS (
      SELECT DISTINCT gram FROM g WHERE doc_id % {BENCH_MOD} = 0),
    hits AS (
      SELECT DISTINCT g.doc_id FROM g JOIN bench_grams USING (gram)
      WHERE g.doc_id % {BENCH_MOD} <> 0),
    flags AS (
      SELECT d.source, d.doc_id,
             len(string_split(d.text, ' ')) AS n_words,
             (len(string_split(d.text, ' ')) >= 30
              AND d.n_chars * 1.0 / len(string_split(d.text, ' ')) BETWEEN 3 AND 13)
               AS q,
             d.doc_id % {BENCH_MOD} = 0 AS bench,
             h.doc_id IS NOT NULL AS cont,
             {token_hash_sql("CAST(d.doc_id AS VARCHAR)")} % 10000
               < (CASE WHEN CAST(substr(d.source, 4) AS INT) < 5 THEN 10000
                       WHEN CAST(substr(d.source, 4) AS INT) < 10 THEN 5000
                       WHEN CAST(substr(d.source, 4) AS INT) < 15 THEN 2500
                       ELSE 1000 END) AS kept
      FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id)
    SELECT source,
           count(*) AS n_in,
           CAST(sum(CASE WHEN q THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
           CAST(sum(CASE WHEN q AND NOT bench AND NOT cont THEN 1 ELSE 0 END)
             AS BIGINT) AS n_clean,
           CAST(sum(CASE WHEN q AND NOT bench AND NOT cont AND kept
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_final,
           CAST(sum(CASE WHEN q AND NOT bench AND NOT cont AND kept
                    THEN n_words ELSE 0 END) AS BIGINT) AS final_tokens
    FROM flags GROUP BY source
    """,
)
def q_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-build funnel, composed end-to-end: quality gate (word
    count + mean word length) → benchmark holdout + decontamination
    (5-gram overlap, broadcast semi-join) → stratified mixing
    (hash-threshold) — with per-source counts after EVERY stage, so the
    output is the funnel report a dataset card needs (n_in → n_quality
    → n_clean → n_final + surviving token budget).

    Plan shape: all stage predicates become FLAGS computed in one pass
    over documents (one broadcast semi-join feeds the contamination
    flag), then a single partial-agg shuffle emits every stage count —
    no stage materializes an intermediate corpus, which is the property
    that matters at 100 TB (the naive pipeline writes the corpus three
    times; this writes counts once). The full-fidelity stages stay
    available as q_gopher_filters / q_decontaminate / q_dataset_mix /
    q_training_pipeline. ``corpus_flags`` / ``funnel_report`` are the
    shared building blocks: the streaming funnel
    (streaming.pipeline.run_streaming_corpus_build) reuses them
    verbatim, which is what pins incremental == batch."""
    d = load(spark, sf_dir, "documents")
    g = _grams(spark, sf_dir)
    bench_grams = g.filter(F.col("doc_id") % BENCH_MOD == 0).select("gram").distinct()
    hits = (
        g.filter(F.col("doc_id") % BENCH_MOD != 0)
        .join(F.broadcast(bench_grams), "gram", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return funnel_report(corpus_flags(d, hits))


def corpus_flags(d: DataFrame, hits: DataFrame) -> DataFrame:
    """documents ⋈ precomputed contamination ``hits(doc_id, hit)`` →
    one per-doc row of funnel flags (quality, benchmark-holdout,
    contaminated, mix-kept). Every flag except ``cont`` is a pure
    map-side expression of the row itself — the property the streaming
    incremental-maintenance path relies on (only ``cont`` ever needs
    retro-updating when new benchmark docs arrive)."""
    d = d.withColumn("n_words", F.size(F.split("text", " ")))
    mean_wl = F.col("n_chars") * F.lit(1.0) / F.col("n_words")
    q = (F.col("n_words") >= 30) & mean_wl.between(3, 13)
    bench = F.col("doc_id") % BENCH_MOD == 0
    sid = F.substring("source", 4, 10).cast("int")
    rate = (
        F.when(sid < 5, 10000)
        .when(sid < 10, 5000)
        .when(sid < 15, 2500)
        .otherwise(1000)
    )
    kept = token_hash(F.col("doc_id").cast("string")) % 10000 < rate
    return d.join(hits, "doc_id", "left").select(
        "doc_id",
        "source",
        "n_words",
        q.alias("q"),
        bench.alias("bench"),
        F.col("hit").isNotNull().alias("cont"),
        kept.alias("kept"),
    )


def funnel_report(flags: DataFrame) -> DataFrame:
    """Per-source funnel counts from ``corpus_flags`` rows — one
    partial-agg shuffle."""
    clean = F.col("q") & ~F.col("bench") & ~F.col("cont")
    final = clean & F.col("kept")
    one = lambda c: F.sum(c.cast("long"))  # noqa: E731
    return flags.groupBy("source").agg(
        F.count("*").alias("n_in"),
        one(F.col("q")).alias("n_quality"),
        one(clean).alias("n_clean"),
        one(final).alias("n_final"),
        F.sum(F.when(final, F.col("n_words")).otherwise(0)).alias(
            "final_tokens"
        ),
    )


@query(
    "q_weighted_sample",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             -ln((({token_hash_sql("CAST(doc_id AS VARCHAR)")}) % 1000000 + 1)
                 / 1000001.0) / n_chars AS k
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, CAST(n_chars AS BIGINT) AS weight, round(k, 6) AS key
    FROM keyed ORDER BY k, doc_id LIMIT 25
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling (hash-seeded exponential-key
    A-ES, Efraimidis-Spirakis): each row draws u from its md5 hash,
    keys on -ln(u)/w, and the k smallest keys ARE a weighted sample
    without replacement — longer documents proportionally more likely,
    yet every engine, retry, and cluster size draws the SAME sample
    (rand()-based sampleBy can't be oracle-checked and isn't
    reproducible under re-partitioning).

    Scale shape: the key is a pure projection; top-k = per-partition
    top-k then a 25-row final merge (Spark's sort+limit already plans
    TakeOrderedAndProject — no global sort materializes)."""
    d = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        (token_hash(F.col("doc_id").cast("string")) % 1000000 + 1)
        / F.lit(1000001.0)
    )
    k = -F.log(u) / F.col("n_chars")
    return (
        d.select(
            "doc_id",
            F.col("n_chars").alias("weight"),
            k.alias("k"),
        )
        .orderBy("k", "doc_id")
        .limit(25)
        .select("doc_id", "weight", F.round("k", 6).alias("key"))
    )


#: Laplace scale b = sensitivity/epsilon; counts have sensitivity 1
_DP_EPS = 1.0


@query(
    "q_dp_noise",
    oracle=f"""
    WITH counts AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events
      GROUP BY event_type
    ),
    seeded AS (
      SELECT event_type, n,
             (({token_hash_sql("event_type")}) % 1000000 + 1) / 1000002.0
               AS u
      FROM counts
    )
    SELECT event_type, n,
           round(n - (1.0 / {_DP_EPS}) * CAST(sign(u - 0.5) AS DOUBLE)
                 * ln(1 - 2 * abs(u - 0.5)), 6) AS noisy_n,
           CAST({_DP_EPS} AS DOUBLE) AS epsilon
    FROM seeded
    """,
)
def q_dp_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private release of group counts: calibrated
    Laplace(1/ε) noise via inverse-CDF sampling — u drawn from the
    group key's md5 hash rather than rand(), so the release is
    REPRODUCIBLE and oracle-checkable while keeping the exact Laplace
    shape (a production system would swap the hash seed for a secret
    per-release salt; the mechanism and calibration are identical).
    The standard privacy gate before sharing corpus statistics
    outside the training-data boundary.

    Plan: one combinable count shuffle; the noise is a scalar
    projection over |groups| rows."""
    e = load(spark, sf_dir, "events")
    counts = e.groupBy("event_type").agg(F.count("*").alias("n"))
    u = (
        (token_hash(F.col("event_type")) % 1000000 + 1) / F.lit(1000002.0)
    )
    noise = (
        (F.lit(1.0) / _DP_EPS)
        * F.signum(u - F.lit(0.5)).cast("double")
        * F.log(1 - 2 * F.abs(u - F.lit(0.5)))
    )
    return counts.select(
        "event_type",
        "n",
        F.round(F.col("n") - noise, 6).alias("noisy_n"),
        F.lit(float(_DP_EPS)).alias("epsilon"),
    )


_N_SHARDS = 8


@query(
    "q_rendezvous",
    oracle=f"""
    WITH cand AS (
      SELECT d.doc_id, s.shard,
             {token_hash_sql("CAST(d.doc_id AS VARCHAR) || ':' || CAST(s.shard AS VARCHAR)")}
               AS w
      FROM documents d
      CROSS JOIN (SELECT unnest(range({_N_SHARDS})) AS shard) s
    ),
    assign AS (
      SELECT doc_id, shard, w,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY w DESC, shard) AS rn
      FROM cand
    )
    SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM assign WHERE rn = 1 GROUP BY shard
    """,
)
def q_rendezvous(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) hashing: each document joins
    the shard whose hash(doc, shard) weight is highest — the
    assignment scheme whose defining property is MINIMAL RESHUFFLING
    (removing one shard moves only that shard's keys, unlike mod-N
    which moves nearly everything). The per-shard occupancy report
    doubles as the balance audit.

    Plan: the candidate set is a map-side explode (N_SHARDS rows per
    key — no join against a shard table at scale, the weights are
    computed inline), winner per key via one hash aggregation, then a
    combinable occupancy count."""
    d = load(spark, sf_dir, "documents")
    cand = d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(_N_SHARDS - 1))).alias("shard"),
    ).withColumn(
        "w",
        token_hash(
            F.concat_ws(
                ":",
                F.col("doc_id").cast("string"),
                F.col("shard").cast("string"),
            )
        ),
    )
    assign = cand.groupBy("doc_id").agg(
        F.min_by(
            "shard", F.struct((-F.col("w")).alias("nw"), F.col("shard"))
        ).alias("shard")
    )
    return assign.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )
