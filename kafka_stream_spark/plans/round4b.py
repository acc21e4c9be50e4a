"""Round-4 breadth, part B: Hilbert data layout, vocabulary coverage,
one-way ANOVA, feature hashing, paired t-test, SAX symbolization,
time-decayed aggregation, and Monroe log-odds corpus comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import hashing, hilbert
from ..sources.tables import load
from .registry import query

# ---------------------------------------------------------------------------
# X281 — Hilbert-curve layout clustering (Z-order's better-bounded sibling)
# ---------------------------------------------------------------------------

_HN = 256  # 2^8 x 2^8 grid (8 rotation levels)


def _hilbert_oracle() -> str:
    chain, final = hilbert.xy2d_ctes(_HN, "q", carry=["ck", "dy"])
    return f"""
    WITH base AS (
      SELECT o_custkey AS ck,
             datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS dy
      FROM orders),
    stats AS (SELECT min(ck) AS minc, max(ck) AS maxc,
                     min(dy) AS mind, max(dy) AS maxd FROM base),
    q AS (
      SELECT ck, dy,
             ((ck - minc) * {_HN}) // (maxc - minc + 1) AS hx,
             ((dy - mind) * {_HN}) // (maxd - mind + 1) AS hy
      FROM base CROSS JOIN stats),
    {chain}
    SELECT hd // {_HN} AS hbucket, count(*) AS cnt,
           min(ck) AS min_cust, max(ck) AS max_cust,
           min(dy) AS min_day, max(dy) AS max_day
    FROM {final} GROUP BY 1
    """


@query("q_hilbert_layout", oracle=_hilbert_oracle())
def q_hilbert_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X281 — Hilbert-curve clustering key over (o_custkey, epoch-day),
    X93's Z-order row upgraded to the curve real lakehouse layouts
    prefer (Hilbert has no Morton seam jumps, so per-file bounding
    boxes are strictly tighter — the reason Delta's OPTIMIZE and
    Iceberg's rewrite both offer it). The iterative xy2d quadrant
    rotation is unrolled to 8 levels of materialized integer CASE/bit
    arithmetic (functions/hilbert.py; continuity of the transform is
    pytest-proven), one chained whole-stage-codegen projection per
    level, no shuffle until the final bucket rollup. All-integer, so
    the oracle comparison is exact."""
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
    q = base.crossJoin(F.broadcast(stats)).select(
        "ck",
        "dy",
        F.expr(f"((ck - minc) * {_HN}) DIV (maxc - minc + 1)").alias("hx"),
        F.expr(f"((dy - mind) * {_HN}) DIV (maxd - mind + 1)").alias("hy"),
    )
    hd = hilbert.xy2d_df(q, _HN, carry=["ck", "dy"])
    return (
        hd.withColumn("hbucket", F.expr(f"hd DIV {_HN}"))
        .groupBy("hbucket")
        .agg(
            F.count("*").alias("cnt"),
            F.min("ck").alias("min_cust"),
            F.max("ck").alias("max_cust"),
            F.min("dy").alias("min_day"),
            F.max("dy").alias("max_day"),
        )
    )


# ---------------------------------------------------------------------------
# X282 — tokenizer vocabulary coverage / OOV rate
# ---------------------------------------------------------------------------


@query(
    "q_vocab_coverage",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, unnest(list_filter(
        string_split(lower(text), ' '), t -> t <> '')) AS tok
      FROM documents
    ), vocab AS (
      SELECT tok FROM (
        SELECT tok, count(*) AS c,
               row_number() OVER (ORDER BY count(*) DESC, tok) AS rn
        FROM toks GROUP BY tok) WHERE rn <= 256
    ), flagged AS (
      SELECT t.source, t.tok, v.tok IS NOT NULL AS in_vocab
      FROM toks t LEFT JOIN vocab v ON v.tok = t.tok
    )
    SELECT source, count(*) AS n_tokens,
           CAST(sum(CASE WHEN in_vocab THEN 1 ELSE 0 END) AS BIGINT)
             AS n_covered,
           round(1.0 - sum(CASE WHEN in_vocab THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS oov_rate
    FROM flagged GROUP BY source
    """,
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X282 — tokenizer vocabulary coverage: induce a 256-entry
    frequency vocabulary over the corpus (deterministic (count DESC,
    token) cut — the X168 BPE induction's rank step), then report each
    source's out-of-vocabulary token rate — the go/no-go metric before
    committing a tokenizer to a training mix (high OOV strata inflate
    token counts and UNK mass). One combinable token count, a broadcast
    vocabulary, and a map-side flag rollup: token text crosses a
    shuffle only in the (token, count) pairs."""
    toks = load(spark, sf_dir, "documents").select(
        "source",
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
        ).alias("tok"),
    )
    w = Window.orderBy(F.desc("c"), "tok")
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("c"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 256)
        .select(F.col("tok").alias("vtok"))
    )
    flagged = toks.join(
        F.broadcast(vocab), toks.tok == F.col("vtok"), "left"
    ).select("source", F.col("vtok").isNotNull().alias("in_vocab"))
    return flagged.groupBy("source").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.col("in_vocab").cast("long")).alias("n_covered"),
        F.round(
            1.0 - F.sum(F.col("in_vocab").cast("long")) * 1.0 / F.count("*"),
            6,
        ).alias("oov_rate"),
    )


# ---------------------------------------------------------------------------
# X283 — one-way ANOVA F-test
# ---------------------------------------------------------------------------


@query(
    "q_anova_f",
    oracle="""
    WITH x AS (SELECT source AS g, CAST(n_chars AS DOUBLE) AS v
               FROM documents),
    grp AS (SELECT g, count(*) AS n, avg(v) AS m,
                   sum(v * v) AS ss FROM x GROUP BY g),
    tot AS (SELECT count(*) AS nt, avg(v) AS gm FROM x),
    parts AS (
      SELECT (SELECT count(*) FROM grp) AS k, tot.nt,
             sum(grp.n * (grp.m - tot.gm) * (grp.m - tot.gm)) AS ssb,
             sum(grp.ss - grp.n * grp.m * grp.m) AS ssw
      FROM grp CROSS JOIN tot GROUP BY tot.nt
    )
    SELECT CAST(k AS BIGINT) AS k_groups, CAST(nt AS BIGINT) AS n_total,
           round(ssb, 2) AS ss_between, round(ssw, 2) AS ss_within,
           round((ssb / (k - 1)) / (ssw / (nt - k)), 6) AS f_stat
    FROM parts
    """,
)
def q_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X283 — one-way ANOVA: does mean document length differ across
    sources? F = (SS_between/(k−1)) / (SS_within/(N−k)), the k-group
    generalization of X196's Welch t — the first screen before any
    per-source length normalization. Sufficient-statistics form: one
    per-group rollup (n, mean, sum-of-squares), one grand rollup, all
    broadcast-combined — a single scan of the fact column regardless
    of group count."""
    x = load(spark, sf_dir, "documents").select(
        F.col("source").alias("g"), F.col("n_chars").cast("double").alias("v")
    )
    grp = x.groupBy("g").agg(
        F.count("*").alias("n"),
        F.avg("v").alias("m"),
        F.sum(F.col("v") * F.col("v")).alias("ss"),
    )
    tot = x.agg(F.count("*").alias("nt"), F.avg("v").alias("gm"))
    parts = (
        grp.crossJoin(F.broadcast(tot))
        .groupBy("nt")
        .agg(
            F.count("*").alias("k"),
            F.sum(
                F.col("n") * (F.col("m") - F.col("gm")) * (F.col("m") - F.col("gm"))
            ).alias("ssb"),
            F.sum(F.col("ss") - F.col("n") * F.col("m") * F.col("m")).alias(
                "ssw"
            ),
        )
    )
    return parts.select(
        F.col("k").cast("long").alias("k_groups"),
        F.col("nt").cast("long").alias("n_total"),
        F.round("ssb", 2).alias("ss_between"),
        F.round("ssw", 2).alias("ss_within"),
        F.round(
            (F.col("ssb") / (F.col("k") - 1))
            / (F.col("ssw") / (F.col("nt") - F.col("k"))),
            6,
        ).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# X284 — feature hashing (the hashing trick)
# ---------------------------------------------------------------------------

_FH_DIM = 64


@query(
    "q_feature_hashing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(
        string_split(lower(text), ' '), t -> t <> '')) AS tok
      FROM documents WHERE doc_id % 20 = 0
    ), hashed AS (
      SELECT doc_id,
             {hashing.token_hash_sql('tok')} % {_FH_DIM} AS slot,
             CASE WHEN ({hashing.token_hash_sql('tok')} // {_FH_DIM}) % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM toks
    )
    SELECT doc_id, CAST(slot AS BIGINT) AS slot,
           CAST(sum(sgn) AS BIGINT) AS weight,
           count(*) AS n_hits
    FROM hashed GROUP BY doc_id, slot
    """,
)
def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X284 — the hashing trick (Weinberger et al. 2009): tokens hash
    into a fixed 64-slot feature space with a signed-hash correction
    (the second hash bit flips the sign so collisions cancel in
    expectation — the vowpal-wabbit/scikit HashingVectorizer recipe).
    No vocabulary state at all — the property that makes it THE
    featurizer for streaming/distributed training. One explode + one
    combinable (doc, slot) rollup; sparse output rows, never a dense
    vector."""
    toks = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 20 == 0)
        .select(
            "doc_id",
            F.explode(
                F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
            ).alias("tok"),
        )
    )
    h = hashing.token_hash(F.col("tok"))
    hashed = toks.select(
        "doc_id",
        (h % _FH_DIM).alias("slot"),
        # sign bit = bit 6 of the hash (h // 64 % 2); shiftright keeps
        # the arithmetic integer — a float division would shed the low
        # bits of the 60-bit hash and flip signs
        F.when(F.shiftright(h, 6) % 2 == 0, 1).otherwise(-1).alias("sgn"),
    )
    return hashed.groupBy("doc_id", "slot").agg(
        F.sum("sgn").cast("long").alias("weight"),
        F.count("*").alias("n_hits"),
    )


# ---------------------------------------------------------------------------
# X285 — paired t-test
# ---------------------------------------------------------------------------


@query(
    "q_paired_ttest",
    oracle="""
    WITH monthly AS (
      SELECT o_orderpriority AS pri,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
             sum(o_totalprice) AS y
      FROM orders GROUP BY 1, 2
    ), paired AS (
      SELECT pri, y - lag(y) OVER (PARTITION BY pri ORDER BY m) AS d
      FROM monthly
    ), diffs AS (SELECT pri, d FROM paired WHERE d IS NOT NULL)
    SELECT pri AS o_orderpriority, count(*) AS n_pairs,
           round(avg(d), 2) AS mean_diff,
           round(stddev_samp(d), 2) AS sd_diff,
           round(avg(d) / (stddev_samp(d) / sqrt(count(*))), 6) AS t_stat
    FROM diffs GROUP BY pri
    """,
)
def q_paired_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X285 — paired t-test on consecutive-month revenue differences
    per priority: t = mean(d) / (sd(d)/sqrt(n)) over the paired deltas
    — the matched-samples sibling of X196's Welch (which assumes
    independent groups; month-over-month revenue is anything but).
    One rollup + one lag window per series + sufficient-statistics
    agg."""
    monthly = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("pri"),
            F.to_date(F.date_trunc("month", "o_orderdate")).alias("m"),
        )
        .agg(F.sum("o_totalprice").alias("y"))
    )
    w = Window.partitionBy("pri").orderBy("m")
    diffs = (
        monthly.withColumn("d", F.col("y") - F.lag("y").over(w))
        .filter(F.col("d").isNotNull())
    )
    return diffs.groupBy(F.col("pri").alias("o_orderpriority")).agg(
        F.count("*").alias("n_pairs"),
        F.round(F.avg("d"), 2).alias("mean_diff"),
        F.round(F.stddev_samp("d"), 2).alias("sd_diff"),
        F.round(
            F.avg("d") / (F.stddev_samp("d") / F.sqrt(F.count("*"))), 6
        ).alias("t_stat"),
    )


# ---------------------------------------------------------------------------
# X286 — SAX time-series symbolization
# ---------------------------------------------------------------------------

_SAX_SEGS = 8
_SAX_BP = (-0.6745, 0.0, 0.6745)  # N(0,1) quartile breakpoints → a/b/c/d


@query(
    "q_sax",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(count(*) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    ), stats AS (
      SELECT event_type, count(*) AS n, avg(v) AS m,
             sqrt(sum(v * v) / count(*) - avg(v) * avg(v)) AS sd
      FROM daily GROUP BY event_type
    ), seg AS (
      SELECT d.event_type, s.n,
             ((row_number() OVER (PARTITION BY d.event_type ORDER BY d.d)
               - 1) * {_SAX_SEGS}) // s.n AS seg,
             (d.v - s.m) / s.sd AS z
      FROM daily d JOIN stats s ON s.event_type = d.event_type
    ), paa AS (
      SELECT event_type, n, seg, round(avg(z), 6) AS zbar
      FROM seg GROUP BY event_type, n, seg
    ), sym AS (
      SELECT event_type, n, seg,
             CASE WHEN zbar < {_SAX_BP[0]} THEN 'a'
                  WHEN zbar < {_SAX_BP[1]} THEN 'b'
                  WHEN zbar < {_SAX_BP[2]} THEN 'c'
                  ELSE 'd' END AS sym
      FROM paa
    )
    SELECT event_type, CAST(max(n) AS BIGINT) AS n_days,
           string_agg(sym, '' ORDER BY seg) AS sax_word
    FROM sym GROUP BY event_type
    """,
)
def q_sax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X286 — SAX symbolization (Lin/Keogh 2003): the daily event-count
    series per type is z-normalized (population stats spelled as
    explicit sufficient-statistic arithmetic so both engines share the
    exact float ops), PAA-compressed into 8 equal segments, and each
    segment mean maps to one of 4 symbols at the N(0,1) quartile
    breakpoints — the alphabet every classic series-mining stack
    (motif/discord search, series indexing) runs on. Segment means are
    rounded before classification so the symbol cut is engine-stable.
    One rollup + per-series windows; the word assembly is an ordered
    string_agg per series key."""
    daily = load(spark, sf_dir, "events").groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).agg(F.count("*").cast("double").alias("v"))
    stats = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.avg("v").alias("m"),
        F.sqrt(
            F.sum(F.col("v") * F.col("v")) / F.count("*")
            - F.avg("v") * F.avg("v")
        ).alias("sd"),
    )
    w = Window.partitionBy("event_type").orderBy("d")
    seg = daily.join(stats, "event_type").select(
        "event_type",
        "n",
        (((F.row_number().over(w) - 1) * _SAX_SEGS) / F.col("n"))
        .cast("long")
        .alias("seg"),
        ((F.col("v") - F.col("m")) / F.col("sd")).alias("z"),
    )
    paa = seg.groupBy("event_type", "n", "seg").agg(
        F.round(F.avg("z"), 6).alias("zbar")
    )
    sym = paa.withColumn(
        "sym",
        F.when(F.col("zbar") < _SAX_BP[0], "a")
        .when(F.col("zbar") < _SAX_BP[1], "b")
        .when(F.col("zbar") < _SAX_BP[2], "c")
        .otherwise("d"),
    )
    return sym.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_days"),
        F.concat_ws(
            "", F.transform(F.array_sort(F.collect_list(F.struct("seg", "sym"))), lambda s: s["sym"])
        ).alias("sax_word"),
    )


# ---------------------------------------------------------------------------
# X287 — time-decayed aggregation (exponential recency weighting)
# ---------------------------------------------------------------------------


@query(
    "q_time_decay",
    oracle="""
    SELECT c.c_mktsegment,
           count(*) AS n_orders,
           round(sum(o.o_totalprice), 2) AS raw_revenue,
           round(sum(o.o_totalprice
                     * exp(-datediff('day', CAST(o.o_orderdate AS DATE),
                                     DATE '2001-12-31') / 365.0)), 2)
             AS decayed_revenue
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X287 — exponentially time-decayed revenue per market segment
    (half-life ≈ 253 days: weight = e^(−age/365) against a fixed
    as-of date): the recency-weighted counter every engagement /
    churn-risk dashboard keeps, here as a single broadcast-joined scan
    — the decay is a map-side expression, so the streaming twin only
    has to multiply the stored aggregate by a constant per tick
    (the classic decayed-counter trick) instead of rescanning. Rounded
    after the sum; the ULP spread of exp() between engines is orders
    of magnitude below the 2-decimal cut."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    age = F.datediff(
        F.lit("2001-12-31").cast("date"), F.to_date("o_orderdate")
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("raw_revenue"),
            F.round(
                F.sum(F.col("o_totalprice") * F.exp(-age / F.lit(365.0))), 2
            ).alias("decayed_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# X288 — Monroe log-odds corpus comparison ("Fightin' Words")
# ---------------------------------------------------------------------------


@query(
    "q_log_odds",
    oracle="""
    WITH toks AS (
      SELECT CASE WHEN lang = 'en' THEN 'en' ELSE 'other' END AS grp,
             unnest(list_filter(string_split(lower(text), ' '),
                                t -> t <> '')) AS tok
      FROM documents
    ), counts AS (
      SELECT tok,
             sum(CASE WHEN grp = 'en' THEN 1 ELSE 0 END) AS ya,
             sum(CASE WHEN grp = 'other' THEN 1 ELSE 0 END) AS yb,
             count(*) AS yt
      FROM toks GROUP BY tok HAVING count(*) >= 10
    ), tot AS (
      SELECT sum(ya) AS na, sum(yb) AS nb, sum(yt) AS nt FROM counts
    ), scored AS (
      SELECT c.tok, c.ya, c.yb,
             ln((c.ya + 0.01 * c.yt)
                / (t.na + 0.01 * t.nt - c.ya - 0.01 * c.yt))
             - ln((c.yb + 0.01 * c.yt)
                  / (t.nb + 0.01 * t.nt - c.yb - 0.01 * c.yt)) AS delta,
             1.0 / (c.ya + 0.01 * c.yt) + 1.0 / (c.yb + 0.01 * c.yt)
               AS variance
      FROM counts c CROSS JOIN tot t
    ), ranked AS (
      SELECT tok, CAST(ya AS BIGINT) AS ya, CAST(yb AS BIGINT) AS yb,
             round(delta / sqrt(variance), 4) AS z,
             row_number() OVER (
               ORDER BY round(abs(delta / sqrt(variance)), 4) DESC, tok)
               AS rn
      FROM scored
    )
    SELECT tok, ya, yb, z FROM ranked WHERE rn <= 20
    """,
)
def q_log_odds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X288 — log-odds ratio with informative Dirichlet prior (Monroe,
    Colaresi & Quinn 2008, "Fightin' Words"): which tokens most
    distinguish the English half of the corpus from the rest,
    z-scored as delta/sqrt(1/(y_a+a_w) + 1/(y_b+a_w)) with the prior
    a_w = 1% of each token's corpus count — THE principled alternative
    to raw tf-idf for corpus comparison (raw odds overweight rare
    words; the prior shrinks them). One combinable token count, a
    broadcast grand total, and a top-20 cut on the rounded |z| with
    lexical tie-break. df >= 10 bounds the vocabulary."""
    toks = load(spark, sf_dir, "documents").select(
        F.when(F.col("lang") == "en", "en").otherwise("other").alias("grp"),
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
        ).alias("tok"),
    )
    counts = (
        toks.groupBy("tok")
        .agg(
            F.sum((F.col("grp") == "en").cast("long")).alias("ya"),
            F.sum((F.col("grp") == "other").cast("long")).alias("yb"),
            F.count("*").alias("yt"),
        )
        .filter(F.col("yt") >= 10)
    )
    tot = counts.agg(
        F.sum("ya").alias("na"), F.sum("yb").alias("nb"), F.sum("yt").alias("nt")
    )
    prior = 0.01 * F.col("yt")
    a0 = 0.01 * F.col("nt")
    delta = F.log(
        (F.col("ya") + prior) / (F.col("na") + a0 - F.col("ya") - prior)
    ) - F.log((F.col("yb") + prior) / (F.col("nb") + a0 - F.col("yb") - prior))
    variance = 1.0 / (F.col("ya") + prior) + 1.0 / (F.col("yb") + prior)
    scored = counts.crossJoin(F.broadcast(tot)).select(
        "tok",
        F.col("ya").cast("long").alias("ya"),
        F.col("yb").cast("long").alias("yb"),
        F.round(delta / F.sqrt(variance), 4).alias("z"),
    )
    w = Window.orderBy(F.desc(F.round(F.abs(F.col("z")), 4)), "tok")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("tok", "ya", "yb", "z")
    )
