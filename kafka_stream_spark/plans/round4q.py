"""Round-4 batch Q: experimentation guards, post-hoc tests, changepoint
localization, path mining, and lexical statistics (X385-X392).

The connective tissue between batteries the engine already has: Tukey's
HSD is the post-hoc step X283's ANOVA ends at; SRM is the validity
check every X199/X336 experiment readout silently assumes; binary
segmentation LOCALIZES the change X210's CUSUM only flags; top-paths is
the sequence rollup X97's CEP patterns query one-at-a-time; word
burstiness and lexical richness extend the corpus-quality battery with
the two classic term-distribution diagnostics. All sufficient-statistics
or bounded-window shapes; nothing shuffles the raw fact table more than
once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text
from ..sources.tables import load
from .registry import query
from .round4o import _ERF_SQL, _p_two_sided

# ---------------------------------------------------------------------------
# X385 — Tukey HSD post-hoc pairwise comparisons
# ---------------------------------------------------------------------------


@query(
    "q_tukey_hsd",
    oracle="""
    WITH x AS (SELECT source AS g, CAST(n_chars AS DOUBLE) AS v
               FROM documents),
    grp AS (
      SELECT g, count(*) AS n, avg(v) AS m, sum(v * v) AS ss
      FROM x GROUP BY g
    ), msw AS (
      SELECT sum(ss - n * m * m) / (sum(n) - count(*)) AS msw,
             sum(n) - count(*) AS df
      FROM grp
    )
    SELECT a.g AS group_a, b.g AS group_b,
           CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
           round(a.m - b.m, 4) AS mean_diff,
           round(sqrt(w.msw / 2 * (1.0 / a.n + 1.0 / b.n)), 6) AS se,
           round((a.m - b.m)
                 / sqrt(w.msw / 2 * (1.0 / a.n + 1.0 / b.n)), 6)
             AS q_stat
    FROM grp a JOIN grp b ON a.g < b.g CROSS JOIN msw w
    """,
)
def q_tukey_hsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X385 — Tukey HSD pairwise contrasts after X283's ANOVA: every
    group pair's mean difference with the studentized-range statistic
    q = diff/√(MSW/2·(1/nᵢ+1/nⱼ)) (Tukey-Kramer unequal-n form) — the
    'WHICH groups differ' step ANOVA's single F cannot answer. The
    pair join runs on the k-row sufficient-statistics table, never the
    corpus; MSW is one broadcast scalar."""
    x = load(spark, sf_dir, "documents").select(
        F.col("source").alias("g"), F.col("n_chars").cast("double").alias("v")
    )
    grp = x.groupBy("g").agg(
        F.count("*").alias("n"),
        F.avg("v").alias("m"),
        F.sum(F.col("v") * F.col("v")).alias("ss"),
    )
    msw = grp.agg(
        (
            F.sum(F.col("ss") - F.col("n") * F.col("m") * F.col("m"))
            / (F.sum("n") - F.count("*"))
        ).alias("msw")
    )
    a = grp.select(
        F.col("g").alias("ga"), F.col("n").alias("na"), F.col("m").alias("ma")
    )
    b = grp.select(
        F.col("g").alias("gb"), F.col("n").alias("nb"), F.col("m").alias("mb")
    )
    se = F.sqrt(
        F.col("msw") / 2 * (1.0 / F.col("na") + 1.0 / F.col("nb"))
    )
    return (
        a.join(b, F.col("ga") < F.col("gb"))
        .crossJoin(F.broadcast(msw))
        .select(
            F.col("ga").alias("group_a"),
            F.col("gb").alias("group_b"),
            F.col("na").cast("long").alias("n_a"),
            F.col("nb").cast("long").alias("n_b"),
            F.round(F.col("ma") - F.col("mb"), 4).alias("mean_diff"),
            F.round(se, 6).alias("se"),
            F.round((F.col("ma") - F.col("mb")) / se, 6).alias("q_stat"),
        )
    )


# ---------------------------------------------------------------------------
# X386 — Cronbach's alpha
# ---------------------------------------------------------------------------


@query(
    "q_cronbach_alpha",
    oracle="""
    WITH unit AS (
      SELECT user_id, date_trunc('day', ts) AS d, event_type,
             CAST(count(*) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2, 3
    ), units AS (
      SELECT count(DISTINCT (user_id, d)) AS nu FROM unit
    ), item_var AS (
      SELECT event_type,
             (sum(x * x) - sum(x) * sum(x) / any_value(u.nu))
               / (any_value(u.nu) - 1) AS vi
      FROM unit CROSS JOIN units u GROUP BY event_type
    ), total AS (
      SELECT user_id, d, sum(x) AS tot FROM unit GROUP BY user_id, d
    ), tot_var AS (
      SELECT (sum(tot * tot) - sum(tot) * sum(tot) / any_value(u.nu))
               / (any_value(u.nu) - 1) AS vt
      FROM total CROSS JOIN units u
    )
    SELECT CAST((SELECT nu FROM units) AS BIGINT) AS n_units,
           CAST((SELECT count(*) FROM item_var) AS BIGINT) AS k_items,
           round((SELECT sum(vi) FROM item_var), 6) AS sum_item_var,
           round((SELECT vt FROM tot_var), 6) AS total_var,
           round((SELECT count(*) FROM item_var) * 1.0
                 / ((SELECT count(*) FROM item_var) - 1)
                 * (1 - (SELECT sum(vi) FROM item_var)
                      / (SELECT vt FROM tot_var)), 6) AS cronbach_alpha
    """,
)
def q_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X386 — Cronbach's alpha internal-consistency coefficient
    treating the five per-type activity counts of each user-day as
    items of one 'engagement' scale: α = k/(k−1)·(1 − Σσᵢ²/σ_total²).
    The classical reliability gate before anyone averages the items
    into a single score (X156's RFM does exactly that averaging).
    Variances use the ZERO-INCLUSIVE unit count (sums over present
    rows, moments against all n_units) so the sparse grid needs no
    densification — one rollup each for items and totals."""
    e = load(spark, sf_dir, "events")
    unit = e.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("d"), "event_type"
    ).agg(F.count("*").cast("double").alias("x"))
    units = unit.select("user_id", "d").distinct().agg(
        F.count("*").alias("nu")
    )
    iv = (
        unit.crossJoin(F.broadcast(units))
        .groupBy("event_type")
        .agg(
            (
                (
                    F.sum(F.col("x") * F.col("x"))
                    - F.sum("x") * F.sum("x") / F.any_value("nu")
                )
                / (F.any_value("nu") - 1)
            ).alias("vi")
        )
    )
    total = unit.groupBy("user_id", "d").agg(F.sum("x").alias("tot"))
    tv = total.crossJoin(F.broadcast(units)).agg(
        (
            (
                F.sum(F.col("tot") * F.col("tot"))
                - F.sum("tot") * F.sum("tot") / F.any_value("nu")
            )
            / (F.any_value("nu") - 1)
        ).alias("vt")
    )
    ivs = iv.agg(
        F.count("*").alias("k"), F.sum("vi").alias("svi")
    )
    return (
        ivs.crossJoin(F.broadcast(tv))
        .crossJoin(F.broadcast(units))
        .select(
            F.col("nu").cast("long").alias("n_units"),
            F.col("k").cast("long").alias("k_items"),
            F.round("svi", 6).alias("sum_item_var"),
            F.round("vt", 6).alias("total_var"),
            F.round(
                F.col("k")
                * 1.0
                / (F.col("k") - 1)
                * (1 - F.col("svi") / F.col("vt")),
                6,
            ).alias("cronbach_alpha"),
        )
    )


# ---------------------------------------------------------------------------
# X387 — sample-ratio mismatch (SRM) check
# ---------------------------------------------------------------------------


@query(
    "q_srm",
    oracle=f"""
    WITH arms AS (
      SELECT user_id % 2 AS arm, count(DISTINCT user_id) AS n
      FROM events GROUP BY 1
    ), s AS (
      SELECT sum(n) AS nt,
             sum(CASE WHEN arm = 0 THEN n END) AS n0,
             sum(CASE WHEN arm = 1 THEN n END) AS n1
      FROM arms
    ), z AS (
      SELECT nt, n0, n1,
             (n0 - nt * 0.5) / sqrt(nt * 0.5 * 0.5) AS z
      FROM s
    )
    SELECT CAST(nt AS BIGINT) AS n_total, CAST(n0 AS BIGINT) AS n_arm0,
           CAST(n1 AS BIGINT) AS n_arm1,
           round(n0 * 1.0 / nt, 6) AS ratio_arm0,
           round(z, 6) AS z_stat,
           round(1 - {_ERF_SQL.format(z='abs(z)')}, 8) AS p_value,
           round(1 - {_ERF_SQL.format(z='abs(z)')}, 8) < 0.001 AS srm_flag
    FROM z
    """,
)
def q_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X387 — sample-ratio-mismatch guard for a 50/50 hash assignment
    (user_id % 2): exact binomial z against the designed ratio with
    the two-sided p from the shared A&S erf polynomial, flagged at the
    industry-standard p<0.001 — the validity check that must pass
    BEFORE X199/X326/X336 readouts mean anything (Kohavi's first
    diagnostic). One distinct-user rollup, scalar algebra after."""
    arms = (
        load(spark, sf_dir, "events")
        .groupBy((F.col("user_id") % 2).alias("arm"))
        .agg(F.countDistinct("user_id").alias("n"))
    )
    s = arms.agg(
        F.sum("n").alias("nt"),
        F.sum(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.sum(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
    )
    z = (F.col("n0") - F.col("nt") * 0.5) / F.sqrt(
        F.col("nt") * 0.5 * 0.5
    )
    p = F.round(_p_two_sided(z), 8)
    return s.select(
        F.col("nt").cast("long").alias("n_total"),
        F.col("n0").cast("long").alias("n_arm0"),
        F.col("n1").cast("long").alias("n_arm1"),
        F.round(F.col("n0") * 1.0 / F.col("nt"), 6).alias("ratio_arm0"),
        F.round(z, 6).alias("z_stat"),
        p.alias("p_value"),
        (p < 0.001).alias("srm_flag"),
    )


# ---------------------------------------------------------------------------
# X388 — Poisson rate-ratio test (two periods)
# ---------------------------------------------------------------------------


@query(
    "q_rate_ratio",
    oracle="""
    WITH b AS (SELECT min(ts) AS lo, max(ts) AS hi FROM events),
    split AS (
      SELECT e.event_type,
             CASE WHEN epoch(e.ts) - epoch(b.lo)
                       < (epoch(b.hi) - epoch(b.lo)) / 2
                  THEN 0 ELSE 1 END AS half
      FROM events e CROSS JOIN b
    ), c AS (
      SELECT event_type,
             sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS n1,
             sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS n2
      FROM split GROUP BY event_type
    )
    SELECT event_type, CAST(n1 AS BIGINT) AS n_first_half,
           CAST(n2 AS BIGINT) AS n_second_half,
           round(n2 * 1.0 / n1, 6) AS rate_ratio,
           round(ln(n2 * 1.0 / n1)
                 / sqrt(1.0 / n1 + 1.0 / n2), 6) AS z_stat
    FROM c
    """,
)
def q_rate_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X388 — Poisson rate-ratio test per event type between the first
    and second half of the observation horizon (equal exposure):
    z = ln(n₂/n₁)/√(1/n₁+1/n₂), the delta-method log-rate contrast —
    the 'did the error rate move after the deploy' question in its
    exact-exposure form (X178's z-score flags single hours; this
    compares eras). One broadcast of the horizon bounds, one grouped
    fold."""
    e = load(spark, sf_dir, "events")
    b = e.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
    split = e.crossJoin(F.broadcast(b)).select(
        "event_type",
        F.when(
            F.unix_micros("ts") - F.unix_micros("lo")
            < (F.unix_micros("hi") - F.unix_micros("lo")) / 2,
            0,
        )
        .otherwise(1)
        .alias("half"),
    )
    c = split.groupBy("event_type").agg(
        F.sum((F.col("half") == 0).cast("int")).alias("n1"),
        F.sum((F.col("half") == 1).cast("int")).alias("n2"),
    )
    rr = F.col("n2") * 1.0 / F.col("n1")
    return c.select(
        "event_type",
        F.col("n1").cast("long").alias("n_first_half"),
        F.col("n2").cast("long").alias("n_second_half"),
        F.round(rr, 6).alias("rate_ratio"),
        F.round(
            F.log(rr) / F.sqrt(1.0 / F.col("n1") + 1.0 / F.col("n2")), 6
        ).alias("z_stat"),
    )


# ---------------------------------------------------------------------------
# X389 — binary-segmentation changepoint localization
# ---------------------------------------------------------------------------


@query(
    "q_binary_segmentation",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', l_shipdate) AS DATE) AS d,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev
      FROM lineitem GROUP BY 1
    ), idx AS (
      SELECT d, rev, row_number() OVER (ORDER BY d) AS i,
             count(*) OVER () AS n,
             sum(rev) OVER (ORDER BY d) AS ps,
             sum(rev * rev) OVER (ORDER BY d) AS pss
      FROM daily
    ), tot AS (
      SELECT max(ps) AS ts, max(pss) AS tss, max(n) AS n FROM idx
    ), splits AS (
      SELECT x.d, x.i, t.n,
             (x.pss - x.ps * x.ps / x.i)
             + ((t.tss - x.pss)
                - (t.ts - x.ps) * (t.ts - x.ps) / (t.n - x.i)) AS sse,
             t.tss - t.ts * t.ts / t.n AS sse0,
             x.ps / x.i AS mean_left,
             (t.ts - x.ps) / (t.n - x.i) AS mean_right
      FROM idx x CROSS JOIN tot t
      WHERE x.i >= 10 AND x.i <= t.n - 10
    )
    SELECT d AS split_date, CAST(i AS BIGINT) AS split_index,
           CAST(n AS BIGINT) AS n_days,
           round(mean_left, 2) AS mean_before,
           round(mean_right, 2) AS mean_after,
           round((sse0 - sse) / 1000, 0) AS sse_reduction_k,
           round((sse0 - sse) / sse0, 6) AS var_explained
    FROM (SELECT *, row_number() OVER
            (ORDER BY round(sse, 2), d) AS rn FROM splits)
    WHERE rn = 1
    """,
)
def q_binary_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X389 — single-split binary segmentation over the daily revenue
    series: the split date minimizing SSE_left + SSE_right (computed
    for every candidate from ONE pass of prefix sums — no per-split
    rescan), with segment means and variance explained. This
    LOCALIZES the changepoint X210's CUSUM only detects; iterating on
    each segment is the classic full algorithm, and each iteration is
    exactly this plan. Min-10-day edge margin; argmin on the rounded
    SSE so both engines cut ULP-ties identically."""
    daily = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.to_date(F.date_trunc("day", "l_shipdate")).alias("d"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            ).alias("rev")
        )
    )
    wo = Window.orderBy("d")
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    idx = daily.select(
        "d",
        "rev",
        F.row_number().over(wo).alias("i"),
        F.count("*").over(wall).alias("n"),
        F.sum("rev").over(wo).alias("ps"),
        F.sum(F.col("rev") * F.col("rev")).over(wo).alias("pss"),
    )
    tot = idx.agg(
        F.max("ps").alias("ts"),
        F.max("pss").alias("tss"),
        F.max("n").alias("nn"),
    )
    j = idx.crossJoin(F.broadcast(tot)).filter(
        (F.col("i") >= 10) & (F.col("i") <= F.col("nn") - 10)
    )
    sse = (
        F.col("pss") - F.col("ps") * F.col("ps") / F.col("i")
    ) + (
        (F.col("tss") - F.col("pss"))
        - (F.col("ts") - F.col("ps"))
        * (F.col("ts") - F.col("ps"))
        / (F.col("nn") - F.col("i"))
    )
    sse0 = F.col("tss") - F.col("ts") * F.col("ts") / F.col("nn")
    splits = j.select(
        "d",
        "i",
        F.col("nn").alias("n"),
        sse.alias("sse"),
        sse0.alias("sse0"),
        (F.col("ps") / F.col("i")).alias("mean_left"),
        (
            (F.col("ts") - F.col("ps")) / (F.col("nn") - F.col("i"))
        ).alias("mean_right"),
    )
    wr = Window.orderBy(F.round("sse", 2), "d")
    return (
        splits.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            F.col("d").alias("split_date"),
            F.col("i").cast("long").alias("split_index"),
            F.col("n").cast("long").alias("n_days"),
            F.round("mean_left", 2).alias("mean_before"),
            F.round("mean_right", 2).alias("mean_after"),
            F.round((F.col("sse0") - F.col("sse")) / 1000, 0).alias(
                "sse_reduction_k"
            ),
            F.round(
                (F.col("sse0") - F.col("sse")) / F.col("sse0"), 6
            ).alias("var_explained"),
        )
    )


# ---------------------------------------------------------------------------
# X390 — top session paths
# ---------------------------------------------------------------------------


@query(
    "q_top_paths",
    oracle="""
    WITH seq AS (
      SELECT user_id, date_trunc('day', ts) AS d, event_type,
             row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                                ORDER BY ts, event_id) AS step
      FROM events
    ), paths AS (
      SELECT user_id, d,
             string_agg(event_type, '>' ORDER BY step) AS path
      FROM seq WHERE step <= 4 GROUP BY user_id, d
    ), counted AS (
      SELECT path, count(*) AS n_sessions FROM paths GROUP BY path
    )
    SELECT path, CAST(n_sessions AS BIGINT) AS n_sessions,
           round(n_sessions * 1.0
                 / (SELECT sum(n_sessions) FROM counted), 6) AS share
    FROM (SELECT *, row_number() OVER
            (ORDER BY n_sessions DESC, path) AS rn FROM counted)
    WHERE rn <= 20
    """,
)
def q_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X390 — top-20 session paths: the ordered first-4-event
    signature of every user-day session, counted and share-normalized
    — the Sankey/user-flow rollup (the aggregate view X97's CEP
    matches one pattern at a time against, and the input X110's
    transition matrix marginalizes). Path assembly is an ordered
    string_agg per session key; the heavy table collapses to one row
    per session before any global work."""
    seq = load(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("day", "ts").alias("d"),
        "event_type",
        F.row_number()
        .over(
            Window.partitionBy(
                "user_id", F.date_trunc("day", "ts")
            ).orderBy("ts", "event_id")
        )
        .alias("step"),
    )
    paths = (
        seq.filter(F.col("step") <= 4)
        .groupBy("user_id", "d")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("step", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    counted = paths.groupBy("path").agg(F.count("*").alias("n_sessions"))
    tot = counted.agg(F.sum("n_sessions").alias("t"))
    wr = Window.orderBy(F.col("n_sessions").desc(), "path")
    return (
        counted.crossJoin(F.broadcast(tot))
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 20)
        .select(
            "path",
            F.col("n_sessions").cast("long").alias("n_sessions"),
            F.round(F.col("n_sessions") * 1.0 / F.col("t"), 6).alias(
                "share"
            ),
        )
    )


# ---------------------------------------------------------------------------
# X391 — word burstiness (Church-Gale)
# ---------------------------------------------------------------------------


@query(
    "q_word_burstiness",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({text.tokens_sql('text')}) AS w
      FROM documents
    ), stats AS (
      SELECT w, count(*) AS cf, count(DISTINCT doc_id) AS df
      FROM tok GROUP BY w
    ), nd AS (SELECT count(*) AS n_docs FROM documents)
    SELECT w AS term, CAST(cf AS BIGINT) AS collection_freq,
           CAST(df AS BIGINT) AS doc_freq,
           round(cf * 1.0 / df, 6) AS burstiness,
           round(ln(nd.n_docs * 1.0 / df), 6) AS idf
    FROM (SELECT *, row_number() OVER
            (ORDER BY cf * 1.0 / df DESC, w) AS rn
          FROM stats WHERE df >= 5) CROSS JOIN nd
    WHERE rn <= 30
    """,
)
def q_word_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X391 — word burstiness (Church & Gale): collection frequency
    over document frequency per term — a word that appears 50 times in
    5 docs is topical; 50 times in 50 docs is functional. The
    complement of IDF that X34's TF-IDF and X111's BM25 both fold away,
    and the signal behind content-word keyword extraction (X170).
    Top-30 burstiest terms at df≥5; the ratio is an exact rational so
    the rank cut is tie-deterministic. One token explode + one
    combinable term rollup."""
    tok = load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(text.tokens(F.col("text"))).alias("w")
    )
    stats = tok.groupBy("w").agg(
        F.count("*").alias("cf"), F.countDistinct("doc_id").alias("df")
    )
    nd = load(spark, sf_dir, "documents").agg(
        F.count("*").alias("n_docs")
    )
    wr = Window.orderBy(
        (F.col("cf") * 1.0 / F.col("df")).desc(), "w"
    )
    return (
        stats.filter(F.col("df") >= 5)
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 30)
        .crossJoin(F.broadcast(nd))
        .select(
            F.col("w").alias("term"),
            F.col("cf").cast("long").alias("collection_freq"),
            F.col("df").cast("long").alias("doc_freq"),
            F.round(F.col("cf") * 1.0 / F.col("df"), 6).alias(
                "burstiness"
            ),
            F.round(F.log(F.col("n_docs") * 1.0 / F.col("df")), 6).alias(
                "idf"
            ),
        )
    )


# ---------------------------------------------------------------------------
# X392 — lexical richness (TTR / Herdan's C)
# ---------------------------------------------------------------------------


@query(
    "q_lexical_richness",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, unnest({text.tokens_sql('text')}) AS w
      FROM documents
    ), per_doc AS (
      SELECT doc_id, any_value(lang) AS lang,
             count(*) AS n_tok, count(DISTINCT w) AS n_types
      FROM tok GROUP BY doc_id
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(n_types * 1.0 / n_tok), 6) AS mean_ttr,
           round(avg(ln(n_types) / ln(n_tok)), 6) AS mean_herdan_c,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           CAST(sum(n_types) AS BIGINT) AS total_types_per_doc
    FROM per_doc WHERE n_tok > 1 GROUP BY lang
    """,
)
def q_lexical_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X392 — lexical richness per language: per-doc type-token ratio
    and Herdan's C = ln(V)/ln(N) (the length-robust variant — raw TTR
    falls mechanically with doc length, which is why both are
    reported), averaged per language. The vocabulary-growth diagnostic
    behind X243's Zipf fit and X288's vocab coverage. One token
    explode, one per-doc rollup, one language fold."""
    tok = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.explode(text.tokens(F.col("text"))).alias("w")
    )
    per_doc = tok.groupBy("doc_id").agg(
        F.any_value("lang").alias("lang"),
        F.count("*").alias("n_tok"),
        F.countDistinct("w").alias("n_types"),
    )
    return (
        per_doc.filter(F.col("n_tok") > 1)
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(
                F.avg(F.col("n_types") * 1.0 / F.col("n_tok")), 6
            ).alias("mean_ttr"),
            F.round(
                F.avg(F.log("n_types") / F.log("n_tok")), 6
            ).alias("mean_herdan_c"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            F.sum("n_types").cast("long").alias("total_types_per_doc"),
        )
    )
