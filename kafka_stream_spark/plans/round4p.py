"""Round-4 batch P: graph ranking, spatial hotspots, and corpus-span
dedup (X377-X384).

Completes three families the engine already hosts: HITS joins PageRank
(X74) and label propagation (X174) as the bipartite-ranking member of
the iterative-graph set; Getis-Ord joins the geo battery (X208-X209) as
the hotspot-significance layer; and the exact-substring span detector
(Lee et al. 2021, "Deduplicating Training Data Makes Language Models
Better" — the public method, re-expressed as grams+islands) extends
X91's duplicate-gram FRACTION with the positional spans an actual
dedup pass removes. Plus Markov entropy rate over X110's transitions,
neighbor-set Jaccard link scoring, tokenizer fertility, sentence
statistics, and traffic burstiness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text
from ..sources.tables import load
from .geo import _POINTS_SQL, _points
from .registry import query

# ---------------------------------------------------------------------------
# X377 — HITS hubs & authorities
# ---------------------------------------------------------------------------

_DIR_EDGES_SQL = """
    e0 AS (
      SELECT DISTINCT l.l_suppkey * 2 AS a, o.o_custkey * 2 + 1 AS b
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
"""


@query(
    "q_hits",
    oracle=f"""
    WITH {_DIR_EDGES_SQL},
    hub0 AS (SELECT DISTINCT a, 1.0 AS h FROM e0),
    a1r AS (SELECT e0.b, sum(h.h) AS s FROM e0
            JOIN hub0 h ON e0.a = h.a GROUP BY e0.b),
    a1 AS (SELECT b, s / (SELECT sum(s) FROM a1r) AS s FROM a1r),
    h1r AS (SELECT e0.a, sum(a1.s) AS s FROM e0
            JOIN a1 ON e0.b = a1.b GROUP BY e0.a),
    h1 AS (SELECT a, s / (SELECT sum(s) FROM h1r) AS s FROM h1r),
    a2r AS (SELECT e0.b, sum(h1.s) AS s FROM e0
            JOIN h1 ON e0.a = h1.a GROUP BY e0.b),
    a2 AS (SELECT b, s / (SELECT sum(s) FROM a2r) AS s FROM a2r),
    h2r AS (SELECT e0.a, sum(a2.s) AS s FROM e0
            JOIN a2 ON e0.b = a2.b GROUP BY e0.a),
    h2 AS (SELECT a, s / (SELECT sum(s) FROM h2r) AS s FROM h2r),
    ranked AS (
      SELECT 'hub' AS role, a AS node_id, round(s, 8) AS score,
             row_number() OVER (ORDER BY round(s, 8) DESC, a) AS rnk
      FROM h2
      UNION ALL
      SELECT 'authority', b, round(s, 8),
             row_number() OVER (ORDER BY round(s, 8) DESC, b)
      FROM a2
    )
    SELECT role, CAST(node_id AS BIGINT) AS node_id, score,
           CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 10
    """,
)
def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X377 — HITS (Kleinberg) hubs & authorities over the DIRECTED
    supplier→customer shipment graph: two full unrolled iterations of
    auth(b)=Σhub(a), hub(a)=Σauth(b) with L1 normalization each half
    step (broadcast scalar divisions — no per-node normalization
    shuffle), emitting the top-10 of each role. The bipartite-ranking
    sibling of X74's PageRank: each half-step is one edge⋈score join +
    one node-keyed aggregate, the distributed superstep shape. Final
    ranking cuts on the ROUNDED score so both engines order ULP-equal
    values identically."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    e0 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            (F.col("l_suppkey") * 2).alias("a"),
            (F.col("o_custkey") * 2 + 1).alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    hub = e0.select("a").distinct().withColumn("h", F.lit(1.0))

    def half_step(
        scores: DataFrame, key: str, out_key: str, col: str
    ) -> DataFrame:
        raw = (
            e0.join(scores, key)
            .groupBy(out_key)
            .agg(F.sum(col).alias("s"))
            # raw feeds the L1-total broadcast AND the normalized
            # output: un-materialized, each half-step's edge⋈score join
            # ran twice (guide §2.4); the frame is node-sized
            .localCheckpoint(eager=True)
        )
        tot = raw.agg(F.sum("s").alias("t"))
        return raw.crossJoin(F.broadcast(tot)).select(
            out_key, (F.col("s") / F.col("t")).alias("s")
        )

    a1 = half_step(hub.withColumnRenamed("h", "s"), "a", "b", "s")
    h1 = half_step(a1, "b", "a", "s")
    a2 = half_step(h1, "a", "b", "s").localCheckpoint(eager=True)
    h2 = half_step(a2, "b", "a", "s")
    hubs = h2.select(
        F.lit("hub").alias("role"),
        F.col("a").alias("node_id"),
        F.round("s", 8).alias("score"),
    )
    auths = a2.select(
        F.lit("authority").alias("role"),
        F.col("b").alias("node_id"),
        F.round("s", 8).alias("score"),
    )
    w = Window.partitionBy("role").orderBy(F.col("score").desc(), "node_id")
    return (
        hubs.unionByName(auths)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select(
            "role",
            F.col("node_id").cast("long").alias("node_id"),
            "score",
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


# ---------------------------------------------------------------------------
# X378 — Markov-chain entropy rate
# ---------------------------------------------------------------------------


@query(
    "q_entropy_rate",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ), t AS (
      SELECT prev_type AS s, event_type AS nxt, count(*) AS n
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
    ), st AS (
      SELECT s, sum(n) AS ns FROM t GROUP BY s
    ), h AS (
      SELECT t.s, any_value(st.ns) AS ns,
             -sum((t.n * 1.0 / st.ns) * log2(t.n * 1.0 / st.ns)) AS hc
      FROM t JOIN st USING (s) GROUP BY t.s
    ), tot AS (SELECT sum(ns) AS nn FROM h)
    SELECT h.s AS state, CAST(h.ns AS BIGINT) AS n_out,
           round(h.ns * 1.0 / t2.nn, 6) AS pi,
           round(h.hc, 6) AS h_cond_bits,
           round(sum(h.ns * 1.0 / t2.nn * h.hc) OVER (), 6)
             AS entropy_rate_bits
    FROM h CROSS JOIN tot t2
    """,
)
def q_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X378 — entropy rate of the per-user event-type Markov chain:
    H = Σ_s π_s · H(next|s) in bits, with π the empirical state
    occupancy — the single-number predictability summary of X110's
    transition matrix (max log2(k) = memoryless uniform, 0 = fully
    deterministic sessions). Same (ts, event_id) ordering convention
    as X110. One lag pass, then all algebra on the k×k transition
    table."""
    seq = load(spark, sf_dir, "events").select(
        "event_type",
        F.lag("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev_type"),
    )
    t = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("s"), F.col("event_type").alias("nxt"))
        .agg(F.count("*").alias("n"))
    )
    st = t.groupBy("s").agg(F.sum("n").alias("ns"))
    p = F.col("n") * 1.0 / F.col("ns")
    h = (
        t.join(F.broadcast(st), "s")
        .groupBy("s")
        .agg(
            F.any_value("ns").alias("ns"),
            (-F.sum(p * F.log2(p))).alias("hc"),
        )
    )
    tot = h.agg(F.sum("ns").alias("nn"))
    pi = F.col("ns") * 1.0 / F.col("nn")
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return h.crossJoin(F.broadcast(tot)).select(
        F.col("s").alias("state"),
        F.col("ns").cast("long").alias("n_out"),
        F.round(pi, 6).alias("pi"),
        F.round("hc", 6).alias("h_cond_bits"),
        F.round(F.sum(pi * F.col("hc")).over(wall), 6).alias(
            "entropy_rate_bits"
        ),
    )


# ---------------------------------------------------------------------------
# X379 — neighbor-set Jaccard link scoring
# ---------------------------------------------------------------------------


@query(
    "q_jaccard_neighbors",
    oracle=f"""
    WITH {_DIR_EDGES_SQL},
    sym AS (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
    deg AS (SELECT a, count(*) AS d FROM sym GROUP BY a),
    wedge AS (
      SELECT s.a, s.b FROM sym s JOIN deg ON s.a = deg.a
      WHERE deg.d <= 128
    ), cn AS (
      SELECT x.b AS u, y.b AS v, count(*) AS common
      FROM wedge x JOIN wedge y ON x.a = y.a AND x.b < y.b
      GROUP BY x.b, y.b
    ), j AS (
      SELECT cn.u, cn.v, cn.common, du.d AS du, dv.d AS dv,
             round(cn.common * 1.0 / (du.d + dv.d - cn.common), 6) AS jac
      FROM cn JOIN deg du ON cn.u = du.a JOIN deg dv ON cn.v = dv.a
    )
    SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v,
           CAST(common AS BIGINT) AS common_neighbors,
           CAST(du AS BIGINT) AS deg_u, CAST(dv AS BIGINT) AS deg_v, jac
    FROM (SELECT *, row_number() OVER (ORDER BY jac DESC, u, v) AS rn
          FROM j)
    WHERE rn <= 20
    """,
)
def q_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X379 — neighbor-set Jaccard link prediction on the symmetrized
    shipment graph: J(u,v) = |N(u)∩N(v)| / |N(u)∪N(v)| for every pair
    with ≥1 common neighbor (the wedge join — candidate pairs are
    generated THROUGH shared neighbors, never all-pairs), top-20.
    Wedge CENTERS are hub-capped at degree ≤128: a center of degree d
    emits d² wedge rows, so super-nodes dominate cost while adding
    near-zero Jaccard signal (a shared hub neighbor barely raises
    J between two of its thousands of spokes) — the same
    frequency-band discipline as X180's PMI stopword guard, and what
    makes the join hold at 100 TB (measured: the uncapped form
    GC-thrashed the 8× scale probe; capped it is linear in edges).
    Degree-normalized where X232's Adamic-Adar is rarity-weighted.
    Ranking cuts on the exact rational (integer-derived) score."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    e0 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            (F.col("l_suppkey") * 2).alias("a"),
            (F.col("o_custkey") * 2 + 1).alias("b"),
        )
        .distinct()
    )
    sym = e0.union(
        e0.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    deg = sym.groupBy("a").agg(F.count("*").alias("d"))
    wedge = sym.join(
        F.broadcast(deg.filter(F.col("d") <= 128)).select("a"), "a"
    )
    x = wedge.select(F.col("a").alias("n"), F.col("b").alias("u"))
    y = wedge.select(F.col("a").alias("n"), F.col("b").alias("v"))
    cn = (
        x.join(y, "n")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("common"))
    )
    j = (
        cn.join(
            F.broadcast(deg.select(F.col("a").alias("u"), F.col("d").alias("du"))),
            "u",
        )
        .join(
            F.broadcast(deg.select(F.col("a").alias("v"), F.col("d").alias("dv"))),
            "v",
        )
        .select(
            "u",
            "v",
            "common",
            "du",
            "dv",
            F.round(
                F.col("common")
                * 1.0
                / (F.col("du") + F.col("dv") - F.col("common")),
                6,
            ).alias("jac"),
        )
    )
    w = Window.orderBy(F.col("jac").desc(), "u", "v")
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select(
            F.col("u").cast("long").alias("u"),
            F.col("v").cast("long").alias("v"),
            F.col("common").cast("long").alias("common_neighbors"),
            F.col("du").cast("long").alias("deg_u"),
            F.col("dv").cast("long").alias("deg_v"),
            "jac",
        )
    )


# ---------------------------------------------------------------------------
# X380 — Getis-Ord Gi* hotspot z-scores
# ---------------------------------------------------------------------------


@query(
    "q_hotspot_gi",
    oracle=f"""
    WITH pts AS ({_POINTS_SQL}),
    cells AS (
      SELECT CAST(floor(lat / 10) AS BIGINT) AS cy,
             CAST(floor(lon / 10) AS BIGINT) AS cx,
             CAST(count(*) AS DOUBLE) AS x
      FROM pts GROUP BY 1, 2
    ), stats AS (
      SELECT count(*) AS n, avg(x) AS xbar,
             sqrt((sum(x * x) - count(*) * avg(x) * avg(x))
                  / (count(*) - 1)) AS s
      FROM cells
    ), nb AS (
      SELECT c.cy, c.cx, sum(o.x) AS wsum, count(*) AS wi
      FROM cells c JOIN cells o
        ON abs(c.cy - o.cy) <= 1 AND abs(c.cx - o.cx) <= 1
      GROUP BY c.cy, c.cx
    )
    SELECT nb.cy AS lat_cell, nb.cx AS lon_cell,
           CAST(c.x AS BIGINT) AS n_points,
           CAST(nb.wsum AS BIGINT) AS neighbor_sum,
           CAST(nb.wi AS BIGINT) AS w_i,
           round((nb.wsum - st.xbar * nb.wi)
                 / (st.s * sqrt((st.n * nb.wi - nb.wi * nb.wi * 1.0)
                                / (st.n - 1))), 4) AS gi_z
    FROM nb JOIN cells c ON nb.cy = c.cy AND nb.cx = c.cx
    CROSS JOIN stats st
    """,
)
def q_hotspot_gi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X380 — Getis-Ord Gi* hotspot statistic on the 10°×10° grid:
    z-score of each cell's 3×3 neighborhood sum against the global
    cell distribution (binary weights over OBSERVED cells) — the
    spatial-significance layer over X209's raw tile counts: |z|>1.96
    marks hot/cold spots a choropleth of counts can't defend. The
    neighbor join runs on the ~bounded cell table (≤648 cells at any
    data scale), never on points; one grouped scan collapses points to
    cells first."""
    pts = _points(spark, sf_dir)
    cells = (
        pts.groupBy(
            F.floor(F.col("lat") / 10).cast("long").alias("cy"),
            F.floor(F.col("lon") / 10).cast("long").alias("cx"),
        )
        .agg(F.count("*").cast("double").alias("x"))
        .localCheckpoint(eager=True)
    )
    stats = cells.agg(
        F.count("*").alias("n"),
        F.avg("x").alias("xbar"),
        F.sqrt(
            (
                F.sum(F.col("x") * F.col("x"))
                - F.count("*") * F.avg("x") * F.avg("x")
            )
            / (F.count("*") - 1)
        ).alias("s"),
    )
    o = cells.select(
        F.col("cy").alias("oy"), F.col("cx").alias("ox"), F.col("x").alias("ox_v")
    )
    nb = (
        cells.join(
            F.broadcast(o),
            (F.abs(F.col("cy") - F.col("oy")) <= 1)
            & (F.abs(F.col("cx") - F.col("ox")) <= 1),
        )
        .groupBy("cy", "cx")
        .agg(F.sum("ox_v").alias("wsum"), F.count("*").alias("wi"))
    )
    j = (
        nb.join(cells, ["cy", "cx"])
        .crossJoin(F.broadcast(stats))
    )
    gi = (F.col("wsum") - F.col("xbar") * F.col("wi")) / (
        F.col("s")
        * F.sqrt(
            (F.col("n") * F.col("wi") - F.col("wi") * F.col("wi") * 1.0)
            / (F.col("n") - 1)
        )
    )
    return j.select(
        F.col("cy").alias("lat_cell"),
        F.col("cx").alias("lon_cell"),
        F.col("x").cast("long").alias("n_points"),
        F.col("wsum").cast("long").alias("neighbor_sum"),
        F.col("wi").cast("long").alias("w_i"),
        F.round(gi, 4).alias("gi_z"),
    )


# ---------------------------------------------------------------------------
# X381 — exact-substring duplicated spans (Lee et al. 2021 shape)
# ---------------------------------------------------------------------------


@query(
    "q_substring_dedup",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), grams AS (
      SELECT doc_id, i, array_to_string(w[i:i + 4], ' ') AS gram
      FROM (SELECT doc_id, w,
                   unnest(generate_series(1, len(w) - 4)) AS i
            FROM w)
    ), df AS (
      SELECT gram, count(DISTINCT doc_id) AS ndocs
      FROM grams GROUP BY gram
    ), dup AS (
      SELECT g.doc_id, g.i FROM grams g
      JOIN df ON g.gram = df.gram WHERE df.ndocs >= 2
    ), isl AS (
      SELECT doc_id, i,
             CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i)
                       >= 5 THEN 1 ELSE 0 END AS brk
      FROM dup
    ), grp AS (
      SELECT doc_id, i,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY i) AS g
      FROM isl
    ), spans AS (
      SELECT doc_id, g, count(*) AS n_grams,
             max(i) - min(i) + 5 AS span_tokens
      FROM grp GROUP BY doc_id, g
    ), per_doc AS (
      SELECT s.doc_id, sum(s.n_grams) AS n_dup_positions,
             count(*) AS n_spans, max(s.span_tokens) AS longest_span,
             sum(s.span_tokens) AS covered_tokens
      FROM spans s GROUP BY s.doc_id
    ), toks AS (
      SELECT doc_id, len(w) AS n_tokens FROM w
    ), scored AS (
      SELECT p.doc_id, p.n_dup_positions, p.n_spans, p.longest_span,
             p.covered_tokens,
             round(p.covered_tokens * 1.0 / t.n_tokens, 6) AS dup_frac
      FROM per_doc p JOIN toks t USING (doc_id)
    )
    SELECT doc_id, CAST(n_dup_positions AS BIGINT) AS n_dup_positions,
           CAST(n_spans AS BIGINT) AS n_spans,
           CAST(longest_span AS BIGINT) AS longest_span_tokens,
           CAST(covered_tokens AS BIGINT) AS covered_tokens, dup_frac
    FROM (SELECT *, row_number() OVER
            (ORDER BY dup_frac DESC, doc_id) AS rn FROM scored)
    WHERE rn <= 50
    """,
)
def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X381 — exact-substring duplicate SPANS across documents (the
    operator behind Lee et al. 2021's suffix-array dedup, re-expressed
    Spark-first as 5-gram positions + gaps-and-islands): a gram is
    duplicated if it appears in ≥2 distinct docs; per doc, consecutive
    duplicated positions (gap < 5, so token extents never overlap)
    merge into maximal spans with exact token coverage — the spans a
    removal pass would actually cut, where X91 reports only the
    fraction. Top-50 most-duplicated docs. All keys are (doc_id, int)
    pairs; the only wide shuffle is the gram-df groupBy — the same
    cost profile as X90's decontamination."""
    w = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    grams = w.select(
        "doc_id",
        F.posexplode(
            # guard: Spark's sequence(1, n) DESCENDS for n < 1, unlike
            # DuckDB's empty generate_series — short docs must yield
            # zero grams in both engines
            F.expr(
                "CASE WHEN size(w) >= 5 THEN "
                "transform(sequence(1, size(w) - 4), i -> "
                "array_join(slice(w, i, 5), ' ')) "
                "ELSE array() END"
            )
        ).alias("i0", "gram"),
    ).select(
        "doc_id", (F.col("i0") + 1).alias("i"), "gram"
    )
    df = grams.groupBy("gram").agg(
        F.countDistinct("doc_id").alias("ndocs")
    )
    dup = (
        grams.join(df.filter(F.col("ndocs") >= 2), "gram")
        .select("doc_id", "i")
    )
    wd = Window.partitionBy("doc_id").orderBy("i")
    isl = dup.select(
        "doc_id",
        "i",
        F.when(F.col("i") - F.lag("i").over(wd) >= 5, 1)
        .otherwise(0)
        .alias("brk"),
    )
    grp = isl.select(
        "doc_id", "i", F.sum("brk").over(wd).alias("g")
    )
    spans = grp.groupBy("doc_id", "g").agg(
        F.count("*").alias("n_grams"),
        (F.max("i") - F.min("i") + 5).alias("span_tokens"),
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.sum("n_grams").alias("n_dup_positions"),
        F.count("*").alias("n_spans"),
        F.max("span_tokens").alias("longest_span"),
        F.sum("span_tokens").alias("covered_tokens"),
    )
    toks = w.select("doc_id", F.size("w").alias("n_tokens"))
    scored = per_doc.join(toks, "doc_id").select(
        "doc_id",
        "n_dup_positions",
        "n_spans",
        "longest_span",
        "covered_tokens",
        F.round(
            F.col("covered_tokens") * 1.0 / F.col("n_tokens"), 6
        ).alias("dup_frac"),
    )
    wr = Window.orderBy(F.col("dup_frac").desc(), "doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 50)
        .select(
            "doc_id",
            F.col("n_dup_positions").cast("long").alias("n_dup_positions"),
            F.col("n_spans").cast("long").alias("n_spans"),
            F.col("longest_span").cast("long").alias("longest_span_tokens"),
            F.col("covered_tokens").cast("long").alias("covered_tokens"),
            "dup_frac",
        )
    )


# ---------------------------------------------------------------------------
# X382 — tokenizer fertility by language
# ---------------------------------------------------------------------------


@query(
    "q_tokenizer_fertility",
    oracle=f"""
    WITH per_doc AS (
      SELECT lang,
             len({text.bpe_tokens_sql('text')}) * 1.0
               / len({text.tokens_sql('text')}) AS fert
      FROM documents
      WHERE len({text.tokens_sql('text')}) > 0
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(fert), 6) AS mean_fertility,
           round(CAST(quantile_cont(fert, 0.5) AS DOUBLE), 6)
             AS p50_fertility,
           round(CAST(quantile_cont(fert, 0.9) AS DOUBLE), 6)
             AS p90_fertility
    FROM per_doc GROUP BY lang
    """,
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X382 — tokenizer fertility (BPE-ish tokens per whitespace word)
    per language: the standard multilingual-tokenizer-quality metric —
    high-fertility languages pay more context budget per word, which
    is exactly what X229's mixture weights and X230's padding audit
    need to price. Mean plus exact interpolated p50/p90 per language
    group; one projection scan, one grouped quantile."""
    d = load(spark, sf_dir, "documents")
    per_doc = d.select(
        "lang",
        (
            F.size(text.bpe_tokens(F.col("text")))
            * 1.0
            / F.size(text.tokens(F.col("text")))
        ).alias("fert"),
    ).filter(F.size(text.tokens(F.col("text"))) > 0)
    return per_doc.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.avg("fert"), 6).alias("mean_fertility"),
        F.round(F.expr("percentile(fert, 0.5)"), 6).alias("p50_fertility"),
        F.round(F.expr("percentile(fert, 0.9)"), 6).alias("p90_fertility"),
    )


# ---------------------------------------------------------------------------
# X383 — sentence segmentation statistics
# ---------------------------------------------------------------------------


@query(
    "q_sentence_stats",
    oracle=f"""
    WITH per_doc AS (
      SELECT source,
             greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
               AS n_sent,
             len({text.tokens_sql('text')}) AS n_words
      FROM documents
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(n_sent), 4) AS avg_sentences_per_doc,
           CAST(max(n_sent) AS BIGINT) AS max_sentences,
           round(sum(n_words) * 1.0 / sum(n_sent), 4)
             AS avg_words_per_sentence
    FROM per_doc GROUP BY source
    """,
)
def q_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X383 — sentence-segmentation statistics per source: sentences
    approximated by terminal-punctuation runs ([.!?]+, min 1 per doc),
    words per sentence from the corpus totals — the readability-shape
    profile (X271's readability score consumes exactly these inputs;
    this exposes the distribution it collapses). Pure projection +
    one grouped rollup."""
    d = load(spark, sf_dir, "documents")
    per_doc = d.select(
        "source",
        F.greatest(
            F.size(F.regexp_extract_all("text", F.lit("[.!?]+"), 0)),
            F.lit(1),
        ).alias("n_sent"),
        F.size(text.tokens(F.col("text"))).alias("n_words"),
    )
    return per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.avg("n_sent"), 4).alias("avg_sentences_per_doc"),
        F.max("n_sent").cast("long").alias("max_sentences"),
        F.round(
            F.sum("n_words") * 1.0 / F.sum("n_sent"), 4
        ).alias("avg_words_per_sentence"),
    )


# ---------------------------------------------------------------------------
# X384 — traffic burstiness (Fano factor / CV²)
# ---------------------------------------------------------------------------


@query(
    "q_burstiness",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(count(*) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ), s AS (
      SELECT event_type, count(*) AS n, avg(x) AS m,
             (sum(x * x) - count(*) * avg(x) * avg(x)) / (count(*) - 1)
               AS v,
             max(x) AS mx
      FROM hourly GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_hours,
           round(m, 4) AS mean_per_hour,
           round(v, 4) AS var_per_hour,
           round(v / m, 6) AS fano,
           round(v / (m * m), 6) AS cv2,
           round(mx / m, 4) AS peak_ratio
    FROM s
    """,
)
def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X384 — arrival burstiness per event type on hourly counts: Fano
    factor (var/mean; 1 = Poisson, >1 overdispersed), CV², and the
    peak-to-mean ratio — the three numbers capacity planning reads
    before sizing stream partitions (X351's Little's-law λ assumes the
    smooth case; this measures how wrong that is hour to hour).
    Occupied hours only (the TPC-H-ish feed has no silent hours);
    one grouped collapse to hours, one scalar fold per type."""
    hourly = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hr"))
        .agg(F.count("*").cast("double").alias("x"))
    )
    s = hourly.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.avg("x").alias("m"),
        (
            (
                F.sum(F.col("x") * F.col("x"))
                - F.count("*") * F.avg("x") * F.avg("x")
            )
            / (F.count("*") - 1)
        ).alias("v"),
        F.max("x").alias("mx"),
    )
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n_hours"),
        F.round("m", 4).alias("mean_per_hour"),
        F.round("v", 4).alias("var_per_hour"),
        F.round(F.col("v") / F.col("m"), 6).alias("fano"),
        F.round(F.col("v") / (F.col("m") * F.col("m")), 6).alias("cv2"),
        F.round(F.col("mx") / F.col("m"), 4).alias("peak_ratio"),
    )
