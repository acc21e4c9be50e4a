"""Round-4 breadth, part C: rank-based group tests, language-ID
evaluation, cohort LTV, inter-purchase gaps, graph assortativity and
modularity, new-vs-returning decomposition, DAU/MAU stickiness,
multi-aggregate pivot, arrays_zip/inline, and the composed per-source
dataset card.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import text
from ..sources.tables import load
from .graph_ext import _EDGES_SQL, _edges, _lpa_round_sql
from .registry import query

# ---------------------------------------------------------------------------
# X289 — Kruskal-Wallis rank test
# ---------------------------------------------------------------------------


@query(
    "q_kruskal_wallis",
    oracle="""
    WITH x AS (SELECT source AS g, n_chars AS v FROM documents),
    vals AS (
      SELECT v, count(*) AS cnt FROM x GROUP BY v
    ), ranked AS (
      SELECT v, cnt,
             sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - cnt
               + (cnt + 1) / 2.0 AS midrank
      FROM vals
    ), gsum AS (
      SELECT x.g, count(*) AS n, sum(r.midrank) AS rsum
      FROM x JOIN ranked r ON r.v = x.v GROUP BY x.g
    ), tot AS (
      SELECT sum(n) AS nt,
             (SELECT sum(cnt * cnt * cnt - cnt) FROM vals) AS tieterm
      FROM gsum
    ), h AS (
      SELECT (SELECT count(*) FROM gsum) AS k, tot.nt, tot.tieterm,
             12.0 / (tot.nt * (tot.nt + 1))
               * sum(gsum.rsum * gsum.rsum / gsum.n)
               - 3 * (tot.nt + 1) AS hraw
      FROM gsum CROSS JOIN tot GROUP BY tot.nt, tot.tieterm
    )
    SELECT CAST(k AS BIGINT) AS k_groups, CAST(nt AS BIGINT) AS n_total,
           round(hraw, 6) AS h_stat,
           round(hraw / (1.0 - CAST(tieterm AS DOUBLE)
                               / (CAST(nt AS DOUBLE) * nt * nt - nt)), 6)
             AS h_tie_corrected
    FROM h
    """,
)
def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X289 — Kruskal-Wallis H: the rank-based (distribution-free)
    sibling of X283's ANOVA across the 20 sources, with the standard
    tie correction — what you run when document-length distributions
    are skewed enough that mean-based F is unreliable. Ranks come from
    the COLLAPSED value table (X195's midrank frame: one row per
    distinct value, never a per-row global sort), group rank sums are
    a join + rollup, H is sufficient-statistics arithmetic."""
    x = load(spark, sf_dir, "documents").select(
        F.col("source").alias("g"), F.col("n_chars").alias("v")
    )
    vals = x.groupBy("v").agg(F.count("*").alias("cnt"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    ranked = vals.withColumn(
        "midrank",
        F.sum("cnt").over(w) - F.col("cnt") + (F.col("cnt") + 1) / 2.0,
    )
    gsum = (
        x.join(ranked, "v")
        .groupBy("g")
        .agg(F.count("*").alias("n"), F.sum("midrank").alias("rsum"))
    )
    ties = vals.agg(
        F.sum(
            F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        ).alias("tieterm")
    )
    tot = gsum.agg(F.sum("n").alias("nt")).crossJoin(F.broadcast(ties))
    h = (
        gsum.crossJoin(F.broadcast(tot))
        .groupBy("nt", "tieterm")
        .agg(
            F.count("*").alias("k"),
            (
                F.lit(12.0)
                / (F.col("nt") * (F.col("nt") + 1))
                * F.sum(F.col("rsum") * F.col("rsum") / F.col("n"))
                - 3 * (F.col("nt") + 1)
            ).alias("hraw"),
        )
    )
    nt_d = F.col("nt").cast("double")
    return h.select(
        F.col("k").cast("long").alias("k_groups"),
        F.col("nt").cast("long").alias("n_total"),
        F.round("hraw", 6).alias("h_stat"),
        F.round(
            F.col("hraw")
            / (
                1.0
                - F.col("tieterm").cast("double") / (nt_d * nt_d * nt_d - nt_d)
            ),
            6,
        ).alias("h_tie_corrected"),
    )


# ---------------------------------------------------------------------------
# X290 — language-ID evaluation (confusion matrix over X17's predictor)
# ---------------------------------------------------------------------------


@query(
    "q_langid_eval",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, {text.tokens_sql('text')} AS toks FROM documents
    ), pred AS (
      SELECT lang AS labeled, {text.predict_lang_sql('toks')} AS predicted
      FROM t
    )
    SELECT labeled, predicted, count(*) AS n,
           round(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY labeled),
                 6) AS frac_of_labeled
    FROM pred GROUP BY labeled, predicted
    """,
)
def q_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X290 — evaluation of the X17 language-ID heuristic against the
    labeled lang column as a confusion matrix with per-label row
    fractions — the quality report that decides whether the cheap
    n-gram classifier is good enough to route documents, or a real
    model is needed (the X86/X279 'measure your own pipeline'
    discipline applied to language routing). One projection + one
    rollup + one partitioned ratio window."""
    d = load(spark, sf_dir, "documents")
    pred = d.select(
        F.col("lang").alias("labeled"),
        text.predict_lang(text.tokens(F.col("text"))).alias("predicted"),
    )
    counts = pred.groupBy("labeled", "predicted").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("labeled")
    return counts.withColumn(
        "frac_of_labeled",
        F.round(F.col("n") * 1.0 / F.sum("n").over(w), 6),
    )


# ---------------------------------------------------------------------------
# X291 — cohort lifetime value
# ---------------------------------------------------------------------------


@query(
    "q_cohort_ltv",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             min(year(o_orderdate) * 12 + month(o_orderdate)) AS cm
      FROM orders GROUP BY o_custkey
    ), facts AS (
      SELECT f.cm, (year(o.o_orderdate) * 12 + month(o.o_orderdate)) - f.cm
               AS ms,
             CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS rev
      FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
      WHERE (year(o.o_orderdate) * 12 + month(o.o_orderdate)) - f.cm <= 5
    ), sizes AS (
      SELECT cm, count(*) AS n_cust FROM firsts GROUP BY cm
    ), monthly AS (
      SELECT cm, ms, sum(rev) AS rev FROM facts GROUP BY cm, ms
    ), cum AS (
      SELECT cm, ms, sum(rev) OVER (PARTITION BY cm ORDER BY ms
               ROWS UNBOUNDED PRECEDING) AS cum_rev
      FROM monthly
    )
    SELECT c.cm AS cohort_month, c.ms AS months_since,
           s.n_cust AS cohort_size,
           round(c.cum_rev / 100.0 / s.n_cust, 2) AS ltv_per_customer
    FROM cum c JOIN sizes s ON s.cm = c.cm
    WHERE c.cm < 24020
    """,
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X291 — cohort lifetime value: customers grouped by first-order
    month, cumulative revenue per customer tracked for the first 6
    months of each cohort — the X45 retention row's revenue sibling
    and the canonical 'LTV curve' every subscription/commerce analysis
    draws. Month keys are year*12+month integers so both engines share
    the calendar arithmetic; the cohort cut (cm < 24020 ≈ 2002-01)
    drops the partial trailing cohorts. One first-order rollup, one
    fact join, a partitioned running sum over the 6-point grain."""
    o = load(spark, sf_dir, "orders")
    mkey = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    firsts = o.groupBy("o_custkey").agg(F.min(mkey).alias("cm"))
    facts = (
        o.join(firsts, "o_custkey")
        .select(
            "cm",
            (mkey - F.col("cm")).alias("ms"),
            # integer cents: per-row rounding is deterministic, and every
            # downstream sum is then exact — the unrounded double path
            # left cum_rev/n on a .005 rounding boundary that the two
            # engines' combine orders resolved differently
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("rev"),
        )
        .filter(F.col("ms") <= 5)
    )
    sizes = firsts.groupBy("cm").agg(F.count("*").alias("n_cust"))
    monthly = facts.groupBy("cm", "ms").agg(F.sum("rev").alias("rev"))
    w = (
        Window.partitionBy("cm")
        .orderBy("ms")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = monthly.withColumn("cum_rev", F.sum("rev").over(w))
    return (
        cum.join(sizes, "cm")
        .filter(F.col("cm") < 24020)
        .select(
            F.col("cm").alias("cohort_month"),
            F.col("ms").alias("months_since"),
            F.col("n_cust").alias("cohort_size"),
            F.round(F.col("cum_rev") / 100.0 / F.col("n_cust"), 2).alias(
                "ltv_per_customer"
            ),
        )
    )


# ---------------------------------------------------------------------------
# X292 — inter-purchase gap distribution
# ---------------------------------------------------------------------------


@query(
    "q_interpurchase",
    oracle="""
    WITH gaps AS (
      SELECT o_custkey,
             datediff('day',
               lag(CAST(o_orderdate AS DATE)) OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey),
               CAST(o_orderdate AS DATE)) AS gap
      FROM orders
    ), g AS (SELECT * FROM gaps WHERE gap IS NOT NULL),
    seg AS (
      SELECT c.c_mktsegment, g.gap
      FROM g JOIN customer c ON c.c_custkey = g.o_custkey
    )
    SELECT c_mktsegment, count(*) AS n_gaps,
           CAST(min(gap) AS BIGINT) AS min_gap,
           CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY gap) AS BIGINT)
             AS median_gap,
           CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY gap) AS BIGINT)
             AS p90_gap,
           CAST(max(gap) AS BIGINT) AS max_gap
    FROM seg GROUP BY c_mktsegment
    """,
)
def q_interpurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X292 — inter-purchase time distribution per market segment:
    per-customer consecutive-order gaps via one lag window ((date,
    orderkey) tie-break), summarized with DISCRETE percentiles (X134's
    determinism rule — disc picks actual data values, so no
    interpolation drift). The replenishment-cadence metric behind every
    'time to next order' model; feeds X109-style EWMA forecasts."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        o.withColumn(
            "gap",
            F.datediff(
                F.to_date("o_orderdate"),
                F.lag(F.to_date("o_orderdate")).over(w),
            ),
        )
        .filter(F.col("gap").isNotNull())
        .select("o_custkey", "gap")
    )
    c = load(spark, sf_dir, "customer")
    seg = gaps.join(F.broadcast(c), gaps.o_custkey == c.c_custkey)
    return seg.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_gaps"),
        F.min("gap").cast("long").alias("min_gap"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY gap)")
        .cast("long")
        .alias("median_gap"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY gap)")
        .cast("long")
        .alias("p90_gap"),
        F.max("gap").cast("long").alias("max_gap"),
    )


# ---------------------------------------------------------------------------
# X293 — degree assortativity
# ---------------------------------------------------------------------------


@query(
    "q_assortativity",
    oracle=f"""
    WITH {_EDGES_SQL},
    deg AS (SELECT a AS v, count(*) AS d FROM sym GROUP BY a),
    pairs AS (
      SELECT CAST(da.d AS DOUBLE) AS x, CAST(db.d AS DOUBLE) AS y
      FROM sym JOIN deg da ON da.v = sym.a JOIN deg db ON db.v = sym.b
    ), s AS (
      SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
      FROM pairs
    )
    SELECT CAST(n AS BIGINT) AS n_edge_ends,
           round((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)),
                 6) AS assortativity
    FROM s
    """,
)
def q_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X293 — degree assortativity (Newman 2002): Pearson correlation
    of endpoint degrees across the symmetrized edge list — do
    high-degree suppliers link to high-degree customers? The one-number
    mixing diagnostic read before trusting degree-targeted
    interventions (negative = hub-and-spoke, the usual commerce
    shape). One degree rollup + two vertex-keyed joins + a
    sufficient-statistics fold; degrees spelled as explicit sums so
    both engines share the float ops."""
    sym = _edges(spark, sf_dir).persist()
    deg = sym.groupBy(F.col("a").alias("v")).agg(F.count("*").alias("d"))
    pairs = (
        sym.join(deg.select(F.col("v").alias("a"), F.col("d").alias("xd")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("d").alias("yd")), "b")
        .select(
            F.col("xd").cast("double").alias("x"),
            F.col("yd").cast("double").alias("y"),
        )
    )
    s = pairs.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    out = s.select(
        F.col("n").cast("long").alias("n_edge_ends"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (
                F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("assortativity"),
    ).localCheckpoint(eager=True)
    sym.unpersist()
    return out


# ---------------------------------------------------------------------------
# X294 — community modularity (evaluates X174's LPA partition)
# ---------------------------------------------------------------------------


@query(
    "q_modularity",
    oracle=f"""
    WITH {_EDGES_SQL},
    l0 AS (SELECT DISTINCT a, a AS lbl FROM sym),
    {_lpa_round_sql('l0', 'l1')},
    {_lpa_round_sql('l1', 'l2')},
    {_lpa_round_sql('l2', 'l3')},
    m2 AS (SELECT count(*) AS m2 FROM sym),
    within AS (
      SELECT la.lbl, count(*) AS w
      FROM sym JOIN l3 la ON la.a = sym.a JOIN l3 lb ON lb.a = sym.b
      WHERE la.lbl = lb.lbl GROUP BY la.lbl
    ), degsum AS (
      SELECT l3.lbl, count(*) AS dsum
      FROM sym JOIN l3 ON l3.a = sym.a GROUP BY l3.lbl
    )
    SELECT CAST((SELECT count(DISTINCT lbl) FROM l3) AS BIGINT)
             AS n_communities,
           round(sum(COALESCE(w.w, 0) * 1.0 / m2.m2
                     - (d.dsum * 1.0 / m2.m2) * (d.dsum * 1.0 / m2.m2)),
                 6) AS modularity
    FROM degsum d CROSS JOIN m2 LEFT JOIN within w ON w.lbl = d.lbl
    GROUP BY m2.m2
    """,
)
def q_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X294 — Newman modularity Q = Σ_c (e_c/2m − (d_c/2m)²) of the
    X174 label-propagation partition — the standard 'did the community
    detection find real structure' score (Q near 0 = no better than
    random), computed AS a query so the graph stack evaluates itself
    like the ANN (X86) and LSH (X279) stacks do. Reuses the exact
    3-round deterministic LPA, then two label-keyed rollups (within-
    community edge ends, community degree sums) and one broadcast
    total."""
    sym = _edges(spark, sf_dir).persist()
    labels = sym.select("a").distinct().withColumn("lbl", F.col("a"))
    for _ in range(3):
        counts = (
            sym.join(labels.select(F.col("a").alias("b"), "lbl"), "b")
            .groupBy("a", "lbl")
            .agg(F.count("*").alias("c"))
        )
        labels = counts.groupBy("a").agg(
            F.min_by(
                "lbl", F.struct((-F.col("c")).alias("nc"), F.col("lbl"))
            ).alias("lbl")
        )
    labels = labels.localCheckpoint(eager=True)
    m2 = sym.agg(F.count("*").alias("m2"))
    within = (
        sym.join(labels.select(F.col("a"), F.col("lbl").alias("la")), "a")
        .join(
            labels.select(F.col("a").alias("b"), F.col("lbl").alias("lb")),
            "b",
        )
        .filter(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("lbl"))
        .agg(F.count("*").alias("w"))
    )
    degsum = (
        sym.join(labels, "a")
        .groupBy("lbl")
        .agg(F.count("*").alias("dsum"))
    )
    ncomm = labels.agg(
        F.countDistinct("lbl").cast("long").alias("n_communities")
    )
    out = (
        degsum.join(within, "lbl", "left")
        .crossJoin(F.broadcast(m2))
        .groupBy("m2")
        .agg(
            F.round(
                F.sum(
                    F.coalesce(F.col("w"), F.lit(0)) * 1.0 / F.col("m2")
                    - (F.col("dsum") * 1.0 / F.col("m2"))
                    * (F.col("dsum") * 1.0 / F.col("m2"))
                ),
                6,
            ).alias("modularity")
        )
        .crossJoin(F.broadcast(ncomm))
        .select("n_communities", "modularity")
        .localCheckpoint(eager=True)
    )
    sym.unpersist()
    return out


# ---------------------------------------------------------------------------
# X295 — new vs returning user decomposition
# ---------------------------------------------------------------------------


@query(
    "q_new_returning",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             min(date_diff('day', DATE '2024-01-01',
                           CAST(date_trunc('day', ts) AS DATE)) // 7) AS fm
      FROM events GROUP BY user_id
    ), weekly AS (
      SELECT date_diff('day', DATE '2024-01-01',
                       CAST(date_trunc('day', ts) AS DATE)) // 7 AS m,
             user_id
      FROM events GROUP BY 1, 2
    )
    SELECT m.m AS week_key, count(*) AS active_users,
           CAST(sum(CASE WHEN f.fm = m.m THEN 1 ELSE 0 END) AS BIGINT)
             AS new_users,
           CAST(sum(CASE WHEN f.fm < m.m THEN 1 ELSE 0 END) AS BIGINT)
             AS returning_users,
           round(sum(CASE WHEN f.fm < m.m THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS returning_frac
    FROM weekly m JOIN firsts f ON f.user_id = m.user_id
    GROUP BY m.m
    """,
)
def q_new_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X295 — new-vs-returning decomposition of weekly active users:
    a user is 'new' in their first-ever active week, 'returning'
    after — the growth-accounting split every product dashboard leads
    with (X45's retention matrix collapsed to the acquisition axis).
    Week keys are epoch-anchored datediff//7 ints so both engines
    share the bucketing (the one-month event window makes calendar
    months a single bucket). One first-week rollup + one distinct
    week-user rollup + a broadcast-joined flag count."""
    ev = load(spark, sf_dir, "events")
    day = F.to_date(F.date_trunc("day", "ts"))
    mkey = (F.datediff(day, F.lit("2024-01-01").cast("date")) / 7).cast(
        "long"
    )
    firsts = ev.groupBy("user_id").agg(F.min(mkey).alias("fm"))
    weekly = ev.select(mkey.alias("m"), "user_id").distinct()
    j = weekly.join(firsts, "user_id")
    return j.groupBy(F.col("m").alias("week_key")).agg(
        F.count("*").alias("active_users"),
        F.sum((F.col("fm") == F.col("m")).cast("long")).alias("new_users"),
        F.sum((F.col("fm") < F.col("m")).cast("long")).alias(
            "returning_users"
        ),
        F.round(
            F.sum((F.col("fm") < F.col("m")).cast("long")) * 1.0
            / F.count("*"),
            6,
        ).alias("returning_frac"),
    )


# ---------------------------------------------------------------------------
# X296 — DAU/MAU stickiness
# ---------------------------------------------------------------------------


@query(
    "q_dau_wau",
    oracle="""
    WITH dau AS (
      SELECT date_diff('day', DATE '2024-01-01',
                       CAST(date_trunc('day', ts) AS DATE)) // 7 AS m,
             CAST(date_trunc('day', ts) AS DATE) AS d,
             count(DISTINCT user_id) AS dau
      FROM events GROUP BY 1, 2
    ), wau AS (
      SELECT date_diff('day', DATE '2024-01-01',
                       CAST(date_trunc('day', ts) AS DATE)) // 7 AS m,
             count(DISTINCT user_id) AS wau
      FROM events GROUP BY 1
    )
    SELECT d.m AS week_key, CAST(max(wau.wau) AS BIGINT) AS wau,
           round(avg(CAST(d.dau AS DOUBLE)), 4) AS avg_dau,
           round(avg(CAST(d.dau AS DOUBLE)) / max(wau.wau), 6)
             AS stickiness
    FROM dau d JOIN wau ON wau.m = d.m GROUP BY d.m
    """,
)
def q_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X296 — DAU/WAU stickiness per week: average daily distinct
    users over weekly distinct users, the engagement-frequency ratio
    (1.0 = every weekly user active every day; week grain because the
    synthetic event window spans one calendar month). Two
    distinct-count rollups at different grains + one join; at 100 TB
    the exact distincts swap for the X102 mergeable HLL sketches with
    the same query shape (the sketch store IS this rollup maintained
    incrementally)."""
    ev = load(spark, sf_dir, "events")
    day = F.to_date(F.date_trunc("day", "ts"))
    mkey = (F.datediff(day, F.lit("2024-01-01").cast("date")) / 7).cast(
        "long"
    ).alias("m")
    dau = ev.groupBy(mkey, day.alias("d")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    wau = ev.groupBy(mkey).agg(F.countDistinct("user_id").alias("wau"))
    return (
        dau.join(wau, "m")
        .groupBy(F.col("m").alias("week_key"))
        .agg(
            F.max("wau").cast("long").alias("wau"),
            F.round(F.avg(F.col("dau").cast("double")), 4).alias("avg_dau"),
            F.round(
                F.avg(F.col("dau").cast("double")) / F.max("wau"), 6
            ).alias("stickiness"),
        )
    )


# ---------------------------------------------------------------------------
# X297 — pivot with multiple aggregates
# ---------------------------------------------------------------------------

_SEGS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


@query(
    "q_pivot_multi_agg",
    oracle=f"""
    SELECT year(o.o_orderdate) AS yr,
           {", ".join(
               f"CAST(sum(CASE WHEN c.c_mktsegment = '{s}' THEN 1 ELSE 0 END)"
               f" AS BIGINT) AS {s.lower()}_n, "
               f"round(sum(CASE WHEN c.c_mktsegment = '{s}'"
               f" THEN o.o_totalprice ELSE 0 END), 2) AS {s.lower()}_rev"
               for s in _SEGS
           )}
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY 1
    """,
)
def q_pivot_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X297 — pivot with MULTIPLE aggregates per cell (count + revenue
    per market segment per year): X49 pins the literal pivot API with
    one agg; real reporting pivots carry several measures, which Spark
    spells as .pivot(col, values).agg(a1, a2) and names
    '<value>_<alias>'. Explicit value list keeps the single-pass
    conditional-aggregation plan (no distinct-values pre-scan);
    renamed to stable lowercase columns for the gate."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    piv = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.year("o_orderdate").alias("yr"))
        .pivot("c_mktsegment", _SEGS)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("rev"),
        )
    )
    cols = [F.col("yr")]
    for s in _SEGS:
        cols.append(F.col(f"{s}_n").alias(f"{s.lower()}_n"))
        cols.append(F.col(f"{s}_rev").alias(f"{s.lower()}_rev"))
    return piv.select(*cols)


# ---------------------------------------------------------------------------
# X298 — arrays_zip + inline (structured array expansion)
# ---------------------------------------------------------------------------


@query(
    "q_arrays_zip",
    oracle="""
    SELECT vec_id, CAST(gs.i AS INT) - 1 AS pos,
           round(CAST(embedding[gs.i] AS DOUBLE), 4) AS v,
           round(CAST(embedding[9 - gs.i] AS DOUBLE), 4) AS rv,
           round(CAST(embedding[gs.i] AS DOUBLE)
                 * CAST(embedding[9 - gs.i] AS DOUBLE), 4) AS prod
    FROM embeddings, generate_series(1, 8) AS gs(i)
    WHERE vec_id % 25 = 0
    """,
)
def q_arrays_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X298 — arrays_zip + inline: lock-step zip of an array with its
    reverse into an array<struct>, exploded to one row per position
    with both fields — the idiom for walking parallel arrays (scores
    vs thresholds, tokens vs tags) without positional join gymnastics.
    Restricted to the first 8 dims of a 4% sample; pure projection +
    1→8 expansion."""
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 25 == 0)
    head = F.transform(
        F.slice("embedding", 1, 8), lambda x: F.round(x.cast("double"), 4)
    )
    revd = F.transform(
        F.reverse(F.slice("embedding", 1, 8)),
        lambda x: F.round(x.cast("double"), 4),
    )
    z = e.select(
        "vec_id", F.posexplode(F.arrays_zip(head.alias("v"), revd.alias("rv")))
    )
    return z.select(
        "vec_id",
        F.col("pos").cast("int").alias("pos"),
        F.col("col.v").alias("v"),
        F.col("col.rv").alias("rv"),
        F.round(
            F.col("col.v") * F.col("col.rv"), 4
        ).alias("prod"),
    )


# ---------------------------------------------------------------------------
# X299 — per-source dataset card
# ---------------------------------------------------------------------------


@query(
    "q_dataset_card",
    oracle="""
    WITH base AS (
      SELECT source, lang, md5(text) AS h, n_chars,
             len(list_filter(string_split(text, ' '), t -> t <> ''))
               AS n_tok
      FROM documents
    ), lang_votes AS (
      SELECT source, lang, count(*) AS c,
             row_number() OVER (PARTITION BY source
               ORDER BY count(*) DESC, lang) AS rn
      FROM base GROUP BY source, lang
    ), card AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS total_tokens,
             round(avg(CAST(n_chars AS DOUBLE)), 2) AS avg_chars,
             count(DISTINCT h) AS n_unique,
             round(1.0 - count(DISTINCT h) * 1.0 / count(*), 6)
               AS dup_rate,
             round(sum(CASE WHEN n_tok >= 30
                            AND n_chars * 1.0 / n_tok BETWEEN 3 AND 13
                       THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
               AS quality_rate
      FROM base GROUP BY source
    )
    SELECT c.source, c.n_docs, c.total_tokens, c.avg_chars,
           c.dup_rate, c.quality_rate,
           v.lang AS top_lang,
           round(v.c * 1.0 / c.n_docs, 6) AS top_lang_frac
    FROM card c JOIN lang_votes v ON v.source = c.source AND v.rn = 1
    """,
)
def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X299 — the per-source DATASET CARD: docs, token budget, mean
    length, exact-duplicate rate (1 − distinct-hash ratio), quality
    rate (the X99 gate), dominant language + its share — the one-table
    summary a 'datasheets for datasets' card (Gebru et al. 2021) and
    every mixture decision (X92/X229) starts from. Composed as one
    scan + one per-(source,lang) vote + one per-source rollup; at
    100 TB the distinct-hash count swaps for the X102 HLL with the
    same shape. Every constituent metric is separately gate-pinned
    elsewhere (X1/E1, X17, X99) — this row pins the COMPOSITION."""
    base = load(spark, sf_dir, "documents").select(
        "source",
        "lang",
        F.md5("text").alias("h"),
        "n_chars",
        F.size(F.filter(F.split("text", " "), lambda t: t != "")).alias(
            "n_tok"
        ),
    )
    w = Window.partitionBy("source").orderBy(F.desc("c"), "lang")
    votes = (
        base.groupBy("source", "lang")
        .agg(F.count("*").alias("c"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    quality = (F.col("n_tok") >= 30) & (
        (F.col("n_chars") * 1.0 / F.col("n_tok")).between(3, 13)
    )
    card = base.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.round(F.avg(F.col("n_chars").cast("double")), 2).alias(
            "avg_chars"
        ),
        F.countDistinct("h").alias("n_unique"),
        F.round(
            1.0 - F.countDistinct("h") * 1.0 / F.count("*"), 6
        ).alias("dup_rate"),
        F.round(F.sum(quality.cast("long")) * 1.0 / F.count("*"), 6).alias(
            "quality_rate"
        ),
    )
    return (
        card.join(votes, "source")
        .select(
            "source",
            "n_docs",
            "total_tokens",
            "avg_chars",
            "dup_rate",
            "quality_rate",
            F.col("lang").alias("top_lang"),
            F.round(F.col("c") * 1.0 / F.col("n_docs"), 6).alias(
                "top_lang_frac"
            ),
        )
    )
