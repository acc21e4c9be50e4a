"""Round-5 batch J: mediation, boosting, segmentation, rev-rec.

X563 mediation analysis (Baron-Kenny decomposition + Sobel test — the
causal-PATHWAY question the effect-size family X336/X537 can't answer:
HOW does the effect flow), X564 two-round gradient-boosted stumps (the
additive-ensemble step beyond X205's single stump — fit, take
residuals, fit again), X565 TextTiling-style topic segmentation (the
semantic-chunking primitive RAG pipelines use instead of fixed-width
X33 chunks), X566 revenue recognition by interval proration (the
finance-data daily-proration pattern: one order's price recognized
across the months its service period touches), and X567 the
`SELECT * EXCEPT` projection syntax (Spark 4) with DuckDB's `EXCLUDE`
as its oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text
from ..sources.tables import load
from .registry import query
from .round4o import _ERF_SQL, _p_two_sided

# ---------------------------------------------------------------------------
# X563 — mediation analysis (product of coefficients + Sobel)
# ---------------------------------------------------------------------------


@query(
    "q_mediation",
    oracle=f"""
    WITH feat AS (
      SELECT round(c.c_acctbal, 6) AS x,
             CAST(cu.n AS DOUBLE) AS m, cu.y
      FROM customer c
      JOIN (SELECT o_custkey, count(*) AS n,
                   round(sum(o_totalprice), 2) AS y
            FROM orders GROUP BY o_custkey) cu
        ON cu.o_custkey = c.c_custkey
    ), mo AS (
      SELECT count(*) AS n,
             round(sum(x), 4) AS sx, round(sum(m), 4) AS sm,
             round(sum(y), 2) AS sy,
             round(sum(x * x), 4) AS sxx, round(sum(m * m), 4) AS smm,
             round(sum(x * m), 4) AS sxm, round(sum(x * y), 2) AS sxy,
             round(sum(m * y), 2) AS smy, round(sum(y * y), 2) AS syy
      FROM feat
    ), c0 AS (
      SELECT n,
             sxx - sx * sx / n AS cxx, smm - sm * sm / n AS cmm,
             sxm - sx * sm / n AS cxm, sxy - sx * sy / n AS cxy,
             smy - sm * sy / n AS cmy, syy - sy * sy / n AS cyy
      FROM mo
    ), fits AS (
      SELECT n, cxx, cmm, cxm, cyy,
             cxm / cxx AS a,
             (cmy * cxx - cxy * cxm) / (cmm * cxx - cxm * cxm) AS b,
             (cxy * cmm - cmy * cxm) / (cmm * cxx - cxm * cxm)
               AS c_direct,
             cxy / cxx AS c_total,
             (cmm - cxm * cxm / cxx) / (n - 2) AS msea_num
      FROM c0
    ), ses AS (
      SELECT a, b, c_direct, c_total,
             sqrt(greatest(msea_num / cxx, 1e-12)) AS se_a,
             sqrt(greatest(
               ((cyy - b * (cmy_) - c_direct * (cxy_)) / (n - 3))
               * cxx / (cmm * cxx - cxm * cxm), 1e-12)) AS se_b
      FROM (SELECT f.*, c0.cmy AS cmy_, c0.cxy AS cxy_
            FROM fits f CROSS JOIN c0)
    ), z AS (
      SELECT a, b, c_direct, c_total, a * b AS indirect,
             a * b / sqrt(a * a * se_b * se_b + b * b * se_a * se_a)
               AS sobel_z
      FROM ses
    )
    SELECT round(a, 6) AS a_xm, round(b, 6) AS b_my,
           round(c_total, 6) AS c_total,
           round(c_direct, 6) AS c_direct,
           round(indirect, 6) AS indirect,
           round(indirect / c_total, 6) AS prop_mediated,
           round(sobel_z, 6) AS sobel_z,
           round(1 - {_ERF_SQL.format(z='abs(sobel_z)')}, 8) AS p_value
    FROM z
    """,
)
def q_mediation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X563 — mediation analysis: does account balance drive spend
    DIRECTLY or THROUGH order frequency?  The Baron-Kenny / product-
    of-coefficients decomposition: a (X→M), b (M→Y controlling X),
    total and direct effects, indirect = a·b, proportion mediated,
    and the Sobel z = ab/√(a²SE_b² + b²SE_a²) with its normal
    p-value.  The causal family (X336/X479/X480/X537) estimates THAT
    an effect exists; this decomposes the pathway — the question
    behind 'is the treatment working through the mechanism we
    designed?'.

    Everything derives from one pass of rounded moment sums —
    centered cross-moments, two closed-form OLS solves, residual
    variances from the same moments (no residual materialization).
    Scale: a single moment aggregate over the joined fact rollup."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    cu = o.groupBy("o_custkey").agg(
        F.count("*").alias("nn"),
        F.round(F.sum("o_totalprice"), 2).alias("y"),
    )
    feat = c.join(cu, c.c_custkey == cu.o_custkey).select(
        F.round("c_acctbal", 6).alias("x"),
        F.col("nn").cast("double").alias("m"),
        "y",
    )
    mo = feat.agg(
        F.count("*").alias("n"),
        F.round(F.sum("x"), 4).alias("sx"),
        F.round(F.sum("m"), 4).alias("sm"),
        F.round(F.sum("y"), 2).alias("sy"),
        F.round(F.sum(F.col("x") * F.col("x")), 4).alias("sxx"),
        F.round(F.sum(F.col("m") * F.col("m")), 4).alias("smm"),
        F.round(F.sum(F.col("x") * F.col("m")), 4).alias("sxm"),
        F.round(F.sum(F.col("x") * F.col("y")), 2).alias("sxy"),
        F.round(F.sum(F.col("m") * F.col("y")), 2).alias("smy"),
        F.round(F.sum(F.col("y") * F.col("y")), 2).alias("syy"),
    )
    n = F.col("n")
    c0 = mo.select(
        "n",
        (F.col("sxx") - F.col("sx") * F.col("sx") / n).alias("cxx"),
        (F.col("smm") - F.col("sm") * F.col("sm") / n).alias("cmm"),
        (F.col("sxm") - F.col("sx") * F.col("sm") / n).alias("cxm"),
        (F.col("sxy") - F.col("sx") * F.col("sy") / n).alias("cxy"),
        (F.col("smy") - F.col("sm") * F.col("sy") / n).alias("cmy"),
        (F.col("syy") - F.col("sy") * F.col("sy") / n).alias("cyy"),
    )
    cxx, cmm, cxm = F.col("cxx"), F.col("cmm"), F.col("cxm")
    cxy, cmy, cyy = F.col("cxy"), F.col("cmy"), F.col("cyy")
    det = cmm * cxx - cxm * cxm
    a = cxm / cxx
    b = (cmy * cxx - cxy * cxm) / det
    c_dir = (cxy * cmm - cmy * cxm) / det
    c_tot = cxy / cxx
    se_a = F.sqrt(
        F.greatest(
            ((cmm - cxm * cxm / cxx) / (n - 2)) / cxx, F.lit(1e-12)
        )
    )
    se_b = F.sqrt(
        F.greatest(
            ((cyy - b * cmy - c_dir * cxy) / (n - 3)) * cxx / det,
            F.lit(1e-12),
        )
    )
    sobel = (a * b) / F.sqrt(
        a * a * se_b * se_b + b * b * se_a * se_a
    )
    return c0.select(
        F.round(a, 6).alias("a_xm"),
        F.round(b, 6).alias("b_my"),
        F.round(c_tot, 6).alias("c_total"),
        F.round(c_dir, 6).alias("c_direct"),
        F.round(a * b, 6).alias("indirect"),
        F.round(a * b / c_tot, 6).alias("prop_mediated"),
        F.round(sobel, 6).alias("sobel_z"),
        F.round(_p_two_sided(sobel), 8).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# X564 — two-round gradient-boosted stumps
# ---------------------------------------------------------------------------

_GB_ETA = 0.5


@query(
    "q_boosted_stumps",
    oracle=f"""
    WITH feat AS MATERIALIZED (
      SELECT c.c_custkey, round(c.c_acctbal, 6) AS x, cu.y
      FROM customer c
      JOIN (SELECT o_custkey, round(sum(o_totalprice), 2) AS y
            FROM orders GROUP BY o_custkey) cu
        ON cu.o_custkey = c.c_custkey
    ), nn AS (SELECT count(*) AS n, round(sum(y), 2) AS sy FROM feat),
    cuts AS MATERIALIZED (
      SELECT x AS cut FROM (
        SELECT x, row_number() OVER (ORDER BY x, c_custkey) AS r,
               (SELECT n FROM nn) AS n
        FROM feat
      ) WHERE r IN (SELECT CAST(floor(k * n / 10.0) AS BIGINT)
                    FROM (SELECT unnest(generate_series(1, 9)) AS k)
                    CROSS JOIN nn)
    ), r1 AS MATERIALIZED (
      SELECT f.c_custkey, f.x, f.y - nn.sy / nn.n AS r
      FROM feat f CROSS JOIN nn
    ), s1 AS (
      SELECT c.cut,
             round(sum(CASE WHEN r1.x <= c.cut THEN
                 CAST(round(r1.r * 1000000) AS HUGEINT) END)
               / 1000000.0, 4) AS sl,
             count(CASE WHEN r1.x <= c.cut THEN 1 END) AS nl,
             round(sum(CASE WHEN r1.x > c.cut THEN
                 CAST(round(r1.r * 1000000) AS HUGEINT) END)
               / 1000000.0, 4) AS sr,
             count(CASE WHEN r1.x > c.cut THEN 1 END) AS nr
      FROM r1 CROSS JOIN cuts c GROUP BY c.cut
      HAVING count(CASE WHEN r1.x <= c.cut THEN 1 END) > 0
         AND count(CASE WHEN r1.x > c.cut THEN 1 END) > 0
    ), b1 AS MATERIALIZED (
      SELECT cut, sl / nl AS vl, sr / nr AS vr
      FROM s1
      ORDER BY -(sl * sl / nl + sr * sr / nr), cut LIMIT 1
    ), r2 AS MATERIALIZED (
      SELECT r1.c_custkey, r1.x,
             r1.r - {_GB_ETA} * (CASE WHEN r1.x <= b1.cut
                                      THEN b1.vl ELSE b1.vr END) AS r
      FROM r1 CROSS JOIN b1
    ), s2 AS (
      SELECT c.cut,
             round(sum(CASE WHEN r2.x <= c.cut THEN
                 CAST(round(r2.r * 1000000) AS HUGEINT) END)
               / 1000000.0, 4) AS sl,
             count(CASE WHEN r2.x <= c.cut THEN 1 END) AS nl,
             round(sum(CASE WHEN r2.x > c.cut THEN
                 CAST(round(r2.r * 1000000) AS HUGEINT) END)
               / 1000000.0, 4) AS sr,
             count(CASE WHEN r2.x > c.cut THEN 1 END) AS nr
      FROM r2 CROSS JOIN cuts c GROUP BY c.cut
      HAVING count(CASE WHEN r2.x <= c.cut THEN 1 END) > 0
         AND count(CASE WHEN r2.x > c.cut THEN 1 END) > 0
    ), b2 AS MATERIALIZED (
      SELECT cut, sl / nl AS vl, sr / nr AS vr
      FROM s2
      ORDER BY -(sl * sl / nl + sr * sr / nr), cut LIMIT 1
    ), r3 AS (
      SELECT r2.r - {_GB_ETA} * (CASE WHEN r2.x <= b2.cut
                                      THEN b2.vl ELSE b2.vr END) AS r
      FROM r2 CROSS JOIN b2
    )
    SELECT 0 AS round, CAST(NULL AS DOUBLE) AS split_at,
           CAST(NULL AS DOUBLE) AS left_fit, CAST(NULL AS DOUBLE)
             AS right_fit,
           (SELECT round(sum(CAST(round(r * r * 100) AS HUGEINT)) / (100.0 * count(*)), 2) FROM r1) AS mse
    UNION ALL
    SELECT 1, round(b1.cut, 6), round({_GB_ETA} * b1.vl, 4),
           round({_GB_ETA} * b1.vr, 4),
           (SELECT round(sum(CAST(round(r * r * 100) AS HUGEINT)) / (100.0 * count(*)), 2) FROM r2)
    FROM b1
    UNION ALL
    SELECT 2, round(b2.cut, 6), round({_GB_ETA} * b2.vl, 4),
           round({_GB_ETA} * b2.vr, 4),
           (SELECT round(sum(CAST(round(r * r * 100) AS HUGEINT)) / (100.0 * count(*)), 2) FROM r3)
    FROM b2
    """,
)
def q_boosted_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X564 — gradient boosting, two unrolled rounds of depth-1 trees
    on squared loss: F₀ = ȳ; each round scores 9 decile candidate
    splits by the SSE-reduction identity (maximize S_L²/n_L +
    S_R²/n_R), fits the best stump to the CURRENT residuals, and
    steps F ← F + η·h with η = {_GB_ETA}.  The training MSE after
    each round is pinned — the monotone decrease is the boosting
    contract.  X205 is one stump; this is the additive-ensemble
    mechanism (the heart of GBDT) expressed as two candidate-scoring
    aggregates, each ONE pass over the data with the 9-cut grid
    broadcast.

    Split sums rounded; stump values and residual updates are
    identical closed-form arithmetic.  Scale: per round one
    fact×9-cuts conditional aggregate — the histogram-based split
    search every distributed GBDT uses."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    cu = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("y")
    )
    feat = (
        c.join(cu, c.c_custkey == cu.o_custkey)
        .select("c_custkey", F.round("c_acctbal", 6).alias("x"), "y")
        .localCheckpoint(eager=True)
    )
    nn = feat.agg(
        F.count("*").alias("n"), F.round(F.sum("y"), 2).alias("sy")
    )
    ranked = feat.crossJoin(F.broadcast(nn)).select(
        "x",
        "n",
        F.row_number()
        .over(Window.orderBy("x", "c_custkey"))
        .alias("r"),
    )
    ks = spark.sql(
        "SELECT explode(sequence(1, 9)) AS k"
    ).crossJoin(F.broadcast(nn)).select(
        F.floor(F.col("k") * F.col("n") / 10.0).cast("long").alias("rr")
    )
    cuts = (
        ranked.join(F.broadcast(ks), ranked.r == F.col("rr"))
        .select(F.col("x").alias("cut"))
        .localCheckpoint(eager=True)
    )
    r = feat.crossJoin(F.broadcast(nn)).select(
        "c_custkey",
        "x",
        (F.col("y") - F.col("sy") / F.col("n")).alias("r"),
    ).localCheckpoint(eager=True)

    rows = [
        r.agg(
            F.round(
                F.sum(
                    F.round(F.col("r") * F.col("r") * 100).cast(
                        "decimal(38,0)"
                    )
                ).cast("double")
                / (100.0 * F.count("*")),
                2,
            ).alias("mse")
        ).select(
            F.lit(0).alias("round"),
            F.lit(None).cast("double").alias("split_at"),
            F.lit(None).cast("double").alias("left_fit"),
            F.lit(None).cast("double").alias("right_fit"),
            "mse",
        )
    ]
    for rnd in (1, 2):
        s = (
            r.crossJoin(F.broadcast(cuts))
            .groupBy("cut")
            .agg(
                F.round(
                    F.sum(
                        F.when(
                            F.col("x") <= F.col("cut"),
                            F.round(F.col("r") * 1e6).cast("decimal(38,0)"),
                        )
                    ).cast("double")
                    / 1e6,
                    4,
                ).alias("sl"),
                F.count(
                    F.when(F.col("x") <= F.col("cut"), 1)
                ).alias("nl"),
                F.round(
                    F.sum(
                        F.when(
                            F.col("x") > F.col("cut"),
                            F.round(F.col("r") * 1e6).cast("decimal(38,0)"),
                        )
                    ).cast("double")
                    / 1e6,
                    4,
                ).alias("sr"),
                F.count(F.when(F.col("x") > F.col("cut"), 1)).alias("nr"),
            )
            .filter((F.col("nl") > 0) & (F.col("nr") > 0))
        )
        gain = (
            F.col("sl") * F.col("sl") / F.col("nl")
            + F.col("sr") * F.col("sr") / F.col("nr")
        )
        best = (
            s.orderBy((-gain).asc(), "cut")
            .limit(1)
            .select(
                "cut",
                (F.col("sl") / F.col("nl")).alias("vl"),
                (F.col("sr") / F.col("nr")).alias("vr"),
            )
            .localCheckpoint(eager=True)
        )
        r = (
            r.crossJoin(F.broadcast(best))
            .select(
                "c_custkey",
                "x",
                (
                    F.col("r")
                    - _GB_ETA
                    * F.when(
                        F.col("x") <= F.col("cut"), F.col("vl")
                    ).otherwise(F.col("vr"))
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
        rows.append(
            r.agg(
                F.round(
                    F.sum(
                        F.round(F.col("r") * F.col("r") * 100).cast(
                            "decimal(38,0)"
                        )
                    ).cast("double")
                    / (100.0 * F.count("*")),
                    2,
                ).alias("mse"),
            )
            .crossJoin(F.broadcast(best))
            .select(
                F.lit(rnd).alias("round"),
                F.round("cut", 6).alias("split_at"),
                F.round(_GB_ETA * F.col("vl"), 4).alias("left_fit"),
                F.round(_GB_ETA * F.col("vr"), 4).alias("right_fit"),
                "mse",
            )
        )
    out = rows[0]
    for df in rows[1:]:
        out = out.unionByName(df)
    return out


# ---------------------------------------------------------------------------
# X565 — TextTiling-style topic segmentation
# ---------------------------------------------------------------------------

_TT_BLOCK = 10


@query(
    "q_texttiling",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, w, CAST(floor((pos - 1) / {_TT_BLOCK}) AS BIGINT)
               AS blk
      FROM (SELECT doc_id, unnest(t) AS w,
                   generate_subscripts(t, 1) AS pos
            FROM (SELECT doc_id, {text.tokens_sql('text')} AS t
                  FROM documents))
    ), bset AS (
      SELECT DISTINCT doc_id, blk, w FROM tok
    ), bsz AS (
      SELECT doc_id, blk, count(*) AS sz FROM bset GROUP BY doc_id, blk
    ), inter AS (
      SELECT a.doc_id, a.blk AS g,
             count(*) AS inter
      FROM bset a JOIN bset b
        ON a.doc_id = b.doc_id AND b.blk = a.blk + 1 AND a.w = b.w
      GROUP BY a.doc_id, a.blk
    ), sims AS (
      SELECT sa.doc_id, sa.blk AS g,
             coalesce(i.inter, 0) * 1.0
               / (sa.sz + sb.sz - coalesce(i.inter, 0)) AS sim
      FROM bsz sa JOIN bsz sb
        ON sa.doc_id = sb.doc_id AND sb.blk = sa.blk + 1
      LEFT JOIN inter i ON i.doc_id = sa.doc_id AND i.g = sa.blk
    ), st AS (
      SELECT doc_id, count(*) AS n_gaps,
             sum(sim) / count(*) AS mu,
             sqrt(greatest(sum(sim * sim) / count(*)
                   - pow(sum(sim) / count(*), 2), 1e-12)) AS sd
      FROM sims GROUP BY doc_id
    )
    SELECT s.doc_id, CAST(st.n_gaps + 1 AS BIGINT) AS n_blocks,
           CAST(count(CASE WHEN s.sim < st.mu - 0.5 * st.sd
                      THEN 1 END) AS BIGINT) AS n_boundaries,
           round(any_value(st.mu), 6) AS mean_sim,
           round(min(s.sim), 6) AS min_sim
    FROM sims s JOIN st ON s.doc_id = st.doc_id
    GROUP BY s.doc_id, st.n_gaps
    """,
)
def q_texttiling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X565 — TextTiling-style topic segmentation (Hearst 1997): each
    document's token stream is cut into {_TT_BLOCK}-token blocks,
    adjacent blocks compared by vocabulary Jaccard, and a topic
    BOUNDARY is declared wherever similarity dips below μ − σ/2 of
    that document's own gap distribution (self-calibrated — verbose
    and terse documents get their own thresholds).  This is the
    semantic-chunking primitive for RAG/training pipelines: X33
    chunks at fixed width regardless of content; boundaries from
    lexical cohesion cut where the TOPIC changes.

    Similarities are exact rationals of set counts; the threshold is
    derived per document from those.  Scale: block-keyed set
    intersection via a (doc, block+1) self-join — token-keyed
    shuffles, no pairwise blowup beyond adjacent blocks."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.posexplode(text.tokens(F.col("text"))).alias("p0", "w"),
    ).select(
        "doc_id",
        "w",
        F.floor(F.col("p0") / _TT_BLOCK).cast("long").alias("blk"),
    )
    bset = tok.distinct()
    bsz = bset.groupBy("doc_id", "blk").agg(F.count("*").alias("sz"))
    a = bset.alias("a")
    b = bset.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.blk") == F.col("a.blk") + 1)
            & (F.col("a.w") == F.col("b.w")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_id"),
                 F.col("a.blk").alias("g"))
        .agg(F.count("*").alias("inter"))
    )
    sa = bsz.alias("sa")
    sb = bsz.alias("sb")
    sims = (
        sa.join(
            sb,
            (F.col("sa.doc_id") == F.col("sb.doc_id"))
            & (F.col("sb.blk") == F.col("sa.blk") + 1),
        )
        .select(
            F.col("sa.doc_id").alias("doc_id"),
            F.col("sa.blk").alias("g"),
            F.col("sa.sz").alias("sza"),
            F.col("sb.sz").alias("szb"),
        )
        .join(inter, ["doc_id", "g"], "left")
        .select(
            "doc_id",
            "g",
            (
                F.coalesce("inter", F.lit(0))
                / (
                    F.col("sza")
                    + F.col("szb")
                    - F.coalesce("inter", F.lit(0))
                )
            ).alias("sim"),
        )
    )
    st = sims.groupBy("doc_id").agg(
        F.count("*").alias("n_gaps"),
        (F.sum("sim") / F.count("*")).alias("mu"),
        F.sqrt(
            F.greatest(
                F.sum(F.col("sim") * F.col("sim")) / F.count("*")
                - F.pow(F.sum("sim") / F.count("*"), 2),
                F.lit(1e-12),
            )
        ).alias("sd"),
    )
    return (
        sims.join(st, "doc_id")
        .groupBy("doc_id", "n_gaps")
        .agg(
            F.count(
                F.when(
                    F.col("sim") < F.col("mu") - 0.5 * F.col("sd"), 1
                )
            ).alias("nb"),
            F.first("mu").alias("mu"),
            F.min("sim").alias("min_sim"),
        )
        .select(
            "doc_id",
            (F.col("n_gaps") + 1).cast("long").alias("n_blocks"),
            F.col("nb").cast("long").alias("n_boundaries"),
            F.round("mu", 6).alias("mean_sim"),
            F.round("min_sim", 6).alias("min_sim"),
        )
    )


# ---------------------------------------------------------------------------
# X566 — revenue recognition by interval proration
# ---------------------------------------------------------------------------

_RR_TERM_DAYS = 90


@query(
    "q_revenue_recognition",
    oracle=f"""
    WITH ords AS (
      SELECT o_orderkey, o_totalprice,
             CAST(o_orderdate AS DATE) AS start_d,
             CAST(o_orderdate AS DATE) + {_RR_TERM_DAYS} AS end_d
      FROM orders
    ), spans AS (
      SELECT o_orderkey, o_totalprice, start_d, end_d,
             CAST(unnest(generate_series(
               date_trunc('month', start_d),
               date_trunc('month', end_d - 1),
               INTERVAL 1 MONTH)) AS DATE) AS mon
      FROM ords
    ), pro AS (
      SELECT mon, o_orderkey, o_totalprice,
             datediff('day',
               greatest(start_d, mon),
               least(end_d, CAST(mon + INTERVAL 1 MONTH AS DATE)))
               AS days
      FROM spans
    )
    SELECT mon, CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice * days / {_RR_TERM_DAYS}.0), 2)
             AS recognized
    FROM pro WHERE days > 0 GROUP BY mon
    """,
)
def q_revenue_recognition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X566 — revenue recognition by daily proration: each order's
    price is earned evenly over a {_RR_TERM_DAYS}-day service term,
    and the recognized amount lands in each calendar month
    proportionally to the days of the term inside that month — the
    rev-rec (ASC 606-style) allocation every subscription business
    computes, and a second production use of the interval-explode
    pattern (X551 blocks an overlap JOIN with it; here it allocates
    a MEASURE across buckets).

    Day counts are integer date arithmetic; each order contributes
    price·days/{_RR_TERM_DAYS} exactly, summed per month and rounded.
    Scale: the explode factor is term-length/month ≈ 4 rows per
    order — a constant multiplier, then one month-keyed rollup."""
    o = load(spark, sf_dir, "orders")
    ords = o.select(
        "o_orderkey",
        "o_totalprice",
        F.col("o_orderdate").cast("date").alias("start_d"),
        F.date_add(F.col("o_orderdate").cast("date"), _RR_TERM_DAYS).alias(
            "end_d"
        ),
    )
    spans = ords.select(
        "o_orderkey",
        "o_totalprice",
        "start_d",
        "end_d",
        F.explode(
            F.expr(
                "sequence(date_trunc('month', start_d),"
                " date_trunc('month', date_sub(end_d, 1)),"
                " interval 1 month)"
            )
        ).alias("mon0"),
    ).withColumn("mon", F.col("mon0").cast("date"))
    pro = spans.select(
        "mon",
        "o_totalprice",
        F.datediff(
            F.least(F.col("end_d"), F.add_months(F.col("mon"), 1)),
            F.greatest(F.col("start_d"), F.col("mon")),
        ).alias("days"),
    )
    return (
        pro.filter(F.col("days") > 0)
        .groupBy("mon")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.round(
                F.sum(
                    F.col("o_totalprice") * F.col("days") / _RR_TERM_DAYS
                ),
                2,
            ).alias("recognized"),
        )
    )


# ---------------------------------------------------------------------------
# X567 — SELECT * EXCEPT projection syntax
# ---------------------------------------------------------------------------


@query(
    "q_select_except",
    oracle="""
    SELECT * EXCLUDE (c_name, c_acctbal),
           round(c_acctbal, 0) AS bal_rounded
    FROM customer WHERE c_custkey < 50
    """,
)
def q_select_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X567 — the `SELECT * EXCEPT (...)` star-projection modifier
    (Spark 4 SQL; DuckDB spells it `EXCLUDE`): project everything but
    the named columns — the ergonomic answer to wide-table 'all
    except PII/large columns' projections that otherwise need the
    full column list spelled out (and silently rot when the schema
    evolves).  Column pruning still reaches the scan: the excluded
    columns never leave parquet unless re-referenced (here
    c_acctbal is re-added as a derived column to prove the modifier
    and an explicit reference compose).

    Scale note: EXCEPT is resolved at analysis time — the physical
    plan is an ordinary pruned scan."""
    d = load(spark, sf_dir, "customer")
    d.createOrReplaceTempView("_x567_customer")
    return spark.sql(
        """
        SELECT * EXCEPT (c_name, c_acctbal),
               round(c_acctbal, 0) AS bal_rounded
        FROM _x567_customer WHERE c_custkey < 50
        """
    )
