"""Round-5 batch H: decision analysis + data-curation selection.

Four components: entropy-weighted TOPSIS (X557 — the multi-criteria
ranking method ops teams use when 'best supplier' has three
incomparable axes), count-based word embeddings via PPMI power
iteration (X558 — the Levy-Goldberg observation that word2vec ≈
PMI-matrix factorization, run as three unrolled matrix-vector
rounds), margin-based uncertainty sampling (X559 — the
annotation-budget selector: label next what the current model is
least sure about), and greedy k-center coreset selection (X560 —
farthest-point data pruning: the subset whose coverage radius bounds
every point's distance to a kept example, the geometry behind
diversity-pruned training sets and IVF seeding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text, vectors
from ..sources.tables import load
from .registry import query

# ---------------------------------------------------------------------------
# X557 — entropy-weighted TOPSIS supplier ranking
# ---------------------------------------------------------------------------

_TOPSIS_TOP = 10


@query(
    "q_topsis",
    oracle=f"""
    WITH lead0 AS (
      SELECT l.l_suppkey, l.l_quantity,
             greatest(datediff('day', o.o_orderdate, l.l_shipdate), 0)
               AS lead_days
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), crit AS (
      SELECT s.s_suppkey,
             round(s.s_acctbal, 2) AS bal,
             round(sum(l.l_quantity), 2) AS qty,
             round(sum(l.lead_days) * 1.0 / count(*), 6) AS lead
      FROM supplier s JOIN lead0 l ON l.l_suppkey = s.s_suppkey
      GROUP BY s.s_suppkey, s.s_acctbal
    ), shift AS (
      SELECT s_suppkey, bal - (SELECT min(bal) FROM crit) + 1 AS c1,
             qty AS c2, lead AS c3
      FROM crit
    ), tot AS (
      SELECT count(*) AS n,
             round(sum(c1), 4) AS t1, round(sum(c2), 4) AS t2,
             round(sum(c3), 4) AS t3,
             round(sum(c1 * c1), 4) AS q1, round(sum(c2 * c2), 4) AS q2,
             round(sum(c3 * c3), 4) AS q3
      FROM shift
    ), ent AS (
      SELECT round(-sum((c1 / t.t1) * ln(c1 / t.t1)) / ln(t.n), 8) AS e1,
             round(-sum((c2 / t.t2) * ln(c2 / t.t2)) / ln(t.n), 8) AS e2,
             round(-sum((c3 / t.t3) * ln(c3 / t.t3)) / ln(t.n), 8) AS e3
      FROM shift CROSS JOIN tot t GROUP BY t.t1, t.t2, t.t3, t.n
    ), w AS (
      SELECT (1 - e1) / ((1 - e1) + (1 - e2) + (1 - e3)) AS w1,
             (1 - e2) / ((1 - e1) + (1 - e2) + (1 - e3)) AS w2,
             (1 - e3) / ((1 - e1) + (1 - e2) + (1 - e3)) AS w3
      FROM ent
    ), v AS (
      SELECT s.s_suppkey,
             w.w1 * s.c1 / sqrt(t.q1) AS v1,
             w.w2 * s.c2 / sqrt(t.q2) AS v2,
             w.w3 * s.c3 / sqrt(t.q3) AS v3
      FROM shift s CROSS JOIN tot t CROSS JOIN w
    ), ideal AS (
      SELECT max(v1) AS b1, max(v2) AS b2, min(v3) AS b3,
             min(v1) AS w1, min(v2) AS w2, max(v3) AS w3
      FROM v
    ), scored AS (
      SELECT v.s_suppkey,
             sqrt(pow(v1 - i.b1, 2) + pow(v2 - i.b2, 2)
                  + pow(v3 - i.b3, 2)) AS dp,
             sqrt(pow(v1 - i.w1, 2) + pow(v2 - i.w2, 2)
                  + pow(v3 - i.w3, 2)) AS dm
      FROM v CROSS JOIN ideal i
    )
    SELECT s_suppkey, round(dm / (dp + dm), 6) AS topsis_score,
           CAST(row_number() OVER (ORDER BY round(dm / (dp + dm), 6)
                                   DESC, s_suppkey) AS BIGINT) AS rnk
    FROM scored
    ORDER BY rnk LIMIT {_TOPSIS_TOP}
    """,
)
def q_topsis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X557 — entropy-weighted TOPSIS: suppliers ranked on three
    incomparable criteria (account balance ↑, shipped volume ↑, mean
    lead time ↓).  Weights come from the data itself — Shannon
    entropy of each criterion's share distribution (flat column →
    high entropy → low weight); alternatives are scored by closeness
    to the ideal point, C = D⁻/(D⁺+D⁻).  The multi-criteria
    decision-analysis member the OR family (X420/X435/X550) was
    missing: those optimize ONE objective, TOPSIS ranks under
    several.  Negative balances are shifted positive before the
    entropy share (ln of a share needs positivity); lead times are
    clamped at 0 (the synthetic data ships some items before their
    order date — TESTDATA quirk, documented convention).

    Every scalar is a rounded sum or derived from one.  Scale: one
    fact pass to the 100-row criteria table; everything after is
    constant-size."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    sup = load(spark, sf_dir, "supplier")
    lead0 = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_suppkey",
        "l_quantity",
        F.greatest(
            F.datediff("l_shipdate", "o_orderdate"), F.lit(0)
        ).alias("lead_days"),
    )
    crit = (
        sup.join(lead0, sup.s_suppkey == lead0.l_suppkey)
        .groupBy("s_suppkey", "s_acctbal")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("qty"),
            F.round(F.sum("lead_days") / F.count("*"), 6).alias("lead"),
        )
        .select(
            "s_suppkey",
            F.round("s_acctbal", 2).alias("bal"),
            "qty",
            "lead",
        )
    )
    minbal = crit.agg(F.min("bal").alias("mb"))
    shift = crit.crossJoin(F.broadcast(minbal)).select(
        "s_suppkey",
        (F.col("bal") - F.col("mb") + 1).alias("c1"),
        F.col("qty").alias("c2"),
        F.col("lead").alias("c3"),
    )
    tot = shift.agg(
        F.count("*").alias("n"),
        F.round(F.sum("c1"), 4).alias("t1"),
        F.round(F.sum("c2"), 4).alias("t2"),
        F.round(F.sum("c3"), 4).alias("t3"),
        F.round(F.sum(F.col("c1") * F.col("c1")), 4).alias("q1"),
        F.round(F.sum(F.col("c2") * F.col("c2")), 4).alias("q2"),
        F.round(F.sum(F.col("c3") * F.col("c3")), 4).alias("q3"),
    )
    st = shift.crossJoin(F.broadcast(tot))
    ent = st.groupBy("t1", "t2", "t3", "n").agg(
        F.round(
            -F.sum(
                (F.col("c1") / F.col("t1"))
                * F.log(F.col("c1") / F.col("t1"))
            )
            / F.log(F.col("n").cast("double")),
            8,
        ).alias("e1"),
        F.round(
            -F.sum(
                (F.col("c2") / F.col("t2"))
                * F.log(F.col("c2") / F.col("t2"))
            )
            / F.log(F.col("n").cast("double")),
            8,
        ).alias("e2"),
        F.round(
            -F.sum(
                (F.col("c3") / F.col("t3"))
                * F.log(F.col("c3") / F.col("t3"))
            )
            / F.log(F.col("n").cast("double")),
            8,
        ).alias("e3"),
    )
    dsum = (1 - F.col("e1")) + (1 - F.col("e2")) + (1 - F.col("e3"))
    w = ent.select(
        ((1 - F.col("e1")) / dsum).alias("w1"),
        ((1 - F.col("e2")) / dsum).alias("w2"),
        ((1 - F.col("e3")) / dsum).alias("w3"),
    )
    v = (
        shift.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(w))
        .select(
            "s_suppkey",
            (F.col("w1") * F.col("c1") / F.sqrt(F.col("q1"))).alias("v1"),
            (F.col("w2") * F.col("c2") / F.sqrt(F.col("q2"))).alias("v2"),
            (F.col("w3") * F.col("c3") / F.sqrt(F.col("q3"))).alias("v3"),
        )
    )
    ideal = v.agg(
        F.max("v1").alias("b1"),
        F.max("v2").alias("b2"),
        F.min("v3").alias("b3"),
        F.min("v1").alias("wo1"),
        F.min("v2").alias("wo2"),
        F.max("v3").alias("wo3"),
    )
    scored = v.crossJoin(F.broadcast(ideal)).select(
        "s_suppkey",
        F.sqrt(
            F.pow(F.col("v1") - F.col("b1"), 2)
            + F.pow(F.col("v2") - F.col("b2"), 2)
            + F.pow(F.col("v3") - F.col("b3"), 2)
        ).alias("dp"),
        F.sqrt(
            F.pow(F.col("v1") - F.col("wo1"), 2)
            + F.pow(F.col("v2") - F.col("wo2"), 2)
            + F.pow(F.col("v3") - F.col("wo3"), 2)
        ).alias("dm"),
    )
    sc = F.round(F.col("dm") / (F.col("dp") + F.col("dm")), 6)
    return (
        scored.select(
            "s_suppkey",
            sc.alias("topsis_score"),
            F.row_number()
            .over(Window.orderBy(sc.desc(), "s_suppkey"))
            .cast("long")
            .alias("rnk"),
        )
        .orderBy("rnk")
        .limit(_TOPSIS_TOP)
    )


# ---------------------------------------------------------------------------
# X558 — count-based word embedding: PPMI power iteration
# ---------------------------------------------------------------------------

_PSVD_TOP = 15


def _psvd_iter_sql(prev: str, out: str) -> str:
    return f"""
    u_{out} AS MATERIALIZED (
      SELECT m.w1 AS w, sum(m.ppmi * v.val) AS raw
      FROM ppmi m JOIN {prev} v ON m.w2 = v.w GROUP BY m.w1),
    {out} AS MATERIALIZED (
      SELECT w, raw / (SELECT sqrt(sum(raw * raw)) FROM u_{out})
        AS val
      FROM u_{out})"""


@query(
    "q_pmi_svd",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, unnest({text.tokens_sql('text')}) AS w
      FROM documents
    ),
    dfc AS (SELECT w, count(*) AS df FROM tok GROUP BY w),
    nn AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tok),
    co AS (
      SELECT a.w AS w1, b.w AS w2, count(*) AS n_ab
      FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND a.w <> b.w
      GROUP BY a.w, b.w
    ),
    ppmi AS MATERIALIZED (
      SELECT co.w1, co.w2,
             greatest(round(ln(co.n_ab * 1.0 * nn.n_docs
                              / (d1.df * d2.df)), 8), 0) AS ppmi
      FROM co JOIN dfc d1 ON co.w1 = d1.w
              JOIN dfc d2 ON co.w2 = d2.w
              CROSS JOIN nn
    ),
    v0 AS MATERIALIZED (
      SELECT w, 1.0 / sqrt((SELECT count(*) FROM dfc)) AS val FROM dfc
    ),
    {_psvd_iter_sql('v0', 'v1')},
    {_psvd_iter_sql('v1', 'v2')},
    {_psvd_iter_sql('v2', 'v3')}
    SELECT w, round(val, 6) AS loading
    FROM v3 ORDER BY round(val, 6) DESC, w LIMIT {_PSVD_TOP}
    """,
)
def q_pmi_svd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X558 — count-based word embeddings: the PPMI co-occurrence
    matrix (positive pointwise mutual information over doc-level
    co-occurrence, the X180 statistic matrixified) factorized by
    POWER ITERATION — three unrolled normalize(M·v) rounds extract
    the principal direction, i.e. the first column of the SVD that
    Levy & Goldberg (2014) showed word2vec implicitly computes.
    Top-{_PSVD_TOP} loadings identify the dominant co-occurrence
    axis of the corpus.  The X248 power-iteration device applied to
    a LINGUISTIC operator — distributional semantics with no
    training loop.

    PPMI entries are rounded before iteration; each round is one
    (w1,w2)-keyed join + aggregate + a scalar normalize.  Scale: the
    matrix is vocab×vocab (df-bounded), the iteration state one
    double per term — both dwarfed by the corpus scan that builds
    the counts."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(text.tokens(F.col("text"))).alias("w")
    ).distinct()
    dfc = tok.groupBy("w").agg(F.count("*").alias("df"))
    nn = tok.agg(F.countDistinct("doc_id").alias("n_docs"))
    a = tok.alias("a")
    b = tok.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.w") != F.col("b.w")),
        )
        .groupBy(F.col("a.w").alias("w1"), F.col("b.w").alias("w2"))
        .agg(F.count("*").alias("n_ab"))
    )
    ppmi = (
        co.join(dfc.select(F.col("w").alias("w1"),
                           F.col("df").alias("df1")), "w1")
        .join(dfc.select(F.col("w").alias("w2"),
                         F.col("df").alias("df2")), "w2")
        .crossJoin(F.broadcast(nn))
        .select(
            "w1",
            "w2",
            F.greatest(
                F.round(
                    F.log(
                        F.col("n_ab")
                        * 1.0
                        * F.col("n_docs")
                        / (F.col("df1") * F.col("df2"))
                    ),
                    8,
                ),
                F.lit(0.0),
            ).alias("ppmi"),
        )
        .localCheckpoint(eager=True)
    )
    nv = dfc.agg(F.count("*").alias("nw"))
    v = dfc.crossJoin(F.broadcast(nv)).select(
        "w", (1.0 / F.sqrt(F.col("nw"))).alias("val")
    )
    for _ in range(3):
        raw = (
            ppmi.join(v.select(F.col("w").alias("w2"), "val"), "w2")
            .groupBy(F.col("w1").alias("w"))
            .agg(F.sum(F.col("ppmi") * F.col("val")).alias("raw"))
        )
        nrm = raw.agg(
            F.sqrt(F.sum(F.col("raw") * F.col("raw"))).alias("nrm")
        )
        v = raw.crossJoin(F.broadcast(nrm)).select(
            "w", (F.col("raw") / F.col("nrm")).alias("val")
        )
    return (
        v.select("w", F.round("val", 6).alias("loading"))
        .orderBy(F.desc("loading"), "w")
        .limit(_PSVD_TOP)
    )


# ---------------------------------------------------------------------------
# X559 — margin-based uncertainty sampling
# ---------------------------------------------------------------------------

_US_BUDGET = 20


@query(
    "q_uncertainty_sampling",
    oracle=f"""
    WITH dims AS (
      SELECT vec_id, label, gs.d AS dim,
             CAST(embedding[gs.d] AS DOUBLE) AS val
      FROM embeddings, generate_series(1, 64) AS gs(d)
    ),
    cent AS (
      SELECT label, dim, round(sum(val), 4) / count(*) AS cval
      FROM dims WHERE vec_id >= 100 GROUP BY label, dim
    ),
    cnorm AS (
      SELECT label, sqrt(sum(cval * cval)) AS cn FROM cent
      GROUP BY label
    ),
    tnorm AS (
      SELECT vec_id, sqrt(sum(val * val)) AS tn FROM dims
      WHERE vec_id < 100 GROUP BY vec_id
    ),
    sim AS (
      SELECT d.vec_id, c.label,
             round(sum(d.val * c.cval)
                   / (any_value(tn.tn) * any_value(cn.cn)), 6) AS s
      FROM dims d
      JOIN cent c ON d.dim = c.dim
      JOIN tnorm tn ON tn.vec_id = d.vec_id
      JOIN cnorm cn ON cn.label = c.label
      WHERE d.vec_id < 100
      GROUP BY d.vec_id, c.label
    ),
    ranked AS (
      SELECT vec_id, label, s,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY s DESC, label) AS rn
      FROM sim
    ),
    margins AS (
      SELECT vec_id,
             max(CASE WHEN rn = 1 THEN label END) AS pred_label,
             round(max(CASE WHEN rn = 1 THEN s END)
                   - max(CASE WHEN rn = 2 THEN s END), 6) AS margin
      FROM ranked WHERE rn <= 2 GROUP BY vec_id
    )
    SELECT vec_id, CAST(pred_label AS INTEGER) AS pred_label, margin,
           CAST(row_number() OVER (ORDER BY margin, vec_id) AS BIGINT)
             AS pick_order
    FROM margins
    ORDER BY pick_order LIMIT {_US_BUDGET}
    """,
)
def q_uncertainty_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X559 — uncertainty sampling for annotation budgets: a
    nearest-centroid model (X246's classifier, trained on
    vec_id ≥ 100) scores the unlabeled pool, and the {_US_BUDGET}
    points with the SMALLEST top-1/top-2 cosine margin are selected
    for labeling — the active-learning loop's acquisition step, and
    in corpus curation the same math that routes borderline documents
    to human review instead of a hard keep/drop.

    Everything runs at the (vector, dimension) grain — centroid
    means from rounded sums, cosines as dim-keyed join aggregates —
    so no array reconstruction and both engines sum identical
    products.  Scale: centroids are a label×64 broadcast; scoring is
    one pass over pool×labels; the argsort is budget-bounded."""
    emb = load(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "d0", "val"
        ),
    ).select("vec_id", "label", (F.col("d0") + 1).alias("dim"), "val")
    cent = (
        dims.filter(F.col("vec_id") >= 100)
        .groupBy("label", "dim")
        .agg((F.round(F.sum("val"), 4) / F.count("*")).alias("cval"))
    )
    cnorm = cent.groupBy("label").agg(
        F.sqrt(F.sum(F.col("cval") * F.col("cval"))).alias("cn")
    )
    test = dims.filter(F.col("vec_id") < 100)
    tnorm = test.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("tn")
    )
    sim = (
        test.join(
            F.broadcast(cent.select(F.col("label").alias("clabel"),
                                    "dim", "cval")),
            "dim",
        )
        .groupBy("vec_id", "clabel")
        .agg(F.sum(F.col("val") * F.col("cval")).alias("dot"))
        .join(F.broadcast(tnorm), "vec_id")
        .join(
            F.broadcast(cnorm.select(F.col("label").alias("clabel"), "cn")),
            "clabel",
        )
        .select(
            "vec_id",
            F.col("clabel").alias("label"),
            F.round(F.col("dot") / (F.col("tn") * F.col("cn")), 6).alias(
                "s"
            ),
        )
    )
    ranked = sim.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("vec_id").orderBy(F.desc("s"), "label")
        ),
    ).filter(F.col("rn") <= 2)
    margins = ranked.groupBy("vec_id").agg(
        F.max(F.when(F.col("rn") == 1, F.col("label"))).alias(
            "pred_label"
        ),
        F.round(
            F.max(F.when(F.col("rn") == 1, F.col("s")))
            - F.max(F.when(F.col("rn") == 2, F.col("s"))),
            6,
        ).alias("margin"),
    )
    return (
        margins.select(
            "vec_id",
            F.col("pred_label").cast("int").alias("pred_label"),
            "margin",
            F.row_number()
            .over(Window.orderBy("margin", "vec_id"))
            .cast("long")
            .alias("pick_order"),
        )
        .orderBy("pick_order")
        .limit(_US_BUDGET)
    )


# ---------------------------------------------------------------------------
# X560 — greedy k-center coreset selection
# ---------------------------------------------------------------------------

_KC_ROUNDS = 5


def _kc_round_sql(prev_m: str, step: int) -> str:
    """One greedy round: pick the farthest point, relax min-distances."""
    pick = f"p{step}"
    out = f"m{step}"
    return f"""
    {pick} AS MATERIALIZED (
      SELECT vec_id, mind FROM {prev_m}
      ORDER BY mind DESC, vec_id LIMIT 1),
    {out} AS MATERIALIZED (
      SELECT m.vec_id,
             least(m.mind, round(1 - {vectors.cosine_sql(
                 'e.embedding', 'pe.embedding')}, 6)) AS mind
      FROM {prev_m} m
      JOIN embeddings e ON e.vec_id = m.vec_id
      CROSS JOIN {pick} p
      JOIN embeddings pe ON pe.vec_id = p.vec_id)"""


_KC_ORACLE = f"""
    WITH m0 AS MATERIALIZED (
      SELECT e.vec_id,
             round(1 - {vectors.cosine_sql('e.embedding', 's.embedding')},
                   6) AS mind
      FROM embeddings e
      CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) s),
    {",".join(_kc_round_sql(f'm{i}', i + 1) for i in range(_KC_ROUNDS))}
    SELECT * FROM (
      SELECT 0 AS step, CAST(0 AS BIGINT) AS picked,
             (SELECT round(max(mind), 6) FROM m0) AS radius
      {"".join(
          f" UNION ALL SELECT {i + 1}, (SELECT vec_id FROM p{i + 1}),"
          f" (SELECT round(max(mind), 6) FROM m{i + 1})"
          for i in range(_KC_ROUNDS))}
    ) ORDER BY step
    """


@query("q_kcenter_coreset", oracle=_KC_ORACLE)
def q_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X560 — greedy k-center (farthest-point) coreset selection: seed
    at vec_id 0, then {_KC_ROUNDS} rounds of 'pick the point farthest
    from everything selected, relax every point's distance to its
    nearest selected center'.  The output pins each pick AND the
    coverage radius after it — the 2-approximation guarantee's
    certificate (every point is within `radius` of a kept center).
    This is diversity-driven data PRUNING: where SemDeDup (X266)
    drops near-duplicates, k-center keeps a spread — the geometry
    used for training-subset selection and IVF seeding alike.

    Distances are 6-dp-rounded cosine distances with id tie-breaks —
    the greedy trajectory is fully deterministic.  Scale: each round
    is one broadcast of a single center against the corpus + a
    running min — k rounds of linear scans, state one double per
    point (the standard distributed k-center++ shape)."""


    emb = load(spark, sf_dir, "embeddings")
    seed = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("se")
    )
    m = (
        emb.crossJoin(F.broadcast(seed))
        .select(
            "vec_id",
            "embedding",
            F.round(
                1 - vectors.cosine("embedding", "se"), 6
            ).alias("mind"),
        )
        .localCheckpoint(eager=True)
    )
    rows = [m.agg(
        F.lit(0).alias("step"),
        F.lit(0).cast("long").alias("picked"),
        F.round(F.max("mind"), 6).alias("radius"),
    )]
    for step in range(1, _KC_ROUNDS + 1):
        pick = m.orderBy(F.desc("mind"), "vec_id").limit(1).select(
            F.col("vec_id").alias("p_id"), F.col("embedding").alias("pe")
        )
        m = (
            m.crossJoin(F.broadcast(pick))
            .select(
                "vec_id",
                "embedding",
                F.least(
                    F.col("mind"),
                    F.round(
                        1
                        - vectors.cosine("embedding", "pe"),
                        6,
                    ),
                ).alias("mind"),
                "p_id",
            )
            .localCheckpoint(eager=True)
        )
        rows.append(
            m.agg(
                F.lit(step).alias("step"),
                F.first("p_id").cast("long").alias("picked"),
                F.round(F.max("mind"), 6).alias("radius"),
            )
        )
        m = m.drop("p_id")
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("step")
