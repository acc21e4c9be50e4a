"""Round-5 batch F: retrieval modernities + OR/harmonic closure.

Five components: binary (sign-bit) embedding quantization with
hamming shortlist + exact rerank (X547 — the 32×-compression vector
trick between X50's int8 and X508's PQ), hybrid sparse+dense retrieval
fused by RRF (X548 — the production search stack: BM25/TF-IDF and
embeddings disagree, reciprocal-rank fusion reconciles them), harmonic
(Fourier-term) seasonal regression (X549 — FITS the annual cycle X460's
periodogram only detects), the EOQ lot-size model (X550 — completing
the inventory family X420 safety stock / X435 newsvendor), and an
interval-overlap self-join on user sessions via time-bucket blocking
(X551 — the two-sided interval join X5's point-in-range join doesn't
cover).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text, vectors
from ..session import default_parallelism
from ..sources.tables import load
from .registry import query

# ---------------------------------------------------------------------------
# X547 — binary (sign-bit) quantization + hamming shortlist + rerank
# ---------------------------------------------------------------------------

_BQ_SHORTLIST = 20


def _pack_bits(emb: Column, lo: int) -> Column:
    """Pack dims [lo, lo+32) of an embedding into a sign-bit bigint."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(31)),
        F.lit(0).cast("long"),
        lambda acc, d: acc
        + F.when(
            F.element_at(emb, d + lo + 1).cast("double") > 0,
            # 2^d is exact in doubles for d<=31 (shiftleft needs a
            # literal shift amount; pow keeps d column-valued)
            F.pow(F.lit(2.0), d).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )


def _pack_bits_sql(e: str, lo: int) -> str:
    return (
        f"list_sum(list_transform(range(0, 32), d -> CASE WHEN "
        f"CAST({e}[d + {lo} + 1] AS DOUBLE) > 0 THEN (CAST(1 AS BIGINT)"
        f" << d) ELSE CAST(0 AS BIGINT) END))"
    )


@query(
    "q_binary_quantization",
    oracle=f"""
    WITH codes AS MATERIALIZED (
      SELECT vec_id, embedding,
             {_pack_bits_sql('embedding', 0)} AS c_lo,
             {_pack_bits_sql('embedding', 32)} AS c_hi
      FROM embeddings
    ), qs AS (SELECT * FROM codes WHERE vec_id < 10),
    ham AS (
      SELECT q.vec_id AS q_id, c.vec_id AS n_id,
             bit_count(xor(q.c_lo, c.c_lo))
             + bit_count(xor(q.c_hi, c.c_hi)) AS hd,
             q.embedding AS qe, c.embedding AS ce
      FROM qs q, codes c WHERE q.vec_id <> c.vec_id
    ), short AS (
      SELECT q_id, n_id, hd, qe, ce,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY hd, n_id) AS hrank
      FROM ham
    ), rerank AS (
      SELECT q_id, n_id,
             row_number() OVER (PARTITION BY q_id ORDER BY
               round({vectors.cosine_sql('qe', 'ce')}, 6) DESC, n_id)
               AS rn
      FROM short WHERE hrank <= {_BQ_SHORTLIST}
    ), exact AS (
      SELECT q_id, n_id FROM (
        SELECT q.vec_id AS q_id, c.vec_id AS n_id,
               row_number() OVER (PARTITION BY q.vec_id ORDER BY
                 round({vectors.cosine_sql('q.embedding', 'c.embedding')},
                       6) DESC, c.vec_id) AS rn
        FROM qs q, embeddings c WHERE q.vec_id <> c.vec_id
      ) WHERE rn <= 3
    ), hits AS (
      SELECT e.q_id, count(r.n_id) AS n_hits
      FROM exact e LEFT JOIN (SELECT q_id, n_id FROM rerank
                              WHERE rn <= 3) r
        ON e.q_id = r.q_id AND e.n_id = r.n_id
      GROUP BY e.q_id)
    SELECT q_id, CAST(n_hits AS BIGINT) AS n_hits,
           round(n_hits / 3.0, 6) AS recall_at_3
    FROM hits
    """,
)
def q_binary_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X547 — BINARY quantization for vector search: each 64-d float
    embedding collapses to one sign bit per dimension (two packed
    bigints, a 32× memory cut — the step beyond X50's int8 4× and
    X508's PQ 16×); candidate search is hamming distance on the codes
    (`bit_count(xor)` — pure integer ops, SIMD-friendly at scale),
    the top-{_BQ_SHORTLIST} shortlist is re-ranked with exact float
    cosine, and recall@3 against the uncompressed ground truth is the
    verdict.  This hamming-shortlist + exact-rerank topology is the
    modern binary-embedding serving stack.

    Bit packing, hamming, ranking and recall are all integer/rounded
    arithmetic — engine-exact.  Scale: codes are 16 bytes/vector; the
    hamming scan is the only corpus-wide pass and it reads codes, not
    floats; float vectors are touched only for shortlist×queries."""
    emb = load(spark, sf_dir, "embeddings")
    codes = emb.select(
        "vec_id",
        "embedding",
        _pack_bits(F.col("embedding"), 0).alias("c_lo"),
        _pack_bits(F.col("embedding"), 32).alias("c_hi"),
    ).localCheckpoint(eager=True)
    qs = codes.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qe"),
        F.col("c_lo").alias("q_lo"),
        F.col("c_hi").alias("q_hi"),
    )
    ham = (
        F.broadcast(qs)
        .crossJoin(
            codes.select(
                F.col("vec_id").alias("n_id"),
                F.col("embedding").alias("ce"),
                "c_lo",
                "c_hi",
            )
        )
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            "qe",
            "ce",
            (
                F.bit_count(F.col("q_lo").bitwiseXOR(F.col("c_lo")))
                + F.bit_count(F.col("q_hi").bitwiseXOR(F.col("c_hi")))
            ).alias("hd"),
        )
    )
    short = ham.withColumn(
        "hrank",
        F.row_number().over(
            Window.partitionBy("q_id").orderBy("hd", "n_id")
        ),
    ).filter(F.col("hrank") <= _BQ_SHORTLIST)
    rerank = short.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("q_id").orderBy(
                F.desc(
                    F.round(vectors.cosine("qe", "ce"), 6)
                ),
                "n_id",
            )
        ),
    ).filter(F.col("rn") <= 3)
    exact = (
        F.broadcast(qs.select("q_id", "qe"))
        .crossJoin(
            emb.select(
                F.col("vec_id").alias("n_id"), F.col("embedding").alias("ce")
            )
        )
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(
                    F.desc(
                        F.round(
                            vectors.cosine("qe", "ce"), 6
                        )
                    ),
                    "n_id",
                )
            ),
        )
        .filter(F.col("rn") <= 3)
        .select("q_id", F.col("n_id").alias("e_n"))
    )
    rr = rerank.select(
        F.col("q_id").alias("r_q"), F.col("n_id").alias("r_n")
    )
    hits = (
        exact.join(
            rr,
            (F.col("q_id") == F.col("r_q"))
            & (F.col("e_n") == F.col("r_n")),
            "left",
        )
        .groupBy("q_id")
        .agg(F.count("r_n").alias("n_hits"))
    )
    return hits.select(
        "q_id",
        F.col("n_hits").cast("long").alias("n_hits"),
        F.round(F.col("n_hits") / 3.0, 6).alias("recall_at_3"),
    )


# ---------------------------------------------------------------------------
# X548 — hybrid sparse+dense retrieval with reciprocal-rank fusion
# ---------------------------------------------------------------------------

_HY_K = 20
_HY_RRF = 60
_HY_DF_MAX = 400


@query(
    "q_hybrid_retrieval",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({text.tokens_sql('text')}) AS w FROM documents
    ),
    tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY doc_id, w),
    dfq AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
    nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tok),
    wt AS (
      SELECT tf.doc_id, tf.w,
             tf.tf * ln((nd.n_docs + 1.0) / (dfq.df + 1.0)) AS wgt
      FROM tf JOIN dfq ON tf.w = dfq.w CROSS JOIN nd
      WHERE dfq.df <= {_HY_DF_MAX}
    ),
    nrm AS (SELECT doc_id, sqrt(sum(wgt * wgt)) AS nrm FROM wt
            GROUP BY doc_id),
    sparse AS (
      SELECT a.doc_id AS q_id, b.doc_id AS n_id,
             row_number() OVER (PARTITION BY a.doc_id ORDER BY
               round(sum(a.wgt * b.wgt) / (any_value(na.nrm)
                     * any_value(nb.nrm)), 6) DESC, b.doc_id) AS r_sparse
      FROM wt a JOIN wt b ON a.w = b.w AND a.doc_id <> b.doc_id
      JOIN nrm na ON na.doc_id = a.doc_id
      JOIN nrm nb ON nb.doc_id = b.doc_id
      WHERE a.doc_id < 5
      GROUP BY a.doc_id, b.doc_id
    ),
    dense AS (
      SELECT q.vec_id AS q_id, c.vec_id AS n_id,
             row_number() OVER (PARTITION BY q.vec_id ORDER BY
               round({vectors.cosine_sql('q.embedding', 'c.embedding')},
                     6) DESC, c.vec_id) AS r_dense
      FROM embeddings q, embeddings c
      WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id
    ),
    fused AS (
      SELECT coalesce(s.q_id, d.q_id) AS q_id,
             coalesce(s.n_id, d.n_id) AS n_id,
             round(coalesce(1.0 / ({_HY_RRF} + s.r_sparse), 0)
                   + coalesce(1.0 / ({_HY_RRF} + d.r_dense), 0), 6)
               AS rrf,
             s.r_sparse, d.r_dense
      FROM (SELECT * FROM sparse WHERE r_sparse <= {_HY_K}) s
      FULL OUTER JOIN (SELECT * FROM dense WHERE r_dense <= {_HY_K}) d
        ON s.q_id = d.q_id AND s.n_id = d.n_id
    )
    SELECT q_id, n_id, rrf,
           CAST(r_sparse AS BIGINT) AS r_sparse,
           CAST(r_dense AS BIGINT) AS r_dense
    FROM (
      SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY rrf DESC, n_id) AS fr
      FROM fused
    ) WHERE fr <= 5
    """,
)
def q_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X548 — HYBRID retrieval, the production search topology: a
    sparse ranker (TF-IDF cosine over tokens — the X34/X176 lexical
    stack) and a dense ranker (embedding cosine — the X14/E3 vector
    stack) each produce a top-{_HY_K} list per query doc, fused by
    reciprocal-rank fusion (RRF, k={_HY_RRF}) — the score-free fusion
    that needs no calibration between incomparable score scales.
    Output: top-5 fused per query with each side's rank exposed
    (NULL = found by one modality only — the rows that justify
    hybrid's existence).

    Ranks come from 6-dp-rounded scores with id tie-breaks, fusion is
    rational arithmetic on integer ranks — engine-exact.  Scale: the
    sparse side is a token-keyed inverted-index join (df-capped),
    the dense side IVF-routable (X30); fusion touches only 2·K rows
    per query."""
    d = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    tok = d.select(
        "doc_id", F.explode(text.tokens(F.col("text"))).alias("w")
    )
    tf = tok.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    dfq = tf.groupBy("w").agg(F.count("*").alias("df"))
    nd = tok.agg(F.countDistinct("doc_id").alias("n_docs"))
    # materialize the df-capped weight table once (round 13, guide
    # §2.4): it feeds THREE consumers (the norm rollup and both sides
    # of the inverted-index self-join), each of which otherwise re-ran
    # the tokenize + tf + df lineage
    wt = (
        tf.join(dfq, "w")
        .filter(F.col("df") <= _HY_DF_MAX)
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "w",
            (
                F.col("tf")
                * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))
            ).alias("wgt"),
        )
        .localCheckpoint(eager=True)
    )
    nrm = wt.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("wgt") * F.col("wgt"))).alias("nrm")
    )
    a = wt.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("q_id"), "w", F.col("wgt").alias("wa")
    )
    sparse = (
        a.join(
            wt.select(
                F.col("doc_id").alias("n_id"), "w", F.col("wgt").alias("wb")
            ),
            "w",
        )
        .filter(F.col("q_id") != F.col("n_id"))
        .groupBy("q_id", "n_id")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
        .join(
            F.broadcast(
                nrm.select(F.col("doc_id").alias("q_id"),
                           F.col("nrm").alias("na"))
            ),
            "q_id",
        )
        .join(
            nrm.select(F.col("doc_id").alias("n_id"),
                       F.col("nrm").alias("nb")),
            "n_id",
        )
        .withColumn(
            "r_sparse",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(
                    F.desc(
                        F.round(
                            F.col("dot") / (F.col("na") * F.col("nb")), 6
                        )
                    ),
                    "n_id",
                )
            ),
        )
        .filter(F.col("r_sparse") <= _HY_K)
        .select("q_id", "n_id", "r_sparse")
    )
    qe = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    dense = (
        F.broadcast(qe)
        .crossJoin(
            # fan the corpus side out before the |Q|·n cosine pass —
            # the single-split scan would run it on one core (§2.6)
            emb.select(
                F.col("vec_id").alias("n_id"), F.col("embedding").alias("ce")
            ).repartition(default_parallelism())
        )
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn(
            "r_dense",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(
                    F.desc(
                        F.round(
                            vectors.cosine("qe", "ce"), 6
                        )
                    ),
                    "n_id",
                )
            ),
        )
        .filter(F.col("r_dense") <= _HY_K)
        .select("q_id", "n_id", "r_dense")
    )
    s = sparse.alias("s")
    dn = dense.alias("dn")
    fused = (
        s.join(
            dn,
            (F.col("s.q_id") == F.col("dn.q_id"))
            & (F.col("s.n_id") == F.col("dn.n_id")),
            "full_outer",
        )
        .select(
            F.coalesce(F.col("s.q_id"), F.col("dn.q_id")).alias("q_id"),
            F.coalesce(F.col("s.n_id"), F.col("dn.n_id")).alias("n_id"),
            F.round(
                F.coalesce(
                    1.0 / (_HY_RRF + F.col("s.r_sparse")), F.lit(0.0)
                )
                + F.coalesce(
                    1.0 / (_HY_RRF + F.col("dn.r_dense")), F.lit(0.0)
                ),
                6,
            ).alias("rrf"),
            F.col("s.r_sparse").cast("long").alias("r_sparse"),
            F.col("dn.r_dense").cast("long").alias("r_dense"),
        )
    )
    return (
        fused.withColumn(
            "fr",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(F.desc("rrf"), "n_id")
            ),
        )
        .filter(F.col("fr") <= 5)
        .select("q_id", "n_id", "rrf", "r_sparse", "r_dense")
    )


# ---------------------------------------------------------------------------
# X549 — harmonic (Fourier-term) seasonal regression
# ---------------------------------------------------------------------------

_PI = 3.141592653589793


@query(
    "q_harmonic_regression",
    oracle=f"""
    WITH m0 AS (
      SELECT date_trunc('month', o_orderdate) AS mon,
             CAST(month(date_trunc('month', o_orderdate)) AS DOUBLE)
               AS moy,
             round(sum(o_totalprice) / 1e6, 6) AS y
      FROM orders GROUP BY 1
    ), x AS (
      SELECT y,
             round(sin(2 * {_PI} * moy / 12), 8) AS s,
             round(cos(2 * {_PI} * moy / 12), 8) AS c
      FROM m0
    ), m AS (
      SELECT count(*) AS n,
             round(sum(s), 6) AS ss, round(sum(c), 6) AS sc,
             round(sum(s * s), 6) AS sss, round(sum(c * c), 6) AS scc,
             round(sum(s * c), 6) AS ssc,
             round(sum(y), 6) AS sy, round(sum(y * s), 6) AS sys,
             round(sum(y * c), 6) AS syc,
             round(sum(y * y), 6) AS syy
      FROM x
    ), solved AS (
      SELECT n, sy, syy,
             (n * (sss * scc - ssc * ssc) - ss * (ss * scc - ssc * sc)
              + sc * (ss * ssc - sss * sc)) AS det,
             (sy * (sss * scc - ssc * ssc) - ss * (sys * scc - ssc * syc)
              + sc * (sys * ssc - sss * syc)) AS det_a,
             (n * (sys * scc - ssc * syc) - sy * (ss * scc - ssc * sc)
              + sc * (ss * syc - sys * sc)) AS det_b,
             (n * (sss * syc - sys * ssc) - ss * (ss * syc - sys * sc)
              + sy * (ss * ssc - sss * sc)) AS det_c
      FROM m
    )
    SELECT round(det_a / det, 6) AS intercept,
           round(det_b / det, 6) AS beta_sin,
           round(det_c / det, 6) AS beta_cos,
           round(sqrt(pow(det_b / det, 2) + pow(det_c / det, 2)), 6)
             AS amplitude,
           round(1 - (syy - (det_a / det) * sy - (det_b / det)
                      * (SELECT sys FROM m) - (det_c / det)
                      * (SELECT syc FROM m))
                 / (syy - sy * sy / n), 6) AS r2
    FROM solved
    """,
)
def q_harmonic_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X549 — harmonic regression: monthly revenue on the annual
    Fourier pair y = a + b·sin(2πm/12) + c·cos(2πm/12), solved in
    closed form by Cramer's rule on the 3×3 normal equations;
    amplitude √(b²+c²) and R² summarize how much of revenue is annual
    cycle.  X460's periodogram DETECTS periodicity and X211's
    seasonal indices tabulate it; this FITS it as a parametric model
    usable for forecasting and detrending (the regressor construction
    every 'add Fourier features' pipeline uses).

    sin/cos values are rounded to 8 dp BEFORE the moment sums (libm
    may differ at 1 ulp between engines), sums rounded to 6, and the
    entire solve is then identical closed-form arithmetic.  Scale:
    one fact rollup to months; the solve is constant work."""
    o = load(spark, sf_dir, "orders")
    m0 = o.groupBy(F.date_trunc("month", "o_orderdate").alias("mon")).agg(
        F.round(F.sum("o_totalprice") / 1e6, 6).alias("y")
    )
    x = m0.select(
        "y",
        F.round(
            F.sin(2 * _PI * F.month("mon").cast("double") / 12), 8
        ).alias("s"),
        F.round(
            F.cos(2 * _PI * F.month("mon").cast("double") / 12), 8
        ).alias("c"),
    )
    m = x.agg(
        F.count("*").alias("n"),
        F.round(F.sum("s"), 6).alias("ss"),
        F.round(F.sum("c"), 6).alias("sc"),
        F.round(F.sum(F.col("s") * F.col("s")), 6).alias("sss"),
        F.round(F.sum(F.col("c") * F.col("c")), 6).alias("scc"),
        F.round(F.sum(F.col("s") * F.col("c")), 6).alias("ssc"),
        F.round(F.sum("y"), 6).alias("sy"),
        F.round(F.sum(F.col("y") * F.col("s")), 6).alias("sys"),
        F.round(F.sum(F.col("y") * F.col("c")), 6).alias("syc"),
        F.round(F.sum(F.col("y") * F.col("y")), 6).alias("syy"),
    )
    n, ss, sc = F.col("n"), F.col("ss"), F.col("sc")
    sss, scc, ssc = F.col("sss"), F.col("scc"), F.col("ssc")
    sy, sys, syc, syy = (
        F.col("sy"),
        F.col("sys"),
        F.col("syc"),
        F.col("syy"),
    )
    det = (
        n * (sss * scc - ssc * ssc)
        - ss * (ss * scc - ssc * sc)
        + sc * (ss * ssc - sss * sc)
    )
    det_a = (
        sy * (sss * scc - ssc * ssc)
        - ss * (sys * scc - ssc * syc)
        + sc * (sys * ssc - sss * syc)
    )
    det_b = (
        n * (sys * scc - ssc * syc)
        - sy * (ss * scc - ssc * sc)
        + sc * (ss * syc - sys * sc)
    )
    det_c = (
        n * (sss * syc - sys * ssc)
        - ss * (ss * syc - sys * sc)
        + sy * (ss * ssc - sss * sc)
    )
    aa, bb, cc = det_a / det, det_b / det, det_c / det
    return m.select(
        F.round(aa, 6).alias("intercept"),
        F.round(bb, 6).alias("beta_sin"),
        F.round(cc, 6).alias("beta_cos"),
        F.round(F.sqrt(F.pow(bb, 2) + F.pow(cc, 2)), 6).alias("amplitude"),
        F.round(
            1
            - (syy - aa * sy - bb * sys - cc * syc)
            / (syy - sy * sy / n),
            6,
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# X550 — economic order quantity (EOQ)
# ---------------------------------------------------------------------------

_EOQ_K = 100.0  # fixed ordering cost per order
_EOQ_HOLD = 0.2  # holding cost as a fraction of unit price per year


@query(
    "q_eoq",
    oracle=f"""
    WITH d AS (
      SELECT p.p_brand AS brand,
             round(sum(l.l_quantity), 2) AS total_qty,
             round(avg(p.p_retailprice), 6) AS unit_price,
             CAST(datediff('day', (SELECT min(l_shipdate) FROM lineitem),
                  (SELECT max(l_shipdate) FROM lineitem)) AS DOUBLE)
               / 365.0 AS years
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_brand
    ), e AS (
      SELECT brand, round(total_qty / years, 6) AS annual_demand,
             {_EOQ_HOLD} * unit_price AS h
      FROM d
    )
    SELECT brand, annual_demand,
           round(sqrt(2 * annual_demand * {_EOQ_K} / h), 4) AS eoq,
           round(annual_demand / sqrt(2 * annual_demand * {_EOQ_K} / h),
                 4) AS orders_per_year,
           round(sqrt(2 * annual_demand * {_EOQ_K} * h), 4)
             AS annual_cost,
           round(1.25 * sqrt(2 * annual_demand * {_EOQ_K} * h), 4)
             AS cost_at_half_eoq
    FROM e
    """,
)
def q_eoq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X550 — economic order quantity per brand: Q* = √(2DK/h) with
    demand rate D from shipped quantities per year, ordering cost
    K = {_EOQ_K}, holding cost h = {_EOQ_HOLD}·unit price — plus the
    optimal annual cost √(2DKh) and the classic robustness fact that
    ordering at Q*/2 costs exactly 1.25× optimum (the flat-bottom
    property practitioners rely on).  Completes the inventory family:
    X420 sizes the safety buffer, X435 the single-period quantity,
    EOQ the repeating lot.

    Demand sums and the horizon are rounded before the closed forms.
    Scale: one fact pass into a 25-row brand rollup."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    span = li.agg(
        (
            (
                F.datediff(F.max("l_shipdate"), F.min("l_shipdate"))
            ).cast("double")
            / 365.0
        ).alias("years")
    )
    d = (
        li.join(
            F.broadcast(p.select("p_partkey", "p_brand", "p_retailprice")),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
            F.round(F.avg("p_retailprice"), 6).alias("unit_price"),
        )
        .crossJoin(F.broadcast(span))
    )
    e = d.select(
        "brand",
        F.round(F.col("total_qty") / F.col("years"), 6).alias(
            "annual_demand"
        ),
        (_EOQ_HOLD * F.col("unit_price")).alias("h"),
    )
    ad, h = F.col("annual_demand"), F.col("h")
    eoq = F.sqrt(2 * ad * _EOQ_K / h)
    cost = F.sqrt(2 * ad * _EOQ_K * h)
    return e.select(
        "brand",
        "annual_demand",
        F.round(eoq, 4).alias("eoq"),
        F.round(ad / eoq, 4).alias("orders_per_year"),
        F.round(cost, 4).alias("annual_cost"),
        F.round(1.25 * cost, 4).alias("cost_at_half_eoq"),
    )


# ---------------------------------------------------------------------------
# X551 — interval-overlap self-join on user sessions (bucket-blocked)
# ---------------------------------------------------------------------------

_SOJ_GAP_MIN = 30
_SOJ_TOP = 15


@query(
    "q_session_overlap_join",
    oracle=f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) / 1000000.0 AS sec, event_id
      FROM events
    ), marked AS (
      SELECT user_id, sec,
             CASE WHEN sec - lag(sec) OVER (PARTITION BY user_id
                    ORDER BY sec, event_id) > {_SOJ_GAP_MIN * 60}
                  OR lag(sec) OVER (PARTITION BY user_id
                    ORDER BY sec, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM e
    ), sess AS MATERIALIZED (
      SELECT user_id, sid, min(sec) AS st, max(sec) AS en
      FROM (SELECT user_id, sec,
                   sum(is_start) OVER (PARTITION BY user_id
                     ORDER BY sec ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS sid
            FROM marked)
      GROUP BY user_id, sid
    ), bucketed AS (
      SELECT user_id, sid, st, en,
             unnest(generate_series(CAST(floor(st / 3600) AS BIGINT),
                                    CAST(floor(en / 3600) AS BIGINT)))
               AS hb
      FROM sess
    ), pairs AS (
      SELECT DISTINCT a.user_id AS u1, a.sid AS s1,
             b.user_id AS u2, b.sid AS s2,
             least(a.en, b.en) - greatest(a.st, b.st) AS ov
      FROM bucketed a JOIN bucketed b
        ON a.hb = b.hb AND a.user_id < b.user_id
      WHERE a.st < b.en AND b.st < a.en
    )
    SELECT u1, u2, CAST(count(*) AS BIGINT) AS n_overlap_sessions,
           round(sum(ov) / 60.0, 4) AS overlap_min
    FROM pairs GROUP BY u1, u2
    ORDER BY overlap_min DESC, u1, u2 LIMIT {_SOJ_TOP}
    """,
)
def q_session_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X551 — INTERVAL-OVERLAP self-join: users' {_SOJ_GAP_MIN}-minute
    sessions (gaps-and-islands) joined against other users' sessions
    on strict time overlap — the co-presence primitive behind
    "who was online together" and fraud co-occurrence screens.  Both
    join sides are INTERVALS (X5's range join probes points into
    intervals; X108 measures global concurrency without identifying
    the pairs).  The quadratic blowup is blocked by exploding each
    session over the hour buckets it spans and equi-joining on the
    bucket before the residual overlap predicate — a session pair
    spanning several shared hours is de-duplicated by DISTINCT.
    Top-{_SOJ_TOP} pairs by total overlapping minutes.

    Timestamps go through integer microseconds (identical doubles in
    both engines); overlap sums are exact micro arithmetic.  Scale:
    bucket width trades replication factor against per-bucket join
    fan-out — the standard interval-join tuning knob; everything
    shuffles on the bucket key."""
    ev = load(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        (F.unix_micros("ts").cast("double") / 1000000.0).alias("sec"),
        "event_id",
    )
    wo = Window.partitionBy("user_id").orderBy("sec", "event_id")
    marked = e.select(
        "user_id",
        "sec",
        F.when(
            (F.col("sec") - F.lag("sec").over(wo) > _SOJ_GAP_MIN * 60)
            | F.lag("sec").over(wo).isNull(),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    wc = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = (
        marked.withColumn("sid", F.sum("is_start").over(wc))
        .groupBy("user_id", "sid")
        .agg(F.min("sec").alias("st"), F.max("sec").alias("en"))
        .localCheckpoint(eager=True)
    )
    bucketed = sess.select(
        "user_id",
        "sid",
        "st",
        "en",
        F.explode(
            F.sequence(
                F.floor(F.col("st") / 3600).cast("long"),
                F.floor(F.col("en") / 3600).cast("long"),
            )
        ).alias("hb"),
    )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.hb") == F.col("b.hb"))
            & (F.col("a.user_id") < F.col("b.user_id"))
            & (F.col("a.st") < F.col("b.en"))
            & (F.col("b.st") < F.col("a.en")),
        )
        .select(
            F.col("a.user_id").alias("u1"),
            F.col("a.sid").alias("s1"),
            F.col("b.user_id").alias("u2"),
            F.col("b.sid").alias("s2"),
            (
                F.least(F.col("a.en"), F.col("b.en"))
                - F.greatest(F.col("a.st"), F.col("b.st"))
            ).alias("ov"),
        )
        .distinct()
    )
    return (
        pairs.groupBy("u1", "u2")
        .agg(
            F.count("*").cast("long").alias("n_overlap_sessions"),
            F.round(F.sum("ov") / 60.0, 4).alias("overlap_min"),
        )
        .orderBy(F.desc("overlap_min"), "u1", "u2")
        .limit(_SOJ_TOP)
    )
