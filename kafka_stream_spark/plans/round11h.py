"""Round-11 batch H (X762–X765): always-valid inference, DP-SGD
telemetry, Byzantine-robust aggregation, and k-truss cohesion.

Reference scope note: §2.13 mandate extensions, reference-free.

- X762 q_evalue_mean: anytime-valid sequential mean test via a
  betting e-process — the always-valid complement of X721's SPRT
  (SPRT needs both hypotheses simple; the e-process composite test
  stays valid under optional stopping at ANY time).
- X763 q_grad_clip_audit: per-example gradient-norm / clipping
  telemetry at threshold C — the DP-SGD and training-stability
  dashboard row (clip fraction, pre/post-clip norm means).
- X764 q_krum: Krum Byzantine-robust aggregation scores (Blanchard
  et al. 2017) over a bounded per-round gradient cohort — which
  update survives when f of n workers may be adversarial.
- X765 q_ktruss: k-truss edge peeling (support = triangle count) on
  the exact Jaccard similarity graph — the cohesion filter that is
  stricter than k-core (every surviving edge sits in ≥ k−2
  triangles), the community-core extractor.

Determinism: e-process terms and norms quantize to 1e-9 / 1e-6
integers before any sum; Krum distances are exact integers on
1e-4-quantized components; the truss peel is unrolled a fixed 3
rounds in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load
from .registry import query

# ---------------------------------------------------------------------------
# X762 — anytime-valid e-process mean test
# ---------------------------------------------------------------------------

_EV_MU0 = 0.2  # H0: E[x] <= mu0 on the value/500 scale
_EV_LAM = 0.5  # bet size
_EV_ALPHA_INV = 20  # reject when E_t >= 1/alpha (alpha = 0.05)

_EV_ORACLE = f"""
    WITH s AS (
      SELECT event_type,
             CAST(round(ln(1 + {_EV_LAM}
               * (least(value, 500.0) / 500.0 - {_EV_MU0}))
               * 1000000000) AS BIGINT) AS lq,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS t
      FROM events),
    c AS (
      SELECT event_type, t, lq,
             CAST(sum(lq) OVER (PARTITION BY event_type ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS HUGEINT) AS cum
      FROM s),
    agg AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(max(t) AS BIGINT) AS t_max,
             CAST(max_by(cum, t) AS HUGEINT) AS cum_final,
             CAST(max(cum) AS HUGEINT) AS cum_max,
             CAST(coalesce(min(CASE WHEN CAST(cum AS DOUBLE) / 1e9
                 >= ln({_EV_ALPHA_INV}) THEN t END), -1) AS BIGINT)
               AS cross_step
      FROM c GROUP BY event_type)
    SELECT event_type, n,
           round(CAST(cum_final AS DOUBLE) / 1e9 / ln(10), 6)
             AS log10_e_final,
           round(CAST(cum_max AS DOUBLE) / 1e9 / ln(10), 6)
             AS log10_e_max,
           cross_step,
           CAST(cross_step >= 0 AS BIGINT) AS reject
    FROM agg ORDER BY event_type
    """


@query("q_evalue_mean", oracle=_EV_ORACLE)
def q_evalue_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X762 — anytime-valid sequential mean test by betting (Waudby-
    Smith & Ramdas): the e-process E_t = Π(1 + λ(x_t − μ₀)) is a
    nonnegative supermartingale under H0: E[x] ≤ μ₀, so by Ville's
    inequality P(sup E_t ≥ 1/α) ≤ α — the test stays valid under
    OPTIONAL STOPPING, the property a continuously-monitored pipeline
    metric needs and a fixed-n z-test lacks (X721's SPRT needs a
    simple alternative; the e-process doesn't).  Reports final and
    running-max log10 e-value and the first boundary-crossing step.

    Exactness: each term ln(1+λ(x−μ₀)) is a per-row double (identical
    both engines) quantized to 1e-9 integers; the running product is
    an exact integer cumulative sum — order pinned by (ts, event_id).

    Scale: one window pass per stream; the state a live monitor keeps
    is ONE integer per stream."""
    from pyspark.sql.window import Window as W

    s = load(spark, sf_dir, "events").select(
        "event_type",
        F.round(
            F.log(
                1
                + _EV_LAM
                * (F.least(F.col("value"), F.lit(500.0)) / 500.0 - _EV_MU0)
            )
            * 1e9
        )
        .cast("long")
        .alias("lq"),
        "ts",
        "event_id",
    )
    wo = W.partitionBy("event_type").orderBy("ts", "event_id")
    dec = "decimal(38,0)"
    c = s.select(
        "event_type",
        F.row_number().over(wo).alias("t"),
        F.sum(F.col("lq").cast(dec))
        .over(wo.rowsBetween(W.unboundedPreceding, 0))
        .alias("cum"),
    )
    import math

    agg = c.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.max_by("cum", "t").alias("cum_final"),
        F.max("cum").alias("cum_max"),
        F.coalesce(
            F.min(
                F.when(
                    F.col("cum").cast("double") / 1e9
                    >= math.log(_EV_ALPHA_INV),
                    F.col("t"),
                )
            ),
            F.lit(-1),
        )
        .cast("long")
        .alias("cross_step"),
    )
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(
            F.col("cum_final").cast("double") / 1e9 / math.log(10), 6
        ).alias("log10_e_final"),
        F.round(
            F.col("cum_max").cast("double") / 1e9 / math.log(10), 6
        ).alias("log10_e_max"),
        "cross_step",
        (F.col("cross_step") >= 0).cast("long").alias("reject"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# X763 — per-example gradient-norm / clipping audit (DP-SGD telemetry)
# ---------------------------------------------------------------------------

_GC_C = 1.0  # clip threshold on the unit-ish embedding-norm scale
_GC_D = 16

_GC_ORACLE = f"""
    WITH q AS (
      SELECT vec_id, label,
             list_transform(range({_GC_D}), j ->
               CAST(round(CAST(embedding[j + 1] AS DOUBLE) * 10000)
                    AS BIGINT)) AS qv
      FROM embeddings WHERE len(embedding) >= {_GC_D}),
    n AS (
      SELECT vec_id, label,
             sqrt(CAST(list_sum(list_transform(qv, v -> v * v))
                  AS DOUBLE)) / 10000.0 AS nrm
      FROM q),
    m AS (
      SELECT label,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN nrm > {_GC_C} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_clipped,
             CAST(sum(CAST(round(nrm * 1000000) AS HUGEINT)) AS DOUBLE)
               AS s_pre,
             CAST(sum(CAST(round(least(nrm, {_GC_C}) * 1000000)
                  AS HUGEINT)) AS DOUBLE) AS s_post
      FROM n GROUP BY label)
    SELECT label, n, n_clipped,
           round(CAST(n_clipped AS DOUBLE) / n, 6) AS clip_frac,
           round(s_pre / n / 1e6, 6) AS mean_norm,
           round(s_post / n / 1e6, 6) AS mean_clipped_norm
    FROM m ORDER BY label
    """


@query("q_grad_clip_audit", oracle=_GC_ORACLE)
def q_grad_clip_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X763 — per-example gradient clipping audit at C={_GC_C} (the
    DP-SGD / training-stability telemetry): per label group, the
    fraction of examples whose gradient (embedding proxy) exceeds the
    clip norm and the mean pre-/post-clip norms.  A clip fraction near
    1 means C strangles the signal (DP noise dominates); near 0 means
    C is slack (wasted privacy budget) — THE tuning dial of DP-SGD,
    audited before committing a training run.

    Exactness: norms come from exact integer component squares; the
    norm itself quantizes to 1e-6 integers before the group sum, so
    means are exact-integer ratios (no float accumulation order).

    Scale: one narrow projection into a combinable per-label
    aggregate."""
    emb = load(spark, sf_dir, "embeddings").filter(
        F.size("embedding") >= _GC_D
    )
    qsq = [
        (
            F.round(F.element_at("embedding", j + 1).cast("double") * 10000)
            .cast("long")
        )
        for j in range(_GC_D)
    ]
    ns2 = sum(q * q for q in qsq)
    n = emb.select(
        "label", (F.sqrt(ns2.cast("double")) / 10000.0).alias("nrm")
    )
    dec = "decimal(38,0)"
    m = n.groupBy("label").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("nrm") > _GC_C, 1).otherwise(0)).alias(
            "n_clipped"
        ),
        F.sum(F.round(F.col("nrm") * 1e6).cast(dec))
        .cast("double")
        .alias("s_pre"),
        F.sum(
            F.round(F.least(F.col("nrm"), F.lit(_GC_C)) * 1e6).cast(dec)
        )
        .cast("double")
        .alias("s_post"),
    )
    return m.select(
        "label",
        F.col("n").cast("long").alias("n"),
        F.col("n_clipped").cast("long").alias("n_clipped"),
        F.round(F.col("n_clipped").cast("double") / F.col("n"), 6).alias(
            "clip_frac"
        ),
        F.round(F.col("s_pre") / F.col("n") / 1e6, 6).alias("mean_norm"),
        F.round(F.col("s_post") / F.col("n") / 1e6, 6).alias(
            "mean_clipped_norm"
        ),
    ).orderBy("label")


# ---------------------------------------------------------------------------
# X764 — Krum Byzantine-robust aggregation scores
# ---------------------------------------------------------------------------

_KR_MOD = 25  # cohort = vec_id % 25 == 0 (per-round gradient set)
_KR_D = 16
_KR_TOP = 3

_KR_ORACLE = f"""
    WITH g AS (
      SELECT vec_id,
             list_transform(range({_KR_D}), j ->
               CAST(round(CAST(embedding[j + 1] AS DOUBLE) * 10000)
                    AS BIGINT)) AS qv
      FROM embeddings
      WHERE vec_id % {_KR_MOD} = 0 AND len(embedding) >= {_KR_D}),
    nn AS (SELECT count(*) AS n FROM g),
    d AS (
      SELECT a.vec_id AS i, b.vec_id AS j,
             CAST(list_sum(list_transform(range(1, {_KR_D} + 1),
               k -> (a.qv[k] - b.qv[k]) * (a.qv[k] - b.qv[k])))
               AS HUGEINT) AS d2
      FROM g a JOIN g b ON a.vec_id <> b.vec_id),
    r AS (
      SELECT i, j, d2,
             row_number() OVER (PARTITION BY i ORDER BY d2, j) AS rk
      FROM d),
    sc AS (
      SELECT r.i, CAST(sum(r.d2) AS HUGEINT) AS score_raw
      FROM r CROSS JOIN nn
      WHERE r.rk <= nn.n - (nn.n // 5) - 2
      GROUP BY r.i)
    SELECT CAST(row_number() OVER (ORDER BY score_raw, i) AS BIGINT)
             AS rank,
           i AS vec_id,
           round(CAST(score_raw AS DOUBLE) / 1e8, 6) AS krum_score
    FROM sc ORDER BY score_raw, i LIMIT {_KR_TOP}
    """


@query("q_krum", oracle=_KR_ORACLE)
def q_krum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X764 — Krum Byzantine-robust aggregation (Blanchard et al.
    2017): over a per-round cohort of n worker gradients (every
    {_KR_MOD}th embedding), score each candidate by the sum of its
    squared distances to its n−f−2 NEAREST peers (f = n/5 tolerated
    adversaries) and select the minimum — the update that sits deepest
    inside the honest majority, immune to f arbitrary outliers where
    the naive mean is not.  Reports the top-{_KR_TOP} by score.

    Exactness: distances are exact integers on 1e-4-quantized
    components (HUGEINT / int128 partial sums).

    Scale: Krum's grain is the per-round WORKER COHORT (n = number of
    workers, bounded by cluster size, independent of corpus rows), so
    the n² distance matrix is constant-sized at any data scale — the
    cohort filter here stands in for one training round's gradient
    set."""
    from pyspark.sql.window import Window as W

    emb = load(spark, sf_dir, "embeddings").filter(
        (F.col("vec_id") % _KR_MOD == 0) & (F.size("embedding") >= _KR_D)
    )
    qv = [
        F.round(F.element_at("embedding", j + 1).cast("double") * 10000)
        .cast("long")
        .alias(f"q{j}")
        for j in range(_KR_D)
    ]
    g = emb.select("vec_id", *qv)
    a = g.alias("a")
    b = g.select(
        F.col("vec_id").alias("j_id"),
        *[F.col(f"q{j}").alias(f"p{j}") for j in range(_KR_D)],
    )
    dec = "decimal(38,0)"
    d2 = sum(
        (F.col(f"q{j}") - F.col(f"p{j}")) * (F.col(f"q{j}") - F.col(f"p{j}"))
        for j in range(_KR_D)
    ).cast(dec)
    d = (
        a.join(b, F.col("vec_id") != F.col("j_id"))
        .select(
            F.col("vec_id").alias("i"),
            F.col("j_id").alias("j"),
            d2.alias("d2"),
        )
    )
    nn = g.agg(F.count("*").alias("n"))
    r = d.withColumn(
        "rk", F.row_number().over(W.partitionBy("i").orderBy("d2", "j"))
    )
    sc = (
        r.crossJoin(F.broadcast(nn))
        .filter(
            F.col("rk")
            <= F.col("n") - F.floor(F.col("n") / 5) - 2
        )
        .groupBy("i")
        .agg(F.sum("d2").alias("score_raw"))
    )
    return (
        sc.withColumn(
            "rank",
            F.row_number().over(W.orderBy("score_raw", "i")).cast("long"),
        )
        .filter(F.col("rank") <= _KR_TOP)
        .select(
            "rank",
            F.col("i").alias("vec_id"),
            F.round(F.col("score_raw").cast("double") / 1e8, 6).alias(
                "krum_score"
            ),
        )
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# X765 — k-truss edge peeling on the similarity graph
# ---------------------------------------------------------------------------

_KT_K = 4  # truss order: every surviving edge in >= k-2 = 2 triangles
_KT_ROUNDS = 3
#: hub cut BEFORE peeling: vertices above this degree are mega-clique
#: members (twin families the dedup stack already identifies wholesale)
#: — enumerating their triangles is Θ(clique³) work for zero new
#: information, the q_link_predict degree-cap lever applied to truss.
#: Measured: the 8x natural replica's densest vertex hits degree 6444
#: (≈4.5e10 triangles in one clique) without the cap.
_KT_DEG_CAP = 100


def _kt_round_sql(prev: str, idx: int) -> str:
    """One peel round: per-edge triangle support over the CURRENT
    surviving edge set, then drop edges with support < k−2."""
    sup = f"sup{idx}"
    out = f"ke{idx}"
    return f"""
    tri{idx} AS (
      SELECT e1.a AS a, e1.b AS b, e2.b AS c
      FROM {prev} e1 JOIN {prev} e2 ON e2.a = e1.b
      JOIN {prev} e3 ON e3.a = e1.a AND e3.b = e2.b),
    {sup} AS (
      SELECT a, b, count(*) AS s FROM (
        SELECT a, b FROM tri{idx}
        UNION ALL SELECT b AS a, c AS b FROM tri{idx}
        UNION ALL SELECT a, c AS b FROM tri{idx})
      GROUP BY a, b),
    {out} AS MATERIALIZED (
      SELECT p.a, p.b FROM {prev} p
      JOIN {sup} s ON s.a = p.a AND s.b = p.b
      WHERE s.s >= {_KT_K - 2})"""


def _kt_oracle() -> str:
    from .textscale import _SETS_SQL, TAU

    rounds = ",".join(
        _kt_round_sql(f"ke{i}" if i else "e", i + 1)
        for i in range(_KT_ROUNDS)
    )
    counts = " UNION ALL ".join(
        f"SELECT {i + 1} AS round, (SELECT count(*) FROM ke{i + 1})"
        f" AS n_edges" for i in range(_KT_ROUNDS)
    )
    return f"""
    WITH s AS (SELECT * FROM {_SETS_SQL}),
    ex AS (SELECT doc_id, unnest(ts) AS tok, len(ts) AS n FROM s),
    i AS (
      SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS o,
             any_value(a.n) AS na, any_value(b.n) AS nb
      FROM ex a JOIN ex b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    e0 AS MATERIALIZED (
      SELECT a, b FROM i WHERE o * 1.0 / (na + nb - o) >= {TAU}),
    deg AS (
      SELECT v FROM (
        SELECT v, count(*) AS d FROM (
          SELECT a AS v FROM e0 UNION ALL SELECT b AS v FROM e0)
        GROUP BY v)
      WHERE d <= {_KT_DEG_CAP}),
    e AS MATERIALIZED (
      SELECT e0.a, e0.b FROM e0
      JOIN deg da ON da.v = e0.a JOIN deg db ON db.v = e0.b),
    {rounds}
    SELECT CAST(round AS BIGINT) AS round, CAST(n_edges AS BIGINT)
             AS n_edges,
           (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges_input
    FROM ({counts}) ORDER BY round
    """


@query("q_ktruss", oracle=_kt_oracle())
def q_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X765 — k-truss ({_KT_K}-truss) edge peeling on the exact
    Jaccard similarity graph: iteratively drop every edge in fewer
    than k−2 = {_KT_K - 2} triangles ({_KT_ROUNDS} unrolled rounds) —
    the cohesion filter STRICTER than X-kcore (an edge survives only
    if its endpoints share ≥ k−2 common neighbors), which extracts
    clique-like duplicate FAMILIES from the near-dup graph while
    k-core keeps chains.  Per-round surviving edge counts pin the
    whole peel trajectory.

    Triangles use the a<b<c single-path orientation (Suri &
    Vassilvitskii), so each triangle is found once and contributes
    support to its three edges via a 3-way union — no 6× overcount.

    Scale: each round is two edge-keyed joins + one count shuffle over
    the (shrinking) edge list; rounds are a fixed constant."""
    from .textscale import q_jaccard_prefix

    pairs = q_jaccard_prefix(spark, sf_dir)
    e0 = (
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .localCheckpoint(eager=True)
    )
    deg = (
        e0.select(F.col("a").alias("v"))
        .unionByName(e0.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
        .filter(F.col("d") <= _KT_DEG_CAP)
        .select("v")
    )
    e = (
        e0.join(deg.select(F.col("v").alias("a")), "a")
        .join(deg.select(F.col("v").alias("b")), "b")
        .select("a", "b")
        .localCheckpoint(eager=True)
    )
    n_input = e.count()
    stat_rows = []
    cur = e
    for i in range(_KT_ROUNDS):
        e1, e2, e3 = cur.alias("e1"), cur.alias("e2"), cur.alias("e3")
        tri = (
            e1.join(e2, F.col("e2.a") == F.col("e1.b"))
            .join(
                e3,
                (F.col("e3.a") == F.col("e1.a"))
                & (F.col("e3.b") == F.col("e2.b")),
            )
            .select(
                F.col("e1.a").alias("a"),
                F.col("e1.b").alias("b"),
                F.col("e2.b").alias("c"),
            )
        )
        sup = (
            tri.select("a", "b")
            .unionByName(
                tri.select(F.col("b").alias("a"), F.col("c").alias("b"))
            )
            .unionByName(
                tri.select("a", F.col("c").alias("b"))
            )
            .groupBy("a", "b")
            .agg(F.count("*").alias("s"))
            .filter(F.col("s") >= _KT_K - 2)
            .select("a", "b")
        )
        cur = (
            cur.join(sup, ["a", "b"])
            .localCheckpoint(eager=True)
        )
        # per-round counts stay DataFrames over the checkpointed edge
        # list and fold into ONE final action instead of a driver
        # count job per round (guide §1.2)
        stat_rows.append(
            cur.agg(F.count("*").cast("long").alias("n_edges")).select(
                F.lit(i + 1).cast("long").alias("round"),
                "n_edges",
                F.lit(n_input).cast("long").alias("n_edges_input"),
            )
        )
    out = stat_rows[0]
    for s in stat_rows[1:]:
        out = out.unionByName(s)
    return out.orderBy("round")
