"""Round-11 batch K (X772–X773): forecast evaluation and one-level
Louvain community moves.

Reference scope note: §2.13 mandate extensions, reference-free.

- X772 q_crps: continuous ranked probability score of the trailing
  14-day empirical distribution as a probabilistic next-day forecast,
  via the energy identity CRPS = E|X−y| − ½E|X−X′| — the proper
  scoring rule for distributional forecasts (pinball integrates it
  per-quantile; CRPS is the whole-distribution number).
- X773 q_louvain_moves: two synchronous rounds of Louvain-style
  modularity-gain moves (each vertex joins the neighbor community
  maximizing 2m·e_{i,c} − k_i·Σ_c, exact integers) from singleton
  seeds, reporting communities + modularity per round — the
  modularity-aware upgrade of X174's label propagation.

Determinism: daily sums quantize to 1e-4 integers; every error /
pair-distance / gain statistic is an exact integer ratio assembled in
doubles only at the end; Louvain tie-breaks to the smallest community
id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load
from .registry import query

# ---------------------------------------------------------------------------
# X772 — CRPS of the trailing-window empirical forecast
# ---------------------------------------------------------------------------

_CRPS_W = 14

_CRPS_ORACLE = f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(round(sum(value) * 10000) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    o AS (
      SELECT event_type, d, y,
             row_number() OVER (PARTITION BY event_type ORDER BY d) AS t
      FROM daily),
    pairs AS (
      SELECT a.event_type, a.t, a.y AS y_t, b.y AS x, b.t AS src
      FROM o a JOIN o b
        ON b.event_type = a.event_type
       AND b.t BETWEEN a.t - {_CRPS_W} AND a.t - 1
      WHERE a.t > {_CRPS_W}),
    term1 AS (
      SELECT event_type, t,
             CAST(sum(abs(x - y_t)) AS HUGEINT) AS s1,
             CAST(count(*) AS BIGINT) AS w
      FROM pairs GROUP BY event_type, t),
    rk AS (
      SELECT event_type, t, x,
             row_number() OVER (PARTITION BY event_type, t
                                ORDER BY x, src) AS r,
             count(*) OVER (PARTITION BY event_type, t) AS w
      FROM pairs),
    term2 AS (
      SELECT event_type, t,
             CAST(sum((2 * CAST(r AS HUGEINT) - w - 1) * x) AS HUGEINT)
               AS s2
      FROM rk GROUP BY event_type, t),
    per_day AS (
      SELECT t1.event_type, t1.t,
             CAST(t1.s1 AS DOUBLE) / t1.w / 10000.0
               - 0.5 * CAST(t2.s2 AS DOUBLE)
                 / (CAST(t1.w AS DOUBLE) * t1.w) / 10000.0 AS crps
      FROM term1 t1 JOIN term2 t2
        ON t2.event_type = t1.event_type AND t2.t = t1.t)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
           round(CAST(sum(CAST(round(crps * 1000000) AS HUGEINT))
                 AS DOUBLE) / count(*) / 1e6, 6) AS mean_crps
    FROM per_day GROUP BY event_type ORDER BY event_type
    """


@query("q_crps", oracle=_CRPS_ORACLE)
def q_crps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X772 — CRPS of the trailing-{_CRPS_W}-day empirical
    distribution as a probabilistic next-day forecast, per stream:
    CRPS(F, y) = E|X−y| − ½E|X−X′| (the energy identity), with the
    within-sample term collapsing to the sorted-rank prefix identity
    Σ(2r−w−1)·x₍ᵣ₎/w² — no pair enumeration.  CRPS is the proper
    scoring rule for distributional forecasts: it rewards calibration
    AND sharpness, where MAE only scores the point.

    Exactness: integer daily values; both expectation terms are exact
    integer sums; per-day CRPS quantizes 1e-6 before the mean.

    Scale: the window join is day-grain × {_CRPS_W} rows — calendar-
    bounded; per-day ranks run over ≤{_CRPS_W}-row partitions."""
    from pyspark.sql.window import Window as W

    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.to_date(F.date_trunc("day", "ts")).alias("d")
        )
        .agg(F.round(F.sum("value") * 10000).cast("long").alias("y"))
    )
    o = daily.withColumn(
        "t",
        F.row_number().over(W.partitionBy("event_type").orderBy("d")),
    ).select("event_type", "t", "y")
    a = o.alias("a")
    b = o.select(
        F.col("event_type").alias("bet"),
        F.col("t").alias("src"),
        F.col("y").alias("x"),
    )
    pairs = a.join(
        b,
        (F.col("bet") == F.col("event_type"))
        & (F.col("src").between(F.col("t") - _CRPS_W, F.col("t") - 1)),
    ).filter(F.col("t") > _CRPS_W).select(
        "event_type", "t", F.col("y").alias("y_t"), "x", "src"
    )
    dec = "decimal(38,0)"
    term1 = pairs.groupBy("event_type", "t").agg(
        F.sum(F.abs(F.col("x") - F.col("y_t")).cast(dec)).alias("s1"),
        F.count("*").alias("w"),
    )
    wrk = W.partitionBy("event_type", "t").orderBy("x", "src")
    rk = pairs.select(
        "event_type",
        "t",
        F.col("x").cast(dec).alias("x"),
        F.row_number().over(wrk).cast(dec).alias("r"),
        F.count("*")
        .over(W.partitionBy("event_type", "t"))
        .cast(dec)
        .alias("w"),
    )
    term2 = rk.groupBy("event_type", "t").agg(
        F.sum((2 * F.col("r") - F.col("w") - 1) * F.col("x")).alias("s2")
    )
    per_day = term1.join(term2, ["event_type", "t"]).select(
        "event_type",
        (
            F.col("s1").cast("double") / F.col("w") / 10000.0
            - 0.5
            * F.col("s2").cast("double")
            / (F.col("w").cast("double") * F.col("w"))
            / 10000.0
        ).alias("crps"),
    )
    return (
        per_day.groupBy("event_type")
        .agg(
            F.count("*").alias("n_days"),
            F.round(
                F.sum(F.round(F.col("crps") * 1e6).cast(dec)).cast(
                    "double"
                )
                / F.count("*")
                / 1e6,
                6,
            ).alias("mean_crps"),
        )
        .select(
            "event_type",
            F.col("n_days").cast("long").alias("n_days"),
            "mean_crps",
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# X773 — Louvain-style synchronous modularity-gain moves
# ---------------------------------------------------------------------------

from .graph_ext import _EDGES_SQL, _edges  # noqa: E402

_LV_ROUNDS = 2


def _lv_round_sql(prev: str, out: str) -> str:
    """One synchronous move round: every vertex joins the neighbor
    community c maximizing 2m·e_{i,c} − k_i·(Σ_c − k_i·[own]), ties to
    the smallest community id (exact integer scores)."""
    return f"""
    cd_{out} AS (
      SELECT l.lbl, CAST(sum(d.k) AS HUGEINT) AS sig
      FROM {prev} l JOIN deg d ON d.v = l.a GROUP BY l.lbl),
    sc_{out} AS (
      SELECT sym.a AS i, lc.lbl AS c,
             CAST(count(*) AS HUGEINT) * (SELECT m2 FROM m2)
               - CAST(any_value(di.k) AS HUGEINT)
                 * (any_value(cd.sig)
                    - CASE WHEN any_value(li.lbl) = lc.lbl
                           THEN any_value(di.k) ELSE 0 END)
               AS score
      FROM sym
      JOIN {prev} lc ON lc.a = sym.b
      JOIN {prev} li ON li.a = sym.a
      JOIN deg di ON di.v = sym.a
      JOIN cd_{out} cd ON cd.lbl = lc.lbl
      GROUP BY sym.a, lc.lbl),
    {out} AS MATERIALIZED (
      SELECT i AS a, c AS lbl FROM (
        SELECT i, c,
               row_number() OVER (PARTITION BY i
                                  ORDER BY score DESC, c) AS rn
        FROM sc_{out}) WHERE rn = 1)"""


def _lv_modularity_sql(lbl: str, tag: str) -> str:
    return f"""
    w_{tag} AS (
      SELECT la.lbl, count(*) AS w
      FROM sym JOIN {lbl} la ON la.a = sym.a
      JOIN {lbl} lb ON lb.a = sym.b
      WHERE la.lbl = lb.lbl GROUP BY la.lbl),
    ds_{tag} AS (
      SELECT {lbl}.lbl, CAST(sum(d.k) AS HUGEINT) AS dsum
      FROM {lbl} JOIN deg d ON d.v = {lbl}.a GROUP BY {lbl}.lbl),
    q_{tag} AS (
      SELECT (SELECT CAST(count(DISTINCT lbl) AS BIGINT) FROM {lbl})
               AS ncomm,
             round(sum(COALESCE(w.w, 0) * 1.0 / (SELECT m2 FROM m2)
                   - (CAST(d.dsum AS DOUBLE) / (SELECT m2 FROM m2))
                     * (CAST(d.dsum AS DOUBLE) / (SELECT m2 FROM m2))),
                   6) AS q
      FROM ds_{tag} d LEFT JOIN w_{tag} w ON w.lbl = d.lbl)"""


def _lv_oracle() -> str:
    rounds = ",".join(
        _lv_round_sql(f"l{i}", f"l{i + 1}") for i in range(_LV_ROUNDS)
    )
    mods = ",".join(
        _lv_modularity_sql(f"l{i + 1}", f"r{i + 1}")
        for i in range(_LV_ROUNDS)
    )
    sel = " UNION ALL ".join(
        f"SELECT {i + 1} AS round, ncomm, q FROM q_r{i + 1}"
        for i in range(_LV_ROUNDS)
    )
    return f"""
    WITH {_EDGES_SQL},
    deg AS (SELECT a AS v, count(*) AS k FROM sym GROUP BY a),
    m2 AS (SELECT CAST(count(*) AS HUGEINT) AS m2 FROM sym),
    l0 AS (SELECT DISTINCT a, a AS lbl FROM sym),
    {rounds},
    {mods}
    SELECT CAST(round AS BIGINT) AS round,
           CAST(ncomm AS BIGINT) AS n_communities,
           q AS modularity
    FROM ({sel}) ORDER BY round
    """


@query("q_louvain_moves", oracle=_lv_oracle())
def q_louvain_moves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X773 — Louvain-style community detection, the synchronous
    one-level variant: from singleton seeds, every vertex
    simultaneously joins the neighbor community maximizing the exact
    integer modularity-gain score 2m·e_{{i,c}} − k_i·(Σ_c − k_i·[own])
    ({_LV_ROUNDS} unrolled rounds), reporting community count and
    modularity per round — the modularity-AWARE upgrade of X174's
    label propagation (LPA follows raw neighbor counts; these moves
    discount high-degree communities by their Σ_c, the Louvain local
    rule).  Monotone modularity is not guaranteed under synchronous
    moves, which is why the per-round trajectory is the pinned output.

    Scale: each round is two edge-keyed joins + a (vertex, community)
    aggregate — LPA-shaped shuffles; community degree sums broadcast
    at k-cells grain."""
    # one edge-grain aggregate per LABEL GENERATION, shared by the move
    # scores of round r+1 AND the modularity check of round r (guide
    # §2.3/§2.4: aggregate BEFORE joining the vertex-grain tables —
    # the old plan joined deg/own/cd onto raw edge rows, shipping
    # k/own/sig per edge through the (i, c) shuffle, and ran a second
    # full edge pass per round for `within`); 3 edge passes total for
    # 2 rounds instead of 4 heavier ones. sym is hash-partitioned by
    # the join key once so each eic pass shuffles only the vertex-sized
    # label table (guide §2.4 shared exchange).
    from ..session import default_parallelism

    sym = (
        _edges(spark, sf_dir)
        .repartition(default_parallelism(), "b")
        .persist()
    )

    def _eic(labels: DataFrame) -> DataFrame:
        """(i, c, cnt): edges from i into community c under ``labels``."""
        return (
            sym.join(
                labels.select(
                    F.col("a").alias("b"), F.col("lbl").alias("c")
                ),
                "b",
            )
            .groupBy(F.col("a").alias("i"), "c")
            .agg(F.count("*").alias("cnt"))
            .localCheckpoint(eager=True)
        )

    # Round-13 (VERDICT r12 next #5, guide §2.3/§2.4): with SINGLETON
    # seed labels the first edge⋈label join is the identity map
    # (lbl(b) = b) and sym is DISTINCT by construction (_edges: e0
    # DISTINCT, the two directions disjoint id spaces), so eic0 is just
    # sym with cnt = 1 — no l0 distinct job, no join, no groupBy; deg
    # and the m2 scalar then derive from it (k = Σcnt = the old
    # per-vertex count, m2 = Σk — exact integers either way).
    eic = sym.select(
        F.col("a").alias("i"),
        F.col("b").alias("c"),
        F.lit(1).cast("long").alias("cnt"),
    )
    deg = (
        eic.groupBy(F.col("i").alias("v"))
        .agg(F.sum("cnt").alias("k"))
        .localCheckpoint(eager=True)
    )
    m2 = deg.agg(F.sum("k")).collect()[0][0]
    lbl = None  # round 1 uses the implicit identity labeling
    dec = "decimal(38,0)"
    outs = []
    for rnd in range(1, _LV_ROUNDS + 1):
        if rnd == 1:
            # identity labels: community degree IS the vertex degree
            # (each singleton's sig = its own k) and own(i) = i
            cd = deg.select(
                F.col("v").alias("lbl"), F.col("k").cast(dec).alias("sig")
            )
            own_col = F.col("i")
            sc_base = eic.join(
                deg.select(F.col("v").alias("i"), "k"), "i"
            ).join(cd.select(F.col("lbl").alias("c"), "sig"), "c")
        else:
            # the previous round's modularity pass already aggregated
            # per-community degree sums over this exact labeling — reuse
            # it instead of re-running the lbl⋈deg rollup (guide §2.4)
            cd = cdeg.select("lbl", F.col("dsum").alias("sig"))
            own_col = F.col("own")
            sc_base = (
                eic.join(
                    lbl.select(
                        F.col("a").alias("i"), F.col("lbl").alias("own")
                    ),
                    "i",
                )
                .join(deg.select(F.col("v").alias("i"), "k"), "i")
                .join(cd.select(F.col("lbl").alias("c"), "sig"), "c")
            )
        sc = sc_base.select(
            "i",
            "c",
            (
                F.col("cnt").cast(dec) * F.lit(m2).cast(dec)
                - F.col("k").cast(dec)
                * (
                    F.col("sig")
                    - F.when(own_col == F.col("c"), F.col("k"))
                    .otherwise(0)
                    .cast(dec)
                )
            ).alias("score"),
        )
        # per-vertex argmax via a combinable aggregate instead of a
        # sort-window: max(struct(score, -c)) picks the highest score
        # with ties broken to the LOWEST community id — identical to
        # row_number over (score DESC, c ASC) = 1
        lbl = (
            sc.groupBy(F.col("i").alias("a"))
            .agg(
                F.max(F.struct(F.col("score"), (-F.col("c")).alias("nc")))
                .alias("best")
            )
            .select("a", (-F.col("best.nc")).alias("lbl"))
            .localCheckpoint(eager=True)
        )
        eic = _eic(lbl)
        within = (
            eic.join(
                lbl.select(F.col("a").alias("i"), F.col("lbl").alias("own")),
                "i",
            )
            .filter(F.col("own") == F.col("c"))
            .groupBy(F.col("own").alias("lbl"))
            .agg(F.sum("cnt").alias("w"))
        )
        # vertex-grain rollup over two checkpointed inputs — cheap to
        # evaluate for both its consumers (this round's modularity and
        # the next round's cd), so no materialization needed
        cdeg = (
            lbl.join(deg, lbl.a == deg.v)
            .groupBy("lbl")
            .agg(F.sum(F.col("k").cast(dec)).alias("dsum"))
        )
        qrow = (
            cdeg.join(within, "lbl", "left")
            .agg(
                F.round(
                    F.sum(
                        F.coalesce(F.col("w"), F.lit(0)) * 1.0 / m2
                        - (F.col("dsum").cast("double") / m2)
                        * (F.col("dsum").cast("double") / m2)
                    ),
                    6,
                ).alias("q"),
                F.countDistinct("lbl").alias("ncomm"),
            )
            .select(
                F.lit(rnd).cast("long").alias("round"),
                F.col("ncomm").cast("long").alias("n_communities"),
                F.col("q").alias("modularity"),
            )
        )
        outs.append(qrow)
    out = outs[0]
    for o2 in outs[1:]:
        out = out.unionByName(o2)
    return out.orderBy("round")
