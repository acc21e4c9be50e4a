"""Round-5 batch C: privacy closure, series features, diffusion + mining.

Six components: t-closeness (X529 — completes the k-anonymity X245 /
l-diversity X410 privacy triple with the ordered-EMD criterion),
a catch22-style per-entity time-series feature battery (X530), an
AR(2) Yule-Walker fit with closed-form multi-step forecast (X531 —
the autoregressive member the smoothing ladder X218/X340 lacks),
double-sweep BFS eccentricity (X532 — the standard diameter
lower-bound heuristic), independent-cascade influence diffusion with
portable hash coins (X533 — stochastic spread, distinct from PPR's
deterministic mass flow), and Apriori frequent-triple mining (X534 —
level-3 candidate generation + pruning, the classic distributed
data-mining shape above X113's pair rules).

Reference parity: the reference engine (kafka_stream/kafka_s.py) has
no analytics surface; these extend SURVEY §2.14.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import token_hash, token_hash_sql
from ..sources.tables import load
from .registry import query

# ---------------------------------------------------------------------------
# X529 — t-closeness audit
# ---------------------------------------------------------------------------

_TC_BIN = 50_000  # equal-width sensitive-value bins over [0, 500k]
_TC_NBINS = 10
_TC_T = 0.15


@query(
    "q_t_closeness",
    oracle=f"""
    WITH f AS (
      SELECT o_orderpriority AS qid1,
             CAST(year(o_orderdate) AS BIGINT) AS qid2,
             least(CAST(floor(o_totalprice / {_TC_BIN}) AS BIGINT),
                   {_TC_NBINS - 1}) AS bin
      FROM orders
    ), gl AS (
      SELECT bin, count(*) AS gn FROM f GROUP BY bin
    ), tot AS (SELECT count(*) AS n FROM f),
    grp AS (
      SELECT qid1, qid2, bin, count(*) AS cnt FROM f
      GROUP BY qid1, qid2, bin
    ), groups AS (
      SELECT qid1, qid2, sum(cnt) AS m FROM grp GROUP BY qid1, qid2
    ), grid AS (
      SELECT g.qid1, g.qid2, g.m, b.bin,
             coalesce(grp.cnt, 0) * 1.0 / g.m AS p,
             coalesce(gl.gn, 0) * 1.0 / tot.n AS q
      FROM groups g
      CROSS JOIN (SELECT unnest(generate_series(0, {_TC_NBINS - 1}))
                    AS bin) b
      LEFT JOIN grp ON grp.qid1 = g.qid1 AND grp.qid2 = g.qid2
                   AND grp.bin = b.bin
      LEFT JOIN gl ON gl.bin = b.bin
      CROSS JOIN tot
    ), cum AS (
      SELECT qid1, qid2, m, bin,
             sum(p - q) OVER (PARTITION BY qid1, qid2 ORDER BY bin
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cd
      FROM grid
    ), emd AS (
      SELECT qid1, qid2, any_value(m) AS m,
             sum(abs(cd)) / ({_TC_NBINS} - 1) AS e
      FROM cum WHERE bin < {_TC_NBINS - 1}
      GROUP BY qid1, qid2
    )
    SELECT qid1 AS o_orderpriority, qid2 AS order_year,
           CAST(m AS BIGINT) AS n, round(e, 6) AS emd,
           round(e, 6) > {_TC_T} AS violates_t
    FROM emd
    """,
)
def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X529 — t-closeness audit (Li et al. 2007), completing the
    anonymization triple (X245 k-anonymity, X410 l-diversity): for
    every quasi-identifier group (priority × order year) the distance
    between its SENSITIVE-attribute distribution (order value binned
    into 10 equal-width classes) and the global distribution, measured
    as ordered-category Earth Mover's Distance — the normalized sum of
    absolute cumulative-probability gaps, EMD = Σ|cumP−cumQ|/(m−1) —
    flagged against t = 0.15.  l-diversity can hold while a group's
    values still skew rich-vs-poor; t-closeness is the criterion that
    catches it.

    All probabilities are count ratios (integer-derived, engine-exact);
    the bin grid is generated densely so empty bins carry their 0 mass
    through the cumulative sum.  Scale: one fact pass for group×bin
    counts, a broadcast global histogram, then per-group windows over
    the 10-bin grid — group-count work, not fact-count."""
    o = load(spark, sf_dir, "orders")
    f = o.select(
        F.col("o_orderpriority").alias("qid1"),
        F.year("o_orderdate").cast("long").alias("qid2"),
        F.least(
            F.floor(F.col("o_totalprice") / _TC_BIN).cast("long"),
            F.lit(_TC_NBINS - 1),
        ).alias("bin"),
    )
    gl = f.groupBy("bin").agg(F.count("*").alias("gn"))
    tot = f.agg(F.count("*").alias("n"))
    grp = f.groupBy("qid1", "qid2", "bin").agg(F.count("*").alias("cnt"))
    groups = grp.groupBy("qid1", "qid2").agg(F.sum("cnt").alias("m"))
    bins = spark.range(_TC_NBINS).select(F.col("id").alias("bin"))
    grid = (
        groups.crossJoin(F.broadcast(bins))
        .join(grp, ["qid1", "qid2", "bin"], "left")
        .join(F.broadcast(gl), "bin", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "qid1",
            "qid2",
            "m",
            "bin",
            (
                F.coalesce("cnt", F.lit(0)) / F.col("m")
                - F.coalesce("gn", F.lit(0)) / F.col("n")
            ).alias("pq"),
        )
    )
    wc = (
        Window.partitionBy("qid1", "qid2")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.withColumn("cd", F.sum("pq").over(wc))
    emd = (
        cum.filter(F.col("bin") < _TC_NBINS - 1)
        .groupBy("qid1", "qid2")
        .agg(
            F.first("m").alias("m"),
            (F.sum(F.abs("cd")) / (_TC_NBINS - 1)).alias("e"),
        )
    )
    return emd.select(
        F.col("qid1").alias("o_orderpriority"),
        F.col("qid2").alias("order_year"),
        F.col("m").cast("long").alias("n"),
        F.round("e", 6).alias("emd"),
        (F.round("e", 6) > _TC_T).alias("violates_t"),
    )


# ---------------------------------------------------------------------------
# X530 — per-entity series-feature battery (catch22-lite)
# ---------------------------------------------------------------------------


@query(
    "q_series_features",
    oracle="""
    WITH x AS (
      SELECT user_id, round(value, 6) AS v,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS i
      FROM events
    ), s AS (
      SELECT user_id, count(*) AS n, round(sum(v), 4) AS s1
      FROM x GROUP BY user_id
    ), c AS (
      SELECT x.user_id, x.i, s.n, x.v - s.s1 / s.n AS c,
             lag(x.v - s.s1 / s.n) OVER (PARTITION BY x.user_id
                                         ORDER BY x.i) AS cp,
             x.v - lag(x.v) OVER (PARTITION BY x.user_id
                                  ORDER BY x.i) AS dv
      FROM x JOIN s ON x.user_id = s.user_id
    ), d AS (
      SELECT user_id, i, n, c, cp, dv,
             CASE WHEN dv > 0 THEN 1 WHEN dv < 0 THEN -1
                  WHEN dv IS NULL THEN NULL ELSE 0 END AS sg
      FROM c
    ), runs AS (
      SELECT user_id, max(rl) AS longest_run
      FROM (
        SELECT user_id, count(*) AS rl
        FROM (SELECT user_id, i, sg,
                     i - row_number() OVER (PARTITION BY user_id, sg
                                            ORDER BY i) AS isl
              FROM d WHERE sg IS NOT NULL AND sg <> 0)
        GROUP BY user_id, sg, isl
      ) GROUP BY user_id
    ), turn AS (
      SELECT user_id,
             count(CASE WHEN sg * sgn = -1 THEN 1 END) AS turns
      FROM (SELECT user_id, sg,
                   lead(sg) OVER (PARTITION BY user_id ORDER BY i)
                     AS sgn
            FROM d WHERE sg IS NOT NULL)
      GROUP BY user_id
    ), feats AS (
      SELECT user_id, any_value(n) AS n,
             sum(c * cp) / sum(c * c) AS acf1,
             count(CASE WHEN c * cp < 0 THEN 1 END) * 1.0
               / (any_value(n) - 1) AS zcr
      FROM d GROUP BY user_id
    )
    SELECT f.user_id, CAST(f.n AS BIGINT) AS n,
           round(f.acf1, 6) AS acf1,
           round(f.zcr, 6) AS zero_cross_rate,
           round(t.turns * 1.0 / (f.n - 2), 6) AS turning_frac,
           CAST(r.longest_run AS BIGINT) AS longest_run
    FROM feats f
    JOIN runs r ON f.user_id = r.user_id
    JOIN turn t ON f.user_id = t.user_id
    """,
)
def q_series_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X530 — tsfresh/catch22-style per-entity series features over
    each user's event-value sequence (event-time ordered, event_id
    tie-break): lag-1 autocorrelation, mean-crossing rate, turning-
    point fraction (sign-flip of consecutive diffs — the classic
    randomness test statistic), and longest strictly-monotone run
    (gaps-and-islands on the diff sign).  One query materializes the
    feature VECTOR — the input shape a downstream classifier or
    anomaly screen consumes — rather than one statistic per query
    (X126 autocorr, X256 runs test are the global single-feature
    ancestors).

    Cross-engine: values pre-rounded, the mean derived from the
    4-dp-rounded per-user sum so both engines demean with identical
    doubles; all features are then ratios of identically-computed
    terms, rounded at the end.  Scale: everything is windows and
    aggregates PARTITIONED BY USER — shard-sized sorts, one shuffle
    on the entity key, the canonical feature-extraction plan."""
    ev = load(spark, sf_dir, "events")
    wi = Window.partitionBy("user_id").orderBy("ts", "event_id")
    x = ev.select(
        "user_id",
        F.round("value", 6).alias("v"),
        F.row_number().over(wi).alias("i"),
    )
    s = x.groupBy("user_id").agg(
        F.count("*").alias("n"), F.round(F.sum("v"), 4).alias("s1")
    )
    wo = Window.partitionBy("user_id").orderBy("i")
    c = (
        x.join(s, "user_id")
        .withColumn("c", F.col("v") - F.col("s1") / F.col("n"))
        .withColumn("cp", F.lag("c").over(wo))
        .withColumn("dv", F.col("v") - F.lag("v").over(wo))
    )
    d = c.withColumn(
        "sg",
        F.when(F.col("dv") > 0, 1)
        .when(F.col("dv") < 0, -1)
        .when(F.col("dv").isNull(), F.lit(None))
        .otherwise(0),
    )
    nz = d.filter(F.col("sg").isNotNull() & (F.col("sg") != 0)).withColumn(
        "isl",
        F.col("i")
        - F.row_number().over(
            Window.partitionBy("user_id", "sg").orderBy("i")
        ),
    )
    runs = (
        nz.groupBy("user_id", "sg", "isl")
        .agg(F.count("*").alias("rl"))
        .groupBy("user_id")
        .agg(F.max("rl").alias("longest_run"))
    )
    turn = (
        d.filter(F.col("sg").isNotNull())
        .withColumn("sgn", F.lead("sg").over(wo))
        .groupBy("user_id")
        .agg(
            F.count(
                F.when(F.col("sg") * F.col("sgn") == -1, 1)
            ).alias("turns")
        )
    )
    feats = d.groupBy("user_id").agg(
        F.first("n").alias("n"),
        (F.sum(F.col("c") * F.col("cp")) / F.sum(F.col("c") * F.col("c"))).alias(
            "acf1"
        ),
        (
            F.count(F.when(F.col("c") * F.col("cp") < 0, 1))
            / (F.first("n") - 1)
        ).alias("zcr"),
    )
    return (
        feats.join(runs, "user_id")
        .join(turn, "user_id")
        .select(
            "user_id",
            F.col("n").cast("long").alias("n"),
            F.round("acf1", 6).alias("acf1"),
            F.round("zcr", 6).alias("zero_cross_rate"),
            F.round(F.col("turns") / (F.col("n") - 2), 6).alias(
                "turning_frac"
            ),
            F.col("longest_run").cast("long").alias("longest_run"),
        )
    )


# ---------------------------------------------------------------------------
# X531 — AR(2) Yule-Walker fit + closed-form 3-step forecast
# ---------------------------------------------------------------------------


@query(
    "q_ar_forecast",
    oracle="""
    WITH m0 AS (
      SELECT c.c_mktsegment AS segment,
             date_trunc('month', o.o_orderdate) AS mon,
             round(sum(o.o_totalprice) / 1e6, 6) AS y
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ), st AS (
      SELECT segment, count(*) AS n, round(sum(y), 4) AS s1
      FROM m0 GROUP BY segment
    ), c AS (
      SELECT m0.segment, m0.mon, st.n,
             m0.y - st.s1 / st.n AS c,
             lag(m0.y - st.s1 / st.n) OVER w AS c1,
             lag(m0.y - st.s1 / st.n, 2) OVER w AS c2,
             row_number() OVER (PARTITION BY m0.segment
                                ORDER BY m0.mon DESC) AS rdesc,
             st.s1 / st.n AS m
      FROM m0 JOIN st ON m0.segment = st.segment
      WINDOW w AS (PARTITION BY m0.segment ORDER BY m0.mon)
    ), ac AS (
      SELECT segment, any_value(n) AS n, any_value(m) AS m,
             sum(c * c1) / sum(c * c) AS r1,
             sum(c * c2) / sum(c * c) AS r2,
             max(CASE WHEN rdesc = 1 THEN c END) AS cl1,
             max(CASE WHEN rdesc = 2 THEN c END) AS cl2
      FROM c GROUP BY segment
    ), fit AS (
      SELECT segment, n, m, cl1, cl2,
             r1 * (1 - r2) / (1 - r1 * r1) AS phi1,
             (r2 - r1 * r1) / (1 - r1 * r1) AS phi2
      FROM ac
    ), fc AS (
      SELECT segment, n, m, phi1, phi2,
             phi1 * cl1 + phi2 * cl2 AS e1,
             phi1 * (phi1 * cl1 + phi2 * cl2) + phi2 * cl1 AS e2,
             phi1 * (phi1 * (phi1 * cl1 + phi2 * cl2) + phi2 * cl1)
               + phi2 * (phi1 * cl1 + phi2 * cl2) AS e3
      FROM fit
    )
    SELECT segment, CAST(n AS BIGINT) AS n_months,
           round(phi1, 6) AS phi1, round(phi2, 6) AS phi2,
           round(m + e1, 6) AS f1, round(m + e2, 6) AS f2,
           round(m + e3, 6) AS f3
    FROM fc
    """,
)
def q_ar_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X531 — AR(2) by Yule-Walker over each segment's monthly revenue
    (in $M): φ₁ = r₁(1−r₂)/(1−r₁²), φ₂ = (r₂−r₁²)/(1−r₁²) from the
    lag-1/lag-2 autocorrelations of the demeaned series, then the
    closed-form h=1..3 forecast recursion unrolled symbolically
    (ê₊ₕ = φ₁ê₊ₕ₋₁ + φ₂ê₊ₕ₋₂ seeded by the last two residuals) — the
    autoregressive member the exponential-smoothing ladder (X218
    Holt, X340 Holt-Winters) lacks, and the modeling counterpart of
    X325's PACF diagnostic.

    Cross-engine: monthly sums rounded to the 1e-6 grid, the mean
    derived from the 4-dp-rounded total, so autocovariance terms are
    identical doubles in both engines; forecasts are pure closed-form
    arithmetic on those.  Scale: fact pass → month×segment rollup
    (tiny), then per-segment windows over ~80 rows."""
    o = load(spark, sf_dir, "orders")
    cst = load(spark, sf_dir, "customer")
    m0 = (
        o.join(
            F.broadcast(cst.select("c_custkey", "c_mktsegment")),
            o.o_custkey == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.date_trunc("month", "o_orderdate").alias("mon"),
        )
        .agg(F.round(F.sum("o_totalprice") / 1e6, 6).alias("y"))
    )
    st = m0.groupBy("segment").agg(
        F.count("*").alias("n"), F.round(F.sum("y"), 4).alias("s1")
    )
    w = Window.partitionBy("segment").orderBy("mon")
    wd = Window.partitionBy("segment").orderBy(F.desc("mon"))
    c = (
        m0.join(st, "segment")
        .withColumn("m", F.col("s1") / F.col("n"))
        .withColumn("c", F.col("y") - F.col("m"))
        .withColumn("c1", F.lag("c").over(w))
        .withColumn("c2", F.lag("c", 2).over(w))
        .withColumn("rdesc", F.row_number().over(wd))
    )
    ac = c.groupBy("segment").agg(
        F.first("n").alias("n"),
        F.first("m").alias("m"),
        (F.sum(F.col("c") * F.col("c1")) / F.sum(F.col("c") * F.col("c"))).alias(
            "r1"
        ),
        (F.sum(F.col("c") * F.col("c2")) / F.sum(F.col("c") * F.col("c"))).alias(
            "r2"
        ),
        F.max(F.when(F.col("rdesc") == 1, F.col("c"))).alias("cl1"),
        F.max(F.when(F.col("rdesc") == 2, F.col("c"))).alias("cl2"),
    )
    r1, r2 = F.col("r1"), F.col("r2")
    fit = ac.withColumn(
        "phi1", r1 * (1 - r2) / (1 - r1 * r1)
    ).withColumn("phi2", (r2 - r1 * r1) / (1 - r1 * r1))
    p1, p2, l1, l2 = (
        F.col("phi1"),
        F.col("phi2"),
        F.col("cl1"),
        F.col("cl2"),
    )
    e1 = p1 * l1 + p2 * l2
    e2 = p1 * (p1 * l1 + p2 * l2) + p2 * l1
    e3 = p1 * (p1 * (p1 * l1 + p2 * l2) + p2 * l1) + p2 * (
        p1 * l1 + p2 * l2
    )
    return fit.select(
        "segment",
        F.col("n").cast("long").alias("n_months"),
        F.round("phi1", 6).alias("phi1"),
        F.round("phi2", 6).alias("phi2"),
        F.round(F.col("m") + e1, 6).alias("f1"),
        F.round(F.col("m") + e2, 6).alias("f2"),
        F.round(F.col("m") + e3, 6).alias("f3"),
    )


# ---------------------------------------------------------------------------
# X532 — graph eccentricity by double-sweep BFS (bounded)
# ---------------------------------------------------------------------------

_BFS_ROUNDS = 4

_ECC_GRAPH_SQL = """
    e0 AS (
      SELECT DISTINCT 's' || CAST(l.l_suppkey AS VARCHAR) AS a,
                      'c' || CAST(o.o_custkey AS VARCHAR) AS b
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    sym AS MATERIALIZED (SELECT a, b FROM e0 UNION SELECT b, a FROM e0)"""


def _bfs_iter_sql(prev: str, out: str) -> str:
    return f"""
    {out} AS MATERIALIZED (
      SELECT node AS a, min(d) AS d FROM (
        SELECT a AS node, d FROM {prev}
        UNION ALL
        SELECT s.b AS node, p.d + 1 AS d
        FROM sym s JOIN {prev} p ON s.a = p.a
      ) GROUP BY node)"""


@query(
    "q_eccentricity",
    oracle=f"""
    WITH {_ECC_GRAPH_SQL},
    src1 AS (SELECT min(a) AS a FROM sym),
    b0 AS (SELECT a, 0 AS d FROM src1),
    {_bfs_iter_sql('b0', 'b1')}, {_bfs_iter_sql('b1', 'b2')},
    {_bfs_iter_sql('b2', 'b3')}, {_bfs_iter_sql('b3', 'b4')},
    far AS (SELECT a AS node, d FROM b4 ORDER BY d DESC, a LIMIT 1),
    c0 AS (SELECT node AS a, 0 AS d FROM far),
    {_bfs_iter_sql('c0', 'c1')}, {_bfs_iter_sql('c1', 'c2')},
    {_bfs_iter_sql('c2', 'c3')}, {_bfs_iter_sql('c3', 'c4')},
    nn AS (SELECT count(DISTINCT a) AS n FROM sym)
    SELECT (SELECT a FROM src1) AS sweep1_source,
           (SELECT node FROM far) AS sweep2_source,
           (SELECT CAST(max(d) AS BIGINT) FROM b4) AS ecc_sweep1,
           (SELECT CAST(max(d) AS BIGINT) FROM c4) AS diameter_lb,
           (SELECT CAST(count(*) AS BIGINT) FROM c4) AS n_reached,
           (SELECT CAST(n AS BIGINT) FROM nn) AS n_nodes
    """,
)
def q_eccentricity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X532 — graph diameter lower bound by the double-sweep BFS
    heuristic (Magnien et al.): BFS from a deterministic start (min
    node id), restart a second BFS from the farthest node found
    (distance-desc, name tie-break), and report its eccentricity —
    empirically tight on real graphs at the cost of exactly two BFS
    passes, where exact diameter needs all-pairs.  Both sweeps run a
    bounded {_BFS_ROUNDS} rounds of distance relaxation
    d'(v) = min(d(v), min over in-edges d(u)+1) — each round one
    edge⋈frontier join + one node-keyed min, the Pregel shape shared
    with X175 k-hop / X217 SSSP; the oracle unrolls all 8 rounds.

    Scale: state is one small int per reached node; the edge list is
    scanned once per round; rounds are a constant.  n_reached vs
    n_nodes exposes truncation honestly if the bound ever bites."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias(
                "a"
            ),
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias(
                "b"
            ),
        )
        .distinct()
    )
    sym = (
        edges.union(
            edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .distinct()
        .persist()
    )

    def bfs(source: DataFrame) -> DataFrame:
        dist = source.select("a", F.lit(0).alias("d")).localCheckpoint(
            eager=True
        )
        for _ in range(_BFS_ROUNDS):
            relaxed = sym.join(dist, "a").select(
                F.col("b").alias("a"), (F.col("d") + 1).alias("d")
            )
            dist = (
                dist.unionByName(relaxed)
                .groupBy("a")
                .agg(F.min("d").alias("d"))
                .localCheckpoint(eager=True)
            )
        return dist

    src1 = sym.agg(F.min("a").alias("a"))
    b4 = bfs(src1)
    far = b4.orderBy(F.desc("d"), "a").limit(1)
    c4 = bfs(far.select("a"))
    out = (
        src1.select(F.col("a").alias("sweep1_source"))
        .crossJoin(far.select(F.col("a").alias("sweep2_source")))
        .crossJoin(b4.agg(F.max("d").cast("long").alias("ecc_sweep1")))
        .crossJoin(
            c4.agg(
                F.max("d").cast("long").alias("diameter_lb"),
                F.count("*").cast("long").alias("n_reached"),
            )
        )
        .crossJoin(
            sym.agg(F.countDistinct("a").cast("long").alias("n_nodes"))
        )
    )
    res = out.localCheckpoint(eager=True)
    sym.unpersist()
    return res


# ---------------------------------------------------------------------------
# X533 — independent-cascade influence diffusion (portable hash coins)
# ---------------------------------------------------------------------------

_IC_P_MILLE = 150  # activation probability 0.15 per edge


def _ic_round_sql(active: str, newly: str, out_active: str,
                  out_newly: str) -> str:
    coin = token_hash_sql("s.a || '>' || s.b")
    return f"""
    {out_newly} AS MATERIALIZED (
      SELECT DISTINCT s.b AS a
      FROM sym s JOIN {newly} nw ON s.a = nw.a
      WHERE {coin} % 1000 < {_IC_P_MILLE}
        AND s.b NOT IN (SELECT a FROM {active})),
    {out_active} AS MATERIALIZED (
      SELECT a FROM {active} UNION SELECT a FROM {out_newly})"""


@query(
    "q_influence_cascade",
    oracle=f"""
    WITH {_ECC_GRAPH_SQL},
    seeds AS (
      SELECT DISTINCT 's' || CAST(s_suppkey AS VARCHAR) AS a
      FROM supplier WHERE s_nationkey = 0),
    a0 AS (SELECT a FROM seeds), n0 AS (SELECT a FROM seeds),
    {_ic_round_sql('a0', 'n0', 'a1', 'n1')},
    {_ic_round_sql('a1', 'n1', 'a2', 'n2')},
    {_ic_round_sql('a2', 'n2', 'a3', 'n3')}
    SELECT r, CAST(n_newly AS BIGINT) AS n_newly,
           CAST(sum(n_newly) OVER (ORDER BY r) AS BIGINT) AS n_active
    FROM (
      SELECT 0 AS r, (SELECT count(*) FROM n0) AS n_newly
      UNION ALL SELECT 1, (SELECT count(*) FROM n1)
      UNION ALL SELECT 2, (SELECT count(*) FROM n2)
      UNION ALL SELECT 3, (SELECT count(*) FROM n3))
    """,
)
def q_influence_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X533 — independent-cascade diffusion (Kempe-Kleinberg-Tardos):
    seeds (nation-0 suppliers) activate; each newly-active node gets
    ONE chance to activate each neighbor with p=0.15, and the spread
    front advances 3 rounds.  The per-edge coin is the portable
    60-bit md5 of the directed edge key (functions/hashing) — a fixed
    function of the edge, so 'each edge tried at most once' holds by
    construction and both engines flip identical coins; no RNG state,
    fully replayable.  This is the stochastic-diffusion counterpart
    to X528's deterministic mass flow (PPR) and X74's global rank —
    the influence-maximization evaluation primitive.

    Scale: per round one frontier⋈edge join with the coin predicate
    pushed into it, an anti-join against the active set, and a
    distinct — all node/edge-keyed; active-set state is one id per
    node, rounds constant."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    sup = load(spark, sf_dir, "supplier")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias(
                "a"
            ),
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias(
                "b"
            ),
        )
        .distinct()
    )
    sym = (
        edges.union(
            edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .distinct()
        .withColumn(
            "coin_hit",
            token_hash(F.concat(F.col("a"), F.lit(">"), F.col("b"))) % 1000
            < _IC_P_MILLE,
        )
        .persist()
    )
    seeds = (
        sup.filter(F.col("s_nationkey") == 0)
        .select(
            F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias(
                "a"
            )
        )
        .distinct()
    )
    active = seeds.localCheckpoint(eager=True)
    newly = active
    waves = [newly.withColumn("r", F.lit(0))]
    for r in range(1, 4):
        nxt = (
            sym.filter("coin_hit")
            .join(newly, "a")
            .select(F.col("b").alias("a"))
            .distinct()
            .join(active, "a", "left_anti")
            .localCheckpoint(eager=True)
        )
        waves.append(nxt.withColumn("r", F.lit(r)))
        active = active.union(nxt).localCheckpoint(eager=True)
        newly = nxt
    allnew = waves[0]
    for w_df in waves[1:]:
        allnew = allnew.unionByName(w_df)
    wcum = Window.orderBy("r").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rgrid = spark.range(4).select(F.col("id").cast("int").alias("r"))
    out = (
        rgrid.join(
            allnew.groupBy("r").agg(F.count("*").alias("cnt")), "r", "left"
        )
        .withColumn("n_newly", F.coalesce("cnt", F.lit(0)))
        .withColumn("n_active", F.sum("n_newly").over(wcum))
        .select(
            "r",
            F.col("n_newly").cast("long").alias("n_newly"),
            F.col("n_active").cast("long").alias("n_active"),
        )
        .localCheckpoint(eager=True)
    )
    sym.unpersist()
    return out


# ---------------------------------------------------------------------------
# X534 — Apriori frequent-triple mining (level-3 candidate pruning)
# ---------------------------------------------------------------------------

_AP_SUPP = 3


@query(
    "q_frequent_triples",
    oracle=f"""
    WITH ct AS (
      SELECT DISTINCT l.l_orderkey AS k, p.p_type AS t
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ), fp AS (
      SELECT a.t AS t1, b.t AS t2, count(*) AS supp
      FROM ct a JOIN ct b ON a.k = b.k AND a.t < b.t
      GROUP BY a.t, b.t HAVING count(*) >= {_AP_SUPP}
    ), cand AS (
      SELECT p1.t1, p1.t2, p2.t2 AS t3
      FROM fp p1 JOIN fp p2 ON p1.t1 = p2.t1 AND p1.t2 < p2.t2
      WHERE EXISTS (SELECT 1 FROM fp p3
                    WHERE p3.t1 = p1.t2 AND p3.t2 = p2.t2)
    )
    SELECT c.t1, c.t2, c.t3, CAST(count(*) AS BIGINT) AS support
    FROM cand c
    JOIN ct x1 ON x1.t = c.t1
    JOIN ct x2 ON x2.k = x1.k AND x2.t = c.t2
    JOIN ct x3 ON x3.k = x1.k AND x3.t = c.t3
    GROUP BY c.t1, c.t2, c.t3
    HAVING count(*) >= {_AP_SUPP}
    """,
)
def q_frequent_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X534 — Apriori level-3: frequent part-type TRIPLES in order
    baskets via classic candidate generation — frequent pairs
    self-join on a shared first item, pruned by the downward-closure
    check (the third sub-pair must itself be frequent) BEFORE any
    support counting touches the fact table, then candidates verified
    with a candidate-first 3-way join.  X113/X204 stop at pairs; the
    level-wise candidate/prune/verify loop is the part of Apriori
    that actually carries to distributed scale (the candidate set —
    not the basket data — is the small broadcast side).

    All integers; support threshold {_AP_SUPP}.  Scale: pair counting
    is basket-keyed self-join on baskets of ~4 items (bounded fan-out
    per basket); candidates broadcast into the verify join, so the
    only big operands ever shuffled are item-keyed."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    ct = (
        li.join(
            F.broadcast(p.select("p_partkey", "p_type")),
            li.l_partkey == F.col("p_partkey"),
        )
        .select(F.col("l_orderkey").alias("k"), F.col("p_type").alias("t"))
        .distinct()
        .persist()
    )
    a = ct.alias("a")
    b = ct.alias("b")
    fp = (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k")) & (F.col("a.t") < F.col("b.t")),
        )
        .groupBy(
            F.col("a.t").alias("t1"), F.col("b.t").alias("t2")
        )
        .agg(F.count("*").alias("supp"))
        .filter(F.col("supp") >= _AP_SUPP)
        .select("t1", "t2")
        .persist()
    )
    p1 = fp.alias("p1")
    p2 = fp.alias("p2")
    p3 = fp.select(
        F.col("t1").alias("q1"), F.col("t2").alias("q2")
    ).alias("p3")
    cand = (
        p1.join(
            p2,
            (F.col("p1.t1") == F.col("p2.t1"))
            & (F.col("p1.t2") < F.col("p2.t2")),
        )
        .select(
            F.col("p1.t1").alias("t1"),
            F.col("p1.t2").alias("t2"),
            F.col("p2.t2").alias("t3"),
        )
        .join(
            p3,
            (F.col("t2") == F.col("q1")) & (F.col("t3") == F.col("q2")),
            "left_semi",
        )
    )
    x1 = ct.alias("x1")
    x2 = ct.alias("x2")
    x3 = ct.alias("x3")
    verified = (
        F.broadcast(cand)
        .join(x1, F.col("x1.t") == F.col("t1"))
        .join(
            x2,
            (F.col("x2.k") == F.col("x1.k"))
            & (F.col("x2.t") == F.col("t2")),
        )
        .join(
            x3,
            (F.col("x3.k") == F.col("x1.k"))
            & (F.col("x3.t") == F.col("t3")),
        )
        .groupBy("t1", "t2", "t3")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= _AP_SUPP)
        .select(
            "t1", "t2", "t3", F.col("support").cast("long").alias("support")
        )
    )
    res = verified.localCheckpoint(eager=True)
    ct.unpersist()
    fp.unpersist()
    return res
