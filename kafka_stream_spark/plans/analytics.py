"""Product-analytics composites over the event stream: funnel,
retention, histogram. The operator shapes behind real dashboards — each
is a small composition of the engine's primitives (conditional
aggregation, self-joins on time buckets) with a full oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load
from .registry import query


@query(
    "q_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS first_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, min(e.ts) AS first_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.first_view
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, min(e.ts) AS first_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.first_click
      GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v) AS n_viewed,
           (SELECT count(*) FROM c) AS n_clicked_after,
           (SELECT count(*) FROM p) AS n_purchased_after
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: users counted
    at each stage only if the stage event happens strictly AFTER their
    previous stage's first event. Three aggregate+join rounds, each
    shuffling only (user_id, ts) pairs — at scale the stage frontier
    tables are tiny relative to the event log."""
    e = load(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("first_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    return (
        v.agg(F.count("*").alias("n_viewed"))
        .crossJoin(c.agg(F.count("*").alias("n_clicked_after")))
        .crossJoin(p.agg(F.count("*").alias("n_purchased_after")))
    )


@query(
    "q_retention",
    oracle="""
    WITH active AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
      FROM events
    )
    SELECT a.week, count(*) AS n_active,
           count(b.user_id) AS n_retained
    FROM active a
    LEFT JOIN active b
      ON a.user_id = b.user_id AND b.week = a.week + INTERVAL 7 DAY
    GROUP BY a.week
    """,
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week retention: users active in week w who are also
    active in w+1. Self-join of the (user, week) activity table on the
    shifted week — the activity table is |users|×|weeks|, tiny next to
    the event log, so the expensive input is touched once."""
    e = load(spark, sf_dir, "events")
    active = e.select(
        "user_id", F.date_trunc("week", "ts").alias("week")
    ).distinct()
    a, b = active.alias("a"), active.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.week") == F.col("a.week") + F.expr("INTERVAL 7 DAYS")),
            "left",
        )
        .groupBy(F.col("a.week").alias("week"))
        .agg(
            F.count("*").alias("n_active"),
            F.count(F.col("b.user_id")).alias("n_retained"),
        )
    )


@query(
    "q_histogram",
    oracle="""
    SELECT CAST(floor(value / 50) * 50 AS BIGINT) AS bucket,
           count(*) AS n, round(avg(value), 4) AS avg_in_bucket
    FROM events GROUP BY 1
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram (bucket = floor(v/50)*50) — one
    partial-aggregated pass; bucket count is data-independent so the
    shuffle is O(buckets)."""
    e = load(spark, sf_dir, "events")
    bucket = (F.floor(F.col("value") / 50) * 50).cast("long")
    return e.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n"), F.round(F.avg("value"), 4).alias("avg_in_bucket")
    )


def _pr_iter_sql(prev: str, out: str) -> str:
    """One unrolled PageRank iteration as a DuckDB CTE pair."""
    return f"""
    m_{out} AS (
      SELECT s.b AS node, sum(r.rank / dd.outdeg) AS mass
      FROM sym s JOIN {prev} r ON s.a = r.a JOIN deg dd ON s.a = dd.a
      GROUP BY s.b),
    {out} AS (
      SELECT d.a,
             CAST(0.15 AS DOUBLE) / (SELECT n FROM nn)
               + CAST(0.85 AS DOUBLE) * coalesce(m.mass, 0) AS rank
      FROM deg d LEFT JOIN m_{out} m ON d.a = m.node)"""


@query(
    "q_pagerank",
    oracle=f"""
    WITH e0 AS (
      SELECT DISTINCT 's' || CAST(l.l_suppkey AS VARCHAR) AS a,
                      'c' || CAST(o.o_custkey AS VARCHAR) AS b
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    sym AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
    deg AS (SELECT a, count(*) AS outdeg FROM sym GROUP BY a),
    nn AS (SELECT count(*) AS n FROM deg),
    r0 AS (SELECT a, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS rank
           FROM deg),
    {_pr_iter_sql('r0', 'r1')},
    {_pr_iter_sql('r1', 'r2')},
    {_pr_iter_sql('r2', 'r3')}
    SELECT a AS node, round(rank, 6) AS rank FROM r3
    """,
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X74 — PageRank (3 iterations, d=0.85) over the supplier↔customer
    shipment graph (distinct (l_suppkey, o_custkey) pairs via
    lineitem ⋈ orders, symmetrized so no node dangles). The iterative-
    numeric companion to q_dedup_clusters' label propagation: per round
    one edge⋈rank join + one aggregate, node-keyed shuffles throughout
    (operators/graph.pagerank). The oracle unrolls all three iterations
    as CTE chains — every intermediate rank distribution is pinned, not
    just the final one."""
    from ..operators.graph import pagerank

    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("a"),
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("b"),
        )
        .distinct()
    )
    ranks = pagerank(edges, iterations=3, damping=0.85)
    return ranks.select("node", F.round("rank", 6).alias("rank"))


@query(
    "q_equidepth_hist",
    oracle="""
    WITH t AS (
      SELECT o_orderpriority,
             o_totalprice,
             ntile(4) OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS quartile
      FROM orders)
    SELECT o_orderpriority, quartile,
           count(*) AS cnt,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM t GROUP BY o_orderpriority, quartile
    """,
)
def q_equidepth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram per priority class via ntile(4): equal row
    counts per bucket, data-dependent bounds (q_histogram is the
    equi-width twin). o_orderkey tie-break makes the bucket assignment
    total-order-deterministic in both engines. Scale note: a global
    ntile is a single-partition sort — partitioning by priority keeps
    each sort shard-sized; for an UNpartitioned equi-depth histogram at
    100 TB use approx percentiles as cut points instead (q_percentiles /
    q_approx_percentile)."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return (
        o.select(
            "o_orderpriority",
            "o_totalprice",
            F.ntile(4).over(w).alias("quartile"),
        )
        .groupBy("o_orderpriority", "quartile")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@query(
    "q_rank_dist",
    oracle="""
    WITH t AS (
      SELECT o_orderkey, o_orderpriority, o_totalprice,
             round(percent_rank() OVER w, 6) AS pct_rank,
             round(cume_dist() OVER w, 6) AS cume,
             row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice, o_orderkey))
    SELECT o_orderkey, o_orderpriority, o_totalprice, pct_rank, cume
    FROM t WHERE rn <= 10
    """,
)
def q_rank_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist (the remaining rank-family window
    functions): where each of the 10 globally most expensive orders sits
    within its priority class's price distribution. Tie-breaks on
    o_orderkey everywhere so both engines agree exactly."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    top = Window.orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.row_number().over(top).alias("rn"),
        )
        .filter(F.col("rn") <= 10)
        .drop("rn")
    )


@query(
    "q_skew_metrics",
    oracle="""
    WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id)
    SELECT count(*) AS n_keys,
           CAST(sum(cnt) AS BIGINT) AS total_rows,
           round(max(cnt) * 1.0 / sum(cnt), 6) AS top_key_share,
           round(quantile_cont(cnt, 0.5), 4) AS p50_cnt,
           round(quantile_cont(cnt, 0.99), 4) AS p99_cnt,
           round(max(cnt) * 1.0 / avg(cnt), 4) AS skew_factor
    FROM c
    """,
)
def q_skew_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostics for a prospective shuffle key: cardinality,
    hottest-key share, count quantiles, and max/mean skew factor — the
    numbers that decide between a plain groupBy, AQE skew handling, and
    the salted two-phase aggregate (operators.skew). Two partial-agg
    passes; the second aggregates |keys| rows, so it's O(cardinality)
    regardless of corpus size."""
    e = load(spark, sf_dir, "events")
    c = e.groupBy("user_id").agg(F.count("*").alias("cnt"))
    return c.agg(
        F.count("*").alias("n_keys"),
        F.sum("cnt").alias("total_rows"),
        F.round(F.max("cnt") * F.lit(1.0) / F.sum("cnt"), 6).alias(
            "top_key_share"
        ),
        F.round(F.percentile("cnt", 0.5), 4).alias("p50_cnt"),
        F.round(F.percentile("cnt", 0.99), 4).alias("p99_cnt"),
        F.round(F.max("cnt") * F.lit(1.0) / F.avg("cnt"), 4).alias(
            "skew_factor"
        ),
    )


@query(
    "q_event_pattern",
    oracle="""
    WITH s AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), ''
                        ORDER BY ts, event_id) AS seq
      FROM events GROUP BY user_id)
    SELECT user_id, length(seq) AS seq_len,
           CAST(regexp_matches(seq, 's[^e]*p') AS INT) AS matched
    FROM s
    """,
)
def q_event_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP-style sequence pattern matching (MATCH_RECOGNIZE / FlinkCEP
    analog): per user, did a signup lead to a purchase with NO
    intervening error? Each user's history is collapsed to a char-encoded
    sequence (one char per event, ts+event_id total order) and the
    pattern is a plain regex — negation, Kleene closure, and ordering
    constraints for free, in a single groupBy pass.

    Scale notes: state per user is their event-type string (bytes, not
    rows); the shuffle is the one groupBy. Per-user histories at 100 TB
    are bounded (events/user, not corpus size); for unbounded streams the
    same encoding lives in applyInPandasWithState with the regex run on
    state updates (cf. operators.stateful)."""
    e = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.substring("event_type", 1, 1).alias("ch"),
    )
    seq = e.groupBy("user_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "ch"))),
                lambda s: s.getField("ch"),
            ),
        ).alias("seq")
    )
    return seq.select(
        "user_id",
        F.length("seq").alias("seq_len"),
        F.regexp_like("seq", F.lit("s[^e]*p")).cast("int").alias("matched"),
    )


@query(
    "q_iqr_outliers",
    oracle="""
    WITH fences AS (
      SELECT event_type,
             quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.75) AS q3
      FROM events GROUP BY event_type)
    SELECT e.event_type,
           count(*) AS n,
           round(any_value(f.q1), 4) AS q1,
           round(any_value(f.q3), 4) AS q3,
           CAST(sum(CASE WHEN e.value < f.q1 - 1.5 * (f.q3 - f.q1)
                      OR e.value > f.q3 + 1.5 * (f.q3 - f.q1)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e JOIN fences f ON e.event_type = f.event_type
    GROUP BY e.event_type
    """,
)
def q_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier detection per group: exact interpolated
    quartiles (identical in both engines), 1.5×IQR fences, and the
    out-of-fence count — the robust anomaly screen that feeds a quality
    firewall. Two passes over the group key: the quantile aggregate
    (groups-only output, broadcast back) then one conditional count, so
    the fact table is scanned twice but shuffled zero times beyond the
    quantile partials."""
    e = load(spark, sf_dir, "events")
    fences = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25)").alias("q1"),
        F.expr("percentile(value, 0.75)").alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    out = (F.col("value") < F.col("q1") - 1.5 * iqr) | (
        F.col("value") > F.col("q3") + 1.5 * iqr
    )
    return (
        e.join(F.broadcast(fences), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.any_value("q1"), 4).alias("q1"),
            F.round(F.any_value("q3"), 4).alias("q3"),
            F.sum(out.cast("long")).alias("n_outliers"),
        )
    )


@query(
    "q_robust_scale",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type,
             any_value(m.med) AS med,
             quantile_cont(abs(e.value - m.med), 0.5) AS mad
      FROM events e JOIN med m USING (event_type)
      GROUP BY e.event_type
    )
    SELECT e.event_type,
           count(*) AS n,
           round(any_value(m.med), 4) AS med,
           round(any_value(m.mad), 4) AS mad,
           CAST(sum(CASE WHEN abs(0.6745 * (e.value - m.med) / m.mad) > 3.5
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e JOIN mad m USING (event_type)
    GROUP BY e.event_type
    """,
)
def q_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust scaling / outlier screen by median + MAD (the
    Iglewicz-Hodges modified z-score, |0.6745·(x-med)/MAD| > 3.5):
    unlike q_iqr_outliers' Tukey fences this is the estimator family
    that tolerates up to 50% contamination — the screen production data
    quality monitors actually run.

    Two grouped exact-quantile passes (median, then MAD) joined back on
    the group key, then one counting pass: three aggregates over the
    same (event_type) partitioning, which AQE plans as broadcast joins
    since the per-group fence table is |groups| rows. The scale path
    swaps percentile() for approx_percentile with no other change."""
    e = load(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("med")
    )
    mad = (
        e.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.any_value("med").alias("med"),
            F.percentile(F.abs(F.col("value") - F.col("med")), 0.5).alias(
                "mad"
            ),
        )
    )
    z = F.abs(0.6745 * (F.col("value") - F.col("med")) / F.col("mad"))
    return (
        e.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.any_value("med"), 4).alias("med"),
            F.round(F.any_value("mad"), 4).alias("mad"),
            F.sum((z > 3.5).cast("long")).alias("n_outliers"),
        )
    )


@query(
    "q_assoc_rules",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT user_id, event_type FROM events
    ),
    n_users AS (SELECT count(DISTINCT user_id) AS n FROM baskets),
    item AS (SELECT event_type, count(*) AS n_item FROM baskets GROUP BY 1),
    pair AS (
      SELECT a.event_type AS ante, b.event_type AS cons, count(*) AS n_xy
      FROM baskets a JOIN baskets b
        ON a.user_id = b.user_id AND a.event_type <> b.event_type
      GROUP BY 1, 2
    )
    SELECT p.ante, p.cons, p.n_xy,
           round(p.n_xy * 1.0 / u.n, 6) AS support,
           round(p.n_xy * 1.0 / ia.n_item, 6) AS confidence,
           round((p.n_xy * 1.0 / ia.n_item) / (ic.n_item * 1.0 / u.n), 6)
             AS lift
    FROM pair p
    JOIN item ia ON p.ante = ia.event_type
    JOIN item ic ON p.cons = ic.event_type
    CROSS JOIN n_users u
    """,
)
def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over per-user baskets (market-basket
    support/confidence/lift — the unordered companion to
    q_markov_transitions' sequential model). The basket table is the
    DISTINCT (user, item) projection; the pair join runs on user_id, so
    its width is bounded by per-user basket size (|item vocabulary|),
    never by event volume; item counts and the user total are broadcast
    scalars/vocab tables."""
    e = load(spark, sf_dir, "events")
    baskets = e.select("user_id", "event_type").distinct().persist()
    nu = baskets.agg(F.countDistinct("user_id").alias("n_users"))
    item = baskets.groupBy("event_type").agg(F.count("*").alias("n_item"))
    a, b = baskets.alias("a"), baskets.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") != F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("ante"),
            F.col("b.event_type").alias("cons"),
        )
        .agg(F.count("*").alias("n_xy"))
    )
    ia = item.select(
        F.col("event_type").alias("ante"), F.col("n_item").alias("n_ante")
    )
    ic = item.select(
        F.col("event_type").alias("cons"), F.col("n_item").alias("n_cons")
    )
    out = (
        pair.join(F.broadcast(ia), "ante")
        .join(F.broadcast(ic), "cons")
        .crossJoin(F.broadcast(nu))
        .select(
            "ante",
            "cons",
            "n_xy",
            F.round(F.col("n_xy") / F.col("n_users"), 6).alias("support"),
            F.round(F.col("n_xy") / F.col("n_ante"), 6).alias("confidence"),
            F.round(
                (F.col("n_xy") / F.col("n_ante"))
                / (F.col("n_cons") / F.col("n_users")),
                6,
            ).alias("lift"),
        )
    )
    return out


@query(
    "q_chi_square",
    oracle="""
    WITH obs AS (
      SELECT event_type, CAST(floor(value / 25) AS BIGINT) AS bucket,
             count(*) AS o
      FROM events GROUP BY 1, 2
    ),
    rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS r FROM obs GROUP BY 1),
    ct AS (SELECT bucket, CAST(sum(o) AS BIGINT) AS c FROM obs GROUP BY 1),
    n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs)
    SELECT round(sum(
             (obs.o - rt.r * ct.c * 1.0 / n.n)
             * (obs.o - rt.r * ct.c * 1.0 / n.n)
             / (rt.r * ct.c * 1.0 / n.n)), 4) AS chi2,
           CAST(((SELECT count(*) FROM rt) - 1)
                * ((SELECT count(*) FROM ct) - 1) AS BIGINT) AS dof
    FROM obs JOIN rt USING (event_type) JOIN ct USING (bucket) CROSS JOIN n
    """,
)
def q_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence statistic between event_type and
    the value's 25-wide bucket — the contingency-table test behind
    "did this categorical distribution shift?" alerts. One grouped count
    builds the contingency cells; the margins are tiny re-aggregations
    of those cells (never a second scan), joined back broadcast. Exact
    integer counts everywhere until the final expected-count division.

    Cells with zero observations contribute (0-e)²/e only if the cell
    exists in the cross product; both engines restrict to OBSERVED
    cells, so the statistic is over the same support by construction."""
    e = load(spark, sf_dir, "events")
    obs = e.groupBy(
        "event_type",
        F.floor(F.col("value") / 25).cast("long").alias("bucket"),
    ).agg(F.count("*").alias("o"))
    # margins as windows over the cell table (|types|×|buckets| rows) —
    # zero driver actions, one plan; the unpartitioned window is fine
    # because its input is the contingency table, never the event log
    wr = Window.partitionBy("event_type")
    wc = Window.partitionBy("bucket")
    wn = Window.partitionBy()
    x = obs.select(
        "event_type",
        "bucket",
        "o",
        F.sum("o").over(wr).alias("r"),
        F.sum("o").over(wc).alias("c"),
        F.sum("o").over(wn).alias("n"),
    )
    exp = F.col("r") * F.col("c") / F.col("n")
    return x.agg(
        F.round(
            F.sum((F.col("o") - exp) * (F.col("o") - exp) / exp), 4
        ).alias("chi2"),
        (
            (F.countDistinct("event_type") - 1)
            * (F.countDistinct("bucket") - 1)
        ).cast("long").alias("dof"),
    )


@query(
    "q_drift_psi",
    oracle="""
    WITH bounds AS (
      SELECT epoch_us(min(ts)) AS lo,
             (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid
      FROM events
    ),
    tagged AS (
      SELECT CAST(floor(value / 50) AS BIGINT) AS bucket,
             CASE WHEN epoch_us(ts) < b.mid THEN 'ref' ELSE 'cur' END AS half
      FROM events CROSS JOIN bounds b
    ),
    cnt AS (
      SELECT bucket,
             CAST(sum(CASE WHEN half = 'ref' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_ref,
             CAST(sum(CASE WHEN half = 'cur' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_cur
      FROM tagged GROUP BY bucket
    ),
    tot AS (SELECT CAST(sum(n_ref) AS BIGINT) AS t_ref,
                   CAST(sum(n_cur) AS BIGINT) AS t_cur FROM cnt)
    SELECT count(*) AS n_buckets,
           round(sum((n_ref * 1.0 / t_ref - n_cur * 1.0 / t_cur)
                     * ln((n_ref * 1.0 / t_ref) / (n_cur * 1.0 / t_cur))),
                 6) AS psi
    FROM cnt CROSS JOIN tot
    WHERE n_ref > 0 AND n_cur > 0
    """,
)
def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability index between the first and second time
    halves of the stream — the drift metric model-monitoring stacks
    compute per feature per day. The time midpoint comes from a scalar
    min/max aggregate broadcast back (no driver action); the PSI itself
    is one grouped count and a bucket-table-sized reduction. Buckets
    missing from either half are excluded (the observed-support
    convention, stated in both engines' predicates)."""
    e = load(spark, sf_dir, "events")
    bounds = e.agg(
        F.unix_micros(F.min("ts")).alias("lo"),
        ((F.unix_micros(F.min("ts")) + F.unix_micros(F.max("ts"))) / F.lit(2))
        .cast("long")
        .alias("mid"),
    )
    tagged = e.crossJoin(F.broadcast(bounds)).select(
        F.floor(F.col("value") / 50).cast("long").alias("bucket"),
        F.when(F.unix_micros("ts") < F.col("mid"), "ref")
        .otherwise("cur")
        .alias("half"),
    )
    cnt = tagged.groupBy("bucket").agg(
        F.sum((F.col("half") == "ref").cast("long")).alias("n_ref"),
        F.sum((F.col("half") == "cur").cast("long")).alias("n_cur"),
    )
    tot = cnt.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    p_ref = F.col("n_ref") / F.col("t_ref")
    p_cur = F.col("n_cur") / F.col("t_cur")
    return (
        cnt.filter((F.col("n_ref") > 0) & (F.col("n_cur") > 0))
        .crossJoin(F.broadcast(tot))
        .agg(
            F.count("*").alias("n_buckets"),
            F.round(
                F.sum((p_ref - p_cur) * F.log(p_ref / p_cur)), 6
            ).alias("psi"),
        )
    )


@query(
    "q_ks_test",
    oracle="""
    WITH s AS (
      SELECT value,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a,
             CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS b
      FROM events WHERE event_type IN ('click', 'view')
    ),
    g AS (SELECT value, CAST(sum(a) AS BIGINT) AS na,
                 CAST(sum(b) AS BIGINT) AS nb
          FROM s GROUP BY value),
    tot AS (SELECT CAST(sum(na) AS BIGINT) AS ta,
                   CAST(sum(nb) AS BIGINT) AS tb FROM g),
    c AS (
      SELECT CAST(sum(na) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS ca,
             CAST(sum(nb) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cb
      FROM g
    )
    SELECT t.ta AS n_a, t.tb AS n_b,
           round(max(abs(c.ca * 1.0 / t.ta - c.cb * 1.0 / t.tb)), 6)
             AS ks_stat
    FROM c CROSS JOIN tot t GROUP BY t.ta, t.tb
    """,
)
def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic (click vs view value
    distributions): max |ECDF_a − ECDF_b| over the merged value grid.

    The stream is first reduced to per-distinct-value counts (the only
    full-volume shuffle); the ECDF running sums then run over that
    grid — a single-partition window, which is exactly the KS
    structural limit, and why the pre-aggregation matters: at 100 TB
    the window's input is |distinct values| rows, not |events|. (For a
    truly unbounded grid, bucket values first — the PSI query's move.)"""
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    g = e.groupBy("value").agg(
        F.sum((F.col("event_type") == "click").cast("long")).alias("na"),
        F.sum((F.col("event_type") == "view").cast("long")).alias("nb"),
    )
    g.persist()
    tot = g.agg(F.sum("na").alias("ta"), F.sum("nb").alias("tb"))
    w = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = g.select(
        F.sum("na").over(w).alias("ca"), F.sum("nb").over(w).alias("cb")
    )
    out = (
        c.crossJoin(F.broadcast(tot))
        .groupBy(F.col("ta").alias("n_a"), F.col("tb").alias("n_b"))
        .agg(
            F.round(
                F.max(
                    F.abs(
                        F.col("ca") / F.col("ta") - F.col("cb") / F.col("tb")
                    )
                ),
                6,
            ).alias("ks_stat")
        )
    )
    out = out.localCheckpoint(eager=True)
    g.unpersist()
    return out
