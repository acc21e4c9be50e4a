"""Round-11 batch L (X774–X778): interval joins, positional phrase
retrieval, SimRank, seeded label spreading, sequential pattern mining.

Reference scope note: §2.13 mandate extensions, reference-free.

- X774 q_interval_join: a true two-relation INTERVAL JOIN (events ⋈
  burst windows on day-range containment) decomposed into an
  equi-join by exploding each bounded window into its covered days —
  the day-bucket trick that turns a range join Catalyst would
  nested-loop into a shuffle-hash join.  Burst windows are the top-3
  hottest days per stream ±1 day, merged gaps-and-islands — a top-K
  definition, so the gate instance can never go vacuous at any SF
  (the q_token_pmi lesson).
- X775 q_phrase_search: positional-postings phrase retrieval — build
  the (term, doc, pos) inverted index ONCE, derive the top-5 bigram
  phrases from it, and answer them by a positional self-equi-join
  (doc, pos+1) instead of re-scanning the corpus per query.
- X776 q_simrank: two SimRank iterations (Jeh & Widom 2002, C=0.8)
  on the customer↔brand purchase bipartite graph with a top-40
  per-brand hub cut (the X232 degree-cap discipline) — "similar
  brands are bought by similar customers, recursively".
- X777 q_label_spreading: seeded semi-supervised label propagation
  over the customer↔supplier shipment graph: 10% of customers are
  clamped seeds carrying their market segment, labels spread
  customer→supplier→customer by shipment-weighted majority; output
  is the non-seed confusion matrix (the label-recovery audit).
- X778 q_seq_patterns: PrefixSpan-style sequential pattern MINING —
  all frequent ordered event-type triples within each user's first
  8 events, greedy-earliest subsequence test, downward-closure
  pruning through frequent pairs (order-sensitive support: X97's CEP
  matches ONE given pattern; this mines every frequent one).

Determinism: every statistic is an exact integer count or an exact
integer ratio (SimRank scores are scaled-1e12 integer divisions);
ties break on keys; doubles appear only in final display rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions import text as textfn
from ..sources.tables import load
from .registry import query

# ---------------------------------------------------------------------------
# X774 — interval join: burst windows × other-stream events
# ---------------------------------------------------------------------------

_BURST_TOPK = 3

_INTERVAL_JOIN_ORACLE = f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) - DATE '1970-01-01' AS d,
             count(*) AS c
      FROM events GROUP BY 1, 2),
    hot AS (
      SELECT event_type, d FROM (
        SELECT event_type, d,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY c DESC, d) AS rk
        FROM daily) WHERE rk <= {_BURST_TOPK}),
    ext AS (
      SELECT DISTINCT event_type, d + o.off AS d
      FROM hot CROSS JOIN (SELECT unnest([-1, 0, 1]) AS off) o),
    isl AS (
      SELECT event_type, d,
             d - row_number() OVER (PARTITION BY event_type ORDER BY d)
               AS grp
      FROM ext),
    win AS (
      SELECT event_type AS burst_type, min(d) AS d0, max(d) AS d1
      FROM isl GROUP BY event_type, grp),
    ev AS (
      SELECT event_type AS other_type, user_id,
             CAST(ts AS DATE) - DATE '1970-01-01' AS d
      FROM events)
    SELECT w.burst_type, CAST(w.d0 AS BIGINT) AS d0,
           CAST(w.d1 AS BIGINT) AS d1, e.other_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM win w JOIN ev e
      ON e.d BETWEEN w.d0 AND w.d1 AND e.other_type <> w.burst_type
    GROUP BY 1, 2, 3, 4
    ORDER BY 1, 2, 4
    """


@query("q_interval_join", oracle=_INTERVAL_JOIN_ORACLE)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X774 — two-relation interval join: burst windows (top-{_BURST_TOPK}
    hottest days per stream ±1 day, islands-merged) joined against
    every OTHER stream's events on day containment.

    The range predicate ``e.d BETWEEN w.d0 AND w.d1`` would force
    Catalyst into a broadcast-nested-loop; instead each window —
    bounded by construction (top-K + merge) — is EXPLODED into its
    covered days, turning the interval join into a plain equi-join on
    the day key that shuffle-hash-partitions at any scale.  The
    oracle runs the literal range-predicate join; the hash match
    proves the decomposition is semantics-preserving.

    Scale: windows per stream ≤ {_BURST_TOPK} regardless of SF (top-K,
    never threshold-vacuous); the exploded build side stays tiny and
    broadcasts; the events side is scanned once, map-side pruned to
    window days."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias(
            "d"
        ),
    )
    daily = ev.groupBy("event_type", "d").agg(F.count("*").alias("c"))
    hot = (
        daily.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("event_type").orderBy(F.desc("c"), F.asc("d"))
            ),
        )
        .filter(F.col("rk") <= _BURST_TOPK)
        .select("event_type", "d")
    )
    ext = (
        hot.select(
            "event_type",
            F.explode(F.sequence(F.col("d") - 1, F.col("d") + 1)).alias("d"),
        )
        .distinct()
    )
    win = (
        ext.withColumn(
            "grp",
            F.col("d")
            - F.row_number().over(W.partitionBy("event_type").orderBy("d")),
        )
        .groupBy(F.col("event_type").alias("burst_type"), "grp")
        .agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
        .drop("grp")
    )
    days = win.select(
        "burst_type",
        "d0",
        "d1",
        F.explode(F.sequence("d0", "d1")).alias("d"),
    )
    return (
        ev.withColumnRenamed("event_type", "other_type")
        .join(F.broadcast(days), "d")
        .filter(F.col("other_type") != F.col("burst_type"))
        .groupBy(
            "burst_type",
            F.col("d0").cast("long").alias("d0"),
            F.col("d1").cast("long").alias("d1"),
            "other_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("burst_type", "d0", "other_type")
    )


# ---------------------------------------------------------------------------
# X775 — positional-postings phrase retrieval
# ---------------------------------------------------------------------------

_PHRASE_TOPK = 5

_PHRASE_ORACLE = f"""
    WITH tok AS MATERIALIZED (
      SELECT doc_id, {textfn.tokens_sql('lower(text)')} AS t FROM documents),
    post AS MATERIALIZED (
      SELECT doc_id, unnest(t) AS term,
             unnest(range(1, len(t) + 1)) AS pos, len(t) AS n
      FROM tok),
    bg AS MATERIALIZED (
      SELECT p1.doc_id, p1.term AS t1, p2.term AS t2
      FROM post p1 JOIN post p2
        ON p2.doc_id = p1.doc_id AND p2.pos = p1.pos + 1),
    top AS (
      SELECT t1, t2 FROM (
        SELECT t1, t2, count(*) AS occ,
               row_number() OVER (ORDER BY count(*) DESC, t1, t2) AS rk
        FROM bg GROUP BY t1, t2) WHERE rk <= {_PHRASE_TOPK})
    SELECT b.t1, b.t2, CAST(count(DISTINCT b.doc_id) AS BIGINT) AS doc_freq,
           CAST(count(*) AS BIGINT) AS occurrences
    FROM bg b JOIN top USING (t1, t2)
    GROUP BY 1, 2 ORDER BY occurrences DESC, t1, t2
    """


@query("q_phrase_search", oracle=_PHRASE_ORACLE)
def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X775 — phrase retrieval over a positional inverted index: build
    (term, doc, pos) postings ONCE, take the corpus's top-{_PHRASE_TOPK}
    adjacent bigrams as the phrase workload, and answer each phrase by
    the positional intersection join (doc, pos+1 = pos) — the
    search-engine primitive where phrase queries never re-scan text.

    Plan: one posexplode builds postings; the bigram-occurrence table
    is ONE positional self-equi-join on (doc_id, pos) keys (shuffle
    partitioned by doc — co-located, no skew since positions are
    unique per doc); the {_PHRASE_TOPK}-row phrase list broadcasts
    back into it.  Per-phrase df/occurrence are partial-aggregated
    counts.

    Scale: postings grow linearly with the corpus and the positional
    join stays doc-bucketed; the phrase list is a constant-size
    broadcast — the classic build-once / query-many index shape."""
    d = load(spark, sf_dir, "documents")
    post = d.select(
        "doc_id",
        F.posexplode(textfn.tokens(F.lower(F.col("text")))).alias(
            "p0", "term"
        ),
    ).select("doc_id", "term", (F.col("p0") + 1).alias("pos"))
    nxt = post.select(
        F.col("doc_id").alias("doc2"),
        F.col("term").alias("t2"),
        (F.col("pos") - 1).alias("pos2"),
    )
    bg = post.join(
        nxt,
        (F.col("doc_id") == F.col("doc2")) & (F.col("pos") == F.col("pos2")),
    ).select("doc_id", F.col("term").alias("t1"), "t2")
    top = (
        bg.groupBy("t1", "t2")
        .agg(F.count("*").alias("occ"))
        .withColumn(
            "rk",
            F.row_number().over(
                W.orderBy(F.desc("occ"), F.asc("t1"), F.asc("t2"))
            ),
        )
        .filter(F.col("rk") <= _PHRASE_TOPK)
        .select("t1", "t2")
    )
    return (
        bg.join(F.broadcast(top), ["t1", "t2"])
        .groupBy("t1", "t2")
        .agg(
            F.countDistinct("doc_id").alias("doc_freq"),
            F.count("*").alias("occurrences"),
        )
        .orderBy(F.desc("occurrences"), "t1", "t2")
    )


# ---------------------------------------------------------------------------
# X776 — SimRank (2 iterations) on the customer↔brand bipartite graph
# ---------------------------------------------------------------------------

_SIMRANK_CAP = 40  # top customers kept per brand (hub cut)
_SR_SCALE = 10**12  # fixed-point denominator for similarity scores

_SIMRANK_ORACLE = f"""
    WITH m0 AS (
      SELECT o.o_custkey AS cust, p.p_brand AS brand,
             count(*) AS n
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2),
    m AS (
      SELECT cust, brand FROM (
        SELECT cust, brand,
               row_number() OVER (PARTITION BY brand
                                  ORDER BY n DESC, cust) AS rk
        FROM m0) WHERE rk <= {_SIMRANK_CAP}),
    du AS (SELECT cust, count(*) AS d FROM m GROUP BY 1),
    da AS (SELECT brand, count(*) AS d FROM m GROUP BY 1),
    -- customer-level s1(u,v) = C * common_brands / (du*dv), scaled 1e12
    cc AS (
      SELECT a.cust AS u, b.cust AS v, count(*) AS common
      FROM m a JOIN m b ON b.brand = a.brand AND b.cust <> a.cust
      GROUP BY 1, 2),
    s1 AS (
      SELECT cc.u, cc.v,
             (4 * CAST(common AS HUGEINT) * {_SR_SCALE})
               // (5 * CAST(x.d AS HUGEINT) * y.d) AS sq
      FROM cc JOIN du x ON x.cust = cc.u JOIN du y ON y.cust = cc.v),
    -- brand-level pair sums: cross terms + identity terms (s1(u,u)=1)
    crossterm AS (
      SELECT ma.brand AS ba, mb.brand AS bb,
             CAST(sum(s1.sq) AS HUGEINT) AS s
      FROM s1 JOIN m ma ON ma.cust = s1.u JOIN m mb ON mb.cust = s1.v
      WHERE ma.brand < mb.brand
      GROUP BY 1, 2),
    ident AS (
      SELECT a.brand AS ba, b.brand AS bb,
             CAST(count(*) AS HUGEINT) * {_SR_SCALE} AS s
      FROM m a JOIN m b ON b.cust = a.cust AND a.brand < b.brand
      GROUP BY 1, 2),
    tot AS (
      SELECT ba, bb, sum(s) AS s
      FROM (SELECT * FROM crossterm UNION ALL SELECT * FROM ident)
      GROUP BY 1, 2)
    SELECT t.ba AS brand_a, t.bb AS brand_b,
           round(CAST((4 * t.s) // (5 * CAST(xa.d AS HUGEINT) * xb.d)
                 AS DOUBLE) / {_SR_SCALE}, 8) AS sim
    FROM tot t JOIN da xa ON xa.brand = t.ba JOIN da xb ON xb.brand = t.bb
    ORDER BY sim DESC, brand_a, brand_b
    """


@query("q_simrank", oracle=_SIMRANK_ORACLE)
def q_simrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X776 — SimRank, two iterations (Jeh & Widom 2002), C = 0.8, on
    the customer↔brand purchase bipartite graph: s₂(A,B) =
    C/(|N_A||N_B|) Σ_{{u∈N_A, v∈N_B}} s₁(u,v) with s₁ the one-step
    customer similarity C·|common brands|/(d_u·d_v) and s₁(u,u)=1 —
    "brands are similar when similar customers buy them, recursively".

    Tractability lever: a top-{_SIMRANK_CAP}-per-brand hub cut on the
    membership table (ties → custkey) bounds the customer-pair stage
    at brands × cap² rows — the X232 degree-cap discipline; without it
    the pair join is quadratic in customers.

    Exactness: scores are scaled-{_SR_SCALE} exact integer divisions
    (4·x DIV 5·d — C = 4/5 as a rational), summed in int128-capable
    types (decimal(38,0) / HUGEINT); doubles appear only in the final
    12-dp display division.

    Scale: membership caps at brands×{_SIMRANK_CAP} rows regardless of
    SF, so every downstream join is broadcast-sized; only the initial
    purchase rollup scans fact data."""
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("cust"), "o_orderkey"
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_brand").alias("brand")
    )
    m0 = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("cust", "brand")
        .agg(F.count("*").alias("n"))
    )
    m = (
        m0.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("brand").orderBy(F.desc("n"), F.asc("cust"))
            ),
        )
        .filter(F.col("rk") <= _SIMRANK_CAP)
        .select("cust", "brand")
        .localCheckpoint()
    )
    du = m.groupBy("cust").agg(F.count("*").alias("d"))
    da = m.groupBy("brand").agg(F.count("*").alias("d"))
    mb = m.select(F.col("cust").alias("cust2"), F.col("brand").alias("b2"))
    cc = (
        m.join(mb, (F.col("brand") == F.col("b2")) & (F.col("cust") != F.col("cust2")))
        .groupBy(F.col("cust").alias("u"), F.col("cust2").alias("v"))
        .agg(F.count("*").alias("common"))
    )
    dux = du.select(F.col("cust").alias("u"), F.col("d").alias("d_u"))
    duy = du.select(F.col("cust").alias("v"), F.col("d").alias("d_v"))
    s1 = (
        cc.join(F.broadcast(dux), "u")
        .join(F.broadcast(duy), "v")
        .select(
            "u",
            "v",
            F.expr(
                f"CAST(4 * common * CAST({_SR_SCALE} AS DECIMAL(38,0)) AS"
                " DECIMAL(38,0)) DIV CAST(5 * d_u * d_v AS DECIMAL(38,0))"
            ).alias("sq"),
        )
    )
    ma = m.select(F.col("cust").alias("u"), F.col("brand").alias("ba"))
    mbv = m.select(F.col("cust").alias("v"), F.col("brand").alias("bb"))
    crossterm = (
        s1.join(F.broadcast(ma), "u")
        .join(F.broadcast(mbv), "v")
        .filter(F.col("ba") < F.col("bb"))
        .groupBy("ba", "bb")
        .agg(F.sum("sq").cast("decimal(38,0)").alias("s"))
    )
    m_id = m.select("cust", F.col("brand").alias("bb"))
    ident = (
        m.select("cust", F.col("brand").alias("ba"))
        .join(m_id, "cust")
        .filter(F.col("ba") < F.col("bb"))
        .groupBy("ba", "bb")
        .agg(
            (F.count("*").cast("decimal(38,0)") * F.lit(_SR_SCALE)).alias(
                "s"
            )
        )
    )
    tot = (
        crossterm.unionByName(ident)
        .groupBy("ba", "bb")
        .agg(F.sum("s").cast("decimal(38,0)").alias("s"))
    )
    dax = da.select(F.col("brand").alias("ba"), F.col("d").alias("d_a"))
    dab = da.select(F.col("brand").alias("bb"), F.col("d").alias("d_b"))
    return (
        tot.join(F.broadcast(dax), "ba")
        .join(F.broadcast(dab), "bb")
        .select(
            F.col("ba").alias("brand_a"),
            F.col("bb").alias("brand_b"),
            F.round(
                F.expr(
                    "CAST(CAST(4 AS DECIMAL(38,0)) * s DIV"
                    " (CAST(5 AS DECIMAL(38,0)) * d_a * d_b) AS DOUBLE)"
                )
                / F.lit(float(_SR_SCALE)),
                8,
            ).alias("sim"),
        )
        .orderBy(F.desc("sim"), "brand_a", "brand_b")
    )


# ---------------------------------------------------------------------------
# X777 — seeded label spreading over the shipment graph
# ---------------------------------------------------------------------------

_LS_ORACLE = """
    WITH edge AS (
      SELECT o.o_custkey AS cust, l.l_suppkey AS supp, count(*) AS w
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2),
    seed AS (
      SELECT c_custkey AS cust, c_mktsegment AS lab
      FROM customer WHERE c_custkey % 10 = 0),
    sup_score AS (
      SELECT e.supp, s.lab, sum(e.w) AS sc
      FROM edge e JOIN seed s ON s.cust = e.cust
      GROUP BY 1, 2),
    sup_lab AS (
      SELECT supp, lab FROM (
        SELECT supp, lab,
               row_number() OVER (PARTITION BY supp
                                  ORDER BY sc DESC, lab) AS rk
        FROM sup_score) WHERE rk = 1),
    cust_score AS (
      SELECT e.cust, sl.lab, sum(e.w) AS sc
      FROM edge e JOIN sup_lab sl ON sl.supp = e.supp
      WHERE e.cust NOT IN (SELECT cust FROM seed)
      GROUP BY 1, 2),
    pred AS (
      SELECT cust, lab FROM (
        SELECT cust, lab,
               row_number() OVER (PARTITION BY cust
                                  ORDER BY sc DESC, lab) AS rk
        FROM cust_score) WHERE rk = 1)
    SELECT c.c_mktsegment AS true_seg, p.lab AS pred_seg,
           CAST(count(*) AS BIGINT) AS n
    FROM pred p JOIN customer c ON c.c_custkey = p.cust
    GROUP BY 1, 2 ORDER BY 1, 2
    """


@query("q_label_spreading", oracle=_LS_ORACLE)
def q_label_spreading(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X777 — seeded semi-supervised label spreading (Zhu & Ghahramani
    2002 style, hard labels) over the customer↔supplier shipment
    graph: 10% of customers (custkey % 10 = 0) are CLAMPED seeds
    carrying their market segment; round 1 labels each supplier by the
    shipment-weighted majority of its seed neighbors, round 2 labels
    every non-seed customer by the weighted majority of its labeled
    suppliers.  Output is the non-seed confusion matrix — the
    label-recovery audit that says whether graph structure predicts
    the segment (the modularity-aware upgrade of X174's unseeded LPA).

    Exactness: majority scores are exact shipment counts; every
    argmax breaks ties on the label string.

    Scale: two edge-grain aggregates + two per-node argmax windows —
    the same shapes as one PageRank round; the seed table is a
    broadcast dimension."""
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("cust"), "o_orderkey"
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_suppkey").alias("supp")
    )
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust"),
        F.col("c_mktsegment").alias("true_seg"),
    )
    edge = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("cust", "supp")
        .agg(F.count("*").alias("w"))
    )
    seed = cust.filter(F.col("cust") % 10 == 0).select(
        "cust", F.col("true_seg").alias("lab")
    )
    sup_lab = (
        edge.join(F.broadcast(seed), "cust")
        .groupBy("supp", "lab")
        .agg(F.sum("w").alias("sc"))
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("supp").orderBy(F.desc("sc"), F.asc("lab"))
            ),
        )
        .filter(F.col("rk") == 1)
        .select("supp", "lab")
    )
    pred = (
        edge.join(F.broadcast(seed.select("cust")), "cust", "left_anti")
        .join(F.broadcast(sup_lab), "supp")
        .groupBy("cust", "lab")
        .agg(F.sum("w").alias("sc"))
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("cust").orderBy(F.desc("sc"), F.asc("lab"))
            ),
        )
        .filter(F.col("rk") == 1)
        .select("cust", F.col("lab").alias("pred_seg"))
    )
    return (
        pred.join(cust, "cust")
        .groupBy("true_seg", "pred_seg")
        .agg(F.count("*").alias("n"))
        .orderBy("true_seg", "pred_seg")
    )


# ---------------------------------------------------------------------------
# X778 — sequential pattern mining (frequent ordered triples)
# ---------------------------------------------------------------------------

_SEQ_WINDOW = 8  # pattern must occur within each user's first W events
_SEQ_MINSUP_PCT = 22  # support threshold as % of users

_SEQ_ORACLE = f"""
    WITH p AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS pos
      FROM events),
    w AS (SELECT * FROM p WHERE pos <= {_SEQ_WINDOW}),
    nu AS (SELECT count(DISTINCT user_id) AS n FROM w),
    f AS (
      SELECT user_id, event_type, min(pos) AS fp, max(pos) AS lp
      FROM w GROUP BY 1, 2),
    pair AS (
      SELECT a.event_type AS a, b.event_type AS b,
             count(DISTINCT a.user_id) AS sup
      FROM f a JOIN f b ON b.user_id = a.user_id AND a.fp < b.lp
      GROUP BY 1, 2),
    cand2 AS (
      SELECT a, b FROM pair, nu
      WHERE sup * 100 >= {_SEQ_MINSUP_PCT} * nu.n),
    step AS (
      SELECT fa.user_id, fa.event_type AS a, wb.event_type AS b,
             min(wb.pos) AS p2
      FROM f fa JOIN w wb
        ON wb.user_id = fa.user_id AND wb.pos > fa.fp
      JOIN cand2 ON cand2.a = fa.event_type AND cand2.b = wb.event_type
      GROUP BY 1, 2, 3),
    trip AS (
      SELECT s.a, s.b, fc.event_type AS c,
             count(DISTINCT s.user_id) AS sup
      FROM step s JOIN f fc
        ON fc.user_id = s.user_id AND fc.lp > s.p2
      JOIN cand2 ON cand2.a = s.b AND cand2.b = fc.event_type
      GROUP BY 1, 2, 3)
    SELECT a, b, c, CAST(sup AS BIGINT) AS support
    FROM trip, nu WHERE sup * 100 >= {_SEQ_MINSUP_PCT} * nu.n
    ORDER BY support DESC, a, b, c
    """


@query("q_seq_patterns", oracle=_SEQ_ORACLE)
def q_seq_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X778 — sequential pattern MINING, PrefixSpan-style: every
    frequent ordered event-type triple a→b→c occurring as a
    subsequence within each user's first {_SEQ_WINDOW} events, support
    = distinct users, min-sup {_SEQ_MINSUP_PCT}% (X97's CEP matches one
    GIVEN pattern; this mines ALL frequent ones).

    Subsequence test is greedy-earliest — provably equivalent to
    existence: p₁ = first(a), p₂ = first b after p₁, then any c after
    p₂ (checked via last(c) > p₂, an O(1) per-(user,type) test).
    Candidate triples are pruned by downward closure through frequent
    pairs ((a,b) and (b,c) both frequent) before any counting — the
    Apriori discipline made order-sensitive.

    Exactness: supports are exact distinct-user counts; the min-sup
    cut is the integer inequality sup·100 ≥ {_SEQ_MINSUP_PCT}·n_users.

    Scale: the per-user window bound caps every intermediate at
    W×users rows; pair/triple stages shuffle on user_id only; the
    candidate sets are broadcast (≤ types²)."""
    ev = load(spark, sf_dir, "events")
    p = ev.select(
        "user_id",
        "event_type",
        F.row_number()
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("pos"),
    ).filter(F.col("pos") <= _SEQ_WINDOW)
    p = p.localCheckpoint()
    n_users = p.select("user_id").distinct().count()
    f = p.groupBy("user_id", "event_type").agg(
        F.min("pos").alias("fp"), F.max("pos").alias("lp")
    )
    fb = f.select(
        F.col("user_id").alias("u2"),
        F.col("event_type").alias("bt"),
        F.col("lp").alias("lp_b"),
    )
    pair = (
        f.join(
            fb,
            (F.col("user_id") == F.col("u2")) & (F.col("fp") < F.col("lp_b")),
        )
        .groupBy(F.col("event_type").alias("a"), F.col("bt").alias("b"))
        .agg(F.countDistinct("user_id").alias("sup"))
    )
    cand2 = pair.filter(F.col("sup") * 100 >= _SEQ_MINSUP_PCT * n_users).select(
        "a", "b"
    )
    wb = p.select(
        F.col("user_id").alias("u2"),
        F.col("event_type").alias("b"),
        F.col("pos").alias("pos_b"),
    )
    step = (
        f.select("user_id", F.col("event_type").alias("a"), "fp")
        .join(
            wb,
            (F.col("user_id") == F.col("u2"))
            & (F.col("pos_b") > F.col("fp")),
        )
        .join(F.broadcast(cand2), ["a", "b"])
        .groupBy("user_id", "a", "b")
        .agg(F.min("pos_b").alias("p2"))
    )
    fc = f.select(
        F.col("user_id").alias("u3"),
        F.col("event_type").alias("c"),
        F.col("lp").alias("lp_c"),
    )
    cand_bc = cand2.select(
        F.col("a").alias("b"), F.col("b").alias("c")
    )
    trip = (
        step.join(
            fc,
            (F.col("user_id") == F.col("u3"))
            & (F.col("lp_c") > F.col("p2")),
        )
        .join(F.broadcast(cand_bc), ["b", "c"])
        .groupBy("a", "b", "c")
        .agg(F.countDistinct("user_id").alias("support"))
        .filter(F.col("support") * 100 >= _SEQ_MINSUP_PCT * n_users)
    )
    return trip.select("a", "b", "c", "support").orderBy(
        F.desc("support"), "a", "b", "c"
    )
