"""Round-4 batch U: decision-process analytics (X417-X423).

Operators that close decision loops over batteries the engine already
computes: the stationary distribution turns X110's transition matrix
into long-run occupancy; UCB1 turns X199's arm means into an
exploration policy; mSPRT turns the daily A/B readout into an
ALWAYS-VALID sequential test (peeking-safe, unlike X199's fixed-n z);
safety stock turns X368's demand statistics into an inventory policy;
the ABC-XYZ matrix is the 9-cell planning grid its two axes (X264,
X352) exist to feed; n-gram novelty and event trigrams extend the
corpus/sequence families. All sufficient-statistics or bounded-window
plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load
from .registry import query

# ---------------------------------------------------------------------------
# X417 — Markov stationary distribution by power iteration
# ---------------------------------------------------------------------------


@query(
    "q_markov_stationary",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ), t AS (
      SELECT prev_type AS s, event_type AS nxt, count(*) AS n
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
    ), p AS (
      SELECT s, nxt, n * 1.0 / sum(n) OVER (PARTITION BY s) AS p
      FROM t
    ), states AS (SELECT s, count(*) OVER () AS k FROM (
        SELECT DISTINCT s FROM p)),
    pi0 AS (SELECT s, 1.0 / any_value(k) AS pi FROM states GROUP BY s),
    pi1 AS (SELECT p.nxt AS s, sum(pi0.pi * p.p) AS pi
            FROM pi0 JOIN p ON pi0.s = p.s GROUP BY p.nxt),
    pi2 AS (SELECT p.nxt AS s, sum(pi1.pi * p.p) AS pi
            FROM pi1 JOIN p ON pi1.s = p.s GROUP BY p.nxt),
    pi3 AS (SELECT p.nxt AS s, sum(pi2.pi * p.p) AS pi
            FROM pi2 JOIN p ON pi2.s = p.s GROUP BY p.nxt),
    emp AS (
      SELECT s, sum(n) * 1.0 / (SELECT sum(n) FROM t) AS occ
      FROM t GROUP BY s
    )
    SELECT pi3.s AS state, round(pi3.pi, 6) AS pi_power3,
           round(emp.occ, 6) AS empirical_occupancy,
           round(abs(pi3.pi - emp.occ), 6) AS abs_gap
    FROM pi3 JOIN emp ON pi3.s = emp.s
    """,
)
def q_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X417 — stationary distribution of the event-type Markov chain by
    three unrolled power-iteration steps from uniform (π ← πP, the
    X74 PageRank superstep without damping), against the empirical
    occupancy — convergence of the gap says whether the chain mixes
    fast enough for X378's entropy rate to mean anything. Each step is
    one k²-row join + k-row aggregate; the raw table is touched once
    for transitions."""
    seq = load(spark, sf_dir, "events").select(
        "event_type",
        F.lag("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev_type"),
    )
    t = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("s"), F.col("event_type").alias("nxt")
        )
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=True)
    )
    p = t.withColumn(
        "p",
        F.col("n") * 1.0 / F.sum("n").over(Window.partitionBy("s")),
    ).select("s", "nxt", "p")
    states = p.select("s").distinct()
    k = states.agg(F.count("*").alias("k"))
    pi = states.crossJoin(F.broadcast(k)).select(
        "s", (1.0 / F.col("k")).alias("pi")
    )
    for _ in range(3):
        pi = (
            pi.join(p, "s")
            .groupBy(F.col("nxt").alias("s2"))
            .agg(F.sum(F.col("pi") * F.col("p")).alias("pi"))
            .withColumnRenamed("s2", "s")
        )
    tot = t.agg(F.sum("n").alias("tn"))
    emp = (
        t.groupBy("s")
        .agg(F.sum("n").alias("sn"))
        .crossJoin(F.broadcast(tot))
        .select("s", (F.col("sn") * 1.0 / F.col("tn")).alias("occ"))
    )
    return pi.join(emp, "s").select(
        F.col("s").alias("state"),
        F.round("pi", 6).alias("pi_power3"),
        F.round("occ", 6).alias("empirical_occupancy"),
        F.round(F.abs(F.col("pi") - F.col("occ")), 6).alias("abs_gap"),
    )


# ---------------------------------------------------------------------------
# X418 — event trigram mining
# ---------------------------------------------------------------------------


@query(
    "q_event_trigrams",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             lag(event_type, 1) OVER w AS p1,
             lag(event_type, 2) OVER w AS p2
      FROM events
      WINDOW w AS (PARTITION BY user_id, date_trunc('day', ts)
                   ORDER BY ts, event_id)
    ), tri AS (
      SELECT p2 || '>' || p1 || '>' || event_type AS trigram,
             count(*) AS n
      FROM seq WHERE p2 IS NOT NULL GROUP BY 1
    ), tot AS (SELECT sum(n) AS t FROM tri)
    SELECT trigram, CAST(n AS BIGINT) AS n,
           round(n * 1.0 / t.t, 6) AS share
    FROM (SELECT *, row_number() OVER (ORDER BY n DESC, trigram) AS rn
          FROM tri) CROSS JOIN tot t
    WHERE rn <= 15
    """,
)
def q_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X418 — contiguous event-type trigrams anywhere within a session
    (two lags, every position — where X390's paths only fingerprint
    the session HEAD), top-15 with shares: the sequence motifs a
    next-action model or X97's CEP patterns should be seeded from.
    One windowed pass, k³-bounded aggregation key."""
    w = Window.partitionBy(
        "user_id", F.date_trunc("day", "ts")
    ).orderBy("ts", "event_id")
    seq = load(spark, sf_dir, "events").select(
        "event_type",
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    )
    tri = (
        seq.filter(F.col("p2").isNotNull())
        .groupBy(
            F.concat_ws(
                ">", F.col("p2"), F.col("p1"), F.col("event_type")
            ).alias("trigram")
        )
        .agg(F.count("*").alias("n"))
    )
    tot = tri.agg(F.sum("n").alias("t"))
    wr = Window.orderBy(F.col("n").desc(), "trigram")
    return (
        tri.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 15)
        .crossJoin(F.broadcast(tot))
        .select(
            "trigram",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n") * 1.0 / F.col("t"), 6).alias("share"),
        )
    )


# ---------------------------------------------------------------------------
# X419 — UCB1 bandit scores
# ---------------------------------------------------------------------------


@query(
    "q_ucb1",
    oracle="""
    WITH arms AS (
      SELECT event_type AS arm, count(*) AS n,
             avg(least(greatest(value / 30.0, 0.0), 1.0)) AS mean_reward
      FROM events GROUP BY event_type
    ), tot AS (SELECT sum(n) AS nn FROM arms),
    scored AS (
      SELECT arm, n, mean_reward,
             round(mean_reward + sqrt(2 * ln(t.nn) / n), 6) AS ucb
      FROM arms CROSS JOIN tot t
    )
    SELECT arm, CAST(n AS BIGINT) AS n_pulls,
           round(mean_reward, 6) AS mean_reward, ucb,
           ucb = max(ucb) OVER () AS chosen
    FROM scored
    """,
)
def q_ucb1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X419 — UCB1 bandit scores over event-type arms ([0,1]-clamped
    value/30 reward): score = mean + √(2·ln N / n), the
    optimism-under-uncertainty index (Auer et al.) whose argmax is the
    next arm to pull — the exploration policy layer over X199's plain
    arm means (an under-pulled arm can be chosen on uncertainty
    alone). Deterministic (unlike Thompson sampling), so fully
    oracled; one k-row fold, chosen cut on the rounded score."""
    arms = (
        load(spark, sf_dir, "events")
        .groupBy(F.col("event_type").alias("arm"))
        .agg(
            F.count("*").alias("n"),
            F.avg(
                F.least(
                    F.greatest(F.col("value") / 30.0, F.lit(0.0)),
                    F.lit(1.0),
                )
            ).alias("mean_reward"),
        )
    )
    tot = arms.agg(F.sum("n").alias("nn"))
    scored = arms.crossJoin(F.broadcast(tot)).select(
        "arm",
        "n",
        "mean_reward",
        F.round(
            F.col("mean_reward")
            + F.sqrt(2 * F.log("nn") / F.col("n")),
            6,
        ).alias("ucb"),
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return scored.select(
        "arm",
        F.col("n").cast("long").alias("n_pulls"),
        F.round("mean_reward", 6).alias("mean_reward"),
        "ucb",
        (F.col("ucb") == F.max("ucb").over(wall)).alias("chosen"),
    )


# ---------------------------------------------------------------------------
# X420 — safety stock / reorder point
# ---------------------------------------------------------------------------


@query(
    "q_safety_stock",
    oracle="""
    WITH wk AS (
      SELECT l_partkey % 50 AS band,
             CAST(date_trunc('week', l_shipdate) AS DATE) AS wk,
             sum(l_quantity) AS q
      FROM lineitem GROUP BY 1, 2
    ), horizon AS (SELECT count(DISTINCT wk) AS w FROM wk),
    demand AS (
      SELECT band, sum(q) AS sq, sum(q * q) AS sqq, count(*) AS nw
      FROM wk GROUP BY band
    ), lt AS (
      SELECT l.l_partkey % 50 AS band,
             avg(greatest(date_diff('day', o.o_orderdate, l.l_shipdate),
                          0) / 7.0) AS lt_weeks
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1
    ), stats AS (
      SELECT d.band,
             d.sq / h.w AS mean_week,
             sqrt(greatest((d.sqq - d.sq * d.sq / h.w) / (h.w - 1), 0))
               AS sd_week,
             lt.lt_weeks
      FROM demand d CROSS JOIN horizon h JOIN lt ON d.band = lt.band
    )
    SELECT CAST(band AS BIGINT) AS band,
           round(mean_week, 4) AS mean_weekly_demand,
           round(sd_week, 4) AS sd_weekly_demand,
           round(lt_weeks, 4) AS lead_time_weeks,
           round(1.645 * sd_week * sqrt(lt_weeks), 4) AS safety_stock,
           round(mean_week * lt_weeks
                 + 1.645 * sd_week * sqrt(lt_weeks), 4) AS reorder_point
    FROM stats
    """,
)
def q_safety_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X420 — safety stock and reorder point per part band at a 95%
    service level: SS = z·σ_week·√LT with z=1.645, ROP = demand
    rate·LT + SS — the inventory policy X368's Croston statistics and
    X352's XYZ classes exist to parameterize. Weekly demand sd is
    ZERO-INCLUSIVE (moments against the full week horizon, so silent
    weeks depress the mean and widen the sd exactly as they should);
    lead time from the order→ship join, clamped per-row to >=0 (the
    synthetic feed contains ship-before-order rows). Two grouped
    scans, k-row algebra."""
    li = load(spark, sf_dir, "lineitem")
    wk = li.groupBy(
        (F.col("l_partkey") % 50).alias("band"),
        F.to_date(F.date_trunc("week", "l_shipdate")).alias("wk"),
    ).agg(F.sum("l_quantity").alias("q"))
    horizon = wk.agg(F.countDistinct("wk").alias("w"))
    demand = wk.groupBy("band").agg(
        F.sum("q").alias("sq"),
        F.sum(F.col("q") * F.col("q")).alias("sqq"),
    )
    o = load(spark, sf_dir, "orders")
    lt = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy((F.col("l_partkey") % 50).alias("band"))
        .agg(
            F.avg(
                F.greatest(
                    F.datediff("l_shipdate", "o_orderdate"), F.lit(0)
                )
                / 7.0
            ).alias("lt_weeks")
        )
    )
    stats = (
        demand.crossJoin(F.broadcast(horizon))
        .join(lt, "band")
        .select(
            "band",
            (F.col("sq") / F.col("w")).alias("mean_week"),
            F.sqrt(
                F.greatest(
                    (
                        F.col("sqq")
                        - F.col("sq") * F.col("sq") / F.col("w")
                    )
                    / (F.col("w") - 1),
                    F.lit(0.0),
                )
            ).alias("sd_week"),
            "lt_weeks",
        )
    )
    ss = 1.645 * F.col("sd_week") * F.sqrt(F.col("lt_weeks"))
    return stats.select(
        F.col("band").cast("long").alias("band"),
        F.round("mean_week", 4).alias("mean_weekly_demand"),
        F.round("sd_week", 4).alias("sd_weekly_demand"),
        F.round("lt_weeks", 4).alias("lead_time_weeks"),
        F.round(ss, 4).alias("safety_stock"),
        F.round(
            F.col("mean_week") * F.col("lt_weeks") + ss, 4
        ).alias("reorder_point"),
    )


# ---------------------------------------------------------------------------
# X421 — n-gram novelty across ingest batches
# ---------------------------------------------------------------------------


@query(
    "q_ngram_novelty",
    oracle=f"""
    WITH w AS (
      SELECT doc_id // 100 AS batch, string_split(text, ' ') AS w
      FROM documents
    ), grams AS (
      SELECT DISTINCT batch,
             array_to_string(w[i:i + 2], ' ') AS gram
      FROM (SELECT batch, w,
                   unnest(generate_series(1, len(w) - 2)) AS i
            FROM w WHERE len(w) >= 3)
    ), firsts AS (
      SELECT gram, min(batch) AS first_batch FROM grams GROUP BY gram
    ), per_batch AS (
      SELECT g.batch, count(*) AS n_distinct,
             sum(CASE WHEN f.first_batch = g.batch THEN 1 ELSE 0 END)
               AS n_new
      FROM grams g JOIN firsts f ON g.gram = f.gram
      GROUP BY g.batch
    )
    SELECT CAST(batch AS BIGINT) AS batch,
           CAST(n_distinct AS BIGINT) AS n_distinct_grams,
           CAST(n_new AS BIGINT) AS n_new_grams,
           round(n_new * 1.0 / n_distinct, 6) AS novelty_frac,
           CAST(sum(n_new) OVER (ORDER BY batch) AS BIGINT)
             AS cum_vocab
    FROM per_batch
    """,
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X421 — 3-gram novelty per ingest batch (doc_id blocks of 100 as
    arrival order): the fraction of a batch's distinct trigrams never
    seen in an earlier batch, plus the cumulative vocabulary curve —
    the data-freshness signal that tells a continual-pretraining loop
    when a new crawl stops adding anything (the temporal face of
    X91/X381's cross-doc duplication). First-occurrence is one min per
    gram; batches aggregate on the (batch, gram) distinct table."""
    w = load(spark, sf_dir, "documents").select(
        (F.col("doc_id") / 100).cast("long").alias("batch"),
        F.split("text", " ").alias("w"),
    )
    grams = (
        w.select(
            "batch",
            F.explode(
                F.expr(
                    "CASE WHEN size(w) >= 3 THEN "
                    "transform(sequence(1, size(w) - 2), i -> "
                    "array_join(slice(w, i, 3), ' ')) "
                    "ELSE array() END"
                )
            ).alias("gram"),
        )
        .distinct()
    )
    firsts = grams.groupBy("gram").agg(F.min("batch").alias("first_batch"))
    per_batch = (
        grams.join(firsts, "gram")
        .groupBy("batch")
        .agg(
            F.count("*").alias("n_distinct"),
            F.sum(
                (F.col("first_batch") == F.col("batch")).cast("int")
            ).alias("n_new"),
        )
    )
    return per_batch.select(
        F.col("batch").cast("long").alias("batch"),
        F.col("n_distinct").cast("long").alias("n_distinct_grams"),
        F.col("n_new").cast("long").alias("n_new_grams"),
        F.round(F.col("n_new") * 1.0 / F.col("n_distinct"), 6).alias(
            "novelty_frac"
        ),
        F.sum("n_new")
        .over(Window.orderBy("batch"))
        .cast("long")
        .alias("cum_vocab"),
    )


# ---------------------------------------------------------------------------
# X422 — ABC-XYZ planning matrix
# ---------------------------------------------------------------------------


@query(
    "q_abc_xyz_matrix",
    oracle="""
    WITH monthly AS (
      SELECT l_partkey % 50 AS band,
             year(l_shipdate) * 12 + month(l_shipdate) AS m,
             sum(l_quantity) AS q,
             sum(l_extendedprice * (1 - l_discount)) AS rev
      FROM lineitem GROUP BY 1, 2
    ), per_band AS (
      SELECT band, sum(rev) AS rev, count(*) AS n_months,
             sqrt(sum(q * q) / count(*) - avg(q) * avg(q)) / avg(q) AS cv
      FROM monthly GROUP BY band
    ), abc AS (
      SELECT band, rev, cv,
             sum(rev) OVER (ORDER BY rev DESC, band)
               / sum(rev) OVER () AS cum_share
      FROM per_band
    ), labeled AS (
      SELECT band, rev, cv,
             CASE WHEN cum_share <= 0.8 THEN 'A'
                  WHEN cum_share <= 0.95 THEN 'B' ELSE 'C' END AS abc,
             CASE WHEN cv < 0.5 THEN 'X' WHEN cv < 1.0 THEN 'Y'
                  ELSE 'Z' END AS xyz
      FROM abc
    )
    SELECT abc, xyz, CAST(count(*) AS BIGINT) AS n_bands,
           round(sum(rev), 2) AS revenue,
           round(sum(rev) / (SELECT sum(rev) FROM per_band), 6)
             AS revenue_share,
           round(avg(cv), 6) AS mean_cv
    FROM labeled GROUP BY abc, xyz
    """,
)
def q_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X422 — the ABC-XYZ planning matrix: revenue concentration
    (A/B/C at cumulative 80/95% — X264's axis) crossed with demand
    variability (X/Y/Z at CV 0.5/1.0 — X352's axis) per part band.
    AX cells get JIT automation, CZ cells get make-to-order — this
    9-cell grid IS the standard inventory-strategy deliverable the two
    single-axis queries feed. One monthly rollup, windows over 50
    bands."""
    monthly = (
        load(spark, sf_dir, "lineitem")
        .groupBy(
            (F.col("l_partkey") % 50).alias("band"),
            (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("m"),
        )
        .agg(
            F.sum("l_quantity").alias("q"),
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("rev"),
        )
    )
    cv = (
        F.sqrt(
            F.sum(F.col("q") * F.col("q")) / F.count("*")
            - F.avg("q") * F.avg("q")
        )
        / F.avg("q")
    )
    per_band = monthly.groupBy("band").agg(
        F.sum("rev").alias("rev"), cv.alias("cv")
    )
    wcum = Window.orderBy(F.col("rev").desc(), "band").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    labeled = per_band.select(
        "band",
        "rev",
        "cv",
        (F.sum("rev").over(wcum) / F.sum("rev").over(wall)).alias(
            "cum_share"
        ),
    ).select(
        "band",
        "rev",
        "cv",
        F.when(F.col("cum_share") <= 0.8, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C")
        .alias("abc"),
        F.when(F.col("cv") < 0.5, "X")
        .when(F.col("cv") < 1.0, "Y")
        .otherwise("Z")
        .alias("xyz"),
    )
    tot = per_band.agg(F.sum("rev").alias("tr"))
    return (
        labeled.crossJoin(F.broadcast(tot))
        .groupBy("abc", "xyz")
        .agg(
            F.count("*").cast("long").alias("n_bands"),
            F.round(F.sum("rev"), 2).alias("revenue"),
            F.round(F.sum("rev") / F.any_value("tr"), 6).alias(
                "revenue_share"
            ),
            F.round(F.avg("cv"), 6).alias("mean_cv"),
        )
    )


# ---------------------------------------------------------------------------
# X423 — mSPRT always-valid sequential test
# ---------------------------------------------------------------------------


@query(
    "q_msprt",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             sum(CASE WHEN user_id % 2 = 0 AND event_type = 'purchase'
                      THEN 1 ELSE 0 END) AS x0,
             sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n0,
             sum(CASE WHEN user_id % 2 = 1 AND event_type = 'purchase'
                      THEN 1 ELSE 0 END) AS x1,
             sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS n1
      FROM events GROUP BY 1
    ), cum AS (
      SELECT d,
             sum(x0) OVER w AS cx0, sum(n0) OVER w AS cn0,
             sum(x1) OVER w AS cx1, sum(n1) OVER w AS cn1
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    ), stats AS (
      SELECT d, cn0, cn1,
             cx1 * 1.0 / cn1 - cx0 * 1.0 / cn0 AS delta,
             (cx0 + cx1) * 1.0 / (cn0 + cn1) AS pp,
             ((cx0 + cx1) * 1.0 / (cn0 + cn1))
               * (1 - (cx0 + cx1) * 1.0 / (cn0 + cn1))
               * (1.0 / cn0 + 1.0 / cn1) AS v
      FROM cum WHERE cn0 >= 30 AND cn1 >= 30
    ), lam AS (
      SELECT d, cn0, cn1, delta, v,
             sqrt(v / (v + 0.01))
               * exp(delta * delta * 0.01 / (2 * v * (v + 0.01))) AS l
      FROM stats
    ), run AS (
      SELECT d, cn0, cn1, delta, l,
             max(l) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS lmax
      FROM lam
    )
    SELECT d, CAST(cn0 + cn1 AS BIGINT) AS n_cum,
           round(delta, 6) AS rate_diff,
           round(l, 6) AS likelihood_ratio,
           round(least(1.0, 1.0 / lmax), 6) AS always_valid_p,
           least(1.0, 1.0 / lmax) < 0.05 AS significant
    FROM run
    """,
)
def q_msprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X423 — mixture sequential probability ratio test (mSPRT, the
    always-valid inference behind industrial A/B platforms): per day,
    the cumulative two-proportion contrast's normal likelihood ratio
    against a N(0, τ=0.01) effect mixture, Λ = √(V/(V+τ))·
    exp(Δ²τ/(2V(V+τ))); the always-valid p is 1/max_t Λ_t — monotone,
    so the experimenter may PEEK every day without inflating error,
    which X199's fixed-n z-test forbids. Days with ≥30 obs per arm;
    one daily rollup, cumulative windows over days only."""
    e = load(spark, sf_dir, "events")
    arm0 = F.col("user_id") % 2 == 0
    pur = F.col("event_type") == "purchase"
    daily = e.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).agg(
        F.sum((arm0 & pur).cast("int")).alias("x0"),
        F.sum(arm0.cast("int")).alias("n0"),
        F.sum(((~arm0) & pur).cast("int")).alias("x1"),
        F.sum((~arm0).cast("int")).alias("n1"),
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select(
        "d",
        F.sum("x0").over(w).alias("cx0"),
        F.sum("n0").over(w).alias("cn0"),
        F.sum("x1").over(w).alias("cx1"),
        F.sum("n1").over(w).alias("cn1"),
    ).filter((F.col("cn0") >= 30) & (F.col("cn1") >= 30))
    delta = F.col("cx1") * 1.0 / F.col("cn1") - F.col("cx0") * 1.0 / F.col("cn0")
    pp = (F.col("cx0") + F.col("cx1")) * 1.0 / (F.col("cn0") + F.col("cn1"))
    v = pp * (1 - pp) * (1.0 / F.col("cn0") + 1.0 / F.col("cn1"))
    stats = cum.select(
        "d", "cn0", "cn1", delta.alias("delta"), v.alias("v")
    )
    tau = 0.01
    lam = stats.select(
        "d",
        "cn0",
        "cn1",
        "delta",
        (
            F.sqrt(F.col("v") / (F.col("v") + tau))
            * F.exp(
                F.col("delta")
                * F.col("delta")
                * tau
                / (2 * F.col("v") * (F.col("v") + tau))
            )
        ).alias("l"),
    )
    run = lam.withColumn("lmax", F.max("l").over(w))
    avp = F.least(F.lit(1.0), 1.0 / F.col("lmax"))
    return run.select(
        "d",
        (F.col("cn0") + F.col("cn1")).cast("long").alias("n_cum"),
        F.round("delta", 6).alias("rate_diff"),
        F.round("l", 6).alias("likelihood_ratio"),
        F.round(avp, 6).alias("always_valid_p"),
        (avp < 0.05).alias("significant"),
    )
