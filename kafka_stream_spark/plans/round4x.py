"""Round-4 batch X: preference ranking + multi-rater agreement
(X441-X442).

Bradley-Terry is the pairwise-preference model behind modern RLHF
reward modeling (rank items from win/loss comparisons, Hunter's MM
iteration); Fleiss' kappa generalizes X242's two-rater Cohen kappa to
any number of raters — the agreement gate before treating an ensemble
of labelers (human or heuristic) as ground truth. Both are k-row
algebra after one collapse of the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load
from .registry import query

# ---------------------------------------------------------------------------
# X441 — Bradley-Terry preference strengths
# ---------------------------------------------------------------------------


@query(
    "q_bradley_terry",
    oracle="""
    WITH lines AS (
      SELECT l_orderkey AS ok, l_partkey % 20 AS band,
             sum(l_extendedprice * (1 - l_discount)) AS rev
      FROM lineitem GROUP BY 1, 2
    ), matches AS (
      SELECT CASE WHEN a.rev > b.rev THEN a.band
                  WHEN a.rev < b.rev THEN b.band
                  ELSE least(a.band, b.band) END AS winner,
             CASE WHEN a.rev > b.rev THEN b.band
                  WHEN a.rev < b.rev THEN a.band
                  ELSE greatest(a.band, b.band) END AS loser
      FROM lines a JOIN lines b
        ON a.ok = b.ok AND a.band < b.band
    ), nw AS (
      SELECT winner AS i, loser AS j, count(*) AS w
      FROM matches GROUP BY 1, 2
    ), pairs AS (
      SELECT least(i, j) AS i, greatest(i, j) AS j, sum(w) AS nij
      FROM nw GROUP BY 1, 2
    ), npair AS (
      SELECT i, j, nij FROM pairs
      UNION ALL SELECT j, i, nij FROM pairs
    ), wins AS (SELECT i, sum(w) AS wi FROM nw GROUP BY i),
    w0 AS (SELECT i, 1.0 AS w FROM wins),
    w1r AS (
      SELECT n.i, any_value(wn.wi)
               / sum(n.nij / (wa.w + wb.w)) AS w
      FROM npair n
      JOIN w0 wa ON n.i = wa.i JOIN w0 wb ON n.j = wb.i
      JOIN wins wn ON n.i = wn.i
      GROUP BY n.i
    ), w1 AS (SELECT i, w * (SELECT count(*) FROM w1r)
                       / (SELECT sum(w) FROM w1r) AS w FROM w1r),
    w2r AS (
      SELECT n.i, any_value(wn.wi)
               / sum(n.nij / (wa.w + wb.w)) AS w
      FROM npair n
      JOIN w1 wa ON n.i = wa.i JOIN w1 wb ON n.j = wb.i
      JOIN wins wn ON n.i = wn.i
      GROUP BY n.i
    ), w2 AS (SELECT i, w * (SELECT count(*) FROM w2r)
                       / (SELECT sum(w) FROM w2r) AS w FROM w2r),
    w3r AS (
      SELECT n.i, any_value(wn.wi)
               / sum(n.nij / (wa.w + wb.w)) AS w
      FROM npair n
      JOIN w2 wa ON n.i = wa.i JOIN w2 wb ON n.j = wb.i
      JOIN wins wn ON n.i = wn.i
      GROUP BY n.i
    ), w3 AS (SELECT i, w * (SELECT count(*) FROM w3r)
                       / (SELECT sum(w) FROM w3r) AS w FROM w3r),
    nm AS (SELECT i, sum(nij) AS mi FROM npair GROUP BY i)
    SELECT CAST(w3.i AS BIGINT) AS band,
           CAST(wins.wi AS BIGINT) AS n_wins,
           CAST(nm.mi AS BIGINT) AS n_matches,
           round(w3.w, 6) AS bt_strength,
           round(wins.wi * 1.0 / nm.mi, 6) AS raw_win_rate
    FROM w3 JOIN wins ON w3.i = wins.i JOIN nm ON w3.i = nm.i
    """,
)
def q_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X441 — Bradley-Terry preference strengths over part bands from
    within-order revenue 'matches' (higher line revenue wins, ties to
    the lower band): three unrolled rounds of Hunter's MM iteration
    w_i ← W_i / Σ_j N_ij/(w_i+w_j), mean-normalized each round — the
    model RLHF reward heads fit to human preference pairs, and the
    principled replacement for the raw win rate it is printed next to
    (BT handles unbalanced schedules; win rate doesn't). Matches come
    from one per-order rollup + a band self-join per order; every MM
    round is a k²-row join."""
    lines = (
        load(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_orderkey").alias("ok"),
            (F.col("l_partkey") % 20).alias("band"),
        )
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("rev")
        )
    )
    a = lines.select("ok", F.col("band").alias("ba"), F.col("rev").alias("ra"))
    b = lines.select("ok", F.col("band").alias("bb"), F.col("rev").alias("rb"))
    m = a.join(b, "ok").filter(F.col("ba") < F.col("bb"))
    winner = (
        F.when(F.col("ra") > F.col("rb"), F.col("ba"))
        .when(F.col("ra") < F.col("rb"), F.col("bb"))
        .otherwise(F.least("ba", "bb"))
    )
    loser = (
        F.when(F.col("ra") > F.col("rb"), F.col("bb"))
        .when(F.col("ra") < F.col("rb"), F.col("ba"))
        .otherwise(F.greatest("ba", "bb"))
    )
    nw = (
        m.select(winner.alias("i"), loser.alias("j"))
        .groupBy("i", "j")
        .agg(F.count("*").alias("w"))
        .localCheckpoint(eager=True)
    )
    pairs = (
        nw.select(
            F.least("i", "j").alias("i"),
            F.greatest("i", "j").alias("j"),
            "w",
        )
        .groupBy("i", "j")
        .agg(F.sum("w").alias("nij"))
    )
    npair = pairs.unionByName(
        pairs.select(
            F.col("j").alias("i"), F.col("i").alias("j"), "nij"
        )
    ).localCheckpoint(eager=True)
    wins = nw.groupBy("i").agg(F.sum("w").alias("wi"))
    w = wins.select("i", F.lit(1.0).alias("w"))
    for _ in range(3):
        wa = w.select(F.col("i"), F.col("w").alias("wia"))
        wb = w.select(F.col("i").alias("j"), F.col("w").alias("wib"))
        raw = (
            npair.join(wa, "i")
            .join(wb, "j")
            .groupBy("i")
            .agg(
                F.sum(
                    F.col("nij") / (F.col("wia") + F.col("wib"))
                ).alias("den")
            )
            .join(wins, "i")
            .select("i", (F.col("wi") / F.col("den")).alias("w"))
        )
        norm = raw.agg(
            F.count("*").alias("k"), F.sum("w").alias("sw")
        )
        w = raw.crossJoin(F.broadcast(norm)).select(
            "i", (F.col("w") * F.col("k") / F.col("sw")).alias("w")
        )
    nm = npair.groupBy("i").agg(F.sum("nij").alias("mi"))
    return (
        w.join(wins, "i")
        .join(nm, "i")
        .select(
            F.col("i").cast("long").alias("band"),
            F.col("wi").cast("long").alias("n_wins"),
            F.col("mi").cast("long").alias("n_matches"),
            F.round("w", 6).alias("bt_strength"),
            F.round(F.col("wi") * 1.0 / F.col("mi"), 6).alias(
                "raw_win_rate"
            ),
        )
    )


# ---------------------------------------------------------------------------
# X442 — Fleiss' kappa
# ---------------------------------------------------------------------------


@query(
    "q_fleiss_kappa",
    oracle="""
    WITH items AS (
      SELECT user_id, date_trunc('day', ts) AS d,
             count(*) AS ne, sum(value) AS tv,
             count(DISTINCT event_type) AS nt
      FROM events GROUP BY 1, 2
    ), rated AS (
      SELECT user_id, d,
             CASE WHEN ne <= 1 THEN 'low' WHEN ne <= 3 THEN 'mid'
                  ELSE 'high' END AS r1,
             CASE WHEN tv <= 15 THEN 'low' WHEN tv <= 45 THEN 'mid'
                  ELSE 'high' END AS r2,
             CASE WHEN nt <= 1 THEN 'low' WHEN nt <= 2 THEN 'mid'
                  ELSE 'high' END AS r3
      FROM items
    ), long AS (
      SELECT user_id, d, r1 AS cat FROM rated
      UNION ALL SELECT user_id, d, r2 FROM rated
      UNION ALL SELECT user_id, d, r3 FROM rated
    ), cell AS (
      SELECT user_id, d, cat, count(*) AS nij FROM long GROUP BY 1, 2, 3
    ), pi AS (
      SELECT user_id, d,
             (sum(nij * nij) - 3.0) / (3.0 * 2.0) AS p_i
      FROM cell GROUP BY user_id, d
    ), pbar AS (SELECT avg(p_i) AS pb, count(*) AS n FROM pi),
    pj AS (
      SELECT cat, sum(nij) AS nj FROM cell GROUP BY cat
    ), pe AS (
      SELECT sum(pow(nj / (3.0 * (SELECT n FROM pbar)), 2)) AS pe
      FROM pj
    )
    SELECT CAST(pbar.n AS BIGINT) AS n_items,
           3 AS n_raters,
           round(pbar.pb, 6) AS p_bar,
           round(pe.pe, 6) AS p_expected,
           round((pbar.pb - pe.pe) / (1 - pe.pe), 6) AS fleiss_kappa
    FROM pbar CROSS JOIN pe
    """,
)
def q_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X442 — Fleiss' kappa across three deterministic session raters
    (activity-count, value, and breadth heuristics each grade every
    user-day low/mid/high): P_i = (Σn_ij² − n)/(n(n−1)) per item,
    κ = (P̄ − P_e)/(1 − P_e) — the any-number-of-raters agreement
    coefficient X242's two-rater Cohen kappa can't give, and the
    ensemble-labeler consistency gate a weak-supervision pipeline
    checks before majority-voting labels. One item rollup, one
    (item × category) cell table, scalar algebra after."""
    items = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", F.date_trunc("day", "ts").alias("d"))
        .agg(
            F.count("*").alias("ne"),
            F.sum("value").alias("tv"),
            F.countDistinct("event_type").alias("nt"),
        )
    )
    r1 = (
        F.when(F.col("ne") <= 1, "low")
        .when(F.col("ne") <= 3, "mid")
        .otherwise("high")
    )
    r2 = (
        F.when(F.col("tv") <= 15, "low")
        .when(F.col("tv") <= 45, "mid")
        .otherwise("high")
    )
    r3 = (
        F.when(F.col("nt") <= 1, "low")
        .when(F.col("nt") <= 2, "mid")
        .otherwise("high")
    )
    rated = items.select(
        "user_id", "d", r1.alias("r1"), r2.alias("r2"), r3.alias("r3")
    )
    long = (
        rated.select("user_id", "d", F.col("r1").alias("cat"))
        .unionAll(rated.select("user_id", "d", F.col("r2").alias("cat")))
        .unionAll(rated.select("user_id", "d", F.col("r3").alias("cat")))
    )
    cell = long.groupBy("user_id", "d", "cat").agg(
        F.count("*").alias("nij")
    ).localCheckpoint(eager=True)
    pi = cell.groupBy("user_id", "d").agg(
        ((F.sum(F.col("nij") * F.col("nij")) - 3.0) / 6.0).alias("p_i")
    )
    pbar = pi.agg(F.avg("p_i").alias("pb"), F.count("*").alias("n"))
    pj = cell.groupBy("cat").agg(F.sum("nij").alias("nj"))
    pe = pj.crossJoin(F.broadcast(pbar)).agg(
        F.sum(
            F.pow(F.col("nj") / (3.0 * F.col("n")), 2)
        ).alias("pe")
    )
    return pbar.crossJoin(F.broadcast(pe)).select(
        F.col("n").cast("long").alias("n_items"),
        F.lit(3).alias("n_raters"),
        F.round("pb", 6).alias("p_bar"),
        F.round("pe", 6).alias("p_expected"),
        F.round(
            (F.col("pb") - F.col("pe")) / (1 - F.col("pe")), 6
        ).alias("fleiss_kappa"),
    )
