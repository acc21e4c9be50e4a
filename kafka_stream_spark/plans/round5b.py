"""Round-5 batch B: governance + classical-inference closure.

Six components the reference's analytics users reach for next once the
engine covers description and prediction: group-fairness audits
(X523), the exact small-sample independence test the chi-square/G-test
family approximates (X524 Fisher), a distribution-shape goodness-of-fit
sharper in the tails than KS/Jarque-Bera (X525 Anderson-Darling), the
assumption-free resampling significance test (X526 seeded permutation),
corpus collocation mining by Dunning's log-likelihood ratio (X527 — the
1993 Computational Linguistics classic), and personalized PageRank
(X528 — the random-walk-with-restart proximity primitive global
PageRank X74 cannot express).

All six are hash-gated against DuckDB oracles; cross-engine numeric
discipline follows the repo conventions (round sums — not ratios —
early so both engines derive every downstream double from identical
inputs; md5-based portable pseudo-randomness; name tie-breaks under
every rank/limit).

Reference parity note: the reference engine (kafka_stream/kafka_s.py)
has no statistics surface at all — these extend the mandated
training-data/analytics families (SURVEY §2.13-2.14).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import token_hash, token_hash_sql
from ..session import default_parallelism
from ..sources.tables import load
from .registry import query
from .round4o import _ERF_SQL
from .textlm import _BIGRAMS_SQL, _doc_bigrams

# ---------------------------------------------------------------------------
# shared normal-CDF helpers (Φ from the A&S 7.1.26 erf polynomial both
# engines already share via round4o._ERF_SQL)
# ---------------------------------------------------------------------------


def _phi(z: Column) -> Column:
    """Standard normal CDF Φ(z) = ½(1 + sign(z)·erf(|z|/√2)) as pure
    Column arithmetic — the signed-symmetry extension of round4o's
    one-sided polynomial (valid only for z ≥ 0)."""
    az = F.abs(z)
    t = 1 / (1 + 0.3275911 * az / F.sqrt(F.lit(2.0)))
    erf = 1 - (
        0.254829592 * t
        - 0.284496736 * F.pow(t, 2)
        + 1.421413741 * F.pow(t, 3)
        - 1.453152027 * F.pow(t, 4)
        + 1.061405429 * F.pow(t, 5)
    ) * F.exp(-(az * az) / 2)
    return 0.5 * (1 + F.when(z < 0, -1.0).otherwise(1.0) * erf)


def _phi_sql(z: str) -> str:
    """DuckDB twin of :func:`_phi` (same polynomial, same symmetry)."""
    return (
        f"(0.5 * (1 + (CASE WHEN ({z}) < 0 THEN -1.0 ELSE 1.0 END)"
        f" * {_ERF_SQL.format(z=f'abs({z})')}))"
    )


# ---------------------------------------------------------------------------
# X523 — group-fairness audit battery
# ---------------------------------------------------------------------------

#: deterministic classifier under audit: "high-spend" prediction vs the
#: "frequent finalized orders" outcome (both scale-invariant: per-customer
#: order count is ~10 at every SF).
_FAIR_SPEND = 2_500_000
_FAIR_NF = 4


@query(
    "q_fairness_metrics",
    oracle=f"""
    WITH cu AS (
      SELECT o_custkey,
             CASE WHEN sum(o_totalprice) >= {_FAIR_SPEND} THEN 1 ELSE 0 END
               AS pred,
             CASE WHEN count(*) FILTER (WHERE o_orderstatus = 'F')
                       >= {_FAIR_NF} THEN 1 ELSE 0 END AS actual
      FROM orders GROUP BY o_custkey
    ), j AS (
      SELECT c.c_mktsegment AS segment, cu.pred, cu.actual
      FROM cu JOIN customer c ON c.c_custkey = cu.o_custkey
    ), g AS (
      SELECT segment, count(*) AS n,
             sum(pred) AS pp, sum(actual) AS ap,
             sum(pred * actual) AS tp,
             sum(pred * (1 - actual)) AS fp
      FROM j GROUP BY segment
    ), r AS (
      SELECT segment, CAST(n AS BIGINT) AS n,
             round(pp * 1.0 / n, 6) AS sel_rate,
             round(tp * 1.0 / ap, 6) AS tpr,
             round(fp * 1.0 / (n - ap), 6) AS fpr,
             round(tp * 1.0 / pp, 6) AS precision_pp
      FROM g
    )
    SELECT segment, n, sel_rate, tpr, fpr, precision_pp,
           round(sel_rate / max(sel_rate) OVER (), 6) AS di_ratio
    FROM r
    """,
)
def q_fairness_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X523 — per-group fairness audit of a deterministic classifier
    (pred = lifetime spend ≥ 2.5M) against a ground-truth outcome
    (≥4 finalized orders), grouped by the protected-attribute stand-in
    c_mktsegment: selection rate (demographic parity), TPR (equal
    opportunity), FPR (equalized odds' second leg), precision
    (predictive parity), and the four-fifths-rule disparate-impact
    ratio vs the most-selected group.  The metric set is Hardt et
    al. 2016 / EEOC 80%-rule; every cell is a count ratio so both
    engines agree exactly (ratios rounded AFTER the integer counts).

    Scale: one groupBy(custkey) over facts, broadcast dim join, then a
    5-row aggregate + a window over 5 rows — fact-volume work is a
    single shuffle."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    cu = o.groupBy("o_custkey").agg(
        F.when(F.sum("o_totalprice") >= _FAIR_SPEND, 1)
        .otherwise(0)
        .alias("pred"),
        F.when(
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            >= _FAIR_NF,
            1,
        )
        .otherwise(0)
        .alias("actual"),
    )
    g = (
        cu.join(
            F.broadcast(c.select("c_custkey", "c_mktsegment")),
            cu.o_custkey == F.col("c_custkey"),
        )
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n"),
            F.sum("pred").alias("pp"),
            F.sum("actual").alias("ap"),
            F.sum(F.col("pred") * F.col("actual")).alias("tp"),
            F.sum(F.col("pred") * (1 - F.col("actual"))).alias("fp"),
        )
    )
    r = g.select(
        "segment",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("pp") / F.col("n"), 6).alias("sel_rate"),
        F.round(F.col("tp") / F.col("ap"), 6).alias("tpr"),
        F.round(F.col("fp") / (F.col("n") - F.col("ap")), 6).alias("fpr"),
        F.round(F.col("tp") / F.col("pp"), 6).alias("precision_pp"),
    )
    w = Window.partitionBy()
    return r.withColumn(
        "di_ratio",
        F.round(F.col("sel_rate") / F.max("sel_rate").over(w), 6),
    )


# ---------------------------------------------------------------------------
# X524 — Fisher's exact test (2×2, hypergeometric)
# ---------------------------------------------------------------------------


@query(
    "q_fisher_exact",
    oracle="""
    WITH t AS (
      SELECT count(*) AS n,
             count(*) FILTER (WHERE p_size > 25) AS r,
             count(*) FILTER (WHERE p_brand = 'Brand#13') AS c,
             count(*) FILTER (WHERE p_size > 25
                                AND p_brand = 'Brand#13') AS a
      FROM part
    ), p0 AS (
      SELECT t.*,
             list_sum(list_transform(generate_series(0, c - 1),
               i -> ln(n - r - i * 1.0) - ln(n - i * 1.0))) AS lnp0
      FROM t
    ), grid AS (
      SELECT p0.*, unnest(generate_series(0, least(r, c))) AS k FROM p0
    ), lp AS (
      SELECT k, a, n, r, c,
             lnp0 + sum(CASE WHEN k = 0 THEN 0.0
                        ELSE ln(r - k + 1.0) + ln(c - k + 1.0)
                             - ln(k * 1.0) - ln(n - r - c + k * 1.0) END)
               OVER (ORDER BY k
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS lnp
      FROM grid
    ), obs AS (SELECT lnp AS lnpobs FROM lp WHERE k = a)
    SELECT CAST(any_value(a) AS BIGINT) AS k11,
           CAST(any_value(r - a) AS BIGINT) AS k12,
           CAST(any_value(c - a) AS BIGINT) AS k21,
           CAST(any_value(n - r - c + a) AS BIGINT) AS k22,
           round(sum(CASE WHEN lnp <= (SELECT lnpobs FROM obs) + 1e-7
                          THEN exp(lnp) ELSE 0 END), 6) AS p_two_sided,
           round(sum(CASE WHEN k <= a THEN exp(lnp) ELSE 0 END), 6)
             AS p_left,
           round(sum(CASE WHEN k >= a THEN exp(lnp) ELSE 0 END), 6)
             AS p_right
    FROM lp
    """,
)
def q_fisher_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X524 — Fisher's EXACT 2×2 independence test (large size ×
    Brand#13 over part): the small-sample gold standard the engine's
    asymptotic family (X114 chi-square, X357 G-test) approximates.
    The full hypergeometric pmf is materialized over the support
    k = 0..min(r,c) WITHOUT factorials: ln P(0) is an O(c) log-sum and
    each subsequent term is the classic ratio recurrence
    P(k)/P(k-1) = (r-k+1)(c-k+1) / (k(n-r-c+k)) accumulated as ONE
    running-sum window over the support grid — O(min(r,c)) total work,
    no overflow at any n.  Two-sided p sums all outcomes no more
    likely than observed (the standard Fisher definition, with the
    conventional 1e-7 likelihood tolerance), plus both one-sided
    tails.

    Scale: the data pass is a single count-aggregate; the support grid
    is |k| ≈ min(margin) rows — micro work driven by four scalars, so
    the test costs one scan regardless of table size."""
    p = load(spark, sf_dir, "part")
    t = p.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("p_size") > 25, 1).otherwise(0)).alias("r"),
        F.sum(F.when(F.col("p_brand") == "Brand#13", 1).otherwise(0)).alias(
            "c"
        ),
        F.sum(
            F.when(
                (F.col("p_size") > 25) & (F.col("p_brand") == "Brand#13"), 1
            ).otherwise(0)
        ).alias("a"),
    )
    nn, rr, cc = F.col("n"), F.col("r"), F.col("c")
    p0 = t.withColumn(
        "lnp0",
        F.aggregate(
            F.sequence(F.lit(0), cc - 1),
            F.lit(0.0),
            lambda acc, i: acc
            + F.log(nn - rr - i.cast("double"))
            - F.log(nn - i.cast("double")),
        ),
    )
    grid = p0.select(
        "*", F.explode(F.sequence(F.lit(0), F.least(rr, cc))).alias("k")
    )
    k = F.col("k")
    incr = F.when(k == 0, F.lit(0.0)).otherwise(
        F.log((rr - k + 1).cast("double"))
        + F.log((cc - k + 1).cast("double"))
        - F.log(k.cast("double"))
        - F.log((nn - rr - cc + k).cast("double"))
    )
    w = Window.orderBy("k").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    lp = grid.withColumn("lnp", F.col("lnp0") + F.sum(incr).over(w))
    obs = lp.filter(k == F.col("a")).select(F.col("lnp").alias("lnpobs"))
    return lp.crossJoin(F.broadcast(obs)).agg(
        F.first("a").cast("long").alias("k11"),
        F.first(rr - F.col("a")).cast("long").alias("k12"),
        F.first(cc - F.col("a")).cast("long").alias("k21"),
        F.first(nn - rr - cc + F.col("a")).cast("long").alias("k22"),
        F.round(
            F.sum(
                F.when(
                    F.col("lnp") <= F.col("lnpobs") + 1e-7, F.exp("lnp")
                ).otherwise(0.0)
            ),
            6,
        ).alias("p_two_sided"),
        F.round(
            F.sum(F.when(k <= F.col("a"), F.exp("lnp")).otherwise(0.0)), 6
        ).alias("p_left"),
        F.round(
            F.sum(F.when(k >= F.col("a"), F.exp("lnp")).otherwise(0.0)), 6
        ).alias("p_right"),
    )


# ---------------------------------------------------------------------------
# X525 — Anderson-Darling normality test
# ---------------------------------------------------------------------------


@query(
    "q_anderson_darling",
    oracle=f"""
    WITH x AS (
      SELECT o_orderpriority AS grp, o_orderkey,
             round(ln(o_totalprice), 8) AS x8
      FROM orders
    ), s AS (
      SELECT grp, count(*) AS n,
             round(sum(x8), 4) AS s1, round(sum(x8 * x8), 4) AS s2
      FROM x GROUP BY grp
    ), ms AS (
      SELECT grp, n, s1 / n AS m,
             sqrt(greatest((s2 - s1 * s1 / n) / (n - 1), 1e-12)) AS sd
      FROM s
    ), z AS (
      SELECT x.grp, x.o_orderkey, ms.n,
             round((x.x8 - ms.m) / ms.sd, 6) AS z
      FROM x JOIN ms ON x.grp = ms.grp
    ), ph AS (
      SELECT grp, n, z,
             row_number() OVER (PARTITION BY grp ORDER BY z, o_orderkey)
               AS i,
             least(greatest({_phi_sql('z')}, 1e-12), 1 - 1e-12) AS phi
      FROM z
    ), terms AS (
      SELECT grp, n,
             (2.0 * i - 1) * ln(phi)
             + (2.0 * (n - i) + 1) * ln(1 - phi) AS t
      FROM ph
    ), agg AS (
      SELECT grp, any_value(n) AS n,
             -any_value(n) - sum(t) / any_value(n) AS a2
      FROM terms GROUP BY grp
    )
    SELECT grp AS o_orderpriority, CAST(n AS BIGINT) AS n,
           round(a2, 4) AS a2,
           round(a2 * (1 + 0.75 / n + 2.25 / (n * n)), 4) AS a2_star,
           round(a2 * (1 + 0.75 / n + 2.25 / (n * n)), 4) > 0.787
             AS normal_rejected
    FROM agg
    """,
)
def q_anderson_darling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X525 — Anderson-Darling goodness-of-fit for normality of
    ln(o_totalprice) per priority class:
    A² = −n − (1/n)·Σ[(2i−1)lnΦ(z₍ᵢ₎) + (2(n−i)+1)ln(1−Φ(z₍ᵢ₎))]
    over the ascending order statistics — the tail-weighted EDF test
    (sharper than X116 KS / X250 Jarque-Bera exactly where training-
    data quality screens care: the tails), with the Stephens small-
    sample factor and the 1% critical value 0.787.

    Cross-engine discipline: the MOMENT SUMS are rounded (4 dp) and
    every downstream double (mean, sd, z) is then derived from
    identical inputs by identical arithmetic — rounding ratios instead
    would leave both engines rounding different ULP-noise toward
    different grid cells.  Φ is the shared A&S polynomial extended by
    sign symmetry (_phi/_phi_sql), probabilities clamped to
    [1e-12, 1−1e-12] before ln.

    Scale: two fact passes (moments, then z+rank) with the rank
    partitioned per group — each group's sort is shard-sized; the
    statistic itself is a per-group scalar."""
    o = load(spark, sf_dir, "orders")
    x = o.select(
        F.col("o_orderpriority").alias("grp"),
        "o_orderkey",
        F.round(F.log("o_totalprice"), 8).alias("x8"),
    )
    s = x.groupBy("grp").agg(
        F.count("*").alias("n"),
        F.round(F.sum("x8"), 4).alias("s1"),
        F.round(F.sum(F.col("x8") * F.col("x8")), 4).alias("s2"),
    )
    ms = s.select(
        "grp",
        "n",
        (F.col("s1") / F.col("n")).alias("m"),
        F.sqrt(
            F.greatest(
                (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
                / (F.col("n") - 1),
                F.lit(1e-12),
            )
        ).alias("sd"),
    )
    z = x.join(F.broadcast(ms), "grp").select(
        "grp",
        "o_orderkey",
        "n",
        F.round((F.col("x8") - F.col("m")) / F.col("sd"), 6).alias("z"),
    )
    wi = Window.partitionBy("grp").orderBy("z", "o_orderkey")
    ph = z.select(
        "grp",
        "n",
        F.row_number().over(wi).alias("i"),
        F.least(
            F.greatest(_phi(F.col("z")), F.lit(1e-12)), F.lit(1 - 1e-12)
        ).alias("phi"),
    )
    terms = ph.select(
        "grp",
        "n",
        (
            (2.0 * F.col("i") - 1) * F.log("phi")
            + (2.0 * (F.col("n") - F.col("i")) + 1) * F.log(1 - F.col("phi"))
        ).alias("t"),
    )
    agg = terms.groupBy("grp").agg(
        F.first("n").alias("n"),
        (-F.first("n") - F.sum("t") / F.first("n")).alias("a2"),
    )
    corr = F.col("a2") * (
        1 + 0.75 / F.col("n") + 2.25 / (F.col("n") * F.col("n"))
    )
    return agg.select(
        F.col("grp").alias("o_orderpriority"),
        F.col("n").cast("long").alias("n"),
        F.round("a2", 4).alias("a2"),
        F.round(corr, 4).alias("a2_star"),
        (F.round(corr, 4) > 0.787).alias("normal_rejected"),
    )


# ---------------------------------------------------------------------------
# X526 — seeded permutation (randomization) test
# ---------------------------------------------------------------------------

_N_PERMS = 99


@query(
    "q_permutation_test",
    oracle=f"""
    WITH base AS (
      SELECT event_id, event_type, round(value, 6) AS v
      FROM events WHERE event_type IN ('purchase', 'view')
    ), sz AS (
      SELECT count(*) FILTER (WHERE event_type = 'purchase') AS na,
             count(*) FILTER (WHERE event_type = 'view') AS nb
      FROM base
    ), obs AS (
      SELECT sum(CASE WHEN event_type = 'purchase' THEN v END) / sz.na
             - sum(CASE WHEN event_type = 'view' THEN v END) / sz.nb
               AS d
      FROM base CROSS JOIN sz GROUP BY sz.na, sz.nb
    ), perm AS (
      SELECT gs.p, b.v,
             {token_hash_sql(
                 "CAST(b.event_id AS VARCHAR) || ':' "
                 "|| CAST(gs.p AS VARCHAR)")} AS h,
             b.event_id
      FROM base b CROSS JOIN generate_series(1, {_N_PERMS}) AS gs(p)
    ), ranked AS (
      SELECT p, v,
             row_number() OVER (PARTITION BY p ORDER BY h, event_id)
               AS rk
      FROM perm
    ), diffs AS (
      SELECT p,
             sum(CASE WHEN rk <= sz.na THEN v END) / sz.na
             - sum(CASE WHEN rk > sz.na THEN v END) / sz.nb AS d
      FROM ranked CROSS JOIN sz GROUP BY p, sz.na, sz.nb
    )
    SELECT CAST(sz.na AS BIGINT) AS n_a, CAST(sz.nb AS BIGINT) AS n_b,
           round(obs.d, 6) AS obs_diff,
           CAST({_N_PERMS} AS BIGINT) AS n_perms,
           round((1.0 + count(CASE WHEN abs(diffs.d) >= abs(obs.d) - 1e-9
                                   THEN 1 END))
                 / (1 + {_N_PERMS}), 6) AS p_value
    FROM diffs CROSS JOIN obs CROSS JOIN sz
    GROUP BY sz.na, sz.nb, obs.d
    """,
)
def q_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X526 — two-sample permutation test (purchase vs view event
    values), the assumption-free companion to X196 Welch's t: the
    group labels are re-dealt {_N_PERMS} times and the observed mean
    difference is ranked against the permutation distribution,
    p = (1 + #{{|d_π| ≥ |d_obs|}}) / (1 + P).

    Determinism without RNG state: permutation π is realized by
    ranking rows on the portable 60-bit md5 hash of (event_id, π-index)
    — functions/hashing.token_hash, identical in both engines — and
    labeling the first n_a rows 'treatment', which preserves the exact
    group sizes like a true shuffle.  Values pre-rounded to 6 dp so
    every per-perm sum is a 1e-6-grid multiple in both engines; the
    1e-9 comparison tolerance absorbs division ULP.

    Scale: the P-fold expansion is the scale lever — P×n rows,
    partitioned BY PERMUTATION so each rank is an independent
    shard-sized sort; P is a constant (99), so the whole test is
    O(P·n) with perfect parallelism across permutations."""
    ev = load(spark, sf_dir, "events")
    # the P-fold explode + per-row md5 below (P·n hashes) is the cost
    # and would otherwise run on the single scan split (guide §2.6)
    base = (
        ev.filter(F.col("event_type").isin("purchase", "view"))
        .select("event_id", "event_type", F.round("value", 6).alias("v"))
        .repartition(default_parallelism())
    )
    sz = base.agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "na"
        ),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias(
            "nb"
        ),
    )
    obs = (
        base.crossJoin(F.broadcast(sz))
        .groupBy("na", "nb")
        .agg(
            (
                F.sum(F.when(F.col("event_type") == "purchase", F.col("v")))
                / F.first("na")
                - F.sum(F.when(F.col("event_type") == "view", F.col("v")))
                / F.first("nb")
            ).alias("d")
        )
        .select("d")
    )
    perm = base.select(
        "event_id",
        "v",
        F.explode(F.sequence(F.lit(1), F.lit(_N_PERMS))).alias("p"),
    ).select(
        "p",
        "v",
        "event_id",
        token_hash(
            F.concat(
                F.col("event_id").cast("string"),
                F.lit(":"),
                F.col("p").cast("string"),
            )
        ).alias("h"),
    )
    rk = Window.partitionBy("p").orderBy("h", "event_id")
    ranked = perm.select(
        "p", "v", F.row_number().over(rk).alias("rk")
    ).crossJoin(F.broadcast(sz))
    diffs = ranked.groupBy("p").agg(
        (
            F.sum(F.when(F.col("rk") <= F.col("na"), F.col("v")))
            / F.first("na")
            - F.sum(F.when(F.col("rk") > F.col("na"), F.col("v")))
            / F.first("nb")
        ).alias("d")
    )
    return (
        diffs.crossJoin(F.broadcast(obs.select(F.col("d").alias("dobs"))))
        .crossJoin(F.broadcast(sz))
        .groupBy("na", "nb", "dobs")
        .agg(
            F.count(
                F.when(
                    F.abs(F.col("d")) >= F.abs(F.col("dobs")) - 1e-9, 1
                )
            ).alias("cnt")
        )
        .select(
            F.col("na").cast("long").alias("n_a"),
            F.col("nb").cast("long").alias("n_b"),
            F.round("dobs", 6).alias("obs_diff"),
            F.lit(_N_PERMS).cast("long").alias("n_perms"),
            F.round((1.0 + F.col("cnt")) / (1 + _N_PERMS), 6).alias(
                "p_value"
            ),
        )
    )


# ---------------------------------------------------------------------------
# X527 — collocation mining (Dunning log-likelihood ratio)
# ---------------------------------------------------------------------------

_COLL_MIN = 5
_COLL_TOP = 20


@query(
    "q_collocations",
    oracle=f"""
    WITH {_BIGRAMS_SQL},
    c12 AS (SELECT w1, w2, count(*) AS k11 FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
    c2 AS (SELECT w2, count(*) AS c2 FROM bg GROUP BY w2),
    nn AS (SELECT count(*) AS nb FROM bg),
    cells AS (
      SELECT c12.w1, c12.w2, k11,
             c1.c1 - k11 AS k12, c2.c2 - k11 AS k21,
             nb - c1.c1 - c2.c2 + k11 AS k22,
             c1.c1 AS r1, c2.c2 AS cc1, nb
      FROM c12 JOIN c1 ON c12.w1 = c1.w1
               JOIN c2 ON c12.w2 = c2.w2
               CROSS JOIN nn
      WHERE k11 >= {_COLL_MIN}
    ), g AS (
      SELECT w1, w2, CAST(k11 AS BIGINT) AS k11,
             round(2 * (
               (CASE WHEN k11 > 0
                     THEN k11 * ln(k11 * 1.0 * nb / (r1 * cc1)) ELSE 0 END)
             + (CASE WHEN k12 > 0
                     THEN k12 * ln(k12 * 1.0 * nb / (r1 * (nb - cc1)))
                     ELSE 0 END)
             + (CASE WHEN k21 > 0
                     THEN k21 * ln(k21 * 1.0 * nb / ((nb - r1) * cc1))
                     ELSE 0 END)
             + (CASE WHEN k22 > 0
                     THEN k22 * ln(k22 * 1.0 * nb
                                   / ((nb - r1) * (nb - cc1)))
                     ELSE 0 END)), 6) AS g2
      FROM cells
    )
    SELECT w1, w2, k11, g2 FROM g
    ORDER BY g2 DESC, w1, w2 LIMIT {_COLL_TOP}
    """,
)
def q_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X527 — collocation extraction by Dunning's log-likelihood ratio
    (Dunning 1993): for each adjacent bigram, G² = 2·Σ O·ln(O/E) over
    the 2×2 (w1-first? × w2-second?) contingency of the bigram stream —
    the association score that, unlike raw PMI (X180), does not blow up
    on rare pairs and is χ²-distributed under independence.  Top-20 by
    G² with lexicographic tie-break; O·ln(O/E) terms with O=0
    contribute 0 by continuity.

    All inputs are integer counts, so both engines evaluate the same
    closed-form doubles; ranking is on the 6-dp rounded score.  Scale:
    token-keyed aggregates (bigram, margin-left, margin-right) + two
    key-aligned joins — the standard distributed count-and-join shape,
    no quadratic pair stage anywhere."""
    bg = _doc_bigrams(spark, sf_dir)
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("k11"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    c2 = bg.groupBy("w2").agg(F.count("*").alias("c2"))
    nn = bg.agg(F.count("*").alias("nb"))
    cells = (
        c12.filter(F.col("k11") >= _COLL_MIN)
        .join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(nn))
    )
    k11, c1c, c2c, nb = (
        F.col("k11"),
        F.col("c1"),
        F.col("c2"),
        F.col("nb"),
    )
    k12 = c1c - k11
    k21 = c2c - k11
    k22 = nb - c1c - c2c + k11

    def term(o: Column, e_num: Column, e_den: Column) -> Column:
        return F.when(
            o > 0, o * F.log(o * 1.0 * e_num / e_den)
        ).otherwise(0.0)

    g2 = F.round(
        2
        * (
            term(k11, nb, c1c * c2c)
            + term(k12, nb, c1c * (nb - c2c))
            + term(k21, nb, (nb - c1c) * c2c)
            + term(k22, nb, (nb - c1c) * (nb - c2c))
        ),
        6,
    )
    return (
        cells.select(
            "w1", "w2", k11.cast("long").alias("k11"), g2.alias("g2")
        )
        .orderBy(F.desc("g2"), "w1", "w2")
        .limit(_COLL_TOP)
    )


# ---------------------------------------------------------------------------
# X528 — personalized PageRank (random walk with restart)
# ---------------------------------------------------------------------------


def _ppr_iter_sql(prev: str, out: str) -> str:
    """One unrolled PPR iteration: teleport mass returns to seeds."""
    return f"""
    m_{out} AS (
      SELECT s.b AS node, sum(r.rank / dd.outdeg) AS mass
      FROM sym s JOIN {prev} r ON s.a = r.a JOIN deg dd ON s.a = dd.a
      GROUP BY s.b),
    {out} AS (
      SELECT d.a,
             (CASE WHEN se.a IS NOT NULL
                   THEN CAST(0.15 AS DOUBLE) / (SELECT s FROM ns)
                   ELSE CAST(0 AS DOUBLE) END)
             + CAST(0.85 AS DOUBLE) * coalesce(m.mass, 0) AS rank
      FROM deg d LEFT JOIN m_{out} m ON d.a = m.node
                 LEFT JOIN seeds se ON d.a = se.a)"""


@query(
    "q_ppr",
    oracle=f"""
    WITH e0 AS (
      SELECT DISTINCT 's' || CAST(l.l_suppkey AS VARCHAR) AS a,
                      'c' || CAST(o.o_custkey AS VARCHAR) AS b
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    sym AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
    deg AS (SELECT a, count(*) AS outdeg FROM sym GROUP BY a),
    sd AS (SELECT DISTINCT 'c' || CAST(c_custkey AS VARCHAR) AS a
           FROM customer WHERE c_mktsegment = 'BUILDING'),
    seeds AS (SELECT deg.a FROM deg JOIN sd ON deg.a = sd.a),
    ns AS (SELECT count(*) AS s FROM seeds),
    r0 AS (SELECT deg.a,
                  CASE WHEN se.a IS NOT NULL
                       THEN CAST(1.0 AS DOUBLE) / (SELECT s FROM ns)
                       ELSE CAST(0 AS DOUBLE) END AS rank
           FROM deg LEFT JOIN seeds se ON deg.a = se.a),
    {_ppr_iter_sql('r0', 'r1')},
    {_ppr_iter_sql('r1', 'r2')},
    {_ppr_iter_sql('r2', 'r3')}
    SELECT a AS node, round(rank, 8) AS rank FROM r3
    """,
)
def q_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X528 — personalized PageRank / random walk with restart
    (3 iterations, d=0.85) over the supplier↔customer shipment graph,
    seeded at the BUILDING-segment customers: teleport mass returns to
    the SEED set, so rank measures proximity to the seeds — the
    recsys/graph-locality primitive (operators/graph.
    personalized_pagerank) that global PageRank (X74, uniform
    teleport) cannot express.  The oracle unrolls all three
    iterations, pinning every intermediate distribution.

    Scale shape identical to X74: per round one edge⋈rank join + one
    node-keyed aggregate, state one double per node, edges scanned not
    mutated; the seed vector is a broadcast-sized dimension."""
    from ..operators.graph import personalized_pagerank

    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
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
    seeds = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("node")
    )
    ranks = personalized_pagerank(edges, seeds, iterations=3, damping=0.85)
    return ranks.select("node", F.round("rank", 8).alias("rank"))
