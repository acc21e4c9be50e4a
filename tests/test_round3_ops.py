"""Property tests for the round-3 operator batches — the invariants
the DuckDB oracle cannot see (completeness of blocking, DBSCAN role
semantics, SSSP optimality vs brute force)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kafka_stream_spark.plans.geo import (
    _points,
    q_dbscan,
    q_geo_radius_join,
)
from kafka_stream_spark.plans.graph_ext import _weighted_edges, q_sssp
from kafka_stream_spark.plans.stats_ext import q_gini, q_kaplan_meier
from kafka_stream_spark.plans.timeseries_ext import q_holt_forecast

SF = "/root/testdata/sf0.001"


def _haversine_py(lat1, lon1, lat2, lon2):
    rl1, rl2 = math.radians(lat1), math.radians(lat2)
    dlat = math.radians(lat2 - lat1) / 2
    dlon = math.radians(lon2 - lon1) / 2
    a = math.sin(dlat) ** 2 + math.cos(rl1) * math.cos(rl2) * math.sin(dlon) ** 2
    return 2 * 6371.0 * math.asin(math.sqrt(a))


def test_radius_join_blocking_is_complete(spark):
    """Cell blocking must find EVERY pair within 100 km — compare
    against the O(n²) python brute force at sf0.001 (150 points)."""
    pts = {r.k: (r.lat, r.lon) for r in _points(spark, SF).collect()}
    brute = set()
    keys = sorted(pts)
    for i, a in enumerate(keys):
        for b in keys[i + 1 :]:
            d = round(_haversine_py(*pts[a], *pts[b]), 3)
            if d <= 100.0:
                brute.add((a, b))
    got = {
        (r.k1, r.k2) for r in q_geo_radius_join(spark, SF).collect()
    }
    assert got == brute


def test_dbscan_roles_are_consistent(spark):
    rows = q_dbscan(spark, SF).collect()
    by_role = {}
    for r in rows:
        by_role.setdefault(r.role, []).append(r)
    # every point labeled exactly once
    assert len(rows) == len({r.k for r in rows})
    # noise has cluster -1; core/border have a real cluster id
    assert all(r.cluster == -1 for r in by_role.get("noise", []))
    assert all(r.cluster >= 0 for r in by_role.get("core", []))
    assert all(r.cluster >= 0 for r in by_role.get("border", []))
    # cluster label is the min core member id (CC fixpoint)
    clusters = {}
    for r in by_role.get("core", []):
        clusters.setdefault(r.cluster, []).append(r.k)
    for label, members in clusters.items():
        assert label == min(members)
    # deterministic: rerun yields identical labeling
    again = sorted(map(tuple, q_dbscan(spark, SF).collect()))
    assert sorted(map(tuple, rows)) == again


def test_sssp_matches_bruteforce_bellman_ford(spark):
    edges = _weighted_edges(spark, SF).collect()
    adj = {}
    for r in edges:
        adj.setdefault(r.a, []).append((r.b, float(r.w)))
    dist = {2: 0.0}
    for _ in range(4):
        nxt = dict(dist)
        for u, d in dist.items():
            for v, w in adj.get(u, []):
                if d + w < nxt.get(v, float("inf")):
                    nxt[v] = d + w
        dist = nxt
    got = {r.v: r.dist for r in q_sssp(spark, SF).collect()}
    assert got.keys() == dist.keys()
    for v, d in dist.items():
        assert got[v] == pytest.approx(round(d, 4), abs=1e-9)


def test_gini_bounds_and_known_value(spark):
    for r in q_gini(spark, SF).collect():
        assert 0.0 <= r.gini < 1.0


def test_kaplan_meier_monotone_nonincreasing(spark):
    rows = sorted(q_kaplan_meier(spark, SF).collect(), key=lambda r: r.t)
    surv = [r.survival for r in rows]
    assert all(a >= b for a, b in zip(surv, surv[1:]))
    assert all(0.0 <= s <= 1.0 for s in surv)
    # risk set shrinks over time
    risk = [r.n_risk for r in rows]
    assert all(a >= b for a, b in zip(risk, risk[1:]))


def test_holt_forecast_linear_extrapolation(spark):
    for r in q_holt_forecast(spark, SF).collect():
        # forecast_h = level + h*trend by construction
        assert r.forecast_1 == pytest.approx(
            round(r.level + r.trend, 2), abs=0.02
        )
        assert r.forecast_3 == pytest.approx(
            round(r.level + 3 * r.trend, 2), abs=0.02
        )


def test_streaming_near_dedup_equals_batch(spark, tmp_path):
    """Feeding the corpus in doc_id order, the streaming store must
    flag exactly the doc_b side of the batch LSH pair set — after
    every wave, over the subset seen so far."""
    from kafka_stream_spark.plans.llm_ext import near_dup_pairs
    from kafka_stream_spark.streaming.pipeline import run_streaming_near_dedup

    sf = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    median = docs.approxQuantile("doc_id", [0.5], 0.0)[0]
    wave1 = docs.filter(F.col("doc_id") <= median)
    wave2 = docs.filter(F.col("doc_id") > median)

    pairs = near_dup_pairs(spark, sf).collect()
    batch_all = {}
    for r in pairs:
        cur = batch_all.get(r.doc_b)
        batch_all[r.doc_b] = min(cur, r.doc_a) if cur is not None else r.doc_a
    wave1_ids = {r.doc_id for r in wave1.select("doc_id").collect()}
    batch_w1 = {
        b: a for b, a in batch_all.items()
        if b in wave1_ids and a in wave1_ids
    }

    inp = str(tmp_path / "in")
    store = str(tmp_path / "store")
    out = str(tmp_path / "dups")
    ckpt = str(tmp_path / "ckpt")

    def flagged():
        import os

        if not os.path.exists(out):
            return {}
        df = spark.read.parquet(out)
        return {r.doc_id: r.dup_of for r in df.collect()}

    wave1.write.mode("append").parquet(inp)
    assert run_streaming_near_dedup(spark, inp, store, out, ckpt).awaitTermination(300)
    assert flagged() == batch_w1

    wave2.write.mode("append").parquet(inp)
    assert run_streaming_near_dedup(spark, inp, store, out, ckpt).awaitTermination(300)
    assert flagged() == batch_all


def test_sequence_pack_invariants(spark):
    """Packing must conserve tokens (every piece of every doc appears
    exactly once with correct lengths), bound window overflow by the
    documented < 2x context worst case, and keep offsets consistent
    with in-window ordering."""
    from kafka_stream_spark.plans.llm_ext2 import _CTX, q_sequence_pack

    rows = q_sequence_pack(spark, "/root/testdata/sf0.01").collect()
    assert rows

    # token conservation vs an independent count
    from kafka_stream_spark.sources.tables import load

    docs = {
        r["doc_id"]: r["n_tok"]
        for r in load(spark, "/root/testdata/sf0.01", "documents")
        .selectExpr(
            "doc_id",
            "size(filter(split(text, ' '), t -> t != '')) AS n_tok",
        )
        .collect()
        if r["n_tok"] > 0
    }
    packed = {}
    for r in rows:
        packed.setdefault(r["doc_id"], 0)
        packed[r["doc_id"]] += r["piece_len"]
        assert 1 <= r["piece_len"] <= _CTX
    assert packed == docs

    # window fill bound + offset consistency
    by_window = {}
    for r in rows:
        by_window.setdefault((r["source"], r["window_id"]), []).append(r)
    for (_, _), members in by_window.items():
        fill = sum(m["piece_len"] for m in members)
        assert fill == members[0]["window_fill"]
        assert fill < 2 * _CTX  # documented straddle-overflow bound
        offs = sorted((m["win_offset"], m["piece_len"]) for m in members)
        cursor = 0
        for start, ln in offs:
            assert start == cursor
            cursor += ln
