"""Pointer-jumping connected components: deep chains converge in
O(log d) rounds with exact min-labels."""

from __future__ import annotations

from kafka_stream_spark.operators.graph import connected_components


def _run(spark, n_vertices, edge_pairs):
    v = spark.createDataFrame([(i,) for i in range(n_vertices)], ["v"])
    e = spark.createDataFrame(edge_pairs, ["a", "b"])
    labels, rounds = connected_components(v, e)
    return {r["v"]: r["component"] for r in labels.collect()}, rounds


def test_chain_converges_logarithmically(spark):
    # path 0-1-2-...-199: diameter 199; plain propagation needs ~199
    # rounds, pointer jumping must finish in O(log d)
    got, rounds = _run(spark, 200, [(i, i + 1) for i in range(199)])
    assert got == {i: 0 for i in range(200)}
    assert rounds <= 12, rounds


def test_components_and_singletons(spark):
    got, _ = _run(spark, 10, [(3, 7), (7, 9), (1, 2)])
    assert got[3] == got[7] == got[9] == 3
    assert got[1] == got[2] == 1
    for lone in (0, 4, 5, 6, 8):
        assert got[lone] == lone


def test_star_graph(spark):
    got, rounds = _run(spark, 50, [(0, i) for i in range(1, 50)])
    assert set(got.values()) == {0}
    assert rounds <= 4


def test_pagerank_mass_conservation_and_positivity(spark, sf_dir):
    """Σ ranks = 1 (symmetrized graph has no dangling mass leak) and
    every node gets at least the teleport floor (1-d)/N."""
    from pyspark.sql import functions as F

    from kafka_stream_spark.operators.graph import pagerank
    from kafka_stream_spark.sources.tables import load

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
    ranks = pagerank(edges, iterations=3, damping=0.85).cache()
    n = ranks.count()
    total = ranks.agg(F.sum("rank")).first()[0]
    assert abs(total - 1.0) < 1e-9
    floor = 0.15 / n
    assert ranks.filter(F.col("rank") < floor - 1e-12).count() == 0


def test_pagerank_converged_equals_unrolled_at_gate_rounds(spark, sf_dir):
    """The generic fixpoint driver capped at the gate's fixed round
    count (q_pagerank: 3 rounds) must reproduce the unrolled query
    exactly; with a real tolerance it must converge within the bound
    and move less than tol on its final round."""
    from pyspark.sql import functions as F

    from kafka_stream_spark.operators.graph import (
        pagerank,
        pagerank_converged,
    )
    from kafka_stream_spark.sources.tables import load

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
    unrolled = {
        r["node"]: round(r["rank"], 9)
        for r in pagerank(edges, iterations=3).collect()
    }
    capped, rounds, converged = pagerank_converged(
        edges, tol=0.0, max_rounds=3
    )
    got = {r["node"]: round(r["rank"], 9) for r in capped.collect()}
    assert rounds == 3 and not converged  # tol=0 never "converges"
    assert got == unrolled

    # convergence semantics on a small graph (delta decays ~0.85^k, so
    # tol=1e-5 needs ~40-70 rounds; the big-graph case is the same loop)
    small = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (4, 0)], ["a", "b"]
    )
    ranks, rounds, converged = pagerank_converged(
        small, tol=1e-5, max_rounds=80
    )
    assert converged and rounds < 80
    total = ranks.agg(F.sum("rank")).collect()[0][0]
    assert abs(total - 1.0) < 1e-6  # mass conserved at the fixpoint


def test_label_prop_converged_equals_unrolled_at_gate_rounds(spark, sf_dir):
    """label_prop_converged capped at q_label_prop's 3 rounds must
    reproduce the gate query's community histogram; run further it
    must reach delta=0 (or report non-convergence honestly)."""
    from pyspark.sql import functions as F

    from kafka_stream_spark.operators.graph import label_prop_converged
    from kafka_stream_spark.plans import QUERIES
    from kafka_stream_spark.plans.graph_ext import _edges

    gate = {
        (r["community"], r["size"])
        for r in QUERIES["q_label_prop"](spark, sf_dir).collect()
    }
    labels, rounds, _ = label_prop_converged(
        _edges(spark, sf_dir), max_rounds=3
    )
    got = {
        (r["community"], r["size"])
        for r in labels.groupBy(F.col("lbl").alias("community"))
        .agg(F.count("*").alias("size"))
        .collect()
    }
    assert rounds == 3
    assert got == gate

    labels, rounds, converged = label_prop_converged(
        _edges(spark, sf_dir), max_rounds=30
    )
    if converged:
        # one more round is a no-op at the fixpoint
        again, extra_rounds, _ = label_prop_converged(
            _edges(spark, sf_dir), max_rounds=rounds + 1
        )
        assert extra_rounds == rounds
