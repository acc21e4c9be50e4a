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
