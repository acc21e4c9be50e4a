"""Distributed connected components: min-label propagation accelerated
with pointer jumping (label doubling).

Plain propagation needs O(component diameter) rounds — fine for the
shallow components LSH near-dup graphs produce, hopeless for deep chains.
Interleaving a pointer jump (p(v) := p(p(v))) after each propagation
halves remaining path lengths, giving O(log d) rounds (the classic
Shiloach-Vishkin / GraphFrames strategy expressed as DataFrame joins).

Labels are monotone non-increasing and bounded by the component minimum,
so the fixpoint is exactly cluster_id = min(vertex id in component) —
the same fixpoint a recursive-CTE oracle computes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    max_rounds: int = 30,
    shuffle_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """(vertices: [v], edges: [a, b] undirected-as-given) →
    ((v, component) DataFrame, rounds used). Raises on non-convergence.

    Each round: one neighbor-min join + one pointer-jump join, both on
    long keys only; labels are localCheckpoint-ed so plan lineage stays
    flat. Round count is O(log diameter).

    ``shuffle_partitions`` right-sizes the per-round shuffles for the
    EDGE SET rather than the session default: each round's cost on a
    small graph is pure scheduling overhead × partitions (the eager
    checkpoints materialize before AQE can coalesce), measured 2×
    end-to-end on a 19k-edge graph (7.3s → 3.8s). Callers size it as
    ~1 partition per 50k edges, clamped to [4, session default] — at
    100 TB the clamp keeps the session's full parallelism. The session
    value is restored on exit."""
    spark = edges.sparkSession
    restore = None
    if shuffle_partitions is not None:
        restore = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", shuffle_partitions)
    try:
        return _connected_components(vertices, edges, max_rounds)
    finally:
        if restore is not None:
            spark.conf.set("spark.sql.shuffle.partitions", restore)


def _connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    max_rounds: int,
) -> tuple[DataFrame, int]:
    # symmetrize once; propagation needs both directions
    sym = edges.select("a", "b").union(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct().persist()

    # Iterate over edge ENDPOINTS only: isolated vertices can never change
    # label, and in an LSH near-dup graph they are the overwhelming
    # majority. Per-round join size scales with the edge set, not the
    # corpus; the full vertex set appears once, in the final left join.
    labels = (
        sym.select("a")
        .distinct()
        .select(F.col("a").alias("v"), F.col("a").alias("p"))
        .localCheckpoint(eager=True)
    )
    rounds = 0
    converged = False
    for _ in range(max_rounds):
        rounds += 1
        neigh = (
            sym.join(labels, sym["b"] == labels["v"])
            .groupBy("a")
            .agg(F.min("p").alias("np"))
        )
        prop = labels.join(neigh, labels["v"] == neigh["a"], "left").select(
            "v",
            F.least(F.col("p"), F.coalesce(F.col("np"), F.col("p"))).alias("p"),
            (F.coalesce(F.col("np"), F.col("p")) < F.col("p")).cast("int").alias(
                "chg"
            ),
        )
        x, y = prop.alias("x"), prop.alias("y")
        jumped = x.join(y, F.col("x.p") == F.col("y.v")).select(
            F.col("x.v").alias("v"),
            F.col("y.p").alias("p"),
            (
                F.col("x.chg") + (F.col("y.p") < F.col("x.p")).cast("int")
            ).alias("chg"),
        ).localCheckpoint(eager=True)
        changed = jumped.agg(F.sum("chg")).collect()[0][0] or 0
        labels = jumped.select("v", "p")
        if changed == 0:
            converged = True
            break
    sym.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected components did not converge in {max_rounds} rounds"
        )
    full = vertices.join(labels, "v", "left").select(
        "v", F.coalesce("p", "v").alias("component")
    )
    return full, rounds


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over an undirected-as-given edge list ([a, b], treated
    symmetrically so there are no dangling nodes) → (node, rank).

    Each iteration is one join + one aggregate:
        r'(v) = (1-d)/N + d · Σ_{u ∈ in(v)} r(u) / outdeg(u)
    — the Brin/Page formulation as two shuffles per round, both on the
    node key, so a cluster reuses one hash partitioning across all
    rounds. Ranks are localCheckpoint-ed per round to keep the lineage
    flat (same discipline as connected_components above). N and the
    degree table are computed once; degrees broadcast when small.

    At 100 TB-scale graphs the same loop holds: the iteration state is
    one double per node, the edge table is the only big operand, and it
    is scanned (not mutated) every round — the classic Pregel-on-
    DataFrames shape.
    """
    sym = (
        edges.select("a", "b")
        .union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .persist()
    )
    deg = sym.groupBy("a").agg(F.count("*").alias("outdeg")).persist()
    n_nodes = deg.count()
    base = (1.0 - damping) / n_nodes

    ranks = deg.select("a", F.lit(1.0 / n_nodes).alias("rank")).localCheckpoint(
        eager=True
    )
    for _ in range(iterations):
        contrib = (
            sym.join(ranks, "a")
            .join(deg, "a")
            .select(
                F.col("b").alias("node"),
                (F.col("rank") / F.col("outdeg")).alias("w"),
            )
            .groupBy("node")
            .agg(F.sum("w").alias("in_mass"))
        )
        ranks = (
            deg.select(F.col("a"), F.col("outdeg"))
            .join(contrib, deg["a"] == contrib["node"], "left")
            .select(
                "a",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("in_mass", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    sym.unpersist()
    deg.unpersist()
    return ranks.select(F.col("a").alias("node"), "rank")


# ---------------------------------------------------------------------------
# generic fixpoint driver (round 5): iterate-until-converged for the
# unrolled-round graph family
# ---------------------------------------------------------------------------


def iterate_until(
    state: DataFrame,
    step,
    delta,
    epsilon: float = 0.0,
    max_rounds: int = 30,
) -> tuple[DataFrame, int, bool]:
    """Generic distributed fixpoint driver: ``state`` is iterated with
    ``step(state, round_idx) -> DataFrame`` until
    ``delta(prev, cur) <= epsilon`` (a driver-side SCALAR — the one
    collect() per round every convergence loop needs) or ``max_rounds``
    is hit. Returns (final state, rounds run, converged).

    This generalizes the loop `connected_components` has always run
    (its delta is the changed-label count) to the rest of the graph
    family: the gate queries pin FIXED round counts so their oracles
    can unroll the same rounds, while a real user wants
    iterate-until-delta<eps with a bound — both are this driver, and
    pytest pins that at the gate's fixed round counts the converged
    APIs equal the unrolled query results exactly.

    Every round's state is eagerly localCheckpoint-ed: lineage stays
    flat (no exponentially nested plans), each round is one or two
    key-partitioned shuffles defined by ``step``, and the checkpoint
    doubles as the materialization point ``delta`` reads. State should
    be (key, value) shaped — a few dozen bytes per vertex — so even a
    100 TB graph's iteration state is cluster-cache sized."""
    state = state.localCheckpoint(eager=True)
    rounds = 0
    for i in range(max_rounds):
        rounds += 1
        nxt = step(state, i).localCheckpoint(eager=True)
        d = delta(state, nxt)
        state = nxt
        if d <= epsilon:
            return state, rounds, True
    return state, rounds, False


def pagerank_converged(
    edges: DataFrame,
    tol: float = 1e-6,
    max_rounds: int = 50,
    damping: float = 0.85,
) -> tuple[DataFrame, int, bool]:
    """PageRank iterated to convergence: same per-round math as
    ``pagerank`` (one edge⋈rank join + one node-keyed aggregate), but
    driven by ``iterate_until`` with delta = max |rank change| — stop
    when the largest per-node movement falls under ``tol``.  With
    ``tol=0.0`` and ``max_rounds=k`` this runs exactly k rounds and
    equals ``pagerank(edges, iterations=k)`` bit-for-bit (pytest-pinned
    against the q_pagerank gate constants)."""
    sym = (
        edges.select("a", "b")
        .union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .persist()
    )
    deg = sym.groupBy("a").agg(F.count("*").alias("outdeg")).persist()
    n_nodes = deg.count()
    base = (1.0 - damping) / n_nodes

    def step(ranks: DataFrame, _i: int) -> DataFrame:
        contrib = (
            sym.join(ranks, "a")
            .join(deg, "a")
            .select(
                F.col("b").alias("node"),
                (F.col("rank") / F.col("outdeg")).alias("w"),
            )
            .groupBy("node")
            .agg(F.sum("w").alias("in_mass"))
        )
        return (
            deg.select("a", "outdeg")
            .join(contrib, deg["a"] == contrib["node"], "left")
            .select(
                "a",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("in_mass", F.lit(0.0))
                ).alias("rank"),
            )
        )

    def max_change(prev: DataFrame, cur: DataFrame) -> float:
        p = prev.select(F.col("a"), F.col("rank").alias("r0"))
        return (
            p.join(cur, "a")
            .agg(F.max(F.abs(F.col("rank") - F.col("r0"))))
            .collect()[0][0]
            or 0.0
        )

    init = deg.select("a", F.lit(1.0 / n_nodes).alias("rank"))
    state, rounds, converged = iterate_until(
        init, step, max_change, epsilon=tol, max_rounds=max_rounds
    )
    sym.unpersist()
    deg.unpersist()
    return (
        state.select(F.col("a").alias("node"), "rank"),
        rounds,
        converged,
    )


def label_prop_converged(
    edges: DataFrame,
    max_rounds: int = 30,
) -> tuple[DataFrame, int, bool]:
    """Synchronous label propagation iterated until NO vertex changes
    label (delta = changed-vertex count, epsilon = 0) with a round
    bound: the convergence form of q_label_prop's fixed 3 rounds —
    same update rule (adopt the most frequent neighbor label, ties to
    the smallest; pure hash-agg via min_by, no window sort), so capped
    at the gate's round count it reproduces the gate exactly.  Returns
    ((vertex a, lbl), rounds, converged).  Note synchronous LPA can
    2-cycle on bipartite structures — callers treat converged=False at
    the bound as "use the bounded answer", the standard LPA practice.

    Edges are symmetrized internally (union with the reversed list +
    distinct), matching every sibling in this module — callers may pass
    a raw one-direction edge list; already-symmetric input is a no-op.
    """
    sym = (
        edges.select("a", "b")
        .union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .persist()
    )

    def step(labels: DataFrame, _i: int) -> DataFrame:
        counts = (
            sym.join(labels.select(F.col("a").alias("b"), "lbl"), "b")
            .groupBy("a", "lbl")
            .agg(F.count("*").alias("c"))
        )
        return counts.groupBy("a").agg(
            F.min_by(
                "lbl", F.struct((-F.col("c")).alias("nc"), F.col("lbl"))
            ).alias("lbl")
        )

    def changed(prev: DataFrame, cur: DataFrame) -> float:
        p = prev.select("a", F.col("lbl").alias("l0"))
        return (
            p.join(cur, "a")
            .filter(F.col("lbl") != F.col("l0"))
            .count()
        )

    init = sym.select("a").distinct().withColumn("lbl", F.col("a"))
    state, rounds, converged = iterate_until(
        init, step, changed, epsilon=0, max_rounds=max_rounds
    )
    sym.unpersist()
    return state, rounds, converged


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Personalized PageRank (random walk with restart): identical
    per-round shape to ``pagerank`` — one edge⋈rank join + one
    node-keyed aggregate — but the teleport mass returns to the SEED
    set instead of spreading uniformly:

        r'(v) = (1-d)·s(v) + d · Σ_{u ∈ in(v)} r(u) / outdeg(u)

    with s(v) = 1/|S| for seed nodes, 0 elsewhere.  This is the
    recommender/graph-proximity primitive (SALSA/RWR family): rank mass
    concentrates around the seeds, giving a locality score the global
    PageRank cannot express.

    ``seeds`` is a one-column DataFrame (``node``); seeds absent from
    the edge list are ignored (their restart mass would be stranded).
    Scale shape is exactly ``pagerank``'s: the edge table is scanned
    once per round, state is one double per node, all shuffles on the
    node key, ranks localCheckpoint-ed per round to keep lineage flat.
    """
    sym = (
        edges.select("a", "b")
        .union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .persist()
    )
    deg = sym.groupBy("a").agg(F.count("*").alias("outdeg")).persist()
    seed_nodes = (
        deg.join(seeds.select(F.col("node").alias("a")).distinct(), "a")
        .select("a")
        .persist()
    )
    n_seeds = seed_nodes.count()
    restart = deg.join(seed_nodes, "a", "left_semi").select(
        "a", F.lit((1.0 - damping) / n_seeds).alias("restart")
    )

    ranks = (
        deg.select("a")
        .join(seed_nodes.withColumn("is_seed", F.lit(1)), "a", "left")
        .select(
            "a",
            F.when(F.col("is_seed") == 1, F.lit(1.0 / n_seeds))
            .otherwise(F.lit(0.0))
            .alias("rank"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(iterations):
        contrib = (
            sym.join(ranks, "a")
            .join(deg, "a")
            .select(
                F.col("b").alias("node"),
                (F.col("rank") / F.col("outdeg")).alias("w"),
            )
            .groupBy("node")
            .agg(F.sum("w").alias("in_mass"))
        )
        ranks = (
            deg.select("a")
            .join(contrib, deg["a"] == contrib["node"], "left")
            .join(restart, "a", "left")
            .select(
                "a",
                (
                    F.coalesce("restart", F.lit(0.0))
                    + F.lit(damping) * F.coalesce("in_mass", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    sym.unpersist()
    deg.unpersist()
    seed_nodes.unpersist()
    return ranks.select(F.col("a").alias("node"), "rank")
