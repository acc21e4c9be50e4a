"""Parameterized SemDeDup-class semantic deduplication.

Round-5 extraction of the scale path the round-4 verdict asked for
("What's wrong" #1): the q_semantic_dedup gate query pins k=8 clusters
so its DuckDB oracle can replicate the clustering, which makes the
within-cluster pair stage quadratic as the corpus grows.  This module
is the production form with k AS A PARAMETER: callers scale k ~ sqrt(n)
(SemDeDup, Abbas et al. 2023, arXiv:2303.09540 — 50k clusters for
LAION), which bounds expected cluster width to n/k ~ sqrt(n) and the
candidate-pair volume to O(sum c_i^2) ~ O(n^1.0) instead of O(n^2).
The gate query is now the pinned k=8 instance of this operator, so the
hash-gated code path and the scale path are the same code.

Everything stays deterministic regardless of k: centroid init is the k
lowest vec_ids, assignment ties break by (distance, cid), similarities
round to 6 digits before thresholding, and the survivor of a near-dup
group is the lowest vec_id — so incremental/streaming replays converge
to the batch answer (see streaming/pipeline.run_streaming_semantic_dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import vectors


def _sq_dist(a, b):
    """Squared L2 distance between two array<double> columns (zip_with
    + aggregate: JVM-side, no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def assign_clusters(e: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: (vec_id, emb) x broadcast(cid, cvec)
    -> (vec_id, emb, cid, dist), ties broken by (dist, cid) so both
    engines and every rerun agree.  The centroid table is broadcast —
    assignment is a map-side pass however large the fact side is.

    Round 13 (guide §2.3/§2.4): the per-vector argmin is a row-local
    array_min over the codebook folded to ONE broadcast array — struct
    ordering ASC == the old window's (dist ASC, cid ASC) — instead of a
    k-way row expansion sorted through a (vec_id)-keyed window
    exchange.  Same rounded zip_with/aggregate distance, same
    tie-break, no shuffle."""
    from ..session import default_parallelism

    cent_arr = F.broadcast(
        cent.agg(F.collect_list(F.struct("cid", "cvec")).alias("_cents"))
    )
    sqd = (
        "round(aggregate(zip_with(emb, c.cvec, "
        "(x, y) -> (x - y) * (x - y)), 0D, (acc, v) -> acc + v), 6)"
    )
    # fan out BEFORE the per-row argmin: without the window's exchange
    # the k·dim fold would run inside the single-split scan task
    # (measured 2.1 s → 3.7 s on q_semantic_dedup before this line —
    # the §2.6 lesson applies to expression rewrites too)
    return (
        e.repartition(default_parallelism())
        .crossJoin(cent_arr)
        .withColumn(
            "_b",
            F.expr(
                f"array_min(transform(_cents, "
                f"c -> struct({sqd} AS dist, c.cid AS cid)))"
            ),
        )
        .select(
            "vec_id",
            "emb",
            F.col("_b.cid").alias("cid"),
            F.col("_b.dist").alias("dist"),
        )
    )


def _update_centroids(assigned: DataFrame) -> DataFrame:
    """Lloyd update: per-(cluster, dim) means folded back to vectors.
    Shuffles (cid, pos, partial-sum) triples — never raw vectors."""
    dims = (
        assigned.select("cid", F.posexplode("emb").alias("pos", "val"))
        .groupBy("cid", "pos")
        .agg(F.avg("val").alias("v"))
    )
    return dims.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "v"))),
            lambda s: s["v"],
        ).alias("cvec")
    )


def train_centroids(
    e: DataFrame, k: int, iters: int = 2, sample_fraction: float | None = None
) -> DataFrame:
    """Deterministic k-means training: init = the k lowest vec_ids,
    ``iters`` Lloyd rounds.  At corpus scale pass ``sample_fraction``
    so training touches a hash-deterministic sample (SemDeDup trains
    its 50k LAION centroids on a sample too); assignment of the full
    corpus stays broadcast map-side either way."""
    train = e
    if sample_fraction is not None and sample_fraction < 1.0:
        # deterministic hash sample, not rand(): replays identically
        train = e.filter(
            F.pmod(F.xxhash64("vec_id"), 10_000)
            < int(sample_fraction * 10_000)
        )
    init = (
        e.select("vec_id")
        .orderBy("vec_id")
        .limit(k)
        .join(e, "vec_id")
        .select(F.col("vec_id").alias("cid"), F.col("emb").alias("cvec"))
    )
    cent = init
    for _ in range(iters - 1):
        cent = _update_centroids(assign_clusters(train, cent))
    return cent.localCheckpoint(eager=True)


def semantic_dedup(
    embeddings: DataFrame,
    k: int = 8,
    tau: float = 0.4,
    iters: int = 2,
    sample_fraction: float | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """(vec_id, embedding) -> (vec_id, cluster_id, kept, dup_of).

    SemDeDup: cluster the embeddings, then inside each cluster drop any
    vector whose cosine to a LOWER-ID member is >= tau (keep-lowest-id
    = the deterministic keep-one-per-group).  The pair stage self-joins
    on cluster id, so candidate pairs are O(sum c_i^2); choose
    k ~ sqrt(n) and that bound is ~O(n), the production setting.  Pass
    ``centroids`` to reuse a trained/stored codebook (the streaming
    store does).

    Per-vector norms are materialized once before the self-join —
    the cluster pair stage evaluates ~cluster-width cosines per vector
    and recomputing norms per pair would redo 2/3 of the arithmetic.
    """
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    cent = (
        centroids
        if centroids is not None
        else train_centroids(e, k, iters=iters, sample_fraction=sample_fraction)
    )
    members = (
        assign_clusters(e, cent)
        .select(
            "vec_id", "cid", "emb", vectors.norm("emb").alias("nrm")
        )
        .localCheckpoint(eager=True)
    )
    # SALT the cluster-keyed pair join (guide §2.5): the join key has
    # only k distinct values, so the O(sum c_i^2) cosine stage — the
    # query's whole cost — would run on at most k tasks however many
    # cores exist. A deterministic salt on the a-side (pmod of the id)
    # with the b-side replicated nsalt ways spreads each cluster's
    # pair block over k*nsalt tasks; the joined row set is identical.
    from ..session import default_parallelism

    # Cap the salt fan-out independently of core count (ADVICE r12):
    # the b-side is replicated nsalt ways before the pair join, so
    # shuffle volume grows linearly with nsalt — k*nsalt tasks already
    # saturate any box at nsalt=16 for the gate's k, while a 192-core
    # cluster would otherwise inflate the exchange 12x past need.
    nsalt = max(1, min(default_parallelism(), 16))
    salts = members.sparkSession.range(nsalt).select(
        F.col("id").cast("int").alias("slt")
    )
    a = members.select(
        F.col("vec_id").alias("a_id"),
        "cid",
        F.col("emb").alias("a_emb"),
        F.col("nrm").alias("a_nrm"),
        F.pmod(F.col("vec_id"), F.lit(nsalt)).cast("int").alias("a_slt"),
    )
    b = members.select(
        F.col("vec_id").alias("b_id"),
        F.col("cid").alias("b_cid"),
        F.col("emb").alias("b_emb"),
        F.col("nrm").alias("b_nrm"),
    ).crossJoin(F.broadcast(salts))
    # try_divide: a zero-norm embedding yields NULL (filtered by the
    # >= tau comparison) instead of an ANSI divide-by-zero failure.
    cos = F.try_divide(
        vectors.dot("a_emb", "b_emb"),
        F.col("a_nrm") * F.col("b_nrm"),
    )
    dups = (
        a.join(
            b,
            (F.col("cid") == F.col("b_cid"))
            & (F.col("a_slt") == F.col("slt"))
            & (F.col("a_id") < F.col("b_id")),
        )
        .filter(F.round(cos, 6) >= F.lit(tau))
        .groupBy("b_id")
        .agg(F.min("a_id").alias("dup_of"))
    )
    return members.join(dups, members.vec_id == dups.b_id, "left").select(
        "vec_id",
        F.col("cid").alias("cluster_id"),
        F.col("dup_of").isNull().alias("kept"),
        "dup_of",
    )


def _probe_assignments(e: DataFrame, cent: DataFrame, nprobe: int) -> DataFrame:
    """(vec_id, emb) × broadcast codebook → each vector's ``nprobe``
    nearest cells ranked by (rounded cosine DESC, cid): prn = 1 is the
    ASSIGNED cell (the inverted-list home), prn 2..nprobe are the extra
    PROBED cells. One pass feeds both sides of the routed pair stage."""
    # Round 13 (guide §2.3/§2.4): top-nprobe routing as a per-row
    # expression over the codebook folded to ONE broadcast array,
    # replacing the k-way row expansion + (vec_id)-keyed window
    # exchange.  struct ordering ASC over ((-rounded cosine), cid)
    # == the window's (cscore DESC, cid ASC); a NULL cscore
    # (try_divide by a 0 norm) maps to +Infinity so it still sorts
    # LAST, matching desc NULLS LAST.  posexplode's 0-based position
    # + 1 is exactly the window's prn.
    from ..session import default_parallelism

    cent_arr = F.broadcast(
        cent.agg(F.collect_list(F.struct("cid", "cvec")).alias("_cents"))
    )
    cos = (
        f"try_divide({vectors._dot_spark_sql('emb', 'c.cvec')}, "
        f"{vectors._norm_spark_sql('emb')} * "
        f"{vectors._norm_spark_sql('c.cvec')})"
    )
    probe_expr = (
        f"transform(slice(array_sort(transform(_cents, "
        f"c -> struct(coalesce((-round({cos}, 6)), "
        f"CAST('Infinity' AS DOUBLE)) AS ns, c.cid AS cid))), "
        f"1, {int(nprobe)}), s -> s.cid)"
    )
    # fan out before the per-row k·dim scoring (§2.6 — see
    # assign_clusters)
    return (
        e.repartition(default_parallelism())
        .crossJoin(cent_arr)
        .select(
            "vec_id",
            "emb",
            F.posexplode(F.expr(probe_expr)).alias("pos0", "cid"),
        )
        .select("vec_id", "emb", "cid", (F.col("pos0") + 1).alias("prn"))
    )


def semantic_dedup_routed(
    embeddings: DataFrame,
    centroids: DataFrame,
    tau: float = 0.4,
    nprobe: int = 2,
) -> DataFrame:
    """ANN-routed SemDeDup (round-5 verdict ask #7): candidate pairs
    come from IVF routing instead of whole-cluster self-joins — vector
    b is a duplicate of min(a_id) over lower-id vectors a whose
    ASSIGNED cell is among b's ``nprobe`` PROBED cells and whose
    rounded cosine ≥ tau.

    At nprobe = 1 this is classic SemDeDup restricted to the assigned
    cell; nprobe > 1 recovers the near-boundary pairs cluster-bounded
    dedup misses while still touching only ~nprobe·(n/k) candidates
    per vector. The asymmetric rule (assigned ∈ probed) makes the
    STREAMING store replay this batch answer exactly when ids arrive
    in order — the store keeps each member's assigned cell and each
    batch joins its probes against it (run_streaming_semantic_dedup_
    routed); pytest pins incremental ≡ batch after every wave.

    Output matches semantic_dedup: (vec_id, cluster_id, kept, dup_of)
    with cluster_id = the assigned cell."""
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    ranked = _probe_assignments(e, centroids, nprobe).localCheckpoint(
        eager=True
    )
    members = ranked.filter(F.col("prn") == 1).select(
        F.col("vec_id").alias("a_id"),
        F.col("cid").alias("cell"),
        F.col("emb").alias("a_emb"),
        vectors.norm("emb").alias("a_nrm"),
    )
    probes = ranked.select(
        F.col("vec_id").alias("b_id"),
        F.col("cid").alias("cell"),
        F.col("emb").alias("b_emb"),
        vectors.norm("emb").alias("b_nrm"),
    )
    cos = F.try_divide(
        vectors.dot("a_emb", "b_emb"),
        F.col("a_nrm") * F.col("b_nrm"),
    )
    dups = (
        probes.join(members, "cell")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(F.round(cos, 6) >= F.lit(tau))
        .groupBy("b_id")
        .agg(F.min("a_id").alias("dup_of"))
    )
    assigned = ranked.filter(F.col("prn") == 1)
    return assigned.join(
        dups, assigned.vec_id == dups.b_id, "left"
    ).select(
        "vec_id",
        F.col("cid").alias("cluster_id"),
        F.col("dup_of").isNull().alias("kept"),
        "dup_of",
    )
