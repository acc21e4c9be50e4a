"""Cluster-scale configuration profile (100 TB / ~1000 executors).

The engine's plans are scale-independent; these are the knobs that change
between local[32] (session.RUNTIME_CONFS) and a production cluster, with
the reasoning attached so the numbers can be re-derived for a different
fleet. Apply via ``spark-submit --conf`` or builder.config — values here
are a starting point, AQE adjusts within a run.
"""

from __future__ import annotations

#: target ~128-256 MB of post-filter data per shuffle partition.
#: 100 TB input with ~10:1 scan reduction → ~10 TB shuffled worst-case
#: → 40-80k partitions; AQE coalesces down when stages shrink.
CLUSTER_CONFS: dict[str, str] = {
    "spark.sql.shuffle.partitions": "40000",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256m",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "3",
    # scans: 256 MB splits keep task count ~400k for 100 TB — large
    # enough tasks to amortize scheduling, small enough to rebalance
    "spark.sql.files.maxPartitionBytes": "256m",
    # dims (rules/sites/nation-class tables) must broadcast; 256 MB is
    # safe with 8-16 GB executors
    "spark.sql.autoBroadcastJoinThreshold": "256m",
    # stream-side: RocksDB state store once state exceeds executor heap
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
    # Arrow batches for the pandas surfaces (multimodal, stateful)
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # shuffle robustness at fleet scale
    "spark.shuffle.service.enabled": "true",
    "spark.sql.adaptive.localShuffleReader.enabled": "true",
}

#: sizing rules of thumb encoded as data (for tooling/docs)
SIZING_NOTES = {
    "executors": "1000 × 8 cores / 32 GB: 8000 slots; 100 TB / 256 MB "
    "splits ≈ 400k scan tasks ≈ 50 waves — an hour-scale full scan",
    "near_dedup": "signatures: 32 B/doc × corpus; LSH shuffle: "
    "8 bands × (16 B key + 8 B id) per doc — ~25 TB corpus shuffles "
    "<1% of its bytes",
    "ann": "hyperplane buckets: corpus/2^bits candidates per probe; "
    "IVF: corpus/n_centroids × nprobe",
    "dedup_state": "streaming dropDuplicates: 16 B/key in RocksDB; "
    "bound with watermark eviction on event-time keys",
}
