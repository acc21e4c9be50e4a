"""SparkSession factory with scale-oriented defaults.

The reference runs one synchronous Python thread (kafka_s.py:155-159).
Here the unit of parallelism is the Spark task; these defaults are chosen
so the same plans run on local[32] for tests and on a 1000-executor
cluster unchanged:

- AQE on (runtime coalescing, skew-join splitting, dynamic broadcast)
- shuffle partitions sized by env (32 locally; a cluster overrides)
- Arrow enabled for the few pandas-UDF paths (multimodal plumbing)
- session timezone pinned to UTC so timestamp semantics are
  deterministic and match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: runtime SQL confs — safe to (re)apply on an existing session too.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # events.parquet stores TIMESTAMP(NANOS); Spark has no ns timestamp —
    # read as long and convert (floor to µs) in sources.tables.load, which
    # matches DuckDB's truncating ns→µs read of the same file.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # small dims (nation/region/rules) must broadcast, never shuffle
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # let custom Python data sources (sources/pysource) participate in
    # filter pushdown via DataSourceReader.pushFilters
    "spark.sql.python.filterPushdown.enabled": "true",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "kafka_stream_spark") -> SparkSession:
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return spark


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Pin runtime confs on a session we did not create (driver harness)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on a live session — keep going
    return spark
