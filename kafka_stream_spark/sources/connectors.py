"""External connectors: JDBC (MySQL) and Kafka wiring, Mongo mapping.

The reference's remote surfaces (SURVEY.md §2.1/§2.7): MySQL dimension
scans + batched INSERTs through a hand-rolled connection pool
(mysql_yi/mysql_pool.py:27-182), a Mongo insert-with-dedup sink
(kafka_s.py:614-630), and a Kafka consumer (kafka_s.py:68). The engine
maps each onto Spark's connector surface; none of the backing services
exist in the local harness, so these functions are exercised in
production deployments and kept import-safe here (the parquet stand-ins
in plans/streaming are what the tests and oracle gate run).

Connector mapping:

- MySQL pool → ``spark.read.jdbc`` / ``DataFrameWriter.jdbc``. Spark
  manages one connection per partition and batches inserts
  (``batchsize``), replacing getAll/getOne/getMany/insertMany
  (mysql_pool.py:79-122) wholesale; predicate pushdown reaches the remote
  server via WHERE-clause generation the reference hand-wrote
  (kafka_s.py:113).
- Mongo dedup-insert → ``foreachBatch`` + ``dropDuplicates`` on the
  deterministic key, then the Mongo Spark connector's ordered=false
  upsert (or the parquet keystore locally). The bare-except-on-duplicate
  (kafka_s.py:625-629) becomes an explicit idempotent write.
- Kafka → streaming source in streaming.sources.kafka_cdc_stream; the
  sink direction (``format("kafka")``) serializes rows back to JSON.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: mirrors the reference's executemany batching (mysql_pool.py:114-122),
#: but per-partition and actually batched (the reference sent 1-row lists)
JDBC_WRITE_OPTIONS = {"batchsize": "2000", "isolationLevel": "READ_COMMITTED"}


def read_jdbc_dim(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Dimension scan (S3/S4): SELECT pushdown happens automatically —
    pass a ``(SELECT ... ) AS t`` subquery as ``table`` for hand-tuned
    scans like the reference's filtered rules query (kafka_s.py:292-296).
    """
    return spark.read.jdbc(url=url, table=table, properties=properties or {})


def write_jdbc_append(
    df: DataFrame,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
) -> None:
    """K1: batched append (announcements/sentiment tables,
    kafka_s.py:470-556)."""
    props = {**JDBC_WRITE_OPTIONS, **(properties or {})}
    df.write.jdbc(url=url, table=table, mode="append", properties=props)


def write_kafka(
    df: DataFrame, brokers: str, topic: str, key_col: str, checkpoint: str
):
    """Streaming Kafka sink: rows serialized to JSON values keyed by the
    deterministic id — downstream consumers get the same dedup handle the
    Mongo sink used (kafka_s.py:621)."""
    payload = df.select(
        F.col(key_col).alias("key"),
        F.to_json(F.struct(*[c for c in df.columns])).alias("value"),
    )
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )
