"""Streaming sources: Kafka CDC envelopes and a file-based local twin.

The reference consumes BSON MongoDB-oplog envelopes from Kafka with an
offsetless, group-less consumer that replays the topic from the beginning
on every restart (kafka_s.py:68,149-161 — SURVEY.md T1). Here:

- ``kafka_cdc_stream`` is the production source: checkpointed offsets
  (exactly-once per micro-batch) replace the replay-everything behavior;
  ``from_json`` replaces the crash-prone ``BSON.decode`` whose try/except
  the reference left commented out (kafka_s.py:156-161) — malformed
  payloads become NULL rows that a dead-letter filter drops.
- ``file_cdc_stream`` is the same parsed stream fed from a directory of
  JSON files — the local/test twin (no broker in this environment); every
  downstream operator is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: per-board source-field maps (SURVEY.md §2.12): kafka_s reads
#: st_name/st_code/publish_date, kafka_a reads stock_name/stock_code/
#: etl_time (kafka_s.py:178-181 vs kafka_a.py:180-183). The reference
#: keeps two 640-line file copies for this; here it is one dict.
FIELD_MAPS: dict[str, dict[str, str]] = {
    "neeq": {
        "cmp_short_name": "st_name",
        "cmp_code": "st_code",
        "title": "title",
        "publish_date": "publish_date",
        "url": "url",
    },
    "ashare": {
        "cmp_short_name": "stock_name",
        "cmp_code": "stock_code",
        "title": "title",
        "publish_date": "etl_time",
        "url": "url",
    },
}


def cdc_schema(board: str = "neeq") -> T.StructType:
    """CDC envelope: the subset of the mongoshake oplog shape the
    reference reads (kafka_s.py:170-187): ``o`` = inserted doc, ``o_set``
    marks update ops (dropped), source fields per board."""
    fields = FIELD_MAPS[board]
    return T.StructType(
        [
            T.StructField(
                "o",
                T.StructType(
                    [T.StructField(src, T.StringType()) for src in fields.values()]
                ),
            ),
            T.StructField("o_set", T.StringType()),  # "$set" payload marker
        ]
    )


def parse_cdc(raw: DataFrame, value_col: str = "value", board: str = "neeq") -> DataFrame:
    """bytes/string JSON envelope → typed columns + insert-only filter
    (F1: keep records with ``o`` present and no ``$set``,
    kafka_s.py:170-174) + projection/rename (P1, kafka_s.py:177-187)."""
    parsed = raw.withColumn(
        "env", F.from_json(F.col(value_col).cast("string"), cdc_schema(board))
    )
    fields = FIELD_MAPS[board]
    return (
        parsed.filter(
            F.col("env").isNotNull()
            & F.col("env.o").isNotNull()
            & F.col("env.o_set").isNull()
        )
        .select(
            *[F.col(f"env.o.{src}").alias(dst) for dst, src in fields.items()]
        )
    )


def kafka_cdc_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
    board: str = "neeq",
) -> DataFrame:
    """Kafka source (S1). Requires the spark-sql-kafka package on the
    cluster; unreachable in the local harness (no broker) but this is the
    production wiring the reference's consumer loop maps to."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return parse_cdc(raw, board=board)


def file_cdc_stream(spark: SparkSession, input_dir: str, board: str = "neeq") -> DataFrame:
    """Directory-of-JSON-lines twin of :func:`kafka_cdc_stream`: each line
    is one envelope (the ``value`` of a Kafka record)."""
    raw = (
        spark.readStream.format("text")
        .schema(T.StructType([T.StructField("value", T.StringType())]))
        .load(input_dir)
    )
    return parse_cdc(raw, board=board)
