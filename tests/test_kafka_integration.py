"""Live-broker Kafka integration (env-gated).

The reference's actual ingestion path is a Kafka consumer loop
(/root/reference/kafka_stream/kafka_s.py:68); the engine's production
twin is ``streaming.sources.kafka_cdc_stream`` →
``readStream.format("kafka")``. No broker (and no spark-sql-kafka
package) exists in this harness, so the test skips with that reason —
set ``KAFKA_BOOTSTRAP=host:port`` (and optionally ``KAFKA_TOPIC``) on
an environment with a broker + the kafka connector on the classpath to
run the real produce → consume → parse → assert round trip.
"""

from __future__ import annotations

import json
import os
import uuid

import pytest

pytestmark = pytest.mark.skipif(
    "KAFKA_BOOTSTRAP" not in os.environ,
    reason=(
        "no Kafka broker in this harness; set KAFKA_BOOTSTRAP=host:port "
        "(broker reachable + spark-sql-kafka package on the classpath) "
        "to exercise the live ingestion path"
    ),
)


def test_kafka_cdc_live_roundtrip(spark, tmp_path):
    """Produce CDC envelopes to a real topic with Spark's batch Kafka
    sink, consume them back through kafka_cdc_stream, and assert the
    insert-only filter + per-board projection held — the reference's
    end-to-end consumer contract (kafka_s.py:149-187) on a live broker."""
    from kafka_stream_spark.streaming.sources import kafka_cdc_stream

    brokers = os.environ["KAFKA_BOOTSTRAP"]
    topic = os.environ.get(
        "KAFKA_TOPIC", f"kafka_stream_spark_it_{uuid.uuid4().hex[:8]}"
    )

    insert_env = json.dumps(
        {
            "o": {
                "st_name": "测试公司",
                "st_code": "430001",
                "title": "年度报告",
                "publish_date": "2026-01-15",
                "url": "http://example.invalid/a",
            }
        }
    )
    update_env = json.dumps(
        {
            "o": {
                "st_name": "测试公司",
                "st_code": "430001",
                "title": "年度报告(修订)",
                "publish_date": "2026-01-16",
                "url": "http://example.invalid/b",
            },
            "o_set": "{}",
        }
    )
    (
        spark.createDataFrame(
            [(insert_env,), (update_env,)], "value string"
        )
        .write.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .save()
    )

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        kafka_cdc_stream(spark, brokers, topic, starting_offsets="earliest")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240)

    rows = spark.read.parquet(out).collect()
    # update envelope (o_set present) must be dropped; insert projected
    assert [
        (r.cmp_short_name, r.cmp_code, r.title, r.publish_date, r.url)
        for r in rows
    ] == [
        (
            "测试公司",
            "430001",
            "年度报告",
            "2026-01-15",
            "http://example.invalid/a",
        )
    ]
