"""Rate source: the built-in load-generator stream source works with the
engine's aggregation plans (useful for soak tests without Kafka)."""

from __future__ import annotations

import time


def test_rate_source_feeds_windowed_agg(spark, tmp_path):
    from pyspark.sql import functions as F

    q = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "500")
        .load()
        .withColumn("bucket", F.col("value") % 10)
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .writeStream.format("memory")
        .queryName("rate_agg")
        .outputMode("complete")
        .start()
    )
    try:
        deadline = time.time() + 60
        total = 0
        while time.time() < deadline:
            rows = spark.sql("SELECT sum(n) AS t FROM rate_agg").collect()
            total = rows[0]["t"] or 0
            if total >= 100:
                break
            time.sleep(1)
        assert total >= 100
        buckets = {r["bucket"] for r in spark.sql("SELECT * FROM rate_agg").collect()}
        assert buckets <= set(range(10))
    finally:
        q.stop()
