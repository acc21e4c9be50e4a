"""applyInPandasWithState under the correctness gate.

q_stateful_stats runs the custom stateful operator (per-user running
aggregates, operators.stateful) over the events table as a real
availableNow stream, then reduces the emitted updates to the final state
per user — which must equal the plain batch aggregate, giving the
custom-state path a full DuckDB oracle."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.stateful import running_user_stats
from ..sources.tables import load
from .registry import query


@query(
    "q_stateful_stats",
    oracle="""
    SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM events GROUP BY user_id
    """,
)
def q_stateful_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E9 custom-state half — the applyInPandasWithState operator's final
    per-key state must equal the batch groupBy (values are positive, so
    the row with max n_events per user carries the final running sum
    regardless of how availableNow split the micro-batches)."""
    base = tempfile.mkdtemp(prefix="kss_state_")
    inp, out, ckpt = f"{base}/in", f"{base}/out", f"{base}/ckpt"
    load(spark, sf_dir, "events").select("user_id", "value").write.parquet(inp)
    q = (
        running_user_stats(
            spark.readStream.schema("user_id long, value double").parquet(inp)
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("stateful stream did not drain within 300s")
    emitted = spark.read.parquet(out)
    result = (
        emitted.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.round(F.max("sum_value"), 2).alias("sum_value"),
        )
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(base, ignore_errors=True)
    return result
