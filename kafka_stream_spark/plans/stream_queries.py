"""Streaming queries in the driver correctness gate.

q_stream_pipeline runs the REAL Structured Streaming path (file CDC
source → enrichment → checkpointed dedup → foreachBatch parquet sinks)
end-to-end inside the query call, then returns the sink contents. The
result is fully deterministic, so it gets a DuckDB oracle like any batch
query — the strongest possible check that batch and streaming semantics
agree (the point of the batch/streaming-unified plan).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import decode, rules
from ..sources import dims
from ..sources.tables import load
from ..streaming.pipeline import SinkPaths, run_board_stream
from .registry import query

_PUB = "2024-01-01 00:00:00"


def _docs_as_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents rendered as mongoshake-style CDC insert envelopes."""
    d = load(spark, sf_dir, "documents")
    o = F.struct(
        F.concat(F.lit("name_"), F.col("doc_id")).alias("st_name"),
        F.col("source").alias("st_code"),
        F.col("text").alias("title"),
        F.lit(_PUB).alias("publish_date"),
        F.concat(F.lit("http://doc/"), F.col("doc_id")).alias("url"),
    )
    return d.select(F.to_json(F.struct(o.alias("o"))).alias("value"))


def _stream_oracle() -> str:
    emo = decode.decode_case_sql("r.sentiment", decode.EMO_LABELS)
    imp = decode.decode_case_sql("r.importance", decode.IMP_LABELS)
    return f"""
    WITH cdc AS (
      SELECT 'name_' || CAST(doc_id AS VARCHAR) AS cmp_short_name,
             source AS cmp_code, text AS title,
             '{_PUB}' AS publish_date,
             'http://doc/' || CAST(doc_id AS VARCHAR) AS url
      FROM documents
    ), enriched AS (
      SELECT c.*, coalesce(s.site_name, '') AS site_name
      FROM cdc c LEFT JOIN {dims.sites_values_sql('s')} ON c.cmp_code = s.source
    ), matched AS (
      SELECT e.*, r.rule_id, r.category_code, r.category_name,
             r.sentiment, r.importance
      FROM enriched e, {dims.rules_values_sql('r')}
      WHERE {rules.duckdb_match_sql('e.title', 'r.in_rules', 'r.filter_rules')}
    ), keyed AS (
      SELECT *, md5(concat_ws('||', coalesce(title, ''), coalesce(url, ''),
                              coalesce(publish_date, ''))) AS yqid
      FROM matched
    )
    SELECT yqid,
           md5(concat_ws('||', yqid, coalesce(site_name, ''),
                         coalesce(CAST(category_code AS VARCHAR), ''))) AS only_id,
           title, cmp_short_name, cmp_code, site_name, url, publish_date,
           rule_id, category_code, category_name,
           concat_ws('##', CAST(category_code AS VARCHAR),
                     CAST(rule_id AS VARCHAR)) AS level_key,
           sentiment AS emo_score, {emo} AS emo_label,
           importance AS imp_score, {imp} AS imp_label,
           '巨潮资讯网' AS webname, '新三板公告' AS src_type,
           '直接关联' AS rel_type, 1 AS is_valid, 1 AS data_status
    FROM keyed r
    """


@query("q_stream_pipeline", oracle=_stream_oracle())
def q_stream_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1-T3+K4 — the full streaming path, verified against a SQL oracle:
    documents → CDC JSON files → readStream → enrich → checkpointed
    dropDuplicates → foreachBatch three-sink fan-out → read the
    announcements sink back. Deterministic because every key and decode
    is, and the corpus has no colliding only_ids."""
    base = tempfile.mkdtemp(prefix="kss_stream_")
    inp, out, ckpt = f"{base}/in", f"{base}/out", f"{base}/ckpt"
    # few larger files: less file-listing + per-file task overhead in the
    # short-lived availableNow run (variance, not throughput, is the enemy
    # at this size)
    _docs_as_cdc(spark, sf_dir).coalesce(4).write.mode("overwrite").text(inp)
    q = run_board_stream(spark, inp, out, ckpt)
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("board stream did not drain within 300s")
    result = (
        spark.read.parquet(SinkPaths.under(out).announcements)
        .drop("__batch_id")
        .localCheckpoint(eager=True)  # materialize, then drop the scratch dir
    )
    shutil.rmtree(base, ignore_errors=True)
    return result
