"""kafka_stream_spark — a PySpark-native analytics engine.

From-scratch re-expression of the capabilities of the reference pipeline
``wgq1134711420/kafka_stream`` (a record-at-a-time Python Kafka→MySQL/Mongo
stream-enrichment pipeline; see SURVEY.md) as an idiomatic Spark engine:

- declarative DataFrame/SQL plans (Catalyst optimizes; no hand scheduling)
- broadcast stream-static dimension joins instead of per-record RTTs
- pure ``Column``-expression rule matching (codegen-able, no Python UDFs
  in the hot path)
- Structured Streaming with checkpointing + ``foreachBatch`` multi-sink
  fan-out instead of an offsetless consumer loop
- LLM-data-pipeline extensions: exact/near dedup (MinHash-LSH, SimHash,
  n-gram Jaccard), embedding similarity search, text analysis, multimodal
  binary-column plumbing — all designed for 100 TB / 1000-executor scale.
"""

__version__ = "0.1.0"
