"""Modern Spark 4 SQL surface: VARIANT semi-structured columns, string
collations, SQL-defined UDFs, and LIMIT/OFFSET pagination.

The reference carries its semi-structured payload as a BSON dict and
probes it with Python `in` checks (kafka_s.py:157,163-167); the modern
engine answer is the VARIANT type — parse once, binary-encoded,
path-extract without re-parsing. Collations replace the ad-hoc
`lower()` scattered through the reference's matching code. SQL UDFs
give the reference's small Python helpers (score→label style) a
catalog-registered, optimizer-visible form — unlike Python UDFs they
inline into codegen, so they are NOT a slow path.

All four are plain projection/aggregate passes — scale-neutral.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load, register_views
from .registry import query


@query(
    "q_variant_json",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT)
             AS sum_k,
           CAST(min(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS min_k,
           CAST(max(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS max_k,
           CAST(count_if(json_extract(props, '$.missing') IS NOT NULL)
                AS BIGINT) AS n_missing_path
    FROM events GROUP BY event_type
    """,
)
def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT semi-structured column (Spark 4): the JSON payload is
    parsed ONCE into the binary variant encoding, then path-extracted
    with variant_get — no per-access re-parse, the open-schema answer
    to the reference's BSON-dict probing. try_variant_get on an absent
    path yields NULL (counted zero) instead of failing."""
    e = load(spark, sf_dir, "events")
    v = e.withColumn("v", F.parse_json("props"))
    k = F.expr("variant_get(v, '$.k', 'int')")
    missing = F.expr("try_variant_get(v, '$.missing', 'string')")
    return v.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.count_if(missing.isNotNull()).alias("n_missing_path"),
    )


@query(
    "q_collation",
    oracle="""
    WITH mixed AS (
      SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type)
                  ELSE event_type END AS et, value
      FROM events
    )
    SELECT lower(et) AS event_type_ci, count(*) AS n,
           round(sum(value), 2) AS sum_value
    FROM mixed GROUP BY lower(et)
    """,
)
def q_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collations (Spark 4): a mixed-case key grouped under
    UTF8_LCASE compares case-insensitively INSIDE the aggregation —
    no lower() normalization pass, and range predicates/joins on the
    collated column stay sargable. The oracle is the classic lower()
    rewrite; equality of results is the semantics claim."""
    e = load(spark, sf_dir, "events")
    mixed = e.select(
        F.when(
            F.col("event_id") % 2 == 0, F.upper("event_type")
        ).otherwise(F.col("event_type")).alias("et"),
        "value",
    )
    ci = F.collate(F.col("et"), "UTF8_LCASE")
    return (
        mixed.groupBy(ci.alias("et_ci"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.lower(F.col("et_ci")).cast("string").alias("event_type_ci"),
            "n",
            "sum_value",
        )
    )


@query(
    "q_sql_udf",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
             AS charged
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar UDF (CREATE FUNCTION ... RETURN expr, Spark 4):
    catalog-registered business logic that INLINES into the optimizer —
    the plan is identical to writing the expression by hand, so unlike
    a Python UDF this is not a slow path. The reference's per-record
    Python helpers (kafka_s.py:388-468) land here when they are pure
    arithmetic."""
    register_views(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION charged_amount(
          price DOUBLE, disc DOUBLE, tax DOUBLE)
        RETURNS DOUBLE
        RETURN price * (1 - disc) * (1 + tax)
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               round(sum(charged_amount(l_extendedprice, l_discount, l_tax)),
                     2) AS charged
        FROM lineitem GROUP BY l_returnflag
        """
    )


@query(
    "q_limit_offset",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 40
    """,
)
def q_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed pagination (ORDER BY + LIMIT/OFFSET with a unique
    tie-break): page 3 of the revenue leaderboard. Spark plans the
    offset into the global top-(limit+offset) — still
    TakeOrderedAndProject, no full sort. For deep pagination at scale,
    seek-predicates (WHERE price < last_seen) replace growing offsets;
    the tie-break column here is what makes that rewrite exact."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20 OFFSET 40
        """
    )


@query(
    "q_param_sql",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice >= 1000.0
    GROUP BY o_orderpriority
    """,
)
def q_param_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 4 named-parameter binding): the query
    text carries :status / :floor placeholders and values bind at
    execution — the injection-safe templating surface a query service
    exposes (the reference string-formats its SQL together,
    kafka_s.py:300-316, the classic injection shape). Catalyst sees
    literals after binding, so constant folding and pushdown work
    exactly as with inline values."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        WHERE o_orderstatus = :status AND o_totalprice >= :floor
        GROUP BY o_orderpriority
        """,
        args={"status": "F", "floor": 1000.0},
    )


@query(
    "q_map_in_arrow",
    oracle="""
    SELECT doc_id, octet_length(encode(text)) AS n_bytes,
           length(text) AS n_chars_m
    FROM documents WHERE doc_id <= 200
    """,
)
def q_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the zero-copy sibling of mapInPandas — batches
    arrive as pyarrow RecordBatches with NO pandas conversion, the
    lowest-overhead Python hook for byte-level work (here: UTF-8 byte
    length vs char length per doc). At 100 TB this is the preferred
    escape hatch when pandas' boxing would dominate: Arrow buffers in,
    Arrow buffers out, one memcpy either side."""
    import pyarrow as pa

    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") <= 200)
        .select("doc_id", "text")
    )

    def work(batches):
        for batch in batches:
            # Arrow length kernels return int32 — cast to match the
            # declared int64 schema (a mismatch fails at read time)
            tbl = pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    "n_bytes": pa.compute.cast(
                        pa.compute.binary_length(
                            pa.compute.cast(batch.column("text"), pa.binary())
                        ),
                        pa.int64(),
                    ),
                    "n_chars_m": pa.compute.cast(
                        pa.compute.utf8_length(batch.column("text")),
                        pa.int64(),
                    ),
                }
            )
            for out in tbl.to_batches():
                yield out

    return d.mapInArrow(work, schema="doc_id long, n_bytes long, n_chars_m long")


_RECURSIVE_SQL = """
WITH RECURSIVE bounds AS (
  SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE) AS lo,
         CAST(date_trunc('month', max(o_orderdate)) AS DATE) AS hi
  FROM orders
),
months(m) AS (
  SELECT lo FROM bounds
  UNION ALL
  SELECT CAST(m + INTERVAL 1 MONTH AS DATE)
  FROM months, bounds WHERE m < hi
)
SELECT months.m, CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
       round(coalesce(sum(o.o_totalprice), 0), 2) AS total
FROM months
LEFT JOIN orders o
  ON CAST(date_trunc('month', o.o_orderdate) AS DATE) = months.m
GROUP BY months.m
"""


@query("q_recursive_cte", oracle=_RECURSIVE_SQL)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4.1 WITH RECURSIVE): a month spine unrolled
    from the data's own min/max bounds, LEFT-joined back so empty
    months surface as zero rows — the gap-revealing calendar the
    fixed-step q_gap_fill builds procedurally, now in the SQL-standard
    recursive form. The IDENTICAL SQL string runs on both engines.

    Scale: recursion depth = number of months (tiny, driver-safe); the
    only data-scale stage is the month-key aggregate join, one shuffle
    with map-side combine."""
    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_SQL)


_GBA_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       round(avg(o_totalprice), 2) AS avg_price
FROM orders
GROUP BY ALL
"""


@query("q_group_by_all", oracle=_GBA_SQL)
def q_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (SQL:2023-adjacent shorthand, Spark 4 + DuckDB):
    every non-aggregated select item becomes a grouping key — kills the
    copy-the-select-list drift bug in wide reports. IDENTICAL SQL runs
    on both engines; the plan is the ordinary combinable hash
    aggregate."""
    register_views(spark, sf_dir)
    return spark.sql(_GBA_SQL)
