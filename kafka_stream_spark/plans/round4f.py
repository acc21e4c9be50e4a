"""Round-4 breadth, part F: XML xpath extraction, str_to_map parsing,
STACK unpivot, and Luhn checksum validation — scalar-function families
where the engine runs the builtin and the oracle hand-rolls the same
arithmetic (the X121 crypto-hash discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load
from .registry import query

# ---------------------------------------------------------------------------
# X310 — xpath function family
# ---------------------------------------------------------------------------


@query(
    "q_xpath_funcs",
    oracle="""
    SELECT o_orderkey,
           o_orderkey AS k_int,
           o_orderstatus AS s_str,
           o_custkey || '|' || (o_orderkey % 100) AS vals
    FROM orders WHERE o_orderkey % 100 = 0
    """,
)
def q_xpath_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X310 — the xpath_* scalar family (xpath_int / xpath_string /
    xpath node-set) over XML assembled in-plan from row fields — the
    legacy-feed extraction surface (the Hive-compatible XPath
    functions) next to X70's JSON paths and X172's XML source. The
    oracle is the IDENTITY on the source columns: extracting what was
    just serialized must round-trip exactly, which certifies both the
    serializer concat and the XPath evaluator. Pure projection pass."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    xml = F.concat(
        F.lit("<o><k>"),
        F.col("o_orderkey"),
        F.lit("</k><s>"),
        F.col("o_orderstatus"),
        F.lit("</s><v>"),
        F.col("o_custkey"),
        F.lit("</v><v>"),
        F.col("o_orderkey") % 100,
        F.lit("</v></o>"),
    )
    w = o.select("o_orderkey", xml.alias("xml"))
    return w.select(
        "o_orderkey",
        F.expr("xpath_int(xml, '/o/k')").cast("long").alias("k_int"),
        F.expr("xpath_string(xml, '/o/s')").alias("s_str"),
        F.array_join(F.expr("xpath(xml, '/o/v/text()')"), "|").alias("vals"),
    )


# ---------------------------------------------------------------------------
# X311 — str_to_map parsing
# ---------------------------------------------------------------------------


@query(
    "q_str_to_map",
    oracle="""
    SELECT doc_id, lang AS m_lang,
           CAST(n_chars AS BIGINT) AS m_chars,
           'chars=' || n_chars || ',lang=' || lang || ',source=' || source
             AS entries
    FROM documents WHERE doc_id % 10 = 0
    """,
)
def q_str_to_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X311 — str_to_map: the one-call parser for 'k:v,k:v' config /
    tag strings (the shape logging pipelines and URL params arrive in).
    The engine serializes row fields to such a string, re-parses it
    with str_to_map, and extracts — the oracle is the identity on the
    fields, certifying the parser round trip. Map output canonicalized
    to sorted k=v entries (the round-2 array-output rule)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    s = F.concat(
        F.lit("lang:"),
        F.col("lang"),
        F.lit(",source:"),
        F.col("source"),
        F.lit(",chars:"),
        F.col("n_chars"),
    )
    m = F.expr("str_to_map(s, ',', ':')")
    parsed = d.select("doc_id", s.alias("s")).select(
        "doc_id", m.alias("m")
    )
    return parsed.select(
        "doc_id",
        F.col("m")["lang"].alias("m_lang"),
        F.col("m")["chars"].cast("long").alias("m_chars"),
        F.array_join(
            F.array_sort(
                F.transform(
                    F.map_entries("m"),
                    lambda e: F.concat_ws("=", e["key"], e["value"]),
                )
            ),
            ",",
        ).alias("entries"),
    )


# ---------------------------------------------------------------------------
# X312 — STACK unpivot generator
# ---------------------------------------------------------------------------


@query(
    "q_stack",
    oracle="""
    WITH agg AS (
      SELECT o_orderpriority AS pri,
             round(min(o_totalprice), 2) AS mn,
             round(avg(o_totalprice), 2) AS av,
             round(max(o_totalprice), 2) AS mx
      FROM orders GROUP BY 1
    )
    SELECT pri, 'min' AS stat, mn AS value FROM agg
    UNION ALL SELECT pri, 'avg', av FROM agg
    UNION ALL SELECT pri, 'max', mx FROM agg
    """,
)
def q_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X312 — the STACK(n, ...) generator: the SQL-native literal
    unpivot (X59's UNPIVOT keyword sibling, Hive-lineage) turning one
    wide stats row into (name, value) pairs — the shape dashboards and
    metric stores ingest. Single pass: aggregate once, stack in the
    same projection, no join back."""
    agg = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("pri"))
        .agg(
            F.round(F.min("o_totalprice"), 2).alias("mn"),
            F.round(F.avg("o_totalprice"), 2).alias("av"),
            F.round(F.max("o_totalprice"), 2).alias("mx"),
        )
    )
    return agg.select(
        "pri",
        F.expr("stack(3, 'min', mn, 'avg', av, 'max', mx)").alias(
            "stat", "value"
        ),
    )


# ---------------------------------------------------------------------------
# X313 — Luhn checksum validation
# ---------------------------------------------------------------------------


@query(
    "q_luhn",
    oracle="""
    WITH checked AS (
      SELECT o_orderstatus,
             list_sum(list_transform(range(len(CAST(o_orderkey AS VARCHAR))),
               i -> CASE WHEN i % 2 = 0
                    THEN CAST(substr(CAST(o_orderkey AS VARCHAR),
                              len(CAST(o_orderkey AS VARCHAR)) - i, 1) AS INT)
                    ELSE CASE WHEN 2 * CAST(substr(CAST(o_orderkey AS VARCHAR),
                              len(CAST(o_orderkey AS VARCHAR)) - i, 1) AS INT) > 9
                         THEN 2 * CAST(substr(CAST(o_orderkey AS VARCHAR),
                              len(CAST(o_orderkey AS VARCHAR)) - i, 1) AS INT) - 9
                         ELSE 2 * CAST(substr(CAST(o_orderkey AS VARCHAR),
                              len(CAST(o_orderkey AS VARCHAR)) - i, 1) AS INT)
                         END
                    END)) % 10 = 0 AS ok
      FROM orders
    )
    SELECT o_orderstatus, count(*) AS n,
           CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_valid
    FROM checked GROUP BY o_orderstatus
    """,
)
def q_luhn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X313 — Luhn checksum validation (luhn_check, Spark 3.5+): the
    mod-10 checksum behind card/IMEI/member-id validation — a data-
    quality primitive for any PII-ish numeric identifier (sits beside
    X132's redaction: first you FIND well-formed card-like numbers,
    then you scrub them). The oracle hand-rolls the double-every-
    second-digit-from-the-right arithmetic, so the builtin's exact
    semantics are pinned, not assumed. One projection + rollup."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderstatus",
            F.expr("luhn_check(CAST(o_orderkey AS STRING))").alias("ok"),
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("ok").cast("long")).alias("n_valid"),
        )
    )


# ---------------------------------------------------------------------------
# X314 — from_csv scalar parsing
# ---------------------------------------------------------------------------


@query(
    "q_from_csv",
    oracle="""
    SELECT doc_id, lang AS c_lang,
           CAST(n_chars AS BIGINT) AS c_chars,
           source AS c_source
    FROM documents WHERE doc_id % 10 = 3
    """,
)
def q_from_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X314 — from_csv: per-row parsing of an embedded CSV payload
    (the 'CSV line inside a column' shape queue messages and legacy
    feeds arrive in — X9's file-level CSV source at scalar grain).
    The engine serializes row fields to a CSV line, re-parses with an
    explicit schema, and extracts typed fields; the oracle is the
    identity, certifying quoting + type coercion round-trip. Pure
    projection."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 3)
    line = F.concat_ws(",", F.col("lang"), F.col("n_chars"), F.col("source"))
    parsed = d.select("doc_id", line.alias("line")).select(
        "doc_id",
        F.from_csv(
            F.col("line"), "c_lang STRING, c_chars LONG, c_source STRING"
        ).alias("p"),
    )
    return parsed.select(
        "doc_id",
        F.col("p.c_lang").alias("c_lang"),
        F.col("p.c_chars").alias("c_chars"),
        F.col("p.c_source").alias("c_source"),
    )


# ---------------------------------------------------------------------------
# X315 — grouping() / grouping_id() level labels
# ---------------------------------------------------------------------------


@query(
    "q_grouping_id",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           CAST(CASE WHEN o_orderstatus IS NULL THEN 2 ELSE 0 END
                + CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END
             AS BIGINT) AS gid,
           count(*) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def q_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X315 — grouping_id() level labels on a ROLLUP: distinguishes a
    REAL NULL group key from a subtotal row — the correctness detail
    every rollup report needs and COALESCE alone cannot provide (X11's
    rollup row pins the aggregation; this pins the level metadata).
    The oracle reconstructs gid from the NULL pattern, valid here
    because the grouped columns are non-null in the data — which is
    exactly the condition under which the two spellings must agree."""
    o = load(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), F.grouping_id().alias("gid"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.col("gid").cast("long").alias("gid"),
            "n",
        )
    )
