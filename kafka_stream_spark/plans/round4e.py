"""Round-4 breadth, part E: modern Spark SQL surface — pipe syntax,
IDENTIFIER() templating, SQL session variables, and join-strategy hints
(each proven result-invisible or result-correct under the hash gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load
from ..sources.tables import register_views
from .registry import query

# ---------------------------------------------------------------------------
# X306 — SQL pipe syntax (Spark 4)
# ---------------------------------------------------------------------------


@query(
    "q_pipe_syntax",
    oracle="""
    SELECT o_orderpriority, count(*) AS n,
           round(sum(o_totalprice), 2) AS rev
    FROM orders
    WHERE o_totalprice > 100000
    GROUP BY o_orderpriority
    """,
)
def q_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X306 — SQL pipe syntax (|>, Spark 4.0's adoption of the
    GoogleSQL pipe notation): the same logical plan written as a
    top-to-bottom dataflow — FROM |> WHERE |> AGGREGATE ... GROUP BY —
    which is how analysts increasingly write multi-stage queries
    (each stage reads as a transformation, like the DataFrame API).
    Catalyst parses it to the identical plan as the nested form, which
    the hash gate proves."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM orders
        |> WHERE o_totalprice > 100000
        |> AGGREGATE count(*) AS n, round(sum(o_totalprice), 2) AS rev
           GROUP BY o_orderpriority
        """
    )


# ---------------------------------------------------------------------------
# X307 — IDENTIFIER() templating
# ---------------------------------------------------------------------------


@query(
    "q_identifier_clause",
    oracle="""
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
           round(avg(o_totalprice), 2) AS avg_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X307 — IDENTIFIER() clause (Spark 3.5+): table and column names
    supplied as BOUND PARAMETERS instead of string-spliced SQL — the
    injection-safe way to template 'same query, different table/column'
    services (the reference formats identifiers straight into SQL
    strings, kafka_s.py:300-316). Constant-folds to a normal
    catalog lookup; the plan is identical to the literal spelling."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT IDENTIFIER(:grp), count(*) AS n,
               round(avg(IDENTIFIER(:val)), 2) AS avg_price
        FROM IDENTIFIER(:tbl) GROUP BY IDENTIFIER(:grp)
        """,
        args={"grp": "o_orderstatus", "val": "o_totalprice", "tbl": "orders"},
    )


# ---------------------------------------------------------------------------
# X308 — SQL session variables
# ---------------------------------------------------------------------------


@query(
    "q_sql_variables",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
    FROM orders
    WHERE o_totalprice BETWEEN 50000.0 AND 200000.0
    GROUP BY o_orderpriority
    """,
)
def q_sql_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X308 — SQL session variables (DECLARE / SET VARIABLE, Spark 4):
    typed, session-scoped state referenced by name inside queries —
    the ANSI feature that replaces client-side string substitution for
    thresholds and as-of dates shared across a session's statements.
    Variables resolve to literals at analysis time, so pushdown and
    folding are unaffected (the gate proves the result matches the
    inline spelling)."""
    register_views(spark, sf_dir)
    spark.sql(
        "DECLARE OR REPLACE VARIABLE price_floor DOUBLE DEFAULT 50000.0"
    )
    spark.sql(
        "DECLARE OR REPLACE VARIABLE price_cap DOUBLE DEFAULT 200000.0"
    )
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n
        FROM orders
        WHERE o_totalprice BETWEEN price_floor AND price_cap
        GROUP BY o_orderpriority
        """
    )


# ---------------------------------------------------------------------------
# X309 — join-strategy hints (result-invisible by contract)
# ---------------------------------------------------------------------------


@query(
    "q_join_hints",
    oracle="""
    SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n,
           round(sum(o.o_totalprice), 2) AS rev
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_join_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X309 — join-strategy hints: the same join forced through
    SHUFFLE_HASH (instead of the optimizer's broadcast choice) must be
    result-identical — hints steer PHYSICAL strategy only, and the
    hash gate certifies that contract. The escape hatch for when
    statistics mislead Catalyst (stale row counts broadcasting a
    too-big side, or a skewed sort-merge that a shuffled hash join
    beats); plan-level assertions for the hint actually taking effect
    live in tests/test_scale_ops.py."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").hint("shuffle_hash")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("rev"),
        )
    )
