"""User-function extension surface: vectorized pandas UDF, grouped-agg
pandas UDAF, grouped applyInPandas, Python UDTF, and the raw-SQL entry
point.

The reference's "UDFs" are hard-coded Python helpers inside its loop
(SURVEY.md §2.10); the engine exposes the real PySpark extension surface
instead — all Arrow-batched, none row-at-a-time — and every one is held
to the same DuckDB oracle as the built-in operators.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from ..sources.tables import load, register_views
from .registry import query

# ---------------------------------------------------------------------------
# scalar pandas UDF (vectorized)
# ---------------------------------------------------------------------------


# DataType objects (not DDL strings) so the decorators don't need a live
# SparkSession at import time
@pandas_udf(DoubleType())
def _readability(text: pd.Series) -> pd.Series:
    """Arrow-vectorized scalar UDF: crude readability = mean word length
    of the column batch, computed in pandas (10-100× the row-at-a-time
    Python UDF throughput)."""
    words = text.str.split(" ")
    return words.map(lambda ws: sum(len(w) for w in ws if w) / max(
        sum(1 for w in ws if w), 1
    ))


@query(
    "q_pandas_udf",
    oracle="""
    WITH t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
      FROM documents
    )
    SELECT doc_id,
           round(CAST(list_aggregate(list_transform(ws, w -> len(w)), 'sum')
                      AS DOUBLE) / greatest(len(ws), 1), 6) AS readability
    FROM t
    """,
)
def q_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDF surface — vectorized scalar pandas_udf under the oracle gate."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.round(_readability(F.col("text")), 6).alias("readability")
    )


# ---------------------------------------------------------------------------
# grouped-agg pandas UDAF
# ---------------------------------------------------------------------------


@pandas_udf(DoubleType())
def _geo_mean(v: pd.Series) -> float:
    """GROUPED_AGG pandas UDAF: geometric mean via exp(mean(log))."""
    import numpy as np

    return float(np.exp(np.log(v.to_numpy()).mean()))


@query(
    "q_pandas_udaf",
    oracle="""
    SELECT event_type, round(exp(avg(ln(value))), 4) AS geo_mean_value
    FROM events GROUP BY event_type
    """,
)
def q_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDAF surface — grouped-agg pandas UDF (geometric mean), checked
    against the SQL identity exp(avg(ln(x)))."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(_geo_mean(F.col("value")), 4).alias("geo_mean_value")
    )


# ---------------------------------------------------------------------------
# grouped applyInPandas
# ---------------------------------------------------------------------------


def _center(pdf: pd.DataFrame) -> pd.DataFrame:
    mean = pdf["value"].to_numpy().mean()
    return pd.DataFrame(
        {
            "event_id": pdf["event_id"],
            "event_type": pdf["event_type"],
            "centered": (pdf["value"] - mean).round(1),
        }
    )


@query(
    "q_apply_in_pandas",
    oracle="""
    SELECT event_id, event_type,
           round(value - avg(value) OVER (PARTITION BY event_type), 1)
             AS centered
    FROM events
    """,
)
def q_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped custom logic via applyInPandas (whole group as one pandas
    frame): per-type mean-centering, oracle'd by the window-function
    identity. At scale prefer the pure window form (no Python) — this
    query exists to pin the applyInPandas surface itself."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").applyInPandas(
        _center, schema="event_id long, event_type string, centered double"
    )


# ---------------------------------------------------------------------------
# Python UDTF
# ---------------------------------------------------------------------------


@query(
    "q_udtf",
    oracle="""
    WITH t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
      FROM documents WHERE doc_id < 20
    )
    SELECT doc_id, unnest(ws) AS token,
           CAST(unnest(range(len(ws))) AS INTEGER) AS pos
    FROM t
    """,
)
def q_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF surface — a Python table function exploding text into
    (token, pos) rows, invoked through SQL LATERAL."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token string, pos int")
    class SplitTokens:
        def eval(self, text: str):
            pos = 0
            for tok in (text or "").split(" "):
                if tok:
                    yield tok, pos
                    pos += 1

    spark.udtf.register("split_tokens", SplitTokens)
    load(spark, sf_dir, "documents").filter(F.col("doc_id") < 20).select(
        "doc_id", "text"
    ).createOrReplaceTempView("udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, t.token, t.pos "
        "FROM udtf_docs d, LATERAL split_tokens(d.text) t"
    )


# ---------------------------------------------------------------------------
# raw SQL entry point
# ---------------------------------------------------------------------------


@query(
    "q_sql_interface",
    oracle="""
    SELECT n.n_name, count(*) AS n_suppliers,
           round(sum(s.s_acctbal), 2) AS total_bal
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q_sql_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql entry point over registered views — users can run the
    ANSI-SQL form of any engine query directly (same Catalyst plan as the
    DataFrame form)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name, count(*) AS n_suppliers,
               round(sum(s.s_acctbal), 2) AS total_bal
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """
    )


def _reconcile(key, orders_pdf, lines_pdf):
    import math

    import pandas as pd

    def round_half_up(x: float) -> float:
        # SQL ROUND is half-away-from-zero; Python's round() is
        # banker's — on an exact .xx5 cent boundary they diverge
        return math.floor(x * 100 + 0.5) / 100 if x >= 0 else -(
            math.floor(-x * 100 + 0.5) / 100
        )

    (orderkey,) = key
    billed = float(orders_pdf["o_totalprice"].iloc[0]) if len(orders_pdf) else 0.0
    computed = float(
        (lines_pdf["l_extendedprice"] * (1 - lines_pdf["l_discount"])).sum()
    )
    return pd.DataFrame(
        {
            "o_orderkey": [orderkey],
            "n_lines": [len(lines_pdf)],
            "computed": [round_half_up(computed)],
            "billed": [round_half_up(billed)],
        }
    )


@query(
    "q_cogroup",
    oracle="""
    SELECT o.o_orderkey,
           CAST(count(l.l_orderkey) AS BIGINT) AS n_lines,
           round(coalesce(sum(l.l_extendedprice * (1 - l.l_discount)), 0),
                 2) AS computed,
           round(any_value(o.o_totalprice), 2) AS billed
    FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey < 2000
    GROUP BY o.o_orderkey
    """,
)
def q_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas — the two-sided custom-merge surface:
    orders and their lineitems arrive as PAIRED pandas frames per key
    and a Python reconciliation emits billed-vs-computed totals. The
    relational twin (join + group) is the oracle; like
    q_apply_in_pandas, the query exists to pin the cogroup API — at
    scale prefer the join unless the merge logic genuinely needs
    imperative pandas (model scoring over aligned series, custom
    curve-fitting per entity)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    return (
        o.groupBy("o_orderkey")
        .cogroup(li.groupBy("l_orderkey"))
        .applyInPandas(
            _reconcile,
            schema="o_orderkey long, n_lines long, computed double, "
            "billed double",
        )
    )
