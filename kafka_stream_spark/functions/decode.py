"""Score→label decodes and empty-string defaulting.

The reference decodes sentiment/importance scores through small dicts
(kafka_s.py:72-73,444-459): ``{'1':'正向','-1':'负向','0':'中性'}`` and a
5-key importance map onto 3 labels. A dict lookup over a handful of keys
is a CASE WHEN chain — stays in codegen, needs no join. The lookup-table
join form only pays off when the map has thousands of entries.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: kafka_s.py:72 — sentiment score → label
EMO_LABELS = {1: "正向", -1: "负向", 0: "中性"}

#: kafka_s.py:73 — importance score → label (5 keys, 3 labels)
IMP_LABELS = {30: "高", 10: "中", 8: "中", 5: "低", 3: "低"}


def _case_chain(col: Column, mapping: dict[int, str]) -> Column:
    expr = None
    for k, v in mapping.items():
        cond = col == F.lit(k)
        expr = F.when(cond, F.lit(v)) if expr is None else expr.when(cond, F.lit(v))
    return expr.otherwise(F.lit(None))  # missing key → None (kafka_s.py:449,458)


def emo_label(score: Column) -> Column:
    return _case_chain(score, EMO_LABELS)


def imp_label(score: Column) -> Column:
    return _case_chain(score, IMP_LABELS)


def default_empty(col: Column) -> Column:
    """Reference empty-string-as-null convention (kafka_s.py:76-102,359-361)."""
    return F.coalesce(col.cast("string"), F.lit(""))


def decode_case_sql(col: str, mapping: dict[int, str]) -> str:
    """DuckDB CASE chain mirroring :func:`_case_chain` for oracles."""
    whens = " ".join(f"WHEN {col} = {k} THEN '{v}'" for k, v in mapping.items())
    return f"CASE {whens} ELSE NULL END"
