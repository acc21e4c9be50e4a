"""Vector math over ``array<float>`` embedding columns.

Pure Column expressions (zip_with/aggregate fold) — JVM-side, no Python.
Both engines fold left-to-right over the same float32 values cast to
double, so dot products and norms agree bit-for-bit; scores are still
rounded at the query layer before ranking as a belt-and-braces measure.

Scale note: brute-force top-k is a broadcast of the (small) query set
against the (huge) corpus — one map-side pass + TakeOrdered, no corpus
shuffle. The LSH-bucketed variant (operators.similarity) is the path when
the query set itself is large.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    sq = F.transform(_as_double(a), lambda x: x * x)
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# --- DuckDB twins (structurally identical folds) ---------------------------


def dot_sql(a: str, b: str) -> str:
    return (
        f"list_aggregate(list_transform(range(len({a})), "
        f"i -> CAST({a}[i + 1] AS DOUBLE) * CAST({b}[i + 1] AS DOUBLE)), 'sum')"
    )


def norm_sql(a: str) -> str:
    return (
        f"sqrt(list_aggregate(list_transform({a}, "
        f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
    )


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}))"
