"""Hilbert-curve index as portable integer arithmetic.

The classic iterative xy2d transform (per-level quadrant rotation, the
public-domain formulation popularized by the Wikipedia "Hilbert curve"
article), unrolled to log2(n) LEVELS of pure CASE/bit expressions —
one materialized (x, y, d) triple per level (a CTE per level in SQL, a
select per level in Spark), so the expression tree stays linear in the
order instead of exploding exponentially. ``xy2d_py`` is the reference
implementation; tests/test_functions.py proves it is a continuous
bijection (consecutive indices are grid-adjacent cells) — the locality
property that makes Hilbert layout strictly better-bounded than
Z-order for 2-D file skipping (no Morton "seam jumps").

Negative intermediates appear after a flip (s-1-x can go below zero);
all implementations rely on two's-complement ``&`` over int64, which
Python, Spark, and DuckDB share.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def xy2d_py(n: int, x: int, y: int) -> int:
    """Reference: Hilbert index of (x, y) on an n x n grid (n = 2^k)."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def _levels(n: int):
    s = n // 2
    while s > 0:
        yield s
        s //= 2


def _step_exprs(s: int, xor: str) -> tuple[str, str, str]:
    """(d_new, x_new, y_new) formulas over columns hx, hy, hd for one
    level; shared verbatim by the SQL and Spark spellings apart from
    the XOR operator name."""
    rx = f"(CASE WHEN (hx & {s}) <> 0 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN (hy & {s}) <> 0 THEN 1 ELSE 0 END)"
    if xor == "^":
        step = f"((3 * {rx}) ^ {ry})"
    else:
        step = f"{xor}(CAST(3 * {rx} AS BIGINT), CAST({ry} AS BIGINT))"
    d_new = f"hd + {s * s} * {step}"
    x_new = (
        f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
        f"THEN {s} - 1 - hy ELSE hy END) ELSE hx END"
    )
    y_new = (
        f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
        f"THEN {s} - 1 - hx ELSE hx END) ELSE hy END"
    )
    return d_new, x_new, y_new


def xy2d_ctes(n: int, base: str, carry: list[str]) -> tuple[str, str]:
    """DuckDB CTE chain computing xy2d over a base CTE exposing hx, hy
    (+ ``carry`` pass-through columns). Returns (chain_sql, final_name)
    where the final CTE has columns carry + hd."""
    carry_cols = ", ".join(carry)
    ctes = [f"h0 AS (SELECT {carry_cols}, hx, hy, CAST(0 AS BIGINT) AS hd FROM {base})"]
    prev = "h0"
    for i, s in enumerate(_levels(n), start=1):
        d_new, x_new, y_new = _step_exprs(s, xor="xor")
        ctes.append(
            f"h{i} AS (SELECT {carry_cols}, ({x_new}) AS hx, "
            f"({y_new}) AS hy, ({d_new}) AS hd FROM {prev})"
        )
        prev = f"h{i}"
    return ",\n    ".join(ctes), prev


def xy2d_df(df: DataFrame, n: int, carry: list[str]) -> DataFrame:
    """Spark twin of :func:`xy2d_ctes`: ``df`` must expose hx, hy (+
    carry); returns carry + hd after log2(n) chained selects — all
    whole-stage-codegen projections, no shuffle."""
    df = df.withColumn("hd", F.lit(0).cast("long"))
    for s in _levels(n):
        d_new, x_new, y_new = _step_exprs(s, xor="^")
        df = df.select(
            *carry,
            F.expr(x_new).alias("hx"),
            F.expr(y_new).alias("hy"),
            F.expr(d_new).alias("hd"),
        )
    return df.select(*carry, "hd")
