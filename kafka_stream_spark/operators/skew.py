"""Skew-resilient aggregation: two-phase (salted) groupBy.

At 100 TB a handful of hot keys (one viral document source, one huge
customer) can pin a single reducer. The standard fix when AQE's runtime
skew handling isn't enough (e.g. non-join aggregations feeding a custom
aggregate): salt the key into S shards, aggregate partially per
(key, salt), then combine shards. Works for any algebraic aggregate
(sum/count/min/max — things with an associative combine).

Spark already does map-side partial aggregation for built-in aggregates,
which removes most skew pressure; this operator is for the cases where
the *reduce* state per key is itself large (collect-style or sketch
aggregates), making explicit shard-level parallelism worth one extra
shuffle stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (partial_agg, combine_agg) pairs per supported aggregate kind
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """``aggs``: out_col → (kind, in_col) with kind in sum/count/min/max.

    Phase 1 groups by (keys..., salt) — hot keys spread over ``n_salts``
    reducers; phase 2 combines the per-salt partials (n_keys × n_salts
    rows, tiny). Result is exactly groupBy(keys).agg(...).
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[
            _ALGEBRAIC[kind][0](F.col(col)).alias(out)
            for out, (kind, col) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[
            _ALGEBRAIC[kind][1](F.col(out)).alias(out)
            for out, (kind, _col) in aggs.items()
        ]
    )


def key_salt(n_salts: int, *key_cols: Column) -> Column:
    """Deterministic salt derived from the KEY columns: the same key always
    lands in the same shard, so a dim table replicated per salt (explode
    0..n_salts-1) co-partitions with the salted fact side of a skewed
    join. (A row-position salt cannot do this — two DataFrames never
    agree on row order.)"""
    return F.pmod(F.xxhash64(*key_cols), F.lit(n_salts))
