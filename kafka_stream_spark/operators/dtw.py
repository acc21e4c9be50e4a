"""Banded dynamic-time-warping distance as a vectorized Pandas UDF.

DTW is the canonical similarity for series that drift in PHASE —
two users with the same behavior pattern shifted by an hour are
near-identical under DTW and far apart under Euclidean distance.  The
recurrence is inherently sequential (D[i,j] depends on three
predecessor cells), so this is exactly the case the engine's
operator policy reserves for Arrow-batched Python: the DP for ONE
pair is microseconds of tight-loop work, the parallelism is ACROSS
pairs, and `pandas_udf` gives each executor core a batch of pairs at
a time with zero per-row Python overhead on the Spark side.

The Sakoe-Chiba band (|i−j| ≤ band) bounds each DP to O(n·band)
instead of O(n²) — both the classic accuracy regularizer (pathological
warps are usually wrong anyway) and the scale lever.

Scale shape: `dtw_pairs` joins the pair list to the per-series
arrays (series-id-keyed shuffles), then one Arrow hop computes all
distances.  At 100 TB the pair list comes from a blocking stage (LSH
buckets, same-entity groups, SAX words — X286) rather than a cross
join; the operator itself is agnostic to how pairs were proposed.

No reference parity: the reference engine (kafka_stream/kafka_s.py)
has no series analytics at all; this extends the X224/X286/X471
series-similarity family.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _dtw_one(a, b, band: int) -> float:
    """Banded DTW with |i-j| <= band, L1 local cost, pure Python DP."""
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return float("inf")
    w = max(band, abs(n - m))  # band must cover the diagonal shift
    inf = float("inf")
    prev = [inf] * (m + 1)
    prev[0] = 0.0
    for i in range(1, n + 1):
        cur = [inf] * (m + 1)
        lo = max(1, i - w)
        hi = min(m, i + w)
        ai = a[i - 1]
        for j in range(lo, hi + 1):
            cost = abs(ai - b[j - 1])
            best = prev[j]
            if prev[j - 1] < best:
                best = prev[j - 1]
            if cur[j - 1] < best:
                best = cur[j - 1]
            cur[j] = cost + best
        prev = cur
    return prev[m]


def dtw_udf(band: int = 10):
    """A (array<double>, array<double>) -> double Pandas UDF computing
    banded DTW; `band` is captured at construction time."""

    @pandas_udf("double")
    def _dtw(xs: pd.Series, ys: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _dtw_one(list(a), list(b), band)
                for a, b in zip(xs, ys)
            ]
        )

    return _dtw


def series_arrays(
    series: DataFrame, sid: str, pos: str, value: str
) -> DataFrame:
    """(sid, ordered value array) — the join-ready series table."""
    return (
        series.groupBy(F.col(sid).alias("sid"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(pos), F.col(value)))
            ).alias("pv")
        )
        .select(
            "sid",
            F.transform(
                "pv", lambda s: s.getField(value).cast("double")
            ).alias("vs"),
        )
    )


def dtw_pairs(
    series: DataFrame,
    pairs: DataFrame,
    sid: str = "sid",
    pos: str = "pos",
    value: str = "v",
    band: int = 10,
) -> DataFrame:
    """DTW distance for each (a, b) row of ``pairs`` over the series in
    ``series`` (columns sid/pos/value).  Returns (a, b, dtw)."""
    arrs = series_arrays(series, sid, pos, value)
    fn = dtw_udf(band)
    left = arrs.select(
        F.col("sid").alias("a"), F.col("vs").alias("va")
    )
    right = arrs.select(
        F.col("sid").alias("b"), F.col("vs").alias("vb")
    )
    return (
        pairs.join(left, "a")
        .join(right, "b")
        .select("a", "b", fn(F.col("va"), F.col("vb")).alias("dtw"))
    )
