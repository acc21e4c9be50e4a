"""X555 — banded DTW operator: metric sanity + exact agreement with an
independent brute-force reference."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kafka_stream_spark.operators.dtw import dtw_pairs


def _ref_dtw(a, b):
    """Unbanded textbook DP, written independently of the operator."""
    n, m = len(a), len(b)
    D = [[math.inf] * (m + 1) for _ in range(n + 1)]
    D[0][0] = 0.0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            D[i][j] = abs(a[i - 1] - b[j - 1]) + min(
                D[i - 1][j], D[i][j - 1], D[i - 1][j - 1]
            )
    return D[n][m]


def _series_df(spark, named):
    rows = [
        (sid, p, float(v))
        for sid, vals in named.items()
        for p, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "sid string, pos int, v double")


def test_dtw_matches_reference_and_metric_sanity(spark):
    base = [math.sin(i / 3.0) for i in range(40)]
    shifted = [math.sin((i - 4) / 3.0) for i in range(40)]
    noise = [((i * 37) % 11 - 5) / 2.0 for i in range(40)]
    series = _series_df(
        spark, {"base": base, "shift": shifted, "noise": noise}
    )
    pairs = spark.createDataFrame(
        [
            ("base", "base"),
            ("base", "shift"),
            ("shift", "base"),
            ("base", "noise"),
        ],
        "a string, b string",
    )
    out = {
        (r["a"], r["b"]): r["dtw"]
        for r in dtw_pairs(series, pairs, band=40).collect()
    }
    # identity and symmetry
    assert out[("base", "base")] == 0.0
    assert abs(out[("base", "shift")] - out[("shift", "base")]) < 1e-9
    # with a full band the operator equals the textbook DP exactly
    assert abs(out[("base", "shift")] - _ref_dtw(base, shifted)) < 1e-9
    assert abs(out[("base", "noise")] - _ref_dtw(base, noise)) < 1e-9
    # phase shift is cheap under DTW, expensive under pointwise L1
    l1_shift = sum(abs(x - y) for x, y in zip(base, shifted))
    assert out[("base", "shift")] < 0.25 * l1_shift
    # a structureless series is far from the sine under any warp
    assert out[("base", "noise")] > 5 * out[("base", "shift")]


def test_dtw_band_upper_bounds_and_converges(spark):
    """A narrow band can only INCREASE the distance (fewer warps
    allowed); widening the band converges to the unbanded optimum."""
    a = [float((i * 13) % 7) for i in range(30)]
    b = [float(((i + 2) * 11) % 7) for i in range(30)]
    series = _series_df(spark, {"a": a, "b": b})
    pairs = spark.createDataFrame([("a", "b")], "a string, b string")
    d = {
        band: dtw_pairs(series, pairs, band=band).collect()[0]["dtw"]
        for band in (0, 3, 30)
    }
    assert d[0] >= d[3] >= d[30]
    assert abs(d[30] - _ref_dtw(a, b)) < 1e-9
    # band=0 degenerates to pointwise (diagonal-only) L1
    assert abs(d[0] - sum(abs(x - y) for x, y in zip(a, b))) < 1e-9
