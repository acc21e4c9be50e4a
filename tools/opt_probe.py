"""Optimization probe (round 12): isolated per-query timing + plan capture.

For each named query: one untimed warm run, then min-of-REPS noop-sink
timings (the bench.py methodology), and optionally the formatted physical
plan written to plans/r12/<query>_<tag>.txt.

Usage:
  python tools/opt_probe.py [--plans TAG] [--reps N] [--sf DIR] query ...

Timing output is one line per query on stdout: "<query>\t<best_sec>".
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_stream_spark.plans import QUERIES  # noqa: E402
from kafka_stream_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    tag = None
    reps = 3
    sf_dir = "/root/testdata/sf0.1"
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--plans":
            tag = args[i + 1]
            i += 2
        elif a == "--reps":
            reps = int(args[i + 1])
            i += 2
        elif a == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            names.append(a)
            i += 1

    spark = get_spark("opt_probe")
    spark.sparkContext.setLogLevel("ERROR")

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r13",
    )
    if tag:
        os.makedirs(plans_dir, exist_ok=True)

    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"opt_probe:{name}")
        if tag:
            import contextlib
            import io

            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        # warm
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
            spark.catalog.clearCache()
        print(f"{name}\t{round(best, 3)}")
        sys.stdout.flush()
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
