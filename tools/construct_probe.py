"""Per-query DataFrame CONSTRUCTION time probe (round 13).

The r12 finding: ~300 benched keys are dominated by fixed per-key
overhead — driver-side plan construction (py4j round-trips) plus a few
tiny jobs — not by executor work.  bench.py times construction +
execution together (correctly: both are query latency), so this probe
separates the two for targeting: it times ONLY ``QUERIES[name](spark,
sf_dir)`` (the Python/py4j DataFrame build; for queries that run eager
jobs — localCheckpoint(eager)/collect during construction — those jobs
are included, which is also what the bench pays per rep) and prints a
sorted report.

Usage: python tools/construct_probe.py [--sf DIR] [--reps N] [query ...]
(defaults to every benched HEADLINE key; reps default 2, min taken).
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
    sf_dir = "/root/testdata/sf0.1"
    reps = 2
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif a == "--reps":
            reps = int(args[i + 1])
            i += 2
        else:
            names.append(a)
            i += 1
    if not names:
        import bench

        names = list(bench.HEADLINE)

    spark = get_spark("construct_probe")
    spark.sparkContext.setLogLevel("ERROR")

    # JIT/session warmup victim so the first measured key isn't hot-loaded
    QUERIES[names[0]](spark, sf_dir)
    spark.catalog.clearCache()

    out: list[tuple[str, float]] = []
    for name in names:
        fn = QUERIES[name]
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn(spark, sf_dir)
            best = min(best, time.time() - t0)
            spark.catalog.clearCache()
        out.append((name, best))
        print(f"{name}\t{round(best, 3)}", file=sys.stderr)

    out.sort(key=lambda kv: -kv[1])
    total = sum(v for _, v in out)
    print(f"# construction total over {len(out)} keys: {round(total, 1)}s")
    for name, v in out:
        print(f"{round(v, 3):7.3f}  {name}")


if __name__ == "__main__":
    main()
