#!/usr/bin/env python
"""Scale step-up measurement: run named catalog queries at sf0.1 and
at a K-times replica (scripts/make_scale_data.py output), min-of-N
reps each, and print one JSON document shaped like STEPUP_r{N}.json's
per-query entries.

Usage: python scripts/run_stepup.py [--scale-dir /tmp/sfscale1]
       [--base /root/testdata/sf0.1] [--reps 2] q1 q2 ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--scale-dir", default="/tmp/sfscale1")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--tag", default="10x",
                    help="label for the scale-dir leg in the output")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    # measure under the ENGINE's session config (AQE + skew-join +
    # coalesce enabled, the bench.py posture) — the r11 30x runs
    # exposed that a bare builder without AQE measures a different
    # engine than the one bench.py and production would run, and at
    # 30x the fixed 32-partition no-AQE shapes futex-stormed the JVM
    # (96% system CPU, all threads in lock contention) on the
    # explode-heavy dedup family
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    from foxsec_pipeline_spark.session import get_spark

    spark = get_spark(app_name="run-stepup")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    from foxsec_pipeline_spark.plans.catalog import registry

    reg = registry()
    unknown = [q for q in args.queries if q not in reg]
    assert not unknown, f"unknown queries: {unknown}"

    # warm the JVM + Python worker pool once (bench.py's rationale)
    from pyspark.sql import functions as F

    spark.range(320).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).count()
    spark.range(1000).select(F.md5(F.col("id").cast("string"))).count()

    out: dict = {}
    for name in args.queries:
        spec = reg[name]
        entry: dict = {}
        for tag, d in (("sf0.1", args.base), (args.tag, args.scale_dir)):
            reps = []
            rows = None
            for _ in range(max(1, args.reps)):
                spark.catalog.clearCache()
                # drop py4j refs THEN nudge the JVM: localCheckpoint
                # blocks are freed by the ContextCleaner only after
                # the Python-side DataFrame reference is collected.
                # Without this, parse-heavy queries degraded
                # monotonically within a session (measured 14.6 ->
                # 89.4 s across 4 reps of customs_prefilter_split at
                # 10x; with the GC pair: 15.2/11.0/23.1/20.2).
                import gc

                gc.collect()
                spark.sparkContext._jvm.System.gc()
                t0 = time.monotonic()
                rows = spec.fn(spark, d).count()
                reps.append(round(time.monotonic() - t0, 3))
            entry[tag] = {"sec": min(reps), "rows": rows, "reps": reps}
            print(f"# {name} {tag}: {min(reps)}s rows={rows} reps={reps}",
                  file=sys.stderr)
        base_s = entry["sf0.1"]["sec"]
        entry["ratio_wall"] = (
            round(entry[args.tag]["sec"] / base_s, 1) if base_s else None
        )
        br = entry["sf0.1"]["rows"]
        entry["ratio_output"] = (
            round(entry[args.tag]["rows"] / br, 1) if br else None
        )
        out[name] = entry
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
