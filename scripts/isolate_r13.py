#!/usr/bin/env python
"""Round-13 isolation harness: per-query wall (bench methodology —
count() action, clearCache+gc between reps, min-of-N), Spark JOB COUNT
per rep (setJobGroup + statusTracker), and optional plan dump to
plans/r13/<q>_<tag>.txt. Prints one JSON doc to stdout.

Usage: python scripts/isolate_r13.py [--reps 3] [--sf /root/testdata/sf0.1]
       [--dump-tag before] q1 q2 ...
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--dump-tag", default=None,
                    help="write plans/r13/<q>_<tag>.txt explain dumps")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from foxsec_pipeline_spark.session import get_spark

    spark = get_spark(app_name="isolate-r13")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    sc = spark.sparkContext

    from foxsec_pipeline_spark.plans.catalog import registry

    reg = registry()
    unknown = [q for q in args.queries if q not in reg]
    assert not unknown, f"unknown queries: {unknown}"

    # bench.py warmup (abridged): JVM + python workers + codegen paths
    from pyspark.sql import Window as _W
    from pyspark.sql import functions as F

    spark.range(320).repartition(32).mapInPandas(
        lambda it: it, "id long").count()
    _w = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("k"),
        F.concat(F.lit("n"), (F.col("id") % 13).cast("string")).alias("s"))
    (_w.withColumn("rn", F.row_number().over(_W.partitionBy("k").orderBy("id")))
       .join(F.broadcast(_w.groupBy("k").agg(F.count("*").alias("c"))), "k")
       .withColumn("d", F.levenshtein(F.col("s"), F.lit("n1")))
       .agg(F.sum("d"), F.max("rn"), F.max("c")).collect())
    from foxsec_pipeline_spark.session import load_tables as _lt
    for _t in _lt(spark, args.sf, "region", "nation", "customer",
                  "supplier", "part", "orders", "lineitem", "events",
                  "documents", "embeddings").values():
        _t.selectExpr("max(xxhash64(to_json(struct(*))))").collect()

    out: dict = {}
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in args.queries:
        spec = reg[name]
        walls, jobs, build_ts = [], [], []
        rows = None
        for rep in range(max(1, args.reps)):
            spark.catalog.clearCache()
            gc.collect()
            if rep % 2 == 1:
                sc._jvm.System.gc()
            tag = f"iso-{name}-{rep}"
            sc.setJobGroup(tag, name)
            t0 = time.monotonic()
            df = spec.fn(spark, args.sf)
            t_build = time.monotonic() - t0
            rows = df.count()
            dt = time.monotonic() - t0
            sc.setJobGroup(None, None)
            n_jobs = len(sc.statusTracker().getJobIdsForGroup(tag))
            walls.append(round(dt, 3))
            jobs.append(n_jobs)
            build_ts.append(round(t_build, 3))
        if args.dump_tag:
            os.makedirs(os.path.join(here, "plans", "r13"), exist_ok=True)
            df = spec.fn(spark, args.sf)
            p = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
            with open(os.path.join(
                    here, "plans", "r13",
                    f"{name}_{args.dump_tag}.txt"), "w") as f:
                f.write(p)
        out[name] = {
            "min_sec": min(walls), "reps": walls, "jobs": jobs,
            "plan_build_sec": build_ts, "rows": rows,
        }
        print(f"# {name}: min {min(walls)}s reps={walls} jobs={jobs} "
              f"build={build_ts} rows={rows}", file=sys.stderr)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
