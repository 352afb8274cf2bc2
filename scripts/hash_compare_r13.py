#!/usr/bin/env python
"""Order-insensitive full-output hash per query at a given SF — used
to prove old-vs-new plan equivalence at sf0.1 (sum of per-row
xxhash64(to_json(struct(*))) + row count + schema string).

Usage: python scripts/hash_compare_r13.py out.json q1 q2 ...
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_path = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    from foxsec_pipeline_spark.plans.catalog import registry

    reg = registry()
    res = {}
    for q in names:
        df = reg[q].fn(spark, sf_dir)
        row = df.select(
            F.sum(
                F.xxhash64(F.to_json(F.struct(*df.columns))).cast("decimal(38,0)")
            ).cast("string").alias("h"),
            F.count(F.lit(1)).alias("n"),
        ).first()
        res[q] = {"hash": row["h"], "n": row["n"],
                  "schema": df.schema.simpleString()}
        print(q, res[q]["n"], res[q]["hash"], flush=True)
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
