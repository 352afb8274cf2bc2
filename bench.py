#!/usr/bin/env python
"""Benchmark harness: run the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from foxsec_pipeline_spark.plans.catalog import registry  # noqa: E402
from foxsec_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="foxsec-bench")

    reg = registry()
    results: dict[str, float] = {}
    # warm the JVM + parquet footers once so per-query numbers measure
    # the plan, not session startup
    reg["threshold_analysis"].fn(spark, sf_dir).count()

    total = 0.0
    for name in sorted(reg):
        spec = reg[name]
        t0 = time.monotonic()
        n = spec.fn(spark, sf_dir).count()
        dt = time.monotonic() - t0
        results[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.3f}s rows={n}", file=sys.stderr)

    # parser throughput guard (BASELINE.md: ParserBenchmark analog) —
    # parse materialized GLB-shaped lines, report rows/sec
    import tempfile

    from foxsec_pipeline_spark.parser.parse import ParserCfg, parse_events
    from foxsec_pipeline_spark.plans.catalog_pipeline import _synth_glb_lines

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/glb_lines"
        _synth_glb_lines(spark, sf_dir).repartition(32).write.parquet(path)
        raw = spark.read.parquet(path)
        parse_events(raw, ParserCfg()).count()  # warm
        t0 = time.monotonic()
        n_parsed = parse_events(raw, ParserCfg()).count()
        parse_dt = time.monotonic() - t0
    parser_rps = round(n_parsed / parse_dt) if parse_dt > 0 else None
    print(f"# parser: {n_parsed} rows in {parse_dt:.3f}s = {parser_rps} rows/s",
          file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "catalog_total_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "queries": results,
                "parser_rows_per_sec": parser_rps,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
