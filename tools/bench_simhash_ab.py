#!/usr/bin/env python
"""A/B harness for the dedup_simhash bench regression (VERDICT r3 item 3).

Runs ONE JIT configuration per invocation (a JVM flag can't change
mid-process): the C1 pin is session.get_spark's local default;
``SPARK_GRAFT_JIT_FULL=1`` in the environment lifts it to full tiered C2.

    python tools/bench_simhash_ab.py [n_runs]          # C1 (default pin)
    SPARK_GRAFT_JIT_FULL=1 python tools/bench_simhash_ab.py [n_runs]

Protocol mirrors bench.py: one sf0.01 warm-up pass per timed query shape,
then N GC-prefixed noop-write runs at sf0.1.  Prints one JSON line with
every raw wall + median/min/max and the prevailing load averages, so the
committed table (BENCH/SIMHASH_AB.md) is reproducible.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry  # noqa: E402
from rca_pdf_extraction_pipeline_spark.session import get_spark  # noqa: E402

WARMUP_SF_DIR = "/root/testdata/sf0.01"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERY = os.environ.get("SPARK_GRAFT_AB_QUERY", "dedup_simhash")


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    jit = "C2-full" if os.environ.get("SPARK_GRAFT_JIT_FULL") else "C1-pin"
    load_start = round(os.getloadavg()[0], 2)
    spark = get_spark(f"simhash-ab-{jit}")
    q = entry.queries()[QUERY]

    def run(sf_dir: str) -> float:
        spark.sparkContext._jvm.System.gc()
        t0 = time.time()
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    warm = [run(WARMUP_SF_DIR), run(WARMUP_SF_DIR)]
    runs = [run(SF_DIR) for _ in range(n_runs)]
    s = sorted(runs)
    print(json.dumps({
        "query": QUERY,
        "jit": jit,
        "sf_dir": SF_DIR,
        "warmup_runs_sf001": warm,
        "runs": runs,
        "median": s[len(s) // 2],
        "min": s[0],
        "max": s[-1],
        "load_avg_1min_start": load_start,
        "load_avg_1min_end": round(os.getloadavg()[0], 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
