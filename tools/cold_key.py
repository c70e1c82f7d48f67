#!/usr/bin/env python3
"""Cold-call timing probe (VERDICT r10 #3): reproduce the DRIVER's
bench pattern for a handful of keys — a fresh SparkSession and a single
invocation per key — as opposed to bench.py's min-of-3 warm-steady
numbers.  Used to reconcile driver-bench regressions that bench.py's
warm numbers do not show (r10: quality_expectations 0.94 -> 1.39 s,
orders_abc_pareto 1.21 -> 1.48 s in BENCH_r10 despite local warm wins).

Each key runs in its OWN subprocess (fresh JVM, fresh codegen cache,
fresh python workers) so one key's warm-up cannot subsidize the next.

Usage: python3 tools/cold_key.py key [key ...]   (repeats = more samples)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession
from quacfka_service_spark.session import get_spark
spark = get_spark("cold-key", cpus="%(cpus)s")
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as entry
qs = entry.queries()
t0 = time.perf_counter()
qs[%(key)r](spark, %(sf)r).write.format("noop").mode("overwrite").save()
print("COLD_SEC", round(time.perf_counter() - t0, 3))
"""


def main() -> int:
    keys = sys.argv[1:]
    if not keys:
        print("usage: cold_key.py key [key ...]", file=sys.stderr)
        return 2
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out: dict[str, list[float]] = {}
    for key in keys:
        code = _CHILD % {"repo": REPO, "cpus": cpus, "key": key, "sf": sf}
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, timeout=600
        )
        sec = None
        for line in r.stdout.splitlines():
            if line.startswith("COLD_SEC"):
                sec = float(line.split()[1])
        if sec is None:
            print(f"{key}: FAILED\n{r.stderr[-2000:]}", file=sys.stderr)
            return 1
        out.setdefault(key, []).append(sec)
        print(f"cold {key}: {sec} s", flush=True)
    print(json.dumps({"cold_single_call_sec": out, "sf": sf}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
