#!/usr/bin/env python3
"""Full-surface local correctness sweep — the driver's CORRECTNESS gate
records the first 50 ``queries()`` keys; this runs ALL of them, the
same way (hostile session: non-UTC timezone, default confs, sf0.01
against the DuckDB oracles), so every registered operator has a
current verification run regardless of the 50-slot window.

Usage:  python3 tools/parity_sweep.py [key ...]
Writes a summary to stdout; exits nonzero on any mismatch.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "America/New_York")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    qs, oracles = entry.queries(), entry.oracle_sql()
    keys = sys.argv[1:] or sorted(qs)
    bad = 0
    for key in keys:
        s = qs[key](spark, SF).toPandas()
        spark.catalog.clearCache()
        if key not in oracles:
            print(f"{key} rows-only {len(s)}", flush=True)
            continue
        d = con.execute(oracles[key]).fetchdf()
        # True multiset comparison (sorted row lists): engines that agree on
        # distinct rows but disagree on duplicate multiplicities must FAIL
        # (VERDICT r3 "what's wrong" #1 — set() was multiplicity-blind).
        sm = sorted(map(tuple, s[sorted(s.columns)].astype(str).values.tolist()))
        dm = sorted(map(tuple, d[sorted(d.columns)].astype(str).values.tolist()))
        ok = sm == dm
        bad += 0 if ok else 1
        print(f"{key} {'OK' if ok else f'MISMATCH {len(s)}/{len(d)}'}", flush=True)
    print(f"TOTAL KEYS: {len(keys)} MISMATCHES: {bad}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
