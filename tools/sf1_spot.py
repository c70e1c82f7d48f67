#!/usr/bin/env python3
"""sf1 spot-bench (VERDICT r9 #8): measure the top-5 heaviest document
operators at 10x the bench scale so the scale-trend claim ("Spark/
DuckDB ratios improve with SF because scheduling floor amortizes")
carries a measured point beyond sf0.1.

The driver ships sf{0.001,0.01,0.1} only, so the sf1 corpus is built
here, deterministically, from sf0.1: 10 replicas of documents with
offset doc_ids; replica 0 is verbatim, replicas 1-9 deterministically
permute each document's words (seed = (replica, doc_id)).  Permutation
preserves the word population (lang-ID, quality, token stats are
distribution-identical) while destroying shingle identity ACROSS
replicas, so exact/near-duplicate mass scales linearly (~10x) like a
real corpus snapshot instead of quadratically like a naive copy.

Both engines run THE SAME parquet; timings are min-of-2 for Spark,
single-shot for DuckDB (in-process, no warm-up effects worth chasing
at these runtimes).  Results land in BENCH_local.json under
"sf1_spot".

Usage: python3 tools/sf1_spot.py
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
REPLICAS = 10
KEYS = [
    "corpus_curation",
    "dedup_components",
    "dedup_substring_exact",
    "dedup_minhash_exact",
    "dedup_minhash_lsh",
    # iterative embedding ops — the sf0.1 "weak ratio" keys whose cost
    # is per-round job floor; their work is row-count-driven (no pair
    # joins), so verbatim replication is the right upscale
    "embedding_kmeans_quantized",
    "embedding_pca_power",
    # r11 (VERDICT r10 #6): every remaining >1 s sf0.1 key gets a
    # measured scale point, not an argued trend
    "dedup_minhash_estimate",
    "dedup_ngram_novelty",
    "dedup_semantic",
    "corpus_importance_weights",
    "corpus_ngram_lm_score",
]

# Library-only scale paths with engine-specific hash families (no
# DuckDB oracle — pytest-pinned): timed Spark-side only so the sf1
# record covers the path a 100 TB user actually runs (VERDICT r10 #2:
# the xxhash64 twin had no measured sf1 number).
SPARK_ONLY = {
    "lib_minhash_lsh_pairs": lambda spark, sf_dir: __import__(
        "quacfka_service_spark.operators.dedup", fromlist=["minhash_lsh_pairs"]
    ).minhash_lsh_pairs(
        __import__(
            "quacfka_service_spark.session", fromlist=["load_table"]
        ).load_table(spark, sf_dir, "documents")
    ),
}


def build_sf1() -> int:
    """Build (or reuse) the sf1 fixture; returns the ACTUAL document
    row count (ADVICE r10: n_docs was a hardcoded REPLICAS * 5000 that
    silently lies if the sf0.1 fixture size differs)."""
    import duckdb

    os.makedirs(DST, exist_ok=True)
    out = os.path.join(DST, "documents.parquet")
    if os.path.exists(out) and os.path.exists(os.path.join(DST, "embeddings.parquet")):
        con = duckdb.connect()
        return con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
    if os.path.exists(out):
        os.remove(out)
    con = duckdb.connect()
    base = con.execute(
        f"SELECT doc_id, text, lang, source, n_chars FROM '{SRC}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    n = len(base)
    rows = []
    for i in range(REPLICAS):
        for doc_id, text, lang, source, n_chars in base:
            if i == 0 or text is None:
                t = text
            else:
                words = text.split(" ")
                random.Random(i * 1_000_003 + doc_id).shuffle(words)
                t = " ".join(words)
            rows.append((doc_id + i * n, t, lang, source, len(t) if t is not None else None))
    con.execute(
        "CREATE TABLE docs (doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO docs VALUES (?, ?, ?, ?, ?)", rows)
    con.execute(f"COPY docs TO '{out}' (FORMAT PARQUET)")
    print(f"built {out}: {len(rows)} docs", flush=True)
    # embeddings: verbatim replicas with offset vec_ids — kmeans/pca
    # cost is row-count-driven (map-only assignment + bounded-state
    # collects; no pair joins), so value variation is irrelevant to
    # the scaling measurement and verbatim keeps the build trivial.
    eout = os.path.join(DST, "embeddings.parquet")
    n_e = con.execute(
        f"SELECT count(*) FROM '{SRC}/embeddings.parquet'"
    ).fetchone()[0]
    con.execute(
        f"""
        COPY (
          SELECT e.vec_id + r.i * {n_e} AS vec_id, e.embedding, e.label
          FROM '{SRC}/embeddings.parquet' e
          CROSS JOIN (SELECT unnest(range({REPLICAS})) AS i) r
        ) TO '{eout}' (FORMAT PARQUET)
        """
    )
    print(f"built {eout}: {n_e * REPLICAS} vectors", flush=True)
    return len(rows)


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    n_docs = build_sf1()
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_CPUS", "32"))
        .config("spark.driver.memory", "100g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    oracles = entry.oracle_sql()

    def _clear_memos():
        spark.catalog.clearCache()
        from quacfka_service_spark.operators import corpus as _corpus
        from quacfka_service_spark.operators import dedup as _dedup
        from quacfka_service_spark.operators import kmeans as _kmeans
        from quacfka_service_spark.operators import pca as _pca

        _dedup._SPANS_CACHE.clear()
        _dedup._COMPONENTS_CACHE.clear()
        _dedup._SIG_CACHE.clear()
        _corpus._FILTERED_COMP_CACHE.clear()
        _kmeans._CENTS_CACHE.clear()
        _pca._PCA_STATE_CACHE.clear()

    spark_sec: dict[str, float] = {}
    rows_out: dict[str, int] = {}
    for key in KEYS:
        runs = []
        for _ in range(2):
            _clear_memos()
            t0 = time.perf_counter()
            df = qs[key](spark, DST)
            nrows = df.count()
            runs.append(time.perf_counter() - t0)
        spark_sec[key] = round(min(runs), 3)
        rows_out[key] = nrows
        print(f"spark {key}: {spark_sec[key]} s ({nrows} rows)", flush=True)

    for key, fn in SPARK_ONLY.items():
        runs = []
        for _ in range(2):
            _clear_memos()
            t0 = time.perf_counter()
            nrows = fn(spark, DST).count()
            runs.append(time.perf_counter() - t0)
        spark_sec[key] = round(min(runs), 3)
        rows_out[key] = nrows
        print(f"spark {key}: {spark_sec[key]} s ({nrows} rows)", flush=True)

    # Stop the Spark JVM BEFORE the oracle phase: the 100g driver heap
    # (~70 GB RSS at sf1) otherwise squeezes the page cache out from
    # under DuckDB's recursive CTEs — r11 observed the SAME oracle
    # swinging 302 -> 476 s purely from this; both engines deserve the
    # dedicated machine the Spark loop got.
    spark.stop()
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(
        f"CREATE OR REPLACE VIEW documents AS SELECT * FROM '{DST}/documents.parquet'"
    )
    con.execute(
        f"CREATE OR REPLACE VIEW embeddings AS SELECT * FROM '{DST}/embeddings.parquet'"
    )
    duck_sec: dict[str, float] = {}
    for key in KEYS:
        t0 = time.perf_counter()
        n = len(con.execute(oracles[key]).fetchall())
        duck_sec[key] = round(time.perf_counter() - t0, 3)
        print(f"duckdb {key}: {duck_sec[key]} s ({n} rows)", flush=True)

    # provenance (ADVICE r10): bench.py carries this block forward into
    # every fresh headline artifact — stamp WHAT was measured so a
    # scale-affecting change after the stamp is visible as staleness.
    import subprocess

    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            capture_output=True,
            text=True,
            timeout=10,
        ).stdout.strip() or None
    except OSError:
        commit = None
    block = {
        "note": (
            "10x sf0.1 documents (replica-permuted: linear duplicate-mass "
            "scaling, see tools/sf1_spot.py); min-of-2 Spark counts vs "
            "single-shot DuckDB oracle on the SAME parquet. lib_* keys "
            "are Spark-only library scale paths (engine-specific hash "
            "family, no oracle)."
        ),
        "measured_at_commit": commit,
        "n_docs": n_docs,
        "spark_sec": spark_sec,
        "duckdb_sec": duck_sec,
        "ratio": {
            k: round(spark_sec[k] / duck_sec[k], 3) if duck_sec[k] else None
            for k in KEYS
        },
        "spark_only_sec": {k: spark_sec[k] for k in SPARK_ONLY},
        "rows_out": rows_out,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_local.json")
    blob = json.load(open(path))
    blob["sf1_spot"] = block
    json.dump(blob, open(path, "w"), indent=1, sort_keys=True)
    print(json.dumps({"sf1_spot": block}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
