"""SparkSession factory with scale-oriented defaults.

The reference service tunes a single-node pipeline with explicit knobs
(batch size 122880*bs, ``SET threads = 32`` for export — see
/root/reference/main.go:42,129).  On Spark the analogous knobs are
session confs; we centralize them so every entry point (tests, bench,
driver) gets the same tuned session.

Scale rationale (100 TB target):
- AQE on: runtime coalescing of shuffle partitions + skew-join splitting
  replaces hand-tuned partition counts when data volume varies 1000x.
- ``spark.sql.shuffle.partitions`` is only the *initial* number; AQE
  coalesces it down.  On a real cluster this would be set ~2-3x total
  cores; locally 32 matches local[32].
- UTC pinned so epoch<->calendar functions agree with the DuckDB oracle
  (FIXTURES.md §5) and with any cluster regardless of machine TZ.
- Arrow enabled for any pandas-UDF hop (the slow path we mostly avoid).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "quacfka-service-spark", cpus: str | None = None) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # larger Arrow batches for mapInArrow/Pandas-UDF hot paths:
        # fewer batch boundaries per task amortizes the JVM<->Python
        # handoff (~5% on the full-width decode chain; ~44 MB of
        # decoded dicts per batch peak — well within worker memory)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "40000")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # nested-column pruning ON (default, but load-bearing for the
        # 22-message bidreq struct — SURVEY.md §4.1): make it explicit.
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # the reference writes 100 MB row groups (main.go:108); match it.
        .config("spark.hadoop.parquet.block.size", str(100_000_000))
        # dynamic partition overwrite == DuckDB COPY OVERWRITE_OR_IGNORE
        # (main.go:108,125): replace only the hour partitions we rewrote.
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one driver-generated parquet table.

    The driver writes ``events.ts`` as parquet TIMESTAMP(NANOS), which
    Spark's reader rejects outright; with the legacy conf it surfaces
    as a LongType of epoch-nanos, which we floor-divide (integer DIV —
    a double round-trip would lose precision at 1.7e18) to micros and
    rebuild a proper TimestampType.  DuckDB floors ns->us the same way,
    so oracle parity holds.
    """
    from pyspark.sql import functions as F

    # Defensive: the caller may hand us a foreign SparkSession (the
    # driver harness does).  Calendar functions (year/hour/date_trunc)
    # are session-timezone-dependent; the oracle is pinned UTC
    # (FIXTURES.md §5), so pin the session too.  Both confs are
    # runtime-settable.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
        for field in schema:
            if str(field.type) == "timestamp[ns]":
                df = df.withColumn(
                    field.name, F.timestamp_micros(F.expr(f"`{field.name}` div 1000"))
                )
    except ImportError:
        pass
    # timestamp[us] with isAdjustedToUTC=false surfaces as TIMESTAMP_NTZ;
    # DuckDB reads the same column as a naive TIMESTAMP and the oracle
    # treats it as UTC wall time.  With the session pinned UTC above,
    # NTZ -> TIMESTAMP is the identity on the underlying micros, so the
    # whole engine keeps operating on one timestamp type.
    for name_, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(name_, F.col(f"`{name_}`").cast("timestamp"))
    return df


def tables(spark: SparkSession, sf_dir: str) -> dict:
    """Load the driver-generated parquet tables as DataFrames."""
    names = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    return {n: load_table(spark, sf_dir, n) for n in names}


def run_static(df: DataFrame) -> DataFrame:
    """Execute ``df`` eagerly under a STATIC (non-AQE) plan and return
    the materialized frame.

    For fixed-shape REPORT plans — bounded outputs whose exchanges
    carry 1-row aggregates or codebook-sized key spaces — AQE
    contributes nothing (there is no skew to re-plan and no partition
    count worth coalescing) but splits every stage materialization
    into its own job: quality_expectations observed 17 jobs at sf0.1,
    pure scheduling floor locally and extra driver round-trips on a
    real cluster.  Scoping AQE off lets the static planner schedule
    the independent legs of the union/join tree concurrently inside
    ONE job (17 -> 9 jobs, 3.0 -> 1.5 s warm for the expectations
    suite).  Conf is scoped and restored; the eager localCheckpoint
    keeps the result distributed (no driver row round-trip) and is
    what anchors execution inside the scope.

    Use ONLY for bounded-output report plans and artifact plans that
    were ALREADY eagerly memoized (the _SPANS_CACHE discipline):
    corpus-sized outputs should stay lazy, and plans with genuinely
    data-dependent shape (skewed joins, unknown build sides) want AQE
    on.

    CONTRACT (ADVICE r10): this toggles the SESSION-GLOBAL
    ``spark.sql.adaptive.enabled`` conf around the eager checkpoint, so
    it assumes single-threaded use of the session — any action
    triggered concurrently on the same SparkSession while this runs
    executes under the static planner.  That matches the bench driver
    and the queries() harness (both single-threaded); a multi-threaded
    library consumer should serialize calls or pass a dedicated
    ``spark.newSession()`` clone (confs are per-session) for the
    report plan."""
    spark = df.sparkSession
    key = "spark.sql.adaptive.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        return df.localCheckpoint(eager=True)
    finally:
        spark.conf.set(key, old)
