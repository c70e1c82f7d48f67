"""Deterministic dataset splitting and sampling for training-data
pipelines (BASELINE.json north star; the reference has no sampling
surface at all).

Everything is keyed on ``md5(id)`` rather than ``rand()``:

- reproducible across runs, engines, partitionings, and cluster sizes
  (``df.randomSplit``/``sampleBy`` are seed- and partitioning-
  dependent — re-running after a repartition reassigns rows, which
  silently leaks eval data into training sets);
- a row's split follows the ROW, not the run: appending new data never
  reassigns old rows;
- pure column algebra (md5 + hex-parse + pmod), JVM-side, no shuffle —
  a 100 TB scan assigns splits at read speed, and the same expression
  is SQL-expressible so the DuckDB oracle checks it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table

BUCKETS = 100
TRAIN_PCT = 80
VAL_PCT = 10  # test gets the remainder


def hash_bucket(col: Column, buckets: int = BUCKETS) -> Column:
    """Stable bucket in [0, buckets): first 8 hex chars of md5 of the
    id's decimal string, parsed base-16 (fits a long), mod buckets.
    DuckDB computes the identical value via
    ``('0x' || substr(md5(id::VARCHAR), 1, 8))::BIGINT % buckets``."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")
    return F.pmod(h, F.lit(buckets))


def assign_split(
    df: DataFrame,
    id_col: str,
    train_pct: int = TRAIN_PCT,
    val_pct: int = VAL_PCT,
) -> DataFrame:
    """Adds ``bucket`` and ``split`` ('train' | 'val' | 'test')."""
    b = hash_bucket(F.col(id_col))
    split = (
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test")
    )
    return df.withColumn("bucket", b).withColumn("split", split)


def stratified_sample(df: DataFrame, stratum_col: str, rates_pct: dict[str, int],
                      id_col: str) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff its hash
    bucket falls below the stratum's percentage.  Unlisted strata are
    dropped.  Unlike ``df.sampleBy`` this is exact-by-construction on
    the id population and reproducible row-for-row."""
    b = hash_bucket(F.col(id_col))
    rate = F.lit(None).cast("int")
    expr = None
    for value, pct in rates_pct.items():
        cond = F.col(stratum_col) == value
        expr = F.when(cond, pct) if expr is None else expr.when(cond, pct)
    rate = expr.otherwise(F.lit(0))
    return df.where(b < rate)


def split_group_safe(docs: DataFrame) -> DataFrame:
    """Leakage-safe splitting: every near-duplicate CLUSTER lands in
    one split.  Plain per-doc hashing puts two near-identical docs on
    opposite sides of the train/test fence — the classic contamination
    bug group-wise splitting (sklearn's GroupShuffleSplit idea)
    prevents; here the group is the connected component of the
    near-dup pair graph, and the split is the md5 bucket of the
    component's canonical (minimum) doc_id, so the whole cluster moves
    together and assignment stays row-stable on append.

    Output (doc_id, group_id, split).

    100 TB shape: pair emit + hash-to-min components are the proven
    dedup shapes (pluggable to the LSH emitter exactly like
    corpus_curation); the component map — only docs with ≥1 near-dup —
    broadcasts into a left join, and the bucket rule is column algebra
    at scan speed."""
    from .dedup import connected_components, ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(docs).select("doc_a", "doc_b")
    comp = connected_components(pairs)
    d = docs.select("doc_id").join(
        F.broadcast(comp.select("doc_id", "component_id")), "doc_id", "left_outer"
    )
    group = F.coalesce(F.col("component_id"), F.col("doc_id"))
    return assign_split(
        d.select("doc_id", group.cast("long").alias("group_id")), "group_id"
    ).select("doc_id", "group_id", "split")


# --- queries()/oracle_sql() registrations ---------------------------------

SAMPLE_RATES = {"click": 10, "error": 50, "purchase": 100, "signup": 100, "view": 5}


def _q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return assign_split(docs, "doc_id").select("doc_id", "bucket", "split")


def _q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    return stratified_sample(ev, "event_type", SAMPLE_RATES, id_col="event_id")


def _q_split_group_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return split_group_safe(load_table(spark, sf_dir, "documents"))


QUERIES = {
    "split_assign": _q_split_assign,
    "stratified_sample": _q_stratified_sample,
    "split_group_safe": _q_split_group_safe,
}

_RATE_CASE = "CASE " + " ".join(
    f"WHEN event_type = '{t}' THEN {p}" for t, p in SAMPLE_RATES.items()
) + " ELSE 0 END"

ORACLES = {
    "split_assign": f"""
WITH b AS (
  SELECT doc_id,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % {BUCKETS} AS bucket
  FROM documents
)
SELECT doc_id, bucket,
       CASE WHEN bucket < {TRAIN_PCT} THEN 'train'
            WHEN bucket < {TRAIN_PCT + VAL_PCT} THEN 'val'
            ELSE 'test' END AS split
FROM b
""",
    "stratified_sample": f"""
SELECT event_id, event_type
FROM events
WHERE ('0x' || substr(md5(event_id::VARCHAR), 1, 8))::BIGINT % {BUCKETS}
      < {_RATE_CASE}
""",
}


def _group_safe_oracle() -> str:
    # composes dedup.py's verified recursive-closure CTE with the
    # split bucket rule, bucketing on the component canonical id
    from .dedup import _JACCARD_CTES, _SHINGLE_CTE

    return f"""
WITH RECURSIVE {_SHINGLE_CTE},
{_JACCARD_CTES},
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION
  SELECT doc_b AS s, doc_a AS d FROM pairs
),
walk(v, lbl) AS (
  SELECT DISTINCT s, s FROM edges
  UNION
  SELECT e.d, w.lbl FROM walk w JOIN edges e ON e.s = w.v
),
comp AS (SELECT v, MIN(lbl) AS component_id FROM walk GROUP BY v),
g AS (
  SELECT d.doc_id, coalesce(c.component_id, d.doc_id)::BIGINT AS group_id
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.v
),
b AS (
  SELECT doc_id, group_id,
         ('0x' || substr(md5(group_id::VARCHAR), 1, 8))::BIGINT % {BUCKETS} AS bucket
  FROM g
)
SELECT doc_id, group_id,
       CASE WHEN bucket < {TRAIN_PCT} THEN 'train'
            WHEN bucket < {TRAIN_PCT + VAL_PCT} THEN 'val'
            ELSE 'test' END AS split
FROM b
"""


ORACLES["split_group_safe"] = _group_safe_oracle()


# --- round-7 addition: temporal holdout split -----------------------------

TEMPORAL_CUTS = (0.8, 0.9)  # train | valid | test


def split_temporal(ev: DataFrame, cuts: tuple = TEMPORAL_CUTS) -> DataFrame:
    """(event_id, split): time-ordered train/valid/test assignment —
    the split every forecasting/causal pipeline needs (random splits
    leak the future into training; the holdout must be LATER than the
    train window).

    Cutoffs are the exact interpolated quantiles of epoch-millis (the
    events_quantiles idiom on INTEGER inputs — both engines interpolate
    the same two order statistics with the same formula, so the double
    cutoffs are bit-equal and row membership cannot straddle).  The
    two cutoff scalars broadcast; assignment is a map-only projection.

    100 TB shape: one exact-percentile agg over epoch millis (per-type
    sort inside the agg; swap in approx_percentile past the NDV where
    that bites — membership tolerance is a product decision there),
    then zero additional exchanges.
    """
    ms = F.unix_millis(F.col("ts"))
    qs = ev.agg(
        F.percentile(ms, F.lit(cuts[0])).alias("t_train"),
        F.percentile(ms, F.lit(cuts[1])).alias("t_valid"),
    )
    return ev.join(F.broadcast(qs)).select(
        "event_id",
        F.when(ms <= F.col("t_train"), F.lit("train"))
        .when(ms <= F.col("t_valid"), F.lit("valid"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def _q_split_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    return split_temporal(load_table(spark, sf_dir, "events"))


QUERIES.update({"split_temporal": _q_split_temporal})

ORACLES.update(
    {
        "split_temporal": f"""
WITH qs AS (
  SELECT quantile_cont(epoch_ms(ts), {TEMPORAL_CUTS[0]}) AS t_train,
         quantile_cont(epoch_ms(ts), {TEMPORAL_CUTS[1]}) AS t_valid
  FROM events
)
SELECT event_id,
       CASE WHEN epoch_ms(ts) <= t_train THEN 'train'
            WHEN epoch_ms(ts) <= t_valid THEN 'valid'
            ELSE 'test' END AS split
FROM events, qs
""",
    }
)
