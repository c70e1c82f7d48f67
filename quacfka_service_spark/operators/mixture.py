"""Domain-mixture resampling — reweight a multi-source corpus to
target proportions, the knob every pretraining data recipe tunes
(web : books : code : ... ratios).

Downsample-only semantics: the source with the least data relative to
its target weight (the "limiting" source, argmin n_s / w_s) is kept
in full; every other source s keeps the fraction
``w_s * n_lim / (w_lim * n_s)`` of its rows so the kept corpus hits
the target ratios exactly in expectation — no upsampling, no
duplication.

Determinism / engine-exactness: row selection is the md5-bucket rule
from split.py (row-stable, partition-independent), and the keep
predicate is INTEGER — ``bucket * (w_lim * n_s) < B * (w_s * n_lim)``
— so the DuckDB oracle matches bit-for-bit; no float rate ever
computed.  The limiting source is chosen by ``ORDER BY n/w, source``
(same IEEE division of the same integers on both engines, tie-broken
by name).

100 TB shape: one hash agg over the corpus for per-source counts
(map-side combined, source-cardinality output), the count table and
the single limiting row broadcast back, and the keep filter is pure
column algebra at scan speed.  Nothing shuffles the corpus itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table
from .split import hash_bucket

B = 10_000  # sampling granularity

# fixture recipe: boost src0/src1, background weight 1 for the rest
TARGET_WEIGHTS = {"src0": 5, "src1": 3}
DEFAULT_WEIGHT = 1


def _weight_col(weights: dict[str, int], default: int) -> F.Column:
    expr = None
    for s, w in sorted(weights.items()):
        cond = F.col("source") == s
        expr = F.when(cond, w) if expr is None else expr.when(cond, w)
    return (expr.otherwise(default) if expr is not None else F.lit(default)).cast("long")


def corpus_mixture(
    docs: DataFrame,
    weights: dict[str, int] | None = None,
    default_weight: int = DEFAULT_WEIGHT,
) -> DataFrame:
    """Kept rows (doc_id, source) after reweighting to the target
    mixture.  ``weights`` are relative integer targets per source."""
    weights = TARGET_WEIGHTS if weights is None else weights
    w = _weight_col(weights, default_weight)
    d = docs.select("doc_id", "source", w.alias("w"))
    counts = d.groupBy("source", "w").agg(F.count(F.lit(1)).alias("n"))
    lim = (
        counts.orderBy((F.col("n") / F.col("w")).asc(), F.col("source").asc())
        .limit(1)
        .select(F.col("n").alias("n_lim"), F.col("w").alias("w_lim"))
    )
    return (
        d.join(F.broadcast(counts.select("source", "n")), "source")
        .crossJoin(F.broadcast(lim))
        .where(
            hash_bucket(F.col("doc_id"), B) * (F.col("w_lim") * F.col("n"))
            < F.lit(B) * (F.col("w") * F.col("n_lim"))
        )
        .select("doc_id", "source")
    )


TEMP_B = 1_000  # granularity for the squared keep rule (headroom: B²·n_s < 2⁶³)


def corpus_mixture_temperature(docs: DataFrame, num: int = 1, den: int = 2) -> DataFrame:
    """Temperature-scaled mixture (downsample-only): target proportion
    p_s ∝ n_s^α with α = num/den (default α = ½, the multilingual-
    sampling exponent) — big sources are damped, small sources kept
    whole, without hand-written weights.

    Downsample-only ⇒ keep fraction f_s = (n_min/n_s)^(1-α), binding
    at the smallest source (kept in full).  The keep rule needs NO
    root: raise both sides of ``bucket/B < (n_min/n_s)^(1-α)`` to the
    ``den`` power —

        bucket^den · n_s^(den-num)  <  B^den · n_min^(den-num)

    — pure BIGINT multiplication, so the DuckDB oracle is bit-exact
    and the sample is row-stable under repartitioning (same md5-bucket
    rule as split.py).  Overflow bound: B^den · n_s^(den-num) must fit
    int64 — with B=1000 and α=½ that allows n_s up to ~9·10¹²
    docs per source.

    100 TB shape: identical to corpus_mixture — one map-side-combined
    per-source count, the count table and the 1-row minimum broadcast
    back, keep filter at scan speed; the corpus itself never shuffles.
    """
    if not (0 < num < den):
        raise ValueError("need 0 < num/den < 1 (a damping temperature)")
    d = docs.select("doc_id", "source")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    nmin = counts.agg(F.min("n").alias("n_min"))

    def _ipow(col: F.Column, k: int) -> F.Column:
        out = F.lit(1).cast("long")
        for _ in range(k):
            out = out * col
        return out

    bucket = hash_bucket(F.col("doc_id"), TEMP_B)
    return (
        d.join(F.broadcast(counts), "source")
        .crossJoin(F.broadcast(nmin))
        .where(
            _ipow(bucket, den) * _ipow(F.col("n"), den - num)
            < _ipow(F.lit(TEMP_B).cast("long"), den) * _ipow(F.col("n_min"), den - num)
        )
        .select("doc_id", "source")
    )


# --- queries()/oracle_sql() registrations ---------------------------------


def _q_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_mixture(load_table(spark, sf_dir, "documents"))


def _q_mixture_temp(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_mixture_temperature(load_table(spark, sf_dir, "documents"))


QUERIES = {
    "corpus_mixture": _q_mixture,
    "corpus_mixture_temperature": _q_mixture_temp,
}

_W_CASE = "CASE " + " ".join(
    f"WHEN source = '{s}' THEN {w}" for s, w in sorted(TARGET_WEIGHTS.items())
) + f" ELSE {DEFAULT_WEIGHT} END"

ORACLES = {
    "corpus_mixture": f"""
WITH d AS (
  SELECT doc_id, source, ({_W_CASE})::BIGINT AS w FROM documents
),
counts AS (
  SELECT source, w, count(*)::BIGINT AS n FROM d GROUP BY source, w
),
lim AS (
  SELECT n AS n_lim, w AS w_lim FROM counts
  ORDER BY n / w ASC, source ASC LIMIT 1
)
SELECT d.doc_id, d.source
FROM d
JOIN counts c ON d.source = c.source
CROSS JOIN lim
WHERE (('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT % {B}) * (w_lim * c.n)
      < {B} * (d.w * n_lim)
""",
    # α = 1/2: bucket²·n_s < B²·n_min (see corpus_mixture_temperature)
    "corpus_mixture_temperature": f"""
WITH counts AS (
  SELECT source, count(*)::BIGINT AS n FROM documents GROUP BY source
),
m AS (SELECT min(n)::BIGINT AS n_min FROM counts)
SELECT d.doc_id, d.source
FROM documents d
JOIN counts c ON d.source = c.source
CROSS JOIN m
WHERE (('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT % {TEMP_B})
      * (('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT % {TEMP_B})
      * c.n
      < {TEMP_B}::BIGINT * {TEMP_B}::BIGINT * m.n_min
""",
}
