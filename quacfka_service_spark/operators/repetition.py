"""Gopher-style repetition quality signals over ``documents``.

"Scaling Language Models: Methods, Analysis & Insights from Training
Gopher" (Rae et al. 2021, §A1.1) filters training documents by
repetition: fraction of duplicated words/n-grams and the character
mass of the most frequent n-gram.  The fixture corpus has no newlines,
so the line-based signals are re-based on words (the corpus analog, at
document granularity, of the reference's dedup surface — see
``operators/dedup.py``).

Signals (all deterministic integer-over-integer ratios so the DuckDB
oracle matches bit-for-bit):

- ``dup_word_frac``      (n_words - n_distinct_words) / n_words
- ``dup_trigram_frac``   (n_trigrams - n_distinct_trigrams) / n_trigrams
                         (NULL when the document has < 3 words)
- ``top_bigram_frac``    occurrences(mode bigram) * len(mode bigram)
                         / len(text)  — ties broken bigram-ASC
                         (NULL when the document has < 2 words)

Physical shape: the per-document signals are pure higher-order array
functions (one scan, zero shuffles, whole-stage codegen).  The mode
bigram needs a per-doc argmax: explode -> partial-agg count -> one
hash shuffle on (doc_id, bigram) -> per-doc row_number (second shuffle
on doc_id) -> left join back.  At 100 TB the explode+partial-agg keeps
the shuffle carrying pre-combined (doc, bigram, n) rows rather than
raw bigram occurrences, and both shuffles key on doc_id so AQE can
coalesce; nothing is quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import load_table
from .text import _words


def _bigrams(w):
    return F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.concat_ws(" ", F.element_at(w, i), F.element_at(w, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _trigrams(w):
    return F.when(
        F.size(w) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(w, i),
                F.element_at(w, i + 1),
                F.element_at(w, i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _dup_word_frac_from_words(w):
    """Duplicate-word fraction over an already-split words column/expr —
    shared by repetition_signals and dup_word_frac_expr (identical
    expression, oracle-pinned doubles)."""
    nw = F.size(w).cast("long")
    return (nw - F.size(F.array_distinct(w)).cast("long")) / nw


def dup_word_frac_expr(text):
    """repetition_signals' `dup_word_frac` as a pure column expression
    over a raw text column — for call sites that need only this signal
    and can fold it into an existing scan (corpus_quality_gate) instead
    of joining the full repetition_signals frame (whose mode-bigram leg
    costs an explode + shuffle + window that such callers discard)."""
    return _dup_word_frac_from_words(_words(text))


def repetition_signals(docs: DataFrame) -> DataFrame:
    """Per-document repetition signals (see module docstring)."""
    d = docs.select("doc_id", "text", _words(F.col("text")).alias("w"))
    nw = F.size("w").cast("long")
    tri = _trigrams(F.col("w"))
    n_tri = F.size(tri).cast("long")
    base = d.select(
        "doc_id",
        F.length("text").cast("long").alias("tlen"),
        _dup_word_frac_from_words(F.col("w")).alias("dup_word_frac"),
        (
            (n_tri - F.size(F.array_distinct(tri)).cast("long"))
            / F.nullif(n_tri, F.lit(0).cast("long"))
        ).alias("dup_trigram_frac"),
    )
    # mode bigram per doc: explode (outer: keep the one-evaluation plan,
    # see verify-skill gotcha on InferFiltersFromGenerate) -> count ->
    # rank.  Ties broken (n DESC, bigram ASC) for a total order.
    ex = (
        d.select("doc_id", F.explode_outer(_bigrams(F.col("w"))).alias("bigram"))
        .where(F.col("bigram").isNotNull())
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = (
        ex.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.desc("n"), F.asc("bigram"))
            ),
        )
        .where(F.col("rk") == 1)
        .select("doc_id", "bigram", "n")
    )
    return (
        base.join(top, "doc_id", "left")
        .select(
            "doc_id",
            "dup_word_frac",
            "dup_trigram_frac",
            (
                F.col("n").cast("long") * F.length("bigram").cast("long")
                / F.nullif(F.col("tlen"), F.lit(0).cast("long"))
            ).alias("top_bigram_frac"),
        )
    )


def repetition_filter(docs: DataFrame, max_dup_word_frac: float = 0.9) -> DataFrame:
    """Documents passing the repetition gate (Gopher keeps a document
    only if every signal is under its threshold; the fixture corpus is
    uniformly repetitive, so a single word-level gate is the
    non-vacuous demonstration)."""
    sig = repetition_signals(docs)
    return (
        docs.join(sig.where(F.col("dup_word_frac") <= max_dup_word_frac), "doc_id")
        .select("doc_id", "lang", "source")
    )


# --- queries()/oracle_sql() registrations ---------------------------------

def _q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_signals(load_table(spark, sf_dir, "documents"))


QUERIES = {"text_repetition": _q_repetition}

ORACLES = {
    "text_repetition": r"""
WITH d AS (
  SELECT doc_id, text, regexp_split_to_array(trim(lower(text)), '\s+') AS w
  FROM documents
),
base AS (
  SELECT
    doc_id,
    length(text)::BIGINT AS tlen,
    (len(w)::BIGINT - len(list_distinct(w))::BIGINT) / len(w)::BIGINT AS dup_word_frac,
    CASE WHEN len(w) >= 3 THEN
      (
        (len(w) - 2)::BIGINT
        - len(list_distinct(list_transform(generate_series(1, len(w) - 2),
              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])))::BIGINT
      ) / (len(w) - 2)::BIGINT
    ELSE NULL END AS dup_trigram_frac,
    CASE WHEN len(w) >= 2 THEN
      list_transform(generate_series(1, len(w) - 1), i -> w[i] || ' ' || w[i+1])
    ELSE [] END AS bi
  FROM d
),
ex AS (
  SELECT doc_id, unnest(bi) AS bigram FROM base
),
cnt AS (
  SELECT doc_id, bigram, count(*) AS n FROM ex GROUP BY doc_id, bigram
),
top AS (
  SELECT doc_id, bigram, n
  FROM (
    SELECT doc_id, bigram, n,
           row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, bigram ASC) AS rk
    FROM cnt
  ) WHERE rk = 1
)
SELECT
  b.doc_id,
  b.dup_word_frac,
  b.dup_trigram_frac,
  t.n::BIGINT * length(t.bigram)::BIGINT / nullif(b.tlen, 0) AS top_bigram_frac
FROM base b LEFT JOIN top t USING (doc_id)
""",
}
