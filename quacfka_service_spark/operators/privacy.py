"""PII detection / redaction over ``documents``.

A training-data pipeline must strip emails, phone numbers, and IP
addresses before a corpus ships.  All detection and replacement is
JVM-side ``regexp_extract_all`` / ``regexp_replace`` (whole-stage
codegen, no Python in the hot path); at 100 TB this is a pure map —
zero shuffles, scales linearly, and the parquet scan prunes to
``doc_id, text``.

The regex subset used here (character classes, ``\\d``, ``\\b``,
bounded/unbounded repetition) behaves identically in Java regex
(Spark) and RE2 (DuckDB), which is what makes the oracle exact.

The fixture corpus contains no real PII, so the registered query
plants synthetic PII deterministically from ``doc_id`` (both engines
build the identical string) and then redacts it — the check exercises
real matches rather than passing vacuously on zero replacements
(lesson from round 1's ``dedup_embedding``; see VERDICT.md "What's
wrong" #1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table

# Applied in this order; replacement tokens contain no digits or '@',
# so a later pattern can never match inside an earlier redaction.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phones", r"\+\d[\d-]{7,}\d", "<PHONE>"),
    ("ips", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Counts per PII class (on the original text) + redacted text.
    Counting before replacing keeps the counts independent of pattern
    order."""
    text = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
        .cast("long")
        .alias(f"n_{name}")
        for name, pat, _tok in PII_PATTERNS
    ]
    red: Column = text
    for _name, pat, tok in PII_PATTERNS:
        red = F.regexp_replace(red, pat, tok)
    return docs.select("doc_id", *counts, red.alias("redacted"))


def _planted(docs: DataFrame) -> DataFrame:
    """Deterministically append synthetic PII derived from doc_id."""
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-01"),
            F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
            F.lit(" from 10."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".0.1"),
        ).alias("text"),
    )


def pii_stats_by_source(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The privacy dashboard: per-source totals of each PII class plus
    how many documents carry ANY hit — what a compliance review reads
    before a corpus ships, and the per-domain signal that points at
    the crawler feed that needs fixing.  Pure map (the same codegen
    regex counts as redact_pii) + one combined agg onto the
    source-cardinality key space."""
    text = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
        .cast("long")
        .alias(f"n_{name}")
        for name, pat, _tok in PII_PATTERNS
    ]
    per_doc = docs.select("source", *counts)
    any_hit = sum(F.col(f"n_{name}") for name, _p, _t in PII_PATTERNS)
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(any_hit > 0, 1).otherwise(0)).cast("long").alias("n_docs_with_pii"),
            *[F.sum(f"n_{name}").alias(f"n_{name}") for name, _p, _t in PII_PATTERNS],
        )
    )


K_ANON = 5


def k_anonymize(
    docs: DataFrame, quasi: tuple[str, ...] = ("source", "lang", "len_bin"), k: int = K_ANON
) -> DataFrame:
    """k-anonymity suppression over quasi-identifier combinations —
    the other half of the privacy release gate beside ``redact_pii``:
    redaction strips direct identifiers; suppression keeps rare
    ATTRIBUTE COMBINATIONS (the classic linkage-attack surface,
    Sweeney 2002) out of published per-group statistics.  Any group
    of fewer than ``k`` documents has its quasi-identifiers recoded
    to ``<SUPPRESSED>`` and is re-aggregated into one bucket, so
    every released row describes >= k documents or is the labeled
    suppression remainder.

    Expects ``len_bin`` pre-derived (the registered query bins
    n_chars DIV 100 — integer-exact on both engines).

    100 TB shape: two map-side-combined hash aggs on the quasi-id key
    space (bounded by attribute cardinalities, not corpus size); zero
    data-sized exchanges."""
    g = docs.groupBy(*quasi).agg(F.count(F.lit(1)).alias("n"))
    rec = g.select(
        *[
            F.when(F.col("n") >= k, F.col(c).cast("string"))
            .otherwise(F.lit("<SUPPRESSED>"))
            .alias(c)
            for c in quasi
        ],
        "n",
    )
    return rec.groupBy(*quasi).agg(F.sum("n").cast("long").alias("n_docs"))


# --- queries()/oracle_sql() registrations ---------------------------------

def _q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return redact_pii(_planted(load_table(spark, sf_dir, "documents")))


def _q_pii_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    planted = _planted(docs).join(docs.select("doc_id", "source"), "doc_id")
    return pii_stats_by_source(planted)


def _q_k_anonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "lang", F.expr("CAST(n_chars DIV 100 AS STRING)").alias("len_bin")
    )
    return k_anonymize(docs)


QUERIES = {
    "pii_redact": _q_pii_redact,
    "pii_stats_by_source": _q_pii_stats,
    "privacy_k_anonymity": _q_k_anonymize,
}

_PLANT_SQL = (
    "text || ' contact user' || doc_id::VARCHAR || '@example.com or +1-555-01'"
    " || lpad((doc_id % 100)::VARCHAR, 2, '0')"
    " || ' from 10.' || (doc_id % 256)::VARCHAR || '.0.1'"
)

ORACLES = {
    "privacy_k_anonymity": f"""
WITH g AS (
  SELECT source, lang, (n_chars // 100)::VARCHAR AS len_bin,
         count(*)::BIGINT AS n
  FROM documents GROUP BY 1, 2, 3
),
rec AS (
  SELECT CASE WHEN n >= {K_ANON} THEN source ELSE '<SUPPRESSED>' END AS source,
         CASE WHEN n >= {K_ANON} THEN lang ELSE '<SUPPRESSED>' END AS lang,
         CASE WHEN n >= {K_ANON} THEN len_bin ELSE '<SUPPRESSED>' END AS len_bin,
         n
  FROM g
)
SELECT source, lang, len_bin, sum(n)::BIGINT AS n_docs
FROM rec GROUP BY 1, 2, 3
""",
    "pii_stats_by_source": rf"""
WITH planted AS (
  SELECT d.source,
         len(regexp_extract_all(p.text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}'))::BIGINT AS n_emails,
         len(regexp_extract_all(p.text, '\+\d[\d-]{{7,}}\d'))::BIGINT AS n_phones,
         len(regexp_extract_all(p.text, '\b\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\b'))::BIGINT AS n_ips
  FROM (SELECT doc_id, {_PLANT_SQL} AS text FROM documents) p
  JOIN documents d USING (doc_id)
)
SELECT source, count(*)::BIGINT AS n_docs,
       sum(CASE WHEN n_emails + n_phones + n_ips > 0 THEN 1 ELSE 0 END)::BIGINT AS n_docs_with_pii,
       sum(n_emails)::BIGINT AS n_emails,
       sum(n_phones)::BIGINT AS n_phones,
       sum(n_ips)::BIGINT AS n_ips
FROM planted GROUP BY source
""",
    "pii_redact": rf"""
WITH planted AS (
  SELECT doc_id, {_PLANT_SQL} AS text FROM documents
)
SELECT
  doc_id,
  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}'))::BIGINT AS n_emails,
  len(regexp_extract_all(text, '\+\d[\d-]{{7,}}\d'))::BIGINT AS n_phones,
  len(regexp_extract_all(text, '\b\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\b'))::BIGINT AS n_ips,
  regexp_replace(
    regexp_replace(
      regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
      '\+\d[\d-]{{7,}}\d', '<PHONE>', 'g'),
    '\b\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\b', '<IP>', 'g') AS redacted
FROM planted
""",
}


# --- round-8 addition: l-diversity audit ------------------------------------

L_DIVERSITY = 3


def l_diversity(
    docs: DataFrame,
    quasi: tuple[str, ...] = ("source", "len_bin"),
    sensitive: str = "lang",
    l: int = L_DIVERSITY,
) -> DataFrame:
    """(quasi..., n_docs, l_distinct, meets_l): distinct-l-diversity
    audit (Machanavajjhala et al. 2007) — k-anonymity's blind spot is
    a large group whose SENSITIVE attribute is uniform (the
    "homogeneity attack": group size k tells you nothing if all k
    share the secret).  Reports, per quasi-identifier group, the
    number of distinct sensitive values and whether it clears ``l``.
    Release gate = k_anonymize AND meets_l.

    All integer arithmetic (count, exact distinct-count, one
    comparison) — engine-exact by construction.

    100 TB shape: one hash agg on the bounded quasi-id key space; the
    exact distinct costs Catalyst's expand rewrite on the same key
    space (sensitive cardinality is attribute-bounded)."""
    g = docs.groupBy(*quasi).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct(sensitive).cast("long").alias("l_distinct"),
    )
    return g.select(
        *quasi, "n_docs", "l_distinct", (F.col("l_distinct") >= l).alias("meets_l")
    )


def _q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        F.expr("CAST(n_chars DIV 100 AS STRING)").alias("len_bin"),
        "lang",
    )
    return l_diversity(docs)


QUERIES.update({"privacy_l_diversity": _q_l_diversity})

ORACLES.update(
    {
        "privacy_l_diversity": f"""
SELECT source, (n_chars // 100)::VARCHAR AS len_bin,
       count(*)::BIGINT AS n_docs,
       count(DISTINCT lang)::BIGINT AS l_distinct,
       count(DISTINCT lang) >= {L_DIVERSITY} AS meets_l
FROM documents
GROUP BY 1, 2
""",
    }
)
