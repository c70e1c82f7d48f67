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


# --- round-9 addition: t-closeness audit ------------------------------------

# threshold t = T_CLOSE_NUM / T_CLOSE_DEN (0.3 — the value the original
# paper's experiments center on)
T_CLOSE_NUM = 3
T_CLOSE_DEN = 10


def t_closeness(
    docs: DataFrame,
    quasi: tuple[str, ...] = ("source", "len_bin"),
    sensitive: str = "lang",
    t_num: int = T_CLOSE_NUM,
    t_den: int = T_CLOSE_DEN,
) -> DataFrame:
    """(quasi..., n_docs, tv_num, t_close, meets_t): t-closeness audit
    (Li, Li & Venkatasubramanian 2007) — the third member of the
    release-gate trio.  l-diversity's blind spot is SKEW: a group can
    have l distinct sensitive values yet a wildly different
    distribution from the corpus (the "similarity attack" /
    skewness attack).  t-closeness bounds, per quasi-identifier
    group, the distance between the group's sensitive-value
    distribution and the GLOBAL one; this audit uses total variation
    distance (the categorical-attribute instantiation of the paper's
    EMD, ground distance 1).

    Engine-exactness: TV = 0.5 * sum_s |n_cs/n_c - n_s/n| is computed
    as the INTEGER numerator  tv_num = sum_s |n_cs*n - n_s*n_c|  over
    the full (class x sensitive-value) grid (absent combinations
    contribute n_s*n_c — they are real distribution mass the class is
    missing), then ONE division  t_close = tv_num / (2.0*n_c*n);  the
    gate compares exact integers only:  meets_t <=> tv_num*t_den <=
    2*t_num*n_c*n, with BOTH gate products lifted to DECIMAL(38,0)
    on both engines (ADVICE r9 #2: tv_num itself can reach 2*n_c*n,
    so int64 gate products would silently wrap near ~7e8 docs in
    Spark's non-ANSI longs while DuckDB errors — engine divergence).
    Headroom after the lift: the binding constraint is the single
    int64 term n_cs*n < 2^63, i.e. ~3e9 documents; past that lift the
    term products to DECIMAL(38,0) as well.

    NULL sensitive values are coalesced to the sentinel '<NULL>'
    BEFORE grouping (both engines — ADVICE r9 #4): an equality join on
    the raw column would never match a NULL, double-counting a class's
    NULL-sensitive docs as both missing class mass and global surplus
    (tv_num could exceed its 2*n_c*n bound).  The sentinel makes NULL
    an ordinary category, which is the audit semantics a release gate
    wants.

    100 TB shape: three map-side-combined hash aggs on bounded key
    spaces (quasi-id grid, sensitive cardinality, their product); the
    grid join is broadcast-sized by construction; zero data-sized
    exchanges beyond the scans."""
    docs = docs.withColumn(
        sensitive, F.coalesce(F.col(sensitive), F.lit("<NULL>"))
    )
    cls = docs.groupBy(*quasi).agg(F.count(F.lit(1)).cast("long").alias("n_c"))
    sv = docs.groupBy(sensitive).agg(F.count(F.lit(1)).cast("long").alias("n_s"))
    tot = docs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    cs = docs.groupBy(*quasi, sensitive).agg(
        F.count(F.lit(1)).cast("long").alias("n_cs")
    )
    grid = cls.crossJoin(F.broadcast(sv)).crossJoin(F.broadcast(tot))
    j = grid.join(cs, [*quasi, sensitive], "left").select(
        *quasi,
        "n_c",
        "n",
        F.abs(
            F.coalesce(F.col("n_cs"), F.lit(0)) * F.col("n")
            - F.col("n_s") * F.col("n_c")
        ).alias("term"),
    )
    agg = j.groupBy(*quasi).agg(
        F.max("n_c").alias("n_docs"),
        F.max("n").alias("n"),
        F.sum("term").cast("long").alias("tv_num"),
    )
    return agg.select(
        *quasi,
        F.col("n_docs").cast("long").alias("n_docs"),
        "tv_num",
        (F.col("tv_num") / (F.lit(2.0) * F.col("n_docs") * F.col("n"))).alias(
            "t_close"
        ),
        (
            F.col("tv_num").cast("decimal(38,0)") * F.lit(t_den)
            <= F.lit(2 * t_num) * F.col("n_docs").cast("decimal(38,0)") * F.col("n")
        ).alias("meets_t"),
    )


def _q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        F.expr("CAST(n_chars DIV 100 AS STRING)").alias("len_bin"),
        "lang",
    )
    return t_closeness(docs)


QUERIES.update({"privacy_t_closeness": _q_t_closeness})

ORACLES.update(
    {
        "privacy_t_closeness": f"""
WITH d AS (
  SELECT source, (n_chars // 100)::VARCHAR AS len_bin,
         COALESCE(lang, '<NULL>') AS lang
  FROM documents
),
cls AS (SELECT source, len_bin, count(*)::BIGINT AS n_c FROM d GROUP BY 1, 2),
sv AS (SELECT lang, count(*)::BIGINT AS n_s FROM d GROUP BY 1),
tot AS (SELECT count(*)::BIGINT AS n FROM d),
cs AS (
  SELECT source, len_bin, lang, count(*)::BIGINT AS n_cs
  FROM d GROUP BY 1, 2, 3
),
grid AS (
  SELECT cls.source, cls.len_bin, cls.n_c, tot.n, sv.lang, sv.n_s
  FROM cls CROSS JOIN sv CROSS JOIN tot
),
terms AS (
  SELECT g.source, g.len_bin, g.n_c, g.n,
         abs(COALESCE(cs.n_cs, 0) * g.n - g.n_s * g.n_c) AS term
  FROM grid g
  LEFT JOIN cs ON cs.source = g.source AND cs.len_bin = g.len_bin
             AND cs.lang = g.lang
)
SELECT source, len_bin, max(n_c)::BIGINT AS n_docs,
       sum(term)::BIGINT AS tv_num,
       sum(term)::BIGINT / (2.0 * max(n_c) * max(n)) AS t_close,
       sum(term)::DECIMAL(38,0) * {T_CLOSE_DEN}
         <= {2 * T_CLOSE_NUM} * max(n_c)::DECIMAL(38,0) * max(n)
         AS meets_t
FROM terms GROUP BY 1, 2
""",
    }
)
