"""Text-analysis operators over the ``documents`` table.

Beyond the reference's surface (BASELINE.json north star): the
operations a large-scale training-data pipeline needs.  Everything here
is built-in ``pyspark.sql.functions`` — higher-order array functions
and regexes run JVM-side inside whole-stage codegen; there are no
Python UDFs, so the hot path scales linearly with executors and the
parquet scan prunes to the ``text`` column only.

Determinism: ratios are integer/integer divisions computed identically
in Spark and DuckDB, so doubles match bit-for-bit (FIXTURES.md §5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import load_table

STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "on", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "para"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2", "you3"],
}
_LANG_ORDER = ["en", "de", "fr", "es", "zh"]


def _words(col):
    return F.split(F.trim(F.lower(col)), r"\s+")


def _count_in(words, vocab: list[str]):
    arr = F.array(*[F.lit(w) for w in vocab])
    return F.size(F.filter(words, lambda w: F.array_contains(arr, w))).cast("long")


def _quality_from_words(w):
    """The `quality` score over an already-split words column/expr —
    shared by text_quality and quality_expr so the two can never
    drift (the curation oracles hash-pin these exact doubles)."""
    n_words = F.size(w).cast("long")
    stop_hits = _count_in(w, STOPWORDS["en"])
    return F.least(F.lit(1.0), n_words / F.lit(100.0)) * (
        F.lit(1.0) - (stop_hits / n_words) * F.lit(0.5)
    )


def quality_expr(text):
    """text_quality's `quality` as a pure column expression over a raw
    text column — for call sites that fold the score into an existing
    scan (corpus.py's curation filters) instead of joining
    ``text_quality(docs)`` back on doc_id (r11: the join was 2 extra
    documents scans + a doc_id self-join per use; doc_id-unique inner
    joins of a per-row map are row-preserving, so the fold is exact)."""
    return _quality_from_words(_words(text))


def text_quality(docs: DataFrame) -> DataFrame:
    """Quality scoring: length/stopword/punctuation ratios -> score."""
    words = _words(F.col("text"))
    d = docs.select("doc_id", "text", words.alias("w"))
    n_words = F.size("w").cast("long")
    char_sum = F.aggregate("w", F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
    stop_hits = _count_in(F.col("w"), STOPWORDS["en"])
    non_alnum = F.length(F.regexp_replace(F.lower(F.col("text")), r"[a-z0-9\s]", ""))
    # ANSI mode (Spark 4 default) throws DIVIDE_BY_ZERO on integral
    # division; a zero-length text must yield NULL punct_ratio, not
    # kill the corpus job.  (n_words is never 0: split('') is [''].)
    text_len = F.nullif(F.length("text").cast("long"), F.lit(0).cast("long"))
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        (char_sum / n_words).alias("avg_word_len"),
        (stop_hits / n_words).alias("stopword_ratio"),
        (non_alnum.cast("long") / text_len).alias("punct_ratio"),
        _quality_from_words(F.col("w")).alias("quality"),
    )


def _lang_pred_from_words(w):
    """lang_id's priority-ordered stopword-argmax CASE over an
    already-split words column/expr."""
    counts = {lg: _count_in(w, STOPWORDS[lg]) for lg in _LANG_ORDER}
    pred = None
    for i, lg in enumerate(_LANG_ORDER):
        cond = None
        for other in _LANG_ORDER[i + 1:]:
            c = counts[lg] >= counts[other]
            cond = c if cond is None else (cond & c)
        branch = F.lit(lg)
        if pred is None:
            pred = F.when(cond, branch)
        elif cond is not None:
            pred = pred.when(cond, branch)
        else:
            pred = pred.otherwise(branch)
    return pred


def lang_pred_expr(text):
    """lang_id's `lang_pred` as a pure column expression over a raw
    text column — same inline-into-the-scan contract as
    ``quality_expr`` (see there)."""
    return _lang_pred_from_words(_words(text))


def lang_id(docs: DataFrame) -> DataFrame:
    """Language-ID by stopword-hit argmax with a fixed priority order —
    the classic n-gram/stopword heuristic, expressed as pure column
    algebra so the DuckDB oracle reproduces it exactly."""
    d = docs.select("doc_id", _words(F.col("text")).alias("w"))
    return d.select("doc_id", _lang_pred_from_words(F.col("w")).alias("lang_pred"))


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens (letters / digits /
    punctuation runs), both JVM-side regex."""
    return docs.select(
        "doc_id",
        F.size(_words(F.col("text"))).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)).cast("long").alias("re_tokens"),
    )


_FP_MOD = 2147483647  # 2^31 - 1
_FP_MUL = 1000003


def rolling_fingerprint(docs: DataFrame) -> DataFrame:
    """Polynomial rolling hash over the token stream:
    h = (h * 1000003 + code(token)) mod (2^31-1), with a cheap portable
    token code (length, first and last char) — engine-agnostic integer
    arithmetic, so the DuckDB oracle reproduces it bit-for-bit.  All
    JVM-side higher-order functions; order-sensitive by construction
    (unlike the md5-of-normalized-text fingerprint, a reordered
    document hashes differently)."""
    w = _words(F.col("text"))
    code = lambda t: (  # noqa: E731
        F.length(t).cast("long") * 131
        + F.ascii(F.substring(t, 1, 1)).cast("long") * 31
        + F.ascii(t.substr(F.length(t), F.lit(1))).cast("long")
    )
    codes = F.transform(w, code)
    h = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: F.pmod(acc * _FP_MUL + c, F.lit(_FP_MOD)),
    )
    return docs.select("doc_id", h.alias("rolling_fp"))


TOP_BIGRAMS_K = 20


def top_bigrams(docs: DataFrame, k: int = TOP_BIGRAMS_K) -> DataFrame:
    """Corpus-level top-k word bigrams.  The bigram array references
    the materialized words column (not an inline split — the
    projection-collapse trap, see _shingles in dedup.py); the top-k is
    a total order (n DESC, bigram ASC) so ties at the cut are
    deterministic.  Physically: explode -> partial-agg count -> one
    shuffle -> TakeOrdered, no sort of the full corpus."""
    d = docs.select(_words(F.col("text")).alias("w"))
    bi = F.when(
        F.size("w") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("w") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(F.col("w"), i), F.element_at(F.col("w"), i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ex = d.select(F.explode_outer(bi).alias("bigram")).where(F.col("bigram").isNotNull())
    return (
        ex.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(k)
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprint: md5 over the normalized token stream
    (lowercase, strip non-alphanumerics, collapse whitespace)."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9 ]", ""),
            r" +", " ",
        )
    )
    return docs.select("doc_id", F.md5(norm).alias("fp"))


HASH_DIM = 64


def hash_features(docs: DataFrame, dim: int = HASH_DIM) -> DataFrame:
    """The feature-hashing trick: each document becomes a fixed-``dim``
    sparse count vector — token t lands in dimension md5(t) % dim —
    the classic no-vocabulary text featurizer (hashing a stream into a
    bounded space; what Vowpal-style linear models and cheap dedup /
    clustering baselines run on).  No vocabulary table, no fit step,
    so NEW tokens at inference hash to the same dims — the property
    that makes it streaming-safe.

    Output (doc_id, dim, weight): sparse nonzero entries, integer
    counts — bit-exact cross-engine (the md5 bucket is split.py's
    idiom applied to the token string).

    100 TB shape: one explode + ONE map-side-combined count agg on
    (doc_id, dim) — the key carries doc_id, so Zipf-hot tokens spread
    across documents instead of hot-spotting a reducer; output is at
    most ``dim`` rows per doc.  _spread (r12): the tokenize +
    md5-per-token CPU otherwise inherits the raw scan's 1-2 splits
    (single-row-group fixture files) and serializes on one core; no-op
    whenever the scan itself has enough splits — see dedup._spread."""
    from .dedup import CPU_SPREAD_TARGET_BYTES, _spread

    toks = _spread(docs, CPU_SPREAD_TARGET_BYTES, "doc_id").select(
        "doc_id", F.explode_outer(_words(F.col("text"))).alias("tok")
    ).where(F.col("tok").isNotNull() & (F.col("tok") != ""))
    d = F.pmod(
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long"),
        F.lit(dim),
    )
    return (
        toks.select("doc_id", d.alias("dim"))
        .groupBy("doc_id", "dim")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def text_clean(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Web-corpus text normalization: strip HTML-ish tags, drop control
    characters, collapse runs of whitespace, trim.  Emits the cleaned
    text plus audit counters (tags removed, chars delta) — a cleaning
    stage that can't report what it changed is undebuggable at corpus
    scale.  Pure regexp_replace chain: zero shuffles, codegen, and the
    same Java-regex-portable character classes as pii_redact."""
    t = F.col(text_col)
    n_tags = F.size(F.regexp_extract_all(t, F.lit(r"<[^>]+>"), F.lit(0))).cast("long")
    no_tags = F.regexp_replace(t, r"<[^>]+>", " ")
    no_ctrl = F.regexp_replace(no_tags, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", " ")
    clean = F.trim(F.regexp_replace(no_ctrl, r"\s+", " "))
    return docs.select(
        "doc_id",
        clean.alias("clean_text"),
        n_tags.alias("n_tags_removed"),
        (F.length(t) - F.length(clean)).cast("long").alias("chars_removed"),
    )


def _dirty(docs: DataFrame) -> DataFrame:
    """Deterministically append synthetic markup/control dirt derived
    from doc_id (same planted pattern as privacy._planted — the fixture
    corpus is already clean, so cleaning it would be vacuous)."""
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" <b>ad-"),
            F.col("doc_id").cast("string"),
            F.lit("</b>\t\tcall  now!<br/>\x07 "),
        ).alias("text"),
    )


# --- queries()/oracle_sql() registrations ---------------------------------

def _q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_quality(load_table(spark, sf_dir, "documents"))


def _q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_id(load_table(spark, sf_dir, "documents"))


def _q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_count(load_table(spark, sf_dir, "documents"))


def _q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprint(load_table(spark, sf_dir, "documents"))


def _q_rolling_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rolling_fingerprint(load_table(spark, sf_dir, "documents"))


def _q_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    return top_bigrams(load_table(spark, sf_dir, "documents"))


def _q_text_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_clean(_dirty(load_table(spark, sf_dir, "documents")))


def _q_hash_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hash_features(load_table(spark, sf_dir, "documents"))


QUERIES = {
    "text_quality": _q_text_quality,
    "text_lang_id": _q_lang_id,
    "text_token_count": _q_token_count,
    "text_fingerprint": _q_fingerprint,
    "text_rolling_fp": _q_rolling_fp,
    "text_top_bigrams": _q_top_bigrams,
    "text_clean": _q_text_clean,
    "text_hash_features": _q_hash_features,
}


def _sql_list(vocab: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in vocab) + "]"


_COUNTS = {
    lg: f"len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), w -> list_contains({_sql_list(v)}, w)))"
    for lg, v in STOPWORDS.items()
}

_LANG_CASE = "CASE\n"
for _i, _lg in enumerate(_LANG_ORDER):
    _conds = [f"{_COUNTS[_lg]} >= {_COUNTS[_o]}" for _o in _LANG_ORDER[_i + 1:]]
    if _conds:
        _LANG_CASE += f"  WHEN {' AND '.join(_conds)} THEN '{_lg}'\n"
    else:
        _LANG_CASE += f"  ELSE '{_lg}'\n"
_LANG_CASE += "END"

ORACLES = {
    "text_hash_features": f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
  FROM documents
)
SELECT doc_id,
       (('0x' || substr(md5(tok), 1, 8))::BIGINT % {HASH_DIM}) AS dim,
       count(*)::BIGINT AS weight
FROM toks WHERE tok IS NOT NULL AND tok <> ''
GROUP BY 1, 2
""",
    "text_clean": r"""
WITH dirty AS (
  SELECT doc_id,
         text || ' <b>ad-' || doc_id::VARCHAR || '</b>' || chr(9) || chr(9)
              || 'call  now!<br/>' || chr(7) || ' ' AS text
  FROM documents
),
c AS (
  SELECT doc_id, text,
         len(regexp_extract_all(text, '<[^>]+>'))::BIGINT AS n_tags,
         trim(regexp_replace(regexp_replace(regexp_replace(
             text, '<[^>]+>', ' ', 'g'),
             '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', ' ', 'g'),
             '\s+', ' ', 'g')) AS clean
  FROM dirty
)
SELECT doc_id, clean AS clean_text, n_tags AS n_tags_removed,
       (length(text) - length(clean))::BIGINT AS chars_removed
FROM c
""",
    "text_quality": f"""
WITH d AS (
  SELECT doc_id, text, regexp_split_to_array(trim(lower(text)), '\\s+') AS w FROM documents
)
SELECT
  doc_id,
  len(w)::BIGINT AS n_words,
  CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT) / CAST(len(w) AS BIGINT) AS avg_word_len,
  CAST(len(list_filter(w, x -> list_contains({_sql_list(STOPWORDS["en"])}, x))) AS BIGINT) / CAST(len(w) AS BIGINT) AS stopword_ratio,
  CAST(length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS BIGINT) / CAST(nullif(length(text), 0) AS BIGINT) AS punct_ratio,
  least(1.0, CAST(len(w) AS BIGINT) / 100.0)
    * (1.0 - (CAST(len(list_filter(w, x -> list_contains({_sql_list(STOPWORDS["en"])}, x))) AS BIGINT) / CAST(len(w) AS BIGINT)) * 0.5) AS quality
FROM d
""",
    "text_lang_id": f"""
SELECT doc_id, {_LANG_CASE} AS lang_pred FROM documents
""",
    "text_token_count": """
SELECT
  doc_id,
  len(regexp_split_to_array(trim(lower(text)), '\\s+'))::BIGINT AS ws_tokens,
  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))::BIGINT AS re_tokens
FROM documents
""",
    "text_fingerprint": """
SELECT doc_id,
       md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp
FROM documents
""",
    "text_rolling_fp": f"""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(regexp_split_to_array(trim(lower(text)), '\\s+'),
                          t -> CAST(length(t) AS BIGINT) * 131
                               + CAST(ascii(substring(t, 1, 1)) AS BIGINT) * 31
                               + CAST(ascii(right(t, 1)) AS BIGINT))),
         (acc, c) -> (acc * {_FP_MUL} + c) % {_FP_MOD}
       ) AS rolling_fp
FROM documents
""",
    "text_top_bigrams": f"""
WITH d AS (
  SELECT regexp_split_to_array(trim(lower(text)), '\\s+') AS w FROM documents
),
ex AS (
  SELECT unnest(CASE WHEN len(w) >= 2
                     THEN list_transform(generate_series(1, len(w) - 1),
                                         i -> w[i] || ' ' || w[i+1])
                     ELSE [] END) AS bigram
  FROM d
)
SELECT bigram, count(*) AS n
FROM ex GROUP BY bigram
ORDER BY n DESC, bigram ASC
LIMIT {TOP_BIGRAMS_K}
""",
}


# --- round-7 addition: per-document TF-IDF top-k --------------------------

TFIDF_TOP_K = 5


def tfidf_topk(docs: DataFrame, k: int = TFIDF_TOP_K) -> DataFrame:
    """(doc_id, term, tf, df, score, rank): top-k most
    document-characteristic terms — term frequency weighted against
    document frequency, the standard keyword/search-signal extraction
    over a corpus.

    Scoring uses LINEAR inverse document frequency (score = tf/df;
    equivalently tf*N/df with the constant N dropped): one IEEE
    division of two exact BIGINTs, bit-equal in both engines, so the
    driver hash-checks exact scores.  Classic log-idf compresses the
    ordering but needs ln() — cross-engine libm parity would fall back
    to the lm.py nanolog-quantization idiom; linear idf ranks
    rare-term-heavy docs the same way for the top-k cut and keeps the
    whole operator float-exact.  Tokens are the whitespace words of
    the shared ``_words`` normalizer (empty-string artifact of
    split('') filtered identically on both sides).

    100 TB shape: two corpus-sized map-side-combined aggs (tf keyed by
    (doc, term), df keyed by term), one term-keyed exchange pair for
    the join (vocabulary-sized right side — broadcast when it fits, or
    it degrades to co-partitioned shuffle on term), then the top-k
    window partitioned by doc_id.  No driver state, no all-pairs
    anything.
    """
    # _spread (r12): tokenize + explode otherwise rides the raw scan's
    # 1-2 splits and serializes the map side of BOTH aggs on one core;
    # see dedup._spread (no-op at scan scale).
    from .dedup import CPU_SPREAD_TARGET_BYTES, _spread

    ex = (
        _spread(docs, CPU_SPREAD_TARGET_BYTES, "doc_id")
        .select("doc_id", F.explode(_words(F.col("text"))).alias("term"))
        .where(F.col("term") != "")
    )
    tf = ex.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = ex.distinct().groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df_, "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        (F.col("tf").cast("double") / F.col("df")).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.select(
            "doc_id", "term", "tf", "df", "score",
            F.row_number().over(w).cast("long").alias("rank"),
        )
        .where(F.col("rank") <= k)
    )


def _q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf_topk(load_table(spark, sf_dir, "documents"))


QUERIES.update({"text_tfidf_topk": _q_tfidf})

ORACLES.update(
    {
        "text_tfidf_topk": f"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS w
  FROM documents
),
ex AS (SELECT doc_id, unnest(w) AS term FROM d),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM ex WHERE term <> '' GROUP BY 1, 2
),
df AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df
  FROM ex WHERE term <> '' GROUP BY 1
)
SELECT doc_id, term, tf, df, score, rank FROM (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         tf.tf::DOUBLE / df.df AS score,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf::DOUBLE / df.df DESC,
                                     tf.term ASC)::BIGINT AS rank
  FROM tf JOIN df USING (term)
) WHERE rank <= {TFIDF_TOP_K}
""",
    }
)


# --- round-7 addition: BM25 search ------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 20
BM25_QUERY = ["data", "model", "learning", "system", "quality"]


def bm25_search(docs: DataFrame, query: list = None, k: int = BM25_TOP_K) -> DataFrame:
    """(doc_id, score, rank): top-k documents for a bag-of-words query
    under BM25 (Robertson/Sparck Jones; the Okapi saturation formula)
    with LINEAR inverse document frequency (idf = N/df — same
    float-exactness argument as text_tfidf_topk; log-idf would need
    the lm.py nanolog idiom):

        score(d) = sum over query terms t of
            (N/df_t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    Parity: k1/b are decimal literals (both engines parse them to the
    same nearest double); dl/avgdl and N/df are single divisions of
    exact BIGINTs; the per-term scores are combined by a SEQUENTIAL
    fold over the (term-sorted) score list, so the <=|query|-term sum
    is bit-equal to the oracle's list_reduce — never an
    aggregation-order float sum.

    100 TB shape: the only corpus-sized work is the tf explode+agg
    filtered to the query terms (predicate on the exploded term — a
    |query|-element IN list, pushed before the agg); df/avgdl/N are
    broadcast scalars; the per-doc fold touches <=|query| entries; the
    final top-k is a TakeOrdered, no global sort.
    """
    query = BM25_QUERY if query is None else query
    ex = (
        docs.select(
            "doc_id", F.size(_words(F.col("text"))).alias("dl"),
            F.explode(_words(F.col("text"))).alias("term"),
        )
        .where(F.col("term") != "")
    )
    stats = docs.select(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    ).join(
        ex.agg(F.count(F.lit(1)).cast("long").alias("total_len"))
    )
    # query-term occurrences are |query|-bounded per doc and feed both
    # tf and df: checkpoint so the corpus explode+filter runs once
    # (r11, guide §5)
    qterms = ex.where(F.col("term").isin(query)).localCheckpoint(eager=False)
    tf = qterms.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf"), F.first("dl").alias("dl")
    )
    df_ = qterms.select("doc_id", "term").distinct().groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    k1, b = F.lit(BM25_K1), F.lit(BM25_B)
    avgdl = F.col("total_len") / F.col("n_docs")
    per_term = (
        tf.join(F.broadcast(df_), "term")
        .join(F.broadcast(stats))
        .select(
            "doc_id",
            "term",
            (
                (F.col("n_docs") / F.col("df"))
                * (F.col("tf") * (k1 + F.lit(1.0)))
                / (
                    F.col("tf")
                    + k1 * (F.lit(1.0) - b + b * (F.col("dl") / avgdl))
                )
            ).alias("s"),
        )
    )
    scored = per_term.groupBy("doc_id").agg(
        F.aggregate(
            F.transform(
                F.sort_array(F.collect_list(F.struct("term", "s"))), lambda x: x["s"]
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("score")
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "score", F.row_number().over(w).cast("long").alias("rank"))
    )


def _q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_search(load_table(spark, sf_dir, "documents"))


QUERIES.update({"text_bm25_search": _q_bm25})

_BM25_IN = ", ".join(f"'{t}'" for t in BM25_QUERY)

ORACLES.update(
    {
        "text_bm25_search": f"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS w
  FROM documents
),
ex AS (
  SELECT doc_id, len(w)::BIGINT AS dl, unnest(w) AS term FROM d
),
exq AS (SELECT * FROM ex WHERE term <> '' AND term IN ({_BM25_IN})),
stats AS (
  SELECT (SELECT count(*)::BIGINT FROM documents) AS n_docs,
         (SELECT count(*)::BIGINT FROM ex WHERE term <> '') AS total_len
),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf, min(dl) AS dl
  FROM exq GROUP BY 1, 2
),
df AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM exq GROUP BY 1
),
per_term AS (
  SELECT tf.doc_id, tf.term,
         -- every constant cast ::DOUBLE: DuckDB parses decimal
         -- literals as exact DECIMALs (tf * 2.2 would stay exact
         -- where Spark folds doubles -> 1-ulp drift)
         (stats.n_docs / df.df)
           * (tf.tf * ({BM25_K1}::DOUBLE + 1.0::DOUBLE))
           / (tf.tf + {BM25_K1}::DOUBLE * (1.0::DOUBLE - {BM25_B}::DOUBLE
                + {BM25_B}::DOUBLE * (tf.dl / (stats.total_len / stats.n_docs)))) AS s
  FROM tf JOIN df USING (term) CROSS JOIN stats
),
scored AS (
  SELECT doc_id,
         list_reduce(list_prepend(0.0, list_transform(
           list(s ORDER BY term), x -> x)), (a, b) -> a + b) AS score
  FROM per_term GROUP BY doc_id
)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank
  FROM scored
) WHERE rank <= {BM25_TOP_K}
""",
    }
)


# --- round-7 addition: Flesch readability -----------------------------------


def readability(docs: DataFrame) -> DataFrame:
    """(doc_id, n_words, n_sentences, n_syllables, flesch): Flesch
    reading-ease (Flesch 1948, the public formula) with the standard
    cheap proxies — sentences = runs of [.!?], syllables = vowel-group
    runs — the curation dial between text_quality's surface ratios and
    the LM scores.

        flesch = 206.835 - 1.015*(W/S) - 84.6*(Syl/W)

    Parity: the three counts are regex-run counts (identical simple
    character-class patterns both engines), S is floored at 1 (a
    fragment with no terminator is one sentence), W is never 0
    (split('') is ['']); the score is then single IEEE ops with every
    constant cast ::DOUBLE in the oracle (the BM25 decimal-literal
    lesson).  Map-only: zero exchanges.
    """
    w = F.size(_words(F.col("text"))).cast("long")
    s = F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.!?]+"), 0)).cast("long"),
        F.lit(1).cast("long"),
    )
    syl = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[aeiouy]+"), 0)
    ).cast("long")
    return docs.select(
        "doc_id",
        w.alias("n_words"),
        s.alias("n_sentences"),
        syl.alias("n_syllables"),
        (
            F.lit(206.835)
            - F.lit(1.015) * (w / s)
            - F.lit(84.6) * (syl / w)
        ).alias("flesch"),
    )


def _q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    return readability(load_table(spark, sf_dir, "documents"))


QUERIES.update({"text_readability": _q_readability})

ORACLES.update(
    {
        "text_readability": """
SELECT doc_id,
       len(regexp_split_to_array(trim(lower(text)), '\\s+'))::BIGINT AS n_words,
       greatest(len(regexp_extract_all(text, '[.!?]+'))::BIGINT, 1) AS n_sentences,
       len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT AS n_syllables,
       206.835::DOUBLE
         - 1.015::DOUBLE * (len(regexp_split_to_array(trim(lower(text)), '\\s+'))::BIGINT
                            / greatest(len(regexp_extract_all(text, '[.!?]+'))::BIGINT, 1))
         - 84.6::DOUBLE * (len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT
                           / len(regexp_split_to_array(trim(lower(text)), '\\s+'))::BIGINT)
         AS flesch
FROM documents
""",
    }
)


# --- round-7 addition: language-ID evaluation -------------------------------


def langid_confusion(docs: DataFrame) -> DataFrame:
    """(lang, lang_pred, n, class_total, recall): confusion matrix of
    the stopword language-ID against the labeled ``lang`` column — the
    evaluation loop for text_lang_id (a classifier without a measured
    confusion matrix is a guess).  Pure counts plus one division per
    cell (recall = n / class_total), all exact.

    100 TB shape: lang_id is map-only column algebra computed INLINE on
    the one documents scan (r11 — `lang_pred` is a pure per-row function
    of `text`, so the pre-r11 doc_id re-join of `lang_id(docs)` paid a
    second scan + a row-preserving self-join for nothing; same fold as
    corpus.py's `_lang_quality_filtered`); the matrix agg is
    |langs|^2-bounded with map-side combine; class totals ride a
    broadcast of the |langs|-row aggregate.
    """
    joined = docs.select("lang", lang_pred_expr(F.col("text")).alias("lang_pred"))
    cells = joined.groupBy("lang", "lang_pred").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    totals = cells.groupBy("lang").agg(F.sum("n").cast("long").alias("class_total"))
    return cells.join(F.broadcast(totals), "lang").select(
        "lang",
        "lang_pred",
        "n",
        "class_total",
        (F.col("n") / F.col("class_total")).alias("recall"),
    )


def _q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return langid_confusion(load_table(spark, sf_dir, "documents"))


QUERIES.update({"corpus_langid_confusion": _q_langid_confusion})

ORACLES.update(
    {
        "corpus_langid_confusion": f"""
WITH pred AS (
  SELECT doc_id, {_LANG_CASE} AS lang_pred FROM documents
),
cells AS (
  SELECT d.lang, p.lang_pred, count(*)::BIGINT AS n
  FROM documents d JOIN pred p USING (doc_id)
  GROUP BY 1, 2
),
totals AS (SELECT lang, sum(n)::BIGINT AS class_total FROM cells GROUP BY 1)
SELECT c.lang, c.lang_pred, c.n, t.class_total,
       c.n / t.class_total AS recall
FROM cells c JOIN totals t USING (lang)
""",
    }
)


# --- round-7 addition: length/quality correlation ----------------------------


def length_quality_corr(docs: DataFrame) -> DataFrame:
    """(n, mean_len, mean_quality, corr): Pearson correlation between
    document length (n_chars) and the text_quality score — the
    curation diagnostic behind every length-based filter ("is my
    quality score just a length proxy?"; |r| near 1 means a length
    cutoff would do the same job, near 0 means the score adds real
    signal).

    Exactness: x = n_chars is BIGINT; y and the cross/square terms are
    floor-quantized to integers (the pca.py idiom) so all five moment
    sums are exact under any aggregation order; the Pearson formula is
    then a handful of single IEEE ops on identical doubles — the
    driver hash-checks the correlation exactly.

    100 TB shape: the quality projection is map-only; ONE global agg
    row carries the five moments.
    """
    q = 1e12
    words = _words(F.col("text"))
    n_words = F.size(words).cast("long")
    stop_hits = _count_in(words, STOPWORDS["en"])
    quality = (
        F.least(F.lit(1.0), n_words / F.lit(100.0))
        * (F.lit(1.0) - (stop_hits / n_words) * F.lit(0.5))
    )
    d = docs.select(F.col("n_chars").alias("x"), quality.alias("y"))
    agg = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("decimal(38,0)").cast("double").alias("sx"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .cast("double")
        .alias("sxx"),
        F.sum(F.floor(F.col("y") * F.lit(q)).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .cast("double")
        .alias("syq"),
        F.sum(F.floor(F.col("y") * F.col("y") * F.lit(q)).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .cast("double")
        .alias("syyq"),
        F.sum(F.floor(F.col("x") * F.col("y") * F.lit(q)).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .cast("double")
        .alias("sxyq"),
    )
    n = F.col("n")
    sx, sxx = F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("syq") / q, F.col("syyq") / q, F.col("sxyq") / q
    num = n * sxy - sx * sy
    den = F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    return agg.select(
        n.alias("n"),
        (sx / n).alias("mean_len"),
        (sy / n).alias("mean_quality"),
        F.when(den > 0, num / den).alias("corr"),
    )


def _q_len_qual_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    return length_quality_corr(load_table(spark, sf_dir, "documents"))


QUERIES.update({"corpus_length_quality_corr": _q_len_qual_corr})

ORACLES.update(
    {
        "corpus_length_quality_corr": f"""
WITH w0 AS (
  SELECT n_chars::BIGINT AS x,
         regexp_split_to_array(trim(lower(text)), '\\s+') AS w
  FROM documents
),
d AS (
  SELECT x,
         least(1.0::DOUBLE, CAST(len(w) AS BIGINT) / 100.0::DOUBLE)
           * (1.0::DOUBLE
              - (CAST(len(list_filter(w, t -> list_contains({_sql_list(STOPWORDS["en"])}, t))) AS BIGINT)
                 / CAST(len(w) AS BIGINT)) * 0.5::DOUBLE) AS y
  FROM w0
),
agg AS (
  SELECT count(*)::BIGINT AS n,
         sum(x)::DOUBLE AS sx,
         sum(x * x)::DOUBLE AS sxx,
         sum(floor(y * 1e12)::BIGINT)::DOUBLE / 1e12 AS sy,
         sum(floor(y * y * 1e12)::BIGINT)::DOUBLE / 1e12 AS syy,
         sum(floor(x * y * 1e12)::BIGINT)::DOUBLE / 1e12 AS sxy
  FROM d
)
SELECT n, sx / n AS mean_len, sy / n AS mean_quality,
       CASE WHEN sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy) > 0
            THEN (n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) END AS corr
FROM agg
""",
    }
)


# --- round-7 addition: Heaps-law vocabulary growth ---------------------------

VOCAB_DECILES = 10


def vocab_growth(docs: DataFrame, n_buckets: int = VOCAB_DECILES) -> DataFrame:
    """(decile, n_docs, cum_tokens, cum_vocab): the vocabulary-growth
    (Heaps' law) curve — cumulative distinct terms vs cumulative
    tokens at corpus deciles in doc_id order.  The tokenizer-budget
    question ("is the vocabulary saturating or still growing?") read
    off a 10-row curve.

    Scale discipline: NO doc-cardinality global window — docs bucket
    by exact doc_id quantile cutoffs (map-only, the split_temporal
    idiom), each term's FIRST doc assigns its bucket (min doc_id — a
    term-keyed agg), per-bucket token/new-term counts are map-side
    combined, and the cumulative runs over the 10 bucket rows.  All
    integers; engine-exact.
    """
    from pyspark.sql.window import Window as W

    ex = docs.select(
        "doc_id", F.explode(_words(F.col("text"))).alias("term")
    ).where(F.col("term") != "")
    # 1-row cutoff frame, broadcast into three legs: checkpoint so the
    # percentile scan runs once, not once per leg (r11, guide §5 — 3
    # of the plan's 12 parquet scans were this subtree re-expanded).
    cuts = docs.agg(
        *[
            F.percentile(F.col("doc_id").cast("double"), F.lit(i / n_buckets)).alias(
                f"c{i}"
            )
            for i in range(1, n_buckets)
        ]
    ).localCheckpoint(eager=False)
    def bucket_of(col):
        b = F.lit(n_buckets)
        for i in range(n_buckets - 1, 0, -1):
            b = F.when(col <= F.col(f"c{i}"), F.lit(i)).otherwise(b)
        return b.cast("long")

    toks = (
        ex.join(F.broadcast(cuts))
        .select(bucket_of(F.col("doc_id").cast("double")).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("tokens"))
    )
    firsts = (
        ex.groupBy("term")
        .agg(F.min("doc_id").alias("first_doc"))
        .join(F.broadcast(cuts))
        .select(bucket_of(F.col("first_doc").cast("double")).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("new_terms"))
    )
    ndocs = (
        docs.join(F.broadcast(cuts))
        .select(bucket_of(F.col("doc_id").cast("double")).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    w = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    z = F.lit(0).cast("long")
    return (
        ndocs.join(toks, "b", "full")
        .join(firsts, "b", "full")
        .select(
            F.col("b").alias("decile"),
            F.coalesce("n_docs", z).alias("nd"),
            F.coalesce("tokens", z).alias("tk"),
            F.coalesce("new_terms", z).alias("nt"),
        )
        .select(
            "decile",
            F.sum("nd").over(w).cast("long").alias("n_docs"),
            F.sum("tk").over(w).cast("long").alias("cum_tokens"),
            F.sum("nt").over(w).cast("long").alias("cum_vocab"),
        )
    )


def _q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vocab_growth(load_table(spark, sf_dir, "documents"))


QUERIES.update({"corpus_vocab_growth": _q_vocab_growth})


def _vocab_growth_oracle() -> str:
    nb = VOCAB_DECILES
    cuts = ",\n         ".join(
        f"quantile_cont(doc_id::DOUBLE, {i / nb}) AS c{i}" for i in range(1, nb)
    )
    def bucket(col):
        expr = str(nb)
        for i in range(nb - 1, 0, -1):
            expr = f"CASE WHEN {col} <= c{i} THEN {i} ELSE {expr} END"
        return f"CAST({expr} AS BIGINT)"
    return f"""
WITH cuts AS (
  SELECT {cuts}
  FROM documents
),
ex AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
  FROM documents
),
exf AS (SELECT * FROM ex WHERE term <> ''),
toks AS (
  SELECT {bucket('doc_id::DOUBLE')} AS b, count(*)::BIGINT AS tokens
  FROM exf, cuts GROUP BY 1
),
firsts AS (
  SELECT {bucket('first_doc::DOUBLE')} AS b, count(*)::BIGINT AS new_terms
  FROM (SELECT term, min(doc_id) AS first_doc FROM exf GROUP BY 1), cuts
  GROUP BY 1
),
nd AS (
  SELECT {bucket('doc_id::DOUBLE')} AS b, count(*)::BIGINT AS n_docs
  FROM documents, cuts GROUP BY 1
),
merged AS (
  SELECT coalesce(nd.b, toks.b, firsts.b) AS decile,
         coalesce(n_docs, 0) AS nd, coalesce(tokens, 0) AS tk,
         coalesce(new_terms, 0) AS nt
  FROM nd FULL OUTER JOIN toks ON nd.b = toks.b
          FULL OUTER JOIN firsts ON coalesce(nd.b, toks.b) = firsts.b
)
SELECT decile,
       sum(nd) OVER w::BIGINT AS n_docs,
       sum(tk) OVER w::BIGINT AS cum_tokens,
       sum(nt) OVER w::BIGINT AS cum_vocab
FROM merged
WINDOW w AS (ORDER BY decile ROWS UNBOUNDED PRECEDING)
"""


ORACLES.update({"corpus_vocab_growth": _vocab_growth_oracle()})


# --- round-8 addition: per-document token entropy ----------------------------


def token_entropy(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_types, entropy): Shannon entropy (nats) of
    each document's token distribution — the repetition/diversity dial
    the Gopher-style quality suite reads next to text_repetition: near
    0 means the doc is one token stamped over and over (boilerplate,
    degenerate generations), ln(n_types) means perfectly even usage.
    entropy = -sum_t (c_t/n) ln(c_t/n).

    Exactness: each log term rides lm.py's SNAPPED micro-nat quantizer
    (1-ulp-safe, the test_lm_ulp_stability discipline), each term is
    the exact integer c_t * qlog(c_t/n), per-doc sums are exact, and
    the emitted entropy is two IEEE divisions of the exact sum —
    hash-identical across engines.  Empty docs are kept at entropy 0
    (a quality gate must see them).

    100 TB shape: one map-side-combined (doc, token) count, one
    doc-keyed agg — the wordcount pair, nothing corpus-quadratic."""
    from .lm import _qlog

    toks = (
        docs.select("doc_id", F.explode_outer(_words(F.col("text"))).alias("tok"))
        .where(F.col("tok").isNotNull() & (F.col("tok") != ""))
    )
    # The (doc, token) count table feeds the per-doc totals, the term
    # projection AND the empty-doc anti-join spine: checkpoint it so
    # the tokenize+wordcount pass runs once (r11, guide §5 — the plan
    # re-expanded it under all three; the anti-join previously paid a
    # third full tokenize just to list non-empty doc_ids).
    # Fault-tolerance trade (ADVICE r11): localCheckpoint is
    # non-reliable executor storage — lineage is truncated, so losing
    # an executor mid-query fails the JOB (retry = rerun the query),
    # it cannot silently recompute the lost blocks.  Accepted here and
    # at every eager=False site in this repo because the checkpointed
    # frames are aggregate/sketch-sized (this one is the (doc, tok)
    # count table, already a groupBy output — bounded by distinct
    # pairs, far below raw corpus rows) and the alternative is N full
    # corpus passes per query; a reliable checkpoint would add a
    # distributed-FS round-trip of the same bytes to every run.
    ct = (
        toks.groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    per = ct.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )
    # ct and per are both hash-partitioned on doc_id after their aggs,
    # so the term join adds no exchange
    terms = ct.join(per, "doc_id").select(
        "doc_id",
        "n_tokens",
        "n_types",
        (
            F.col("c")
            * _qlog(F.col("c").cast("double") / F.col("n_tokens").cast("double"))
        ).cast("long").alias("term"),
    )
    return (
        terms.groupBy("doc_id", "n_tokens", "n_types")
        .agg(F.sum("term").cast("long").alias("s"))
        .select(
            "doc_id",
            "n_tokens",
            "n_types",
            (-F.col("s").cast("double") / F.col("n_tokens") / F.lit(1e6)).alias(
                "entropy"
            ),
        )
        .unionByName(
            docs.join(ct.select("doc_id").distinct(), "doc_id", "left_anti")
            .select(
                "doc_id",
                F.lit(0).cast("long").alias("n_tokens"),
                F.lit(0).cast("long").alias("n_types"),
                F.lit(0.0).alias("entropy"),
            )
        )
    )


def _q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_entropy(load_table(spark, sf_dir, "documents"))


QUERIES.update({"text_token_entropy": _q_token_entropy})

ORACLES.update(
    {
        "text_token_entropy": r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
  FROM documents
),
ct AS (
  SELECT doc_id, tok, count(*)::BIGINT AS c
  FROM toks WHERE tok IS NOT NULL AND tok <> '' GROUP BY 1, 2
),
per AS (
  SELECT doc_id, sum(c)::BIGINT AS n_tokens, count(*)::BIGINT AS n_types
  FROM ct GROUP BY 1
),
terms AS (
  SELECT ct.doc_id,
         ct.c * CAST(floor((floor(ln(ct.c::DOUBLE / p.n_tokens::DOUBLE) * 1e9)
                            + 500) / 1000.0) AS BIGINT) AS term
  FROM ct JOIN per p USING (doc_id)
),
scored AS (
  SELECT p.doc_id, p.n_tokens, p.n_types,
         -sum(t.term)::DOUBLE / p.n_tokens / 1e6 AS entropy
  FROM per p JOIN terms t USING (doc_id)
  GROUP BY 1, 2, 3
)
SELECT doc_id, n_tokens, n_types, entropy FROM scored
UNION ALL
SELECT d.doc_id, 0::BIGINT, 0::BIGINT, 0.0::DOUBLE
FROM documents d LEFT JOIN per USING (doc_id)
WHERE per.doc_id IS NULL
""",
    }
)


# --- round-8 closing addition: winnowing fingerprints -----------------------

WINNOW_K = 4  # tokens per gram
WINNOW_W = 4  # selection window (full windows only, Schleimer et al.)


def _winnow_code(t):
    """The rolling_fingerprint token code — reused verbatim so the
    hash family's engine parity is already proven."""
    return (
        F.length(t).cast("long") * 131
        + F.ascii(F.substring(t, 1, 1)).cast("long") * 31
        + F.ascii(t.substr(F.length(t), F.lit(1))).cast("long")
    )


def winnowing_fp(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, fp): the winnowing fingerprint sketch (Schleimer,
    Wilkerson & Aiken 2003 — the MOSS algorithm): hash every
    WINNOW_K-token gram, slide a WINNOW_W-window over the hash stream,
    and in each window select the minimal hash at its RIGHTMOST
    in-window position.  Guarantee: any shared token run of at least
    K + W - 1 tokens shares a selected fingerprint, while only
    ~2/(W+1) of grams are kept — the density/recall contract that
    makes fingerprint-sketch dedup sound.

    Docs with fewer than W grams fall back to one whole-doc window
    (their minimal gram is still selected); docs shorter than K tokens
    emit nothing.

    All portable integer arithmetic (the rolling_fp token code + the
    same MUL/MOD fold), windows/joins only — engine-exact.

    100 TB shape: the gram stream is token-linear with a doc_id
    window (ROWS frame over consecutive offsets); the rightmost-min
    pick joins on (doc_id, hash) equi keys with a W-bounded range
    residual; output is density-compressed (~2/(W+1) of grams)."""
    # ROW formulation, not array HOFs: an element_at(codes, i+j) gram
    # build re-inlines the whole codes array (regex split + per-token
    # code) into EVERY reference (projection collapse — the repo-wide
    # trap), going quadratic per document (measured 175 s at sf0.1).
    # Exploding tokens once and folding over lead() columns evaluates
    # each token code exactly once and each gram as four row-level
    # pmod steps — the same ((0*M+c0)%MOD...) fold order, same values.
    # _spread (r12): tokenize otherwise rides the raw scan's 1-2
    # splits, and spreading BY doc_id pre-establishes the exact
    # hash(doc_id) distribution every window below requires — one
    # explicit-count exchange replaces an AQE byte-coalesced one
    # (~1 MB/partition of exploded stream vs the per-doc window CPU
    # it feeds); see dedup._spread.
    from .dedup import CPU_SPREAD_TARGET_BYTES, _spread

    toks = _spread(docs, CPU_SPREAD_TARGET_BYTES, "doc_id").select(
        "doc_id", F.posexplode(_words(F.col("text"))).alias("idx", "tok")
    ).select("doc_id", (F.col("idx") + 1).alias("off"), _winnow_code(F.col("tok")).alias("c"))
    wlead = Window.partitionBy("doc_id").orderBy("off")
    lead_cols = [F.lead("c", j).over(wlead).alias(f"c{j}") for j in range(1, WINNOW_K)]
    seq = toks.select("doc_id", "off", F.col("c").alias("c0"), *lead_cols)
    acc = F.lit(0).cast("long")
    for j in range(WINNOW_K):
        acc = F.pmod(acc * _FP_MUL + F.col(f"c{j}"), F.lit(_FP_MOD))
    grams_row = seq.where(F.col(f"c{WINNOW_K - 1}").isNotNull()).select(
        "doc_id", "off", acc.alias("h")
    )
    wm = Window.partitionBy("doc_id")
    occ = grams_row.select(
        "doc_id", "off", "h", F.count(F.lit(1)).over(wm).alias("m")
    )
    win = Window.partitionBy("doc_id").orderBy("off").rowsBetween(0, WINNOW_W - 1)
    starts = (
        occ.select("doc_id", "m", "off", F.min("h").over(win).alias("hmin"))
        .where(
            F.col("off")
            <= F.greatest(F.lit(1), F.col("m") - F.lit(WINNOW_W - 1))
        )
        .select("doc_id", F.col("off").alias("s"), "hmin")
    )
    o = occ.select(
        F.col("doc_id").alias("o_doc"),
        F.col("off").alias("o_off"),
        F.col("h").alias("o_h"),
    )
    sel = (
        starts.join(
            o,
            (F.col("doc_id") == F.col("o_doc"))
            & (F.col("o_h") == F.col("hmin"))
            & (F.col("o_off") >= F.col("s"))
            & (F.col("o_off") <= F.col("s") + WINNOW_W - 1),
        )
        .groupBy("doc_id", "s", "hmin")
        .agg(F.max("o_off").alias("pos"))
    )
    return sel.select(
        "doc_id", F.col("pos").cast("long").alias("pos"), F.col("hmin").alias("fp")
    ).distinct()


def _q_winnowing_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    return winnowing_fp(load_table(spark, sf_dir, "documents"))


def winnow_candidates(docs: DataFrame) -> DataFrame:
    """(doc_a, doc_b, n_shared): document pairs sharing at least one
    winnowing fingerprint, with the count of distinct shared
    fingerprints — the MOSS candidate generator (high n_shared =
    near-certain template/plagiarism pair; the K+W-1 guarantee bounds
    the false-negative length).

    100 TB shape: the self-join keys on fp — cost tracks shared-
    fingerprint mass, never corpus^2; a stop-fp cap (drop fps in > T
    docs) is the standard hub guard at web scale."""
    # fingerprint table (linear in corpus, ~1 fp per W-window) feeds
    # BOTH self-join sides: checkpoint so the windowed rolling-hash
    # pipeline runs once, not twice (r11, guide §5)
    fps = (
        winnowing_fp(docs)
        .select("doc_id", "fp")
        .distinct()
        .localCheckpoint(eager=False)
    )
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )


def _q_winnow_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return winnow_candidates(load_table(spark, sf_dir, "documents"))


QUERIES.update(
    {
        "text_winnowing_fp": _q_winnowing_fp,
        "dedup_winnow_candidates": _q_winnow_candidates,
    }
)

_WINNOW_FP_SQL = f"""
WITH wt AS (
  SELECT doc_id,
         list_transform(regexp_split_to_array(trim(lower(text)), '\\s+'),
                        t -> CAST(length(t) AS BIGINT) * 131
                             + CAST(ascii(substring(t, 1, 1)) AS BIGINT) * 31
                             + CAST(ascii(right(t, 1)) AS BIGINT)) AS codes
  FROM documents
),
g AS (
  SELECT doc_id,
         CASE WHEN len(codes) >= {WINNOW_K}
              THEN list_transform(generate_series(1, len(codes) - {WINNOW_K} + 1),
                   i -> list_reduce(
                          list_prepend(CAST(0 AS BIGINT),
                                       codes[i:i + {WINNOW_K} - 1]),
                          (acc, cd) -> (acc * {_FP_MUL} + cd) % {_FP_MOD}))
              ELSE [] END AS gh
  FROM wt
),
o AS (
  SELECT doc_id, unnest(gh) AS h, generate_subscripts(gh, 1) AS off,
         len(gh) AS m
  FROM g WHERE len(gh) > 0
),
mn AS (
  SELECT doc_id, off AS s, m,
         min(h) OVER (PARTITION BY doc_id ORDER BY off
                      ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING)
           AS hmin
  FROM o
),
st AS (SELECT doc_id, s, hmin FROM mn WHERE s <= greatest(1, m - {WINNOW_W - 1})),
sel AS (
  SELECT st.doc_id, st.s, st.hmin AS fp, max(o.off) AS pos
  FROM st JOIN o ON o.doc_id = st.doc_id AND o.h = st.hmin
                AND o.off BETWEEN st.s AND st.s + {WINNOW_W - 1}
  GROUP BY 1, 2, 3
)
SELECT DISTINCT doc_id, pos::BIGINT AS pos, fp::BIGINT AS fp FROM sel
"""

ORACLES.update(
    {
        "text_winnowing_fp": _WINNOW_FP_SQL,
        "dedup_winnow_candidates": f"""
WITH fps AS (SELECT DISTINCT doc_id, fp FROM ({_WINNOW_FP_SQL}))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_shared
FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
""",
    }
)
