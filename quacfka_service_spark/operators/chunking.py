"""RAG-style document chunking: fixed-size token windows with overlap.

Every retrieval pipeline over a 100 TB corpus chunks documents into
embedding-sized windows before indexing (the chunk table is what
``similarity_*`` then searches).  This is the canonical sliding-window
splitter: window of ``window`` whitespace tokens advancing by
``stride`` (< window ⇒ overlap of window-stride tokens preserves
context across boundaries).

100 TB shape: pure map + bounded fan-out.  Tokenize once per doc, emit
``ceil(n/stride)`` chunk rows via an exploded integer ``sequence`` —
no shuffle anywhere, no UDF; the whole operator is one projection the
scan streams through.  Fan-out is ~n_tokens/stride per doc (bounded by
doc length), never corpus-shaped.

Engine-exactness: tokens are ``split(trim(text), '\\s+')`` with empty
strings filtered — the same tokenizer contract text.py pins cross-
engine — and chunk text is rejoined with single spaces, so the DuckDB
oracle reproduces chunk ids, token counts, and chunk text verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table

CHUNK_WINDOW = 64
CHUNK_STRIDE = 48


def chunk_windows(
    docs: DataFrame, window: int = CHUNK_WINDOW, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """Sliding token windows per document.

    Output: (doc_id, chunk_id, n_tokens, chunk_text) — chunk_id is the
    0-based window index, start token = chunk_id * stride, n_tokens =
    min(window, n - start).  Documents with no tokens emit nothing.
    """
    if not (0 < stride <= window):
        raise ValueError("need 0 < stride <= window")
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != "")
    t = docs.select("doc_id", toks.alias("toks")).withColumn("n", F.size("toks"))
    start = F.col("chunk_id") * stride
    return (
        t.where(F.col("n") > 0)
        .select(
            "doc_id",
            "toks",
            "n",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.floor((F.col("n") - 1) / stride).cast("int"),
                    F.lit(1),
                )
            ).alias("chunk_id"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.least(F.lit(window), F.col("n") - start).cast("long").alias("n_tokens"),
            F.array_join(F.slice(F.col("toks"), start + 1, window), " ").alias(
                "chunk_text"
            ),
        )
    )


# --- queries()/oracle_sql() registrations ---------------------------------


def _q_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_windows(load_table(spark, sf_dir, "documents"))


QUERIES = {"corpus_chunk_windows": _q_chunks}

ORACLES = {
    "corpus_chunk_windows": f"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x != '') AS toks
  FROM documents
),
s AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
c AS (
  SELECT doc_id, toks, n,
         unnest(generate_series(0, (n - 1) // {CHUNK_STRIDE}))::BIGINT AS chunk_id
  FROM s
)
SELECT doc_id, chunk_id,
       least({CHUNK_WINDOW}, n - chunk_id * {CHUNK_STRIDE})::BIGINT AS n_tokens,
       array_to_string(
         toks[chunk_id * {CHUNK_STRIDE} + 1 :
              chunk_id * {CHUNK_STRIDE} + {CHUNK_WINDOW}], ' ') AS chunk_text
FROM c
""",
}
