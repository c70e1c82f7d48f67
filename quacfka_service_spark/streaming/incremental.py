"""Incremental (streaming) near-dup detection against an accumulated
corpus — the shape a 100 TB dedup pipeline actually runs.

The batch operator (``operators/dedup.py`` minhash_lsh_pairs) rescans
the whole corpus; at 100 TB you cannot re-pair petabytes per arriving
micro-batch.  The incremental form keeps two txlog tables (ACID, so a
replayed epoch is idempotent):

- ``corpus``  — (doc_id, text), appended per epoch
- ``buckets`` — (doc_id, band, bh) LSH bucket memberships per epoch

Per micro-batch (reference analog: per rotated file, main.go:276-317):

1. append the batch's docs + its LSH buckets (txn-id'd: a replay of
   the same epoch is dropped by the txlog, so pairs are never emitted
   twice for a retried batch);
2. candidate pairs = THIS batch's buckets joined against the
   accumulated bucket store (old∪new) — new×old plus new×new, never
   old×old, so each pair is emitted exactly once, when its later doc
   arrives;
3. exact-verify candidates with true shingle Jaccard over the corpus
   table, semi-join-pruned to candidate doc_ids only.

Invariant (pinned by tests/test_incremental_dedup.py): after any
sequence of batches, the union of per-epoch pair emissions equals
``minhash_lsh_pairs`` over the full corpus — same pairs, same jaccard
values, regardless of how rows were batched.

100 TB shape: step 2's join is (band, bh) bucket-keyed — cost tracks
candidates, not corpus²; with the bucket store hash-partitioned on
(band, bh) (bucketed layout, sinks/bucketed.py) the accumulated side
never reshuffles.  Step 3 touches only candidate docs.  Nothing ever
rescans the accumulated corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    JACCARD_THRESHOLD,
    N_BANDS,
    ROWS_PER_BAND,
    doc_shingles,
    minhash_signatures_from_shingles,
)
from ..sinks.txlog import TxTable


def _lsh_buckets(sig: DataFrame) -> DataFrame:
    bands = []
    for bi in range(N_BANDS):
        cols = [F.col(f"mh_{bi * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)]
        bands.append(F.struct(F.lit(bi).alias("band"), F.hash(*cols).alias("bh")))
    return sig.select("doc_id", F.explode(F.array(*bands)).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh")
    )


class IncrementalDeduper:
    """Stateful driver for incremental LSH dedup over txlog tables.

    Use inside ``foreachBatch``::

        dd = IncrementalDeduper(root)
        def body(batch_df, epoch_id):
            pairs = dd.process_batch(batch_df, epoch_id)
            pairs.write.mode("append").parquet(out)
    """

    APP_ID = "incremental-dedup"

    def __init__(self, root: str, threshold: float = JACCARD_THRESHOLD):
        self.corpus = TxTable(f"{root}/corpus")
        self.buckets = TxTable(f"{root}/buckets")
        self.threshold = threshold

    def process_batch(self, docs: DataFrame, epoch: int) -> DataFrame:
        """Append the batch; return the verified near-dup pairs whose
        LATER doc arrived in this batch (eagerly materialized — the
        returned frame does not depend on mutable table state)."""
        spark = docs.sparkSession
        docs = docs.select("doc_id", "text")
        new_buckets = _lsh_buckets(
            minhash_signatures_from_shingles(doc_shingles(docs))
        )

        txn = {"app_id": self.APP_ID, "epoch": epoch}
        before = self.buckets.latest_version()
        self.corpus.append(docs, txn={"app_id": f"{self.APP_ID}-corpus", "epoch": epoch})
        after = self.buckets.append(new_buckets, txn=txn)
        if after == before:
            # replayed epoch: txlog dropped the duplicate commit, so
            # this batch's pairs were already emitted — emit nothing.
            return spark.createDataFrame(
                [], "doc_a long, doc_b long, jaccard double"
            )

        store = self.buckets.read(spark)  # accumulated, incl. this batch
        a = new_buckets.alias("a")
        b = store.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bh") == F.col("b.bh"))
                & (F.col("a.doc_id") != F.col("b.doc_id")),
            )
            # canonical orientation + "later doc is new" dedup: the NEW
            # doc may be either side; least/greatest collapses both
            .select(
                F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
                F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"),
            )
            .distinct()
        )
        corpus_now = self.corpus.read(spark)
        cand_ids = cand.select(F.col("doc_a").alias("doc_id")).union(
            cand.select(F.col("doc_b").alias("doc_id"))
        ).distinct()
        sh_cand = doc_shingles(
            corpus_now.join(cand_ids, "doc_id", "left_semi")
        )
        sh_a = sh_cand.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
        sh_b = sh_cand.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
        verified = (
            cand.join(sh_a, "doc_a")
            .join(sh_b, "doc_b")
            .select(
                "doc_a",
                "doc_b",
                (
                    F.size(F.array_intersect("sh_a", "sh_b"))
                    / F.size(F.array_union("sh_a", "sh_b"))
                ).alias("jaccard"),
            )
            .where(F.col("jaccard") >= F.lit(self.threshold))
        )
        return verified.localCheckpoint(eager=True)
