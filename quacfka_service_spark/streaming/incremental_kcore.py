"""Incremental k-core — the streaming twin of
``operators/graph.kcore_neardup`` (dense-mutual-cluster detection over
the ngram-Jaccard near-dup graph).

Split of labor (the IncrementalSubstringDeduper argument, applied to
graphs): a document's SHINGLE SET depends only on its own text, so
ingest explodes and appends it exactly once; everything corpus-global
— the df-cap census (an old shingle can become hot when new documents
arrive), the pair join, and the peel itself — runs in ``result()``
over the stored stream.  Per-epoch CORE emission is not offered for
the same retroactivity reason doubled: a new document can both create
edges into history AND push an old shingle over the cap, so "this
epoch's core delta" would have to re-open every prior epoch; the
honest contract is ingest-once + query-the-store.

Equality is structural, not re-derived: ``result()`` feeds the stored
stream through the SAME `_jaccard_pairs_from_exploded` tail the batch
operator uses and the SAME `kcore_from_pairs` peel — after any
sequence of batches (including replays), result() == batch
``kcore_neardup`` over the union (tests/test_incremental_kcore.py).

Replay safety: appends carry (app_id, epoch) txn ids — a replayed
micro-batch is a log-detected no-op.  Idempotence is CORRECTNESS
here: doubled shingle rows would double intersection counts AND
document frequencies, corrupting both the Jaccard and the cap.

100 TB shape: ingest is the scan-speed shingle pass on new docs only;
the store is partitioned by a shingle-hash prefix so the census and
pair-join shuffles are pre-spread; result() inherits the batch
operator's edge-mass peel economics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import _jaccard_pairs_from_exploded, doc_shingles
from ..operators.graph import KCORE_K, KCORE_MAX_PEELS, kcore_from_pairs
from ..sinks.txlog import TxTable


class IncrementalKCore:
    """Stateful driver for incremental k-core over a txlog shingle
    store.

    Use inside ``foreachBatch``::

        kc = IncrementalKCore(root)
        def body(batch_df, epoch_id):
            kc.process_batch(batch_df, epoch_id)
        ...
        kc.result(spark)   # == kcore_neardup(everything ingested)
    """

    APP_ID = "incremental-kcore"

    def __init__(self, root: str, k: int = KCORE_K, max_peels: int = KCORE_MAX_PEELS):
        self.shingles = TxTable(f"{root}/shingles")
        self.k = k
        self.max_peels = max_peels

    def process_batch(self, docs: DataFrame, epoch: int) -> int:
        """Explode the batch's shingles once and append; returns the
        table version (replay = no-op)."""
        new = (
            doc_shingles(docs.select("doc_id", "text"))
            .select("doc_id", F.explode_outer("sh").alias("s"))
            .where(F.col("s").isNotNull())
            .withColumn("sp", F.pmod(F.xxhash64("s"), F.lit(64)))  # 64-way prefix
        )
        return self.shingles.append(
            new, partition_by=["sp"], txn={"app_id": self.APP_ID, "epoch": epoch}
        )

    def result(self, spark: SparkSession) -> DataFrame:
        """(doc_id, degree) over everything ingested so far — the
        exact batch ``kcore_neardup`` contract over the union."""
        try:
            ex_all = self.shingles.read(spark).select("doc_id", "s")
        except ValueError:  # nothing ingested yet
            return spark.createDataFrame([], "doc_id long, degree long")
        pairs = _jaccard_pairs_from_exploded(ex_all).select("doc_a", "doc_b")
        return kcore_from_pairs(pairs, self.k, self.max_peels)
