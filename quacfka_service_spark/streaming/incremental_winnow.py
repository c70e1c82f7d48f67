"""Incremental winnowing dedup — the streaming twin of
``operators/text.winnow_candidates`` (MOSS fingerprint pairing).

Winnowing is the cheapest incremental dedup family in the repo: a
document's fingerprint sketch depends ONLY on its own text (unlike
ExactSubstr's corpus-count filter or MinHash LSH's banding census), so
ingest = sketch the new docs once and append; ``result()`` = the pair
join over the store.  No retroactivity complication exists — an old
doc's sketch never changes — which is why per-epoch NEW-PAIR emission
would actually be sound here (new x all ∪ nothing), but the uniform
ingest-once + query-the-store contract is kept for symmetry with the
other incremental dedupers.

Replay safety: appends carry (app_id, epoch) txn ids — a replayed
micro-batch is a log-detected no-op (doubled fingerprint rows would
inflate n_shared counts).

100 TB shape: ingest is the token-linear winnowing pass on the new
docs only (~2/(W+1) density out); the store is partitioned by a
fingerprint prefix so the candidate join's shuffle is pre-spread;
``result()`` cost tracks shared-fingerprint mass, never corpus^2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import winnowing_fp
from ..sinks.txlog import TxTable


class IncrementalWinnowDeduper:
    """Stateful driver for incremental MOSS candidate pairing over a
    txlog fingerprint store.

    Use inside ``foreachBatch``::

        dd = IncrementalWinnowDeduper(root)
        def body(batch_df, epoch_id):
            dd.process_batch(batch_df, epoch_id)
        ...
        dd.result(spark)   # == winnow_candidates(everything ingested)
    """

    APP_ID = "incremental-winnow"

    def __init__(self, root: str):
        self.fps = TxTable(f"{root}/fps")

    def process_batch(self, docs: DataFrame, epoch: int) -> int:
        """Sketch the batch once and append its distinct (doc_id, fp)
        rows; returns the table version (replay = no-op)."""
        new = (
            winnowing_fp(docs.select("doc_id", "text"))
            .select("doc_id", "fp")
            .distinct()
            .withColumn("fp_p", F.pmod("fp", F.lit(64)))  # 64-way prefix
        )
        return self.fps.append(
            new, partition_by=["fp_p"], txn={"app_id": self.APP_ID, "epoch": epoch}
        )

    def result(self, spark: SparkSession) -> DataFrame:
        """(doc_a, doc_b, n_shared) over everything ingested so far —
        the exact batch ``winnow_candidates`` contract over the
        union."""
        try:
            fps = self.fps.read(spark).select("doc_id", "fp")
        except ValueError:  # nothing ingested yet
            return spark.createDataFrame(
                [], "doc_a long, doc_b long, n_shared long"
            )
        a, b = fps.alias("a"), fps.alias("b")
        return (
            a.join(
                b,
                (F.col("a.fp") == F.col("b.fp"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        )
