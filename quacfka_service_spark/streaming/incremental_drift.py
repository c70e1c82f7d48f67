"""Incremental (streaming) distribution-drift monitor — the online
data-quality gate (VERDICT r6 #8), completing the HLL/CMS twin family.

The batch ``corpus_drift_tv`` rescans the corpus per run; at 100 TB you
maintain the per-source hashed-token HISTOGRAM per micro-batch and
never touch history.  Integer (source, dim, s_cnt) counts are exactly
the mergeable state for that: histograms built per epoch and SUM-merged
equal the histogram of the union for any batching (the same argument as
the CMS counters), so the monitor's TV numbers are not approximations
of the batch operator's — they are bit-identical to it.

Per micro-batch (``process_batch``): build the arriving batch's
histogram with the SAME ``source_dim_counts`` column algebra the batch
operator uses (one explode -> map-side-combined count, |sources| x dim
rows) and append it to a txlog table with an (app, epoch) txn —
replayed epochs are dropped, so no token is ever double-counted.  State
grows by at most |sources| x dim rows per epoch; ``compact()`` folds
history to one row per (source, dim) as a histogram-sized rewrite.

Two readouts, both over the accumulated state:

- ``drift(spark)``: each source vs the accumulated CORPUS-WIDE
  distribution — equals ``drift_tv(union_of_batches)`` exactly
  (pinned in tests/test_incremental_drift.py for any batching,
  replays included).
- ``drift_vs_reference(spark)``: each source vs a FROZEN reference
  histogram (``freeze_reference``) — the online gate shape: freeze the
  accepted corpus release's histogram once, then alert when an
  arriving source's TV against it crosses a threshold, catching a
  broken scraper or boilerplate flood mid-ingest instead of at release
  QA.  Uses the same exact-BIGINT ``tv_against`` tail, so the alert
  numbers are engine-exact too.

100 TB shape: every exchange in sight is histogram-sized (|sources| x
dim, dim = 64), never data-sized; the corpus-sized work per epoch is
the one explode+count over just the arriving batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.importance import source_dim_counts, tv_against
from ..operators.text import HASH_DIM
from ..sinks.txlog import TxTable


class IncrementalDrift:
    """Stateful driver for streaming drift maintenance over txlog
    tables.  Use inside ``foreachBatch``::

        mon = IncrementalDrift(root)
        mon.freeze_reference(accepted_release_docs)  # once
        def body(batch_df, epoch_id):
            mon.process_batch(batch_df, epoch_id)
    """

    APP_ID = "incremental-drift"

    def __init__(self, root: str, dim: int = HASH_DIM):
        self.counts = TxTable(f"{root}/counts")
        self.reference = TxTable(f"{root}/reference")
        self.dim = dim

    def freeze_reference(self, docs: DataFrame) -> int:
        """Overwrite the frozen reference histogram with ``docs``'s
        corpus-wide (dim, c_cnt) counts — run once on the accepted
        release (idempotent: overwrite, not append)."""
        cd = (
            source_dim_counts(docs, self.dim)
            .groupBy("dim")
            .agg(F.sum("s_cnt").alias("c_cnt"))
        )
        return self.reference.overwrite(cd)

    def process_batch(self, docs: DataFrame, epoch: int) -> int:
        """Append the batch's histogram; returns the committed version
        (replay = no-op)."""
        return self.counts.append(
            source_dim_counts(docs, self.dim),
            txn={"app_id": self.APP_ID, "epoch": epoch},
        )

    def merged(self, spark: SparkSession) -> DataFrame:
        return (
            self.counts.read(spark)
            .groupBy("source", "dim")
            .agg(F.sum("s_cnt").alias("s_cnt"))
        )

    def drift(self, spark: SparkSession) -> DataFrame:
        """(source, s_total, tv_num, tv) vs the accumulated corpus-wide
        distribution — identical tail to the batch operator, so equals
        ``drift_tv`` over the union of all ingested batches exactly."""
        sd = self.merged(spark)
        cd = sd.groupBy("dim").agg(F.sum("s_cnt").alias("c_cnt"))
        return tv_against(sd, cd)

    def drift_vs_reference(self, spark: SparkSession) -> DataFrame:
        """(source, s_total, tv_num, tv) vs the FROZEN reference
        histogram — the per-epoch online gate number."""
        return tv_against(self.merged(spark), self.reference.read(spark))

    def compact(self, spark: SparkSession) -> int:
        """Fold the append history to one row per (source, dim) — a
        histogram-sized overwrite; safe any time (SUM-merge is
        associative), keeps the table O(|sources| x dim) regardless of
        epoch count."""
        folded = self.merged(spark).localCheckpoint(eager=True)
        return self.counts.overwrite(folded)
