"""Incremental (streaming) HyperLogLog — the sketch twin of the
incremental IVF/PQ/semdedup family.

The batch ``events_approx_distinct`` rescans all events per run; at
100 TB you maintain the SKETCH per micro-batch and never touch history.
HLL registers are exactly the mergeable state for that: max-merge per
(event_type, bucket) over any partitioning of the input equals the
registers of the union (pinned for the batch op in test_lm.py's HLL
suite; re-pinned end-to-end here).

Per micro-batch (``process_batch``): build the arriving batch's
registers with the SAME ``hll_registers`` column algebra the batch
operator uses (map-side md5 + one sketch-sized partial agg) and append
them to a txlog table with an (app, epoch) txn — replayed epochs are
dropped, so no event is ever double-counted.  State grows by at most
|event_types| x 4096 rows per epoch; ``compact()`` folds the history
back to one row per register as a rewrite commit whenever the log gets
long (cost: sketch-sized, never data-sized).

``estimate()`` max-merges the accumulated registers and runs the SAME
``hll_estimate`` tail as the batch operator.  Invariant (pinned by
tests/test_incremental_hll.py): after any sequence of batches,
``estimate()`` equals ``hll_distinct(union_of_batches)`` — estimate,
nonzero_buckets AND the register checksum — for any batching, replays
included.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.olap import hll_estimate, hll_registers
from ..sinks.txlog import TxTable


class IncrementalHLL:
    """Stateful driver for streaming HLL maintenance over a txlog
    table.  Use inside ``foreachBatch``::

        sk = IncrementalHLL(root)
        def body(batch_df, epoch_id):
            sk.process_batch(batch_df, epoch_id)
    """

    APP_ID = "incremental-hll"

    def __init__(self, root: str, key: str = "user_id"):
        self.regs = TxTable(f"{root}/registers")
        self.key = key

    def process_batch(self, ev: DataFrame, epoch: int) -> int:
        """Append the batch's registers; returns the committed version
        (replay = no-op)."""
        return self.regs.append(
            hll_registers(ev, self.key),
            txn={"app_id": self.APP_ID, "epoch": epoch},
        )

    def _merged(self, spark: SparkSession) -> DataFrame:
        return (
            self.regs.read(spark)
            .groupBy("event_type", "bucket")
            .agg(F.max("r").alias("r"))
        )

    def estimate(self, spark: SparkSession) -> DataFrame:
        """(event_type, hll_users, nonzero_buckets, registers_md5) over
        everything ingested so far — identical tail to the batch
        operator, so results match ``hll_distinct`` over the union
        exactly."""
        return hll_estimate(self._merged(spark))

    def compact(self, spark: SparkSession) -> int:
        """Fold the append history back to one row per live register —
        a sketch-sized overwrite; safe any time (max-merge is
        idempotent), keeps the table O(|types| x 4096) regardless of
        epoch count."""
        merged = self._merged(spark).localCheckpoint(eager=True)
        return self.regs.overwrite(merged)


class IncrementalCMS:
    """Streaming Count-Min Sketch — the frequency twin of
    ``IncrementalHLL``: counters SUM-merge where registers max-merge,
    everything else is the same txlog shape.  ``heavy_hitters()``
    point-queries the merged sketch for a caller-supplied candidate
    frame (vec of keys) with the SAME d-hash min the batch operator
    uses.  Pinned: merged counters == batch ``cms_counters`` over the
    union for any batching; replay no-op.  NOTE compact() is NOT
    replay-safe interleaved with appends of the same epoch window —
    run it between epochs, like OPTIMIZE."""

    APP_ID = "incremental-cms"

    def __init__(self, root: str, key: str = "user_id"):
        self.counters = TxTable(f"{root}/counters")
        self.key = key

    def process_batch(self, ev: DataFrame, epoch: int) -> int:
        from ..operators.olap import cms_counters

        return self.counters.append(
            cms_counters(ev, self.key),
            txn={"app_id": self.APP_ID, "epoch": epoch},
        )

    def merged(self, spark: SparkSession) -> DataFrame:
        return (
            self.counters.read(spark)
            .groupBy("row", "col")
            .agg(F.sum("n").alias("n"))
        )

    def compact(self, spark: SparkSession) -> int:
        folded = self.merged(spark).localCheckpoint(eager=True)
        return self.counters.overwrite(folded)


class IncrementalQuantile:
    """Streaming histogram-quantile sketch — the distribution twin of
    ``IncrementalHLL``/``IncrementalCMS``: (type, bin) counts
    SUM-merge like CMS counters, and the readout shares
    ``quantiles_from_bins`` verbatim with the batch operator, so
    ``quantiles()`` equals ``hist_quantiles`` over the union of every
    ingested batch for ANY batching (replay = txn no-op).  State is
    bounded by value-range/0.01 bins per event type, independent of
    event count."""

    APP_ID = "incremental-quantile"

    def __init__(self, root: str):
        self.bins = TxTable(f"{root}/bins")

    def process_batch(self, ev: DataFrame, epoch: int) -> int:
        from ..operators.olap import value_bins

        return self.bins.append(
            value_bins(ev), txn={"app_id": self.APP_ID, "epoch": epoch}
        )

    def merged(self, spark: SparkSession) -> DataFrame:
        return (
            self.bins.read(spark)
            .groupBy("event_type", "bin")
            .agg(F.sum("n").alias("n"))
        )

    def quantiles(self, spark: SparkSession) -> DataFrame:
        from ..operators.olap import quantiles_from_bins

        return quantiles_from_bins(self.merged(spark))

    def compact(self, spark: SparkSession) -> int:
        folded = self.merged(spark).localCheckpoint(eager=True)
        return self.bins.overwrite(folded)
