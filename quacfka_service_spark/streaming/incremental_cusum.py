"""Incremental (streaming) CUSUM changepoint monitor — the rate-shift
twin of IncrementalDrift, completing the online data-quality family
(drift = distribution shift, CUSUM = RATE shift).

The batch ``events_ts_changepoint`` rescans the event log per run; the
streaming form maintains per-(event_type, hour) COUNTS — integers,
exactly mergeable: per-epoch counts SUM-merged equal the counts of the
union for ANY batching, so the monitor's changepoints are bit-identical
to the batch operator over everything ingested (the readout literally
calls the same ``cusum_from_hourly`` tail).

Per micro-batch (``process_batch``): one map-side-combined
(type, hour) count over just the arriving rows, appended to a txlog
table with an (app, epoch) txn — replayed epochs are dropped, no event
double-counts.  State grows by <= |types| x |hours touched| rows per
epoch; ``compact()`` folds history to one row per (type, hour)
(calendar-bounded, never data-sized).

Ops use: run ``changepoints(spark)`` after each epoch and alert when
the top statistic for a type jumps — a broken producer or a traffic
regime change surfaces mid-ingest, with the exact same number the
offline batch job would compute.

100 TB shape: every exchange is hourly-histogram-sized (|types| x
calendar hours); the corpus-sized work per epoch is one count over the
arriving batch only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.timeseries import CUSUM_TOP_K, cusum_from_hourly
from ..sinks.txlog import TxTable


class IncrementalCusum:
    """Stateful driver for streaming changepoint maintenance over a
    txlog table.  Use inside ``foreachBatch``::

        mon = IncrementalCusum(root)
        def body(batch_df, epoch_id):
            mon.process_batch(batch_df, epoch_id)
    """

    APP_ID = "incremental-cusum"

    def __init__(self, root: str):
        self.counts = TxTable(f"{root}/counts")

    def process_batch(self, ev: DataFrame, epoch: int) -> int:
        """Append the batch's (type, hour) counts; returns the
        committed version (replayed epoch = no-op)."""
        hourly = ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("h")
        ).agg(F.count(F.lit(1)).alias("c"))
        return self.counts.append(
            hourly, txn={"app_id": self.APP_ID, "epoch": epoch}
        )

    def merged(self, spark: SparkSession) -> DataFrame:
        return (
            self.counts.read(spark)
            .groupBy("event_type", "h")
            .agg(F.sum("c").alias("c"))
        )

    def changepoints(self, spark: SparkSession, k: int = CUSUM_TOP_K) -> DataFrame:
        """(event_type, h, stat, rank): the batch operator's exact
        output over the union of everything ingested."""
        return cusum_from_hourly(self.merged(spark), k)

    def compact(self, spark: SparkSession) -> int:
        """Fold the append history to one row per (type, hour) —
        calendar-bounded overwrite; safe any time (SUM is
        associative)."""
        folded = self.merged(spark).localCheckpoint(eager=True)
        return self.counts.overwrite(folded)
