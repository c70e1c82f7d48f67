"""Incremental (streaming) semantic dedup — the SemDeDup twin of
``streaming/incremental.py``'s LSH pattern.

Batch ``semantic_dedup`` re-pairs the whole corpus per run; at 100 TB
you cannot re-score petabytes of within-cell pairs per arriving
micro-batch.  The incremental form keeps TWO txlog tables (ACID, so a
replayed epoch is idempotent):

- ``cells``   — (vec_id, v, nrm, cell) appended per epoch under a
  FROZEN codebook (train/refresh the codebook offline, like the
  incremental IVF index) and hive-partitioned by cell.
- ``dropped`` — (vec_id) of every vector with a lower-vec_id in-cell
  neighbor at cosine >= threshold, discovered so far.

Per micro-batch: drop edges are emitted for new x accumulated (BOTH
directions) plus new x new — never accumulated x accumulated — so each
qualifying pair is examined exactly once, at the epoch its
later-ARRIVING side lands.  Leadership is by vec_id, not arrival
order: a late-arriving LOW id demotes previously-kept higher ids (the
``new-as-a-side x old-as-b-side`` edge set covers this), which is what
makes the invariant below hold under ANY batching.

Invariant (pinned by tests/test_incremental_semdedup.py): after any
sequence of batches, ``result()`` equals
``semantic_dedup(union_of_batches, centroids=<codebook>)`` — same
(vec_id, cell, kept) rows — replays included.

Crash/replay safety: ``dropped`` commits before ``cells`` with the
same (app, epoch) txn.  A replayed epoch no-ops both appends; a crash
between the two appends re-runs the epoch against the same ``cells``
snapshot (the batch never landed), recomputes byte-identical drops,
and the ``dropped`` append de-dups on the txn id.  Computing drops
against a snapshot that already contains the batch is also
content-safe (the edge sets overlap, union is identical) — ordering is
belt and braces, not a correctness prerequisite.

100 TB shape: assignment is map-only over the arriving batch (codebook
broadcast); the accumulated side of the pair scan is partition-pruned
to the <= n_clusters cells the batch actually touches (bounded driver
collect of the batch's distinct cells); per-epoch pair work is
|batch| x |touched cells|, never corpus x corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.semdedup import SEM_THRESHOLD, assign_cells, drop_edges
from ..sinks.txlog import TxTable


class IncrementalSemanticDeduper:
    """Stateful driver for incremental SemDeDup over txlog tables.

    Use inside ``foreachBatch``::

        dd = IncrementalSemanticDeduper(root, centroids=seed_codebook(seed_df))
        def body(batch_df, epoch_id):
            dd.process_batch(batch_df, epoch_id)
    """

    APP_ID = "incremental-semdedup"

    def __init__(
        self, root: str, centroids: list[list[float]], threshold: float = SEM_THRESHOLD
    ):
        if not centroids:
            raise ValueError("semantic deduper needs a non-empty centroid codebook")
        self.cells = TxTable(f"{root}/cells")
        self.dropped = TxTable(f"{root}/dropped")
        self.centroids = centroids
        self.threshold = threshold

    def _store(self, spark: SparkSession, template: DataFrame) -> DataFrame:
        try:
            return self.cells.read(spark)
        except ValueError:  # first epoch: no committed schema yet
            return spark.createDataFrame([], template.schema)

    def process_batch(self, emb: DataFrame, epoch: int) -> int:
        """Assign, emit this epoch's drop edges, append; returns the
        ``cells`` version (replay = no-op on both tables)."""
        spark = emb.sparkSession
        new = assign_cells(emb, centroids=self.centroids).localCheckpoint(eager=True)
        touched = [r["cell"] for r in new.select("cell").distinct().collect()]
        old = self._store(spark, new).where(F.col("cell").isin(touched))
        # new x new and old-drops-new share the a-side union; new-drops-old
        # is the late-low-id demotion path.
        d1 = drop_edges(old.unionByName(new), new, self.threshold)
        d2 = drop_edges(new, old, self.threshold)
        txn = {"app_id": self.APP_ID, "epoch": epoch}
        self.dropped.append(
            d1.unionByName(d2).distinct(),
            txn={"app_id": f"{self.APP_ID}-dropped", "epoch": epoch},
        )
        return self.cells.append(new, partition_by=["cell"], txn=txn)

    def result(self, spark: SparkSession) -> DataFrame:
        """(vec_id, cell, kept) over everything ingested so far — the
        exact batch ``semantic_dedup`` contract over the union."""
        cells = self.cells.read(spark).select(
            "vec_id", F.col("cell").cast("long").alias("cell")
        )
        try:
            dr = self.dropped.read(spark).select("vec_id").distinct()
        except ValueError:
            dr = cells.select("vec_id").limit(0)
        return cells.join(dr.withColumn("hit", F.lit(1)), "vec_id", "left").select(
            "vec_id", "cell", F.col("hit").isNull().alias("kept")
        )
