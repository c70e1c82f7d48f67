"""Incremental (streaming) IVF-Flat index maintenance — the ANN twin of
``streaming/incremental.py``'s dedup pattern (VERDICT r3 item #7).

A batch ``ivf_topk`` re-quantizes the whole corpus per run; at 100 TB
you cannot re-assign petabytes of vectors per arriving micro-batch.
The incremental form keeps ONE txlog table (ACID, so a replayed epoch
is idempotent):

- ``cells`` — (vec_id, v, nrm, cell) appended per epoch: each arriving
  vector is assigned ONCE to its nearest cell under a FROZEN coarse
  codebook (the centroids fixed at index construction — how production
  IVF deployments run: the coarse quantizer is trained offline and
  periodically refreshed by a separate batch job, while ingestion only
  assigns).

Per micro-batch (``process_batch``): normalize, assign cells via the
same ``_nearest_cells`` expression batch ``ivf_topk`` uses, append with
a (app_id, epoch) txn — a replayed epoch is dropped by the txlog, so
no vector is ever double-indexed.

Search (``topk``) reads the accumulated cell table and runs the SAME
``_ivf_probe`` tail as the batch operator.  Invariant (pinned by
tests/test_incremental_similarity.py): after any sequence of batches,
``topk()`` equals ``ivf_topk(union_of_batches, centroids=<codebook>)``
— same neighbors, same cosines, same ranks, regardless of batching.

100 TB shape: assignment is a map-only pass over the arriving batch
(centroid codebook is expression-inlined, |cells| structs per row);
the cell store is hive-partitioned by cell so a probe reads only
n_probe/n_cells of the accumulated data (partition pruning on the
cell equi-join); nothing ever rescans the accumulated corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    N_PROBE,
    QUERY_MOD,
    TOP_K,
    _cent_arrs,
    _ivf_probe,
    _nearest_cells,
    _with_norm,
)
from ..sinks.txlog import TxTable


class IncrementalIVFIndex:
    """Stateful driver for incremental IVF-Flat indexing over a txlog
    table.  Use inside ``foreachBatch``::

        idx = IncrementalIVFIndex(root, centroids=seed_centroids(seed_df))
        def body(batch_df, epoch_id):
            idx.process_batch(batch_df, epoch_id)
    """

    APP_ID = "incremental-ivf"

    def __init__(self, root: str, centroids: list[list[float]]):
        if not centroids:
            raise ValueError("IVF index needs a non-empty centroid codebook")
        self.cells = TxTable(f"{root}/cells")
        self.centroids = centroids

    def process_batch(self, emb: DataFrame, epoch: int) -> int:
        """Assign the batch's vectors to cells under the frozen codebook
        and append; returns the committed version (replay = no-op, the
        prior version is returned)."""
        arrs = _cent_arrs(self.centroids)
        assigned = _with_norm(emb).select(
            "vec_id",
            "v",
            "nrm",
            _nearest_cells(F.col("v"), arrs, 1)[0].alias("cell"),
        )
        return self.cells.append(
            assigned,
            partition_by=["cell"],
            txn={"app_id": self.APP_ID, "epoch": epoch},
        )

    def topk(
        self,
        spark: SparkSession,
        k: int = TOP_K,
        n_probe: int = N_PROBE,
        query_mod: int = QUERY_MOD,
    ) -> DataFrame:
        """ANN top-k over everything indexed so far — identical plan
        tail to batch ``ivf_topk`` (same probe expression, same window),
        so results match the batch operator over the union exactly."""
        store = self.cells.read(spark).select(
            "vec_id", "v", F.col("nrm").cast("double").alias("nrm"), "cell"
        )
        queries = store.where(F.col("vec_id") % query_mod == 0).select(
            F.col("vec_id").alias("q_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
        )
        return _ivf_probe(store, queries, _cent_arrs(self.centroids), k, n_probe)
