"""Incremental (streaming) PQ index maintenance — the compression twin
of ``IncrementalIVFIndex`` (same frozen-codebook contract, same txlog
idempotency).

A batch ``pq_encode`` re-encodes the whole corpus per run; at 100 TB
the index must absorb arriving vectors without touching the
accumulated ones.  Two txlog tables:

- ``codes`` — (vec_id, m, code) appended per epoch: each arriving
  vector encoded ONCE under the FROZEN codebook
  (``pq_seed_codebook``; production trains it offline with k-means and
  refreshes via a separate batch job — ingestion only assigns).  This
  is the 128x-compressed store; full-precision vectors are NOT kept.
- ``queries`` — (q_id, m, sv) subvector rows for the query-eligible
  ids only (ADC is asymmetric: queries stay full-precision, so their
  subvectors must survive; everything else lives as codes).

Search (``adc_topk``) runs the SAME ``_adc_tail`` plan as batch
``pq_adc_topk``.  Invariant (pinned by tests/test_incremental_pq.py):
after any sequence of batches, ``adc_topk()`` equals
``pq_adc_topk(union, codebook=<frozen>)`` — same neighbors, same float
adist, same ranks, regardless of batching; replayed epochs are txn
no-ops on both tables.

100 TB shape: encode is one map fan-out + per-(vec_id, m) argmin over
the ARRIVING batch only; the code store grows by 8 small integer rows
per vector; nothing rescans or re-encodes the accumulated corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    QUERY_MOD,
    TOP_K,
    _adc_tail,
    _cb_df,
    _pq_subrows,
    pq_encode,
)
from ..sinks.txlog import TxTable


class IncrementalPQIndex:
    """Stateful driver for incremental PQ indexing over txlog tables.
    Use inside ``foreachBatch``::

        idx = IncrementalPQIndex(root, codebook=pq_seed_codebook(seed_df))
        def body(batch_df, epoch_id):
            idx.process_batch(batch_df, epoch_id)
    """

    APP_ID = "incremental-pq"

    def __init__(self, root: str, codebook: list, query_mod: int = QUERY_MOD):
        if not codebook:
            raise ValueError("PQ index needs a non-empty codebook")
        self.codes = TxTable(f"{root}/codes")
        self.queries = TxTable(f"{root}/queries")
        self.codebook = codebook
        self.query_mod = query_mod

    def process_batch(self, emb: DataFrame, epoch: int) -> int:
        """Encode the batch under the frozen codebook and append codes
        (plus query subvectors for query-eligible ids); returns the
        codes-table version (replay = no-op on both tables)."""
        enc = pq_encode(emb, self.query_mod, self.codebook)
        version = self.codes.append(
            enc, txn={"app_id": self.APP_ID, "epoch": epoch}
        )
        qsub = _pq_subrows(
            emb.where(F.col("vec_id") % self.query_mod == 0)
        ).withColumnRenamed("vec_id", "q_id")
        self.queries.append(
            qsub, txn={"app_id": f"{self.APP_ID}-q", "epoch": epoch}
        )
        return version

    def adc_topk(self, spark: SparkSession, k: int = TOP_K) -> DataFrame:
        """ADC top-k over everything indexed so far — identical plan
        tail to batch ``pq_adc_topk``, so results match the batch
        operator over the union exactly."""
        codes = self.codes.read(spark).select("vec_id", "m", "code")
        qsub = self.queries.read(spark).select("q_id", "m", "sv")
        return _adc_tail(codes, qsub, _cb_df(spark, self.codebook), k)
