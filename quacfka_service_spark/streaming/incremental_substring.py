"""Incremental ExactSubstr dedup — the streaming twin of
``operators/dedup.substring_spans`` (Lee et al. sub-span dedup).

Why the split matters at 100 TB: the expensive stage of ExactSubstr is
the LINEAR ingest pass — one md5 k-gram per corpus character.  The
batch operator re-hashes the whole corpus every run; this twin hashes
each document exactly ONCE, on the epoch that ingests it, and appends
the (doc_id, off, g) stream to an ACID txlog table.  ``result()`` then
computes spans from the STORED stream: a gram count-filter plus the
islands merge — no text is ever re-read, no gram is ever re-hashed.

Retroactivity is why per-epoch span EMISSION is not offered: a gram's
corpus count crossing 2 in epoch N retroactively makes offsets in
epoch-1 documents duplicated (their text matches the newcomer), so any
"this epoch's new spans" stream would have to re-open history.  The
honest incremental contract is ingest-once + query-the-store, and the
equality pin is exact: after ANY sequence of batches (including
replays), ``result()`` equals batch ``substring_spans`` over the union
(tests/test_incremental_substring.py).

Replay safety: appends carry (app_id, epoch) txn ids — a replayed
micro-batch is a log-detected no-op, so occurrence rows are never
doubled (double rows would turn count-1 grams into fake duplicates —
idempotence is CORRECTNESS here, not just hygiene).

100 TB shape: ingest is the batch operator's scan-speed projection on
the new docs only; the store is partitioned by a gram-hash prefix so
the count-filter's shuffle is pre-spread; ``result()``'s islands
window runs over duplicate-mass-sized rows only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import SUBSTR_K, _gram_occurrences, _spans_from_occ
from ..sinks.txlog import TxTable


class IncrementalSubstringDeduper:
    """Stateful driver for incremental ExactSubstr over a txlog table.

    Use inside ``foreachBatch``::

        dd = IncrementalSubstringDeduper(root)
        def body(batch_df, epoch_id):
            dd.process_batch(batch_df, epoch_id)
        ...
        dd.result(spark)   # == substring_spans(everything ingested)
    """

    APP_ID = "incremental-substring"

    def __init__(self, root: str, k: int = SUBSTR_K):
        self.occ = TxTable(f"{root}/occ")
        self.k = k

    def process_batch(self, docs: DataFrame, epoch: int) -> int:
        """Hash the batch's gram stream once and append it; returns the
        table version (replay = no-op)."""
        new = _gram_occurrences(docs.select("doc_id", "text"), self.k).withColumn(
            "gp", F.substring("g", 1, 2)  # 256-way prefix partitioning
        )
        return self.occ.append(
            new, partition_by=["gp"], txn={"app_id": self.APP_ID, "epoch": epoch}
        )

    def result(self, spark: SparkSession) -> DataFrame:
        """(doc_id, span_start, span_end, span_len) over everything
        ingested so far — the exact batch ``substring_spans`` contract
        over the union."""
        try:
            occ = self.occ.read(spark).select("doc_id", "off", "g")
        except ValueError:  # nothing ingested yet
            return spark.createDataFrame(
                [], "doc_id long, span_start long, span_end long, span_len long"
            )
        return _spans_from_occ(occ, self.k)
