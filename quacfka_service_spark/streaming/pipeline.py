"""The Pipeline builder — Spark-native analog of the reference's
orchestrator API (/root/reference/main.go:203-276, SURVEY.md §3.3):

    q.NewOrchestrator[*rr.Bidrequest](opts...)   Pipeline(spark)
    o.NewKafkaConfig()                           .source_kafka(conf)
    o.ConfigureProcessor(...unmarshal...)        .decode(...)
    (normalizer declaration, main.go:198-199)    (normalize + agg in sink)
    o.ConfigureDuck(...) + runner RPC export     .sink_lake(root, checkpoint)
    o.Run(ctx, &wg)                              .run() -> PipelineHandle
    o.DuckPaths() consumption loop               foreachBatch (implicit)
    signal -> cancel + o.Report/ReportJSONL      handle.stop()/metrics_jsonl

The whole export machinery (file rotation S7, runner RPC S9, orphan
recovery S10, backpressure S11) collapses into one ``foreachBatch``
body plus checkpointing:

- each micro-batch is the bounded unit a rotated 4200 MB DuckDB file
  was (epoch id replaces the file path);
- U2 dual_output_append: the decoded batch is persisted once and
  written three ways (raw nested, flat norm, hourly agg) — the same
  single-pass dual-build as main.go:342-385;
- checkpointing gives exactly-once recovery, strictly stronger than
  the reference's at-least-once + orphan-.db rescan (T4);
- pacing comes from maxOffsetsPerTrigger / maxFilesPerTrigger (T6).

Metrics (T8): a StreamingQueryListener appends one JSON line per
progress event, the analog of ``o.ReportJSONL()`` appending to
metrics.json (main.go:62-75,418).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener

from ..operators.aggregates import hourly_agg
from ..operators.normalize import normalize_bidreq
from ..proto.decode import decode_bidrequests
from ..sinks.lake import write_hourly_agg, write_norm_export, write_raw_export
from ..sources.files import kafka_shaped_file_stream
from ..sources.kafka import KafkaConfig, kafka_stream


class JsonlMetricsListener(StreamingQueryListener):
    """T8 metrics: one JSONL line per micro-batch progress, mirroring
    the reference's metrics.json append (main.go:62-75)."""

    def __init__(self, path: str):
        self.path = path

    def onQueryStarted(self, event):
        self._append({"event": "started", "id": str(event.id), "ts": time.time()})

    def onQueryProgress(self, event):
        p = event.progress
        self._append({
            "event": "progress",
            "id": str(p.id),
            "batchId": p.batchId,
            "numInputRows": p.numInputRows,
            "inputRowsPerSecond": p.inputRowsPerSecond,
            "processedRowsPerSecond": p.processedRowsPerSecond,
            "durationMs": dict(p.durationMs) if p.durationMs else {},
            "ts": time.time(),
        })

    def onQueryTerminated(self, event):
        self._append({"event": "terminated", "id": str(event.id), "ts": time.time()})

    def onQueryIdle(self, event):
        pass

    def _append(self, rec: dict[str, Any]) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")


@dataclass
class Pipeline:
    """Builder; see module docstring for the orchestrator mapping."""

    spark: SparkSession
    _source: DataFrame | None = None
    _decode_opts: dict[str, Any] = field(default_factory=dict)
    _lake_root: str | None = None
    _checkpoint: str | None = None
    _metrics_path: str | None = None
    _available_now: bool = False
    _trigger_secs: float | None = None
    _write_raw: bool = True
    _write_norm: bool = True
    _write_agg: bool = True
    _transform: Callable[[DataFrame], DataFrame] | None = None
    _use_txlog: bool = False

    # --- sources ---
    def source_kafka(self, conf: KafkaConfig) -> "Pipeline":
        self._source = kafka_stream(self.spark, conf)
        if conf.confluent_prefix:
            self._decode_opts.setdefault("confluent_prefix", True)
        return self

    def source_files(self, path: str, max_files_per_trigger: int | None = None) -> "Pipeline":
        self._source = kafka_shaped_file_stream(self.spark, path, max_files_per_trigger)
        return self

    def source_dataframe(self, df: DataFrame) -> "Pipeline":
        """Any Kafka-shaped (value, timestamp) stream or batch frame."""
        self._source = df
        return self

    # --- decode (S4 + S2/S3 framing) ---
    def decode(self, **opts: Any) -> "Pipeline":
        """Options forwarded to proto.decode.decode_bidrequests:
        confluent_prefix, ts_suffix, use_jvm, desc_path, message_name."""
        self._decode_opts.update(opts)
        return self

    def transform(self, fn: Callable[[DataFrame], DataFrame]) -> "Pipeline":
        """X2-style custom hook applied to the decoded frame."""
        self._transform = fn
        return self

    # --- sink ---
    def sink_lake(
        self,
        root: str,
        checkpoint: str,
        *,
        raw: bool = True,
        norm: bool = True,
        agg: bool = True,
        metrics_jsonl: str | None = None,
    ) -> "Pipeline":
        self._lake_root = root
        self._checkpoint = checkpoint
        self._write_raw, self._write_norm, self._write_agg = raw, norm, agg
        self._metrics_path = metrics_jsonl
        return self

    def sink_txlog(
        self,
        root: str,
        checkpoint: str,
        *,
        raw: bool = True,
        norm: bool = True,
        agg: bool = True,
        metrics_jsonl: str | None = None,
    ) -> "Pipeline":
        """Like sink_lake, but each table is an ACID manifest-commit
        table (sinks/txlog.py): every epoch commits transactionally
        with a (query, epoch) txn id, so a replayed epoch is a no-op in
        the log itself — exactly-once without the full-overwrite
        ``ingest_batch=N`` trick, and compaction/vacuum can run
        concurrently with the stream under snapshot isolation."""
        self.sink_lake(root, checkpoint, raw=raw, norm=norm, agg=agg,
                       metrics_jsonl=metrics_jsonl)
        self._use_txlog = True
        return self

    def trigger(self, *, available_now: bool = False, processing_time_secs: float | None = None) -> "Pipeline":
        self._available_now = available_now
        self._trigger_secs = processing_time_secs
        return self

    # --- run ---
    def _export_batch(
        self, batch_df: DataFrame, batch_id: int, streaming: bool = True
    ) -> None:
        """The foreachBatch body = the reference's whole export path
        (§3.2): one rotated file's worth of rows -> raw + norm + agg.

        Exactly-once: each table's output lands under an
        ``ingest_batch=<epoch id>`` hive dir written with full
        overwrite, so a replayed epoch (failure between sink write and
        offset commit) replaces exactly its own files instead of
        appending duplicates.  The checkpoint's epoch id is the
        idempotency key — the role the rotated-file path played in the
        reference's at-least-once orphan rescan (main.go:140-195),
        upgraded to exactly-once.  Readers see ingest_batch as a
        partition column and drop it (sources/files.read_lake)."""
        bidreq = decode_bidrequests(batch_df, **self._decode_opts)
        if self._transform is not None:
            bidreq = self._transform(bidreq)
        if self._use_txlog:
            self._export_batch_txlog(bidreq, batch_id, streaming=streaming)
            return
        bidreq.persist()
        sub = f"ingest_batch={batch_id}"
        try:
            if self._write_raw:
                write_raw_export(bidreq, f"{self._lake_root}/bidreq/{sub}", mode="overwrite")
            norm = None
            if self._write_norm or self._write_agg:
                norm = normalize_bidreq(bidreq)
            if self._write_norm and self._write_agg:
                # norm feeds two sinks in this batch: materialize it once
                norm.persist()
            if self._write_norm:
                write_norm_export(norm, f"{self._lake_root}/bidreq_norm/{sub}", mode="overwrite")
            if self._write_agg:
                write_hourly_agg(hourly_agg(norm), f"{self._lake_root}/bidreq_hourly/{sub}", mode="overwrite")
            if norm is not None and self._write_norm and self._write_agg:
                norm.unpersist()
        finally:
            bidreq.unpersist()

    def _txlog_app_id(self) -> str | None:
        """Txn identity for txlog epoch commits: the checkpoint's
        persisted streaming-query id (same rule as Delta's txn appId) —
        stable across restarts of the SAME checkpoint, so replayed
        epochs dedup; fresh when the checkpoint dir is recreated, so a
        deliberate reprocess re-lands instead of being silently
        swallowed by the old query's txn history."""
        import hashlib
        import os

        try:
            with open(os.path.join(self._checkpoint, "metadata")) as f:
                return json.load(f)["id"]
        except (OSError, ValueError, KeyError, TypeError):
            # metadata not written yet (shouldn't happen once batches
            # run) — fall back to a checkpoint-path-stable id so
            # exactly-once still holds across restarts
            return hashlib.md5(str(self._checkpoint).encode()).hexdigest()

    def _export_batch_txlog(
        self, bidreq: DataFrame, batch_id: int, streaming: bool = True
    ) -> None:
        """Txlog variant of the export body: one ACID table per output.
        Streaming epochs commit with txn id (table@query_id, epoch);
        batch mode (run_batch — a deliberate re-export) commits plain
        appends with no txn, so re-running it re-lands by design."""
        from ..sinks.lake import (
            PARTITION_COLS,
            agg_with_partitions,
            norm_with_partitions,
            raw_with_partitions,
        )
        from ..sinks.txlog import TxTable

        app = self._txlog_app_id() if streaming else None

        def _commit(table: str, df: DataFrame) -> None:
            t = TxTable(f"{self._lake_root}/{table}")
            if app is None:
                t.append(df, PARTITION_COLS)
            else:
                t.commit_epoch(df, f"{table}@{app}", batch_id, PARTITION_COLS)

        bidreq.persist()
        try:
            if self._write_raw:
                _commit("bidreq", raw_with_partitions(bidreq))
            norm = None
            if self._write_norm or self._write_agg:
                norm = normalize_bidreq(bidreq)
            if self._write_norm and self._write_agg:
                norm.persist()
            if self._write_norm:
                _commit("bidreq_norm", norm_with_partitions(norm))
            if self._write_agg:
                _commit("bidreq_hourly", agg_with_partitions(hourly_agg(norm)))
            if norm is not None and self._write_norm and self._write_agg:
                norm.unpersist()
        finally:
            bidreq.unpersist()

    def run(self) -> "PipelineHandle":
        if self._source is None or self._lake_root is None:
            raise ValueError("pipeline needs a source and sink_lake(...)")
        listener = None
        if self._metrics_path:
            listener = JsonlMetricsListener(self._metrics_path)
            self.spark.streams.addListener(listener)
        writer = (
            self._source.writeStream.foreachBatch(self._export_batch)
            .option("checkpointLocation", self._checkpoint)
            .queryName("quacfka-pipeline")
        )
        if self._available_now:
            writer = writer.trigger(availableNow=True)
        elif self._trigger_secs:
            writer = writer.trigger(processingTime=f"{self._trigger_secs} seconds")
        return PipelineHandle(writer.start(), self.spark, listener)

    def run_incremental_agg(
        self, out_path: str, lateness: str | None = None
    ) -> "PipelineHandle":
        """The idiomatic-streaming variant of the agg sink: decode ->
        normalize -> watermarked tumbling-window hourly aggregate,
        emitted append-mode to parquet as each hour closes
        (streaming/windowed.py; contrast with the reference's
        batch-per-file re-export, SURVEY.md T2/T3)."""
        from .windowed import DEFAULT_LATENESS, incremental_hourly_agg

        if self._source is None:
            raise ValueError("pipeline needs a source")
        bidreq = decode_bidrequests(self._source, **self._decode_opts)
        if self._transform is not None:
            bidreq = self._transform(bidreq)
        agg = incremental_hourly_agg(
            normalize_bidreq(bidreq), lateness or DEFAULT_LATENESS
        )
        listener = None
        if self._metrics_path:
            listener = JsonlMetricsListener(self._metrics_path)
            self.spark.streams.addListener(listener)
        writer = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", self._checkpoint)
            .queryName("quacfka-incremental-agg")
        )
        if self._available_now:
            writer = writer.trigger(availableNow=True)
        elif self._trigger_secs:
            writer = writer.trigger(processingTime=f"{self._trigger_secs} seconds")
        return PipelineHandle(writer.start(), self.spark, listener)

    def run_batch(self) -> None:
        """One-shot batch mode over a non-streaming source frame — the
        dev/backfill path (reference parity: re-exporting one DB file)."""
        if self._source is None or self._lake_root is None:
            raise ValueError("pipeline needs a source and sink_lake(...)")
        self._export_batch(self._source, 0, streaming=False)


@dataclass
class PipelineHandle:
    """o.Run's handle: stop/progress/metrics (main.go:267,320,409-429)."""

    query: Any
    spark: SparkSession
    listener: JsonlMetricsListener | None = None

    def stop(self) -> None:  # T7 graceful shutdown
        self.query.stop()
        if self.listener is not None:
            self.spark.streams.removeListener(self.listener)

    def await_termination(self, timeout: float | None = None):
        return self.query.awaitTermination(timeout)

    def progress(self) -> dict | None:
        p = self.query.lastProgress
        return dict(p) if p else None

    def error(self) -> Any:  # o.Error() (main.go:320)
        return self.query.exception()
