"""Incrementally-maintained hourly aggregate == batch hourly_agg after
any batching, with replay no-ops (streaming/incremental_agg.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from quacfka_service_spark.fixtures import build_bidreq
from quacfka_service_spark.operators.aggregates import hourly_agg
from quacfka_service_spark.operators.normalize import normalize_bidreq
from quacfka_service_spark.streaming.incremental_agg import IncrementalHourlyAgg

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    # group keys are unique per row, so a set compare is exact; tuples
    # can hold None (deal) which sorted() can't order against str
    return {tuple(r) for r in df.collect()}


def test_incremental_agg_equals_batch_with_replay(spark, tmp_path):
    norm = normalize_bidreq(build_bidreq(spark, SF_DIR))
    # 3 days ≈ 72 hour-partitions: enough to exercise both read paths
    # (per-partition loop and the >32-hours backfill semi-join) without
    # the full fixture's 720 hour-partitions dominating test wall time
    t0 = norm.agg(F.min("event_time")).collect()[0][0]
    norm = norm.where(F.col("event_time") < F.lit(t0 + 3 * 86400 * 1000))
    # 3 epochs split by id hash: every epoch touches MOSTLY THE SAME
    # hours, so the merge path (old base ∪ new rows, recount) is
    # exercised on every batch — this is also exactly the late-data
    # path (an out-of-order row is just a revisited hour).
    parts = [norm.where(F.abs(F.hash("bidreq_id")) % 3 == i) for i in range(3)]

    mv = IncrementalHourlyAgg(str(tmp_path / "mv"))
    mv.process_batch(parts[0], 0)
    after_0 = _rows(mv.current(spark))
    assert after_0 == _rows(hourly_agg(parts[0]))

    mv.process_batch(parts[1], 1)
    mv.process_batch(parts[2], 2)
    want = _rows(hourly_agg(norm))
    assert _rows(mv.current(spark)) == want

    # replayed epoch: a true no-op (txn ids on both tables)
    v_base, v_agg = mv.base.latest_version(), mv.agg.latest_version()
    mv.process_batch(parts[1], 1)
    assert (mv.base.latest_version(), mv.agg.latest_version()) == (v_base, v_agg)
    assert _rows(mv.current(spark)) == want

    # distinct-correctness across epochs: re-sending epoch 2's rows as
    # a NEW epoch must not inflate any count (every id already in base)
    mv.process_batch(parts[2], 3)
    assert _rows(mv.current(spark)) == want
