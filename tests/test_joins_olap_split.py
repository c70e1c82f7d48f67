"""Unit + plan tests for the time-series joins, OLAP operators, and
deterministic splitting (operators/joins.py, olap.py, split.py).
Oracle parity for every key is covered by test_oracle_parity.py; here
we pin hand-computed semantics and the physical-plan properties that
matter at scale."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from quacfka_service_spark.operators.joins import (
    asof_join,
    range_join_binned,
)
from quacfka_service_spark.operators.olap import (
    EVENT_TYPES,
    pivot_counts,
    unpivot_counts,
)
from quacfka_service_spark.operators.split import assign_split, hash_bucket
from quacfka_service_spark.plans.inspect import count_exchanges, formatted_plan

from .conftest import SF_DIR


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_hand_case(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00")),  # after r10 -> r10
            (2, "u1", _ts("2024-01-01 10:05:00")),  # equal ts -> inclusive match r)
            (3, "u1", _ts("2024-01-01 09:00:00")),  # before any right -> NULL
            (4, "u2", _ts("2024-01-01 12:00:00")),  # other key, no right -> NULL
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, "u1", _ts("2024-01-01 09:30:00")),
            (11, "u1", _ts("2024-01-01 10:05:00")),
        ],
        "event_id long, user_id string, ts timestamp",
    )
    out = asof_join(left, right, key="user_id", ts="ts", right_cols=["event_id"])
    got = {r["event_id"]: r["r_event_id"] for r in out.collect()}
    assert got == {1: 10, 2: 11, 3: None, 4: None}


def test_asof_join_forward_hand_case(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00")),  # before r11 -> r11
            (2, "u1", _ts("2024-01-01 10:05:00")),  # equal ts -> inclusive r11
            (3, "u1", _ts("2024-01-01 11:00:00")),  # after all right -> NULL
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, "u1", _ts("2024-01-01 09:30:00")),
            (11, "u1", _ts("2024-01-01 10:05:00")),
        ],
        "event_id long, user_id string, ts timestamp",
    )
    out = asof_join(left, right, key="user_id", ts="ts", right_cols=["event_id"],
                    direction="forward")
    got = {r["event_id"]: r["r_event_id"] for r in out.collect()}
    assert got == {1: 11, 2: 11, 3: None}


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01 10:00:00"))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, "u1", _ts("2024-01-01 09:00:00"))],
        "event_id long, user_id string, ts timestamp",
    )
    wide = asof_join(left, right, key="user_id", ts="ts", right_cols=["event_id"],
                     tolerance_secs=7200)
    tight = asof_join(left, right, key="user_id", ts="ts", right_cols=["event_id"],
                      tolerance_secs=60)
    assert wide.collect()[0]["r_event_id"] == 10
    assert tight.collect()[0]["r_event_id"] is None


def test_asof_join_single_shuffle(spark):
    """The union+window formulation must cost exactly one Exchange —
    that is its reason to exist at 100 TB."""
    left = spark.range(10).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 3).alias("user_id"),
        F.timestamp_seconds(F.col("id") * 100).alias("ts"),
    )
    right = spark.range(5).select(
        (F.col("id") + 100).alias("event_id"),
        (F.col("id") % 3).alias("user_id"),
        F.timestamp_seconds(F.col("id") * 170).alias("ts"),
    )
    out = asof_join(left, right, key="user_id", ts="ts", right_cols=["event_id"])
    assert count_exchanges(out) == 1


def test_range_join_binned_no_nested_loop(spark):
    """Keyless range join must plan as an equi join on the bin, never
    a BroadcastNestedLoopJoin/CartesianProduct."""
    l = spark.range(100).select(
        F.col("id").alias("l_event_id"),
        F.timestamp_seconds(F.col("id") * 37).alias("lts"),
    )
    r = spark.range(100).select(
        F.col("id").alias("r_event_id"),
        F.timestamp_seconds(F.col("id") * 53).alias("rts"),
    )
    out = range_join_binned(l, r, band_secs=60)
    plan = formatted_plan(out)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # brute-force check on the small input
    got = {(x["l_event_id"], x["r_event_id"]) for x in out.collect()}
    want = {
        (i, j)
        for i in range(100)
        for j in range(100)
        if abs(i * 37 - j * 53) <= 60
    }
    assert got == want


def test_pivot_unpivot_round_trip(spark):
    """unpivot(pivot(x)) == plain groupBy counts (plus explicit 0s)."""
    ev = (
        spark.createDataFrame(
            [("2024-01-01", "click"), ("2024-01-01", "click"), ("2024-01-02", "view")],
            "day string, event_type string",
        )
    )
    melted = unpivot_counts(ev)
    direct = {
        (r["day"], r["event_type"]): r["n"]
        for r in ev.groupBy("day", "event_type").count().withColumnRenamed("count", "n").collect()
    }
    for row in melted.collect():
        assert row["n"] == direct.get((row["day"], row["event_type"]), 0)
    # every (day, type) combination is present in the melted frame
    assert melted.count() == 2 * len(EVENT_TYPES)


def test_pivot_plan_single_shuffle(spark):
    ev = spark.createDataFrame(
        [("2024-01-01", "click"), ("2024-01-01", "view"), ("2024-01-02", "error")],
        "day string, event_type string",
    )
    assert count_exchanges(pivot_counts(ev)) == 1
    # equivalent to the native two-exchange pivot API
    native = (
        ev.groupBy("day").pivot("event_type", EVENT_TYPES).agg(F.count(F.lit(1)))
        .select("day", *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t) for t in EVENT_TYPES])
    )
    assert sorted(map(tuple, pivot_counts(ev).collect())) == sorted(map(tuple, native.collect()))


def test_split_deterministic_and_proportioned(spark):
    docs = spark.range(5000).select(F.col("id").alias("doc_id"))
    a = assign_split(docs, "doc_id").groupBy("split").count().collect()
    b = assign_split(docs.repartition(7), "doc_id").groupBy("split").count().collect()
    ca = {r["split"]: r["count"] for r in a}
    cb = {r["split"]: r["count"] for r in b}
    # identical under repartitioning (the property rand()-splits lack)
    assert ca == cb
    assert set(ca) == {"train", "val", "test"}
    # md5 buckets are near-uniform: 80/10/10 +- a few percent at n=5000
    assert abs(ca["train"] / 5000 - 0.80) < 0.03
    assert abs(ca["val"] / 5000 - 0.10) < 0.03


def test_hash_bucket_range(spark):
    df = spark.range(1000).select(hash_bucket(F.col("id")).alias("b"))
    mn, mx = df.agg(F.min("b"), F.max("b")).collect()[0]
    assert 0 <= mn and mx <= 99


def test_approx_distinct_error_bound(spark):
    """HLL++ at rsd=0.02 must land within 5% of the exact count."""
    from quacfka_service_spark.operators.olap import _events_with_day, approx_distinct

    ev = _events_with_day(spark, SF_DIR)
    approx = {r["event_type"]: r["approx_users"] for r in approx_distinct(ev).collect()}
    exact = {
        r["event_type"]: r["u"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("u")).collect()
    }
    for t, e in exact.items():
        assert abs(approx[t] - e) <= max(1, 0.05 * e), (t, approx[t], e)


def test_hll_registers_mergeable(spark):
    """The from-scratch HLL is a true sketch: registers built on any
    split of the input, max-merged per bucket, equal the registers of
    the union — the property that makes it epoch/shard/stream safe."""
    from quacfka_service_spark.operators.olap import _events_with_day, hll_registers

    ev = _events_with_day(spark, SF_DIR)
    lo = hll_registers(ev.where(F.col("event_id") % 2 == 0))
    hi = hll_registers(ev.where(F.col("event_id") % 2 == 1))
    merged = (
        lo.unionByName(hi)
        .groupBy("event_type", "bucket")
        .agg(F.max("r").alias("r"))
    )
    whole = hll_registers(ev)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_hll_estimate_accuracy(spark):
    """m=4096 registers: estimate within 5% of exact (at sf0.001 the
    linear-counting branch is active and near-exact)."""
    from quacfka_service_spark.operators.olap import _events_with_day, hll_distinct

    ev = _events_with_day(spark, SF_DIR)
    est = {r["event_type"]: r["hll_users"] for r in hll_distinct(ev).collect()}
    exact = {
        r["event_type"]: r["u"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("u")).collect()
    }
    for t, e in exact.items():
        assert abs(est[t] - e) <= max(1, 0.05 * e), (t, est[t], e)


def test_hll_set_algebra_survives_delimiter_in_type(spark):
    """ADVICE r6 #4 regression: pair keys used to be packed as
    concat_ws('|', type_a, type_b) then split — an event_type
    containing '|' corrupted the key ('a|b' + 'c' -> 'a|b|c' split as
    ('a', 'b')) and misattributed union estimates.  The compound
    group key must survive any characters in the type names."""
    from quacfka_service_spark.operators.olap import hll_set_algebra

    rows = [("a|b", i) for i in range(40)] + [("c", i) for i in range(20, 60)]
    ev = spark.createDataFrame(rows, "event_type string, user_id long")
    out = hll_set_algebra(ev).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["type_a"], r["type_b"]) == ("a|b", "c")
    # 40 + 40 users with 20 shared: estimates must be near those counts
    assert abs(r["est_a"] - 40) <= 4 and abs(r["est_b"] - 40) <= 4
    assert abs(r["est_union"] - 60) <= 6
    assert abs(r["est_intersection"] - 20) <= 8


def test_asof_join_on_events(spark):
    """Every purchase_ts is <= its click ts (semantics sanity at sf0.001)."""
    import __spark_entry__ as entry

    out = entry.queries()["asof_join"](spark, SF_DIR)
    bad = out.where(
        F.col("purchase_ts").isNotNull() & (F.col("purchase_ts") > F.col("ts"))
    ).count()
    assert bad == 0
    assert out.count() > 0
