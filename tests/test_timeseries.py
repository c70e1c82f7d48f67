"""Time-series motif search (operators/timeseries.py).  Cross-engine
float parity is pinned by the driver oracle + parity_sweep; these pin
the retrieval semantics: a planted repeat of the query window is found
at distance 0, and z-normalization makes the match invariant to scale
and offset."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from quacfka_service_spark.operators.timeseries import TS_WINDOW, ts_motif_topk

BASE = datetime.datetime(2024, 1, 1)


def _events(spark, values, event_type="view"):
    rows = [
        (i, 1, event_type, float(v), BASE + datetime.timedelta(hours=i))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double, ts timestamp"
    )


def test_motif_finds_planted_repeat_and_scaled_copy(spark):
    n = 100
    q = [float((7 * i) % 13 + (i % 5)) for i in range(TS_WINDOW)]  # query shape
    vals = [float((11 * h) % 17) + 30.0 for h in range(n)]  # background
    # query window = last TS_WINDOW observed hours (starts at n-24, 0-based)
    vals[n - TS_WINDOW :] = q
    # planted exact repeat at 0-based hour 9 -> 1-based start 10
    vals[9 : 9 + TS_WINDOW] = q
    # planted affine copy (2x + 5) at 0-based hour 44 -> 1-based start 45:
    # z-normalization must see it as identical shape (dist 0)
    vals[44 : 44 + TS_WINDOW] = [2.0 * x + 5.0 for x in q]

    out = ts_motif_topk(_events(spark, vals)).collect()
    by_rank = {r["rank"]: (r["start"], r["dist"]) for r in out}
    assert by_rank[1] == (10, 0.0)  # identical doubles -> exactly 0
    assert by_rank[2][0] == 45
    assert by_rank[2][1] < 1e-9  # affine z-scores round at the last ulp
    assert by_rank[3][1] > 1e-6  # everything else is a genuine non-match


def test_motif_skips_constant_windows_and_short_series(spark):
    # constant series: query window has zero variance -> no output
    assert ts_motif_topk(_events(spark, [5.0] * 100)).count() == 0
    # series shorter than 2 windows: no candidate starts -> no output
    assert ts_motif_topk(_events(spark, [float(i) for i in range(30)])).count() == 0


def test_flat_window_of_nonrepresentable_constant_is_skipped(spark):
    """ADVICE r6 #1 regression: for a constant window of 0.1 (not
    exactly representable in binary), E[x^2] - mean^2 evaluates to a
    tiny NEGATIVE float, sqrt of that is NaN, and NaN orders greater
    than 0 — so a sqrt(var) > 0 guard let flat windows through with
    NaN z-scores, and under discord's DESC ordering a flat window
    became the #1 "discord".  The guard must filter on the RAW
    variance."""
    from quacfka_service_spark.operators.timeseries import ts_discord_topk

    # flat type at 0.1; one genuinely varying type alongside
    flat = _events(spark, [0.1] * 100, "flat")
    vary = _events(spark, [float((7 * h) % 13) for h in range(100)], "vary")
    ev = flat.unionByName(vary)

    motif = ts_motif_topk(ev).collect()
    assert {r["event_type"] for r in motif} == {"vary"}
    assert all(r["dist"] == r["dist"] for r in motif)  # no NaN

    disc = ts_discord_topk(ev).collect()
    assert {r["event_type"] for r in disc} == {"vary"}
    assert all(r["nn_dist"] == r["nn_dist"] for r in disc)  # no NaN


def test_motif_types_are_independent(spark):
    a = _events(spark, [float((3 * h) % 7) for h in range(80)], "view")
    b = _events(spark, [float((5 * h) % 11) for h in range(80)], "click")
    out = ts_motif_topk(a.unionByName(b))
    types = {r["event_type"] for r in out.select("event_type").distinct().collect()}
    assert types == {"view", "click"}
    per = out.groupBy("event_type").count().collect()
    assert all(r["count"] <= 5 for r in per)


def test_discord_finds_planted_anomaly(spark):
    """A periodic series with ONE corrupted day: the discord (largest
    nearest-neighbor distance) must start inside the corruption."""
    from quacfka_service_spark.operators.timeseries import ts_discord_topk

    n = 120
    vals = [float((h % 24) * (1 + (h % 2))) for h in range(n)]  # periodic
    for h in range(60, 72):  # corrupt half a day
        vals[h] = 500.0 + 7.0 * (h % 5)
    out = ts_discord_topk(_events(spark, vals)).collect()
    by_rank = {r["rank"]: r["start"] for r in out}
    # the rank-1 discord window overlaps the corrupted hours (0-based
    # 60..71 -> a 24-wide window starting anywhere in 1-based 38..72)
    assert 38 <= by_rank[1] <= 72
    assert len(out) == 3


def test_discord_periodic_series_has_near_zero_floor(spark):
    """A perfectly periodic series with period == window: every window
    has an exact twin one period away -> nn_dist 0 for interior
    windows; the top discord is still tiny."""
    from quacfka_service_spark.operators.timeseries import ts_discord_topk

    vals = [float(h % 24 + (h % 3)) for h in range(96)]
    out = ts_discord_topk(_events(spark, vals)).collect()
    assert len(out) == 3
    assert all(r["nn_dist"] < 1e-9 for r in out)


def test_seasonality_detects_planted_period(spark):
    """A strongly 12-hour-periodic series must rank lag 12 (or its
    harmonics 24/36) at the top; a white-ish series must not
    concentrate mass at any lag."""
    import math

    from quacfka_service_spark.operators.timeseries import ts_seasonality

    periodic = [10.0 + 5.0 * math.sin(2 * math.pi * h / 12.0) for h in range(200)]
    out = ts_seasonality(_events(spark, periodic)).collect()
    top = next(r for r in out if r["rank"] == 1)
    assert top["lag"] in (12, 24, 36)
    assert top["acf"] > 0.9

    # every lag 1..36 reported exactly once
    assert sorted(r["lag"] for r in out) == list(range(1, 37))


def test_seasonality_skips_flat_and_short_series(spark):
    from quacfka_service_spark.operators.timeseries import ts_seasonality

    assert ts_seasonality(_events(spark, [3.0] * 100)).count() == 0  # flat
    assert ts_seasonality(_events(spark, [float(i) for i in range(20)])).count() == 0
