"""Round-7 operators: SCD2 build, Bloom-prefiltered semi-join,
association-rule lift, CUSUM changepoint, EWMA smoothing.

Oracle parity for all five keys is covered by the sweep
(tools/parity_sweep.py); these tests pin SEMANTICS (invariants the
hash-compare can't see) and plan shapes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quacfka_service_spark.operators.olap import basket_lift
from quacfka_service_spark.operators.timeseries import (
    ts_changepoint_cusum,
    ts_ewma,
)
from quacfka_service_spark.operators.warehouse import (
    bloom_bitmap,
    bloom_semi_join,
    scd2_user_attr,
)
from quacfka_service_spark.session import load_table

from .conftest import SF_DIR


# --- SCD2 -----------------------------------------------------------------


def test_scd2_intervals_chain_and_single_current(spark):
    ev = load_table(spark, SF_DIR, "events")
    out = scd2_user_attr(ev).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for rows in by_user.values():
        rows.sort(key=lambda r: r.valid_from)
        # exactly one open (current) interval per user, and it is last
        currents = [r for r in rows if r.is_current]
        assert len(currents) == 1 and rows[-1].is_current
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to == b.valid_from  # seamless chain
            assert a.attr != b.attr  # islands collapse equal runs
        assert sum(r.n_events for r in rows) > 0


def test_scd2_rebuilds_point_in_time_state(spark):
    """SCD2 contract: joining an event's ts into the intervals yields
    that event's own attribute (history round-trips)."""
    ev = load_table(spark, SF_DIR, "events").limit(500)
    scd = scd2_user_attr(load_table(spark, SF_DIR, "events"))
    probe = ev.select(
        "user_id",
        F.col("ts").alias("pts"),
        F.get_json_object("props", "$.k").cast("long").alias("want"),
    )
    got = probe.join(scd, "user_id").where(
        (F.col("pts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("pts") < F.col("valid_to")))
    )
    bad = got.where(F.col("attr") != F.col("want")).count()
    assert bad == 0
    assert got.count() == probe.count()  # every probe lands in exactly 1 interval


def test_scd2_single_exchange_plan(spark):
    ev = load_table(spark, SF_DIR, "events")
    plan = scd2_user_attr(ev)._jdf.queryExecution().executedPlan().toString()
    # every window + the island groupBy ride ONE hash exchange on user_id
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


# --- Bloom semi-join ------------------------------------------------------


def test_bloom_no_false_negatives(spark):
    """Every inserted key must probe positive — the property that makes
    prefilter+verify exactly equal to the plain semi-join."""
    keys = spark.range(1, 4000, 7).select(F.col("id").alias("k"))
    bm = bloom_bitmap(keys, "k")
    probed = keys.join(F.broadcast(bm)).select(
        "k",
        F.expr(
            "(element_at(bitmap, CAST((pmod(xxhash64(k, 0), 65536)) DIV 64 AS INT) + 1)"
            " & shiftleft(CAST(1 AS BIGINT), CAST(pmod(xxhash64(k, 0), 65536) % 64 AS INT))) != 0"
        ).alias("h0"),
    )
    assert probed.where(~F.col("h0")).count() == 0


def test_bloom_semi_join_equals_plain(spark):
    orders = load_table(spark, SF_DIR, "orders")
    customer = load_table(spark, SF_DIR, "customer")
    got = bloom_semi_join(orders, customer)
    dim = customer.where(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 0)
    ).select("c_custkey")
    want = orders.select("o_orderkey", "o_custkey", "o_totalprice").join(
        dim, F.col("o_custkey") == F.col("c_custkey"), "left_semi"
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.count() > 0


def test_bloom_prefilter_actually_filters(spark):
    """The bitmap stage must reject (nearly) every non-member: probe
    keys far outside the dim keyspace and check the candidate rate is
    bloom-small (m=2^16, k=3, n~300 inserts -> FPR well under 1%)."""
    dim = spark.range(1, 300).select(F.col("id").alias("k"))
    bm = bloom_bitmap(dim, "k")
    alien = spark.range(10_000_000, 10_020_000).select(F.col("id").alias("o_custkey"))
    probed = alien.join(F.broadcast(bm))
    hit = None
    for i in range(3):
        probed = probed.withColumn(f"p{i}", F.pmod(F.xxhash64("o_custkey", F.lit(i)), F.lit(65536)))
        t = F.expr(
            f"(element_at(bitmap, CAST(p{i} DIV 64 AS INT) + 1)"
            f" & shiftleft(CAST(1 AS BIGINT), CAST(p{i} % 64 AS INT))) != 0"
        )
        hit = t if hit is None else (hit & t)
    fp = probed.where(hit).count()
    assert fp < 200  # < 1% of 20k probes


# --- basket lift ----------------------------------------------------------


def test_basket_lift_consistency(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    out = basket_lift(li).collect()
    assert out
    op = li.select("l_orderkey", "l_partkey").distinct()
    n_total = op.select("l_orderkey").distinct().count()
    counts = {r.l_partkey: r.n for r in op.groupBy("l_partkey").agg(F.count("*").alias("n")).collect()}
    for r in out:
        assert r.part_a < r.part_b
        assert r.n_a == counts[r.part_a] and r.n_b == counts[r.part_b]
        assert r.n_ab >= 2 and r.n_ab <= min(r.n_a, r.n_b)
        assert r.support == r.n_ab / n_total
        assert r.confidence == r.n_ab / r.n_a
        assert r.lift == (r.n_ab * n_total) / (r.n_a * r.n_b)
        assert 0 < r.support <= 1 and 0 < r.confidence <= 1


# --- CUSUM changepoint ----------------------------------------------------


def test_cusum_finds_planted_step(spark):
    """A series that is 1/hour for 48 h then 10/hour for 48 h must put
    its #1 changepoint at (or adjacent to) the step boundary."""
    rows = []
    eid = 0
    for h in range(96):
        per = 1 if h < 48 else 10
        for j in range(per):
            eid += 1
            rows.append((eid, f"2024-01-{1 + h // 24:02d} {h % 24:02d}:15:00", 1, "step", 1.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    top = ts_changepoint_cusum(df, k=1).collect()[0]
    # boundary hour: last hour of the low regime (cum deviation peaks there)
    assert top.h.strftime("%Y-%m-%d %H") == "2024-01-02 23"
    assert top.rank == 1 and top.stat > 0


def test_cusum_exact_integer_stat(spark):
    ev = load_table(spark, SF_DIR, "events")
    out = ts_changepoint_cusum(ev)
    kinds = dict(out.dtypes)
    assert kinds["stat"] == "bigint" and kinds["rank"] == "bigint"
    rows = out.collect()
    assert rows and all(r.stat >= 0 for r in rows)
    # top-k per type, ranks contiguous from 1
    per = {}
    for r in rows:
        per.setdefault(r.event_type, []).append(r.rank)
    for ranks in per.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


# --- EWMA -----------------------------------------------------------------


def test_ewma_matches_recurrence(spark):
    ev = load_table(spark, SF_DIR, "events")
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("v"))
        .collect()
    )
    series = {}
    for r in hourly:
        series.setdefault(r.event_type, []).append((r.h, float(r.v)))
    got = {(r.event_type, r.idx): r.ewma for r in ts_ewma(ev).collect()}
    n_checked = 0
    for t, pts in series.items():
        pts.sort()
        s = pts[0][1]
        assert got[(t, 1)] == s
        for i, (_, x) in enumerate(pts[1:], start=2):
            s = 0.25 * x + 0.75 * s
            assert got[(t, i)] == s  # bit-exact sequential fold
            n_checked += 1
    assert n_checked > 10


# --- Holt linear ----------------------------------------------------------


def test_holt_matches_recurrence(spark):
    ev = load_table(spark, SF_DIR, "events")
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("v"))
        .collect()
    )
    from quacfka_service_spark.operators.timeseries import ts_holt

    series = {}
    for r in hourly:
        series.setdefault(r.event_type, []).append((r.h, float(r.v)))
    got = {(r.event_type, r.idx): r for r in ts_holt(ev).collect()}
    n = 0
    for t, pts in series.items():
        pts.sort()
        if len(pts) < 2:
            assert (t, 1) not in got
            continue
        xs = [x for _, x in pts]
        lvl, trd = xs[0], xs[1] - xs[0]
        assert got[(t, 1)].level == lvl and got[(t, 1)].trend == trd
        for i, x in enumerate(xs[1:], start=2):
            lp = lvl
            lvl = 0.5 * x + 0.5 * (lvl + trd)
            trd = 0.25 * (lvl - lp) + 0.75 * trd
            r = got[(t, i)]
            assert r.level == lvl and r.trend == trd  # bit-exact fold
            assert r.forecast == lvl + trd
            n += 1
    assert n > 10


# --- ABC / Pareto ---------------------------------------------------------


def test_abc_pareto_banded_equals_naive_and_classes(spark):
    from decimal import Decimal

    from quacfka_service_spark.operators.olap import abc_pareto

    orders = load_table(spark, SF_DIR, "orders")
    rows = abc_pareto(orders).collect()
    assert rows
    rows.sort(key=lambda r: r.rank)
    # ranks contiguous, cumulative strictly increasing, revenue non-increasing
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    cums = [Decimal(r.cum) for r in rows]
    revs = [Decimal(r.revenue) for r in rows]
    assert all(b > a for a, b in zip(cums, cums[1:]))
    assert all(a >= b for a, b in zip(revs, revs[1:]))
    # banded prefix sum == naive: cum_i - cum_{i-1} == revenue_i exactly
    for i in range(1, len(rows)):
        assert cums[i] - cums[i - 1] == revs[i]
    assert cums[0] == revs[0]
    # class boundaries: A then B then C contiguous by rank, thresholds hold
    total = cums[-1]
    classes = [r.abc_class for r in rows]
    assert "".join(sorted(set(classes))) in ("ABC", "AB", "AC", "A")
    joined = "".join(classes)
    assert joined == "A" * joined.count("A") + "B" * joined.count("B") + "C" * joined.count("C")
    for r, c in zip(rows, cums):
        if r.abc_class == "A":
            assert c * 100 <= total * 80
        elif r.abc_class == "B":
            assert c * 100 > total * 80 and c * 100 <= total * 95
        else:
            assert c * 100 > total * 95


def test_abc_pareto_no_global_data_window(spark):
    """No global (empty-partition-spec) window over data rows at all:
    since the r9 rewrite the band offsets are bounded driver state, so
    the ONLY Window node is the within-band running sum, which must
    list band in its partition spec — the distributed prefix-sum
    guarantee that survives 10^8+ customers."""
    from quacfka_service_spark.operators.olap import abc_pareto

    orders = load_table(spark, SF_DIR, "orders")
    plan = abc_pareto(orders)._jdf.queryExecution().executedPlan().toString()
    import re as _re

    wins = _re.findall(r"Window .*", plan)
    assert len(wins) == 1, plan
    assert "band" in wins[0] and "sub" in wins[0] and "rev" in wins[0], wins


def test_abc_pareto_subbands_split_a_skewed_band(spark):
    """VERDICT r9 #6: when revenue mass piles into ONE band (forced
    skew: one whale sets max, everyone else lands in band 0), the
    within-band window must still run over >1 (band, sub) cell — no
    single band sorts on one task at entity scale — and the banded
    cumulative must still equal the naive prefix sum exactly."""
    from decimal import Decimal

    from pyspark.sql import functions as SF

    from quacfka_service_spark.operators.olap import ABC_BANDS, abc_pareto

    # whale rev 32000 -> mx; 400 customers spread over [10, 990]:
    # all in band 0 (rev/mx*32 < 1), but their within-band fraction
    # spans [0.01, 0.99] -> many sub cells.
    rows = [(0, 32000.0)] + [(i, 10.0 + (i * 7) % 981) for i in range(1, 401)]
    orders = spark.createDataFrame(
        rows, "o_custkey long, o_totalprice double"
    )
    out = abc_pareto(orders).collect()
    out.sort(key=lambda r: r.rank)
    assert [r.rank for r in out] == list(range(1, len(out) + 1))
    cums = [Decimal(r.cum) for r in out]
    revs = [Decimal(r.revenue) for r in out]
    assert cums[0] == revs[0]
    for i in range(1, len(out)):
        assert cums[i] - cums[i - 1] == revs[i]
    # the skewed band really was split across sub cells
    rev = orders.groupBy("o_custkey").agg(
        SF.sum(SF.col("o_totalprice").cast("decimal(12,2)")).alias("rev")
    )
    mx = 32000.0
    pos = SF.col("rev").cast("double") / SF.lit(mx) * ABC_BANDS
    band = SF.least(SF.floor(pos).cast("int"), SF.lit(ABC_BANDS - 1))
    n_cells = (
        rev.select(band.alias("band"), SF.floor((pos - band) * 16).alias("sub"))
        .where(SF.col("band") == 0)
        .select("sub")
        .distinct()
        .count()
    )
    assert n_cells > 1


# --- PCA power iteration --------------------------------------------------


def test_pca_recovers_planted_direction(spark):
    """Embeddings = t*u + small orthogonal jitter must yield a top
    component nearly parallel to u, unit-norm loadings, and an
    eigenvalue close to var(t)."""
    import math

    from quacfka_service_spark.operators.pca import pca_power

    d = 64
    u = [1.0 if i % 2 == 0 else -1.0 for i in range(d)]
    nu = math.sqrt(d)
    u = [x / nu for x in u]
    rows = []
    for r in range(400):
        t = (r % 21) - 10  # mean-zero coefficient, var ~ 36.67
        eps = [((r * 131 + i * 31) % 17 - 8) / 80.0 for i in range(d)]
        rows.append((r, [t * u[i] + eps[i] for i in range(d)], 0))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = pca_power(emb.select("vec_id", F.col("embedding"), "label")).collect()
    assert sorted(r.j for r in out) == list(range(1, d + 1))
    v = [r.loading for r in sorted(out, key=lambda r: r.j)]
    lam = out[0].eigenvalue
    assert all(r.eigenvalue == lam for r in out)
    nrm = sum(x * x for x in v)
    assert abs(nrm - 1.0) < 1e-9
    cos = abs(sum(a * b for a, b in zip(v, u)))
    assert cos > 0.99, cos
    t_var = sum((t - 0) ** 2 for t in [((r % 21) - 10) for r in range(400)]) / 400
    assert abs(lam - t_var) / t_var < 0.05, (lam, t_var)


def test_pca_on_corpus_is_deterministic_and_sane(spark):
    from quacfka_service_spark.operators.pca import pca_power

    emb = load_table(spark, SF_DIR, "embeddings")
    a = pca_power(emb).collect()
    b = pca_power(emb).collect()
    assert {(r.j, r.loading, r.eigenvalue) for r in a} == {
        (r.j, r.loading, r.eigenvalue) for r in b
    }
    assert a and a[0].eigenvalue > 0


# --- TF-IDF ---------------------------------------------------------------


def test_tfidf_topk_matches_bruteforce(spark):
    from quacfka_service_spark.operators.text import tfidf_topk

    docs = load_table(spark, SF_DIR, "documents").limit(40)
    out = tfidf_topk(docs).collect()
    assert out
    # brute force in Python over the same normalization
    corpus = {r.doc_id: r.text.strip().lower().split() for r in docs.collect()}
    import collections

    df = collections.Counter()
    for terms in corpus.values():
        for t in set(terms):
            if t:
                df[t] += 1
    for doc_id, terms in corpus.items():
        tf = collections.Counter(t for t in terms if t)
        scored = sorted(
            ((tf[t] / df[t], t) for t in tf), key=lambda s: (-s[0], s[1])
        )[:5]
        got = sorted(
            [(r.score, r.term) for r in out if r.doc_id == doc_id],
            key=lambda s: (-s[0], s[1]),
        )
        assert got == scored, doc_id
    for r in out:
        assert r.score == r.tf / r.df and 1 <= r.rank <= 5


# --- MAD outliers ---------------------------------------------------------


def test_outliers_mad_flags_planted_extremes(spark):
    from quacfka_service_spark.operators.olap import outliers_mad

    rows = []
    for i in range(200):
        rows.append((i, "2024-01-01 00:00:00", 1, "m", 10.0 + (i % 7) * 0.1, "{}"))
    rows.append((900, "2024-01-01 00:00:00", 1, "m", 500.0, "{}"))  # extreme
    rows.append((901, "2024-01-01 00:00:00", 1, "m", -500.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    flagged = {r.event_id for r in outliers_mad(df).collect()}
    assert flagged == {900, 901}


def test_outliers_mad_zero_mad_degrades_gracefully(spark):
    """Constant values -> MAD 0 -> any deviation is an outlier; a
    fully constant type flags nothing."""
    from quacfka_service_spark.operators.olap import outliers_mad

    rows = [(i, "2024-01-01 00:00:00", 1, "c", 5.0, "{}") for i in range(50)]
    rows.append((99, "2024-01-01 00:00:00", 1, "c", 5.1, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    assert {r.event_id for r in outliers_mad(df).collect()} == {99}


# --- data-quality expectations --------------------------------------------


def test_expectations_planted_violations(spark):
    """Inject one violation of each kind and check exactly the right
    counters trip."""
    from quacfka_service_spark.operators.expectations import expectations_report

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 7, "a", 1.0, "{}"),
            (1, "2024-01-01 01:00:00", 7, "a", 2.0, "{}"),  # dup event_id
            (2, None, None, "b", 5e9, "{}"),  # null ts, null user, range
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    orders = spark.createDataFrame(
        [(10, 100, "O", 5.0, "2024-01-01", "1-URGENT"),
         (11, 999, "O", -2.0, "2024-01-01", "1-URGENT")],  # orphan cust, neg price
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    lineitem = spark.createDataFrame(
        [(10, 1), (77, 1)], "l_orderkey long, l_partkey long"  # 77 orphan
    )
    customer = spark.createDataFrame(
        [(100, "c", 1, 0.0, "BUILDING")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    docs = spark.createDataFrame(
        [(1, "abc", "en", "s", 3), (2, "abcd", "en", "s", 99)],  # bad n_chars
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rep = {
        (r.table_name, r.check_name): (r.n_violations, r.passed)
        for r in expectations_report(ev, orders, lineitem, customer, docs).collect()
    }
    assert rep[("events", "event_id_unique")] == (1, False)
    assert rep[("events", "ts_not_null")] == (1, False)
    assert rep[("events", "user_id_not_null")] == (1, False)
    assert rep[("events", "value_in_range")] == (1, False)
    assert rep[("orders", "o_orderkey_unique")] == (0, True)
    assert rep[("orders", "o_totalprice_nonneg")] == (1, False)
    assert rep[("orders", "o_custkey_fk_customer")] == (1, False)
    assert rep[("lineitem", "l_orderkey_fk_orders")] == (1, False)
    assert rep[("documents", "doc_id_unique")] == (0, True)
    assert rep[("documents", "n_chars_consistent")] == (1, False)


def test_expectations_single_pass_per_scalar_suite(spark):
    """The events scalar suite must be ONE aggregate over the table
    (no per-constraint jobs): its plan contains exactly one pair of
    partial/final HashAggregate pairs feeding the explode."""
    from quacfka_service_spark.operators.expectations import _scalar_suite

    ev = load_table(spark, SF_DIR, "events")
    df = _scalar_suite(
        ev, "events",
        [("u", None, "event_id"), ("nn", F.col("ts").isNull(), None)],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one scan of the events parquet only
    assert plan.count("FileScan parquet") + plan.count("Scan parquet") <= 2


# --- bitmap overlap -------------------------------------------------------


def test_bitmap_overlap_is_exact(spark):
    """The bitmap intersection must equal the brute-force distinct
    intersection for every type pair."""
    from quacfka_service_spark.operators.olap import bitmap_overlap

    ev = load_table(spark, SF_DIR, "events")
    got = {(r.type_a, r.type_b): (r.n_a, r.n_b, r.n_inter) for r in bitmap_overlap(ev).collect()}
    assert got
    users = {}
    for r in ev.select("event_type", "user_id").distinct().collect():
        users.setdefault(r.event_type, set()).add(r.user_id)
    types = sorted(users)
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            na, nb, ni = got[(a, b)]
            assert na == len(users[a]) and nb == len(users[b])
            assert ni == len(users[a] & users[b])


# --- temporal split -------------------------------------------------------


def test_split_temporal_is_time_ordered(spark):
    from quacfka_service_spark.operators.split import split_temporal

    ev = load_table(spark, SF_DIR, "events")
    joined = split_temporal(ev).join(ev.select("event_id", "ts"), "event_id").collect()
    by = {}
    for r in joined:
        by.setdefault(r.split, []).append(r.ts)
    assert set(by) == {"train", "valid", "test"}
    # strict temporal ordering between splits
    assert max(by["train"]) <= min(by["valid"])
    assert max(by["valid"]) <= min(by["test"])
    n = len(joined)
    assert abs(len(by["train"]) / n - 0.8) < 0.02
    assert abs(len(by["valid"]) / n - 0.1) < 0.02


def test_pca_project_matches_loadings(spark):
    """proj must equal <x - mu, v> with the published loadings, and
    its variance must approximate the eigenvalue."""
    from quacfka_service_spark.operators.pca import pca_power, pca_project

    emb = load_table(spark, SF_DIR, "embeddings")
    comps = sorted(pca_power(emb).collect(), key=lambda r: r.j)
    v = [r.loading for r in comps]
    lam = comps[0].eigenvalue
    projs = [r.proj for r in pca_project(emb).collect()]
    assert len(projs) == emb.count()
    n = len(projs)
    mean = sum(projs) / n
    var = sum((p - mean) ** 2 for p in projs) / n
    # Rayleigh quotient equals the variance of the projection exactly
    # in exact arithmetic; allow float slack + convergence gap
    assert abs(var - lam) / lam < 0.05, (var, lam)
    assert abs(sum(x * x for x in v) - 1) < 1e-9


# --- PageRank -------------------------------------------------------------


def test_pagerank_hub_wins_star_graph(spark):
    """A star (one hub similar to many spokes, spokes dissimilar to
    each other) must rank the hub #1."""
    from quacfka_service_spark.operators.graph import pagerank_neardup

    d = 64
    hub = [1.0] * d
    rows = [(0, hub, 0)]
    for i in range(1, 9):
        # spoke_i = hub + big orthogonal kick in dim i -> cos(hub, spoke) high,
        # cos(spoke_i, spoke_j) lower
        v = list(hub)
        v[i] += 6.0
        v[i + 30] -= 6.0
        rows.append((i, v, 0))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = sorted(pagerank_neardup(emb, threshold=0.5).collect(), key=lambda r: r.rank)
    assert out[0].vec_id == 0, [(r.vec_id, r.pr) for r in out]
    assert out[0].rank == 1


def test_pagerank_integer_invariants(spark):
    from quacfka_service_spark.operators.graph import PR_Q, pagerank_neardup

    emb = load_table(spark, SF_DIR, "embeddings")
    rows = pagerank_neardup(emb).collect()
    assert rows
    total = sum(r.pr for r in rows)
    assert all(r.pr > 0 for r in rows)
    assert total <= PR_Q  # integer DIV only leaks mass, never creates it
    assert total > PR_Q // 2
    # ranks are a permutation 1..n
    assert sorted(r.rank for r in rows) == list(range(1, len(rows) + 1))
    # determinism
    again = pagerank_neardup(emb).collect()
    assert {(r.vec_id, r.pr) for r in rows} == {(r.vec_id, r.pr) for r in again}


# --- cluster topics ---------------------------------------------------------


def test_cluster_topics_shape_and_scores(spark):
    from quacfka_service_spark.operators.semdedup import cluster_topics

    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    rows = cluster_topics(docs, emb).collect()
    assert rows
    per = {}
    for r in rows:
        per.setdefault(r.cell, []).append(r)
        assert r.score == r.tf / r.df and r.df >= 1 and r.tf >= 1
    for cell, rs in per.items():
        ranks = sorted(r.rank for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        # within a cell the ordering is (score desc, term asc)
        rs.sort(key=lambda r: r.rank)
        for a, b in zip(rs, rs[1:]):
            assert (a.score, b.term) >= (b.score, a.term) or a.score > b.score or (
                a.score == b.score and a.term < b.term
            )


# --- attribution ------------------------------------------------------------


def test_attribution_planted_journey(spark):
    from quacfka_service_spark.operators.retention import attribution

    rows = [
        (1, "2024-01-01 00:00:00", 7, "view", 1.0, "{}"),
        (2, "2024-01-01 00:01:00", 7, "click", 1.0, "{}"),
        (3, "2024-01-01 00:02:00", 7, "purchase", 1.0, "{}"),
        (4, "2024-01-01 00:03:00", 7, "purchase", 1.0, "{}"),  # 2nd purchase, same touches
        (5, "2024-01-01 00:00:00", 8, "purchase", 1.0, "{}"),  # organic
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r.event_id: (r.first_touch, r.last_touch, r.touches) for r in attribution(df).collect()}
    assert got[3] == ("view", "click", 2)
    assert got[4] == ("view", "click", 2)  # the earlier purchase is not a touch
    assert got[5] == (None, None, 0)  # organic conversion row preserved
    assert set(got) == {3, 4, 5}


def test_attribution_single_exchange(spark):
    from quacfka_service_spark.operators.retention import attribution

    ev = load_table(spark, SF_DIR, "events")
    plan = attribution(ev)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Window") == 1  # all three aggs share one window op


# --- session paths ----------------------------------------------------------


def test_session_paths_planted(spark):
    from quacfka_service_spark.operators.sessionize import session_paths

    rows = []
    eid = 0
    # 3 users x same opening view>click>purchase, one user with view only
    for u in range(3):
        for j, t in enumerate(["view", "click", "purchase", "error"]):
            eid += 1
            rows.append((eid, f"2024-01-01 00:0{j}:00", u, t, 1.0, "{}"))
    eid += 1
    rows.append((eid, "2024-01-01 00:00:00", 9, "view", 1.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = sorted(session_paths(df).collect(), key=lambda r: r.rank)
    assert out[0].path == "view>click>purchase" and out[0].n_sessions == 3
    assert ("view", 1) in {(r.path, r.n_sessions) for r in out}


# --- LSH recall report ------------------------------------------------------


def test_lsh_recall_report_consistency(spark):
    from quacfka_service_spark.operators.dedup import lsh_recall_report

    docs = load_table(spark, SF_DIR, "documents")
    r = lsh_recall_report(docs).collect()[0]
    assert r.n_exact > 0 and r.n_cand > 0
    assert 0 <= r.n_hit <= min(r.n_exact, r.n_cand)
    assert r.recall == r.n_hit / r.n_exact
    assert r.prec == r.n_hit / r.n_cand
    # 8-perm/4-band md5 LSH on this fixture should find most true pairs
    assert r.recall >= 0.5, r


# --- BM25 -------------------------------------------------------------------


def test_bm25_matches_bruteforce(spark):
    from quacfka_service_spark.operators.text import (
        BM25_B,
        BM25_K1,
        BM25_QUERY,
        bm25_search,
    )

    docs = load_table(spark, SF_DIR, "documents")
    got = {r.doc_id: r.score for r in bm25_search(docs).collect()}
    assert got
    corpus = {r.doc_id: r.text.strip().lower().split() for r in docs.collect()}
    n_docs = len(corpus)
    total_len = sum(len([t for t in ts if t]) for ts in corpus.values())
    avgdl = total_len / n_docs
    import collections

    df = collections.Counter()
    for ts in corpus.values():
        for t in set(ts):
            if t in BM25_QUERY:
                df[t] += 1
    scores = {}
    for doc_id, ts in corpus.items():
        dl = len(ts)
        tf = collections.Counter(t for t in ts if t in BM25_QUERY)
        s = 0.0
        for t in sorted(tf):  # same fold order as the operator
            s += (n_docs / df[t]) * (tf[t] * (BM25_K1 + 1.0)) / (
                tf[t] + BM25_K1 * (1.0 - BM25_B + BM25_B * (dl / avgdl))
            )
        if tf:
            scores[doc_id] = s
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert dict(top) == got  # bit-exact against the same fold order


def test_readability_planted(spark):
    from quacfka_service_spark.operators.text import readability

    docs = spark.createDataFrame(
        [
            (1, "The cat sat. The dog ran!", "en", "s", 0),
            (2, "fragment with no terminator", "en", "s", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r.doc_id: r for r in readability(docs).collect()}
    r1 = got[1]
    assert r1.n_words == 6 and r1.n_sentences == 2
    # vowel groups: e,a,a,e,o,a -> in "the cat sat the dog ran": 6
    assert r1.n_syllables == 6
    assert abs(r1.flesch - (206.835 - 1.015 * 3.0 - 84.6 * 1.0)) < 1e-9
    assert got[2].n_sentences == 1  # floored, not 0


def test_forecast_backtest_seasonal_beats_naive_on_planted_cycle(spark):
    """A clean 24h-periodic series must give mae_seasonal == 0 and a
    skill of 0; support counts only hours both baselines can score."""
    from quacfka_service_spark.operators.timeseries import ts_forecast_backtest

    rows = []
    eid = 0
    for h in range(96):
        for _ in range((h % 24) + 1):  # perfectly daily-periodic counts
            eid += 1
            rows.append((eid, f"2024-02-{1 + h // 24:02d} {h % 24:02d}:10:00", 1, "cyc", 2.5, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    r = ts_forecast_backtest(df).collect()[0]
    assert r.n_scored == 96 - 24
    assert r.mae_seasonal == 0.0
    assert r.mae_naive > 0
    assert r.skill == 0.0


def test_benford_audit_invariants(spark):
    from quacfka_service_spark.operators.olap import BENFORD_P, benford_audit

    orders = load_table(spark, SF_DIR, "orders")
    rows = benford_audit(orders).collect()
    assert rows and {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert r.benford_p == BENFORD_P[r.digit]
        assert r.dev == abs(r.share - r.benford_p)


def test_benford_flags_fabricated_amounts(spark):
    """Uniform fabricated amounts (first digits uniform) must deviate
    far more from Benford than log-uniform natural ones."""
    import math

    from quacfka_service_spark.operators.olap import benford_audit

    def mk(amounts):
        return spark.createDataFrame(
            [(i, 1, "O", a, "2024-01-01", "1-URGENT") for i, a in enumerate(amounts)],
            "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate string, o_orderpriority string",
        ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))

    natural = [math.exp(math.log(10.0) * ((i * 0.618033988749895) % 3 + 1)) for i in range(2000)]
    fabricated = [100.0 + (i % 900) for i in range(2000)]
    dev_nat = max(r.dev for r in benford_audit(mk(natural)).collect())
    dev_fab = max(r.dev for r in benford_audit(mk(fabricated)).collect())
    assert dev_fab > 2 * dev_nat, (dev_fab, dev_nat)


def test_langid_confusion_consistency(spark):
    from quacfka_service_spark.operators.text import langid_confusion

    docs = load_table(spark, SF_DIR, "documents")
    rows = langid_confusion(docs).collect()
    assert rows
    n_docs = docs.count()
    assert sum(r.n for r in rows) == n_docs
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r.lang, []).append(r)
        assert r.recall == r.n / r.class_total
    for lang, rs in per_lang.items():
        assert sum(r.n for r in rs) == rs[0].class_total


def test_conversion_time_planted(spark):
    from quacfka_service_spark.operators.retention import conversion_time

    rows = [
        (1, "2024-01-01 00:00:00", 1, "signup", 1.0, "{}"),
        (2, "2024-01-01 01:00:00", 1, "purchase", 1.0, "{}"),  # 3600000 ms
        (3, "2024-01-01 00:00:00", 2, "purchase", 1.0, "{}"),  # BEFORE signup
        (4, "2024-01-01 02:00:00", 2, "signup", 1.0, "{}"),
        (5, "2024-01-01 00:00:00", 3, "signup", 1.0, "{}"),    # never converts
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    r = conversion_time(df).collect()[0]
    assert r.n_converted == 1  # pre-signup purchase and non-converter excluded
    assert r.max_ms == 3_600_000
    assert r.p50_ms.startswith("3600000")


def test_lsh_power_curve_monotone(spark):
    """More bands (fewer rows per band) at the same permutation budget
    must never lower expected recall; the exact (1,8)/(8,1) endpoints
    bound everything; all configs score the same pair set."""
    from quacfka_service_spark.operators.dedup import lsh_power_curve

    docs = load_table(spark, SF_DIR, "documents")
    rows = {(r.bands, r.rows): r for r in lsh_power_curve(docs).collect()}
    assert set(rows) == {(8, 1), (4, 2), (2, 4), (1, 8)}
    ns = {r.n_pairs for r in rows.values()}
    assert len(ns) == 1 and ns.pop() > 0
    er = {k: v.expected_recall for k, v in rows.items()}
    assert er[(8, 1)] >= er[(4, 2)] >= er[(2, 4)] >= er[(1, 8)]
    assert 0 < er[(1, 8)] and er[(8, 1)] <= 1.0


def test_slo_burn_planted(spark):
    from quacfka_service_spark.operators.olap import slo_burn

    rows = []
    eid = 0
    for j in range(100):  # hour 0: 5% errors -> burning at SLO 0.99
        eid += 1
        rows.append((eid, "2024-01-01 00:30:00", 1, "error" if j < 5 else "view", 1.0, "{}"))
    for j in range(1000):  # hour 1: 0.5% errors -> within budget
        eid += 1
        rows.append((eid, "2024-01-01 01:30:00", 1, "error" if j < 5 else "view", 1.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r.h.hour: r for r in slo_burn(df).collect()}
    assert got[0].burning and got[0].burn_rate > 4.9
    assert not got[1].burning and abs(got[1].burn_rate - 0.5) < 1e-9


def test_cluster_coherence_bounds(spark):
    from quacfka_service_spark.operators.semdedup import cluster_coherence

    emb = load_table(spark, SF_DIR, "embeddings")
    rows = cluster_coherence(emb).collect()
    assert rows
    total = sum(r.n for r in rows)
    assert total == emb.count()
    for r in rows:
        assert -1.0000001 <= r.mean_cos <= 1.0000001
        assert r.n >= 1


def test_growth_accounting_planted(spark):
    from quacfka_service_spark.operators.retention import growth_accounting

    rows = [
        # user 1: weeks 1,2 then gone (churn at week 3)
        (1, "2024-01-01 10:00:00", 1, "view", 1.0, "{}"),
        (2, "2024-01-08 10:00:00", 1, "view", 1.0, "{}"),
        # user 2: week 1, gap, resurrected week 3
        (3, "2024-01-01 11:00:00", 2, "view", 1.0, "{}"),
        (4, "2024-01-15 11:00:00", 2, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r.w.strftime("%Y-%m-%d"): r for r in growth_accounting(df).collect()}
    assert got["2024-01-01"].new_users == 2
    assert got["2024-01-08"].retained == 1 and got["2024-01-08"].churned == 1  # user 2 churn attributed here
    assert got["2024-01-15"].resurrected == 1 and got["2024-01-15"].churned == 1  # user 1 churn
    assert got["2024-01-22"].churned == 1  # user 2 final churn


def test_hhi_planted_monopoly_vs_competitive(spark):
    from quacfka_service_spark.operators.olap import supplier_hhi

    li = spark.createDataFrame(
        [(1, 10, 1, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", "2024-01-01"),
         (2, 10, 1, 1, 1.0, 300.0, 0.0, 0.0, "N", "O", "2024-01-01")]  # brand A: 1 supplier
        + [(10 + i, 20, 100 + i, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", "2024-01-01") for i in range(10)],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, l_quantity double, l_extendedprice double, l_discount double, l_tax double, l_returnflag string, l_linestatus string, l_shipdate string",
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
    part = spark.createDataFrame(
        [(10, "a", "MONO", "t", 1, 1.0), (20, "b", "COMP", "t", 1, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string, p_size int, p_retailprice double",
    )
    got = {r.p_brand: r for r in supplier_hhi(li, part).collect()}
    assert got["MONO"].concentration == "concentrated" and abs(got["MONO"].hhi - 1.0) < 1e-9
    assert got["COMP"].concentration == "competitive" and abs(got["COMP"].hhi - 0.1) < 1e-9
    assert got["COMP"].n_suppliers == 10


def test_gini_planted_extremes(spark):
    from quacfka_service_spark.operators.olap import revenue_gini

    def mk(amounts):
        return spark.createDataFrame(
            [(i, i, "O", a, "2024-01-01", "1-URGENT") for i, a in enumerate(amounts)],
            "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate string, o_orderpriority string",
        ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))

    # perfectly equal -> G = (n-1-n... ) ~ 0 (exactly 0 for equal values)
    eq = revenue_gini(mk([100.0] * 50)).collect()[0]
    assert abs(eq.gini) < 1e-9 and eq.n_customers == 50
    # one customer owns everything (others epsilon) -> G near (n-1)/n
    skew = revenue_gini(mk([0.01] * 49 + [1_000_000.0])).collect()[0]
    assert skew.gini > 0.95


def test_length_quality_corr_planted(spark):
    """Length-proportional quality must give corr ~ 1; constant quality
    gives NULL (zero variance)."""
    from quacfka_service_spark.operators.text import length_quality_corr

    # quality is monotone-increasing in n_words below 100 words and the
    # stopword term is 0 without stopwords -> corr ~ 1 when n_chars
    # tracks n_words
    rows = [(i, " ".join(["word"] * (5 + i)), "en", "s", len(" ".join(["word"] * (5 + i)))) for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    r = length_quality_corr(docs).collect()[0]
    assert r.n == 50 and r.corr > 0.99
    rows2 = [(i, "the the the", "en", "s", 100 + i) for i in range(20)]
    docs2 = spark.createDataFrame(rows2, "doc_id long, text string, lang string, source string, n_chars long")
    r2 = length_quality_corr(docs2).collect()[0]
    assert r2.corr is None  # constant quality: zero variance -> guarded NULL


def test_alert_episodes_planted(spark):
    """Three alerting hours with one gap -> exactly 2 episodes with the
    right spans."""
    from quacfka_service_spark.operators.olap import alert_episodes

    rows = []
    eid = 0
    plan = {0: 5, 1: 5, 2: 0, 3: 5, 4: 0}  # err count per hour (of 10)
    for h, errs in plan.items():
        for j in range(10):
            eid += 1
            rows.append((eid, f"2024-01-01 {h:02d}:30:00", 1, "error" if j < errs else "view", 1.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    eps = sorted(alert_episodes(df).collect(), key=lambda r: r.episode_start)
    assert len(eps) == 2
    assert eps[0].n_hours == 2 and eps[0].episode_start.hour == 0 and eps[0].episode_end.hour == 1
    assert eps[1].n_hours == 1 and eps[1].episode_start.hour == 3
    assert all(abs(e.peak_rate - 0.5) < 1e-9 for e in eps)


def test_vocab_growth_invariants(spark):
    from quacfka_service_spark.operators.text import vocab_growth

    docs = load_table(spark, SF_DIR, "documents")
    rows = sorted(vocab_growth(docs).collect(), key=lambda r: r.decile)
    assert rows and rows[0].decile >= 1 and rows[-1].decile == 10
    # cumulative series are non-decreasing; final totals match corpus
    for a, b in zip(rows, rows[1:]):
        assert b.cum_tokens >= a.cum_tokens and b.cum_vocab >= a.cum_vocab and b.n_docs >= a.n_docs
    assert rows[-1].n_docs == docs.count()
    ex = docs.select(F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("t")).where(F.col("t") != "")
    assert rows[-1].cum_tokens == ex.count()
    assert rows[-1].cum_vocab == ex.distinct().count()
    # Heaps: vocabulary grows sublinearly vs tokens (later deciles add fewer new terms)
    first_new = rows[0].cum_vocab / rows[0].cum_tokens
    last_new = (rows[-1].cum_vocab - rows[-2].cum_vocab) / max(rows[-1].cum_tokens - rows[-2].cum_tokens, 1)
    assert last_new < first_new


def test_source_overlap_planted_mirror(spark):
    from quacfka_service_spark.operators.dedup import source_overlap

    rows = []
    for i in range(20):  # A and MIRROR share all 20 docs; B is disjoint
        rows.append((i, f"shared document text {i}", "en", "A", 10))
        rows.append((100 + i, f"shared DOCUMENT   text {i}!", "en", "MIRROR", 10))  # normalizes equal
        rows.append((200 + i, f"unique b doc {i}", "en", "B", 10))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    got = {(r.source_a, r.source_b): r for r in source_overlap(docs).collect()}
    m = got[("A", "MIRROR")]
    assert m.n_shared == 20 and m.jaccard == 1.0
    assert got[("A", "B")].n_shared == 0 and got[("A", "B")].jaccard == 0.0
    assert got[("B", "MIRROR")].n_shared == 0
