"""Plan pins + semantic checks for the round-8 operators — the
load-bearing physical-plan properties (PLANS.md round-8 section) so
they cannot silently regress, plus non-vacuity semantics the oracle
multiset check alone would not prove."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quacfka_service_spark.plans.inspect import count_exchanges, formatted_plan
from quacfka_service_spark.session import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents").localCheckpoint()


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").localCheckpoint()


def test_zipf_slope_uses_partial_topk_not_global_sort(docs):
    from quacfka_service_spark.operators.vocab import zipf_slope

    df = zipf_slope(docs)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan  # distributed partial top-k
    assert "CartesianProduct" not in plan
    row = df.collect()[0]
    # the synthetic corpus has a tiny (31-token) vocabulary, so the
    # exponent is shallow — pin the sign and sane magnitudes, and that
    # the intercept is in NATS (ln of the top frequency, single digits)
    assert row["n_tokens_fit"] > 0
    assert -2.0 < row["slope"] < -0.05, row
    assert 0.0 < row["intercept"] < 25.0, row


def test_quality_psi_single_corpus_agg_and_detects_drift(spark, docs):
    from quacfka_service_spark.operators.corpus import quality_psi

    plan = formatted_plan(quality_psi(docs))
    assert "CartesianProduct" not in plan
    base = {r["source"]: r["psi"] for r in quality_psi(docs).collect()}
    assert base and all(p >= 0 for p in base.values())
    # plant a truncated feed: every doc cut to < one band width
    drifted = docs.unionByName(
        docs.limit(200).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            F.substring("text", 1, 30).alias("text"),
            "lang",
            F.lit("zz_truncated").alias("source"),
            F.lit(30).cast(docs.schema["n_chars"].dataType).alias("n_chars"),
        )
    )
    got = {r["source"]: r["psi"] for r in quality_psi(drifted).collect()}
    assert got["zz_truncated"] > max(base.values()), got


def test_whiten_2d_corpus_pass_is_map_only(emb):
    from quacfka_service_spark.operators.pca import whiten_2d

    df = whiten_2d(emb)
    plan = formatted_plan(df)
    assert count_exchanges(df) == 0
    assert "Join" not in plan and "Window" not in plan
    # whitened axes have ~unit variance on the fixture (sanity, loose)
    import math

    rows = df.collect()
    n = len(rows)
    for col in ("w1", "w2"):
        m = sum(r[col] for r in rows) / n
        var = sum((r[col] - m) ** 2 for r in rows) / n
        assert 0.5 < var < 2.0, (col, var)


def test_asof_nearest_no_nested_loop_and_tie_prefers_backward(spark):
    from quacfka_service_spark.operators.joins import asof_join_nearest

    left = spark.createDataFrame(
        [(1, 1, "2024-01-01 00:00:10")], "event_id long, user_id long, ts string"
    ).select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [
            (100, 1, "2024-01-01 00:00:05"),  # 5s before
            (200, 1, "2024-01-01 00:00:15"),  # 5s after (exact tie)
            (300, 1, "2024-01-01 00:00:30"),
        ],
        "event_id long, user_id long, ts string",
    ).select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"))
    out = asof_join_nearest(
        left, right.select("user_id", "ts", "event_id"),
        key="user_id", ts="ts", right_cols=["event_id"], prefix="r_",
    ).collect()
    assert len(out) == 1 and out[0]["r_event_id"] == 100  # backward wins ties
    plan = formatted_plan(
        asof_join_nearest(
            left, right.select("user_id", "ts", "event_id"),
            key="user_id", ts="ts", right_cols=["event_id"],
        )
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_matryoshka_recall_full_dim_is_perfect_and_truncation_degrades(emb):
    from quacfka_service_spark.operators.similarity import (
        EMB_DIM,
        matryoshka_recall,
    )

    out = {r["method"]: r for r in matryoshka_recall(emb, dims=(EMB_DIM, 16)).collect()}
    # the "truncation" to the FULL dim must recall everything — exact
    # self-agreement pins the set algebra itself
    assert out[f"dim{EMB_DIM}"]["recall_at_k"] == 1.0
    # 16 of 64 isotropic dims must lose real recall (non-vacuity)
    assert out["dim16"]["recall_at_k"] < 1.0
    assert out["dim16"]["n_exact"] == out[f"dim{EMB_DIM}"]["n_exact"]


def test_l_diversity_flags_homogeneous_group(spark):
    from quacfka_service_spark.operators.privacy import l_diversity

    rows = [(f"s{i % 2}", "b0", ["en", "fr", "de"][i % 3]) for i in range(30)]
    rows += [("s9", "b9", "en")] * 10  # large but HOMOGENEOUS group
    docs = spark.createDataFrame(rows, "source string, len_bin string, lang string")
    got = {
        (r["source"], r["len_bin"]): (r["l_distinct"], bool(r["meets_l"]))
        for r in l_diversity(docs).collect()
    }
    assert got[("s9", "b9")] == (1, False)  # k-anonymous yet unsafe
    assert got[("s0", "b0")][1] and got[("s1", "b0")][1]


def test_substring_kernel_rows_carry_hash_not_text(docs):
    from quacfka_service_spark.operators.dedup import _gram_occurrences

    occ = _gram_occurrences(docs)
    assert occ.columns == ["doc_id", "off", "g"]
    r = occ.limit(1).collect()[0]
    assert len(r["g"]) == 32  # md5 hex, never document text


def test_token_entropy_planted_extremes(spark):
    import math

    from quacfka_service_spark.operators.text import token_entropy

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "x x x x x x"), (3, "")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_types"], round(r["entropy"], 6))
        for r in token_entropy(docs).collect()
    }
    assert got[1] == (4, 4, round(math.log(4), 6))  # uniform -> ln(n_types)
    assert got[2][2] == 0.0  # stamped doc -> zero
    assert got[3] == (0, 0, 0.0)  # empty doc kept, not dropped


def test_token_jsd_planted_extremes(spark):
    import math

    from quacfka_service_spark.operators.corpus import token_jsd

    docs = spark.createDataFrame(
        [(1, "a b c", "s1"), (2, "a b c", "s2"), (3, "x y z", "s3"),
         (4, "a b x y", "s4")],
        "doc_id long, text string, source string",
    )
    got = {(r["source_a"], r["source_b"]): r["jsd"] for r in token_jsd(docs).collect()}
    assert got[("s1", "s2")] == 0.0  # identical distributions
    # fully disjoint vocabulary pairs must APPEAR, at ln 2
    assert abs(got[("s1", "s3")] - math.log(2)) < 1e-5
    assert abs(got[("s2", "s3")] - math.log(2)) < 1e-5
    # partial overlap sits strictly between
    assert 0.0 < got[("s1", "s4")] < math.log(2)
    assert len(got) == 6  # the full 4-choose-2 matrix


def test_dedup_funnel_monotone_and_anchored(spark, docs):
    from quacfka_service_spark.operators.corpus import dedup_funnel

    emb = load_table(spark, SF_DIR, "embeddings")
    got = {r["stage"]: r["n_docs"] for r in dedup_funnel(docs, emb).collect()}
    assert set(got) == {"1_raw", "2_exact", "3_near", "4_semantic"}
    assert got["1_raw"] == docs.count()
    # cumulative keep-set intersections can only shrink
    assert got["1_raw"] >= got["2_exact"] >= got["3_near"] >= got["4_semantic"]
    assert got["4_semantic"] > 0


def test_kmeans_assignment_subtree_is_map_only(emb):
    from quacfka_service_spark.operators.kmeans import (
        _assign,
        _quantized,
        seed_centroids_quantized,
    )

    cents = seed_centroids_quantized(emb, k=4)
    df = _assign(_quantized(emb), cents)
    plan = formatted_plan(df)
    # assignment against the inlined literal centroids: one projection,
    # zero exchanges/joins/windows
    assert count_exchanges(df) == 0
    assert "Join" not in plan and "Window" not in plan


def test_kmeans_assign_is_map_only_and_tiebreaks_earliest(emb):
    # r9 numpy kernel: assignment must be a pure map (zero exchanges —
    # the per-round sums ride the same pass and collect bounded rows),
    # and argmin must keep the EARLIEST centroid index on ties, the
    # contract the old strict-< Catalyst fold pinned.
    from quacfka_service_spark.operators.kmeans import (
        _assign,
        _quantized,
        seed_centroids_quantized,
    )

    cents = seed_centroids_quantized(emb, k=4)
    asg = _assign(_quantized(emb), cents)
    assert count_exchanges(asg) == 0
    assert asg.count() == emb.count()
    # duplicated centroid: every row ties between index 0 and 1 and
    # must land on 0
    dup = _assign(_quantized(emb), [cents[0], cents[0]])
    assert dup.where(F.col("cluster") != 0).count() == 0


def test_substring_rolling_prefilter_is_superset_and_exact(spark):
    # rolling-hash dup offsets must be a superset of md5-dup offsets,
    # and the two-phase operator must equal the direct md5 path
    from quacfka_service_spark.operators.dedup import (
        _gram_occurrences,
        _gram_occurrences_rolling,
        _spans_from_occ,
        substring_spans,
    )

    dup = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, dup + " left tail one"),
        (2, "right tail two " + dup),
        (3, "no duplicated content here at all, unique words only"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    occ = _gram_occurrences(docs).toPandas()
    roll = _gram_occurrences_rolling(docs).toPandas()
    md5_dups = occ[occ.groupby("g")["g"].transform("size") >= 2]
    roll_dups = roll[roll.groupby("rh")["rh"].transform("size") >= 2]
    md5_set = set(zip(md5_dups.doc_id, md5_dups.off))
    roll_set = set(zip(roll_dups.doc_id, roll_dups.off))
    assert md5_set and md5_set <= roll_set
    fast = sorted(map(tuple, substring_spans(docs).collect()))
    direct = sorted(
        map(tuple, _spans_from_occ(_gram_occurrences(docs).localCheckpoint()).collect())
    )
    assert fast == direct


def test_substring_census_twopass_equals_window_and_plan(spark):
    # r10 (ADVICE r9 #1): the scale-path two-pass census (map-side
    # combined groupBy + semi join, no rh-partitioned WindowExec that
    # would buffer a web-scale hot gram on one task) must produce the
    # exact same spans as the local-SF window census — including
    # through the non-ASCII verify fallback (UTF-8 grams wider than
    # one byte per char exercise the per-offset slicing branch).
    from quacfka_service_spark.operators.dedup import substring_spans

    base = "àéîõü çñ žšđ " * 5
    asc = "the quick brown fox jumps over the lazy dog " * 2
    rows = [
        (1, "prefix111 " + base + " middle " + asc),
        (2, "prefix222 " + base + " other2 " + asc),
        (3, "unique text with nothing duplicated in any other doc"),
        (4, "çæ" * 20),
        (5, "çæ" * 20),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    w = sorted(map(tuple, substring_spans(docs, census="window").collect()))
    t = sorted(map(tuple, substring_spans(docs, census="twopass").collect()))
    assert w == t and len(w) >= 5
    # non-ASCII spans actually survived (docs 4/5 are pure non-ASCII)
    assert any(r[0] == 4 for r in w) and any(r[0] == 5 for r in w)
    # plan pin on the census stage itself (the verify localCheckpoint
    # truncates the end-to-end visible plan): twopass selects
    # survivors via a LEFT SEMI join and has no rh-partitioned Window;
    # the window path is the inverse.
    from pyspark.sql import functions as SF
    from quacfka_service_spark.operators.dedup import _survivor_offsets

    d = docs.select(SF.col("doc_id").cast("long"), "text")
    plan_t = formatted_plan(_survivor_offsets(d, 32, "twopass"))
    plan_w = formatted_plan(_survivor_offsets(d, 32, "window"))
    assert "LeftSemi" in plan_t and "Window" not in plan_t
    assert "LeftSemi" not in plan_w and "Window" in plan_w
    # r11 (VERDICT r10 #4): the DEFAULT census is "auto" — plan-size
    # resolution.  Tiny local inputs resolve to the window fast path
    # (bench/test scale keeps its measured optimum); anything above
    # the one-task buffer bound — or with an unknown estimate — takes
    # the scale-safe twopass shape, so a 100 TB caller can never
    # inherit the window skew hazard from the default.
    import inspect

    from quacfka_service_spark.operators import dedup as _dd

    assert inspect.signature(substring_spans).parameters["census"].default == "auto"
    # a createDataFrame local relation has NO usable size estimate
    # (Long.Max) -> auto must take the scale-safe branch
    assert _dd._resolve_census("auto", d) == "twopass"
    plan_unknown = formatted_plan(_survivor_offsets(d, 32, "auto"))
    assert "LeftSemi" in plan_unknown and "Window" not in plan_unknown
    # a parquet-backed frame estimates its true (tiny) size -> window
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        d.write.mode("overwrite").parquet(tmp + "/docs")
        dp = spark.read.parquet(tmp + "/docs")
        assert _dd._resolve_census("auto", dp) == "window"
        plan_auto = formatted_plan(_survivor_offsets(dp, 32, "auto"))
        assert "Window" in plan_auto and "LeftSemi" not in plan_auto
        old_bound = _dd.WINDOW_CENSUS_MAX_EST_BYTES
        _dd.WINDOW_CENSUS_MAX_EST_BYTES = 0  # force the at-scale branch
        try:
            assert _dd._resolve_census("auto", dp) == "twopass"
            plan_scale = formatted_plan(_survivor_offsets(dp, 32, "auto"))
            assert "LeftSemi" in plan_scale and "Window" not in plan_scale
        finally:
            _dd.WINDOW_CENSUS_MAX_EST_BYTES = old_bound


def test_ngram_jaccard_census_twopass_equals_window_and_plan(spark):
    # r10 (ADVICE r9 #1, shingle site): the df-cap census must offer
    # the hot-set broadcast anti-join shape for web scale (no
    # s-partitioned WindowExec buffering a corpus-hot shingle on one
    # task), and both census modes must emit identical pairs.
    from quacfka_service_spark.operators.dedup import ngram_jaccard_pairs
    from quacfka_service_spark.plans.inspect import formatted_plan as fp

    dup = "the quick brown fox jumps over the lazy dog again and again"
    hotline = "all rights reserved cookie banner boilerplate line here ok"
    rows = [(i, hotline + " unique tail %d" % i) for i in range(3, 9)]
    rows += [(1, dup + " one"), (2, dup + " two")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    w = sorted(map(tuple, ngram_jaccard_pairs(docs, max_df=4, census="window").collect()))
    t = sorted(map(tuple, ngram_jaccard_pairs(docs, max_df=4, census="twopass").collect()))
    assert w == t and len(w) >= 1
    plan_t = fp(ngram_jaccard_pairs(docs, max_df=4, census="twopass"))
    plan_w = fp(ngram_jaccard_pairs(docs, max_df=4, census="window"))
    assert "LeftAnti" in plan_t and "Window" not in plan_t
    assert "LeftAnti" not in plan_w and "Window" in plan_w
    # r11 (VERDICT r10 #4): the DEFAULT census is "auto" (plan-size
    # resolution — window under the one-task buffer bound, the
    # scale-safe anti-join above it or on unknown estimates), and the
    # hot-set anti-join is NOT force-hinted broadcast (ADVICE r10: the
    # hot set grows with the corpus; AQE picks broadcast when it is
    # actually small).
    import inspect

    from quacfka_service_spark.operators import dedup as _dd

    assert (
        inspect.signature(ngram_jaccard_pairs).parameters["census"].default == "auto"
    )
    # createDataFrame local relation: no size estimate -> scale-safe
    plan_unknown = fp(ngram_jaccard_pairs(docs, max_df=4))
    assert "LeftAnti" in plan_unknown and "Window" not in plan_unknown
    # parquet-backed tiny frame: real estimate -> window fast path
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        docs.write.mode("overwrite").parquet(tmp + "/docs")
        dp = spark.read.parquet(tmp + "/docs")
        plan_small = fp(ngram_jaccard_pairs(dp, max_df=4))
        assert "Window" in plan_small and "LeftAnti" not in plan_small
        old_bound = _dd.WINDOW_CENSUS_MAX_EST_BYTES
        _dd.WINDOW_CENSUS_MAX_EST_BYTES = 0
        try:
            plan_scale2 = fp(ngram_jaccard_pairs(dp, max_df=4))
            assert "LeftAnti" in plan_scale2 and "Window" not in plan_scale2
        finally:
            _dd.WINDOW_CENSUS_MAX_EST_BYTES = old_bound


def test_neardup_kernel_matches_hof_fold_bits(spark):
    # the numpy sequential fold must produce the identical cos DOUBLES
    # the old zip_with/aggregate HOF join produced
    from quacfka_service_spark.operators.dedup import embedding_neardup

    rows = [
        (i, i % 2, [((i * 31 + d * 7) % 17 - 8) / 8.0 for d in range(16)])
        for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
    got = {(r["id_a"], r["id_b"]): r["cos"] for r in embedding_neardup(emb, 0.2).collect()}
    assert got
    d = emb.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    ).select(
        "vec_id",
        "label",
        "v",
        F.sqrt(
            F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x)
        ).alias("nrm"),
    )
    a, b = d.alias("a"), d.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = (dot / (F.col("a.nrm") * F.col("b.nrm"))).alias("cos")
    ref = (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"), cos)
        .where(F.col("cos") >= 0.2)
    )
    want = {(r["id_a"], r["id_b"]): r["cos"] for r in ref.collect()}
    assert set(got) == set(want)
    import struct

    for k in got:
        assert struct.pack("<d", got[k]) == struct.pack("<d", want[k]), k


def test_neardup_pair_scan_has_no_crossjoin(emb):
    from quacfka_service_spark.operators.dedup import embedding_neardup

    plan = formatted_plan(embedding_neardup(emb, 0.25))
    # cogrouped numpy kernel: label-keyed FlatMapCoGroups... no pair
    # join materialization, no cartesian/broadcast nested loop
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "FlatMapGroupsInPandas" in plan or "CoGroup" in plan or "FlatMapCoGroups" in plan


def test_winnowing_pick_is_hash_join_not_nested_loop(docs):
    from quacfka_service_spark.operators.text import winnowing_fp

    plan = formatted_plan(winnowing_fp(docs))
    # the rightmost-min pick must key on (doc_id, hash) equi columns
    # with the W-bounded range as residual — never a nested loop
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
