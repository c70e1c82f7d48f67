"""Semantics tests for the batch-6 operators: RAG chunk windows, FFD
packing, and the event transition matrix (hand-built inputs with
known answers; cross-engine parity is covered by test_oracle_parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from quacfka_service_spark.operators.chunking import chunk_windows
from quacfka_service_spark.operators.corpus import corpus_pack_greedy
from quacfka_service_spark.operators.retention import event_transitions


def test_chunk_windows_overlap_and_coverage(spark):
    # 10 tokens, window 4, stride 3 -> starts 0,3,6,9
    text = " ".join(f"t{i}" for i in range(10))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = {
        r.chunk_id: r for r in chunk_windows(docs, window=4, stride=3).collect()
    }
    assert sorted(rows) == [0, 1, 2, 3]
    assert rows[0].chunk_text == "t0 t1 t2 t3"
    assert rows[1].chunk_text == "t3 t4 t5 t6"  # 1-token overlap
    assert rows[3].chunk_text == "t9" and rows[3].n_tokens == 1
    # every token appears in at least one chunk; consecutive chunks
    # share exactly window-stride tokens
    covered = set()
    for r in rows.values():
        covered.update(r.chunk_text.split())
    assert covered == {f"t{i}" for i in range(10)}


def test_chunk_windows_edge_docs(spark):
    docs = spark.createDataFrame(
        [(1, "only"), (2, "   "), (3, "a b")], "doc_id long, text string"
    )
    out = chunk_windows(docs, window=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc.get(1, [])) == 1 and by_doc[1][0].chunk_text == "only"
    assert 2 not in by_doc  # whitespace-only doc emits nothing
    assert by_doc[3][0].n_tokens == 2


def _reference_ffd(items, capacity):
    """(doc_id, n) sorted (n desc, doc_id asc) -> {doc_id: block}."""
    order = sorted(items, key=lambda t: (-t[1], t[0]))
    fills, assign = [], {}
    for doc, n in order:
        if n >= capacity:
            assign[doc] = len(fills)
            fills.append(n)
            continue
        for b, f in enumerate(fills):
            if f + n <= capacity:
                assign[doc] = b
                fills[b] = f + n
                break
        else:
            assign[doc] = len(fills)
            fills.append(n)
    return assign, fills


def test_pack_greedy_matches_reference_ffd(spark):
    # token counts: lengths 5,4,4,3,2,2,1 against capacity 8
    words = {10: 5, 11: 4, 12: 4, 13: 3, 14: 2, 15: 2, 16: 1, 17: 9}
    docs = spark.createDataFrame(
        [(d, " ".join(["w"] * n)) for d, n in words.items()],
        "doc_id long, text string",
    ).withColumn("source", F.lit("s"))
    got = corpus_pack_greedy(docs, capacity=8).collect()
    want_assign, want_fills = _reference_ffd(list(words.items()), 8)
    assert {r.doc_id: r.block_id for r in got} == want_assign
    for r in got:
        assert r.block_fill == want_fills[r.block_id]
        # capacity respected except dedicated oversize blocks
        if r.block_fill > 8:
            members = [x for x in got if x.block_id == r.block_id]
            assert len(members) == 1 and members[0].n_tokens >= 8


def test_pack_greedy_blocks_within_capacity_on_fixture(spark):
    from quacfka_service_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = corpus_pack_greedy(docs).toPandas()
    assert len(out) == docs.count()  # every doc placed exactly once
    grp = out.groupby(["source", "block_id"])
    sums = grp["n_tokens"].sum()
    fills = grp["block_fill"].first()
    assert (sums == fills).all()  # fill really is the block total
    from quacfka_service_spark.operators.corpus import PACK_CAPACITY

    over = out[out.block_fill > PACK_CAPACITY]
    # oversize blocks are singletons
    assert (over.groupby(["source", "block_id"]).size() == 1).all()


def test_event_transitions_counts(spark):
    rows = [
        # user 1: a -> b -> b   (ties impossible: distinct ts)
        (1, 1, "2024-01-01 00:00:00", "a"),
        (2, 1, "2024-01-01 00:00:01", "b"),
        (3, 1, "2024-01-01 00:00:02", "b"),
        # user 2: b -> a
        (4, 2, "2024-01-01 00:00:00", "b"),
        (5, 2, "2024-01-01 00:00:01", "a"),
        # user 3: single event -> no transition
        (6, 3, "2024-01-01 00:00:00", "a"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).selectExpr("event_id", "user_id", "cast(ts as timestamp) ts", "event_type")
    got = {
        (r.prev_type, r.next_type): r.n for r in event_transitions(ev).collect()
    }
    assert got == {("a", "b"): 1, ("b", "b"): 1, ("b", "a"): 1}


def test_event_transitions_tie_break_on_event_id(spark):
    # same ts: order decided by event_id -> a(1) then b(2)
    rows = [(1, 1, "2024-01-01 00:00:00", "a"), (2, 1, "2024-01-01 00:00:00", "b")]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).selectExpr("event_id", "user_id", "cast(ts as timestamp) ts", "event_type")
    got = {(r.prev_type, r.next_type): r.n for r in event_transitions(ev).collect()}
    assert got == {("a", "b"): 1}


# --- leakage-safe split + token budget (batch 6b) --------------------------

def test_split_group_safe_never_splits_a_neardup_pair(spark):
    from quacfka_service_spark.operators.dedup import ngram_jaccard_pairs
    from quacfka_service_spark.operators.split import split_group_safe
    from quacfka_service_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    split = split_group_safe(docs).select("doc_id", "split").toPandas()
    assert len(split) == docs.count()
    lookup = dict(zip(split.doc_id, split.split))
    pairs = ngram_jaccard_pairs(docs).select("doc_a", "doc_b").toPandas()
    assert len(pairs) > 0  # non-vacuous: the fixture HAS near-dups
    for a, b in zip(pairs.doc_a, pairs.doc_b):
        assert lookup[a] == lookup[b], (a, b)
    # and it still produces more than one split overall
    assert set(lookup.values()) >= {"train", "test"}


def test_split_group_safe_vs_plain_split_disagree(spark):
    """The operator must actually MOVE some docs relative to per-doc
    hashing (otherwise the group logic is vacuous on the fixture)."""
    from quacfka_service_spark.operators.split import assign_split, split_group_safe
    from quacfka_service_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    grouped = split_group_safe(docs).select("doc_id", "split").toPandas()
    plain = (
        assign_split(docs.select("doc_id"), "doc_id")
        .select("doc_id", "split")
        .toPandas()
    )
    merged = grouped.merge(plain, on="doc_id", suffixes=("_g", "_p"))
    assert (merged.split_g != merged.split_p).any()


def test_token_budget_prefix_semantics(spark):
    from quacfka_service_spark.operators.corpus import corpus_token_budget
    from quacfka_service_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    kept = corpus_token_budget(docs).toPandas()
    from quacfka_service_spark.operators.text import _words  # noqa: F401
    from pyspark.sql import functions as F2

    total = docs.select(
        F2.sum(F2.size(F2.split(F2.trim(F2.lower("text")), r"\s+")))
    ).collect()[0][0]
    budget = total // 2
    assert kept.cum_tokens.max() <= budget
    # greedy prefix: kept mass + the SMALLEST excluded doc would overflow
    assert len(kept) > 0 and kept.cum_tokens.max() > budget * 0.9
    # deterministic: second run identical
    again = corpus_token_budget(docs).toPandas()
    assert sorted(kept.doc_id) == sorted(again.doc_id)
