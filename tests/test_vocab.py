"""OOV scoring semantics on a hand-built corpus (engine parity is the
oracle gate's job; this pins WHO counts as OOV, ties, empty docs)."""

from __future__ import annotations

from quacfka_service_spark.operators.vocab import oov_score, vocab_top


def _docs(spark):
    # tf: common=4, shared=3, alpha=beta=2 (tie broken by token string:
    # alpha wins the last slot at k=3), gamma/delta/epsilon=1.
    return spark.createDataFrame(
        [
            (1, "common shared alpha"),
            (2, "common shared beta common alpha"),
            (3, "common shared gamma delta beta"),
            (4, ""),
            (5, "epsilon"),
        ],
        "doc_id BIGINT, text STRING",
    )


def test_vocab_top_k_with_tie_break(spark):
    got = {(r["tok"], r["tf"]) for r in vocab_top(_docs(spark), k=3).collect()}
    assert got == {("common", 4), ("shared", 3), ("alpha", 2)}


def test_oov_score_counts(spark):
    got = {
        (r["doc_id"], r["n_tokens"], r["n_oov"])
        for r in oov_score(_docs(spark), k=3).collect()
    }
    # doc 4: split('') is [''] which is filtered -> (0, 0).
    assert got == {
        (1, 3, 0),   # all in vocab
        (2, 5, 1),   # beta OOV
        (3, 5, 3),   # gamma delta beta OOV
        (4, 0, 0),
        (5, 1, 1),   # epsilon OOV
    }


def test_bpe_merge_candidates(spark):
    from quacfka_service_spark.operators.vocab import bpe_merge_candidates

    docs = spark.createDataFrame(
        [(1, "aaa ab x"), (2, "ab aaa")],
        "doc_id BIGINT, text STRING",
    )
    got = [(r["pair"], r["cnt"]) for r in bpe_merge_candidates(docs, k=10).collect()]
    # 'aaa' x2 -> 'aa' 4 (per-position, twice per occurrence); 'ab' x2;
    # 'x' too short to pair.  Ties impossible here; order (cnt desc, pair).
    assert got == [("aa", 4), ("ab", 2)]
