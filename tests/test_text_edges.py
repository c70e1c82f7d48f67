"""Degenerate-document hardening: empty, whitespace-only, and NULL text
must not kill a corpus job (Spark 4 runs ANSI mode — integral division
by zero THROWS; regression: text_quality's punct_ratio on length-0
text)."""

from __future__ import annotations

from quacfka_service_spark.operators.corpus import corpus_curation, corpus_pack_blocks
from quacfka_service_spark.operators.dedup import dedup_exact, ngram_jaccard_pairs
from quacfka_service_spark.operators.text import lang_id, text_quality, token_count


def _edge_docs(spark):
    return spark.createDataFrame(
        [
            (1, "", "en", "s1", 0),
            (2, "   ", "en", "s1", 3),
            (3, "hello world and the cat", "en", "s1", 23),
            (4, None, "en", "s1", None),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_text_ops_survive_degenerate_docs(spark):
    docs = _edge_docs(spark)
    q = {r["doc_id"]: r for r in text_quality(docs).collect()}
    assert len(q) == 4
    assert q[1]["punct_ratio"] is None  # NULL, not DIVIDE_BY_ZERO
    assert q[3]["punct_ratio"] == 0.0
    assert lang_id(docs).count() == 4
    assert token_count(docs).count() == 4
    assert dedup_exact(docs).count() == 4  # '', '   ', text, NULL distinct-ish
    assert ngram_jaccard_pairs(docs).count() == 0


def test_corpus_ops_survive_degenerate_docs(spark):
    docs = _edge_docs(spark)
    assert corpus_pack_blocks(docs).count() == 4
    # nothing passes the quality gate here; the point is no crash
    assert corpus_curation(docs).count() == 0


def test_hash_features_semantics(spark):
    from quacfka_service_spark.operators.text import hash_features

    docs = spark.createDataFrame(
        [(1, "cat dog cat"), (2, "dog"), (3, "   ")],
        "doc_id long, text string",
    )
    out = hash_features(docs, dim=16).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, {})[r.dim] = r.weight
    # same token -> same dim across docs; weights are counts
    dog_dim = next(iter(by_doc[2]))
    assert by_doc[2][dog_dim] == 1
    assert by_doc[1][dog_dim] == 1  # one 'dog' in doc 1
    cat_dims = [d for d, w in by_doc[1].items() if w == 2]
    assert len(cat_dims) == 1  # 'cat' counted twice in one dim
    assert 3 not in by_doc  # whitespace-only doc has no features
    # all dims within range
    assert all(0 <= r.dim < 16 for r in out)


def test_round4_ops_survive_degenerate_and_empty(spark):
    """field_profile / interleave_shards / multimodal_dedup on the
    degenerate fixture AND the fully-empty corpus: profile always
    emits its 5 column rows (n_rows=0, min_prefix='' when empty — a
    gate that crashes on an empty drop is useless); the other two
    return cleanly empty results."""
    from quacfka_service_spark.operators.corpus import (
        corpus_field_profile,
        corpus_interleave_shards,
    )
    from quacfka_service_spark.operators.multimodal import as_media, media_dedup

    docs = _edge_docs(spark)
    prof = {r["column"]: r for r in corpus_field_profile(docs).collect()}
    assert set(prof) == {"doc_id", "text", "lang", "source", "n_chars"}
    assert prof["text"]["n_nulls"] == 1 and prof["text"]["n_rows"] == 4
    assert corpus_interleave_shards(docs).count() == 4
    # NULL text -> NULL payload row survives md5 (NULL group)
    assert media_dedup(as_media(docs)).count() == 4

    empty = docs.where("doc_id < 0")
    eprof = corpus_field_profile(empty).collect()
    assert len(eprof) == 5
    assert all(r["n_rows"] == 0 and r["min_prefix"] == "" for r in eprof)
    assert corpus_interleave_shards(empty).count() == 0
    assert media_dedup(as_media(empty)).count() == 0


def test_winnowing_guarantee_and_short_docs(spark):
    from quacfka_service_spark.operators.text import (
        WINNOW_K,
        WINNOW_W,
        winnow_candidates,
        winnowing_fp,
    )

    shared = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 tokens
    rows = [
        (1, "intro one two " + shared + " tail xyz"),
        (2, shared + " completely different ending words here"),
        (3, "no overlap with anything else in this corpus at all truly"),
        (4, "tiny doc"),  # < K tokens -> no fingerprints
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnowing_fp(docs).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    # the Schleimer guarantee: a shared run of >= K+W-1 tokens (here 8
    # >= 7) forces a shared selected fingerprint
    assert by_doc[1] & by_doc[2]
    assert 4 not in by_doc
    # density: never more fingerprints than windows
    import collections

    n_fp = collections.Counter(r["doc_id"] for r in fps)
    for doc_id, text in rows[:3]:
        m = len(text.split()) - WINNOW_K + 1
        assert n_fp[doc_id] <= max(1, m - WINNOW_W + 1)
    cand = {(r["doc_a"], r["doc_b"]): r["n_shared"] for r in winnow_candidates(docs).collect()}
    assert (1, 2) in cand and cand[(1, 2)] >= 1
    assert all(p == (1, 2) or 3 not in p for p in cand)
