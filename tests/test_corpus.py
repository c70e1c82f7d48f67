"""Hand-built semantics checks for corpus packing (operators/corpus.py);
corpus_curation is covered end-to-end by the oracle-parity gate.
corpus_curation_lsh (the 100 TB path) gets a non-vacuity check and a
plan pin here since its engine-hash signatures have no DuckDB oracle."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from quacfka_service_spark.operators.corpus import (
    KEEP_LANGS,
    MIN_QUALITY,
    corpus_curation,
    corpus_pack_blocks,
)
from quacfka_service_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from quacfka_service_spark.operators.text import lang_id, text_quality
from quacfka_service_spark.plans.inspect import formatted_plan
from quacfka_service_spark.session import load_table

from .conftest import SF_DIR_MID


def _shingle_string_join_keys(plan: str) -> list[str]:
    """Join-key lines binding the exploded shingle STRING column — the
    signature of the exact quadratic pair join (`s` is the explode
    alias in both ngram_jaccard_pairs and minhash_signatures, but only
    the exact path ever uses it as a join key)."""
    return [
        l.strip()
        for l in plan.splitlines()
        if re.search(r"keys \[\d+\]: \[s#\d+\]", l)
    ]


def test_curation_lsh_plan_has_no_shingle_self_join(spark):
    docs = load_table(spark, SF_DIR_MID, "documents")
    lsh_plan = formatted_plan(minhash_lsh_pairs(docs))
    exact_plan = formatted_plan(ngram_jaccard_pairs(docs))
    # sanity: the marker does detect the exact emitter's quadratic join
    assert _shingle_string_join_keys(exact_plan), "marker lost its teeth"
    # the scale path never joins on raw shingle strings ...
    assert not _shingle_string_join_keys(lsh_plan)
    # ... and really is the MinHash path (signature hashing present)
    assert "xxhash64" in lsh_plan and "xxhash64" not in exact_plan


def test_curation_lsh_nonvacuous_at_sf001(spark):
    """The LSH curation variant must actually remove near-dups on the
    fixture corpus (guards against a wiring bug making the rows-only
    driver check vacuous)."""
    docs = load_table(spark, SF_DIR_MID, "documents")
    filtered_n = (
        docs.join(lang_id(docs).where(F.col("lang_pred").isin(*KEEP_LANGS)), "doc_id")
        .join(text_quality(docs).select("doc_id", "quality"), "doc_id")
        .where(F.col("quality") >= MIN_QUALITY)
        .count()
    )
    out = corpus_curation(docs, pair_emitter=minhash_lsh_pairs)
    n = out.count()
    assert 0 < n < filtered_n, (n, filtered_n)
    assert out.columns == ["doc_id", "lang_pred", "quality", "split"]


def test_pack_blocks_boundary_crossing(spark):
    docs = spark.createDataFrame(
        [
            ("s1", 1, "a b c"),                 # 3 tokens
            ("s1", 2, " ".join(["w"] * 510)),   # 510 tokens, crosses into block 1
            ("s1", 3, "x y z q r"),             # 5 tokens, starts inside block 1
            ("s2", 9, " ".join(["m"] * 512)),   # exactly one block in its own shard
        ],
        "source string, doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r.asDict()
        for r in corpus_pack_blocks(docs, block_tokens=512).collect()
    }
    assert rows[1] == {"source": "s1", "doc_id": 1, "n_tokens": 3,
                       "start_block": 0, "start_offset": 0, "end_block": 0}
    assert rows[2] == {"source": "s1", "doc_id": 2, "n_tokens": 510,
                       "start_block": 0, "start_offset": 3, "end_block": 1}
    assert rows[3] == {"source": "s1", "doc_id": 3, "n_tokens": 5,
                       "start_block": 1, "start_offset": 1, "end_block": 1}
    # shards pack independently
    assert rows[9] == {"source": "s2", "doc_id": 9, "n_tokens": 512,
                       "start_block": 0, "start_offset": 0, "end_block": 0}


def test_quality_gate_reason_bits(spark):
    """Each reason bit fires independently and combines on hand-built
    docs (the oracle covers fixture scale; this documents the bit
    semantics)."""
    from quacfka_service_spark.operators.corpus import (
        REASON_LANG,
        REASON_QUALITY,
        REASON_REPETITION,
        corpus_quality_gate,
    )

    docs = spark.createDataFrame(
        [
            # doc 1: en, 120 words, diverse tokens -> passes every gate
            (1, "en", " ".join(f"w{i} the" for i in range(60))),
            (2, "de", " ".join(f"w{i} the" for i in range(60))),  # lang fail only
            (3, "en", "short"),                                   # quality fail (len)
            (4, "en", "spam " * 200),                             # repetition fail (+quality ok: 200 words, 0 stopwords)
            (5, "zh", "x " * 150),                                # lang + repetition
        ],
        "doc_id long, lang string, text string",
    )
    out = {
        r["doc_id"]: (r["keep"], r["reasons"])
        for r in corpus_quality_gate(docs, lang_col="lang").collect()
    }
    assert out[1] == (1, 0)
    assert out[2] == (0, REASON_LANG)
    assert out[3] == (0, REASON_QUALITY)
    assert out[4] == (0, REASON_REPETITION)
    assert out[5] == (0, REASON_LANG + REASON_REPETITION)


def test_quality_gate_is_map_only_single_scan(spark):
    """r11 inline fold: every signal the gate consumes (lang_pred,
    quality, dup_word_frac) is a pure per-row function of (text, lang),
    so the whole gate is ONE map-only pass over documents — no doc_id
    self-joins, no explode, no shuffle.  (The pre-r11 shape joined
    lang_id/text_quality/repetition_signals frames on doc_id: 10 scans,
    14 exchanges, 4 joins, 2 generates at sf0.1.)"""
    from quacfka_service_spark.operators.corpus import corpus_quality_gate
    from quacfka_service_spark.plans.inspect import (
        count_exchanges,
        count_generates,
    )

    docs = load_table(spark, SF_DIR_MID, "documents")
    df = corpus_quality_gate(docs)
    plan = formatted_plan(df)
    assert count_exchanges(df) == 0, plan
    assert count_generates(df) == 0, plan
    assert "Join" not in plan, plan
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, plan


def test_curation_filter_folds_into_one_scan(spark):
    """r11 inline fold: corpus_curation's lang+quality filter computes
    lang_pred/quality inline on the documents scan instead of joining
    lang_id(docs)/text_quality(docs) back on doc_id.  The full curation
    plan therefore touches the documents parquet exactly twice (the
    filtered frame feeding the window + the pair-emitter leg inside the
    precomputed component map is cached separately), and none of its
    joins is keyed on doc_id against a same-scan twin of itself: the
    pre-r11 shape had 16 scans / 18 exchanges, the folded one 4 / 6."""
    from quacfka_service_spark.operators.corpus import _lang_quality_filtered

    docs = load_table(spark, SF_DIR_MID, "documents")
    filtered = _lang_quality_filtered(
        docs, KEEP_LANGS, MIN_QUALITY, ("doc_id", "text", "lang_pred", "quality")
    )
    plan = formatted_plan(filtered)
    # the filter itself: one scan, zero joins, zero exchanges
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, plan
    assert "Join" not in plan, plan
    from quacfka_service_spark.plans.inspect import count_exchanges

    assert count_exchanges(filtered) == 0, plan
