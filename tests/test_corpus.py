"""Hand-built semantics checks for corpus packing (operators/corpus.py);
corpus_curation is covered end-to-end by the oracle-parity gate."""

from __future__ import annotations

from quacfka_service_spark.operators.corpus import corpus_pack_blocks


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
