"""Decontamination on a hand-built corpus with planted overlaps —
the oracle-parity gate checks engine agreement; this test pins the
SEMANTICS (who is flagged, exact shared-gram counts, who is clean).
"""

from __future__ import annotations

from quacfka_service_spark.operators.decontam import decontaminate, split_benchmark


def test_decontaminate_planted(spark):
    bench = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs"),
        ],
        "doc_id BIGINT, text STRING",
    )
    train = spark.createDataFrame(
        [
            # shares "quick brown fox" and "brown fox jumps" -> n_hit 2
            (10, "a quick brown fox jumps again"),
            # shares exactly one 3-gram ("five dozen liquor")
            (11, "we bought five dozen liquor bottles"),
            # same words, different order -> clean
            (12, "fox brown quick the dog lazy"),
            # too short for any 3-gram
            (13, "quick brown"),
            # clean
            (14, "completely unrelated text about spark plans"),
            # duplicate grams in the doc count once (distinct grams)
            (15, "five dozen liquor five dozen liquor"),
        ],
        "doc_id BIGINT, text STRING",
    )
    got = {
        (r["doc_id"], r["n_hit"])
        for r in decontaminate(train, bench, n=3).collect()
    }
    assert got == {(10, 2), (11, 1), (15, 1)}


def test_split_benchmark_partition(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(300)], "doc_id BIGINT, text STRING"
    )
    train, bench = split_benchmark(docs)
    bench_ids = {r["doc_id"] for r in bench.select("doc_id").collect()}
    assert bench_ids == {0, 97, 194, 291}
    assert train.count() + len(bench_ids) == 300
