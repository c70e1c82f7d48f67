"""Mixture resampling semantics: limiting source kept in full,
expected proportions approached, determinism under repartitioning."""

from __future__ import annotations

import pyspark.sql.functions as F

from quacfka_service_spark.operators.mixture import corpus_mixture


def _docs(spark):
    rows = []
    i = 0
    for src, n in [("web", 600), ("books", 100), ("code", 300)]:
        for _ in range(n):
            rows.append((i, src))
            i += 1
    return spark.createDataFrame(rows, "doc_id BIGINT, source STRING").select(
        "doc_id", "source", F.lit("x").alias("text")
    )


def test_mixture_limiting_source_kept_in_full(spark):
    # targets 1:1:1 -> books (100 rows) limits; web/code keep ~100 each
    kept = corpus_mixture(_docs(spark), weights={}, default_weight=1)
    by_src = {r["source"]: r["n"] for r in
              kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by_src["books"] == 100            # limiting source: all rows
    for s in ("web", "code"):
        assert abs(by_src[s] - 100) <= 25    # hash-sampled ~1/6 resp. 1/3


def test_mixture_weighted_targets(spark):
    # web:books:code = 6:1:3 exactly matches the data -> keep everything
    kept = corpus_mixture(_docs(spark), weights={"web": 6, "books": 1, "code": 3})
    assert kept.count() == 1000


def test_mixture_is_partition_stable(spark):
    docs = _docs(spark)
    a = {r["doc_id"] for r in corpus_mixture(docs).collect()}
    b = {r["doc_id"] for r in corpus_mixture(docs.repartition(13)).collect()}
    assert a == b
