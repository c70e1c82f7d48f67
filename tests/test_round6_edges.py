"""Degenerate-input edge cases for the round-6 operators (the round-4
precedent: every new operator family gets empty / singleton / uniform
corpora thrown at it — failures here are the 3 a.m. production pages).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


# --- semantic dedup --------------------------------------------------------


def test_semdedup_empty_corpus(spark):
    from quacfka_service_spark.operators.semdedup import semantic_dedup

    out = semantic_dedup(_emb(spark, []))
    assert out.count() == 0
    assert out.columns == ["vec_id", "cell", "kept"]


def test_semdedup_single_vector_kept(spark):
    from quacfka_service_spark.operators.semdedup import semantic_dedup

    out = semantic_dedup(_emb(spark, [(7, [1.0, 0.0, 0.0, 0.0])])).collect()
    assert [(r["vec_id"], r["kept"]) for r in out] == [(7, True)]


def test_semdedup_all_identical_keeps_exactly_one(spark):
    """A corpus of clones must collapse to the min id — the dedup
    contract at its most extreme."""
    from quacfka_service_spark.operators.semdedup import semantic_dedup

    rows = [(i, [1.0, 0.5, 0.25, 0.0]) for i in range(20)]
    out = semantic_dedup(_emb(spark, rows), threshold=0.99)
    kept = [r["vec_id"] for r in out.where(F.col("kept")).collect()]
    assert kept == [0]
    assert out.count() == 20


# --- importance / resample / drift ----------------------------------------


def test_importance_empty_and_whitespace_docs(spark):
    from quacfka_service_spark.operators.importance import importance_weights

    docs = _docs(
        spark,
        [
            (1, "alpha beta", "en", "web", 10),
            (2, "   ", "en", "web", 3),
        ],
    )
    out = importance_weights(docs).collect()
    # whitespace-only doc has no tokens -> absent; real doc present
    assert [r["doc_id"] for r in out] == [1]


def test_dsir_resample_uniform_corpus_keeps_everything(spark):
    """If every doc IS the target distribution, every weight is ~1 and
    the bucket rule can only drop docs whose weight falls below
    bucket/100 — with identical docs the weights are exactly equal, so
    kept is uniform across docs with bucket < 100*w.  Sanity: nothing
    NULL, booleans total to the row count."""
    from quacfka_service_spark.operators.importance import dsir_resample

    docs = _docs(spark, [(i, "alpha beta gamma", "en", "web", 10) for i in range(30)])
    out = dsir_resample(docs)
    assert out.where(F.col("kept").isNull()).count() == 0
    assert out.count() == 30


def test_drift_tv_single_source_is_zero(spark):
    """One source == the corpus blend — TV must be exactly 0."""
    from quacfka_service_spark.operators.importance import drift_tv

    docs = _docs(spark, [(i, f"tok{i % 5} alpha", "en", "web", 10) for i in range(20)])
    out = drift_tv(docs).collect()
    assert len(out) == 1
    assert out[0]["tv"] == 0.0 and out[0]["tv_num"] == 0


# --- CMS -------------------------------------------------------------------


def test_cms_single_key_exact(spark):
    """With one key the sketch cannot collide — cms_n == true_n."""
    from quacfka_service_spark.operators.olap import cms_heavy_hitters

    ev = spark.createDataFrame(
        [(i, 42, "view", float(i), "2024-01-01 00:00:00") for i in range(17)],
        "event_id long, user_id long, event_type string, value double, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = cms_heavy_hitters(ev).collect()
    assert len(out) == 1
    assert out[0]["true_n"] == 17 and out[0]["cms_n"] == 17


# --- PQ rerank -------------------------------------------------------------


def test_pq_rerank_shortlist_smaller_than_k(spark):
    """When ADC can only shortlist fewer than k candidates (tiny
    corpus), rerank returns what exists instead of fabricating rows."""
    from quacfka_service_spark.operators.similarity import pq_rerank_topk

    rows = [(i, [float((i + d) % 7) for d in range(64)]) for i in range(0, 350, 50)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = pq_rerank_topk(emb, query_mod=100)  # queries: vec_id 0, 100, ...
    per_q = {r["q_id"]: r["rank"] for r in out.collect()}
    assert all(rank <= 5 for rank in per_q.values())
    assert out.count() <= out.select("q_id").distinct().count() * 5


# --- curation semantic -----------------------------------------------------


def test_curation_semantic_empty_embeddings(spark):
    """No embeddings -> no survivors (docs cannot pass the semantic
    stage without a vector) — the join contract, explicit."""
    from quacfka_service_spark.operators.corpus import corpus_curation_semantic

    docs = _docs(
        spark,
        [(1, "the a and of to in is on for alpha", "en", "web", 30)],
    )
    out = corpus_curation_semantic(docs, _emb(spark, []))
    assert out.count() == 0
