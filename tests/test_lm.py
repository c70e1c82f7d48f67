"""Statistical LM operators (operators/lm.py): bigram-LM scoring and
Naive Bayes language-ID.  Cross-engine value parity is pinned by the
driver oracles + tools/parity_sweep.py (all three SFs, round 6); these
pin the model semantics and the plan shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quacfka_service_spark.operators.lm import ngram_lm_score, nb_lang_classifier
from quacfka_service_spark.session import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents")


def test_lm_score_covers_all_multitoken_docs(spark, docs):
    """Every document with >= 2 tokens gets a score; none gets two."""
    out = ngram_lm_score(docs)
    n_docs = docs.where(
        F.size(F.split(F.trim(F.lower("text")), r"\s+")) >= 2
    ).count()
    assert out.count() == n_docs
    assert out.select("doc_id").distinct().count() == n_docs


def test_lm_score_is_a_proper_logprob(docs):
    """Add-one smoothed bigram probabilities are < 1, so every average
    log-probability is strictly negative and finite."""
    bad = ngram_lm_score(docs).where(
        ~(F.col("avg_logp") < 0.0) | F.isnan("avg_logp")
    )
    assert bad.count() == 0


def test_lm_score_ranks_repetition_higher(spark):
    """A degenerate doc repeating one bigram must out-score (higher
    avg logp = more predictable) a doc of unique tokens — the signal
    CCNet-style filters threshold on, checked end-to-end."""
    rows = [(1, "a b " * 50), (2, " ".join(f"w{i}" for i in range(100)))]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r["avg_logp"] for r in ngram_lm_score(df).collect()}
    assert got[1] > got[2]


def test_nb_beats_majority_baseline(docs):
    """Resubstitution accuracy can't lose to the majority-class prior
    (the fixture text is lang-independent by construction, so the
    ceiling is low — the pin is the floor, not fitted to a number)."""
    out = nb_lang_classifier(docs)
    acc = out.agg(F.avg("correct")).collect()[0][0]
    majority = (
        docs.groupBy("lang").count().agg(F.max("count")).collect()[0][0]
        / docs.count()
    )
    assert acc >= majority - 1e-9, (acc, majority)


def test_nb_emits_one_prediction_per_doc(docs):
    out = nb_lang_classifier(docs)
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    preds = {r["predicted"] for r in out.select("predicted").distinct().collect()}
    assert preds <= langs


def test_nb_separable_fixture_is_learned(spark):
    """On actually-separable data NB must classify perfectly — guards
    against a silent scoring bug that the uninformative corpus (where
    ~majority accuracy is expected) could mask."""
    rows = [(i, "alpha beta gamma", "aa") for i in range(10)] + [
        (i + 10, "uno dos tres", "bb") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string, lang string")
    out = nb_lang_classifier(df)
    assert out.agg(F.avg("correct")).collect()[0][0] == 1.0


def test_lm_plans_have_no_cartesian_on_data(docs):
    """The only nested-loop joins are broadcast fans of model-sized
    tables (1-row vocab, |classes|-row class table); the token/bigram
    streams join hash-partitioned."""
    for op in (ngram_lm_score, nb_lang_classifier):
        plan = op(docs)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, op.__name__
        assert "BroadcastNestedLoopJoin" in plan, op.__name__  # the model fan


def test_quality_buckets_partition_the_corpus_evenly(spark, docs):
    """Global decile semantics: buckets 0..9, sizes differ by at most
    1 across deciles, every scored doc lands in exactly one bucket,
    and bucket score ranges are ordered and non-overlapping."""
    from quacfka_service_spark.operators.lm import lm_quality_buckets

    out = lm_quality_buckets(docs).collect()
    n_scored = ngram_lm_score(docs).count()
    assert sum(r["n_docs"] for r in out) == n_scored
    per_bucket = {}
    for r in out:
        assert 0 <= r["bucket"] <= 9
        per_bucket[r["bucket"]] = per_bucket.get(r["bucket"], 0) + r["n_docs"]
    sizes = [per_bucket.get(b, 0) for b in range(10)]
    assert max(sizes) - min(sizes) <= 1
    # non-overlapping, ordered score ranges across buckets
    lo = {b: min(r["lo_logp"] for r in out if r["bucket"] == b) for b in per_bucket}
    hi = {b: max(r["hi_logp"] for r in out if r["bucket"] == b) for b in per_bucket}
    bs = sorted(per_bucket)
    for a, b in zip(bs, bs[1:]):
        assert hi[a] <= lo[b]
