"""SemDeDup semantic dedup (operators/semdedup.py) and DSIR-style
importance weights (operators/importance.py).  Cross-engine value
parity is pinned by the driver oracles + tools/parity_sweep.py; these
pin the operator semantics, the kmeans production path, and the plan
shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quacfka_service_spark.operators.importance import TARGET_MOD, importance_weights
from quacfka_service_spark.operators.semdedup import (
    SEM_THRESHOLD,
    assign_cells,
    semantic_dedup,
)
from quacfka_service_spark.session import load_table

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MID = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR_MID, "embeddings")


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents")


# --- semantic dedup --------------------------------------------------------


def test_semdedup_covers_corpus_and_is_nonvacuous(emb):
    out = semantic_dedup(emb).cache()
    n = emb.count()
    assert out.count() == n
    dropped = out.where(~F.col("kept")).count()
    assert 0 < dropped < n  # non-vacuous both ways at sf0.01 / tau=0.35


def test_semdedup_cell_minimum_always_survives(emb):
    """The drop rule only ever fires against a LOWER vec_id in the same
    cell, so each cell's minimum id is structurally undroppable."""
    out = semantic_dedup(emb)
    mins = out.groupBy("cell").agg(F.min("vec_id").alias("vec_id"))
    bad = out.join(mins, ["cell", "vec_id"]).where(~F.col("kept"))
    assert bad.count() == 0


def test_semdedup_dropped_have_a_near_lower_neighbor(emb):
    """Every dropped vector really has an in-cell lower-id neighbor at
    cosine >= threshold (recomputed independently, exact arithmetic)."""
    cells = assign_cells(emb)
    a, b = cells.alias("a"), cells.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    witness = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("b.vec_id").alias("vec_id"),
            (dot / (F.col("a.nrm") * F.col("b.nrm"))).alias("cos"),
        )
        .where(F.col("cos") >= SEM_THRESHOLD)
        .select("vec_id")
        .distinct()
    )
    dropped = semantic_dedup(emb).where(~F.col("kept")).select("vec_id")
    assert dropped.exceptAll(witness).count() == 0
    assert witness.exceptAll(dropped).count() == 0


def test_semdedup_kmeans_path_runs(emb):
    """Production path: pyspark.ml KMeans centroids (seed-pinned).
    Same schema/coverage contract; the partition of vec_ids into cells
    is a proper partition (one cell per vector)."""
    out = semantic_dedup(emb, kmeans=True, n_clusters=4)
    assert out.columns == ["vec_id", "cell", "kept"]
    assert out.count() == emb.count()
    assert out.select("vec_id").distinct().count() == emb.count()
    assert out.select("cell").distinct().count() <= 4


def test_semdedup_assignment_is_map_only(emb):
    """Cell assignment must be a pure projection over the scan — the
    bounded codebook is inlined as a literal array, so there is NO
    join of any kind, NO window, and NO exchange anywhere in the
    subtree (VERDICT r7 #1: the old broadcast-crossJoin x k + vec_id
    argmax window forced a full hash exchange of the fanned rows).
    Pinned on assign_cells (semantic_dedup localCheckpoints it, which
    collapses the subtree out of the final plan — by design: three
    consumers, one materialization)."""
    plan = assign_cells(emb, include_cos=True)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


# --- importance weights ----------------------------------------------------


def test_importance_target_docs_score_above_corpus_mean(docs):
    """Target-sample docs contain the features the target model was fit
    on, so their average weight must exceed the raw-corpus average —
    the separation DSIR resampling relies on."""
    w = importance_weights(docs).cache()
    t_avg = (
        w.where(F.col("doc_id") % TARGET_MOD == 1).agg(F.avg("weight")).collect()[0][0]
    )
    all_avg = w.agg(F.avg("weight")).collect()[0][0]
    assert t_avg > all_avg


def test_importance_masses_are_exact_integers(docs):
    """t_mass/r_mass stay BIGINT end-to-end (the determinism contract:
    one final division, everything before it exact)."""
    w = importance_weights(docs)
    schema = {f.name: f.dataType.simpleString() for f in w.schema.fields}
    assert schema["t_mass"] == "bigint"
    assert schema["r_mass"] == "bigint"
    assert schema["weight"] == "double"


def test_importance_covers_every_tokenized_doc(docs):
    n_tok = docs.where(F.trim(F.col("text")) != "").count()
    assert importance_weights(docs).count() == n_tok


def test_importance_weight_positivity_and_normalization(docs):
    """r_mass >= t_mass-contribution floor: weights are finite, > 0
    whenever the doc shares any feature with the target, and the
    corpus-level weighted mean of (t_mass/r_mass) ratios is bounded by
    construction (r model includes the target sample)."""
    w = importance_weights(docs)
    assert w.where(F.col("r_mass") <= 0).count() == 0
    assert w.where(F.isnan("weight") | (F.col("weight") < 0)).count() == 0


def test_importance_plan_broadcasts_bag_models(docs):
    """Both bag models (<= 64 rows) must broadcast; the per-doc score
    is map-side arithmetic plus one doc_id aggregation."""
    plan = importance_weights(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


# --- curation composition --------------------------------------------------


def test_curation_semantic_composes_filter_and_dedup(spark):
    """corpus_curation_semantic == (lang+quality filter) ∩ (semantic
    keepers over the FILTERED embeddings) — recomputed from the
    standalone pieces — and the dedup stage is non-vacuous at sf0.01."""
    from quacfka_service_spark.operators.corpus import (
        KEEP_LANGS,
        MIN_QUALITY,
        corpus_curation_semantic,
    )
    from quacfka_service_spark.operators.text import lang_id, text_quality

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    out = corpus_curation_semantic(docs, emb).cache()

    filtered = (
        docs.join(lang_id(docs).where(F.col("lang_pred").isin(*KEEP_LANGS)), "doc_id")
        .join(text_quality(docs).select("doc_id", "quality"), "doc_id")
        .where(F.col("quality") >= MIN_QUALITY)
        .select("doc_id")
    )
    fe = emb.join(
        filtered.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    kept = (
        semantic_dedup(fe).where(F.col("kept")).select(F.col("vec_id").alias("doc_id"))
    )
    want = {r["doc_id"] for r in filtered.join(kept, "doc_id").collect()}
    got = {r["doc_id"] for r in out.collect()}
    assert got == want
    # non-vacuous both directions: the filter dropped docs AND the
    # semantic stage dropped post-filter survivors
    n_docs, n_filtered = docs.count(), filtered.count()
    assert len(got) < n_filtered < n_docs
    # splits present and exhaustive
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits == {"train", "val", "test"}


# --- DSIR resample ---------------------------------------------------------


def test_dsir_resample_matches_weight_rule(docs):
    """kept == (bucket/100 < weight) recomputed from importance_weights
    + split.hash_bucket — and weight >= 1 docs are ALWAYS kept."""
    from quacfka_service_spark.operators.importance import dsir_resample
    from quacfka_service_spark.operators.split import hash_bucket

    out = dsir_resample(docs).cache()
    w = importance_weights(docs).withColumn("bucket", hash_bucket(F.col("doc_id")))
    joined = out.join(w.select("doc_id", "weight", "bucket"), "doc_id")
    # rule equivalence on the float form (exact: single-division doubles)
    bad = joined.where(
        F.col("kept") != (F.col("bucket") / F.lit(100.0) < F.col("weight"))
    )
    assert bad.count() == 0
    assert joined.where((F.col("weight") >= 1.0) & ~F.col("kept")).count() == 0
    # non-vacuous: thinning actually happened, and something survived
    kept_n = out.where(F.col("kept")).count()
    assert 0 < kept_n < out.count()


# --- drift TV --------------------------------------------------------------


def test_drift_tv_bounds_and_coverage(docs):
    from quacfka_service_spark.operators.importance import drift_tv

    out = drift_tv(docs).cache()
    n_sources = docs.select("source").distinct().count()
    assert out.count() == n_sources
    bad = out.where((F.col("tv") < 0.0) | (F.col("tv") > 1.0))
    assert bad.count() == 0


def test_drift_tv_separates_shifted_source(spark):
    """A source drawing from a disjoint vocabulary must score a higher
    TV than a source matching the corpus blend — the drift signal the
    operator exists for."""
    from quacfka_service_spark.operators.importance import drift_tv

    rows = []
    for i in range(60):
        rows.append((i, "alpha beta gamma delta", "steady"))
    for i in range(60, 120):
        rows.append((i, "alpha beta gamma delta", "steady2"))
    for i in range(120, 150):
        rows.append((i, "zork quux blorp frotz", "drifted"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    tv = {r["source"]: r["tv"] for r in drift_tv(docs).collect()}
    assert tv["drifted"] > tv["steady"]
    assert tv["drifted"] > 0.5
    assert tv["steady"] == tv["steady2"]  # identical distributions tie exactly
