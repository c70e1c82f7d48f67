"""Incremental IVF index (streaming/incremental_similarity.py): topk()
over any sequence of appended batches must equal batch ``ivf_topk``
over the union under the same frozen codebook — same neighbors, same
cosines, same ranks; replayed epochs are no-ops (txlog txn
idempotency)."""

from __future__ import annotations

from pyspark.sql import functions as F

from quacfka_service_spark.operators.similarity import ivf_topk, seed_centroids
from quacfka_service_spark.session import load_table
from quacfka_service_spark.streaming.incremental_similarity import IncrementalIVFIndex

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r["q_id"], r["rank"], r["neighbor_id"], r["cos"])
        for r in df.collect()
    )


def test_incremental_ivf_equals_batch_over_union(spark, tmp_path):
    emb = load_table(spark, SF_DIR, "embeddings")
    cents = seed_centroids(emb)  # frozen codebook, shared by both sides
    parts = [
        emb.where(F.col("vec_id") % 3 == 0),
        emb.where(F.col("vec_id") % 3 == 1),
        emb.where(F.col("vec_id") % 3 == 2),
    ]
    idx = IncrementalIVFIndex(str(tmp_path / "ivf"), centroids=cents)
    for epoch, part in enumerate(parts):
        idx.process_batch(part, epoch)

    got = _rows(idx.topk(spark))
    want = _rows(ivf_topk(emb, centroids=cents))
    assert len(want) > 0, "fixture produced no IVF results (vacuous)"
    assert got == want  # includes exact float equality on cos

    # replayed epoch: version unchanged, results unchanged
    v = idx.cells.latest_version()
    idx.process_batch(parts[1], 1)
    assert idx.cells.latest_version() == v
    assert _rows(idx.topk(spark)) == want


def test_incremental_ivf_batching_invariance(spark, tmp_path):
    """A different batch split (2 uneven epochs) must index to the same
    search results as the 3-way split — assignment is per-vector under
    a frozen codebook, so batching cannot matter."""
    emb = load_table(spark, SF_DIR, "embeddings")
    cents = seed_centroids(emb)
    idx = IncrementalIVFIndex(str(tmp_path / "ivf2"), centroids=cents)
    idx.process_batch(emb.where(F.col("vec_id") < 100), 0)
    idx.process_batch(emb.where(F.col("vec_id") >= 100), 1)
    assert _rows(idx.topk(spark)) == _rows(ivf_topk(emb, centroids=cents))


def test_incremental_ivf_grows_with_new_vectors(spark, tmp_path):
    """Vectors arriving later must become retrievable: a near-duplicate
    of an existing query vector appended in a later epoch shows up in
    that query's top-k afterwards."""
    emb = load_table(spark, SF_DIR, "embeddings")
    cents = seed_centroids(emb)
    idx = IncrementalIVFIndex(str(tmp_path / "ivf3"), centroids=cents)
    idx.process_batch(emb, 0)
    base = idx.topk(spark)
    # plant a near-dup of query vector 0 (qv ids are % QUERY_MOD == 0)
    q0 = emb.where(F.col("vec_id") == 0).collect()[0]
    twin = spark.createDataFrame(
        [(990001, list(q0["embedding"]), q0["label"])],
        "vec_id long, embedding array<double>, label long",
    )
    idx.process_batch(twin, 1)
    after = idx.topk(spark)
    hits = after.where(
        (F.col("q_id") == 0) & (F.col("neighbor_id") == 990001)
    )
    assert hits.count() == 1
    assert hits.collect()[0]["rank"] == 1  # an exact copy ranks first
    # other queries' result sets only ever improve/stay (no loss)
    assert after.count() >= base.count()
