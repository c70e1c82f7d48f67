"""Planted-fixture tests for the round-8 closing additions: the
quantized Lloyd trainer, prototypicality pruning, and hard-negative
mining.  Oracle parity at sf0.001 is covered by test_oracle_parity's
registry sweep; these pin the SEMANTICS on hand-built data."""

import pytest
from pyspark.sql import functions as F

from quacfka_service_spark.operators.kmeans import (
    kmeans_assign,
    kmeans_train,
    prototypicality,
    seed_centroids_quantized,
)
from quacfka_service_spark.operators.similarity import hard_negatives


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )


def test_kmeans_separates_planted_blobs(spark):
    # two tight blobs far apart in 4-dim; seeding is first-2 BY VEC_ID,
    # so vec 0 (blob A) and vec 1 (blob B) are the seeds and 2-means
    # must recover the blobs exactly
    blob_a = [(i, 0, [1.0 + 0.001 * i, 0.0, 0.0, 0.0]) for i in [0, 2, 3, 4, 5]]
    blob_b = [(i, 1, [-1.0, 0.9, 0.002 * i, 0.0]) for i in [1, 11, 12, 13, 14]]
    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(_emb(spark, blob_a + blob_b), k=2).collect()
    }
    assert all(got[i] == 0 for i, _, _ in blob_a)
    assert all(got[i] == 1 for i, _, _ in blob_b)


def test_kmeans_trained_centroid_is_integer_mean(spark):
    # one cluster (k=1): after any rounds the centroid is the floor-div
    # mean of the quantized coordinates
    rows = [(1, 0, [0.25, -0.5]), (2, 0, [0.75, 0.5]), (3, 0, [0.5, 0.25])]
    cents = kmeans_train(_emb(spark, rows), k=1, rounds=2)
    q = [
        [250000, -500000],
        [750000, 500000],
        [500000, 250000],
    ]
    want = [sum(c[d] for c in q) // 3 for d in range(2)]
    assert cents == [want]


def test_kmeans_empty_cluster_keeps_seed(spark):
    # k=2 but every vector is nearest seed 0 after round 1 -> cluster 1
    # keeps its seed centroid instead of dividing by zero
    rows = [
        (1, 0, [0.0, 0.0]),
        (2, 0, [0.9, 0.9]),  # seed 1, but immediately closer to the pack's mean
        (3, 0, [0.1, 0.0]),
        (4, 0, [0.0, 0.1]),
        (5, 0, [0.05, 0.05]),
    ]
    cents = kmeans_train(_emb(spark, rows), k=2, rounds=3)
    assert len(cents) == 2 and all(len(c) == 2 for c in cents)
    # ran to completion with ints throughout
    assert all(isinstance(x, int) for c in cents for x in c)


def test_seed_centroids_are_first_k_by_vec_id(spark):
    rows = [(7, 0, [0.5]), (3, 0, [-0.25]), (9, 0, [1.0])]
    assert seed_centroids_quantized(_emb(spark, rows), k=2) == [
        [-250000],
        [500000],
    ]


def test_prototypicality_flags_planted_outlier(spark):
    pack = [(i, 0, [0.5, 0.5 + 0.0001 * i]) for i in range(6)]
    rows = pack + [(99, 0, [-0.5, -0.5])]  # far outlier, same label
    got = prototypicality(_emb(spark, rows), top=1).collect()
    by_which = {r["which"]: r for r in got}
    assert by_which["outlier"]["vec_id"] == 99
    assert by_which["core"]["vec_id"] != 99
    assert by_which["outlier"]["dist"] > by_which["core"]["dist"]


def test_hard_negatives_excludes_same_label(spark):
    # query 0 (label 0): its NEAREST vector shares its label and must
    # be absent; negatives are ranked by cosine among other labels only
    rows = [
        (0, 0, [1.0, 0.0]),
        (1, 0, [0.999, 0.01]),  # same label, nearest overall
        (2, 1, [0.9, 0.1]),
        (3, 1, [0.0, 1.0]),
        (4, 2, [0.8, 0.3]),
    ]
    got = hard_negatives(_emb(spark, rows), k=3, query_mod=100).collect()
    assert {r["q_id"] for r in got} == {0}
    ranked = sorted(got, key=lambda r: r["rank"])
    assert [r["neighbor_id"] for r in ranked] == [2, 4, 3]
    assert all(r["n_label"] != r["q_label"] for r in got)
    cosines = [r["cos"] for r in ranked]
    assert cosines == sorted(cosines, reverse=True)


def test_kcenter_greedy_picks_planted_extremes(spark):
    from quacfka_service_spark.operators.kmeans import kcenter_seeds

    # seed = vec 1 (lowest id) at origin; farthest point is vec 5 at
    # (1,1); next pick maximizes min-dist to {origin, (1,1)} -> vec 9
    # at (-1,-1) (dist to origin 2q^2, to (1,1) 8q^2 -> min 2q^2,
    # beating the cluster points near origin)
    rows = [
        (1, 0, [0.0, 0.0]),
        (2, 0, [0.01, 0.0]),
        (3, 0, [0.0, 0.02]),
        (5, 0, [1.0, 1.0]),
        (9, 0, [-1.0, -1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
    got = [(r["sel_order"], r["vec_id"]) for r in
           kcenter_seeds(emb, k=3).orderBy("sel_order").collect()]
    assert got == [(0, 1), (1, 5), (2, 9)]


def test_kcenter_exhausts_small_corpus(spark):
    from quacfka_service_spark.operators.kmeans import kcenter_seeds

    rows = [(1, 0, [0.5]), (2, 0, [-0.5])]
    emb = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
    got = kcenter_seeds(emb, k=8).collect()
    assert len(got) == 2  # stops when the corpus is exhausted


def test_silhouette_planted_geometry(spark):
    from quacfka_service_spark.operators.kmeans import silhouette

    rows = [
        # tight PURE cluster 0 around (1, 0)
        (1, 0, [1.0, 0.0]),
        (2, 0, [0.99, 0.0]),
        (3, 0, [1.0, 0.01]),
        # cluster 1 around (-1, 0) ...
        (4, 1, [-1.0, 0.0]),
        (5, 1, [-0.99, 0.0]),
        # ... with a misassigned member sitting inside cluster 0's
        # territory: its a_mean (to the -1 pack) dwarfs its b_mean (to
        # cluster 0) -> silhouette ~ -1
        (6, 1, [0.95, 0.0]),
        # singleton cluster: a_mean NULL, silhouette 0 by convention
        (7, 2, [0.0, 0.5]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
    got = {r["vec_id"]: r for r in silhouette(emb).collect()}
    assert len(got) == 7
    for i in (1, 2, 3):  # pure tight cluster scores high
        assert got[i]["silhouette"] > 0.9, got[i]
    assert got[6]["silhouette"] < -0.9, got[6]  # misassigned point
    assert got[6]["nearest_other"] == 0
    assert got[7]["a_mean"] is None and got[7]["silhouette"] == 0.0
    # a_mean is exact integer algebra: for vec 4 the co-members are
    # (-0.99,0) and (0.95,0) -> mean of (100^2 and 19500^2) /2 at Q=1e6
    assert got[4]["a_mean"] == (10_000**2 + 1_950_000**2) / 2


def test_kmeans_elbow_planted_extremes(spark):
    from quacfka_service_spark.operators.kmeans import kmeans_elbow

    rows = [
        (1, 0, [0.5, 0.0]),
        (2, 0, [-0.5, 0.0]),
        (3, 0, [0.0, 0.5]),
        (4, 0, [0.0, -0.5]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
    got = {r["k"]: r for r in kmeans_elbow(emb, ks=(1, 4)).collect()}
    assert got[4]["inertia"] == 0  # k = n: every point is its own seed
    assert got[1]["inertia"] > 0
    assert got[1]["max_dist"] > 0 and got[4]["max_dist"] == 0


def test_reciprocal_topk_planted_mutual_and_hub(spark):
    from quacfka_service_spark.operators.similarity import reciprocal_topk

    # a and b are each other's top-1 (mutual); h is everyone's 2nd
    # choice but its own top-k points elsewhere — with k=1 the hub
    # contributes no mutual edge
    rows = [
        (1, 0, [1.0, 0.0, 0.0]),
        (2, 0, [0.99, 0.01, 0.0]),
        (3, 0, [0.0, 1.0, 0.0]),
        (4, 0, [0.0, 0.99, 0.01]),
        (5, 0, [0.5, 0.5, 0.7]),  # hub-ish, nobody's top-1
    ]
    emb = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
    got = {(r["id_a"], r["id_b"]) for r in reciprocal_topk(emb, k=1).collect()}
    assert got == {(1, 2), (3, 4)}


def test_ann_mrr_bounds_and_consistency(spark):
    from quacfka_service_spark.operators.similarity import ann_mrr
    from quacfka_service_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    got = {r["method"]: r for r in ann_mrr(emb).collect()}
    assert set(got) == {"lsh", "ivf"}
    for m, r in got.items():
        assert r["n_queries"] > 0
        assert 0 <= r["hits"] <= r["n_queries"]
        # each hit contributes at most 1 and at least 1/5 (k=5)
        assert r["hits"] / (5 * r["n_queries"]) <= r["mrr"] <= r["hits"] / r["n_queries"] or r["hits"] == 0


def test_trainer_centroids_match_sql_trajectory(spark):
    """The contract the r9 trained-recall oracle rests on: the numpy
    trainer's integer centroids equal the DuckDB CTE replay
    bit-for-bit at (k=16, rounds=6) — the exact configuration
    similarity.train_centroids consumes."""
    import duckdb

    from quacfka_service_spark.operators.kmeans import (
        _kmeans_cents_oracle,
        kmeans_train,
    )
    from quacfka_service_spark.session import load_table

    sf = "/root/testdata/sf0.001"
    py = kmeans_train(load_table(spark, sf, "embeddings"), k=16, rounds=6)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'"
    )
    sql = {j: list(qv) for j, qv in con.execute(_kmeans_cents_oracle(16, 6)).fetchall()}
    assert len(py) == len(sql) == 16
    for j in range(16):
        assert py[j] == sql[j], f"centroid {j} diverges"


def test_train_centroids_normalization_tail(spark):
    """The float tail (x/1e6, sequential sum of squares, sqrt, per-
    component division) produces unit-norm centers — and the 'or 1.0'
    guard keeps a zero vector finite."""
    import math

    from quacfka_service_spark.operators.similarity import train_centroids
    from quacfka_service_spark.session import load_table

    cents = train_centroids(
        load_table(spark, "/root/testdata/sf0.001", "embeddings"), n_cells=4, rounds=2
    )
    assert len(cents) == 4
    for c in cents:
        n = math.sqrt(sum(x * x for x in c))
        assert abs(n - 1.0) < 1e-9
