"""Semantic deduplication over embeddings (SemDeDup-style).

"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication" (Abbas et al. 2023) removes *semantic* duplicates —
documents whose embeddings are nearly parallel even when their text
differs — by (1) clustering the embedding space with k-means and (2)
dropping, within each cluster, every point that has a near-parallel
neighbor, keeping one exemplar per duplicate neighborhood.  This is
the embedding-space complement of the n-gram/MinHash surface in
``operators/dedup.py`` (which only catches *lexical* overlap).

Determinism contract (the oracle-checkable twin):

- centroids  = the first ``n_clusters`` corpus vectors by ``vec_id``
  (a frozen codebook, like similarity.seed_centroids — no RNG, no
  training job).  ``kmeans=True`` swaps in pyspark.ml KMeans
  (seed-pinned) for production cluster quality; that path is
  intentionally not the oracled default because Lloyd means are
  partial-agg order-dependent doubles.
- assignment = argmax cosine(v, centroid), ties broken by lower
  centroid id.  Cosine is the sequential-fold dot kernel
  (``F.aggregate``) that is bit-identical to DuckDB's
  ``list_dot_product`` (established at dedup.py::embedding_neardup).
- drop rule  = a vector is dropped iff SOME lower-vec_id vector in
  its cell has cosine >= threshold with it ("leader" dedup: the
  minimum id of every near-dup neighborhood survives; chains collapse
  onto their lowest id).  Deterministic, join-expressible, and the
  exact set SemDeDup's epsilon-ball rule keeps when the exemplar
  choice is pinned to min-id.

100 TB shape: the codebook is O(n_clusters) rows and broadcasts; the
assignment is a broadcast nested-loop over k centroids per vector
(map-only); the pair scan is an equi-join on cell id — never corpus x
corpus.  Within-cell work is quadratic in CELL size, which is the
SemDeDup cost model: production runs n_clusters proportional to
corpus size (the paper uses ~100k clusters for web scale) so cells
stay O(10^3-10^4) and per-cell pair counts bounded; the ``kmeans=True``
path additionally balances cells.  One shuffle keys the self-join on
cell, one window shuffle keys argmax on vec_id.

Reference parity: the reference service (quacfka-service, main.go) has
no embedding surface; this extends the LLM-pipeline operator set the
build brief mandates alongside dedup_embedding / similarity_*.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import load_table

N_CLUSTERS = 8
SEM_THRESHOLD = 0.35  # fixture-scaled, same knee as dedup_embedding


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(v):
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def _unit_corpus(emb: DataFrame) -> DataFrame:
    v = F.col("embedding").cast("array<double>")
    return emb.select("vec_id", v.alias("v")).select(
        "vec_id", "v", _norm(F.col("v")).alias("nrm")
    )


def seed_codebook(emb: DataFrame, n_clusters: int = N_CLUSTERS) -> list[list[float]]:
    """The frozen first-k codebook as a driver-side list (bounded
    collect: n_clusters rows) — hand to the streaming
    ``IncrementalSemanticDeduper`` so batch and incremental quantize
    identically (same role as similarity.seed_centroids)."""
    rows = _unit_corpus(emb).orderBy("vec_id").limit(n_clusters).collect()
    return [list(r["v"]) for r in rows]


def _codebook_df(spark, centroids: list[list[float]]) -> DataFrame:
    rows = [(i, [float(x) for x in c]) for i, c in enumerate(centroids)]
    return spark.createDataFrame(rows, "cent_id INT, cv ARRAY<DOUBLE>").select(
        "cent_id", "cv", _norm(F.col("cv")).alias("cnrm")
    )


def assign_cells(
    emb: DataFrame,
    n_clusters: int = N_CLUSTERS,
    kmeans: bool = False,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """(vec_id, v, nrm, cell): nearest-centroid cell per vector.

    Frozen first-k codebook by default (oracle-checkable); KMeans
    (seed=42, maxIter=5) under ``kmeans=True`` for balanced production
    cells; an explicit ``centroids`` list pins a shared codebook (the
    streaming deduper's equality pins use this)."""
    d = _unit_corpus(emb)
    if centroids is not None:
        cents = _codebook_df(emb.sparkSession, centroids)
    elif kmeans:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        feat = d.select("vec_id", array_to_vector(F.col("v")).alias("features"))
        model = KMeans(k=n_clusters, seed=42, maxIter=5).fit(feat)
        cents = _codebook_df(
            emb.sparkSession, [[float(x) for x in c] for c in model.clusterCenters()]
        )
    else:
        cents = (
            d.orderBy("vec_id")
            .limit(n_clusters)
            .select(
                (
                    F.row_number().over(Window.orderBy("vec_id")) - 1
                ).alias("cent_id"),
                F.col("v").alias("cv"),
                F.col("nrm").alias("cnrm"),
            )
        )
    scored = d.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "v",
        "nrm",
        "cent_id",
        (_dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cnrm"))).alias("cos"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("cent_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("vec_id", "v", "nrm", F.col("cent_id").alias("cell"))
    )


def drop_edges(
    cells_a: DataFrame, cells_b: DataFrame, threshold: float = SEM_THRESHOLD
) -> DataFrame:
    """Distinct ``vec_id`` of every b-side vector that has a LOWER-id
    a-side vector in the same cell at cosine >= threshold — the shared
    drop kernel of batch ``semantic_dedup`` and the streaming
    ``IncrementalSemanticDeduper`` (both sides carry the
    ``assign_cells`` schema)."""
    a = cells_a.alias("a")
    b = cells_b.alias("b")
    cos = _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
    # array-filter barrier (dedup.py::embedding_neardup idiom): a plain
    # .where(cos >= t) after projecting cos would re-inline the 64-dim
    # fold into the pushed filter and evaluate it twice per pair.
    hit = F.filter(
        F.array(F.struct(cos.alias("cos"))),
        lambda x: x["cos"] >= F.lit(threshold),
    )
    return (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("b.vec_id").alias("vec_id"), F.explode_outer(hit).alias("s"))
        .where(F.col("s").isNotNull())
        .select("vec_id")
        .distinct()
    )


def semantic_dedup(
    emb: DataFrame,
    threshold: float = SEM_THRESHOLD,
    n_clusters: int = N_CLUSTERS,
    kmeans: bool = False,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """(vec_id, cell, kept): kept=false iff some lower-vec_id vector in
    the same cell is within cosine >= threshold (see module
    docstring)."""
    # The assignment subtree (broadcast codebook scan + argmax window)
    # feeds THREE consumers — both pair-join sides and the output
    # projection.  Without a materialization barrier Catalyst re-executes
    # it per consumer (3x the dominant map cost at scale); a lazy
    # localCheckpoint computes it once (minhash_estimate's sig idiom).
    cells = assign_cells(emb, n_clusters, kmeans, centroids).localCheckpoint(
        eager=False
    )
    dropped = drop_edges(cells, cells, threshold)
    return (
        cells.select("vec_id", "cell")
        .join(dropped.withColumn("hit", F.lit(1)), "vec_id", "left")
        .select(
            "vec_id",
            F.col("cell").cast("long").alias("cell"),
            F.col("hit").isNull().alias("kept"),
        )
    )


# --- queries()/oracle_sql() registrations ---------------------------------


def _q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return semantic_dedup(load_table(spark, sf_dir, "embeddings"))


QUERIES = {"dedup_semantic": _q_semantic_dedup}

ORACLES = {
    "dedup_semantic": f"""
WITH d AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
),
cents AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cent_id, v AS cv, nrm AS cnrm
  FROM d WHERE vec_id IN (SELECT vec_id FROM d ORDER BY vec_id LIMIT {N_CLUSTERS})
),
assign AS (
  SELECT vec_id, cent_id,
         row_number() OVER (
           PARTITION BY vec_id
           ORDER BY list_dot_product(d.v, c.cv) / (d.nrm * c.cnrm) DESC, cent_id ASC
         ) AS rk
  FROM d CROSS JOIN cents c
),
cells AS (
  SELECT d.vec_id, a.cent_id AS cell, d.v, d.nrm
  FROM d JOIN assign a ON d.vec_id = a.vec_id AND a.rk = 1
),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= {SEM_THRESHOLD}
)
SELECT c.vec_id, c.cell::BIGINT AS cell, (dr.vec_id IS NULL) AS kept
FROM cells c LEFT JOIN dropped dr ON c.vec_id = dr.vec_id
""",
}


# --- round-7 addition: cluster topic labeling -----------------------------

TOPIC_TOP_K = 5


def cluster_topics(docs: DataFrame, emb: DataFrame, k: int = TOPIC_TOP_K) -> DataFrame:
    """(cell, term, tf, df, score, rank): the top-k most
    cluster-characteristic terms per semantic cell — "what is each
    cluster about", the labeling step that turns SemDeDup cells from
    opaque ids into an inspectable corpus map.

    Composition: the frozen-codebook cell assignment (broadcast
    codebook, map-only argmax — hash-proven by dedup_semantic) joined
    onto documents (doc_id = vec_id, the corpus_curation_semantic
    contract), then cluster-level TF-IDF: tf = term count inside the
    cell, df = number of CELLS containing the term, score = tf/df —
    one IEEE division of exact BIGINTs (text_tfidf_topk's linear-idf
    parity argument, with cells as the "documents").

    100 TB shape: assignment is map-only; the token agg is map-side
    combined and keyed (cell, term); df is cell-count-sized; the top-k
    window partitions by cell (n_clusters partitions — scale
    n_clusters with the corpus per the SemDeDup cost model and the
    window stays balanced).
    """
    cells = assign_cells(emb).select("vec_id", "cell")
    from .text import _words

    dt = docs.join(cells, docs.doc_id == cells.vec_id).select(
        "cell", F.explode(_words(F.col("text"))).alias("term")
    ).where(F.col("term") != "")
    tf = dt.groupBy("cell", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = dt.distinct().groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df_, "term").select(
        "cell", "term", "tf", "df",
        (F.col("tf").cast("double") / F.col("df")).alias("score"),
    )
    w = Window.partitionBy("cell").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.select(
            F.col("cell").cast("long").alias("cell"),
            "term", "tf", "df", "score",
            F.row_number().over(w).cast("long").alias("rank"),
        )
        .where(F.col("rank") <= k)
    )


def _q_cluster_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cluster_topics(
        load_table(spark, sf_dir, "documents"), load_table(spark, sf_dir, "embeddings")
    )


QUERIES.update({"corpus_cluster_topics": _q_cluster_topics})

ORACLES.update(
    {
        "corpus_cluster_topics": f"""
WITH d AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
),
cents AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cent_id, v AS cv, nrm AS cnrm
  FROM d WHERE vec_id IN (SELECT vec_id FROM d ORDER BY vec_id LIMIT {N_CLUSTERS})
),
assign AS (
  SELECT vec_id, cent_id,
         row_number() OVER (
           PARTITION BY vec_id
           ORDER BY list_dot_product(d.v, c.cv) / (d.nrm * c.cnrm) DESC, cent_id ASC
         ) AS rk
  FROM d CROSS JOIN cents c
),
cells AS (
  SELECT vec_id, cent_id AS cell FROM assign WHERE rk = 1
),
ex AS (
  SELECT c.cell, unnest(regexp_split_to_array(trim(lower(doc.text)), '\\s+')) AS term
  FROM documents doc JOIN cells c ON doc.doc_id = c.vec_id
),
tf AS (
  SELECT cell, term, count(*)::BIGINT AS tf
  FROM ex WHERE term <> '' GROUP BY 1, 2
),
df AS (
  SELECT term, count(DISTINCT cell)::BIGINT AS df
  FROM ex WHERE term <> '' GROUP BY 1
)
SELECT cell, term, tf, df, score, rank FROM (
  SELECT tf.cell::BIGINT AS cell, tf.term, tf.tf, df.df,
         tf.tf::DOUBLE / df.df AS score,
         row_number() OVER (PARTITION BY tf.cell
                            ORDER BY tf.tf::DOUBLE / df.df DESC,
                                     tf.term ASC)::BIGINT AS rank
  FROM tf JOIN df USING (term)
) WHERE rank <= {TOPIC_TOP_K}
""",
    }
)


# --- round-7 addition: cluster coherence ------------------------------------


def cluster_coherence(emb: DataFrame) -> DataFrame:
    """(cell, n, mean_cos): per-cell mean cosine of members to their
    centroid — the cluster-quality dial beside corpus_cluster_topics
    (a low-coherence cell's topic label means nothing; SemDeDup's
    within-cell threshold should track this).

    The member cosines reuse the assignment kernel's exact fold; the
    per-cell MEAN uses the floor-quantization idiom
    (sum(floor(cos*1e12)) is exact under any aggregation order, then
    one division) so the report hash-checks exactly.

    100 TB shape: map-only assignment (broadcast codebook) + one
    cell-keyed quantized agg; output is n_clusters rows.
    """
    cells = assign_cells(emb)  # (vec_id, v, nrm, cell)
    # rebuild the frozen codebook exactly as assign_cells does
    d = _unit_corpus(emb)
    cents = (
        d.orderBy("vec_id")
        .limit(N_CLUSTERS)
        .select(
            (F.row_number().over(Window.orderBy("vec_id")) - 1).alias("cell"),
            F.col("v").alias("cv"),
            F.col("nrm").alias("cnrm"),
        )
    )
    scored = cells.join(F.broadcast(cents), "cell").select(
        "cell",
        (_dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cnrm"))).alias("cos"),
    )
    return scored.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (
            F.sum(F.floor(F.col("cos") * F.lit(1e12)).cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .cast("double")
            / F.lit(1e12)
            / F.count(F.lit(1))
        ).alias("mean_cos"),
    ).select(F.col("cell").cast("long").alias("cell"), "n", "mean_cos")


def _q_cluster_coherence(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cluster_coherence(load_table(spark, sf_dir, "embeddings"))


QUERIES.update({"corpus_cluster_coherence": _q_cluster_coherence})

ORACLES.update(
    {
        "corpus_cluster_coherence": f"""
WITH d AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
),
cents AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cent_id, v AS cv, nrm AS cnrm
  FROM d WHERE vec_id IN (SELECT vec_id FROM d ORDER BY vec_id LIMIT {N_CLUSTERS})
),
assign AS (
  SELECT vec_id, cent_id,
         row_number() OVER (
           PARTITION BY vec_id
           ORDER BY list_dot_product(d.v, c.cv) / (d.nrm * c.cnrm) DESC, cent_id ASC
         ) AS rk
  FROM d CROSS JOIN cents c
),
scored AS (
  SELECT a.cent_id AS cell,
         list_dot_product(d.v, c.cv) / (d.nrm * c.cnrm) AS cos
  FROM d
  JOIN assign a ON d.vec_id = a.vec_id AND a.rk = 1
  JOIN cents c ON c.cent_id = a.cent_id
)
SELECT cell::BIGINT AS cell, count(*)::BIGINT AS n,
       sum(floor(cos * 1e12)::BIGINT)::DOUBLE / 1e12 / count(*) AS mean_cos
FROM scored GROUP BY cell
""",
    }
)
