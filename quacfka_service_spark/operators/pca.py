"""Principal component of the embedding corpus via distributed
covariance + power iteration.

The LLM-pipeline use: the top principal direction of an embedding
table is the first thing you inspect for anisotropy ("is everything
pointing one way?"), for whitening decisions, and as the projection
axis for 1-D curriculum sorts.  Public method: plain PCA, power
iteration (Golub & Van Loan), computed exactly as published — no
library dependence on either engine.

Parity discipline (two regimes, one proof each):

1. Data-sized sums (mean vector, covariance entries) are computed in
   arbitrary partial-agg order — float accumulation there would
   diverge between engines.  Fix: floor-quantize each addend to an
   integer (floor(x * 1e12) -> BIGINT), sum EXACTLY (DECIMAL(38,0) /
   HUGEINT), convert the identical integer back to double.  Unlike a
   half-way decimal CAST, floor has no rounding-mode dependence, and
   because BOTH engines floor the SAME IEEE double (the products are
   computed with identical ops), there is no boundary-straddle risk —
   the lm.py caveat applies only when the two engines compute the
   input with different libm functions.
2. Everything after the covariance is fixed-order scalar IEEE math on
   identical doubles: the matrix-vector products fold per-row arrays
   sequentially (F.aggregate over zip_with == DuckDB
   list_dot_product, the established idiom), the norm is one sqrt,
   v0 = 1/8 exactly (binary fraction), 8 unrolled iterations.  Sign
   and convergence state are therefore deterministic and hash-equal.

100 TB shape: the data-sized stages are the two quantized partial
aggs — mean (one pass) and the d^2 outer-product agg (explode d^2 per
row, map-side combined; at d=64 that is a 4096-way fanout, the
standard dense-covariance cost — for d in the thousands you'd switch
to a blocked Gram via mapInArrow, same agg skeleton).  After that the
operator touches only d- and d^2-sized frames: the 8 iterations are
joins against a broadcast 1-row vector over a d-row matrix — driver
never sees data, executors never reshuffle the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table

PCA_DIM = 64
PCA_ITERS = 8
PCA_Q = 1e12  # floor-quantization scale for order-free exact sums


def _dot(a, b):
    """Sequential fold of the elementwise product — bit-equal to
    DuckDB's list_dot_product (dedup.py:386 idiom)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _pca_state(emb: DataFrame, dim: int, n_iter: int):
    """Shared tail state: (mu1 1-row mean array, cov_rows d-row
    covariance, v 1-row final unit eigenvector) — used by pca_power
    and pca_project so both expose the identical converged vector."""
    x = emb.select(F.col("embedding").cast("array<double>").alias("x")).where(
        F.size("x") == dim
    )
    n1 = x.agg(F.count(F.lit(1)).alias("n"))  # 1 row

    # mean vector: quantized exact sums, then (S / Q) / n per component
    ex = x.select(F.posexplode("x").alias("j", "xj"))
    mu_rows = ex.groupBy("j").agg(
        F.sum(F.floor(F.col("xj") * PCA_Q).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .cast("double")
        .alias("s")
    )
    mu1 = (
        mu_rows.join(F.broadcast(n1))
        .select("j", (F.col("s") / PCA_Q / F.col("n")).alias("mu"))
        .groupBy()
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("j", "mu"))), lambda s: s["mu"]
            ).alias("mu")
        )
    )

    # centered outer products, quantized, exact sums — SYMMETRY-HALVED:
    # only j <= k pairs are generated (the upper triangle, d(d+1)/2
    # instead of d^2 per row) and the lower triangle is mirrored AFTER
    # the aggregate.  Exactness is untouched: IEEE multiplication
    # commutes bit-for-bit, so sum(floor(cj*ck*Q)) == sum(floor(ck*cj*Q)).
    cent = x.join(F.broadcast(mu1)).select(
        F.zip_with("x", "mu", lambda a, b: a - b).alias("c")
    )
    cj = cent.select(F.posexplode("c").alias("j", "cj"), "c")
    upper = cj.select(
        "j",
        "cj",
        F.posexplode(
            F.slice(F.col("c"), F.col("j") + 1, F.lit(dim) - F.col("j"))
        ).alias("k0", "ck"),
    ).select(
        "j",
        (F.col("j") + F.col("k0")).alias("k"),
        F.floor((F.col("cj") * F.col("ck")) * PCA_Q).cast("decimal(38,0)").alias("p"),
    )
    tri = upper.groupBy("j", "k").agg(
        F.sum("p").cast("decimal(38,0)").cast("double").alias("s")
    )
    full = tri.unionByName(
        tri.where(F.col("j") != F.col("k")).select(
            F.col("k").alias("j"), F.col("j").alias("k"), "s"
        )
    )
    cov_rows = (
        full.join(F.broadcast(n1))
        .select("j", "k", (F.col("s") / PCA_Q / F.col("n")).alias("cv"))
        .groupBy("j")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("k", "cv"))), lambda s: s["cv"]
            ).alias("row")
        )
        # d rows total: one partition so the 8 iteration joins schedule
        # 1 task each instead of a full shuffle-partition fan per round
        .coalesce(1)
        .localCheckpoint(eager=False)
    )

    spark = emb.sparkSession
    v = spark.range(1).select(
        F.expr(f"array_repeat(0.125D, {dim})").alias("v")
    )  # 1/8: exact binary fraction
    for _ in range(n_iter):
        w = cov_rows.join(F.broadcast(v)).select("j", _dot("row", "v").alias("wj"))
        v = (
            w.groupBy()
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("j", "wj"))), lambda s: s["wj"]
                ).alias("w")
            )
            .select(
                F.transform(
                    "w", lambda x: x / F.sqrt(_dot(F.col("w"), F.col("w")))
                ).alias("v")
            )
        )

    return mu1, cov_rows, v


def pca_power(
    emb: DataFrame, dim: int = PCA_DIM, n_iter: int = PCA_ITERS
) -> DataFrame:
    """(j, loading, eigenvalue): top principal component of the
    embedding corpus — component index, loadings of the unit
    eigenvector, and the Rayleigh-quotient eigenvalue (module
    docstring)."""
    _, cov_rows, v = _pca_state(emb, dim, n_iter)
    # Rayleigh quotient on the final vector
    wf = cov_rows.join(F.broadcast(v)).select("j", _dot("row", "v").alias("wj"), "v")
    lam1 = (
        wf.groupBy()
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("j", "wj"))), lambda s: s["wj"]
            ).alias("w"),
            F.first("v").alias("v"),
        )
        .select(_dot("v", "w").alias("eigenvalue"), "v")
    )
    return lam1.select(
        F.posexplode("v").alias("j0", "loading"), "eigenvalue"
    ).select(
        (F.col("j0") + 1).cast("long").alias("j"), "loading", "eigenvalue"
    )


def pca_project(
    emb: DataFrame, dim: int = PCA_DIM, n_iter: int = PCA_ITERS
) -> DataFrame:
    """(vec_id, proj): each embedding's coordinate along the top
    principal direction — the 1-D curriculum/anisotropy score.  A
    map-only projection after broadcasting the mean and the converged
    unit vector: proj = <x - mu, v>, one sequential fold per row
    (same list_dot_product parity as the iteration)."""
    mu1, _, v = _pca_state(emb, dim, n_iter)
    xid = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("x")
    ).where(F.size("x") == dim)
    return (
        xid.join(F.broadcast(mu1))
        .join(F.broadcast(v))
        .select(
            "vec_id",
            _dot(F.zip_with("x", "mu", lambda a, b: a - b), F.col("v")).alias("proj"),
        )
    )


def _q_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pca_power(load_table(spark, sf_dir, "embeddings"))


def _q_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pca_project(load_table(spark, sf_dir, "embeddings"))


QUERIES = {
    "embedding_pca_power": _q_pca,
    "embedding_pca_project": _q_pca_project,
}


def _pca_prefix() -> tuple:
    d, q, it = PCA_DIM, "1000000000000.0", PCA_ITERS
    # unrolled power iterations: w_t = C v_{t-1} (list_dot_product per
    # row), v_t = w_t / ||w_t||
    steps = []
    prev = "v0"
    for t in range(1, it + 1):
        steps.append(
            f"w{t} AS MATERIALIZED (SELECT j, list_dot_product(row, (SELECT v FROM {prev})) AS wj FROM rows),\n"
            f"v{t} AS MATERIALIZED (SELECT list_transform(w, e -> e / sqrt(list_dot_product(w, w))) AS v\n"
            f"         FROM (SELECT list(wj ORDER BY j) AS w FROM w{t}))"
        )
        prev = f"v{t}"
    steps_sql = ",\n".join(steps)
    prefix = f"""
WITH x AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, e -> e::DOUBLE) AS x
  FROM embeddings WHERE len(embedding) = {d}
),
n AS MATERIALIZED (SELECT count(*)::BIGINT AS n FROM x),
muL AS MATERIALIZED (
  SELECT g.j,
         sum(floor(x[g.j] * {q})::BIGINT)::DOUBLE / {q} / (SELECT n FROM n) AS mu
  FROM x, (SELECT unnest(generate_series(1, {d})) AS j) g
  GROUP BY g.j
),
mu AS MATERIALIZED (SELECT list(mu ORDER BY j) AS mu FROM muL),
cent AS MATERIALIZED (
  -- mu joined in (not a scalar subquery): DuckDB disallows
  -- subqueries inside lambda bodies
  SELECT x.vec_id, list_transform(generate_series(1, {d}),
                        i -> x.x[i] - mu.mu[i]) AS c
  FROM x, mu
),
covL AS MATERIALIZED (
  SELECT g.j, g.k,
         sum(floor((c[g.j] * c[g.k]) * {q})::BIGINT)::DOUBLE / {q}
           / (SELECT n FROM n) AS cv
  FROM cent,
       (SELECT a.j, b.k
        FROM (SELECT unnest(generate_series(1, {d})) AS j) a,
             (SELECT unnest(generate_series(1, {d})) AS k) b) g
  GROUP BY g.j, g.k
),
rows AS MATERIALIZED (SELECT j, list(cv ORDER BY k) AS row FROM covL GROUP BY j),
v0 AS MATERIALIZED (SELECT list_transform(generate_series(1, {d}), i -> 0.125) AS v),
{steps_sql}"""
    return prefix, prev, d


def _pca_power_oracle() -> str:
    prefix, prev, d = _pca_prefix()
    return f"""{prefix},
wF AS MATERIALIZED (SELECT j, list_dot_product(row, (SELECT v FROM {prev})) AS wj FROM rows),
lam AS (SELECT list_dot_product((SELECT v FROM {prev}),
                                list(wj ORDER BY j)) AS eigenvalue
        FROM wF)
SELECT g.j::BIGINT AS j,
       (SELECT v FROM {prev})[g.j] AS loading,
       (SELECT eigenvalue FROM lam) AS eigenvalue
FROM (SELECT unnest(generate_series(1, {d})) AS j) g
"""


def _pca_project_oracle() -> str:
    prefix, prev, d = _pca_prefix()
    return f"""{prefix}
SELECT vec_id, list_dot_product(c, (SELECT v FROM {prev})) AS proj
FROM cent
"""


ORACLES = {
    "embedding_pca_power": _pca_power_oracle(),
    "embedding_pca_project": _pca_project_oracle(),
}
