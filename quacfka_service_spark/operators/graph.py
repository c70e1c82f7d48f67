"""Graph centrality over the near-duplicate graph: integer PageRank.

Why it belongs in a curation engine: connected components
(``dedup_components``) tell you WHICH docs cluster; PageRank tells you
which member is the CANONICAL one — the highest-centrality node of a
near-dup cluster is the best survivor candidate when "keep lowest id"
is too arbitrary (e.g. keep the page every mirror links to, not the
first mirror crawled).  Public method: PageRank (Brin & Page), power
iteration with teleport 0.15, fixed 8 rounds.

Parity discipline — ALL-INTEGER state, the strongest regime in this
repo: ranks live as nanoshares (Q = 10^12 total mass), every update is

    v' = (15 * Q) DIV (100 * N)  +  (85 * S_v) DIV 100
    S_v = sum over in-edges of (v_u DIV deg_u)

— integer division and integer sums only, so partial-agg order,
engine, and platform cannot perturb a single bit; no quantization
caveats, no libm, no floats.  (Integer DIV leaks O(deg) nanoshares of
mass per node per round — deterministically, identically in both
engines; rank ORDER is what the operator sells.)  The edge set is the
``dedup_embedding`` pair emitter verbatim (label-blocked exact cosine
at the same threshold), whose float side is already hash-proven.

100 TB shape: classic bulk-iterative PR — per round one co-partitioned
join of the rank frame with the edge list on src (both hash-partition
on vec_id) and one map-side-combined sum keyed by dst; 8 rounds of
node-sized exchanges.  Spark-side lineage is truncated per round with
localCheckpoint (the dedup_components discipline) so the DAG doesn't
deepen quadratically.  Dangling nodes: the operator ranks the subgraph
with degree >= 1 (documented; isolated docs have no dedup decision to
make).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table
from .dedup import GATE_COSINE_THRESHOLD, embedding_neardup

PR_Q = 10**12
PR_ITERS = 8


def pagerank_neardup(
    emb: DataFrame, threshold: float = GATE_COSINE_THRESHOLD, n_iter: int = PR_ITERS
) -> DataFrame:
    """(vec_id, pr, rank): integer-PageRank nanoshares over the
    undirected near-dup graph, ranked descending (ties by vec_id)."""
    pairs = embedding_neardup(emb, threshold).select("id_a", "id_b")
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    edges = edges.localCheckpoint(eager=False)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    nodes = deg.select(F.col("src").alias("vec_id"), "deg")
    n1 = nodes.agg(F.count(F.lit(1)).alias("n"))

    # teleport share and initial mass, both exact integer DIV
    v = (
        nodes.join(F.broadcast(n1))
        .select("vec_id", "deg", F.expr(f"CAST({PR_Q} AS BIGINT) DIV n").alias("v"))
        .localCheckpoint(eager=False)
    )
    for _ in range(n_iter):
        contrib = (
            v.join(edges, v.vec_id == edges.src)
            .select("dst", F.expr("v DIV deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").cast("long").alias("s"))
        )
        v = (
            nodes.join(F.broadcast(n1))
            .join(contrib, nodes.vec_id == contrib.dst, "left")
            .select(
                "vec_id",
                "deg",
                (
                    F.expr(f"CAST(15 * {PR_Q} AS BIGINT) DIV (100 * n)")
                    + F.expr("CAST(85 AS BIGINT) * coalesce(s, CAST(0 AS BIGINT)) DIV 100")
                ).alias("v"),
            )
            .localCheckpoint(eager=False)  # truncate per-round lineage
        )
    from pyspark.sql.window import Window as W

    wr = W.orderBy(F.desc("v"), F.asc("vec_id"))
    return v.select(
        "vec_id",
        F.col("v").alias("pr"),
        F.row_number().over(wr).cast("long").alias("rank"),
    )


def _q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pagerank_neardup(load_table(spark, sf_dir, "embeddings"))


QUERIES = {"dedup_graph_pagerank": _q_pagerank}


def _pr_oracle() -> str:
    q, it, tau = PR_Q, PR_ITERS, GATE_COSINE_THRESHOLD
    steps = []
    prev = "pr0"
    for t in range(1, it + 1):
        steps.append(f"""
pr{t} AS MATERIALIZED (
  SELECT n.vec_id, n.deg,
         (15 * {q}::BIGINT) // (100 * (SELECT n FROM ncnt))
           + (85::BIGINT * coalesce(s.s, 0)) // 100 AS v
  FROM nodes n LEFT JOIN (
    SELECT e.dst, sum(p.v // p.deg)::BIGINT AS s
    FROM edges e JOIN {prev} p ON p.vec_id = e.src
    GROUP BY e.dst
  ) s ON s.dst = n.vec_id
)""")
        prev = f"pr{t}"
    steps_sql = ",".join(steps)
    return f"""
WITH d AS MATERIALIZED (
  SELECT vec_id, label, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
),
pairs AS MATERIALIZED (
  SELECT a.vec_id AS ia, b.vec_id AS ib
  FROM d a JOIN d b ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= {tau}
),
edges AS MATERIALIZED (
  SELECT ia AS src, ib AS dst FROM pairs
  UNION ALL
  SELECT ib AS src, ia AS dst FROM pairs
),
nodes AS MATERIALIZED (
  SELECT src AS vec_id, count(*)::BIGINT AS deg FROM edges GROUP BY 1
),
ncnt AS MATERIALIZED (SELECT count(*)::BIGINT AS n FROM nodes),
pr0 AS MATERIALIZED (
  SELECT vec_id, deg, {q}::BIGINT // (SELECT n FROM ncnt) AS v FROM nodes
),{steps_sql}
SELECT vec_id, v AS pr,
       row_number() OVER (ORDER BY v DESC, vec_id ASC)::BIGINT AS rank
FROM {prev}
"""


ORACLES = {"dedup_graph_pagerank": _pr_oracle()}
