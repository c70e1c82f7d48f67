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


# --- round-8 addition: triangle counting ------------------------------------


def triangles_neardup(
    emb: DataFrame, threshold: float = GATE_COSINE_THRESHOLD
) -> DataFrame:
    """(vec_id, n_triangles): per-node triangle membership over the
    near-duplicate graph — the densest-clique signal PageRank misses:
    a component that is one big triangle-rich clique is a template
    family (safe to keep a single exemplar), while a triangle-free
    star of the same size is a hub with distinct leaves (keep the
    leaves, audit the hub).  Classic node-iterator formulation on the
    canonical a<b edge list: wedge join (a,b)x(b,c) then a semi-join
    closure check for (a,c), so each triangle materializes exactly
    once as a<b<c.  Only nodes in >= 1 triangle are emitted.

    All integer arithmetic over the hash-proven ``dedup_embedding``
    pair emitter — engine-exact by construction.

    100 TB shape: both joins key on edge endpoints and the wedge
    stream is sum(deg^2)-bounded — the standard distributed triangle
    cost, bounded by near-dup density, never corpus-sized; the
    canonical orientation (low id -> high id) caps per-key wedge
    fan-out at the out-degree of the ordered graph (the classic
    high-degree-vertex mitigation)."""
    pairs = embedding_neardup(emb, threshold).select(
        F.col("id_a").alias("a"), F.col("id_b").alias("b")
    )
    e = pairs.localCheckpoint(eager=False)
    w = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .select(
            F.col("e1.a").alias("x"),
            F.col("e1.b").alias("y"),
            F.col("e2.b").alias("z"),
        )
    )
    tri = w.join(
        e.alias("e3"),
        (F.col("x") == F.col("e3.a")) & (F.col("z") == F.col("e3.b")),
        "left_semi",
    )
    members = (
        tri.select(F.col("x").alias("vec_id"))
        .unionAll(tri.select(F.col("y").alias("vec_id")))
        .unionAll(tri.select(F.col("z").alias("vec_id")))
    )
    return members.groupBy("vec_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )


# Registered at a lower gate than the dedup keys: the synthetic corpus
# has 26 near-dup EDGES but zero closed triangles at 0.35 (a vacuous
# oracle check); 0.25 yields 27/35 triangle-member nodes at
# sf0.01/sf0.001 while keeping the wedge stream pair-mass-bounded.
TRIANGLE_THRESHOLD = 0.25


def _q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return triangles_neardup(
        load_table(spark, sf_dir, "embeddings"), TRIANGLE_THRESHOLD
    )


QUERIES.update({"dedup_graph_triangles": _q_triangles})

# Composed from the hash-proven dedup_embedding pair oracle.
ORACLES.update(
    {
        "dedup_graph_triangles": f"""
WITH d AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
),
e AS (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM d a JOIN d b ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= {TRIANGLE_THRESHOLD}
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
members AS (
  SELECT x AS vec_id FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
SELECT vec_id, count(*)::BIGINT AS n_triangles
FROM members GROUP BY 1
""",
    }
)


# --- round-9 addition: k-core of the shingle near-dup graph -----------------

KCORE_K = 2
KCORE_MAX_PEELS = 8


def kcore_neardup(docs: DataFrame, k: int = KCORE_K, max_peels: int = KCORE_MAX_PEELS) -> DataFrame:
    """(doc_id, degree): the k-core of the ngram-Jaccard near-dup
    graph — the maximal subgraph where every member keeps >= k
    near-dup neighbors AFTER all weaker vertices are removed (Seidman
    1983).  Curation meaning: components find clusters, triangles
    count local density, the k-core isolates the DENSE MUTUAL cluster
    mass — template mills and mirror farms survive the peel, while
    chain-of-pairs artifacts (A~B~C with no A~C) dissolve.  ``degree``
    is the within-core degree, the density rank inside the farm.

    Standard peel: drop vertices with degree < k, repeat until stable.
    Converges in O(peel depth) rounds — near-dup graphs are shallow
    (the CC argument); fails loudly past ``max_peels`` like
    connected_components, and the oracle unrolls exactly max_peels
    rounds (a converged peel is a fixpoint, so extra unrolled rounds
    are no-ops and the two sides agree at ANY true depth <= max).

    Engine-exactness: the pair graph is the hash-proven
    ngram_jaccard_pairs; the peel is integer degree counts + semi
    joins.

    100 TB shape: per round one map-side-combined degree agg + two
    semi joins co-partitioned on the vertex, all edge-mass-sized;
    lineage truncated per round (localCheckpoint); convergence probe
    is a scalar count."""
    from .dedup import ngram_jaccard_pairs

    return kcore_from_pairs(
        ngram_jaccard_pairs(docs).select("doc_a", "doc_b"), k, max_peels
    )


def kcore_from_pairs(
    pairs: DataFrame, k: int = KCORE_K, max_peels: int = KCORE_MAX_PEELS
) -> DataFrame:
    """The peel over an explicit (doc_a, doc_b) pair frame — shared by
    the batch operator and the streaming twin's result()."""
    # edge-mass shuffle scope, the connected_components discipline:
    # peel shuffles at the session's corpus-sized partition count are
    # scheduling floor — localCheckpoint pins physical partitioning,
    # so the conf scope is the only lever; restored in the finally.
    spark = pairs.sparkSession
    conf_key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(conf_key)
    try:
        cur_parts = int(old)
    except (TypeError, ValueError):
        cur_parts = spark.sparkContext.defaultParallelism
    try:
        spark.conf.set(
            conf_key, str(min(cur_parts, spark.sparkContext.defaultParallelism))
        )
        cur = (
            pairs.select(F.col("doc_a").alias("s"), F.col("doc_b").alias("d"))
            .union(pairs.select(F.col("doc_b").alias("s"), F.col("doc_a").alias("d")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_cur = cur.count()
        # AQE stays ON for the peel loop (r10 lesson from the CC loop,
        # measured at the sf1 spot-bench): checkpointed per-round
        # frames carry no size statistics, so the static planner
        # cannot broadcast them and degrades the round joins to
        # sort-merge over the scoped partition count — a scale
        # regression that the local job-count saving does not justify.
        spark.conf.set(conf_key, str(max(1, min(cur_parts, n_cur // 500_000 + 1))))
        # max_peels + 1 iterations: the last one is a stability PROBE
        # only (ADVICE r9 #3 — a graph whose peel converges exactly at
        # round max_peels is a fixpoint the unrolled oracle emits, so
        # it must NOT raise; the probe peel of a fixpoint reproduces
        # it, so `cur` is unchanged when we break).  Real peel WORK
        # beyond max_peels — the probe still shrinking the edge set —
        # is the loud failure.
        for i in range(max_peels + 1):
            keep = (
                cur.groupBy("s")
                .agg(F.count(F.lit(1)).alias("deg"))
                .where(F.col("deg") >= k)
                .select("s")
            )
            nxt = (
                cur.join(keep, "s", "left_semi")
                .join(keep.select(F.col("s").alias("d")), "d", "left_semi")
                .localCheckpoint(eager=True)
            )
            n_nxt = nxt.count()
            if n_nxt == n_cur:
                break
            if i == max_peels:
                raise RuntimeError(
                    f"kcore_neardup did not stabilize in {max_peels} peels; "
                    "the graph is deeper than expected — raise max_peels"
                )
            cur, n_cur = nxt, n_nxt
        return (
            cur.groupBy("s")
            .agg(F.count(F.lit(1)).cast("long").alias("degree"))
            .select(F.col("s").alias("doc_id"), "degree")
        )
    finally:
        spark.conf.set(conf_key, old)


def _q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kcore_neardup(load_table(spark, sf_dir, "documents"))


QUERIES.update({"dedup_graph_kcore": _q_kcore})


def _kcore_oracle(k: int = KCORE_K, rounds: int = KCORE_MAX_PEELS) -> str:
    from .dedup import _JACCARD_CTES, _SHINGLE_CTE

    parts = [
        f"WITH {_SHINGLE_CTE.strip()}, {_JACCARD_CTES},\n"
        "e0 AS MATERIALIZED (SELECT doc_a AS s, doc_b AS d FROM pairs\n"
        "                    UNION SELECT doc_b, doc_a FROM pairs)"
    ]
    prev = "e0"
    for r in range(1, rounds + 1):
        parts.append(f""",
k{r} AS (SELECT s FROM {prev} GROUP BY s HAVING count(*) >= {k}),
e{r} AS MATERIALIZED (
  SELECT e.s, e.d FROM {prev} e
  SEMI JOIN k{r} a ON e.s = a.s
  SEMI JOIN k{r} b ON e.d = b.s
)""")
        prev = f"e{r}"
    parts.append(
        f"\nSELECT s AS doc_id, count(*)::BIGINT AS degree FROM {prev} GROUP BY s\n"
    )
    return "".join(parts)


ORACLES.update({"dedup_graph_kcore": _kcore_oracle()})
