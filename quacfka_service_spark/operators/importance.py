"""Importance weighting for data selection (DSIR-style).

"Data Selection for Language Models via Importance Resampling" (Xie et
al. 2023) scores every raw-corpus document by how target-domain-like
its hashed n-gram bag is — the ratio of a bag model fit on a small
target-domain sample to one fit on the raw corpus — then resamples the
corpus by that weight.  This operator computes the per-document weight
surface; ``corpus_mixture_temperature`` / ``stratified_sample`` are
the downstream resamplers.

Determinism contract: real DSIR exponentiates log-probability sums,
whose floating-point totals are engine/fold-order dependent.  The
oracled twin here keeps everything in BIGINT until ONE final division:

- features       hashed unigram counts, dim = md5(token) % 64 — the
  exact ``text.hash_features`` kernel (md5 bucket parity established).
- target model   feature counts over the target sample (every
  ``TARGET_MOD``-th doc — in production this is the target-domain
  table, e.g. Wikipedia/books).
- raw model      feature counts over the whole corpus.
- weight         (sum_f n_f(doc) * t_cnt(f)) * raw_total
               / (sum_f n_f(doc) * r_cnt(f)) / target_total
  — the expected target/raw count ratio of the document's own feature
  draw: a monotone multinomial likelihood-ratio proxy on the same
  sufficient statistics as DSIR's log-LR, exact in integers up to the
  single final IEEE division (bit-identical both engines).

Output: (doc_id, t_mass, r_mass, weight); weight > 1 means
"more target-like than the average raw document".

100 TB shape: both bag models aggregate to <= 64 rows and broadcast;
the per-doc score is explode -> map-side-combined (doc_id, dim) count
-> broadcast joins -> one groupBy(doc_id).  Two shuffles, both keyed
by doc_id(+dim) — no corpus x corpus work, and the Zipf-hot dims ride
inside per-doc keys so no reducer hot-spots.

Reference parity: no counterpart in the reference (main.go) — part of
the mandated LLM-pipeline surface, alongside decontam.py / mixture.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table
from .split import BUCKETS, hash_bucket
from .text import HASH_DIM, hash_features

TARGET_MOD = 53  # every 53rd doc is "the target-domain sample" (~2%)


def _masses_with_totals(
    docs: DataFrame, dim: int = HASH_DIM, target_mod: int = TARGET_MOD
) -> DataFrame:
    """(doc_id, t_mass, r_mass, t_total, r_total) — everything BIGINT,
    the shared exact core of ``importance_weights`` and
    ``dsir_resample``."""
    # Lazy checkpoint: feats feeds THREE aggregation subtrees (the
    # target histogram, the corpus histogram, the per-doc masses) —
    # unchecked, Catalyst re-executes the token explode + md5-per-token
    # scan once per subtree (~3x the whole operator's cost; the sf1
    # spot measured 2.95x DuckDB, r11).  The checkpointed frame is
    # bounded at <= dim (64) rows per document — corpus-linear but a
    # small constant of the corpus text volume, and disk-spillable —
    # so one materialization is the right trade at any scale.  No
    # session cache slot, no unpersist contract: the RDD dies with the
    # frame (same discipline as the sig/pair checkpoints in dedup.py).
    feats = hash_features(docs, dim).localCheckpoint(eager=False)
    # BOTH histograms in ONE pass over feats (r11): target membership
    # is pure doc_id arithmetic, so the old join-with-filtered-docs was
    # a needless shuffle, and t/r were two separate aggregate subtrees
    # re-scanning feats — a conditional sum folds them into one
    # map-side-combined agg.  Values are the same BIGINT sums (the
    # DuckDB oracle keeps the two-CTE form; equal by construction).
    is_t = F.col("doc_id") % target_mod == 1
    tr = feats.groupBy("dim").agg(
        F.sum(F.when(is_t, F.col("weight")).otherwise(F.lit(0))).alias("t_cnt"),
        F.sum("weight").alias("r_cnt"),
    )
    totals = tr.agg(
        F.sum("t_cnt").alias("t_total"), F.sum("r_cnt").alias("r_total")
    )
    masses = (
        feats.join(F.broadcast(tr), "dim")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("weight") * F.coalesce(F.col("t_cnt"), F.lit(0))).alias("t_mass"),
            F.sum(F.col("weight") * F.col("r_cnt")).alias("r_mass"),
        )
    )
    return masses.crossJoin(F.broadcast(totals))


def importance_weights(
    docs: DataFrame, dim: int = HASH_DIM, target_mod: int = TARGET_MOD
) -> DataFrame:
    """Per-document DSIR-style importance weights (module docstring)."""
    return _masses_with_totals(docs, dim, target_mod).select(
        "doc_id",
        "t_mass",
        "r_mass",
        (
            (F.col("t_mass") * F.col("r_total")).cast("double")
            / (F.col("r_mass") * F.col("t_total")).cast("double")
        ).alias("weight"),
    )


def dsir_resample(
    docs: DataFrame,
    dim: int = HASH_DIM,
    target_mod: int = TARGET_MOD,
    buckets: int = BUCKETS,
) -> DataFrame:
    """DSIR's second half: RESAMPLE the corpus by importance weight.
    Each doc is kept with probability min(1, weight) — realized as the
    deterministic md5-bucket rule (split.py's idiom) instead of RNG, so
    the sample is reproducible row-for-row under any partitioning and
    bit-checkable cross-engine.

    keep  iff  bucket/buckets < weight  iff  (cross-multiplied, pure
    BIGINT — no float compare anywhere):

        bucket * r_mass * t_total  <  buckets * t_mass * r_total

    Output: (doc_id, t_mass, r_mass, kept).  Docs more target-like
    than average (weight >= 1) are always kept; the rest thin out
    proportionally — the standard importance-resampling acceptance.

    Scale note (ADVICE r6 #2): the triple product reaches
    buckets x r_mass x t_total, which blows past 2^63 at around a
    1e9-token corpus — and with Spark's default non-ANSI mode a BIGINT
    compare would WRAP silently.  Both sides of the comparison are
    therefore computed in 128-bit integer arithmetic: decimal(38,0)
    on Spark (exact int128 up to 38 digits), HUGEINT in the DuckDB
    oracle — bit-identical, with ~10^38 headroom (buckets 10^3 x
    masses 10^15 x totals 10^15 = 10^33 at the most extreme real
    scale)."""
    m = _masses_with_totals(docs, dim, target_mod)
    b = hash_bucket(F.col("doc_id"), buckets)

    def _d38(c):
        return c.cast("decimal(38,0)")

    return m.select(
        "doc_id",
        "t_mass",
        "r_mass",
        (
            _d38(b) * _d38(F.col("r_mass")) * _d38(F.col("t_total"))
            < _d38(F.lit(buckets)) * _d38(F.col("t_mass")) * _d38(F.col("r_total"))
        ).alias("kept"),
    )


def drift_tv(docs: DataFrame, dim: int = HASH_DIM) -> DataFrame:
    """Per-source distribution drift: total-variation distance between
    each source's hashed-token distribution and the corpus-wide one —
    the dashboard a corpus release runs to catch a source whose
    content shifted (scraper broke, boilerplate flooded in, language
    mix moved) before it trains a model.

    TV(p, q) = 1/2 * sum_f |p_f - q_f| over the 64 hashed dims.  With
    p_f = s_f/S (source counts) and q_f = c_f/C (corpus counts), the
    statistic is sum_f |s_f*C - c_f*S| / (2*S*C): numerator and
    denominator are exact BIGINTs, emitted alongside their single-
    division double — the same exactness contract as the importance
    weights.  TV is in [0, 1]: 0 = identical distribution, 1 =
    disjoint support.

    100 TB shape: one explode -> map-side-combined (source, dim) count
    (the corpus-wide counts derive from the SAME aggregate — no second
    scan); the |sources| x 64 matrix is broadcast-sized; everything
    after the first agg is driver-trivial arithmetic kept distributed
    only for uniformity."""
    # Lazy checkpoint: sd feeds tv_against's join AND the corpus-wide
    # re-aggregate — without it each reference re-runs the token
    # explode scan (the "no second scan" promise above is only true
    # with the materialization; |sources| x 64 rows, trivially small).
    sd = source_dim_counts(docs, dim).localCheckpoint(eager=False)
    cd = sd.groupBy("dim").agg(F.sum("s_cnt").alias("c_cnt"))
    return tv_against(sd, cd)


def source_dim_counts(docs: DataFrame, dim: int = HASH_DIM) -> DataFrame:
    """(source, dim, s_cnt): the hashed-token histogram ``drift_tv``
    compares on — factored out because these integer counts are the
    SUM-mergeable drift STATE: histograms built per micro-batch and
    re-aggregated equal the histogram of the union for any batching
    (streaming/incremental_drift.py maintains exactly this)."""
    toks = docs.select(
        "source", F.explode_outer(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok")
    ).where(F.col("tok").isNotNull() & (F.col("tok") != ""))
    d = F.pmod(
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long"),
        F.lit(dim),
    )
    return toks.select("source", d.alias("dim")).groupBy("source", "dim").agg(
        F.count(F.lit(1)).alias("s_cnt")
    )


def tv_against(sd: DataFrame, cd: DataFrame) -> DataFrame:
    """TV tail shared by batch ``drift_tv`` (cd = corpus-wide counts
    derived from sd itself) and the streaming monitor (cd = a FROZEN
    reference histogram): per source, sum_f |s_f*C - c_f*S| / (2*S*C)
    in exact BIGINTs to one final division.  ``sd`` carries
    (source, dim, s_cnt); ``cd`` carries (dim, c_cnt)."""
    s_tot = sd.groupBy("source").agg(F.sum("s_cnt").alias("s_total"))
    c_tot = cd.agg(F.sum("c_cnt").alias("c_total"))
    # the dim universe is the UNION of both sides' dims: a source may
    # have zero mass on a dim the reference has (|0*C - c_f*S| still
    # counts) and, under a frozen reference, vice versa (|s_f*C - 0*S|
    # still counts).  Both frames are <= dim rows — broadcast-trivial.
    dims = (
        cd.join(sd.select("dim").distinct(), "dim", "full")
        .select("dim", F.coalesce("c_cnt", F.lit(0).cast("long")).alias("c_cnt"))
    )
    grid = s_tot.crossJoin(F.broadcast(dims))
    full = grid.join(sd, ["source", "dim"], "left").select(
        "source",
        "s_total",
        "c_cnt",
        F.coalesce(F.col("s_cnt"), F.lit(0).cast("long")).alias("s_cnt"),
    )
    return (
        full.crossJoin(F.broadcast(c_tot))
        .groupBy("source", "s_total", "c_total")
        .agg(
            F.sum(
                F.abs(F.col("s_cnt") * F.col("c_total") - F.col("c_cnt") * F.col("s_total"))
            ).alias("tv_num")
        )
        .select(
            "source",
            "s_total",
            "tv_num",
            (
                F.col("tv_num").cast("double")
                / (F.lit(2).cast("long") * F.col("s_total") * F.col("c_total")).cast(
                    "double"
                )
            ).alias("tv"),
        )
    )


# --- queries()/oracle_sql() registrations ---------------------------------


def _q_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    return importance_weights(load_table(spark, sf_dir, "documents"))


def _q_drift_tv(spark: SparkSession, sf_dir: str) -> DataFrame:
    return drift_tv(load_table(spark, sf_dir, "documents"))


def _q_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dsir_resample(load_table(spark, sf_dir, "documents"))


QUERIES = {
    "corpus_importance_weights": _q_importance_weights,
    "corpus_dsir_resample": _q_dsir_resample,
    "corpus_drift_tv": _q_drift_tv,
}

ORACLES = {
    "corpus_importance_weights": f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
  FROM documents
),
feats AS (
  SELECT doc_id,
         (('0x' || substr(md5(tok), 1, 8))::BIGINT % {HASH_DIM}) AS dim,
         count(*)::BIGINT AS weight
  FROM toks WHERE tok IS NOT NULL AND tok <> ''
  GROUP BY 1, 2
),
t AS (
  SELECT dim, sum(weight)::BIGINT AS t_cnt
  FROM feats WHERE doc_id % {TARGET_MOD} = 1 GROUP BY dim
),
r AS (
  SELECT dim, sum(weight)::BIGINT AS r_cnt FROM feats GROUP BY dim
),
tot AS (
  SELECT (SELECT sum(t_cnt) FROM t)::BIGINT AS t_total,
         (SELECT sum(r_cnt) FROM r)::BIGINT AS r_total
),
masses AS (
  SELECT f.doc_id,
         sum(f.weight * coalesce(t.t_cnt, 0))::BIGINT AS t_mass,
         sum(f.weight * r.r_cnt)::BIGINT AS r_mass
  FROM feats f LEFT JOIN t USING (dim) JOIN r USING (dim)
  GROUP BY f.doc_id
)
SELECT doc_id, t_mass, r_mass,
       (t_mass * r_total)::DOUBLE / (r_mass * t_total)::DOUBLE AS weight
FROM masses, tot
""",
    "corpus_dsir_resample": f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
  FROM documents
),
feats AS (
  SELECT doc_id,
         (('0x' || substr(md5(tok), 1, 8))::BIGINT % {HASH_DIM}) AS dim,
         count(*)::BIGINT AS weight
  FROM toks WHERE tok IS NOT NULL AND tok <> ''
  GROUP BY 1, 2
),
t AS (
  SELECT dim, sum(weight)::BIGINT AS t_cnt
  FROM feats WHERE doc_id % {TARGET_MOD} = 1 GROUP BY dim
),
r AS (
  SELECT dim, sum(weight)::BIGINT AS r_cnt FROM feats GROUP BY dim
),
tot AS (
  SELECT (SELECT sum(t_cnt) FROM t)::BIGINT AS t_total,
         (SELECT sum(r_cnt) FROM r)::BIGINT AS r_total
),
masses AS (
  SELECT f.doc_id,
         sum(f.weight * coalesce(t.t_cnt, 0))::BIGINT AS t_mass,
         sum(f.weight * r.r_cnt)::BIGINT AS r_mass
  FROM feats f LEFT JOIN t USING (dim) JOIN r USING (dim)
  GROUP BY f.doc_id
)
SELECT doc_id, t_mass, r_mass,
       (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % {BUCKETS})::HUGEINT
         * r_mass::HUGEINT * t_total::HUGEINT
       < {BUCKETS}::HUGEINT * t_mass::HUGEINT * r_total::HUGEINT AS kept
FROM masses, tot
""",
    "corpus_drift_tv": f"""
WITH toks AS (
  SELECT source, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
  FROM documents
),
sd AS (
  SELECT source,
         (('0x' || substr(md5(tok), 1, 8))::BIGINT % {HASH_DIM}) AS dim,
         count(*)::BIGINT AS s_cnt
  FROM toks WHERE tok IS NOT NULL AND tok <> ''
  GROUP BY 1, 2
),
cd AS (SELECT dim, sum(s_cnt)::BIGINT AS c_cnt FROM sd GROUP BY dim),
s_tot AS (SELECT source, sum(s_cnt)::BIGINT AS s_total FROM sd GROUP BY source),
c_tot AS (SELECT sum(c_cnt)::BIGINT AS c_total FROM cd),
grid AS (SELECT st.source, st.s_total, cd.dim, cd.c_cnt FROM s_tot st CROSS JOIN cd),
fullg AS (
  SELECT g.source, g.s_total, g.c_cnt, coalesce(sd.s_cnt, 0)::BIGINT AS s_cnt
  FROM grid g LEFT JOIN sd ON g.source = sd.source AND g.dim = sd.dim
)
SELECT source, s_total,
       sum(abs(s_cnt * c_total - c_cnt * s_total))::BIGINT AS tv_num,
       sum(abs(s_cnt * c_total - c_cnt * s_total))::DOUBLE
         / (2 * s_total * c_total)::DOUBLE AS tv
FROM fullg, c_tot
GROUP BY source, s_total, c_total
""",
}
