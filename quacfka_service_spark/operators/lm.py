"""Statistical language-model operators over ``documents`` — train a
model ON the corpus and score the corpus with it, entirely inside the
engine.

Two operators, both of the "train + apply in a handful of shuffles"
family a 100 TB curation pipeline runs before any GPU sees a token:

- ``corpus_ngram_lm_score`` — a bigram LM with add-one smoothing
  trained on the whole corpus in one aggregation pass, then every
  document scored by its average token log-probability (the
  CCNet/KenLM-style fluency signal used to rank web text for LLM
  training sets; Wenzek et al. 2020 "CCNet" filter on LM perplexity).
  Low avg_logp = unusual token sequences = boilerplate/garbled text.

- ``corpus_nb_lang_classifier`` — a multinomial Naive Bayes language
  classifier: per-language token likelihoods and priors are learned
  from the corpus's own ``lang`` labels, then every document is
  re-scored and argmax-classified.  The trained counterpart of the
  stopword heuristic in ``text.lang_id`` — training IS aggregation
  (count tables), inference IS a join + fold, so the whole
  train/predict cycle is Catalyst-planned.

Reference anchor: the reference's surface ends at SQL aggregation
(`main.go:92-125`); these extend the same declarative engine to model
fitting, per SURVEY.md §6 (LLM-pipeline additions).

Exactness discipline (both ops are driver hash-checked):

- counts, vocab sizes and priors are integers on both engines;
- each per-token log term ``ln((c+1)/(denom))`` is computed from the
  SAME double ratio in both engines (int casts first, one division,
  one ln), QUANTIZED to integer nano-nats and SNAPPED to micro-nats
  with a half-grid guard band (see ``_qlog``) before any aggregation.
  Java's Math.log and DuckDB's libm ln disagree in the last 1-2 ulp
  on ~4% of ratios (measured at sf0.001), so raw-double sums can
  never hash-match; the snapped grid absorbs the ulp with ~2e-10
  per-term residual straddle risk while keeping far more precision
  than the signal carries, and integer sums are exact under ANY
  accumulation order — a plain partial-aggregated SUM, no
  sequential-fold crutch, which is also the better 100 TB plan;
- the emitted double score is derived from the SAME exact integer on
  both sides (one cast, two divisions, identical order);
- argmax ties break on exact integers (score DESC, class DESC).

100 TB shape (ngram LM): the model is two hash aggregations (bigram
counts, then left-word totals) whose shuffles carry pre-combined
partials; scoring is ONE equi-join of the token stream against the
model keyed on the bigram — 1:1 fan, no skew amplification (hot
bigrams join a single model row) — plus one doc-keyed fold.  Nothing
is quadratic, nothing collects to the driver.

100 TB shape (NB): the model is |vocab| x |classes| rows — a count
aggregate; the class table (priors, totals) is a broadcast of
|classes| rows; scoring fans each token by |classes| (5 here) and
left-joins the model on (token, class) so unseen tokens fall back to
the smoothed floor without a second pass.  Folds are doc-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table
from .text import _words

_SQL_WORDS = r"regexp_split_to_array(trim(lower(text)), '\s+')"

_QSCALE = 1_000_000_000  # nano-nat fine grid for log terms
_QSNAP = 1_000  # nano -> micro snap divisor (guard band = _QSNAP/2)

# Test hook (tests/test_lm_ulp_stability.py): a relative perturbation
# applied to ln() before quantization, emulating a 1-ulp libm
# disagreement between engines.  0.0 in production.
_LN_PERTURB = 0.0


def _qlog(ratio):
    """Snapped log term: floor((floor(ln(ratio)*1e9) + 500) / 1000) as
    BIGINT micro-nats — the cross-engine log quantization
    (VERDICT r7 #5 / ADVICE r6 #5 closure).

    Why two stages: Java Math.log and libm ln may differ in the last
    ulp, so ANY single floor of ln has grid-boundary straddle risk.
    Stage 1 floors to the fine nano-nat grid; stage 2 ROUNDS that
    integer to the coarse micro-nat grid (+500 then floor-divide by
    1000).  The emitted micro value flips between engines only when
    the fine value lands within the 1-ulp disagreement of a MICRO
    boundary, i.e. the ln argument must hit a ~2e-7-nano window
    adjacent to one in a thousand fine boundaries: per-term straddle
    probability ~2e-10 — a 1000x reduction over the single-floor
    scheme at the cost of 3 decimal digits of score resolution (micro-
    nat resolution is far below any argmax gap the classifier needs;
    ties still break on exact integers).  Both engines compute the
    same IEEE pipeline: the +500 sum is an exact small-integer double,
    and /1000.0 keeps a >=1e-3 margin to the floor boundary against a
    ~1e-8 relative division error, so stage 2 can never flip on its
    own.  tests/test_lm_ulp_stability.py pins all three lm keys
    invariant under a +/-1-ulp perturbed ln on the fixture corpus."""
    ln = F.log(ratio)
    if _LN_PERTURB:
        ln = ln * F.lit(1.0 + _LN_PERTURB)
    nano = F.floor(ln * F.lit(float(_QSCALE)))
    return F.floor((nano + F.lit(_QSNAP // 2)) / F.lit(float(_QSNAP))).cast("long")


def _token_rows(docs: DataFrame, *carry: str) -> DataFrame:
    """(doc_id, *carry, pos, tok): position-stamped token stream.
    posexplode_outer (not explode) — see the InferFiltersFromGenerate
    note in operators/dedup.py.  _spread (r12): the regex-split +
    explode CPU otherwise inherits the raw scan's 1-2 splits
    (single-row-group fixture files) and serializes on one core; no-op
    whenever the scan itself has enough splits — see dedup._spread."""
    from .dedup import CPU_SPREAD_TARGET_BYTES, _spread

    return (
        _spread(docs, CPU_SPREAD_TARGET_BYTES, "doc_id")
        .select("doc_id", *carry, F.posexplode_outer(_words(F.col("text"))))
        .withColumnRenamed("col", "tok")
        .where(F.col("tok").isNotNull() & (F.col("tok") != ""))
    )


def _bigram_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, w1, w2): position-stamped bigram stream.
    _spread: same single-split rationale as _token_rows."""
    from .dedup import CPU_SPREAD_TARGET_BYTES, _spread

    docs = _spread(docs, CPU_SPREAD_TARGET_BYTES, "doc_id")
    w = _words(F.col("text"))
    arr = F.when(
        F.size("w") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("w") - 1),
            lambda i: F.struct(
                F.element_at(F.col("w"), i).alias("w1"),
                F.element_at(F.col("w"), i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return (
        docs.select("doc_id", w.alias("w"))
        .select("doc_id", F.posexplode_outer(arr))
        .where(F.col("col").isNotNull())
        .select(
            "doc_id",
            "pos",
            F.col("col.w1").alias("w1"),
            F.col("col.w2").alias("w2"),
        )
        .where((F.col("w1") != "") & (F.col("w2") != ""))
    )


def ngram_lm_score(docs: DataFrame) -> DataFrame:
    """Per-document average bigram log-probability under an add-one
    smoothed LM trained on the corpus itself.

    P(w2|w1) = (c(w1,w2) + 1) / (c(w1,*) + V), V = |distinct tokens|.
    Documents with < 2 tokens have no bigrams and drop out (inner
    semantics, mirrored by the oracle)."""
    occ = _bigram_rows(docs)
    # Shape deliberately KEPT from r10 after the r11 plan-duplication
    # audit measured both alternatives and rejected them (guide §1
    # "measure first" — OPTIMIZATION_r11 §12):
    # (a) localCheckpoint(c2): halves the plan's scan nodes but
    #     serializes the model materialization ahead of the scoring
    #     pass — 1.28 -> 1.59 s min-of-3 under the driver protocol
    #     (the "duplicated" c2 subtrees under c1 and the scoring join
    #     run CONCURRENTLY inside one job on idle cores).
    # (b) c1 = sum(c2) over (partition by w1): linear lineage, but a
    #     whole-partition window has NO map-side partial aggregation
    #     and AQE cannot split a skewed window partition (it can split
    #     skewed JOIN partitions — guide §2.5), so a hot left-word
    #     ('the') serializes on one task at exactly the 100 TB scale
    #     this operator documents; warmed sf1 A/B read join {6.90,
    #     6.78} s vs window {9.09, 5.71} s — no stable local win to
    #     buy the scale hazard with.
    # The groupBy rollup + w1 equi-join keeps both aggregations
    # partial-agg combined and the join AQE-skew-splittable.
    c2 = occ.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").cast("long").alias("c1"))
    model = c2.join(c1, "w1")
    toks = _token_rows(docs)
    vocab = toks.agg(F.countDistinct("tok").cast("long").alias("v"))
    model = model.crossJoin(F.broadcast(vocab))
    scored = occ.join(model, ["w1", "w2"]).select(
        "doc_id",
        _qlog(
            (F.col("c2") + 1).cast("double") / (F.col("c1") + F.col("v")).cast("double")
        ).alias("q"),
    )
    per = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("q").cast("long").alias("sum_q"),
    )
    return per.select(
        "doc_id",
        "n_bigrams",
        (F.col("sum_q").cast("double") / F.lit(1e6) / F.col("n_bigrams")).alias(
            "avg_logp"
        ),
    )


def nb_lang_classifier(docs: DataFrame) -> DataFrame:
    """Multinomial Naive Bayes language-ID, trained and applied on the
    corpus: argmax over langs of
    ln(n_docs(lang)/N) + Σ_tok ln((c(tok,lang)+1)/(T(lang)+V)).

    Returns (doc_id, lang, predicted, score, correct) — ``lang`` is
    the training label, ``predicted`` the argmax class.  Self-scoring
    on the training set (resubstitution) keeps the op deterministic
    and self-contained; the model tables are ordinary DataFrames a
    caller can persist and apply to a held-out corpus."""
    toks = _token_rows(docs, "lang")
    classes = docs.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    n_total = docs.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    # The (tok, cls) count table IS the model — checkpoint it (r11,
    # guide §5) and derive token_totals and vocab FROM it instead of
    # re-aggregating the corpus token stream per statistic:
    # t_tok(lang) = Σ_tok c(tok, lang) and V = |distinct tok in counts|
    # are bit-exact identities (a token occurs in counts iff it occurs
    # in the stream).  The r10 plan re-expanded the explode under all
    # four consumers (20 parquet scans / 42 Exchange; now 3 corpus-ish
    # scans: the counts build, the scoring fan, and the column-pruned
    # per-class doc counts).
    counts = (
        toks.groupBy("tok", F.col("lang").alias("cls"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    token_totals = counts.groupBy(F.col("cls").alias("lang")).agg(
        F.sum("c").cast("long").alias("t_tok")
    )
    vocab = counts.agg(F.countDistinct("tok").cast("long").alias("v"))
    cls = (
        classes.join(token_totals, "lang")
        .crossJoin(F.broadcast(n_total))
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col("lang").alias("cls"),
            _qlog(
                F.col("n_docs").cast("double") / F.col("n_total").cast("double")
            ).alias("prior_q"),
            "t_tok",
            "v",
        )
        # |classes| rows, reused by the scoring fan AND the prior join
        # — checkpoint so its doc-count subtree runs once
        .localCheckpoint(eager=False)
    )
    # token stream x class fan-out (|classes| small -> broadcast),
    # then LEFT join the count table so unseen (tok, class) pairs take
    # the smoothed floor c=0 in the same pass.
    fan = toks.select("doc_id", "lang", "tok").crossJoin(
        F.broadcast(cls.select("cls", "t_tok", "v"))
    )
    scored = fan.join(counts, ["tok", "cls"], "left").select(
        "doc_id",
        "lang",
        "cls",
        _qlog(
            (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double")
            / (F.col("t_tok") + F.col("v")).cast("double")
        ).alias("q"),
    )
    per_class = scored.groupBy("doc_id", "lang", "cls").agg(
        F.sum("q").cast("long").alias("sum_q")
    )
    per_class = per_class.join(F.broadcast(cls.select("cls", "prior_q")), "cls").select(
        "doc_id",
        "lang",
        "cls",
        (F.col("prior_q") + F.col("sum_q")).alias("score_q"),
    )
    best = per_class.groupBy("doc_id", "lang").agg(
        F.max(F.struct("score_q", "cls")).alias("b")
    )
    return best.select(
        "doc_id",
        "lang",
        F.col("b.cls").alias("predicted"),
        (F.col("b.score_q").cast("double") / F.lit(1e6)).alias("score"),
        (F.col("b.cls") == F.col("lang")).cast("int").alias("correct"),
    )


N_QUALITY_BUCKETS = 10


def lm_quality_buckets(docs: DataFrame, n_buckets: int = N_QUALITY_BUCKETS) -> DataFrame:
    """Per-source LM-quality mix: bucket every document into global
    ``n_buckets``-iles of its ``ngram_lm_score`` (the perplexity
    proxy), then count each source's documents per bucket — the
    release dashboard that shows WHICH feed supplies the lowest-scoring
    decile before a filter threshold is chosen.

    Exactness: the decile boundary is rank arithmetic on the already
    engine-exact (avg_logp, doc_id) ordering — bucket =
    (rank-1) * n_buckets DIV n, all integers, no ntile (whose tie
    semantics would be moot here but whose remainder placement is one
    more thing to trust).

    100 TB shape: a naive global rank is a single-task sort.  Same cure
    as corpus_shuffle_order, generalized to a VALUE ordering: pre-shard
    by a coarse MONOTONE function of the sort key (floor(avg_logp * 8)
    — log-band integer, bounded by the score range, not the corpus),
    rank within shards in parallel, add the broadcast running offset of
    earlier shards.  Ordering by (band, avg_logp, doc_id) IS ordering
    by (avg_logp, doc_id) because the band is monotone in the score."""
    from pyspark.sql.window import Window

    # `per` (doc_id, avg_logp, band — one narrow row per doc) feeds
    # the shard ranking, the shard counts AND the total: checkpoint it
    # (r11, guide §5) so the whole LM train+score pipeline above runs
    # once, not three times (26 parquet scans -> 3 in the plan).
    per = ngram_lm_score(docs).select(
        "doc_id", "avg_logp", F.floor(F.col("avg_logp") * 8).cast("long").alias("band")
    ).localCheckpoint(eager=False)
    w = Window.partitionBy("band").orderBy("avg_logp", "doc_id")
    ranked = per.select("doc_id", "avg_logp", "band", F.row_number().over(w).alias("intra"))
    counts = per.groupBy("band").agg(F.count(F.lit(1)).alias("n_band"))
    off_w = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "band",
        F.coalesce(F.sum("n_band").over(off_w), F.lit(0).cast("long")).alias("off"),
    )
    total = per.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    bucket = F.expr(f"CAST((off + intra - 1) * {n_buckets} DIV n_total AS BIGINT)")
    bucketed = (
        ranked.join(F.broadcast(offsets), "band")
        .crossJoin(F.broadcast(total))
        .select("doc_id", "avg_logp", bucket.alias("bucket"))
    )
    return (
        bucketed.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("avg_logp").alias("lo_logp"),
            F.max("avg_logp").alias("hi_logp"),
        )
    )


def _q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_lm_score(load_table(spark, sf_dir, "documents"))


def _q_nb_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    return nb_lang_classifier(load_table(spark, sf_dir, "documents"))


def _q_lm_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lm_quality_buckets(load_table(spark, sf_dir, "documents"))


QUERIES = {
    "corpus_ngram_lm_score": _q_lm_score,
    "corpus_nb_lang_classifier": _q_nb_lang,
    "corpus_lm_quality_buckets": _q_lm_quality_buckets,
}

ORACLES = {
    "corpus_ngram_lm_score": f"""
WITH w AS (
  SELECT doc_id, {_SQL_WORDS} AS w FROM documents
), idx AS (
  SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
  FROM w WHERE len(w) >= 2
), occ AS (
  SELECT doc_id, i - 1 AS pos, w[i] AS w1, w[i + 1] AS w2
  FROM idx WHERE w[i] <> '' AND w[i + 1] <> ''
), c2 AS (
  SELECT w1, w2, count(*)::BIGINT AS c2 FROM occ GROUP BY 1, 2
), c1 AS (
  SELECT w1, sum(c2)::BIGINT AS c1 FROM c2 GROUP BY 1
), toks AS (
  SELECT unnest({_SQL_WORDS}) AS tok FROM documents
), vocab AS (
  SELECT count(DISTINCT tok)::BIGINT AS v FROM toks WHERE tok IS NOT NULL AND tok <> ''
), scored AS (
  SELECT o.doc_id,
         CAST(floor((floor(ln(CAST(c2.c2 + 1 AS DOUBLE)
                             / CAST(c1.c1 + vocab.v AS DOUBLE)) * 1e9)
                     + 500) / 1000.0) AS BIGINT) AS q
  FROM occ o JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN vocab
), per AS (
  SELECT doc_id, count(*)::BIGINT AS n_bigrams, sum(q)::BIGINT AS sum_q
  FROM scored GROUP BY doc_id
)
SELECT doc_id, n_bigrams,
       CAST(sum_q AS DOUBLE) / 1e6 / n_bigrams AS avg_logp
FROM per
""",
    "corpus_nb_lang_classifier": f"""
WITH toks AS (
  SELECT doc_id, lang, w[i] AS tok
  FROM (SELECT doc_id, lang, w, unnest(generate_series(1, len(w))) AS i
        FROM (SELECT doc_id, lang, {_SQL_WORDS} AS w FROM documents))
  WHERE w[i] IS NOT NULL AND w[i] <> ''
), classes AS (
  SELECT lang AS cls, count(*)::BIGINT AS n_docs FROM documents GROUP BY 1
), n_total AS (
  SELECT count(*)::BIGINT AS n_total FROM documents
), token_totals AS (
  SELECT lang AS cls, count(*)::BIGINT AS t_tok FROM toks GROUP BY 1
), vocab AS (
  SELECT count(DISTINCT tok)::BIGINT AS v FROM toks
), cls AS (
  SELECT classes.cls,
         CAST(floor((floor(ln(CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE))
                             * 1e9) + 500) / 1000.0) AS BIGINT) AS prior_q,
         t_tok, v
  FROM classes JOIN token_totals USING (cls) CROSS JOIN n_total CROSS JOIN vocab
), counts AS (
  SELECT tok, lang AS cls, count(*)::BIGINT AS c FROM toks GROUP BY 1, 2
), scored AS (
  SELECT t.doc_id, t.lang, cls.cls,
         CAST(floor((floor(ln(CAST(COALESCE(c.c, 0) + 1 AS DOUBLE)
                             / CAST(cls.t_tok + cls.v AS DOUBLE)) * 1e9)
                     + 500) / 1000.0) AS BIGINT) AS q
  FROM toks t CROSS JOIN cls
  LEFT JOIN counts c ON c.tok = t.tok AND c.cls = cls.cls
), per_class AS (
  SELECT s.doc_id, s.lang, s.cls, cls.prior_q + sum(s.q)::BIGINT AS score_q
  FROM scored s JOIN cls ON cls.cls = s.cls
  GROUP BY s.doc_id, s.lang, s.cls, cls.prior_q
), best AS (
  SELECT doc_id, lang, cls AS predicted, score_q,
         row_number() OVER (PARTITION BY doc_id ORDER BY score_q DESC, cls DESC) AS rn
  FROM per_class
)
SELECT doc_id, lang, predicted,
       CAST(score_q AS DOUBLE) / 1e6 AS score,
       (predicted = lang)::INT AS correct
FROM best WHERE rn = 1
""",
}

# Composed from the hash-verified lm-score oracle so the decile
# arithmetic can never drift from the score it buckets.
ORACLES["corpus_lm_quality_buckets"] = f"""
WITH lm AS ({ORACLES["corpus_ngram_lm_score"]}),
ranked AS (
  SELECT doc_id, avg_logp,
         row_number() OVER (ORDER BY avg_logp, doc_id) AS rn,
         count(*) OVER () AS n_total
  FROM lm
),
b AS (
  SELECT doc_id, avg_logp,
         ((rn - 1) * {N_QUALITY_BUCKETS}) // n_total AS bucket
  FROM ranked
)
SELECT d.source, b.bucket::BIGINT AS bucket, count(*)::BIGINT AS n_docs,
       min(b.avg_logp) AS lo_logp, max(b.avg_logp) AS hi_logp
FROM b JOIN documents d USING (doc_id)
GROUP BY 1, 2
"""
