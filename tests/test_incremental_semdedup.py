"""Incremental semantic dedup (streaming/incremental_semdedup.py):
``result()`` after any sequence of batches must equal batch
``semantic_dedup`` over the union under the same frozen codebook —
same (vec_id, cell, kept) rows — including the late-low-id demotion
path; replayed epochs are no-ops (txlog txn idempotency)."""

from __future__ import annotations

from pyspark.sql import functions as F

from quacfka_service_spark.operators.semdedup import semantic_dedup, seed_codebook
from quacfka_service_spark.session import load_table
from quacfka_service_spark.streaming.incremental_semdedup import (
    IncrementalSemanticDeduper,
)

SF_DIR = "/root/testdata/sf0.001"

CB = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]  # two orthogonal cells
TAU = 0.9


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def _rows(df):
    return sorted((r["vec_id"], r["cell"], r["kept"]) for r in df.collect())


# planted corpus: 10/20/5 nearly parallel in cell 0, 30 alone in cell 1
V10 = [1.0, 0.05, 0.0, 0.0]
V20 = [1.0, 0.06, 0.0, 0.0]
V5 = [1.0, 0.04, 0.0, 0.0]
V30 = [0.0, 1.0, 0.0, 0.0]
ALL = [(10, V10), (20, V20), (5, V5), (30, V30)]


def test_incremental_equals_batch_and_demotes_late_low_id(spark, tmp_path):
    dd = IncrementalSemanticDeduper(str(tmp_path / "sd"), CB, threshold=TAU)
    dd.process_batch(_emb(spark, [(10, V10), (30, V30)]), 0)
    # after epoch 0: 10 and 30 both kept
    assert _rows(dd.result(spark)) == [(10, 0, True), (30, 1, True)]

    dd.process_batch(_emb(spark, [(20, V20)]), 1)  # 20 > 10, near-parallel
    assert (20, 0, False) in _rows(dd.result(spark))

    dd.process_batch(_emb(spark, [(5, V5)]), 2)  # LATE low id demotes 10
    got = _rows(dd.result(spark))
    want = _rows(semantic_dedup(_emb(spark, ALL), threshold=TAU, centroids=CB))
    assert got == want
    assert (10, 0, False) in got and (5, 0, True) in got and (30, 1, True) in got


def test_incremental_batching_invariance(spark, tmp_path):
    one = IncrementalSemanticDeduper(str(tmp_path / "a"), CB, threshold=TAU)
    one.process_batch(_emb(spark, ALL), 0)
    split = IncrementalSemanticDeduper(str(tmp_path / "b"), CB, threshold=TAU)
    split.process_batch(_emb(spark, [(20, V20), (30, V30)]), 0)
    split.process_batch(_emb(spark, [(5, V5)]), 1)
    split.process_batch(_emb(spark, [(10, V10)]), 2)
    want = _rows(semantic_dedup(_emb(spark, ALL), threshold=TAU, centroids=CB))
    assert _rows(one.result(spark)) == want
    assert _rows(split.result(spark)) == want


def test_incremental_replay_is_noop(spark, tmp_path):
    dd = IncrementalSemanticDeduper(str(tmp_path / "r"), CB, threshold=TAU)
    dd.process_batch(_emb(spark, [(10, V10), (30, V30)]), 0)
    dd.process_batch(_emb(spark, [(5, V5)]), 1)
    before = _rows(dd.result(spark))
    vc, vd = dd.cells.latest_version(), dd.dropped.latest_version()
    dd.process_batch(_emb(spark, [(5, V5)]), 1)  # replayed epoch
    assert dd.cells.latest_version() == vc
    assert dd.dropped.latest_version() == vd
    assert _rows(dd.result(spark)) == before


def test_incremental_matches_batch_on_fixture(spark, tmp_path):
    """Fixture embeddings, frozen first-8 codebook, default threshold:
    3-way batching equals the batch operator bit-for-bit."""
    emb = load_table(spark, SF_DIR, "embeddings")
    cb = seed_codebook(emb)
    dd = IncrementalSemanticDeduper(str(tmp_path / "fx"), cb)
    for epoch, part in enumerate(
        emb.where(F.col("vec_id") % 3 == k) for k in range(3)
    ):
        dd.process_batch(part, epoch)
    want = _rows(semantic_dedup(emb, centroids=cb))
    got = _rows(dd.result(spark))
    assert len(want) == emb.count()
    assert got == want


# --- randomized property pin vs an independent pure-Python reference ------
# Values are multiples of 1/64 in [-8/64, 8/64]: exact in float32 AND
# double, and their pairwise products/sums stay exact, so Python's
# sequential fold reproduces Spark's F.aggregate bit-for-bit (sqrt and
# the final division are single IEEE ops on identical inputs).


def _pydot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _pynorm(a):
    import math

    return math.sqrt(_pydot(a, a))


def _ref_semdedup(vecs: dict, centroids, tau):
    cn = [_pynorm(c) for c in centroids]
    cell = {}
    for i, v in vecs.items():
        best = None
        for ci, c in enumerate(centroids):
            cs = _pydot(v, c) / (_pynorm(v) * cn[ci])
            if best is None or cs > best[0]:  # ties keep the lower cent_id
                best = (cs, ci)
        cell[i] = best[1]
    dropped = set()
    ids = sorted(vecs)
    for j in ids:
        for i in ids:
            if i < j and cell[i] == cell[j]:
                cs = _pydot(vecs[i], vecs[j]) / (_pynorm(vecs[i]) * _pynorm(vecs[j]))
                if cs >= tau:
                    dropped.add(j)
                    break
    return sorted((i, cell[i], i not in dropped) for i in ids)


def test_random_corpora_match_pure_python_reference(spark, tmp_path):
    import random

    rng = random.Random(1306)
    cb = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]]
    for case in range(4):
        vecs = {}
        for i in range(rng.randrange(8, 28)):
            v = [rng.randrange(-8, 9) / 64.0 for _ in range(4)]
            if not any(v):
                v[rng.randrange(4)] = 1.0 / 64.0  # no zero vectors
            vecs[i * 7 % 97] = v  # non-contiguous ids
        want = _ref_semdedup(vecs, cb, TAU)
        df = _emb(spark, sorted(vecs.items()))
        assert _rows(semantic_dedup(df, threshold=TAU, centroids=cb)) == want

        # random batching through the incremental deduper
        ids = list(vecs)
        rng.shuffle(ids)
        n_cuts = rng.randrange(1, 4)
        cuts = sorted(rng.sample(range(1, len(ids)), n_cuts)) + [len(ids)]
        dd = IncrementalSemanticDeduper(str(tmp_path / f"p{case}"), cb, threshold=TAU)
        lo = 0
        for epoch, hi in enumerate(cuts):
            chunk = [(i, vecs[i]) for i in ids[lo:hi]]
            dd.process_batch(_emb(spark, chunk), epoch)
            lo = hi
        assert _rows(dd.result(spark)) == want


def test_incremental_empty_batch_is_harmless(spark, tmp_path):
    """Streaming sources deliver empty micro-batches (idle triggers);
    the deduper must absorb one without error or state corruption."""
    dd = IncrementalSemanticDeduper(str(tmp_path / "e"), CB, threshold=TAU)
    dd.process_batch(_emb(spark, [(10, V10), (20, V20)]), 0)
    before = _rows(dd.result(spark))
    dd.process_batch(_emb(spark, []), 1)
    assert _rows(dd.result(spark)) == before
