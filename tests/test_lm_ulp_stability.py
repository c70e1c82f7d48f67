"""Pinned 1-ulp stability of the lm.py log quantization
(VERDICT r7 #5 / ADVICE r6 #5 closure).

The cross-engine risk being guarded: Java Math.log (Spark) and libm ln
(DuckDB) can return doubles that differ in the last ulp.  ``_qlog``
snaps the nano-nat floor to a micro-nat grid with a half-grid guard
band so a 1-ulp ln disagreement cannot move any emitted value unless a
term lands in a ~2e-7-nano window adjacent to a micro boundary
(~2e-10 per term).  These tests PIN that property empirically: every
lm key's full output must be bit-identical when ln is perturbed by
±1 ulp (relative bump of 2^-52) — i.e. on this corpus no term sits on
a flip window, so whichever side of the ulp each engine lands on, both
emit the same integers.  The fixture reuses the sf0.001 documents
table — real corpus shapes, not toy strings.
"""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from quacfka_service_spark.operators import lm
from quacfka_service_spark.session import load_table

SF_DIR = "/root/testdata/sf0.001"
ULP = 2.0**-52  # 1-ulp relative perturbation of ln's result


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents").localCheckpoint()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _with_perturb(eps, fn, *args):
    old = lm._LN_PERTURB
    lm._LN_PERTURB = eps
    try:
        return _rows(fn(*args))
    finally:
        lm._LN_PERTURB = old


@pytest.mark.parametrize("eps", [ULP, -ULP])
def test_ngram_lm_score_invariant_under_1ulp_ln(docs, eps):
    base = _rows(lm.ngram_lm_score(docs))
    assert base, "fixture produced no scored documents"
    assert _with_perturb(eps, lm.ngram_lm_score, docs) == base


@pytest.mark.parametrize("eps", [ULP, -ULP])
def test_nb_lang_classifier_invariant_under_1ulp_ln(docs, eps):
    base = _rows(lm.nb_lang_classifier(docs))
    assert base, "fixture produced no classified documents"
    assert _with_perturb(eps, lm.nb_lang_classifier, docs) == base


@pytest.mark.parametrize("eps", [ULP, -ULP])
def test_lm_quality_buckets_invariant_under_1ulp_ln(docs, eps):
    base = _rows(lm.lm_quality_buckets(docs))
    assert base, "fixture produced no buckets"
    assert _with_perturb(eps, lm.lm_quality_buckets, docs) == base


def test_snap_arithmetic_is_engine_portable():
    """Stage 2 of _qlog ((nano + 500) / 1000.0 then floor) must be
    flip-proof given identical nano integers: for every nano value the
    double division keeps a margin to the floor boundary that dwarfs
    the division's rounding error, including negatives (floor, not
    truncation, so -1.5 -> -2 on both engines)."""
    import math

    for nano in [-50_000_000_000, -1_234_567_891, -1500, -501, -500,
                 -499, 0, 499, 500, 1499, 987_654_321, 49_999_999_999]:
        snapped = math.floor((nano + 500) / 1000.0)
        # exact rational reference
        assert snapped == (nano + 500) // 1000
