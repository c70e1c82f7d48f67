"""Hot-shingle (df-capped) pairs must stay IN the minhash_estimate
report.

Round-5 verdict "What's wrong" #4: a banded-LSH candidate pair whose
only shared shingles are HOT (document frequency > NGRAM_MAX_DF — the
boilerplate-header / license-banner case) fell out of the report via
the inner true-jaccard join, because the capped shingle universe holds
no row for the pair.  Both engines now LEFT-join with COALESCE: no
surviving shared shingle -> true_jaccard 0.0; no surviving shingles at
all on either side -> NULL (est_jaccard still reported — that is the
whole point of the estimator column).

The fixture makes the 3-gram "alpha beta gamma" genuinely hot
(df = 1003 > NGRAM_MAX_DF = 1000) with two identical docs consisting
of ONLY that shingle — guaranteed LSH candidates whose entire shared
evidence is capped.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from quacfka_service_spark.operators.dedup import (
    NGRAM_MAX_DF,
    ORACLES,
    minhash_estimate,
)

_HOT = "alpha beta gamma"
_N_FILLER = NGRAM_MAX_DF + 1  # hot shingle df = fillers + 2 > cap


def _docs_rows():
    rows = [(1, _HOT), (2, _HOT)]
    for i in range(_N_FILLER):
        tail = " ".join(f"w{i}x{j}" for j in range(17))
        rows.append((10 + i, f"{_HOT} {tail}"))
    return rows


@pytest.fixture(scope="module")
def hot_docs(spark):
    return spark.createDataFrame(_docs_rows(), "doc_id long, text string")


@pytest.fixture(scope="module")
def hot_duck():
    import duckdb

    con = duckdb.connect()
    con.register("documents", pd.DataFrame(_docs_rows(), columns=["doc_id", "text"]))
    return con


def test_capped_pair_present_with_null_true_jaccard(hot_docs):
    got = {(r.doc_a, r.doc_b): r for r in minhash_estimate(hot_docs).collect()}
    assert (1, 2) in got, "all-hot-evidence pair dropped from the report"
    row = got[(1, 2)]
    assert row.est_jaccard == 1.0          # identical signatures
    assert row.true_jaccard is None        # every shared shingle capped


def test_capped_corpus_parity_with_oracle(hot_docs, hot_duck):
    spark_pdf = minhash_estimate(hot_docs).toPandas()
    duck_pdf = hot_duck.execute(ORACLES["dedup_minhash_estimate"]).fetchdf()
    assert len(spark_pdf) == len(duck_pdf) > 0
    key = ["doc_a", "doc_b"]
    a = spark_pdf.sort_values(key).reset_index(drop=True)
    b = duck_pdf.sort_values(key).reset_index(drop=True)
    for c in ["doc_a", "doc_b", "est_jaccard", "true_jaccard"]:
        for x, y in zip(a[c].tolist(), b[c].tolist()):
            xn = x is None or (isinstance(x, float) and math.isnan(x))
            yn = y is None or (isinstance(y, float) and math.isnan(y))
            if xn or yn:
                assert xn and yn, f"{c}: {x!r} != {y!r}"
            else:
                assert x == y, f"{c}: {x!r} != {y!r}"
