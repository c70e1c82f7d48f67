"""Property tests for the ExactSubstr rolling-hash prefilter
(operators/dedup._roll_hashes): the batch substring path is exact ONLY
because equal character grams always collide — the survivor set is
then a superset of the md5-dup set and the md5 re-census discards
collisions.  These tests pin that invariant over arbitrary unicode
(including multi-byte and astral-plane code points, where a byte-based
hash would break character alignment) without needing Spark."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from quacfka_service_spark.operators.dedup import _roll_hashes, _roll_tables

K = 5


def _tables(n):
    return _roll_tables(np.ones(1, np.uint64), np.ones(1, np.uint64), max(n, 1))


# unicode incl. CJK and astral-plane emoji; tight alphabet so texts
# actually share grams
_ALPHA = st.sampled_from(list("abc é中\U0001f600"))
_TEXT = st.text(alphabet=_ALPHA, min_size=K, max_size=60)


@settings(max_examples=300, deadline=None)
@given(_TEXT, _TEXT)
def test_equal_grams_hash_equal_across_texts(t1, t2):
    np.seterr(over="ignore")
    pw, ipw = _tables(max(len(t1), len(t2)))
    h1 = _roll_hashes(t1, K, pw, ipw)
    h2 = _roll_hashes(t2, K, pw, ipw)
    seen: dict[str, int] = {}
    for t, h in ((t1, h1), (t2, h2)):
        assert h.size == len(t) - K + 1
        for i in range(h.size):
            g = t[i : i + K]
            if g in seen:
                assert seen[g] == int(h[i]), (g, i)
            seen[g] = int(h[i])


@settings(max_examples=150, deadline=None)
@given(_TEXT)
def test_distinct_grams_rarely_collide(t):
    # not a correctness requirement (collisions are md5-discarded),
    # but a sanity pin that the hash actually discriminates: within
    # one short text, distinct grams must all get distinct hashes
    # (a 2^-64 event firing here would indicate a broken fold)
    np.seterr(over="ignore")
    pw, ipw = _tables(len(t))
    h = _roll_hashes(t, K, pw, ipw)
    grams = [t[i : i + K] for i in range(h.size)]
    by_hash: dict[int, str] = {}
    for g, hv in zip(grams, h):
        assert by_hash.setdefault(int(hv), g) == g


def test_table_growth_is_consistent():
    np.seterr(over="ignore")
    pw1, ipw1 = _tables(1000)
    pw2, ipw2 = _tables(10)
    pw2, ipw2 = _roll_tables(pw2, ipw2, 1000)  # grown in two steps
    assert (pw1[:1000] == pw2[:1000]).all()
    assert (ipw1[:1000] == ipw2[:1000]).all()
    assert int(pw1[1] * ipw1[1]) == 1  # B * B^-1 == 1 mod 2^64


def test_substring_spans_unicode_end_to_end(spark):
    # multi-byte + astral chars shift BYTE offsets away from CHARACTER
    # offsets — the two-phase path must still equal the direct md5 path
    from quacfka_service_spark.operators.dedup import (
        _gram_occurrences,
        _spans_from_occ,
        substring_spans,
    )

    shared = "café 中文 résumé \U0001f600\U0001f600 shared boiler plate"
    rows = [
        (1, shared + " uno ünique tail"),
        (2, "zürich prefix " + shared),
        (3, "nothing duplicated in this 一二三 document at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fast = sorted(map(tuple, substring_spans(docs).collect()))
    direct = sorted(
        map(
            tuple,
            _spans_from_occ(_gram_occurrences(docs).localCheckpoint()).collect(),
        )
    )
    assert fast == direct and fast, "unicode spans diverged or vacuous"
