"""Property tests for batch-6 operators: random inputs vs independent
pure-Python references (same strategy as test_wire_property.py uses
for the codec — generated cases catch the boundary arithmetic unit
fixtures miss)."""

from __future__ import annotations

import math
import random

from quacfka_service_spark.operators.chunking import chunk_windows
from quacfka_service_spark.operators.vocab import token_coverage


def _ref_chunks(tokens: list[str], window: int, stride: int):
    out = []
    for cid, start in enumerate(range(0, len(tokens), stride)):
        if start >= len(tokens):
            break
        piece = tokens[start : start + window]
        out.append((cid, len(piece), " ".join(piece)))
    return out


def test_chunk_windows_random_cases_match_reference(spark):
    rng = random.Random(42)
    rows, want = [], {}
    window, stride = 7, 5
    for doc_id in range(40):
        n = rng.randrange(0, 30)
        toks = [f"w{rng.randrange(1000)}" for _ in range(n)]
        rows.append((doc_id, " ".join(toks)))
        if n:
            want[doc_id] = _ref_chunks(toks, window, stride)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got: dict[int, list] = {}
    for r in chunk_windows(docs, window=window, stride=stride).collect():
        got.setdefault(r.doc_id, []).append((r.chunk_id, r.n_tokens, r.chunk_text))
    got = {k: sorted(v) for k, v in got.items()}
    assert got == {k: sorted(v) for k, v in want.items()}


def _ref_coverage(freqs: list[int]):
    """(pct, vocab_size, cum_tokens) by brute force: take tokens
    most-frequent-first, one at a time."""
    total = sum(freqs)
    ordered = sorted(freqs, reverse=True)
    out = {}
    for k in range(1, 10):
        threshold = -(-total * k * 10 // 100)  # ceil
        cum = vocab = 0
        for f in ordered:
            if cum >= threshold:
                break
            cum += f
            vocab += 1
        out[k * 10] = (vocab, cum)
    return out


def test_token_coverage_random_corpora_match_bruteforce(spark):
    rng = random.Random(7)
    for case in range(5):
        n_types = rng.randrange(3, 25)
        freqs = [rng.randrange(1, 40) for _ in range(n_types)]
        words = []
        for i, f in enumerate(freqs):
            words.extend([f"tok{i}"] * f)
        rng.shuffle(words)
        docs = spark.createDataFrame(
            [(0, " ".join(words))], "doc_id long, text string"
        )
        got = {r.pct: (r.vocab_size, r.cum_tokens)
               for r in token_coverage(docs).collect()}
        assert got == _ref_coverage(freqs), (case, freqs)


def _md5_bucket(s: str, mod: int) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % mod


def test_cms_counters_random_streams_match_reference(spark):
    """CMS counters == a brute-force dict over the same md5 kernel, and
    every point estimate (min over d rows) >= the true count — random
    key streams with planted heavy hitters."""
    import random
    from collections import Counter

    from quacfka_service_spark.operators.olap import CMS_D, CMS_W, cms_counters

    rng = random.Random(1306)
    for case in range(3):
        keys = []
        for hh in range(3):  # planted heavy hitters
            keys += [1000 + hh] * rng.randrange(20, 60)
        keys += [rng.randrange(2000, 4000) for _ in range(rng.randrange(50, 150))]
        rng.shuffle(keys)
        ev = spark.createDataFrame([(k,) for k in keys], "user_id long")

        want = Counter()
        for k in keys:
            for row in range(CMS_D):
                want[(row, _md5_bucket(f"{row}:{k}", CMS_W))] += 1
        got = {
            (r["row"], r["col"]): r["n"] for r in cms_counters(ev).collect()
        }
        assert got == dict(want)

        true_n = Counter(keys)
        for k, n in true_n.items():
            est = min(
                got[(row, _md5_bucket(f"{row}:{k}", CMS_W))] for row in range(CMS_D)
            )
            assert est >= n
