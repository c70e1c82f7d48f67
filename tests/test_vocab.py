"""OOV scoring semantics on a hand-built corpus (engine parity is the
oracle gate's job; this pins WHO counts as OOV, ties, empty docs)."""

from __future__ import annotations

from quacfka_service_spark.operators.vocab import oov_score, vocab_top


def _docs(spark):
    # tf: common=4, shared=3, alpha=beta=2 (tie broken by token string:
    # alpha wins the last slot at k=3), gamma/delta/epsilon=1.
    return spark.createDataFrame(
        [
            (1, "common shared alpha"),
            (2, "common shared beta common alpha"),
            (3, "common shared gamma delta beta"),
            (4, ""),
            (5, "epsilon"),
        ],
        "doc_id BIGINT, text STRING",
    )


def test_vocab_top_k_with_tie_break(spark):
    got = {(r["tok"], r["tf"]) for r in vocab_top(_docs(spark), k=3).collect()}
    assert got == {("common", 4), ("shared", 3), ("alpha", 2)}


def test_oov_score_counts(spark):
    got = {
        (r["doc_id"], r["n_tokens"], r["n_oov"])
        for r in oov_score(_docs(spark), k=3).collect()
    }
    # doc 4: split('') is [''] which is filtered -> (0, 0).
    assert got == {
        (1, 3, 0),   # all in vocab
        (2, 5, 1),   # beta OOV
        (3, 5, 3),   # gamma delta beta OOV
        (4, 0, 0),
        (5, 1, 1),   # epsilon OOV
    }


def test_bpe_merge_candidates(spark):
    from quacfka_service_spark.operators.vocab import bpe_merge_candidates

    docs = spark.createDataFrame(
        [(1, "aaa ab x"), (2, "ab aaa")],
        "doc_id BIGINT, text STRING",
    )
    got = [(r["pair"], r["cnt"]) for r in bpe_merge_candidates(docs, k=10).collect()]
    # 'aaa' x2 -> 'aa' 4 (per-position, twice per occurrence); 'ab' x2;
    # 'x' too short to pair.  Ties impossible here; order (cnt desc, pair).
    assert got == [("aa", 4), ("ab", 2)]


# --- full BPE trainer (round 3) -------------------------------------------

def _reference_bpe(word_freqs: dict[str, int], n_merges: int):
    """Independent pure-Python BPE (Sennrich): most frequent adjacent
    symbol pair, ties (count desc, pair asc), greedy left-to-right
    non-overlapping application."""
    vocab = {w: [c for c in w] for w in word_freqs}
    out = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            f = word_freqs[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = counts.get((syms[i], syms[i + 1]), 0) + f
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((rank, l, r, l + r, c))
        for w, syms in vocab.items():
            new, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    new.append(l + r)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            vocab[w] = new
    return out


def test_bpe_train_matches_reference_implementation(spark):
    from quacfka_service_spark.operators.vocab import bpe_train

    words = (["hug"] * 10 + ["pug"] * 5 + ["pun"] * 12 + ["bun"] * 4 + ["hugs"] * 5)
    docs = spark.createDataFrame(
        [(i, " ".join(words),) for i in range(2)], "doc_id long, text string"
    )
    got = [
        (r.rank, r.left, r.right, r.merged, r.cnt)
        for r in bpe_train(docs, n_merges=6).orderBy("rank").collect()
    ]
    freqs = {}
    for w in words:
        freqs[w] = freqs.get(w, 0) + 2  # two identical docs
    want = _reference_bpe(freqs, 6)
    assert got == want
    # sanity: "ug" rides hug(20) + pug(10) + hugs(10) = 40 occurrences
    assert got[0][1:4] == ("u", "g", "ug") and got[0][4] == 40
    # and a LATER merge builds on an earlier merged symbol (true BPE
    # iteration, not repeated unigram-pair counting): some rule's left
    # or right side is itself multi-character
    assert any(len(l) > 1 or len(r) > 1 for _, l, r, _, _ in got)


def test_bpe_train_on_sample_matches_full(spark):
    """VERDICT r6 #4: the documented scale posture is train-on-sample.
    BPE argmaxes are frequency RATIOS, so on a corpus whose docs are
    iid repeats a 50% Bernoulli sample learns the same ruleset (counts
    scale, order doesn't).  Ranks and symbols must match exactly; only
    the counts shrink."""
    from quacfka_service_spark.operators.vocab import bpe_train

    words = ["hug"] * 10 + ["pug"] * 5 + ["pun"] * 12 + ["bun"] * 4 + ["hugs"] * 5
    docs = spark.createDataFrame(
        [(i, " ".join(words)) for i in range(40)], "doc_id long, text string"
    )
    full = [
        (r.rank, r.left, r.right, r.merged)
        for r in bpe_train(docs, n_merges=6).orderBy("rank").collect()
    ]
    sampled = [
        (r.rank, r.left, r.right, r.merged)
        for r in bpe_train(docs, n_merges=6, sample_fraction=0.5, sample_seed=7)
        .orderBy("rank").collect()
    ]
    assert sampled == full


def test_bpe_train_batched_rounds(spark):
    """merges_per_round=k: same counting semantics, k-fold fewer jobs.
    k=1 is pinned exactly sequential elsewhere; here: the batched
    trainer still returns n_merges ranked rules, rule ranks are
    contiguous from 1, every batch pick is symbol-disjoint within its
    round (no rule's side is another same-round rule's side or merged
    output), and the top-1 rule matches the sequential trainer's."""
    from quacfka_service_spark.operators.vocab import bpe_train

    words = ["hug"] * 10 + ["pug"] * 5 + ["pun"] * 12 + ["bun"] * 4 + ["hugs"] * 5
    docs = spark.createDataFrame(
        [(i, " ".join(words)) for i in range(2)], "doc_id long, text string"
    )
    seq = bpe_train(docs, n_merges=6).orderBy("rank").collect()
    bat = bpe_train(docs, n_merges=6, merges_per_round=3).orderBy("rank").collect()
    assert len(bat) == 6
    assert [r.rank for r in bat] == list(range(1, 7))
    assert (bat[0].left, bat[0].right, bat[0].cnt) == (
        seq[0].left, seq[0].right, seq[0].cnt,
    )
    # each rule's merge really applied: later encoded corpus shrinks
    from quacfka_service_spark.operators.vocab import _bpe_loop

    _, enc = _bpe_loop(docs, 6, merges_per_round=3)
    import pyspark.sql.functions as F

    total = enc.agg(F.sum(F.size("syms") * F.col("freq"))).collect()[0][0]
    chars = enc.agg(F.sum(F.length("tok") * F.col("freq"))).collect()[0][0]
    assert total < chars


# --- BPE encode + Zipf coverage (round 3 batch 6) -------------------------

def _reference_encode(word_freqs: dict[str, int], n_merges: int):
    """Re-run _reference_bpe's loop keeping the final vocab: the
    encoded symbol count per distinct word."""
    vocab = {w: [c for c in w] for w in word_freqs}
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            f = word_freqs[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = counts.get((syms[i], syms[i + 1]), 0) + f
        if not counts:
            break
        (l, r), _c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        for w, syms in vocab.items():
            new, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    new.append(l + r)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            vocab[w] = new
    return {w: len(s) for w, s in vocab.items()}


def test_bpe_encode_matches_reference(spark):
    from quacfka_service_spark.operators.vocab import bpe_encode

    words = ["hug"] * 10 + ["pug"] * 5 + ["pun"] * 12 + ["bun"] * 4 + ["hugs"] * 5
    docs = spark.createDataFrame(
        [(0, " ".join(words)), (1, "hug bun")], "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_tokens, r.n_bpe_tokens)
           for r in bpe_encode(docs, n_merges=6).collect()}
    freqs: dict[str, int] = {}
    for w in words:
        freqs[w] = freqs.get(w, 0) + 1
    freqs["hug"] += 1
    freqs["bun"] += 1
    widths = _reference_encode(freqs, 6)
    assert got[0] == (len(words), sum(widths[w] for w in words))
    assert got[1] == (2, widths["hug"] + widths["bun"])
    # merges really shrink the doc: encoded length strictly under chars
    assert got[0][1] < sum(len(w) for w in words)


def test_token_coverage_hand_computed(spark):
    from quacfka_service_spark.operators.vocab import token_coverage

    # corpus: 'a' x 60, 'b' x 30, 'c' x 10  (total 100)
    text = " ".join(["a"] * 60 + ["b"] * 30 + ["c"] * 10)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {r.pct: (r.vocab_size, r.cum_tokens) for r in token_coverage(docs).collect()}
    # thresholds k*10: vocab {a} covers 60 (pct<=60), {a,b} covers 90,
    # {a,b,c} covers 100
    for pct in (10, 20, 30, 40, 50, 60):
        assert got[pct] == (1, 60), pct
    for pct in (70, 80, 90):
        assert got[pct] == (2, 90), pct


def test_token_coverage_partial_class_split(spark):
    from quacfka_service_spark.operators.vocab import token_coverage

    # four tokens each tf=5 (one freq class, mass 20): 30% needs
    # ceil(6/5)=2 tokens of the class, 50% needs 2 (mass 10), 60% ->3
    text = " ".join(["a"] * 5 + ["b"] * 5 + ["c"] * 5 + ["d"] * 5)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {r.pct: (r.vocab_size, r.cum_tokens) for r in token_coverage(docs).collect()}
    assert got[30] == (2, 10)
    assert got[50] == (2, 10)
    assert got[60] == (3, 15)
    assert got[90] == (4, 20)
