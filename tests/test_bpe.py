"""BPE merge learning pinned against a pure-Python reference
implementation of Sennrich-style BPE (same tie-break: freq desc, then
(left, right) ascending)."""

from __future__ import annotations

from collections import Counter

from spark_ml_showcase_spark.operators.bpe import learn_bpe_merges


def _reference_bpe(texts: list[str], n_merges: int):
    vocab = Counter()
    for t in texts:
        for w in t.lower().split():
            vocab[tuple(w)] += 1
    rules = []
    for rank in range(1, n_merges + 1):
        pairs = Counter()
        for syms, freq in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        (left, right), freq = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merged = left + right
        new_vocab = Counter()
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += f
        vocab = new_vocab
        rules.append((rank, left, right, merged, freq))
    return rules


TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest new low",
    "the newest lowest widest the the",
]


def test_learned_merges_match_reference(spark):
    docs = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = [
        (r.rank, r.left, r.right, r.merged, r.freq)
        for r in learn_bpe_merges(docs, n_merges=6)
        .orderBy("rank")
        .collect()
    ]
    assert got == _reference_bpe(TEXTS, 6)
    assert len(got) == 6


def test_merge_consumes_pair_greedily_left_to_right(spark):
    # "aaa" (corpus freq 2) with merge (a,a): the word contributes TWO
    # overlapping (a,a) pair positions x freq 2 = 4; greedy
    # left-to-right application yields [aa, a], so round 2 sees
    # (aa, a) x freq 2 — matching reference BPE exactly
    docs = spark.createDataFrame([("aaa aaa",)], "text string")
    got = [
        (r.left, r.right, r.freq)
        for r in learn_bpe_merges(docs, n_merges=2)
        .orderBy("rank")
        .collect()
    ]
    assert got == [("a", "a", 4), ("aa", "a", 2)]


def test_exhausted_corpus_stops_early(spark):
    # single-char words have no pairs: zero rules, no crash
    docs = spark.createDataFrame([("a b c",)], "text string")
    assert learn_bpe_merges(docs, n_merges=3).count() == 0


def _reference_encode(texts: list[str], rules):
    total_tokens = 0
    total_words = 0
    for t in texts:
        for w in t.lower().split():
            total_words += 1
            syms = list(w)
            for _, left, right, merged, _f in rules:
                out, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == left
                        and syms[i + 1] == right
                    ):
                        out.append(merged)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            total_tokens += len(syms)
    return total_words, total_tokens


def test_encode_token_counts_match_reference(spark):
    from spark_ml_showcase_spark.operators.bpe import encode_token_counts

    rules = _reference_bpe(TEXTS, 5)
    docs = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = (
        encode_token_counts(docs, [(r[1], r[2]) for r in rules])
        .agg({"n_words": "sum", "n_tokens": "sum"})
        .collect()[0]
    )
    want_words, want_tokens = _reference_encode(TEXTS, rules)
    assert got["sum(n_words)"] == want_words
    assert got["sum(n_tokens)"] == want_tokens
    # merges actually compress: tokens < raw characters
    assert want_tokens < sum(len(w) for t in TEXTS for w in t.split())
