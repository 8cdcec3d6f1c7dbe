"""Exact substring-level dedup (Lee et al. 2022 family,
operators/dedup.substring_dup_spans): planted-overlap exactness — span
boundaries and lengths are asserted EXACTLY, the guarantee the DuckDB
oracle checks on the fixture corpus, probed here on crafted shapes the
fixture doesn't contain (split spans, repeated grams, hot-gram guard)."""

from __future__ import annotations

from spark_ml_showcase_spark.operators.dedup import substring_dup_spans


def _words(prefix: str, n: int) -> list[str]:
    return [f"{prefix}{i}" for i in range(n)]


def _run(spark, docs: dict[int, str], span: int, max_occ: int = 200):
    df = spark.createDataFrame(
        list(docs.items()), "doc_id bigint, text string"
    )
    rows = substring_dup_spans(
        df, span_tokens=span, max_gram_occurrences=max_occ
    ).collect()
    return sorted(
        (r.id_a, r.id_b, r.start_a, r.start_b, r.span_len) for r in rows
    )


def test_single_planted_span_exact_bounds(spark):
    shared = _words("s", 12)
    a = _words("a", 5) + shared + _words("x", 3)
    b = _words("b", 9) + shared + _words("y", 2)
    docs = {1: " ".join(a), 2: " ".join(b)}
    # span 8 < 12 shared tokens: one maximal span, 1-based starts
    assert _run(spark, docs, span=8) == [(1, 2, 6, 10, 12)]
    # span longer than the overlap: nothing
    assert _run(spark, docs, span=13) == []


def test_two_disjoint_spans_do_not_merge(spark):
    s1, s2 = _words("p", 10), _words("q", 10)
    a = s1 + _words("m", 4) + s2
    b = s2 + _words("n", 6) + s1
    docs = {1: " ".join(a), 2: " ".join(b)}
    got = _run(spark, docs, span=6)
    # two separate diagonals -> two maximal spans, each exactly 10 long
    assert got == [(1, 2, 1, 17, 10), (1, 2, 15, 1, 10)]


def test_full_doc_duplicate_is_one_full_span(spark):
    t = " ".join(_words("w", 40))
    docs = {7: t, 9: t}
    assert _run(spark, docs, span=30) == [(7, 9, 1, 1, 40)]


def test_hot_gram_guard_drops_popular_spans(spark):
    shared = _words("h", 10)
    docs = {
        i: " ".join(_words(f"u{i}_", 3) + shared + _words(f"v{i}_", 3))
        for i in range(30)
    }
    # every pair shares the 10-token run; guard at 5 occurrences kills
    # the shared grams entirely (30 occurrences each), guard at 200
    # keeps all C(30,2) pairs
    assert _run(spark, docs, span=8, max_occ=5) == []
    assert len(_run(spark, docs, span=8, max_occ=200)) == 30 * 29 // 2


def test_self_repeat_within_one_doc_is_not_a_pair(spark):
    rep = _words("r", 10)
    docs = {1: " ".join(rep + _words("z", 5) + rep)}
    assert _run(spark, docs, span=6) == []
