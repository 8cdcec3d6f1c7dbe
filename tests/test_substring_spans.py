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


def test_doc_stats_interval_union_no_double_count(spark):
    """X86: a doc sharing OVERLAPPING spans with two partners counts
    each covered token once (interval union, not span-length sum), and
    the drop/trim policy fires on the union fraction."""
    from spark_ml_showcase_spark.operators.dedup import (
        substring_dup_doc_stats,
    )

    shared = _words("s", 20)
    # doc 1: 5 unique + 20 shared + 15 unique = 40 tokens
    # doc 2 shares tokens s0..s19 (doc-1 cover [6, 25])
    # doc 3 shares tokens s5..s19 (doc-1 cover [11, 25] ⊂ previous!)
    d1 = _words("a", 5) + shared + _words("z", 15)
    d2 = _words("b", 3) + shared + _words("y", 3)
    d3 = _words("c", 8) + shared[5:] + _words("x", 4)
    df = spark.createDataFrame(
        [(1, " ".join(d1)), (2, " ".join(d2)), (3, " ".join(d3))],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: r
        for r in substring_dup_doc_stats(
            df, span_tokens=8, max_gram_occurrences=200
        ).collect()
    }
    # doc 1: union of [6,25] (vs 2) and [11,25] (vs 3) = 20 tokens of 40
    assert got[1].n_tokens == 40
    assert got[1].dup_tokens == 20
    assert got[1].dup_frac == 0.5
    assert got[1].policy == "drop"
    # doc 2: 20 of 26 covered (vs 1) ∪ 15 (vs 3) ⊂ the 20 → 20/26
    assert got[2].dup_tokens == 20
    assert got[2].policy == "drop"
    # doc 3: 15 of 27 covered = 0.5556 ≥ 0.5 → drop
    assert got[3].dup_tokens == 15
    assert got[3].n_tokens == 27
    assert got[3].policy == "drop"


def test_doc_stats_disjoint_spans_sum(spark):
    """Disjoint spans add up; a clean doc emits no row at all."""
    from spark_ml_showcase_spark.operators.dedup import (
        substring_dup_doc_stats,
    )

    s1, s2 = _words("p", 10), _words("q", 10)
    a = s1 + _words("m", 10) + s2          # 30 tokens, 20 covered
    b = s1 + _words("n", 15)               # 25 tokens, 10 covered
    c = _words("o", 12) + s2               # 22 tokens, 10 covered
    clean = _words("w", 30)
    df = spark.createDataFrame(
        [(1, " ".join(a)), (2, " ".join(b)), (3, " ".join(c)),
         (4, " ".join(clean))],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: r
        for r in substring_dup_doc_stats(
            df, span_tokens=6, max_gram_occurrences=200
        ).collect()
    }
    assert 4 not in got
    assert (got[1].dup_tokens, got[1].n_tokens) == (20, 30)
    assert got[1].policy == "drop"
    assert (got[2].dup_tokens, got[2].policy) == (10, "trim")
    assert (got[3].dup_tokens, got[3].policy) == (10, "trim")


def test_dedup_apply_trims_exact_tokens(spark):
    """X87: trim cuts exactly the island tokens (1-based positions),
    drop nulls the text, and light overlap passes through normalized."""
    from spark_ml_showcase_spark.operators.dedup import (
        substring_dedup_apply,
    )

    shared = _words("s", 10)
    d1 = _words("a", 20) + shared + _words("z", 10)   # 40 toks, 10 cov = trim
    d2 = _words("b", 2) + shared                      # 12 toks, 10 cov = drop
    d3 = _words("c", 50) + shared                     # 60 toks, 10 cov < 0.2 = keep
    df = spark.createDataFrame(
        [(1, " ".join(d1)), (2, "  " + "  ".join(d2)), (3, " ".join(d3))],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: r
        for r in substring_dedup_apply(
            df, span_tokens=6, max_gram_occurrences=200, trim_frac=0.2
        ).collect()
    }
    assert got[1].policy == "trim"
    assert got[1].n_kept == 30
    assert got[1].text_out == " ".join(_words("a", 20) + _words("z", 10))
    assert got[2].policy == "drop"
    assert got[2].n_kept == 0 and got[2].text_out is None
    assert got[3].policy == "keep"
    # keep passes through whitespace-NORMALIZED original tokens
    assert got[3].text_out == " ".join(d3)
