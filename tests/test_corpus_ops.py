"""Corpus-assembly operator properties (SURVEY.md §2.12 extension
family): benchmark decontamination, Gopher repetition flags, portable
stratified sampling, greedy sequence packing."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from spark_ml_showcase_spark.operators import chunking, decontaminate, quality
from spark_ml_showcase_spark.operators.splits import portable_sample_by


def _docs(spark):
    base = [
        (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  # = 0
        (2, "alpha beta gamma delta epsilon nine ten eleven twelve thirteen"),  # 5-gram overlap w/ 0
        (3, "one two three four five six seven eight nine ten"),
        (4, "spam spam spam spam spam spam spam spam spam ham"),  # degenerate repetition
        (5, "tiny doc"),  # < n tokens: never contaminated
    ]
    return spark.createDataFrame(base, "doc_id bigint, text string")


def test_decontaminate_flags_overlap_and_skips_short(spark):
    docs = _docs(spark)
    bench = docs.filter(F.col("doc_id") == 0)
    corpus = docs.filter(F.col("doc_id") != 0)
    clean, hits = decontaminate.ngram_decontaminate(corpus, bench, n=5)
    got = {r.doc_id: r.n_contaminated_ngrams for r in hits.collect()}
    # doc 1 is identical to the benchmark doc: all 6 of its distinct
    # 5-grams hit; doc 2 shares exactly the first 5-gram
    assert got == {1: 6, 2: 1}
    assert {r.doc_id for r in clean.select("doc_id").collect()} == {3, 4, 5}


def test_decontaminate_clean_plus_hits_partition_corpus(spark):
    docs = _docs(spark)
    bench = docs.filter(F.col("doc_id") % 3 == 0)
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    clean, hits = decontaminate.ngram_decontaminate(corpus, bench, n=5)
    assert clean.count() + hits.count() == corpus.count()
    assert clean.join(hits, "doc_id").count() == 0


def test_repetition_metrics_flags_degenerate_doc(spark):
    out = quality.repetition_metrics(_docs(spark))
    rows = {r.doc_id: r for r in out.collect()}
    # doc 4: "spam" is 9/10 unigrams, "spam spam" is 8/9 bigrams
    assert rows[4].top_unigram_frac == 0.9
    assert rows[4].top_bigram_frac == round(8 / 9, 6)
    assert not rows[4].keep
    # doc 3: all tokens distinct → minimal fractions, kept
    assert rows[3].top_unigram_frac == 0.1
    assert rows[3].keep
    # mean word length exact: doc 3 tokens sum 39 chars / 10 tokens
    assert rows[3].mean_word_len == 3.9


def test_repetition_metrics_single_token_doc_has_zero_bigram_frac(spark):
    df = spark.createDataFrame([(0, "solo")], "doc_id bigint, text string")
    row = quality.repetition_metrics(df).collect()[0]
    assert row.top_bigram_frac == 0.0
    assert row.top_unigram_frac == 1.0


def test_portable_sample_by_matches_md5_threshold_and_is_stable(spark):
    df = spark.range(0, 2000).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("string").alias("g"),
    )
    fr = {"0": 0.75, "1": 0.5, "2": 0.0}
    out = portable_sample_by(df, "g", "k", fr, default=0.25)
    got = {(r.k, r.g) for r in out.collect()}
    # exact membership reproduced in pure Python from the same formula
    want = set()
    for k in range(2000):
        g = str(k % 4)
        frac = fr.get(g, 0.25)
        h = hashlib.md5(str(k).encode()).hexdigest()[:8]
        if h < format(int(frac * 2**32), "08x"):
            want.add((k, g))
    assert got == want
    # stability under repartitioning
    got2 = {
        (r.k, r.g)
        for r in portable_sample_by(df.repartition(13, "g"), "g", "k", fr, 0.25).collect()
    }
    assert got2 == got
    # rate sanity: stratum 2 empty, stratum 0 ≈ 75%
    n0 = sum(1 for k, g in got if g == "0")
    assert not any(g == "2" for _, g in got)
    assert 0.65 < n0 / 500 < 0.85


def test_portable_sample_by_keep_all_fraction(spark):
    df = spark.range(0, 50).select(
        F.col("id").alias("k"), F.lit("a").alias("g")
    )
    assert portable_sample_by(df, "g", "k", {"a": 1.0}).count() == 50


def _chunks(spark):
    # (shard, doc_id, chunk_id, n_tokens) — two shards, mixed sizes
    rows = [
        (0, 1, 0, 100), (0, 1, 1, 100), (0, 2, 0, 90),   # 100+100 pack, 90 next
        (0, 3, 0, 300),                                   # oversize: own seq
        (1, 4, 0, 128), (1, 4, 1, 128), (1, 5, 0, 1),     # exactly fills 256
    ]
    return spark.createDataFrame(
        rows, "shard int, doc_id bigint, chunk_id bigint, n_tokens bigint"
    )


def test_pack_sequences_invariants(spark):
    chunks = _chunks(spark)
    packed = chunking.pack_sequences(chunks, max_tokens=256).cache()
    # every chunk appears exactly once
    assert packed.count() == chunks.count()
    assert packed.select("doc_id", "chunk_id").distinct().count() == chunks.count()
    # no multi-chunk sequence exceeds the budget; oversize chunks isolated
    seqs = (
        packed.groupBy("shard", "seq_id")
        .agg(F.sum("n_tokens").alias("t"), F.count("*").alias("c"))
        .collect()
    )
    for r in seqs:
        assert r.t <= 256 or r.c == 1
    # offsets are contiguous within a sequence (0, then cumulative)
    rows = sorted(
        packed.collect(), key=lambda r: (r.shard, r.seq_id, r.doc_id, r.chunk_id)
    )
    fill = {}
    for r in rows:
        key = (r.shard, r.seq_id)
        assert r.seq_offset == fill.get(key, 0)
        fill[key] = r.seq_offset + r.n_tokens


def test_pack_sequences_greedy_boundaries(spark):
    packed = chunking.pack_sequences(_chunks(spark), max_tokens=256)
    got = {
        (r.shard, r.doc_id, r.chunk_id): (r.seq_id, r.seq_offset)
        for r in packed.collect()
    }
    assert got[(0, 1, 0)] == (0, 0)
    assert got[(0, 1, 1)] == (0, 100)
    assert got[(0, 2, 0)] == (1, 0)    # 200+90 > 256 → new sequence
    assert got[(0, 3, 0)] == (2, 0)    # oversize chunk: own sequence
    assert got[(1, 4, 0)] == (0, 0)
    assert got[(1, 4, 1)] == (0, 128)
    assert got[(1, 5, 0)] == (1, 0)    # 256+1 overflows → new sequence


def _emb_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_embedding_decontaminate_flags_cosine_matches(spark):
    # corpus 1 is an exact copy of bench 100; corpus 2 is a scaled copy
    # of bench 101 (cosine 1.0); corpus 3 is orthogonal to everything.
    corpus = _emb_df(
        spark,
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.0, 2.0, 0.0]),
            (3, [0.0, 0.0, 1.0]),
        ],
    )
    bench = _emb_df(spark, [(100, [1.0, 0.0, 0.0]), (101, [0.0, 5.0, 0.0])])
    clean, hits = decontaminate.embedding_decontaminate(
        corpus, bench, threshold=0.9
    )
    got = {
        r["vec_id"]: (r["max_cosine"], r["nearest_bench_id"])
        for r in hits.collect()
    }
    assert got == {1: (1.0, 100), 2: (1.0, 101)}
    assert [r["vec_id"] for r in clean.collect()] == [3]


def test_embedding_decontaminate_tie_prefers_smallest_bench_id(spark):
    corpus = _emb_df(spark, [(1, [1.0, 0.0])])
    bench = _emb_df(
        spark, [(200, [2.0, 0.0]), (100, [3.0, 0.0]), (300, [1.0, 0.0])]
    )
    _, hits = decontaminate.embedding_decontaminate(
        corpus, bench, threshold=0.5
    )
    assert hits.first()["nearest_bench_id"] == 100


def test_embedding_decontaminate_string_bench_ids(spark):
    """ADVICE r7: the tie-break must not assume integer bench ids — a
    string-keyed benchmark (eval-set names) attributes correctly, with
    the lexicographically smallest name winning ties."""
    corpus = _emb_df(spark, [(1, [1.0, 0.0])])
    bench = spark.createDataFrame(
        [("mmlu", [2.0, 0.0]), ("gsm8k", [3.0, 0.0]), ("zz", [0.0, 1.0])],
        "bench_name string, embedding array<double>",
    )
    _, hits = decontaminate.embedding_decontaminate(
        corpus, bench, threshold=0.5,
        bench_id_col="bench_name",
    )
    row = hits.first()
    assert row["nearest_bench_id"] == "gsm8k"
    assert row["max_cosine"] == 1.0


def test_embedding_decontaminate_below_threshold_all_clean(spark):
    corpus = _emb_df(spark, [(1, [1.0, 0.0])])
    bench = _emb_df(spark, [(100, [0.0, 1.0])])
    clean, hits = decontaminate.embedding_decontaminate(
        corpus, bench, threshold=0.5
    )
    assert hits.count() == 0 and clean.count() == 1
