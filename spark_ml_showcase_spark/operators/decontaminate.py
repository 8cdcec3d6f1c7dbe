"""Benchmark decontamination for LLM training corpora (SURVEY.md §2.12
extension family): drop training documents that share word n-grams with a
held-out evaluation/benchmark set, so eval scores measure generalization
rather than memorization.

Not in the reference (its text handling is line-oriented log mining,
``Log Analysis/log_mining_analysis.py``); this is the standard
contamination check of web-scale pipelines (GPT-3 App. C / PaLM-style
13-gram overlap, here parameterized).

Scale posture: the benchmark side (eval sets — thousands of documents)
is distinct-reduced and **broadcast**, so the 100-TB corpus side streams
through a broadcast hash join with NO shuffle of document text. Shingles
are compared as ``xxhash64`` longs — the broadcast table and the join
keys are fixed-width 8-byte values, never strings. The only exchange is
the final per-doc hit count, keyed by the document id (map-side partial
aggregation applies). A 64-bit collision marks a clean doc contaminated
with p ≈ n_bench_shingles · 2^-64 per shingle — acceptable for a filter
whose false-positive cost is dropping one training doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_ml_showcase_spark.functions import text as TX


def ngram_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Split ``docs`` into (clean, contaminated) by distinct word-n-gram
    overlap with ``benchmark``.

    Returns ``(clean, hits)``: ``clean`` is ``docs`` minus every document
    sharing ≥ 1 n-gram with the benchmark (left-anti join); ``hits`` is
    one row per contaminated document —
    ``(id_col, n_contaminated_ngrams)`` where the count is the number of
    DISTINCT n-grams of the document that appear anywhere in the
    benchmark (shingles are per-doc distinct on both sides).

    Tokenization is lowercased whitespace splitting (``TX.shingles``);
    documents shorter than ``n`` tokens have no shingles and are always
    clean.
    """
    bench_col = bench_text_col or text_col
    # Arrow-batched gram arrays (same strings as TX.shingles → same
    # xxhash64 keys); the HOF column form is measured 5-10× slower on
    # per-gram work (operators/quality.py docstring)
    doc_sh = docs.select(
        F.col(id_col),
        F.explode(TX.shingle_array_udf(n)(F.col(text_col))).alias("_sh"),
    ).select(id_col, F.xxhash64("_sh").alias("_h"))
    bench_sh = (
        benchmark.select(
            F.explode(TX.shingle_array_udf(n)(F.col(bench_col))).alias("_sh")
        )
        .select(F.xxhash64("_sh").alias("_h"))
        .distinct()
    )
    hits = (
        doc_sh.join(F.broadcast(bench_sh), "_h")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated_ngrams"))
    )
    clean = docs.join(hits, id_col, "left_anti")
    return clean, hits


def embedding_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_id_col: str | None = None,
    bench_vec_col: str | None = None,
    score_decimals: int = 6,
) -> tuple[DataFrame, DataFrame]:
    """Semantic (embedding-space) decontamination: drop corpus items
    whose max cosine similarity against ANY benchmark embedding reaches
    ``threshold`` — the paraphrase-robust companion to
    :func:`ngram_decontaminate` (n-gram overlap misses reworded eval
    items; embedding cosine does not).

    Returns ``(clean, hits)``: ``hits`` is one row per contaminated
    corpus item — ``(id_col, max_cosine, nearest_bench_id)``, max
    cosine ROUNDED to ``score_decimals`` with a bench-id tie-break so
    the nearest attribution is deterministic under float ulp drift.

    Scale posture: same asymmetry as the n-gram variant — the benchmark
    side (thousands of eval vectors) is **broadcast**; the 100-TB corpus
    side streams once through a broadcast nested-loop scoring pass and
    reduces per corpus id with map-side partial max (the shuffle carries
    (id, best-score, best-bench-id) triples, never vectors). For
    benchmark sets too big to score densely, pre-bucket both sides with
    ``similarity.lsh_bucket`` and score per bucket.
    """
    from spark_ml_showcase_spark.functions import similarity as S
    from spark_ml_showcase_spark.functions import vectors as V

    b_id = bench_id_col or id_col
    b_vec = bench_vec_col or vec_col
    # norms are per-ROW, so compute them once on each side BEFORE the
    # pairwise pass — the per-pair work is then a single dot product
    # (one array scan) instead of the fused 3-component cosine (~3×)
    c = corpus.select(
        F.col(id_col), S.as_double(vec_col).alias("_cv")
    ).withColumn("_cn", V.norm("_cv"))
    b = benchmark.select(
        F.col(b_id).alias("_bench_id"), S.as_double(b_vec).alias("_bv")
    ).withColumn("_bn", V.norm("_bv"))
    scored = c.crossJoin(F.broadcast(b)).select(
        id_col,
        "_bench_id",
        F.round(
            V.dot("_cv", "_bv") / (F.col("_cn") * F.col("_bn")),
            score_decimals,
        ).alias("_cos"),
    )
    best = (
        scored.groupBy(id_col)
        .agg(
            F.max("_cos").alias("max_cosine"),
            # argmin over (-cos, bench_id): largest cosine, then the
            # SMALLEST bench id on ties. Only the numeric cosine is
            # negated — the id rides untouched, so string / any
            # orderable id types work and no truncating cast is needed
            # (ADVICE r7: the old neg-then-cast-bigint tie-break failed
            # string ids at analysis time and truncated fractional ones)
            F.min_by(
                "_bench_id",
                F.struct(
                    (-F.col("_cos")).alias("nc"),
                    F.col("_bench_id").alias("i"),
                ),
            ).alias("nearest_bench_id"),
        )
    )
    hits = best.filter(F.col("max_cosine") >= threshold)
    clean = corpus.join(hits.select(id_col), id_col, "left_anti")
    return clean, hits
