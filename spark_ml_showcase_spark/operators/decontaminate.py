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
