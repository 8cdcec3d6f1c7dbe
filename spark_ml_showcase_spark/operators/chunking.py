"""Document chunking for LLM training-data pipelines (SURVEY.md §2.12
extension family): split long documents into overlapping token-window
chunks, then assign chunks to output shards.

Not in the reference (its text handling is line-oriented log mining,
``log_mining_analysis.py``); this is the standard pre-tokenization step
between corpus cleaning (dedup/quality, ``operators/dedup.py`` /
``functions/text.py``) and training-shard writing.

Scale posture: chunk boundaries are pure per-row column expressions
(tokens → start offsets → slices) followed by ONE ``posexplode`` — a
narrow plan with no shuffle at all until the caller aggregates or
writes. Shard assignment is a hash of (doc, chunk) — deterministic,
partitioning-independent, and uniform without any global coordination
(a greedy bin-packer would serialize on the driver; at 100 TB uniform
hashing is the answer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_ml_showcase_spark.functions.text import _tokens


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    max_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """One row per (document, chunk): whitespace-token windows of
    ``max_tokens`` advancing by ``max_tokens - overlap``, so consecutive
    chunks share ``overlap`` tokens (context continuity across chunk
    boundaries). The final chunk is short rather than padded; documents
    with zero tokens produce no chunks.

    Returns (id, chunk_id, chunk_text, n_tokens) with chunk_id counting
    from 0 in document order — fully deterministic, so the query built on
    this is DuckDB-oracle-checked.
    """
    if overlap >= max_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be < max_tokens ({max_tokens})"
        )
    stride = max_tokens - overlap
    # no normalization: chunking must preserve the text verbatim (only
    # whitespace runs collapse, since tokens rejoin with single spaces)
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    # windows needed to cover all tokens: ceil((n - overlap) / stride),
    # min 1 — each new window contributes `stride` fresh tokens after the
    # first. Guarded behind n > 0 so sequence() never descends.
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int"), F.lit(1)
    )
    chunks = F.when(n <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda j: F.concat_ws(
                " ", F.slice(toks, j * stride + 1, max_tokens)
            ),
        )
    )
    return (
        df.select(F.col(id_col).alias("_id"), F.posexplode(chunks))
        .select(
            F.col("_id").alias(id_col),
            F.col("pos").cast("bigint").alias("chunk_id"),
            F.col("col").alias("chunk_text"),
        )
        .withColumn("n_tokens", F.size(F.split("chunk_text", " ")).cast("bigint"))
    )


def assign_shards(
    chunks: DataFrame,
    n_shards: int,
    *,
    id_cols: list[str] = ("doc_id", "chunk_id"),
    seed: int = 40,
) -> DataFrame:
    """Deterministic uniform shard assignment:
    ``xxhash64(id_cols, seed) mod n_shards``. Same chunk → same shard on
    any cluster layout; write with ``partitionBy('shard')`` (or
    ``repartition('shard')`` first for one file per shard)."""
    h = F.xxhash64(*[F.col(c) for c in id_cols], F.lit(seed))
    return chunks.withColumn(
        "shard", F.pmod(h, F.lit(n_shards)).cast("int")
    )


def pack_sequences(
    chunks: DataFrame,
    *,
    max_tokens: int = 256,
    group_col: str = "shard",
    order_cols: list[str] = ("doc_id", "chunk_id"),
    token_col: str = "n_tokens",
) -> DataFrame:
    """Greedy sequence packing: within each ``group_col`` partition,
    walk chunks in ``order_cols`` order and accumulate them into training
    sequences of at most ``max_tokens`` tokens, opening a new sequence
    whenever the next chunk would overflow (first-fit in fixed order; a
    chunk longer than ``max_tokens`` gets a sequence of its own). This is
    the padding-minimization step between chunking/sharding and training-
    shard writing.

    Returns one row per input chunk:
    ``(group_col, seq_id, seq_offset, *order_cols, token_col)`` where
    ``seq_id`` numbers sequences from 0 within the group and
    ``seq_offset`` is the chunk's token start position in its sequence.

    Greedy packing is inherently sequential IN ORDER, so it runs per
    group via ``applyInPandas`` — deterministic given the (deterministic,
    hash-assigned) groups, independent of input partitioning. Scale
    posture: one shuffle on ``group_col`` (the same exchange the shard
    write needs anyway); each group is one training shard, sized by the
    sharding step to fit an executor; inside the UDF the packing is a
    numpy cumsum + ``searchsorted`` that emits one whole SEQUENCE per
    Python-loop step (not one row), so interpreter time is
    O(n_sequences), ~``max_tokens``/mean-chunk-size times fewer
    iterations than a per-row walk. An exact SQL formulation needs a
    recursive/iterative construct (the running total RESETS at pack
    boundaries — not a window cumsum), hence no DuckDB oracle; invariants
    are property-tested instead (tests/test_corpus_ops.py).

    Output column types for ``group_col``/``order_cols``/``token_col``
    are taken from the input schema, so string ids / int shards both
    work; ``seq_id``/``seq_offset`` are always bigint.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as ST

    order = list(order_cols)
    in_fields = {f.name: f.dataType for f in chunks.schema.fields}
    out_schema = ST.StructType(
        [
            ST.StructField(group_col, in_fields[group_col]),
            ST.StructField("seq_id", ST.LongType()),
            ST.StructField("seq_offset", ST.LongType()),
            *[ST.StructField(c, in_fields[c]) for c in order],
            ST.StructField(token_col, in_fields[token_col]),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        toks = pdf[token_col].to_numpy(dtype=np.int64)
        cs = np.cumsum(toks)
        n = len(toks)
        seq_ids = np.empty(n, dtype=np.int64)
        offsets = np.empty(n, dtype=np.int64)
        i, sid, base = 0, 0, 0
        while i < n:
            # longest prefix starting at i whose total fits max_tokens;
            # an oversized chunk (j == i) gets a sequence of its own
            j = int(np.searchsorted(cs, base + max_tokens, side="right"))
            j = max(j, i + 1)
            seq_ids[i:j] = sid
            offsets[i:j] = cs[i:j] - toks[i:j] - base
            sid += 1
            i = j
            base = int(cs[i - 1])
        pdf["seq_id"] = seq_ids
        pdf["seq_offset"] = offsets
        return pdf[[group_col, "seq_id", "seq_offset", *order, token_col]]

    return (
        chunks.select(group_col, *order, token_col)
        .groupBy(group_col)
        .applyInPandas(pack, schema=out_schema)
    )
