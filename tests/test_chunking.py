"""Chunking invariants: coverage (every token appears), overlap
continuity, short-doc/empty-doc edges, deterministic shard assignment."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_ml_showcase_spark.operators import chunking


def _docs(spark):
    texts = [
        (0, " ".join(f"t{i}" for i in range(130))),  # 3 chunks at 64/8
        (1, " ".join(f"t{i}" for i in range(64))),   # exactly one window
        (2, "short doc"),
        (3, ""),
        (4, "   \t  "),
    ]
    return spark.createDataFrame(texts, "doc_id bigint, text string")


def test_chunk_boundaries_and_overlap(spark):
    out = chunking.chunk_documents(_docs(spark), max_tokens=64, overlap=8)
    rows = {(r.doc_id, r.chunk_id): r for r in out.collect()}
    # doc 0: 130 tokens -> ceil((130-8)/56) = 3 chunks
    assert {cid for d, cid in rows if d == 0} == {0, 1, 2}
    c0, c1, c2 = (rows[(0, i)] for i in range(3))
    assert c0.n_tokens == 64 and c1.n_tokens == 64
    assert c2.n_tokens == 130 - 2 * 56  # tail chunk short, not padded
    # overlap continuity: last 8 tokens of chunk j = first 8 of chunk j+1
    assert c0.chunk_text.split()[-8:] == c1.chunk_text.split()[:8]
    assert c1.chunk_text.split()[-8:] == c2.chunk_text.split()[:8]
    # every token covered, in order
    assert c0.chunk_text.split()[0] == "t0"
    assert c2.chunk_text.split()[-1] == "t129"
    # single-window and sub-window docs
    assert rows[(1, 0)].n_tokens == 64 and (1, 1) not in rows
    assert rows[(2, 0)].chunk_text == "short doc"
    # empty/blank docs chunk to nothing
    assert not any(d in (3, 4) for d, _ in rows)


def test_chunk_rejects_bad_overlap(spark):
    import pytest

    with pytest.raises(ValueError):
        chunking.chunk_documents(_docs(spark), max_tokens=8, overlap=8)


def test_shard_assignment_uniform_and_stable(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(100))) for i in range(50)],
        "doc_id bigint, text string",
    )
    chunks = chunking.chunk_documents(docs, max_tokens=32, overlap=4)
    sharded = chunking.assign_shards(chunks, 8)
    per = {r.shard: r.n for r in sharded.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(per) == set(range(8))  # all shards populated
    # stability under repartitioning
    again = chunking.assign_shards(chunks.repartition(7), 8)
    a = {(r.doc_id, r.chunk_id): r.shard for r in sharded.collect()}
    b = {(r.doc_id, r.chunk_id): r.shard for r in again.collect()}
    assert a == b
