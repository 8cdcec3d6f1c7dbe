"""Python user-defined TABLE functions (PySpark 4 ``@udtf`` API).

The remaining Python extension surface the engine had not exercised:
scalar/grouped/map UDFs (pandas_udf, applyInPandas, mapInPandas) and the
Python DataSource triad are covered elsewhere; a UDTF is the row →
MANY-rows form — SQL ``LATERAL`` joins against Python logic. The
flagship here is a document chunker whose output is pinned bit-for-bit
against the native column-expression chunker
(``operators/chunking.chunk_documents``), so the UDTF surface is proven
against an oracle-checked twin rather than trusted on its own.

When to use which (the engine's guidance, measured in round 4's gram
bench): the JVM column-expression chunker is the 100 TB default — pure
codegen, zero Python. The UDTF form exists for logic that CANNOT be a
column expression (per-row recursion, external library calls per
element) and for SQL-surface ergonomics (``LATERAL chunk(text, 64,
8)``). Same contract either way, so pipelines can swap forms without
changing results.

Scale posture: a UDTF runs one Python worker per task like any Python
UDF — narrow, no shuffle, Arrow-batched when
``spark.sql.execution.pythonUDTF.arrow.enabled`` is set (on in
``session.py``). The chunker emits O(tokens/stride) rows per doc and
never holds more than one document's tokens.
"""

from __future__ import annotations

import math


def make_chunk_udtf():
    """Build the chunking UDTF class (deferred so importing this module
    never needs an active session). Register with
    ``spark.udtf.register("chunk_text", make_chunk_udtf())`` and use as
    ``SELECT d.doc_id, c.* FROM docs d, LATERAL chunk_text(d.text, 64, 8) c``.

    Contract (identical to ``chunking.chunk_documents``, pinned by
    ``tests/test_profile_blocklist_udtf.py``): whitespace-token windows of ``max_tokens``
    advancing by ``max_tokens - overlap``; final chunk short, not
    padded; zero-token docs emit no rows.
    """
    from pyspark.sql.functions import udtf

    from spark_ml_showcase_spark.functions.text import _ASCII_WS

    @udtf(returnType="chunk_id int, chunk_text string, n_tokens int")
    class ChunkText:
        def eval(self, text: str, max_tokens: int, overlap: int):
            if max_tokens is None or overlap is None or overlap >= max_tokens:
                raise ValueError(
                    f"overlap ({overlap}) must be < max_tokens ({max_tokens})"
                )
            toks = [t for t in _ASCII_WS.split(text or "") if t]
            n = len(toks)
            if n == 0:
                return
            stride = max_tokens - overlap
            n_chunks = max(math.ceil((n - overlap) / stride), 1)
            for i in range(n_chunks):
                window = toks[i * stride : i * stride + max_tokens]
                yield i, " ".join(window), len(window)

    return ChunkText
