"""Multimodal column plumbing (SURVEY.md §2.12 X5): image/audio/video as
opaque ``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` stages.

The decode libraries (PIL/librosa/ffmpeg) are NOT in this container, so the
actual byte→pixels/samples step is stubbed: ``decode_stub=True`` (default)
derives deterministic fake features from the bytes; ``decode_stub=False``
raises ``NotImplementedError`` at the exact call site a real decoder would
plug into. Everything Spark-side — schemas, partition sizing, the
mapInPandas batch contract, column pruning before the UDF — is real and
tested.

Scale posture: binary payloads dominate row width, so (a) prune to
(id, payload) BEFORE entering Python — Arrow ships only what the UDF
reads; (b) keep ``spark.sql.execution.arrow.maxRecordsPerBatch`` modest
(default 10k) so a batch of multi-MB blobs fits executor memory;
(c) repartition by id range first if blob sizes are skewed.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "id bigint, n_bytes bigint, width int, height int, feat array<float>"
)


def attach_binary(
    df: DataFrame, src_col: str, *, id_col: str = "doc_id"
) -> DataFrame:
    """Demo ingest: a ``binary`` payload column (UTF-8 bytes of a string
    column — in production this is the raw image/audio blob) plus typed
    metadata (media_type, n_bytes) the planner can filter on WITHOUT
    touching the payload."""
    payload = F.encode(F.col(src_col), "UTF-8")
    out = df.select(
        F.col(id_col).alias("id"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
        F.octet_length(payload).alias("n_bytes"),
    )
    # small single-file sources scan as ONE partition, which would
    # serialize every downstream mapInPandas batch onto one core
    sc = df.sparkSession.sparkContext
    if out.rdd.getNumPartitions() < sc.defaultParallelism:
        out = out.repartition(sc.defaultParallelism)
    return out


def _fake_decode(buf: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for an image decode: pseudo-dimensions and a
    4-dim feature vector derived from byte statistics."""
    n = len(buf)
    width = 1 + n % 64
    height = 1 + (n // 64) % 64
    s = sum(buf[:256])
    feat = [float(n), float(s % 997), float(buf[0] if n else 0), float(width * height)]
    return width, height, feat


def extract_features(
    binary_df: DataFrame, *, decode_stub: bool = True
) -> DataFrame:
    """Decode/feature-extract over Arrow batches (``mapInPandas``).

    Input needs (id, payload); output schema is ``FEATURE_SCHEMA``. The
    pandas iterator form streams batch-by-batch — peak memory is one
    Arrow batch, not one partition.
    """
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if not decode_stub:
                # Real decoder integration point (PIL.Image.open etc.).
                raise NotImplementedError(
                    "image/audio decode libraries not available in this "
                    "environment; run with decode_stub=True"
                )
            rows = []
            for rid, buf in zip(pdf["id"], pdf["payload"]):
                b = bytes(buf)
                width, height, feat = _fake_decode(b)
                rows.append((int(rid), len(b), width, height, feat))
            yield pd.DataFrame(
                rows, columns=["id", "n_bytes", "width", "height", "feat"]
            )

    # Prune before Python: only (id, payload) crosses the Arrow boundary.
    return binary_df.select("id", "payload").mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(
    binary_df: DataFrame, *, every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """'Frame sampling' over a binary payload (video stand-in): emit one
    row per sampled offset — the explode-shaped fan-out a real frame
    sampler produces, with deterministic fake frame bytes."""
    import zlib

    import pandas as pd

    schema = "id bigint, frame_no int, offset bigint, frame_hash bigint"

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for rid, buf in zip(pdf["id"], pdf["payload"]):
                b = bytes(buf)
                n_frames = min(max_frames, max(1, len(b) // every_n_bytes))
                for i in range(n_frames):
                    off = i * every_n_bytes
                    chunk = b[off : off + every_n_bytes]
                    # crc32, not Python hash() — hash() is seed-randomized
                    # per process and would break determinism.
                    rows.append((int(rid), i, off, zlib.crc32(chunk)))
            yield pd.DataFrame(
                rows, columns=["id", "frame_no", "offset", "frame_hash"]
            )

    return binary_df.select("id", "payload").mapInPandas(run, schema)
