"""End-to-end corpus RELEASE recipe: the composition a production
training-data pipeline runs per drop, stitched entirely from the
engine's own operators —

    raw drop → standard cleaning pipeline → versioned snapshot commit
    → snapshot diff vs previous release → profile drift vs previous
    release → packed training shards

Each stage is already unit/oracle-tested on its own; this test pins
that they COMPOSE (schemas line up, determinism survives the seams)
and that release N+1's provenance artifacts (diff + drift + attrition
report) come out of the same run.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_ml_showcase_spark.operators import chunking, corpus_pipeline, profile
from spark_ml_showcase_spark.sources import versioned
from spark_ml_showcase_spark.sources.catalog import Catalog

SF = "/root/testdata/sf0.001"


def _release(spark, docs, table_dir):
    """One release: clean the drop, commit it, return (version, report)."""
    pipe = corpus_pipeline.standard_cleaning_pipeline(
        near_threshold=0.8, quality_min=0.0, lang="en", lm_bits_max=1e9
    )
    cleaned, report = pipe.run(docs)
    v = versioned.write_snapshot(
        cleaned.select("doc_id", "text", "lang", "source", "n_chars"),
        table_dir,
    )
    return v, report


import pytest


@pytest.fixture()
def _clear_cache_after(spark):
    # the cleaning pipeline caches its dedup stages; drop them on exit
    # (even on failure) so later tests' plan assertions don't hit
    # InMemoryTableScan rewrites of the same source subtrees — the
    # session fixture is shared suite-wide
    yield
    spark.catalog.clearCache()


def test_release_cycle_produces_all_provenance(spark, tmp_path, _clear_cache_after):
    t = str(tmp_path / "corpus")
    docs = Catalog(spark, SF).documents

    # release 1: first 80% of the corpus
    v1, rep1 = _release(spark, docs.filter(F.col("doc_id") % 5 != 0), t)
    # release 2: the full drop (some docs new, none removed pre-clean)
    v2, rep2 = _release(spark, docs, t)
    assert (v1, v2) == (0, 1)

    # attrition reports: monotone non-increasing doc counts per stage
    for rep in (rep1, rep2):
        counts = [r["n_docs"] for r in rep.orderBy("stage").collect()]
        assert counts == sorted(counts, reverse=True)
        assert counts[-1] > 0

    # snapshot diff: release 2 adds docs; a release-1 survivor may be
    # REMOVED when a new near-dup partner outranks it, but no text ever
    # changes in place (cleaning filters, never edits)
    diff = versioned.snapshot_diff(spark, t, v1, v2, "doc_id", ["text"])
    kinds = {r["change"] for r in diff.collect()}
    assert "added" in kinds and "changed" not in kinds, kinds

    # profile drift between the two releases over the numeric column
    p1 = profile.profile_table(
        versioned.read_snapshot(spark, t, v1), ["n_chars"]
    )
    p2 = profile.profile_table(
        versioned.read_snapshot(spark, t, v2), ["n_chars"]
    )
    drift = profile.profile_drift(p1, p2, rel_tol=0.5).collect()
    assert len(drift) == 1 and drift[0]["col_name"] == "n_chars"

    # packed training shards from the released snapshot
    released = versioned.read_snapshot(spark, t, v2)
    packed = chunking.pack_sequences(
        released.select(
            "doc_id",
            (F.col("doc_id") % 4).alias("shard"),
            F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
        ),
        max_tokens=512,
        order_cols=["doc_id"],
    )
    rows = packed.collect()
    assert rows, "packing produced no shards"
    # every released doc landed in exactly one shard
    packed_ids = sorted(r["doc_id"] for r in rows)
    released_ids = sorted(
        r["doc_id"] for r in released.select("doc_id").collect()
    )
    assert packed_ids == released_ids
