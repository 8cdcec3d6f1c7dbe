"""Extension showcase — the LLM training-data release pipeline.

Not a reference task: this is the engine's north-star surface (dedup,
decontamination, quality filtering, versioned releases) composed
end-to-end, the per-drop recipe a production corpus team runs. Every
stage is an oracle- or property-tested library operator; this script
is the runnable tour.

Run: python examples/t5_corpus_release.py [sf_dir]
Defaults to /root/testdata/sf0.001. Writes the versioned corpus table
under /tmp/smss_t5_release and prints each provenance artifact.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_ml_showcase_spark.ml import quality_filter
from spark_ml_showcase_spark.operators import chunking, corpus_pipeline, profile, splits
from spark_ml_showcase_spark.session import session_builder
from spark_ml_showcase_spark.sources import versioned
from spark_ml_showcase_spark.sources.catalog import Catalog


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = session_builder("t5-corpus-release").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    table = "/tmp/smss_t5_release/corpus"
    shutil.rmtree("/tmp/smss_t5_release", ignore_errors=True)

    docs = Catalog(spark, sf_dir).documents

    # ── release 1: first drop (80% of the corpus), cleaned + committed
    pipe = corpus_pipeline.standard_cleaning_pipeline(
        near_threshold=0.8, quality_min=0.0, lang="en", lm_bits_max=1e9
    )
    drop1 = docs.filter(F.col("doc_id") % 5 != 0)
    cleaned1, report1 = pipe.run(drop1)
    v1 = versioned.write_snapshot(
        cleaned1.select("doc_id", "text", "lang", "source", "n_chars"), table
    )
    print(f"release v{v1} committed; cleaning attrition:")
    report1.show(truncate=False)

    # ── release 2: the full drop through the same pipeline
    cleaned2, _ = pipe.run(docs)
    v2 = versioned.write_snapshot(
        cleaned2.select("doc_id", "text", "lang", "source", "n_chars"), table
    )

    # provenance: what changed between releases (key + content hash)
    print(f"release v{v2} vs v{v1} diff (first 10):")
    versioned.snapshot_diff(spark, table, v1, v2, "doc_id", ["text"]).orderBy(
        "doc_id"
    ).show(10)

    # provenance: distribution drift vs the previous release
    drift = profile.profile_drift(
        profile.profile_table(
            versioned.read_snapshot(spark, table, v1).select("doc_id", "n_chars")
        ),
        profile.profile_table(
            versioned.read_snapshot(spark, table, v2).select("doc_id", "n_chars")
        ),
    )
    print("profile drift vs previous release:")
    drift.show(truncate=False)

    # ── learned quality filter: train on the release, score everything
    model = quality_filter.train_quality_filter(
        versioned.read_snapshot(spark, table), seed=40, max_iter=8
    )
    scored = quality_filter.score_quality(
        model, versioned.read_snapshot(spark, table)
    )
    print("learned quality scores (worst 5):")
    scored.orderBy("quality_prob").show(5)

    # ── token-budget subcorpus (the mixture-spec unit) + packed shards
    from spark_ml_showcase_spark.functions import text as TX

    release = versioned.read_snapshot(spark, table).withColumn(
        "n_tok", TX.whitespace_token_count("text").cast("bigint")
    )
    budgets = {r["source"]: 10_000 for r in release.select("source").distinct().collect()}
    budget = splits.token_budget_sample(
        release, "source", "doc_id", "n_tok", budgets
    )
    chunks = chunking.assign_shards(
        chunking.chunk_documents(budget, max_tokens=64, overlap=8), 8
    )
    packed = chunking.pack_sequences(chunks, max_tokens=256)
    n_seq = packed.select("shard", "seq_id").distinct().count()
    print(f"packed {n_seq} training sequences from the budgeted sample")

    # ── takedown: forget a key, then age the history out
    versioned.delete_keys(spark, table, "doc_id", [1])
    versioned.expire_versions(table, keep_last=1)
    versioned.vacuum(table, grace_sec=0)
    print(f"post-takedown versions: {versioned.snapshot_versions(table)}")


if __name__ == "__main__":
    main()
