"""Composable corpus-cleaning pipeline (SURVEY.md §2.12 family): ordered
named stages — each a ``DataFrame → DataFrame`` transform — run with an
attrition report, so a training-data cleaning recipe is declared once
and reused, instead of hand-wiring dedup/quality/filter chains per job.

The reference has nothing comparable (its scripts are linear); this is
the productization layer over the individual operators: the registered
``clean_corpus_funnel`` query is exactly
:func:`standard_cleaning_pipeline` running over the documents table.

Execution notes baked in from measurement (plans/extensions.py history):

- A stage can request a **materialization boundary** (``cache`` or
  ``checkpoint``). ``checkpoint`` (localCheckpoint) also TRUNCATES plan
  lineage — essential once a report fans out into one count branch per
  stage, because every branch re-analyzes its full lineage even when
  the data is cached (a 7-branch composed funnel spent most of a 60 s
  fresh-session run in analysis/codegen before the cut).
- The report is ONE DataFrame (union of per-stage count aggregates),
  evaluated in a single action — never driver-side ``count()`` loops.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

StageFn = Callable[[DataFrame], DataFrame]


@dataclass
class Stage:
    """One named pipeline step. ``materialize``: None | 'cache' |
    'checkpoint' (lazy localCheckpoint: lineage-truncating, computed by
    the first action that touches it — eager=True would run the whole
    upstream chain as a separate job at BUILD time, measured +0.6 s on
    the standard recipe at sf0.1 with zero benefit: the report action
    materializes it anyway)."""

    name: str
    fn: StageFn
    materialize: str | None = None


@dataclass
class CorpusPipeline:
    stages: list[Stage] = field(default_factory=list)

    def then(
        self, name: str, fn: StageFn, *, materialize: str | None = None
    ) -> "CorpusPipeline":
        """Append a stage; returns self for chaining."""
        self.stages.append(Stage(name, fn, materialize))
        return self

    def run(self, df: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Apply every stage in order. Returns ``(cleaned, report)``:
        the final DataFrame, and a ``(stage, n_docs)`` report with one
        row per stage (``0_input`` first, stages numbered in order) —
        a single lazy DataFrame, one action to evaluate."""
        frames: list[tuple[str, DataFrame]] = [("0_input", df)]
        cur = df
        for i, st in enumerate(self.stages, 1):
            cur = st.fn(cur)
            if st.materialize == "cache":
                cur = cur.cache()
            elif st.materialize == "checkpoint":
                cur = cur.localCheckpoint(eager=False)
            elif st.materialize is not None:
                raise ValueError(f"unknown materialize {st.materialize!r}")
            frames.append((f"{i}_{st.name}", cur))

        def stage_count(name: str, d: DataFrame) -> DataFrame:
            return d.agg(F.count(F.lit(1)).alias("n_docs")).withColumn(
                "stage", F.lit(name)
            )

        parts = [stage_count(n, d) for n, d in frames]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        report = out.select("stage", "n_docs").orderBy("stage")
        return cur, report


def standard_cleaning_pipeline(
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    near_threshold: float = 0.8,
    quality_min: float = 0.5,
    lang: str = "en",
    boiler_ngram: int = 6,
    boiler_min_docs: int = 2,
    boiler_frac_max: float = 0.5,
    lm_bits_max: float = 9.0,
    embeddings: DataFrame | None = None,
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    semantic_threshold: float = 0.95,
    model_quality_min: float | None = None,
    model_train_fraction: float | None = None,
) -> CorpusPipeline:
    """The standard LLM-corpus cleaning recipe as a pipeline:
    exact dedup → MinHash near-dedup (min-id reps) → [semantic dedup when
    an ``embeddings`` table is supplied: SemDeDup over the surviving
    docs' vectors, ids matched ``id_col``↔``vec_id_col``] → quality/lang
    gate → cross-doc boilerplate drop → bigram-LM fluency gate →
    [learned quality filter when ``model_quality_min`` is set: a
    weak-supervision classifier (``ml.quality_filter``) trained on the
    surviving corpus's own heuristic extremes, dropping docs scored
    below the threshold — the CCNet/LLaMA model-filter step]. Compose
    further (``.then("chunks", ...)``) for chunking/sharding."""
    from spark_ml_showcase_spark.functions import similarity
    from spark_ml_showcase_spark.functions import text as TX
    from spark_ml_showcase_spark.operators import boilerplate, dedup, lm_score

    def near_dedup(df: DataFrame) -> DataFrame:
        pairs = dedup.minhash_near_dup(
            df, id_col, text_col, ngram=3, k=32, bands=8, threshold=near_threshold
        )
        losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
        return df.join(losers, id_col, "left_anti")

    def quality_gate(df: DataFrame) -> DataFrame:
        return df.filter(
            (TX.quality_score(text_col) >= quality_min)
            & (TX.lang_id(text_col) == lang)
        )

    def boiler_gate(df: DataFrame) -> DataFrame:
        frac = boilerplate.boilerplate_fraction(
            df, id_col, text_col, n=boiler_ngram, min_docs=boiler_min_docs
        )
        return df.join(
            frac.select(id_col, "boiler_frac"), id_col, "left"
        ).filter(
            # no spans to judge (short doc) → keep
            F.coalesce(F.col("boiler_frac") <= boiler_frac_max, F.lit(True))
        ).drop("boiler_frac")

    def lm_gate(df: DataFrame) -> DataFrame:
        lm = lm_score.bigram_lm_scores(df, id_col=id_col, text_col=text_col)
        return df.join(
            lm.select(id_col, "avg_nll_bits"), id_col, "left"
        ).filter(
            # no bigrams (single-token doc) → keep
            F.coalesce(F.col("avg_nll_bits") <= lm_bits_max, F.lit(True))
        ).drop("avg_nll_bits")

    def semantic_gate(df: DataFrame) -> DataFrame:
        emb = embeddings.join(
            df.select(F.col(id_col).alias(vec_id_col)), vec_id_col, "left_semi"
        )
        survivors = similarity.semantic_dedup(
            emb,
            id_col=vec_id_col,
            vec_col=vec_col,
            threshold=semantic_threshold,
        )
        return df.join(
            survivors.select(F.col(vec_id_col).alias(id_col)),
            id_col,
            "left_semi",
        )

    pipe = (
        CorpusPipeline()
        .then("exact_dedup", lambda d: dedup.exact_dedup(d, text_col, id_col),
              materialize="cache")
        .then("near_dedup", near_dedup, materialize="cache")
    )
    if embeddings is not None:
        pipe = pipe.then("semantic_dedup", semantic_gate, materialize="cache")
    pipe = (
        pipe
        # lineage cut HERE: the report fans out one branch per stage and
        # the boiler/LM subtrees stack on the dedup chain (see module
        # docstring) — everything upstream stays lazy/cached
        .then("quality_lang", quality_gate, materialize="checkpoint")
        .then("boilerplate", boiler_gate, materialize="cache")
        .then("lm_fluency", lm_gate, materialize="cache")
    )
    if model_quality_min is not None:

        def model_gate(df: DataFrame) -> DataFrame:
            from spark_ml_showcase_spark.ml import quality_filter as qf

            if df.isEmpty():
                return df  # nothing to learn from or filter
            model = qf.train_quality_filter(
                df,
                text_col=text_col,
                seed=40,
                # at 100 TB fit on a sample, score everything — the
                # documented posture of the learned-filter module
                train_fraction=model_train_fraction,
            )
            keep = qf.score_quality(
                model, df, id_col=id_col, text_col=text_col
            ).filter(F.col("quality_prob") >= model_quality_min)
            return df.join(keep.select(id_col), id_col, "left_semi")

        pipe = pipe.then("model_quality", model_gate, materialize="cache")
    return pipe
