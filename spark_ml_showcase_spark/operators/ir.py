"""Sparse-vector IR operators over token features: TF-IDF weighted
document-document cosine top-k via an inverted index with rare-feature
blocking — the classic "more like this" / near-neighbor text search
shape, complementing the set-overlap operators (PPJoin Jaccard in
``dedup.set_similarity_join``) with WEIGHTED similarity.

Scale posture: never all-pairs. Candidates come from an equi-join on
each document's R RAREST features (global df ranks them — the same
prefix-filtering insight as PPJoin: rare features prune candidates
hardest), so the join fan-out per feature is bounded by that feature's
df, and corpus-wide features never generate pairs. The exact cosine is
then computed only on candidates, from exact INTEGER quantized weights
(w × 1000 as BIGINT) so partial dot products are sum-order-free and a
DuckDB oracle reproduces them bit-for-bit; the only floats are the two
norms' square roots and one division, in a fixed order, rounded.

No reference twin (the reference has no IR surface); this is the
100 TB training-data retrieval shape the brief's similarity-search
family calls for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _bigram_tf(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, gram, tf): whitespace-token bigrams with per-doc term
    frequency. Bigrams, not unigrams: on small vocabularies unigrams are
    corpus-wide (every doc shares them) and block nothing."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    # bind tokens to a column first — an unbound `toks` expression inside
    # the gram lambda re-runs the full regex split per element (see
    # dedup._distinct_gram_sets; measured 10× on the 5-gram sibling)
    t = df.select(F.col(id_col).alias("_id"), toks.alias("_toks"))
    tc = F.col("_toks")
    grams = F.transform(
        F.slice(tc, 1, F.greatest(F.size(tc) - 1, F.lit(0))),
        # 0-based lambda index; partner is _toks[i+1] (0-based subscript)
        lambda s, i: F.concat_ws(" ", s, tc[i + 1]),
    )
    return (
        t.select("_id", F.explode(grams).alias("gram"))
        .groupBy("_id", "gram")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def sparse_cosine_topk(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    rare_features: int = 5,
    query_filter: Column | None = None,
) -> DataFrame:
    """TF-IDF bigram cosine top-k per query document.

    Pipeline (each stage one shuffle, keyed as noted):
    1. bigram tf per (doc, gram)                       [shuffle: id+gram]
    2. global df per gram; idf = ln((N+1)/(df+1)) + 1  [shuffle: gram]
    3. integer weights wi = CAST(ROUND(tf·idf × 1000) AS BIGINT) and
       per-doc norm n = Σ wi² (exact BIGINT)           [shuffle: id]
    4. rare-rank flag: each doc's ``rare_features`` grams by (df ASC,
       gram ASC) marked on the posting list            [shuffle: id]
    5. ONE gram-keyed co-occurrence join of query postings × corpus
       postings computes the dot (Σ wi_a·wi_b over shared grams) AND
       the blocking test (candidate ⇔ some shared gram rare for both
       sides) in the same pair aggregate;
       cosine = ROUND(dot / (√n_a · √n_b), 4)    [shuffle: gram, pair]
    6. top-``k`` per query doc by (cosine DESC, id ASC).

    ``query_filter`` restricts which docs get a result row (rank side
    only — candidates still come from the whole corpus). Weights are
    quantized to 1e-3 so every sum is exact integer arithmetic —
    sum-order-free, overflow-safe (wi ≤ ~1e6, pairwise products ≤ 1e12,
    well under 2^63), and replayable in ANSI SQL.

    Recall note: blocking by rare features is the documented trade —
    a pair sharing only corpus-common grams is not a candidate. That is
    the behavior you want at 100 TB (common-gram pairs are the noise).
    """
    tf = _bigram_tf(df, id_col, text_col)
    n_docs = df.agg(F.count(F.lit(1)).alias("_n"))
    dfreq = tf.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    weighted = (
        tf.join(dfreq, "gram")
        # single-row broadcast cross (tpch_q11 pattern, allowlisted)
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "wi",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("_n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))
                    )
                    + F.lit(1.0)
                )
                * F.lit(1000.0)
            ).cast("bigint"),
        )
        .select("_id", "gram", "df", "wi")
        # four consumers below (norms, the rare-feature window, and the
        # two posting-list sides of the dot product) inline this whole
        # tf→df→idf subtree each — runtime exchange reuse dedupes the
        # identical exchanges (verified: SKIPPED stages, flat shuffle
        # bytes), so no explicit materialization is needed, and keeping
        # it un-checkpointed leaves AQE its shuffle statistics for the
        # adaptive broadcast decisions in the joins below
    )
    norms = weighted.groupBy("_id").agg(
        F.sum(F.col("wi") * F.col("wi")).alias("n2")
    )
    # one gram-keyed co-occurrence join does BOTH the blocking test and
    # the exact dot product (r15 restructure). The former shape built a
    # separate candidate-pair frame (rare-feature self-join + distinct
    # + two semi-joins) and then expanded candidates pair-first
    # (cands ⋈ wa on id_a, THEN match gram) — measured 8.29M
    # intermediate rows at sf0.1 against 0.67M gram-matched ones, with
    # the whole chain serialized through AQE-coalesced single-task
    # stages. Instead: carry each posting's rare-rank flag (the same
    # (df ASC, gram ASC) window), join query postings to candidate
    # postings on the SHARED gram — bounded by Σ_g df_q(g)·df(g), the
    # classic inverted-index cost, never pair×grams — and fold the
    # blocking predicate into the pair aggregate: a pair is a candidate
    # iff SOME shared gram is rare for both sides (exactly the old
    # rare ⋈ rare membership), its dot the sum over ALL shared grams.
    # Same pairs, same integer sums; the query restriction lands on the
    # probe side BEFORE the join (4% of postings at the registered
    # qmod=25) instead of filtering pair fan-out afterwards.
    wrare = Window.partitionBy("_id").orderBy(F.asc("df"), F.asc("gram"))
    posted = weighted.withColumn(
        "_rare", F.row_number().over(wrare) <= rare_features
    )
    wa = posted.select(
        F.col("_id").alias("id_a"),
        "gram",
        F.col("wi").alias("wa"),
        F.col("_rare").alias("_ra"),
    )
    if query_filter is not None:
        qids = df.filter(query_filter).select(F.col(id_col).alias("id_a"))
        wa = wa.join(qids, "id_a", "left_semi")
    wb = posted.select(
        F.col("_id").alias("id_b"),
        "gram",
        F.col("wi").alias("wb"),
        F.col("_rare").alias("_rb"),
    )
    dots = (
        wa.join(wb, "gram")
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(F.col("wa") * F.col("wb")).alias("dot"),
            F.max(F.col("_ra") & F.col("_rb")).alias("_blocked"),
        )
        .filter(F.col("_blocked"))
        .drop("_blocked")
    )
    scored = (
        dots.join(norms.select(F.col("_id").alias("id_a"), F.col("n2").alias("na")), "id_a")
        .join(norms.select(F.col("_id").alias("id_b"), F.col("n2").alias("nb")), "id_b")
        .withColumn(
            "cosine",
            F.round(
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("na").cast("double"))
                    * F.sqrt(F.col("nb").cast("double"))
                ),
                4,
            ),
        )
    )
    wk = Window.partitionBy("id_a").orderBy(F.desc("cosine"), F.asc("id_b"))
    return (
        scored.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select(
            F.col("id_a").alias("query_id"),
            F.col("id_b").alias("cand_id"),
            "cosine",
            "rank",
        )
    )


def phrase_search(
    docs: DataFrame,
    phrases: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase search with positional verification — the IR
    primitive the weighted-cosine shelf lacks: which documents contain
    this exact token sequence, where, and how often.

    Scale shape: per DISTINCT phrase length L, ONE Arrow gram pass
    (``dedup._gram_hash_seq_fn`` — blake2b-8 of the space-joined
    L-gram, offset order preserved) posexplodes to (doc, pos, hash)
    and equi-joins the broadcast (phrase, hash) list, so the corpus is
    touched once per length bucket (queries share lengths, typically
    2–4 buckets) and everything after the scan carries only matching
    longs. No per-position string comparison, no substring scan, no
    LIKE. The oracle joins the gram STRINGS — identical up to blake2b-8
    collision (P ≈ G/2⁶⁴ per phrase).

    Matching is token-exact on lowercased whitespace tokens (the repo
    tokenizer), so "fast  Key scan" matches "fast key scan".

    Output: ``(phrase, doc_id, n_matches, first_pos)`` — docs with ≥ 1
    occurrence; positions are 1-based token offsets.
    """
    from hashlib import blake2b

    from spark_ml_showcase_spark.operators.dedup import _gram_hash_seq_fn

    spark = docs.sparkSession
    if not phrases:
        raise ValueError("no phrases: phrase_search requires >= 1 phrase")
    by_len: dict[int, list[tuple[str, int]]] = {}
    for p in phrases:
        toks = [t for t in p.lower().split() if t]
        if not toks:
            raise ValueError(f"empty phrase: {p!r}")
        gh = int.from_bytes(
            blake2b(" ".join(toks).encode(), digest_size=8).digest(),
            "big",
            signed=True,
        )
        by_len.setdefault(len(toks), []).append((p, gh))
    out = None
    for length, plist in sorted(by_len.items()):
        ph = F.broadcast(
            spark.createDataFrame(plist, "phrase string, gh bigint")
        )
        udf = F.pandas_udf(
            _gram_hash_seq_fn(length), "array<bigint>"
        ).asNondeterministic()  # keep the posexplode filter above the scan
        grams = docs.repartition(
            spark.sparkContext.defaultParallelism
        ).select(
            F.col(id_col).alias("_id"),
            F.posexplode(udf(F.col(text_col))).alias("_off0", "gh"),
        )
        hits = (
            grams.join(ph, "gh")
            .groupBy("phrase", "_id")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_matches"),
                (F.min("_off0") + 1).cast("bigint").alias("first_pos"),
            )
        )
        out = hits if out is None else out.unionByName(hits)
    return out.select(
        "phrase", F.col("_id").alias(id_col), "n_matches", "first_pos"
    ).orderBy("phrase", id_col)
