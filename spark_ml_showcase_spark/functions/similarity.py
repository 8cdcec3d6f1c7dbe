"""Similarity search over embedding columns (SURVEY.md §2.12 X3):
brute-force cosine top-k as the correctness baseline, random-hyperplane
LSH bucketing as the scale path, and an Arrow-vectorized Pandas-UDF cosine
for very wide vectors.

Scale posture: brute-force is O(|queries|·|candidates|) — correct, and
fine when the query side is small enough to broadcast (the plan below
broadcasts it explicitly, so the candidate table streams once with NO
shuffle). For corpus×corpus at 100 TB, bucket both sides with
``lsh_bucket`` first: the join becomes equi-join on the bucket id and
each bucket reranks exactly. Recall < 1.0 by design; raise ``n_planes``
bands or probe neighboring buckets to trade compute for recall.

Embeddings should be unit-normalized ONCE at ingest
(``functions.vectors.normalize``) — then cosine is a plain dot product
(the testdata ``embeddings.embedding`` vectors are already unit-norm).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_ml_showcase_spark.functions import vectors as V


def as_double(col: str | Column) -> Column:
    """Cast array<float> → array<double> so score arithmetic matches
    engines that compute in double (and avoids float32 summation drift)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def brute_force_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_decimals: int = 6,
    vectorized: bool = False,
) -> DataFrame:
    """Exact cosine top-k per query: broadcast(queries) × candidates →
    score → per-query rank window. Returns (query_id, cand_id, cosine,
    rank). Ranking uses the ROUNDED score with an id tie-break so the
    result is deterministic across partitionings and float ulp drift.

    ``vectorized``: score through the Arrow/numpy cosine instead of the
    Catalyst higher-order expression — ~3× on 64-dim fixtures (the HOF
    evaluates interpreted per element). numpy's pairwise summation can
    differ from the sequential HOF/SQL sum in the last ulp, so keep the
    default for ORACLE-checked callers (rank parity demands identical
    rounding inputs); rows-only observability queries use True."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("_qv")
    )
    c = candidates.select(
        F.col(id_col).alias("cand_id"), as_double(vec_col).alias("_cv")
    )
    cos = (
        cosine_pandas_udf()("_qv", "_cv") if vectorized
        else V.cosine("_qv", "_cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cos, score_decimals))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 40) -> list[list[float]]:
    """Deterministic random hyperplanes (seeded Gaussian) for sign-LSH."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype(float).tolist()


def lsh_bucket(
    vec_col: str | Column, planes: list[list[float]]
) -> Column:
    """Sign-LSH bucket id: bit i = [dot(v, plane_i) >= 0], packed into an
    int. Pure higher-order-function expression — JVM-side, no UDF.
    Cosine-similar vectors collide with probability 1 - θ/π per bit.

    The double-cast vector is bound ONCE via a single-element transform;
    referencing the cast subtree directly would re-run it for every
    plane's dot product (n_planes× wasted element casts per row)."""

    def bits(v: Column) -> Column:
        bucket = F.lit(0).cast("bigint")
        for plane in planes:
            p = F.array(*[F.lit(float(x)) for x in plane])
            bit = F.when(V.dot(v, p) >= 0, F.lit(1)).otherwise(F.lit(0))
            bucket = bucket * 2 + bit
        return bucket

    return F.element_at(
        F.transform(F.array(as_double(vec_col)), bits), 1
    )


def ann_topk_lsh(
    candidates: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    dim: int = 64,
    seed: int = 40,
    score_decimals: int = 6,
) -> DataFrame:
    """Approximate top-k: equi-join on the LSH bucket, exact rerank inside
    the bucket. 2^n_planes buckets; the join shuffles on a small long key
    instead of forming any cross product."""
    planes = hyperplanes(dim, n_planes, seed)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(vec_col).alias("_qv"),
        lsh_bucket(vec_col, planes).alias("_bucket"),
    )
    c = candidates.select(
        F.col(id_col).alias("cand_id"),
        as_double(vec_col).alias("_cv"),
        lsh_bucket(vec_col, planes).alias("_bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "_bucket")
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("cosine", F.round(V.cosine("_qv", "_cv"), score_decimals))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def ivf_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    n_probe: int = 2,
    seed: int = 40,
    score_decimals: int = 6,
    vectorized: bool = False,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a KMeans coarse quantizer
    partitions candidates into ``n_lists`` cells; each query probes its
    ``n_probe`` nearest centroids and reranks exactly inside those cells.

    vs sign-LSH (``ann_topk_lsh``): IVF adapts cell boundaries to the
    data distribution (better recall on clustered corpora) at the cost
    of a training pass. The cell assignment is ONE KMeans transform; the
    probe join is an equi-join on the cell id — no cross product. At
    100 TB: train the quantizer on a sample, broadcast the centroids
    (tiny: n_lists × dim), and the probe join shuffles on a small int key.
    """
    assigned, cent_df = build_ivf_index(
        candidates, id_col=id_col, vec_col=vec_col, n_lists=n_lists, seed=seed
    )
    return ivf_probe(
        assigned,
        cent_df,
        queries,
        k,
        id_col=id_col,
        vec_col=vec_col,
        n_probe=n_probe,
        score_decimals=score_decimals,
        vectorized=vectorized,
    )


def build_ivf_index(
    candidates: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    seed: int = 40,
    index_dir: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Build the IVF index: fit the coarse quantizer and assign every
    candidate to a cell. Returns ``(assigned, centroids)`` —
    ``assigned`` is (cand_id, _cv, _cell), ``centroids`` is
    (cell, centroid) with ``n_lists`` rows.

    Pass ``index_dir`` to PERSIST the index: ``cells/`` written
    parquet-partitioned BY ``_cell`` (so a probe of ``n_probe`` cells
    scans only those partitions — at 100 TB the probe reads
    n_probe/n_lists of the corpus, enforced by partition pruning, not
    by luck) plus a tiny ``centroids/`` table. Build once at ingest,
    probe per query batch via :func:`load_ivf_index` — retraining the
    quantizer per query (what ``ivf_topk`` does for self-contained
    runs) is the demo path, not the deployment path.
    """
    from pyspark.ml.clustering import KMeans

    from pyspark.ml.functions import array_to_vector

    c = candidates.select(
        F.col(id_col).alias("cand_id"),
        as_double(vec_col).alias("_cv"),
        array_to_vector(as_double(vec_col)).alias("_feat"),
    )
    # a coarse quantizer does not need convergence — a few Lloyd rounds
    # position cells well enough for probing (default maxIter=20 would
    # double the training cost for no recall gain)
    km = KMeans(
        k=n_lists, seed=seed, maxIter=5, featuresCol="_feat", predictionCol="_cell"
    )
    model = km.fit(c)
    assigned = model.transform(c).select("cand_id", "_cv", "_cell")
    # centroid table (n_lists rows) — query-side probe assignment happens
    # against this broadcast-small table
    centroids = [
        (i, [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())
    ]
    cent_df = candidates.sparkSession.createDataFrame(
        centroids, "cell int, centroid array<double>"
    )
    if index_dir is not None:
        import os

        assigned.write.mode("overwrite").partitionBy("_cell").parquet(
            os.path.join(index_dir, "cells")
        )
        cent_df.write.mode("overwrite").parquet(
            os.path.join(index_dir, "centroids")
        )
        return load_ivf_index(candidates.sparkSession, index_dir)
    return assigned, cent_df


def load_ivf_index(spark, index_dir: str) -> tuple[DataFrame, DataFrame]:
    """Reopen a persisted IVF index: ``(assigned, centroids)`` handles
    over the cell-partitioned parquet layout. The probe join on
    ``_cell`` against the broadcast probed-cells set prunes the scan to
    the probed partitions (same dynamic-pruning mechanism pinned for
    ``dpp_events_mondays``)."""
    import os

    assigned = spark.read.parquet(os.path.join(index_dir, "cells")).select(
        "cand_id", "_cv", F.col("_cell").cast("int").alias("_cell")
    )
    cent = spark.read.parquet(os.path.join(index_dir, "centroids"))
    return assigned, cent


def ivf_probe(
    assigned: DataFrame,
    cent_df: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 2,
    score_decimals: int = 6,
    vectorized: bool = False,
) -> DataFrame:
    """Probe phase of IVF top-k: assign each query to its ``n_probe``
    nearest centroids (broadcast n_lists-row table), equi-join on the
    cell id, exact-rerank inside the probed cells."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("_qv")
    )
    probed = (
        q.crossJoin(F.broadcast(cent_df))
        .withColumn("_d", V.l2_distance("_qv", "centroid"))
        .withColumn(
            "_pr",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("_d").asc(), F.col("cell").asc()
                )
            ),
        )
        .filter(F.col("_pr") <= n_probe)
        .select("query_id", "_qv", F.col("cell").alias("_cell"))
    )
    cos = (
        cosine_pandas_udf()("_qv", "_cv") if vectorized
        else V.cosine("_qv", "_cv")
    )
    scored = (
        assigned.join(F.broadcast(probed), "_cell")
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cos, score_decimals))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def quantize_int8(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    q_col: str = "q_vec",
    scale_col: str = "q_scale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization for embedding storage at
    100 TB: ``scale = max(|x|) / 127``, ``q[i] = round(x[i] / scale)`` ∈
    [−127, 127], stored as ``array<tinyint>`` + one double — 4× smaller
    than float32 (8× than float64) per vector. Pure higher-order column
    math (``transform``/``aggregate``), whole-stage codegen, no UDF.

    For COSINE similarity the per-vector scale cancels exactly
    (cos(s_a·q_a, s_b·q_b) = cos(q_a, q_b)), so search over the int8
    arrays loses only the rounding error — measured recall@10 ≥ 0.95 vs
    float32 truth (``tests/test_similarity.py``, `quantized_ann_recall`).
    Keep ``scale_col`` for magnitude-sensitive consumers (L2, dot)."""
    c = as_double(vec_col)
    # coalesce: array_max of an EMPTY array is NULL — empty and all-zero
    # vectors both take the scale-1.0 guard (q = [], no div-by-zero)
    amax = F.coalesce(
        F.array_max(F.transform(c, lambda x: F.abs(x))), F.lit(0.0)
    )
    df = df.withColumn(
        scale_col,
        F.when(amax == 0.0, F.lit(1.0)).otherwise(amax / F.lit(127.0)),
    )
    return df.withColumn(
        q_col,
        F.transform(
            as_double(vec_col),
            lambda x: F.round(x / F.col(scale_col)).cast("tinyint"),
        ),
    )


def quantize_int8_np(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    q_col: str = "q_vec",
    scale_col: str = "q_scale",
) -> DataFrame:
    """Arrow-vectorized twin of :func:`quantize_int8` — bit-identical
    output (HALF_UP rounding replicated as copysign(floor(|x|/s + .5)),
    NOT numpy's half-even rint; parity pinned in tests), ~6× faster at
    10M×16 (3.4 s vs ~20 s: Catalyst higher-order functions are
    interpreted per element, numpy flattens the batch into two
    reduceat/divide passes). This is the INGEST path; keep
    ``quantize_int8`` as the pure-column-math reference."""

    @F.pandas_udf("struct<q: array<tinyint>, s: double>")
    def qz(emb: pd.Series) -> pd.DataFrame:
        n = len(emb)
        if n == 0:
            return pd.DataFrame({"q": [], "s": []})
        # NULL embedding rows: parity with the column path, which emits
        # q=NULL, scale=1.0 (transform over NULL is NULL; the coalesced
        # amax takes the scale-1.0 guard). np.concatenate over a batch
        # containing None would raise in the Arrow worker (r10 ADVICE).
        null_mask = emb.isna().to_numpy()
        q_out = np.empty(n, dtype=object)
        s_out = np.ones(n)
        sub = emb[~null_mask]
        lens = sub.str.len().to_numpy().astype(np.int64)
        if lens.size:
            flat = (
                np.concatenate(sub.to_numpy()).astype(np.float64)
                if lens.sum()
                else np.zeros(0)
            )
            if not flat.size:
                qs = [np.zeros(0, dtype=np.int8)] * len(lens)
                scale = np.ones(len(lens))
            else:
                starts = np.zeros(len(lens), dtype=np.int64)
                starts[1:] = np.cumsum(lens[:-1])
                # clip: a trailing empty vector would index reduceat at
                # len(flat)
                amax = np.maximum.reduceat(
                    np.abs(flat), np.minimum(starts, flat.size - 1)
                )
                amax[lens == 0] = 0.0  # reduceat empty slice reads neighbors
                scale = np.where(amax == 0.0, 1.0, amax / 127.0)
                rep = np.repeat(scale, lens)
                x = flat / rep
                q = np.copysign(np.floor(np.abs(x) + 0.5), x).astype(np.int8)
                qs = np.split(q, starts[1:])
            packed = np.empty(len(qs), dtype=object)
            for i, a in enumerate(qs):
                packed[i] = a
            q_out[~null_mask] = packed
            s_out[~null_mask] = scale
        return pd.DataFrame({"q": pd.Series(q_out), "s": s_out})

    out = df.withColumn("_qz", qz(as_double(vec_col)))
    return out.select(
        *df.columns,
        F.col("_qz.q").alias(q_col),
        F.col("_qz.s").alias(scale_col),
    )


def quantized_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_decimals: int = 6,
    vectorized: bool = False,
) -> DataFrame:
    """Exact cosine top-k over int8-quantized vectors: quantize both
    sides (:func:`quantize_int8`), then run the same broadcast
    brute-force rerank on the tinyint arrays — scales cancel for cosine,
    so no dequantization happens anywhere. The scored arrays are 4×
    smaller than float32; at 100 TB that is 4× less scan IO and shuffle
    for the same plan shape."""
    # np path: bit-identical to the column form (parity-pinned test),
    # ~6× cheaper — this is the ingest path the operator documents
    qc = quantize_int8_np(candidates, vec_col=vec_col)
    qq = quantize_int8_np(queries, vec_col=vec_col)
    return brute_force_topk(
        qc.select(id_col, F.col("q_vec").alias("_qi")),
        qq.select(id_col, F.col("q_vec").alias("_qi")),
        k,
        id_col=id_col,
        vec_col="_qi",
        score_decimals=score_decimals,
        vectorized=vectorized,
    )


def embedding_near_dup_reps(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 40,
    bands: int = 2,
    max_bucket: int = 200,
    unit_norm: bool = False,
) -> DataFrame:
    """Embedding-cosine near-dup dedup: a row survives unless a LOWER-id
    row in any shared LSH bucket has cosine ≥ threshold (min-id
    representative per near-dup neighborhood). Bucketed, not all-pairs.

    ``unit_norm=True`` asserts the vectors are already unit-normalized
    (``vectors.normalize`` at ingest): the per-candidate verify then
    computes ONE dot-product pass instead of dot + two norms.

    Scale posture (mirrors ``operators.dedup.minhash_near_dup``):

    - ``bands`` INDEPENDENT plane sets, each hashing to 2^n_planes
      buckets. Candidates are the union across bands, so raising
      ``n_planes`` (smaller buckets → fewer comparisons) does not crater
      recall the way a single larger plane set would: a true near-dup
      pair splits in one band with prob ≈ n_planes·θ/π but must split in
      ALL bands to be missed.
    - Hot-bucket guard: a (band, bucket) with more than ``max_bucket``
      rows is dropped before the self-join (those rows conservatively
      survive). Candidate count is hard-bounded at
      bands · 2^n_planes · max_bucket², never O((N/buckets)²) on a
      skewed corpus.
    """
    planes_by_band = [
        hyperplanes(dim, n_planes, seed + 7919 * j) for j in range(bands)
    ]
    base = df.select(
        F.col(id_col).alias("_id"), as_double(vec_col).alias("_v")
    )
    # ids-only through the band join: the 64-dim vectors never ride the
    # explode/shuffle — they rejoin only for the per-candidate verify.
    keyed = base.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        lsh_bucket(F.col("_v"), planes_by_band[j]).alias("bh"),
                    )
                    for j in range(bands)
                ]
            )
        ).alias("_k"),
    ).select("_id", F.col("_k.band").alias("_band"), F.col("_k.bh").alias("_bh"))
    # Hot-bucket guard as agg + broadcast anti-join (the hot-bucket list
    # is at most bands·2^n_planes rows — broadcast-tiny), NOT a window:
    # a window would sort-shuffle every row to count its bucket.
    hot = (
        keyed.groupBy("_band", "_bh")
        .agg(F.count(F.lit(1)).alias("_bsz"))
        .filter(F.col("_bsz") > max_bucket)
        .select("_band", "_bh")
    )
    keyed = keyed.join(F.broadcast(hot), ["_band", "_bh"], "left_anti")
    a = keyed.select(F.col("_id").alias("id_a"), "_band", "_bh")
    b = keyed.select(F.col("_id").alias("id_b"), "_band", "_bh")
    # distinct BEFORE the cosine verify: a pair colliding in several
    # bands is scored once, not once per band.
    cands = (
        a.join(b, ["_band", "_bh"])
        .filter(F.col("id_b") < F.col("id_a"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = base.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"))
    vb = base.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"))
    score = V.dot("_va", "_vb") if unit_norm else V.cosine("_va", "_vb")
    dominated = (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .filter(score >= threshold)
        .select(F.col("id_a").alias("_dead"))
        .distinct()
    )
    return df.join(
        dominated, df[id_col] == dominated["_dead"], "left_anti"
    )


def cosine_pandas_udf():
    """Arrow-vectorized cosine for very wide vectors (≥~1k dims), where
    per-element codegen expressions lose to numpy BLAS over Arrow
    batches. Returns a (array, array) -> double pandas UDF."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        am = np.stack(a.to_numpy())
        bm = np.stack(b.to_numpy())
        num = (am * bm).sum(axis=1)
        den = np.linalg.norm(am, axis=1) * np.linalg.norm(bm, axis=1)
        return pd.Series(num / den)

    return _cos


def semantic_dedup(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    threshold: float = 0.95,
    seed: int = 40,
    max_cluster: int = 2000,
    unit_norm: bool = False,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    KMeans-clustering the embedding space, then dropping every row whose
    cosine to a LOWER-id row in the SAME cluster is ≥ threshold (min-id
    representative per semantic neighborhood). Returns the survivors.

    vs :func:`embedding_near_dup_reps` (hyperplane-LSH buckets): the
    KMeans quantizer ADAPTS its cells to the data distribution, which is
    the published SemDeDup recipe for pruning semantically-redundant
    (not merely near-identical) training data; the LSH variant needs no
    training pass and bounds bucket sizes obliviously. Both share the
    no-cartesian candidate shape.

    Scale posture: the quantizer fit is the only training pass (few
    Lloyd rounds — a coarse quantizer doesn't need convergence; at
    100 TB fit it on a sample and broadcast the centroids). Assignment
    is one model.transform; candidate pairs come from an equi-join on
    the cell id, so comparisons are Σ_cells |cell|² — choose
    ``n_clusters`` ∝ N/√target and the ``max_cluster`` guard drops
    degenerate cells from the pairwise step entirely (their rows
    conservatively SURVIVE, mirroring the minhash hot-bucket guard).
    Vectors ride only the verify join, never the cell shuffle.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    base = df.select(F.col(id_col).alias("_id"), as_double(vec_col).alias("_v"))
    feat = base.withColumn("_feat", array_to_vector("_v"))
    # KMeans breaks when k exceeds the DISTINCT point count (k-means||
    # init underfills its center array → AIOOBE in the aggregator).
    # Clamp for small corpora (tests, tail partitions) — the distinct
    # count is only computed when the row count is already ≤ n_clusters,
    # so big corpora pay one scalar count against a fit that is itself
    # many jobs. A web-scale corpus with < n_clusters distinct vectors
    # is degenerate input either way.
    n_rows = feat.count()
    if n_rows <= n_clusters:
        k_eff = max(1, min(n_clusters, feat.select("_v").distinct().count()))
    else:
        k_eff = n_clusters
    km = KMeans(
        k=k_eff,
        seed=seed,
        maxIter=5,
        featuresCol="_feat",
        predictionCol="_cell",
    )
    model = km.fit(feat)
    assigned = model.transform(feat).select("_id", "_cell")
    hot = (
        assigned.groupBy("_cell")
        .agg(F.count(F.lit(1)).alias("_csz"))
        .filter(F.col("_csz") > max_cluster)
        .select("_cell")
    )
    cold = assigned.join(F.broadcast(hot), "_cell", "left_anti")
    a = cold.select(F.col("_id").alias("id_a"), "_cell")
    b = cold.select(F.col("_id").alias("id_b"), "_cell")
    # one cell per row → a pair meets at most once; no distinct needed
    cands = a.join(b, "_cell").filter(F.col("id_b") < F.col("id_a")).select(
        "id_a", "id_b"
    )
    va = base.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"))
    vb = base.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"))
    score = V.dot("_va", "_vb") if unit_norm else V.cosine("_va", "_vb")
    dominated = (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .filter(score >= threshold)
        .select(F.col("id_a").alias("_dead"))
        .distinct()
    )
    return df.join(dominated, df[id_col] == dominated["_dead"], "left_anti")
