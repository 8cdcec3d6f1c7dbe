"""Language identification — hashed char-n-gram classifier (X115,
designed r15 / registered r16 per the r14 verdict's rotation budget).

The CCNet/RefinedWeb front stage: every published web-corpus pipeline
(URL canon → langid → dedup → quality → decontamination) OPENS with a
language classifier over hashed character n-grams — fastText's feature
space. This module supplies that stage with a **multinomial Naive
Bayes** head instead of an L-BFGS logistic regression, a deliberate
architecture choice with two engine-level payoffs:

1. **Full-SQL correctness gate.** NB training is counting — one
   aggregation over (label, gram-bucket) with add-one smoothing — and
   scoring is a sum of log-likelihood terms. Both halves are exact
   relational algebra over integer counts and ROUND(6)-quantized logs
   in the DECIMAL domain, so a DuckDB oracle can replay
   TRAIN *and* SCORE end-to-end and hash-match the result
   (vs rows-only for an iterative L-BFGS fit — the
   ``learned_quality_terciles`` precedent). A linear-over-n-gram-counts
   model is also exactly what fastText reduces to for langid; the NB
   weights simply have a closed form.
2. **One-pass training at 100 TB.** Counting is map-side combinable:
   the only training shuffle carries (label, bucket) cells — a key grid
   of n_langs × n_buckets (e.g. 4 × 4096), which CANNOT skew. An
   L-BFGS fit is k distributed passes; this is one.

Cross-engine contract (every piece an already-pinned convention):

- canonicalization: ``lower`` + explicit ASCII-ws class collapse + trim
  (the exact ``text.fingerprint`` chain; dialect ``\\s`` is banned).
- char n-grams: positions ``1..len-n+1`` of the canonical text,
  INCLUDING spaces (word-boundary grams carry most of the language
  signal — the fastText design).
- hashing trick: bucket = first-8-hex-chars of md5(gram) mod
  ``n_buckets`` — the X56/X68 md5-portability idiom (both engines have
  md5; xxhash64 is Spark-only).
- model weights: ``lp6 = ROUND(ln((c+1)/(t+B)), 6)`` per (label,
  bucket), ``ld6`` the same at c=0 (the unseen-bucket default), prior
  ``ROUND(ln(n_l/n), 6)`` — all through ``round_like_duckdb``.
- scoring: score(doc, l) = prior_l + n_grams·ld6_l + Σ_b cnt_b·(lp6 −
  ld6) — the inner-join rearrangement: only buckets PRESENT in the
  model contribute the correction term, so unseen grams need no outer
  join. Every term is an exact multiple of 1e-6; the whole sum runs in
  DECIMAL(38,6) — order-free, engine-exact, and the argmax compares
  exact decimals (score DESC, label ASC tie-break), so the predicted
  language is deterministic to the bit on both engines.

The r16 registration plan (zero registry growth in r15 — the window
is full): query ``langid_confusion_planted`` plants a deterministic
multilingual slice from (doc_id) arithmetic — the X113 messy-URL
trick applied to text: ``planted_text()`` builds the SAME documents as
``duckdb_planted_text_sql()`` from one shared vocab table, trains on
``doc_id % 8 < 4``, scores the rest, and emits the (lang_true,
lang_pred) confusion matrix with per-language precision. The split
MUST be ``% 8``-based, not parity: ``% 2`` aliases with the ``% 4``
language plant and silently trains on two of the four languages
(caught by the precision-floor test when this was first wired). Oracle = the generated
planted-text SQL + the generated scoring SQL below; nothing
hand-copied. No reference twin (the reference's four scripts have no
language surface; SURVEY §2.12 grows the training-data family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_ml_showcase_spark.functions.rounding import round_like_duckdb

#: spelled-out ASCII whitespace (the engine-wide contract; see
#: functions/text.py — Java's \s exactly, RE2's \s + \x0b)
_WS = r"[ \t\n\x0b\f\r]"

#: planted-fixture vocabularies: 10 common ASCII words per language —
#: deliberately accent-free so the fixture never touches the Unicode
#: contract (unicode_dedup_docs owns that); char-trigram profiles are
#: disjoint enough for a ≥0.95 precision floor on planted docs.
PLANT_VOCAB: dict[str, list[str]] = {
    "de": ["und", "nicht", "haus", "wasser", "morgen", "strasse",
           "leute", "zeit", "immer", "schon"],
    "en": ["the", "and", "with", "house", "water", "morning",
           "people", "street", "would", "about"],
    "es": ["los", "con", "casa", "agua", "manana", "calle",
           "gente", "tiempo", "siempre", "desde"],
    "fr": ["les", "avec", "maison", "eau", "matin", "rue",
           "gens", "temps", "toujours", "depuis"],
}

#: words per planted document (12 draws from the language's vocab)
PLANT_WORDS = 12


def _canon(col: Column) -> Column:
    """The fingerprint normalize chain: lower, trim, collapse — the
    SAME text every oracle canonicalizes to."""
    return F.regexp_replace(
        F.regexp_replace(F.lower(col), rf"^{_WS}+|{_WS}+$", ""),
        rf"{_WS}+",
        " ",
    )


def char_ngrams(col: Column, *, n: int = 3) -> Column:
    """array<string> of overlapping char n-grams (spaces included) of
    the canonical text; empty array when the text is NULL or shorter
    than ``n``. JVM-side transform — no UDF."""
    c = _canon(F.coalesce(col, F.lit("")))
    grams = F.transform(
        F.sequence(F.lit(1), F.length(c) - (n - 1)),
        lambda i: c.substr(i, F.lit(n)),
    )
    # sequence(1, k) DESCENDS for k < 1 — guard short/empty strings
    return F.when(F.length(c) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def _bucket(gram: Column, n_buckets: int) -> Column:
    """Hashing trick, engine-portable: first 8 hex chars of md5 as a
    bigint, mod ``n_buckets`` (non-negative: md5 prefix < 2^32)."""
    return (
        F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("bigint")
        % n_buckets
    )


def train_langid(
    labeled: DataFrame,
    *,
    text_col: str = "text",
    label_col: str = "lang",
    n: int = 3,
    n_buckets: int = 4096,
) -> tuple[DataFrame, DataFrame]:
    """Closed-form NB fit. Returns ``(gram_ll, label_stats)``:

    - ``gram_ll``: (label, bucket, dlp) — dlp = lp6 − ld6, the exact
      on-grid log-likelihood LIFT of a seen bucket over the unseen
      default, stored DECIMAL(20,6). Only observed buckets appear
      (≤ n_langs × n_buckets rows — broadcastable by construction).
    - ``label_stats``: (label, prior6, ld6, n_docs) — ROUND(6) log
      prior and unseen-bucket default, one row per language.

    Deterministic with no seed at all: counting has no RNG and the
    quantized logs make even the float stages reproducible bit-for-bit
    (the determinism test pins model equality across refits)."""
    g = labeled.select(
        F.col(label_col).alias("label"),
        F.explode(char_ngrams(F.col(text_col), n=n)).alias("gram"),
    ).select("label", _bucket(F.col("gram"), n_buckets).alias("bucket"))
    counts = g.groupBy("label", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    totals = counts.groupBy("label").agg(F.sum("c").alias("t"))
    n_docs = labeled.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    grand = n_docs.agg(F.sum("n_docs").alias("n_all"))
    label_stats = (
        n_docs.crossJoin(F.broadcast(grand))
        .join(totals, "label")
        .select(
            "label",
            round_like_duckdb(
                F.log(F.col("n_docs") / F.col("n_all")), 6
            ).alias("prior6"),
            round_like_duckdb(
                F.log(F.lit(1.0) / (F.col("t") + F.lit(n_buckets))), 6
            ).alias("ld6"),
            "n_docs",
            "t",
        )
    )
    gram_ll = (
        counts.join(F.broadcast(label_stats.select("label", "t", "ld6")),
                    "label")
        .select(
            "label",
            "bucket",
            (
                round_like_duckdb(
                    F.log((F.col("c") + 1) / (F.col("t") + F.lit(n_buckets))),
                    6,
                )
                - F.col("ld6")
            ).cast("decimal(20,6)").alias("dlp"),
        )
    )
    return gram_ll, label_stats.drop("t")


def score_langid(
    gram_ll: DataFrame,
    label_stats: DataFrame,
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    n_buckets: int = 4096,
) -> DataFrame:
    """Score every row of ``docs``: (id_col, lang_pred, score,
    n_grams). One shuffle on (doc, bucket); the model joins are
    broadcast (≤ n_langs × n_buckets rows). NULL/empty/short text
    yields n_grams = 0 and falls back to the prior argmax — rows are
    never dropped. ``score`` is the exact-decimal NB log-likelihood
    cast to double (on the 1e-6 grid by construction)."""
    from pyspark.sql.window import Window

    base = docs.select(
        F.col(id_col),
        F.explode_outer(char_ngrams(F.col(text_col), n=n)).alias("gram"),
    ).select(
        id_col,
        _bucket(F.col("gram"), n_buckets).alias("bucket"),
    )
    per_bucket = base.groupBy(id_col, "bucket").agg(
        F.count(F.when(F.col("bucket").isNotNull(), 1)).cast("bigint")
        .alias("cnt")
    )
    per_doc = per_bucket.groupBy(id_col).agg(
        F.sum("cnt").cast("bigint").alias("n_grams")
    )
    adj = (
        per_bucket.join(F.broadcast(gram_ll), "bucket")
        .groupBy(id_col, "label")
        .agg(
            F.sum(
                (F.col("cnt") * F.col("dlp")).cast("decimal(38,6)")
            ).alias("adj")
        )
    )
    scores = (
        per_doc.crossJoin(F.broadcast(label_stats))
        .join(adj, [id_col, "label"], "left")
        .select(
            id_col,
            "label",
            "n_grams",
            (
                F.col("prior6").cast("decimal(38,6)")
                + (F.col("n_grams") * F.col("ld6").cast("decimal(20,6)"))
                .cast("decimal(38,6)")
                + F.coalesce(F.col("adj"), F.lit(0).cast("decimal(38,6)"))
            ).alias("score_dec"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_dec").desc(), F.col("label").asc()
    )
    return (
        scores.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            id_col,
            F.col("label").alias("lang_pred"),
            F.col("score_dec").cast("double").alias("score"),
            "n_grams",
        )
    )


# ---------------------------------------------------------------------------
# Planted multilingual fixture — Spark expression + generated DuckDB twin
# ---------------------------------------------------------------------------

def plant_lang(doc_id: Column) -> Column:
    """Deterministic true language for a planted doc: langs sorted
    ascending, picked by doc_id % 4."""
    langs = sorted(PLANT_VOCAB)
    return F.element_at(
        F.array(*[F.lit(x) for x in langs]), (doc_id % 4 + 1).cast("int")
    )


def planted_text(doc_id: Column) -> Column:
    """Deterministic pseudo-document: PLANT_WORDS draws from the true
    language's vocab, word i = vocab[(doc_id·(i+2) + i) % 10] — the
    X113 messy-URL trick applied to text, so the DuckDB twin
    (:func:`duckdb_planted_text_sql`) rebuilds the IDENTICAL corpus
    from the same constants."""
    langs = sorted(PLANT_VOCAB)
    texts = []
    for lang in langs:
        vocab = F.array(*[F.lit(wd) for wd in PLANT_VOCAB[lang]])
        words = [
            F.element_at(
                vocab,
                ((doc_id * (i + 2) + i) % 10 + 1).cast("int"),
            )
            for i in range(PLANT_WORDS)
        ]
        texts.append(F.concat_ws(" ", *words))
    expr = texts[-1]
    # CASE chain in reverse so the first language is the outermost WHEN
    out = F.when(doc_id % 4 == 0, texts[0])
    for j in range(1, 4):
        out = out.when(doc_id % 4 == j, texts[j])
    return out.otherwise(expr)


def duckdb_planted_text_sql(id_expr: str) -> tuple[str, str]:
    """DuckDB twins of :func:`plant_lang` / :func:`planted_text` over
    ``id_expr`` — GENERATED from the same PLANT_VOCAB constants (the
    urls.py anti-hand-copy discipline). Returns (lang_sql, text_sql)."""
    langs = sorted(PLANT_VOCAB)
    lang_list = "[" + ", ".join(f"'{x}'" for x in langs) + "]"
    lang_sql = f"{lang_list}[CAST(({id_expr}) % 4 AS BIGINT) + 1]"
    cases = []
    for j, lang in enumerate(langs):
        vocab = "[" + ", ".join(f"'{wd}'" for wd in PLANT_VOCAB[lang]) + "]"
        words = [
            f"{vocab}[CAST((({id_expr}) * {i + 2} + {i}) % 10 AS BIGINT) + 1]"
            for i in range(PLANT_WORDS)
        ]
        joined = " || ' ' || ".join(words)
        cases.append(f"WHEN ({id_expr}) % 4 = {j} THEN ({joined})")
    text_sql = "CASE " + " ".join(cases) + " END"
    return lang_sql, text_sql


def duckdb_score_sql(
    docs_rel: str,
    labeled_rel: str,
    *,
    n: int = 3,
    n_buckets: int = 4096,
) -> str:
    """The DuckDB twin of train-then-score as one CTE chain — GENERATED
    so the r16 oracle and the cross-engine pin test share one
    definition. ``labeled_rel`` must provide (lang, text); ``docs_rel``
    (doc_id, text). Yields a relation ``langid_pred`` with
    (doc_id, lang_pred, score, n_grams)."""
    canon = (
        "regexp_replace(regexp_replace(lower(coalesce({c}, '')), "
        f"'^{_WS}+|{_WS}+$', '', 'g'), '{_WS}+', ' ', 'g')"
    )
    B = n_buckets
    return f"""
    lg_train AS (
        SELECT lang AS label, {canon.format(c='text')} AS t
        FROM {labeled_rel}
    ),
    lg_tgrams AS (
        SELECT label,
               CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT) % {B}
                   AS bucket
        FROM (
            SELECT label, unnest([t[i:i+{n - 1}]
                                  for i in generate_series(1, len(t) - {n - 1})])
                       AS g
            FROM lg_train WHERE len(t) >= {n}
        )
    ),
    lg_counts AS (
        SELECT label, bucket, COUNT(*) AS c
        FROM lg_tgrams GROUP BY 1, 2
    ),
    lg_totals AS (
        SELECT label, SUM(c) AS t FROM lg_counts GROUP BY 1
    ),
    lg_ndocs AS (
        SELECT lang AS label, COUNT(*) AS n_docs
        FROM {labeled_rel} GROUP BY 1
    ),
    lg_stats AS (
        SELECT d.label,
               ROUND(ln(d.n_docs * 1.0
                        / (SELECT SUM(n_docs) FROM lg_ndocs)), 6) AS prior6,
               ROUND(ln(1.0 / (tt.t + {B})), 6) AS ld6
        FROM lg_ndocs d JOIN lg_totals tt ON d.label = tt.label
    ),
    lg_ll AS (
        SELECT c.label, c.bucket,
               CAST(ROUND(ln((c.c + 1) * 1.0 / (tt.t + {B})), 6)
                    - s.ld6 AS DECIMAL(20,6)) AS dlp
        FROM lg_counts c
        JOIN lg_totals tt ON c.label = tt.label
        JOIN lg_stats s ON c.label = s.label
    ),
    lg_docs AS (
        SELECT doc_id, {canon.format(c='text')} AS t FROM {docs_rel}
    ),
    lg_dbuckets AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT) % {B}
                   AS bucket,
               COUNT(*) AS cnt
        FROM (
            SELECT doc_id, unnest([t[i:i+{n - 1}]
                                   for i in generate_series(1, len(t) - {n - 1})])
                       AS g
            FROM lg_docs WHERE len(t) >= {n}
        ) GROUP BY 1, 2
    ),
    lg_ngrams AS (
        SELECT d.doc_id, COALESCE(SUM(b.cnt), 0) AS n_grams
        FROM lg_docs d LEFT JOIN lg_dbuckets b ON d.doc_id = b.doc_id
        GROUP BY 1
    ),
    lg_adj AS (
        SELECT b.doc_id, ll.label,
               SUM(CAST(b.cnt * ll.dlp AS DECIMAL(38,6))) AS adj
        FROM lg_dbuckets b JOIN lg_ll ll ON b.bucket = ll.bucket
        GROUP BY 1, 2
    ),
    lg_scores AS (
        SELECT g.doc_id, s.label, g.n_grams,
               CAST(s.prior6 AS DECIMAL(38,6))
               + CAST(g.n_grams * CAST(s.ld6 AS DECIMAL(20,6))
                      AS DECIMAL(38,6))
               + COALESCE(a.adj, CAST(0 AS DECIMAL(38,6))) AS score_dec
        FROM lg_ngrams g
        CROSS JOIN lg_stats s
        LEFT JOIN lg_adj a ON g.doc_id = a.doc_id AND s.label = a.label
    ),
    langid_pred AS (
        SELECT doc_id, label AS lang_pred,
               CAST(score_dec AS DOUBLE) AS score,
               CAST(n_grams AS BIGINT) AS n_grams
        FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY score_dec DESC, label ASC) AS rn
            FROM lg_scores
        ) WHERE rn = 1
    )"""
