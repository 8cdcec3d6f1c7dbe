"""Event-sequence analytics: funnel conversion and cohort retention.

Not in the reference (its event handling stops at per-type aggregation,
``Log Analysis/log_mining_analysis.py``); these are the two standard
product-analytics observables any events table at scale gets asked for,
and both compose from the engine's existing primitives (per-user
windows, conditional aggregation).

Scale posture (100 TB events):

- :func:`funnel` costs ONE shuffle, keyed by the user column. Step-reach
  times are chained ``min(CASE ...) OVER (PARTITION BY user)`` window
  expressions: after the first Window node hash-partitions by user,
  every later step's Window and the final per-user collapse reuse that
  partitioning (Catalyst sees the child distribution satisfied — no
  further Exchange; frames are unbounded, so no sort either). The final
  per-step rollup reduces to ``n_steps`` rows via partial aggregation.
- :func:`cohort_retention` is two shuffles: user→first-day (window over
  the same user partitioning), then the (cohort, offset) distinct-user
  count. Both keys are high-cardinality and skew-free (user ids,
  day pairs); the output is |days|² rows at most — driver-safe.
- No UDFs anywhere — both operators are pure built-in-function plans
  inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from spark_ml_showcase_spark.functions.rounding import round_like_duckdb


def funnel(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    round_decimals: int = 6,
) -> DataFrame:
    """Strict-order funnel: a user reaches step ``k`` iff events of types
    ``steps[0] .. steps[k]`` occur at strictly increasing timestamps.

    Uses the classic greedy chaining (take the EARLIEST time each step
    can complete given the previous step's earliest completion) — greedy
    is exact for an unwindowed ordered funnel: an earlier step-k time
    can only widen the set of valid step-k+1 events.

    Returns one row per step: ``(step_idx, step, users, conversion)``
    where ``conversion = users / users(step 1)`` rounded to
    ``round_decimals`` (deterministic across engines).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    w = Window.partitionBy(user_col)
    df = events.select(user_col, type_col, ts_col)
    prev: Column | None = None
    reach_cols: list[str] = []
    for i, step in enumerate(steps):
        cond = F.col(type_col) == F.lit(step)
        if prev is not None:
            cond = cond & (F.col(ts_col) > prev)
        col_name = f"_s{i}"
        # Each select adds ONE window expression referencing the previous
        # step's (already materialized) column — same partitioning, so
        # only the first Window exchanges.
        df = df.withColumn(
            col_name, F.min(F.when(cond, F.col(ts_col))).over(w)
        )
        prev = F.col(col_name)
        reach_cols.append(col_name)
    per_user = df.groupBy(user_col).agg(
        *[F.max(c).alias(c) for c in reach_cols]
    )
    counts = per_user.agg(
        *[F.count(c).cast("bigint").alias(c) for c in reach_cols]
    )
    # n_steps rows out of a 1-row frame: a tiny explode, not a shuffle.
    pairs = F.array(
        *[
            F.struct(
                F.lit(i + 1).cast("bigint").alias("step_idx"),
                F.lit(step).alias("step"),
                F.col(reach_cols[i]).alias("users"),
            )
            for i, step in enumerate(steps)
        ]
    )
    return (
        counts.select(F.explode(pairs).alias("r"), F.col(reach_cols[0]).alias("_first"))
        .select(
            F.col("r.step_idx").alias("step_idx"),
            F.col("r.step").alias("step"),
            F.col("r.users").alias("users"),
            round_like_duckdb(
                F.col("r.users")
                / F.when(F.col("_first") > 0, F.col("_first")),
                round_decimals,
            ).alias("conversion"),
        )
        .orderBy("step_idx")
    )


def cohort_retention(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset: int | None = None,
    round_decimals: int = 6,
) -> DataFrame:
    """Day-granularity cohort retention: users are cohorted by their
    first active day; each later active day counts toward
    ``(cohort_day, day_offset)``.

    Returns ``(cohort_day, day_offset, users, retention)`` where
    ``cohort_day`` is an ISO ``yyyy-MM-dd`` string (engine-portable),
    ``users`` counts DISTINCT users active ``day_offset`` days after
    their cohort day, and ``retention = users / cohort size`` (the
    offset-0 count — every member is active on their first day by
    construction).
    """
    active = events.select(
        F.col(user_col).alias("_u"), F.to_date(ts_col).alias("_day")
    ).withColumn("_cohort", F.min("_day").over(Window.partitionBy("_u")))
    shaped = active.select(
        F.date_format("_cohort", "yyyy-MM-dd").alias("cohort_day"),
        F.datediff("_day", "_cohort").cast("bigint").alias("day_offset"),
        "_u",
    )
    if max_offset is not None:
        shaped = shaped.filter(F.col("day_offset") <= max_offset)
    counts = shaped.groupBy("cohort_day", "day_offset").agg(
        F.countDistinct("_u").cast("bigint").alias("users")
    )
    wc = Window.partitionBy("cohort_day")
    return (
        counts.withColumn(
            "retention",
            round_like_duckdb(
                F.col("users")
                / F.max(
                    F.when(F.col("day_offset") == 0, F.col("users"))
                ).over(wc),
                round_decimals,
            ),
        )
        .orderBy("cohort_day", "day_offset")
    )


def transition_matrix(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    round_decimals: int = 6,
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: count consecutive ``(prev_type, cur_type)`` pairs and
    normalize each row of the matrix to probabilities.

    Ordering inside a user is ``(ts, tiebreak)`` — the tiebreak makes
    the lag DETERMINISTIC when two events share a timestamp (without
    it, engines disagree on which event "comes first" and the matrix
    is not reproducible).

    Scale posture: ONE shuffle keyed by the user column (the lag
    window); the pair count that follows reduces to at most
    ``|types|²`` rows via partial aggregation, and the row-normalize
    window runs on that tiny frame. No UDFs.

    Returns ``(prev_type, cur_type, transitions, prob)`` where ``prob``
    is the row-conditional probability rounded to ``round_decimals``.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    pairs = (
        events.select(user_col, ts_col, tiebreak_col, type_col)
        .withColumn("_prev", F.lag(type_col).over(w))
        .filter(F.col("_prev").isNotNull())
    )
    counts = pairs.groupBy(
        F.col("_prev").alias("prev_type"), F.col(type_col).alias("cur_type")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("transitions"))
    wrow = Window.partitionBy("prev_type")
    return counts.withColumn(
        "prob",
        round_like_duckdb(
            F.col("transitions") / F.sum("transitions").over(wrow),
            round_decimals,
        ),
    ).orderBy("prev_type", "cur_type")


def chi_square_independence(
    df: DataFrame,
    row_col: Column,
    col_col: Column,
    *,
    round_decimals: int = 6,
) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns, plus Cramér's V effect size — the exact-statistic analogue
    of ``pyspark.ml.stat.ChiSquareTest`` kept entirely in SQL algebra
    so it cross-checks against any ANSI engine.

    One shuffle builds the contingency table (at most
    ``|rows|·|cols|`` cells — tiny for categorical data); marginals are
    window sums over that tiny frame, so the statistic costs ONE scan
    of the input. Expected counts use double division in a fixed
    order (``row_tot * col_tot / n``) and the final statistic is
    rounded, keeping the result engine-portable.

    Returns a single row ``(n, dof, chi2, cramers_v)``.
    """
    cells = df.select(
        row_col.alias("_r"), col_col.alias("_c")
    ).groupBy("_r", "_c").agg(F.count(F.lit(1)).cast("double").alias("_o"))
    wr = Window.partitionBy("_r")
    wc = Window.partitionBy("_c")
    wall = Window.partitionBy()
    terms = (
        cells.withColumn("_rt", F.sum("_o").over(wr))
        .withColumn("_ct", F.sum("_o").over(wc))
        .withColumn("_n", F.sum("_o").over(wall))
        .withColumn("_e", F.col("_rt") * F.col("_ct") / F.col("_n"))
        .withColumn(
            # (o-e)*(o-e), not pow(o-e, 2): self-multiply is the same
            # IEEE operation in every engine; pow(x, 2.0) need not be.
            "_t",
            (F.col("_o") - F.col("_e"))
            * (F.col("_o") - F.col("_e"))
            / F.col("_e"),
        )
    )
    return terms.agg(
        F.max("_n").cast("bigint").alias("n"),
        (
            (F.countDistinct("_r") - F.lit(1))
            * (F.countDistinct("_c") - F.lit(1))
        ).cast("bigint").alias("dof"),
        round_like_duckdb(F.sum("_t"), round_decimals).alias("chi2"),
        # degenerate contract: if either variable has ONE category the
        # test is undefined (dof = 0) — emit NULL explicitly rather
        # than letting the 0-division produce NaN/Infinity silently.
        F.when(
            F.least(
                F.countDistinct("_r") - F.lit(1),
                F.countDistinct("_c") - F.lit(1),
            )
            > 0,
            F.round(
                F.sqrt(
                    F.sum("_t")
                    / (
                        F.max("_n")
                        * F.least(
                            F.countDistinct("_r") - F.lit(1),
                            F.countDistinct("_c") - F.lit(1),
                        )
                    )
                ),
                round_decimals,
            ),
        ).alias("cramers_v"),
    )


def sessionize(
    events: DataFrame,
    *,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Inactivity-gap sessionization with EXPLICIT session ids: a new
    session starts when the gap since the user's previous event
    exceeds ``gap_seconds``. Unlike ``F.session_window`` (which only
    aggregates), this assigns a stable per-user ``session_seq`` and
    returns one summary row per session — the shape funnels, path
    analysis and per-session features consume.

    Scale posture: ONE shuffle (the user window); the running
    boundary-count that numbers sessions reuses the same
    partitioning+sort, and the final per-session rollup groups on
    (user, session_seq) — a superset of the window's hash key, so
    Catalyst inserts no further Exchange. All arithmetic is epoch-
    second BIGINT; (ts, tiebreak) ordering makes same-timestamp events
    deterministic.

    Output: ``(user_id, session_seq, n_events, start_epoch, end_epoch,
    duration_sec)``.
    """
    epoch = F.col(ts_col).cast("long")
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marked = events.select(
        user_col, ts_col, tiebreak_col, epoch.alias("_e")
    ).withColumn(
        "_new",
        F.when(
            (F.col("_e") - F.lag("_e").over(w)) > gap_seconds, 1
        ).otherwise(
            F.when(F.lag("_e").over(w).isNull(), 1).otherwise(0)
        ),
    )
    numbered = marked.withColumn(
        "session_seq", F.sum("_new").over(run).cast("bigint")
    )
    return numbered.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min("_e").alias("start_epoch"),
        F.max("_e").alias("end_epoch"),
        (F.max("_e") - F.min("_e")).alias("duration_sec"),
    )


def psi_drift(
    df: DataFrame,
    *,
    value_col: str,
    segment_col: str,
    period_col: Column | str,
    base_period,
    n_bins: int = 10,
    eps: float = 1e-6,
    round_decimals: int = 6,
    exact_edges: bool = True,
) -> DataFrame:
    """Population Stability Index per segment and period — THE standard
    production drift monitor for a feature feeding a trained model:
    ``PSI = Σ_bins (p_cur − p_base) · ln(p_cur / p_base)`` with bin
    edges frozen from the base period (interpolated
    ``(n_bins − 1)``-quantiles per segment). Rule of thumb: < 0.1
    stable, 0.1–0.25 drifting, > 0.25 retrain.

    Scale shape: ONE percentile agg over the base period (segments ×
    (n_bins−1) doubles — broadcast-tiny), bin assignment is a
    segment-keyed equi-join + a count-of-smaller-edges array expression
    (no per-row UDF, no range join), then one (segment, period, bin)
    count. The bin grid is exploded from the distinct (segment, period)
    pairs so empty bins still contribute their ``(0 − p_base)·ln`` term
    — dropping them understates drift exactly when it matters.

    Cross-engine determinism: shares are exact count ratios; each
    bin's term is ROUNDed then summed in DECIMAL (order-free — a plain
    double SUM of transcendental terms is partition-order dependent);
    ``eps`` clamps empty-bin shares the same way in both engines.

    ``exact_edges=False`` swaps the interpolated percentile for
    ``percentile_approx`` (GK sketch, mergeable, no per-segment sort) —
    the 100 TB edge-fit path: edge placement error only nudges bin
    boundaries, the SAME edges still apply to base and current periods,
    so planted shifts score identically (probe-asserted at 50M rows).
    Keep the exact default for oracle-checked callers.

    Output: ``(segment, period, n, psi)`` for every period except the
    base, ordered.
    """
    pc = F.col(period_col) if isinstance(period_col, str) else period_col
    seg, val = F.col(segment_col), F.col(value_col)
    d = df.select(
        seg.alias("_seg"), pc.alias("_per"), val.cast("double").alias("_v")
    ).filter(F.col("_v").isNotNull())
    qs = [i / n_bins for i in range(1, n_bins)]
    pct = F.percentile if exact_edges else (
        lambda c, q: F.percentile_approx(c, q, 10_000)
    )
    edges = d.filter(F.col("_per") == F.lit(base_period)).groupBy("_seg").agg(
        pct("_v", F.array(*[F.lit(q) for q in qs])).alias("_edges")
    )
    binned = d.join(edges, "_seg").select(
        "_seg",
        "_per",
        F.size(F.filter("_edges", lambda e: F.col("_v") > e)).alias("_bin"),
    )
    counts = binned.groupBy("_seg", "_per", "_bin").agg(
        F.count(F.lit(1)).alias("_n")
    )
    return psi_from_bin_counts(
        counts,
        segment_col=segment_col,
        base_period=base_period,
        n_bins=n_bins,
        eps=eps,
        round_decimals=round_decimals,
    )


def psi_from_bin_counts(
    counts: DataFrame,
    *,
    segment_col: str,
    base_period,
    n_bins: int = 10,
    eps: float = 1e-6,
    round_decimals: int = 6,
) -> DataFrame:
    """PSI from pre-binned counts ``(_seg, _per, _bin, _n)`` — the
    share/grid/term stage of :func:`psi_drift`, split out so a
    STREAMING ingest can produce the counts (a finite stream's final
    complete-mode aggregate equals the batch aggregate, so the math —
    and the oracle — are identical; see ``stream_psi_weekly``)."""
    totals = counts.groupBy("_seg", "_per").agg(
        F.sum("_n").alias("_tot")
    )
    grid = totals.select(
        "_seg",
        "_per",
        "_tot",
        F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("_bin"),
    )
    shares = grid.join(counts, ["_seg", "_per", "_bin"], "left").select(
        "_seg",
        "_per",
        "_bin",
        "_tot",
        (F.coalesce("_n", F.lit(0)) / F.col("_tot")).alias("_p"),
    )
    base = shares.filter(F.col("_per") == F.lit(base_period)).select(
        "_seg", "_bin", F.col("_p").alias("_pb")
    )
    cur = shares.filter(F.col("_per") != F.lit(base_period))
    term = F.round(
        (F.col("_p") - F.col("_pb"))
        * F.log(
            F.greatest(F.col("_p"), F.lit(eps))
            / F.greatest(F.col("_pb"), F.lit(eps))
        ),
        round_decimals,
    )
    return (
        cur.join(base, ["_seg", "_bin"])
        .select(
            "_seg", "_per", "_tot", term.cast("decimal(20,6)").alias("_t")
        )
        .groupBy("_seg", "_per")
        .agg(
            F.first("_tot").alias("n"),
            F.sum("_t").cast("double").alias("psi"),
        )
        .select(
            F.col("_seg").alias(segment_col),
            F.col("_per").alias("period"),
            F.col("n").cast("bigint").alias("n"),
            "psi",
        )
        .orderBy(segment_col, "period")
    )
