"""K-step ordered funnel matching over an events table.

Sequential-pattern analytics (the "view → click → purchase" family):
for each user, find the first occurrence of step 1, then the first
occurrence of step 2 STRICTLY after it, and so on — one row per user
who completed at least step 1, with the per-step timestamps and the
number of steps reached.

Scale shape (the reason this is K-1 joins and not a window): each
stage is a per-user ``min`` aggregate over the events of ONE type,
then an equi-join on the user key against the survivors of the
previous stage.  Every join and every aggregate keys on the same
column, so one hash partitioning serves the whole chain (Exchange
reuse), each stage's input shrinks to the users still in the funnel,
and the raw event stream is never windowed or sorted per user — at
10^12 events a per-user ordering window is a full shuffle + sort of
the stream, while this shape moves only (user, ts) pairs after the
first per-type filter.

Generalizes the registry's events_funnel entry (VERDICT r3 #3);
K-independence — running a K-step funnel and truncating equals
running the truncated funnel — is property-tested in
tests/test_properties.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Strictly-ordered funnel over ``steps`` event types.

    Returns one row per user with a step-1 event: ``(user_col, t1,
    …, tK, steps)`` where ``t<i>`` is the timestamp of the first
    step-i event strictly after ``t<i-1>`` (NULL once the user drops
    out) and ``steps`` counts completed stages.  ``min(ts)`` makes
    every stage deterministic — timestamps are values, not row picks.
    """
    if not steps:
        raise ValueError("funnel requires at least one step")
    ev = events.select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("event_type"),
        F.col(ts_col).alias("ts"),
    )
    stages: list[DataFrame] = []
    for i, ev_type in enumerate(steps, start=1):
        s = ev.filter(F.col("event_type") == ev_type)
        if stages:
            s = s.join(stages[-1].select("user_id", f"t{i - 1}"), "user_id").filter(
                F.col("ts") > F.col(f"t{i - 1}")
            )
        stages.append(s.groupBy("user_id").agg(F.min("ts").alias(f"t{i}")))

    out = stages[0]
    for s in stages[1:]:
        out = out.join(s, "user_id", "left")

    # Single cascading CASE, deepest stage first (matches the SQL
    # oracle's CASE shape).
    expr: Column | None = None
    for i in range(len(steps), 1, -1):
        expr = (
            F.when(F.col(f"t{i}").isNotNull(), i)
            if expr is None
            else expr.when(F.col(f"t{i}").isNotNull(), i)
        )
    steps_col = (expr.otherwise(1) if expr is not None else F.lit(1)).cast("int")
    return out.select(
        F.col("user_id").alias(user_col),
        *[F.col(f"t{i}") for i in range(1, len(steps) + 1)],
        steps_col.alias("steps"),
    )

def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix: users grouped by the bucket of their
    FIRST event (the cohort), counted in every later bucket they were
    active in — the lifecycle complement to :func:`funnel`, and the
    per-crawl-wave analog for corpus work (which ingestion wave a
    host entered the corpus in vs which waves it still contributes
    pages to).

    Buckets are integer epoch buckets ``(epoch_day div bucket_days)``
    — pure arithmetic, no calendar semantics, so every engine agrees
    exactly (date_trunc('week') already matches Monday-start between
    Spark and DuckDB, but integer buckets can't drift by locale or
    week-numbering rules at all).

    Returns ``(cohort_week, week_offset, n_users)``: offset 0 rows
    are cohort sizes; retention rate at offset k is
    ``n_users(k) / n_users(0)`` driver-side.

    Scale shape: ONE wide shuffle — the distinct (user, bucket)
    projection (map-side partial distinct folds each user's events
    within a bucket before the wire; payload is two longs per active
    user-bucket, never the event rows).  The per-user min and the
    activity join both key on user, so the same hash partitioning
    serves the chain (Exchange reuse, same argument as funnel); the
    final (cohort, offset) rollup is cohorts×offsets-sized."""
    wk = (
        events.select(
            F.col(user_col).alias("user_id"),
            F.floor(
                F.datediff(F.to_date(F.col(ts_col)), F.lit("1970-01-01"))
                / bucket_days
            ).cast("long").alias("week"),
        )
        .distinct()
    )
    first = wk.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        wk.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def rate_spikes(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    window_hours: int = 3,
    min_count: int = 10,
    spike_ratio_bp: int = 30000,
) -> DataFrame:
    """Hourly burst detection per event type — the monitoring view
    that catches a crawler loop, a bot flood, or an ingest backlog
    flush the moment one hour's rate leaves the recent baseline.

    Definitions (integer-exact, engine-agnostic): events bucket to
    ``hour_idx = epoch_seconds div 3600``; the baseline for an hour
    is the SUM of the previous ``window_hours`` hours' counts divided
    (floor) by ``window_hours`` — absent hours count as zero rate (a
    RANGE window over the integer hour index, so gaps are real
    zeros, not skipped rows); ``ratio_bp = n·10000 div
    max(baseline, 1)``; ``is_spike`` requires n ≥ min_count, ratio ≥
    spike_ratio_bp AND a non-empty baseline (the first hours of a
    type have no history and must not all flag).

    Scale shape: the corpus reduces to the (type, hour) COUNT table
    first (one aggregate with map-side partials); the window runs
    over that aggregate — |types|·|hours| rows, thousands per year —
    never over raw events.  Returns (event_type, hour_idx, n_events,
    baseline, ratio_bp, is_spike)."""
    from pyspark.sql import Window, functions as F

    hourly = (
        events.select(
            F.col(type_col).alias("event_type"),
            F.expr(f"unix_timestamp({ts_col}) div 3600").alias("hour_idx"),
        )
        .groupBy("event_type", "hour_idx")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_idx")
        .rangeBetween(-window_hours, -1)
    )
    trailing = F.coalesce(F.sum("n_events").over(w), F.lit(0))
    out = hourly.withColumn("_tr", trailing).select(
        "event_type",
        "hour_idx",
        F.col("n_events").cast("long").alias("n_events"),
        F.expr(f"_tr div {window_hours}").cast("long").alias("baseline"),
        F.expr(
            f"n_events * 10000 div greatest(_tr div {window_hours}, 1L)"
        ).cast("long").alias("ratio_bp"),
        (
            (F.col("n_events") >= min_count)
            & (F.col("_tr") > 0)
            & (
                F.expr(
                    f"n_events * 10000 div greatest(_tr div {window_hours}, 1L)"
                )
                >= spike_ratio_bp
            )
        ).alias("is_spike"),
    )
    return out
