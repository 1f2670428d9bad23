"""Bounded per-group top-k — the scale-safe replacement for
``row_number() OVER (PARTITION BY group ORDER BY …)``.

The ranking-window formulation shuffles EVERY row of a group into one
task and sorts it there; with few, huge groups (a per-language stratum
at 10^12 docs) that single reducer is the job's memory ceiling and
stragglers its wall clock.  This module computes the same top-k as a
two-level aggregation:

    stage 1  groupBy(group, bucket)  →  k smallest per bucket
    stage 2  groupBy(group)          →  k smallest of the ≤ B·k
                                        stage-1 survivors

where ``bucket = pmod(hash(row), B)``.  No aggregation state ever
exceeds max(|group|/B, B·k) elements: B is the knob that trades a tiny
second shuffle (≤ B·k rows per group, a few KB) for dividing the
per-task state by B — and the result is IDENTICAL for any B (top-k is
associative over partitions of the input).  Both stages get map-side
partial aggregation; the heavy input shuffles once, on (group,
bucket), which AQE can split freely — unlike a window partition,
which is indivisible.

The same shape serves deterministic sampling (top-k by a
pseudo-random sort key), vocabulary truncation (top-k by count), and
KMV sketches (k smallest hashes); see extractor/queries.py for the
oracle-checked instances.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    sort_col: Column,
    k: int,
    n_buckets: int = 32,
    with_count: bool = False,
) -> DataFrame:
    """Per-group array of the k smallest ``sort_col`` values.

    ``sort_col`` may be any orderable type; for multi-key orderings
    pass a struct (structs sort field-by-field, so
    ``struct(-n, token)`` ranks by count desc, token asc).  Returns
    one row per group: ``(*group_cols, topk array[, n_rows])``;
    ``with_count=True`` adds the group's total row count, merged
    through the same two shuffles (count is additive) instead of a
    third pass over the input.

    NULL caveat: ``array_sort`` ranks NULL sort keys LAST, while the
    ``row_number`` window's ascending default is NULLS FIRST — for a
    nullable ``sort_col`` the two formulations disagree on which rows
    make the top k.  Pass a non-null key (coalesce a sentinel, or
    filter nulls out) when porting a window that must keep the NULLS
    FIRST order; every caller in this repo uses non-null keys.
    """
    bucket = F.pmod(F.hash(sort_col), F.lit(n_buckets))
    stage1_aggs = [
        F.slice(F.array_sort(F.collect_list(sort_col)), 1, k).alias("_part")
    ]
    if with_count:
        stage1_aggs.append(F.count(F.lit(1)).alias("_cnt"))
    stage1 = df.groupBy(*group_cols, bucket.alias("_bkt")).agg(*stage1_aggs)
    stage2_aggs = [
        F.slice(F.array_sort(F.flatten(F.collect_list("_part"))), 1, k).alias("topk")
    ]
    if with_count:
        stage2_aggs.append(F.sum("_cnt").alias("n_rows"))
    return stage1.groupBy(*group_cols).agg(*stage2_aggs)


def grouped_topk_exploded(
    df: DataFrame,
    group_cols: list[str],
    sort_col: Column,
    k: int,
    n_buckets: int = 32,
) -> DataFrame:
    """:func:`grouped_topk` exploded back to ranked rows:
    ``(*group_cols, rank 1..k, value)`` — the drop-in replacement for
    a ``row_number() <= k`` filter."""
    topk = grouped_topk(df, group_cols, sort_col, k, n_buckets)
    return topk.select(
        *group_cols, F.posexplode("topk").alias("_pos", "value")
    ).select(*group_cols, (F.col("_pos") + 1).alias("rank"), "value")
