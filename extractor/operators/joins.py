"""Temporal join operators Spark lacks natively: as-of and
time-range joins, in their scale-safe formulations.

Spark has no ASOF JOIN operator and compiles a raw interval predicate
to a nested-loop join.  These functions re-express both as
equi-join-shaped plans so they hash-partition, broadcast, and
AQE-skew-split like any other join:

* :func:`asof_join` — union-the-sides + one ``last(ignoreNulls)``
  window pass: sort (by, on, side) within each key and carry the most
  recent right-side row forward.  ONE shuffle on the equality keys, no
  range self-join, no per-row probe — the merge-scan a database ASOF
  join compiles to, in stock DataFrame ops.
* :func:`time_range_join` — bucket time into cells the width of the
  interval and equi-join on (keys, cell ± neighbors), then apply the
  exact interval predicate.  The join is hash-based with bounded
  candidates; the equi-key carries the skew machinery a pure range
  predicate cannot use.

The oracle-checked registry instances (`events_asof_join`,
`events_range_join` in extractor.queries) are built on these.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    on: str,
    value_cols: dict[str, str],
    tie_breakers: list[str] | None = None,
) -> DataFrame:
    """Backward as-of join: each left row gains the right row with the
    greatest ``on`` ≤ the left row's ``on``, within equal ``by`` keys.

    ``value_cols`` maps right-side column → output alias; the output
    also carries ``{on}_right`` (the matched right timestamp, null if
    no prior right row).  ``tie_breakers`` are columns present on BOTH
    sides ordering simultaneous rows deterministically (right side
    sorts before left at equal ``on``, so an exactly-simultaneous
    right row IS eligible — the reference "prior-or-simultaneous"
    semantics).

    Row atomicity: ALL right-side output columns (``{on}_right`` and
    every value column) travel as ONE struct through a single
    ``last(ignoreNulls)`` — so a matched right row is carried whole,
    even when some of its value columns are NULL.  Per-column carries
    would instead backfill a NULL cell from an OLDER right row,
    emitting a composite of different right rows."""
    tie_breakers = tie_breakers or []
    left_extra = [
        c for c in left.columns if c not in by and c != on and c not in tie_breakers
    ]

    rstruct = F.struct(
        F.col(on).alias(f"{on}_right"),
        *[F.col(src).alias(dst) for src, dst in value_cols.items()],
    )
    l_tagged = left.select(
        *by, on, *tie_breakers, *left_extra,
        F.lit(1).alias("_side"),
        F.lit(None).cast(
            right.select(rstruct.alias("_r")).schema["_r"].dataType
        ).alias("_r"),
    )
    r_tagged = right.select(
        *by, on, *tie_breakers,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_extra],
        F.lit(0).alias("_side"),
        rstruct.alias("_r"),
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(on, "_side", *tie_breakers)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        *by, on, *tie_breakers, *left_extra, "_side",
        F.last("_r", ignorenulls=True).over(w).alias("_r"),
    )
    return carried.filter(F.col("_side") == 1).select(
        *by, on, *tie_breakers, *left_extra,
        F.col(f"_r.{on}_right").alias(f"{on}_right"),
        *[F.col(f"_r.{dst}").alias(dst) for dst in value_cols.values()],
    )


def time_range_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    on: str,
    lower_s: int,
    upper_s: int,
    right_prefix: str = "r_",
) -> DataFrame:
    """Inner join of left rows to right rows whose ``on`` lies in
    ``[left.on + lower_s, left.on + upper_s]`` (seconds, inclusive),
    within equal ``by`` keys.

    Scale shape: cell width = the interval span; each left row
    explodes to the 2-3 cells its window can touch, the join is an
    equi-join on (by, cell), and the EXACT interval predicate (proper
    timestamp arithmetic, not truncated epochs — truncation flips
    sub-second boundary cases) filters candidates.  Returns left
    columns + right columns prefixed ``right_prefix``; zero-match left
    rows are absent (callers wanting them left-join back, see
    `events_range_join`)."""
    assert lower_s <= upper_s
    span = max(upper_s - lower_s, 1)

    def cell_of(c: Column) -> Column:
        return F.floor(c.cast("timestamp_ltz").cast("long") / span)

    lo_cell = cell_of(F.col(on) + F.expr(f"INTERVAL {lower_s} SECONDS"))
    hi_cell = cell_of(F.col(on) + F.expr(f"INTERVAL {upper_s} SECONDS"))
    l_cells = left.select(
        "*", F.explode(F.sequence(lo_cell, hi_cell)).alias("_cell")
    )
    r_cols = [c for c in right.columns if c not in by]
    r_cells = right.select(
        *by,
        *[F.col(c).alias(f"{right_prefix}{c}") for c in r_cols],
        cell_of(F.col(on)).alias("_cell"),
    )
    r_on = f"{right_prefix}{on}"
    lo = F.col(on) + F.expr(f"INTERVAL {lower_s} SECONDS")
    hi = F.col(on) + F.expr(f"INTERVAL {upper_s} SECONDS")
    return (
        l_cells.join(r_cells, [*by, "_cell"])
        .filter((F.col(r_on) >= lo) & (F.col(r_on) <= hi))
        .drop("_cell")
    )
