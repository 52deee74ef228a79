"""Point-in-interval (range) join and time-range rolling aggregates —
two event-table operators Spark has no scale-safe built-in for.

``interval_join``: match every point row to the interval rows that
contain its timestamp. The naive formulation is a theta-join
(``p.ts BETWEEN i.start AND i.end``), which Spark plans as a
BroadcastNestedLoopJoin (or a cartesian when neither side fits in
memory) — quadratic per key at web scale. This implementation bins
time instead: each interval explodes to the fixed-width bins it spans,
each point maps to exactly ONE bin, and the match becomes a plain
equi-join on ``(by…, bin)`` followed by the exact residual predicate.
A (point, interval) pair can meet in at most one bin — the point's —
so the equi-join introduces NO duplicate pairs and needs no dedupe.
Bin arithmetic is integer microseconds end-to-end (``unix_micros``),
so bin assignment can never disagree with the residual filter at a
boundary (float epoch division could mis-bin a point by one ulp and
silently DROP a true match — false negatives the residual can't
repair). One shuffle per side; skewed (key, bin) buckets are ordinary
equi-join skew, handled by AQE's skew-join split.

Sizing ``bin_seconds``: each interval produces
``ceil(span / bin_seconds) + 1`` join rows — pick the bin near the
TYPICAL interval span so blow-up stays ~2× (too-small bins multiply
the interval side; too-large bins put unrelated points in one bucket
and shift work to the residual filter).

``rolling_agg``: per-row sliding-window features ("events by this user
in the preceding hour") via a single ``rangeBetween`` window over
integer microseconds — one shuffle on the key, no self-join, exact
boundary semantics shared with ANSI ``RANGE … PRECEDING`` (both ends
inclusive, ties are peers).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .timeutil import epoch_micros

_US = 1_000_000


def _bin_of(df: DataFrame, ts_col: str, bin_seconds: int) -> Column:
    # integer-micros floor division: exact at every boundary, unlike
    # floor(epoch_double / width) whose division can round across a bin
    # (micros derivation is dtype-aware and session-TZ-independent —
    # see timeutil.epoch_micros)
    return F.floor(epoch_micros(df, ts_col) / F.lit(bin_seconds * _US))


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    by: Union[str, Sequence[str], None] = None,
    bin_seconds: int = 3600,
    how: str = "inner",
    end_inclusive: bool = False,
    prefix: str = "ivl_",
) -> DataFrame:
    """Join each point row to every interval row containing it:
    ``start <= point_ts < end`` (``<= end`` with ``end_inclusive``),
    optionally scoped to equal ``by`` keys.

    ``how``: ``inner`` (point columns + prefixed interval columns, one
    output row per matching pair), ``left_semi`` (points inside at
    least one interval), ``left_anti`` (points inside none) — the
    latter two keep point columns only and never duplicate points.

    Intervals with ``end < start`` match nothing and are dropped (they
    would otherwise make the bin sequence ill-formed).
    """
    if how not in ("inner", "left_semi", "left_anti"):
        raise ValueError(f"how must be inner/left_semi/left_anti: {how!r}")
    by_cols = [] if by is None else ([by] if isinstance(by, str) else list(by))
    for c in (start_col, end_col, *by_cols):
        if c not in intervals.columns:
            raise ValueError(f"intervals is missing column {c!r}")

    p = points.withColumn("_p_bin", _bin_of(points, point_ts, bin_seconds))
    ivl = intervals.filter(F.col(end_col) >= F.col(start_col)).select(
        *[F.col(c).alias(f"{prefix}{c}") for c in intervals.columns],
        F.explode(
            F.sequence(
                _bin_of(intervals, start_col, bin_seconds),
                _bin_of(intervals, end_col, bin_seconds),
            )
        ).alias("_i_bin"),
    )

    upper = (
        F.col(point_ts) <= F.col(f"{prefix}{end_col}")
        if end_inclusive
        else F.col(point_ts) < F.col(f"{prefix}{end_col}")
    )
    cond = F.col("_p_bin") == F.col("_i_bin")
    for k in by_cols:
        cond = cond & (F.col(k) == F.col(f"{prefix}{k}"))
    cond = cond & (F.col(point_ts) >= F.col(f"{prefix}{start_col}")) & upper

    if how in ("left_semi", "left_anti"):
        out = p.join(ivl, on=cond, how=how)
        return out.select(*points.columns)
    joined = p.join(ivl, on=cond, how="inner")
    keep = [F.col(c) for c in points.columns] + [
        F.col(f"{prefix}{c}")
        for c in intervals.columns
        if c not in by_cols  # by keys are equal by construction: keep once
    ]
    return joined.select(*keep)


def rolling_agg(
    df: DataFrame,
    aggs: Dict[str, Column],
    ts_col: str = "ts",
    by: Union[str, Sequence[str]] = "user_id",
    window_seconds: int = 3600,
    min_periods: Optional[int] = None,
) -> DataFrame:
    """Append per-row sliding-window aggregate columns: for each row,
    ``aggs`` evaluated over all rows of the same ``by`` group whose
    ``ts_col`` lies in ``[row.ts - window_seconds, row.ts]`` (both ends
    inclusive; rows with equal timestamps are peers and always included
    together, matching ANSI RANGE frames). ``aggs`` maps output column
    name → an un-windowed aggregate expression, e.g.
    ``{"n_1h": F.count(F.lit(1)), "sum_us": F.sum("value_us")}`` —
    keep sums in integer units so results are partition-order-exact.

    One shuffle on ``by``; ordering and frame bounds are integer
    microseconds, so boundary inclusion is exact cross-engine.
    ``min_periods``: rows whose window holds fewer rows than this get
    NULL feature values (warm-up masking for training features).
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    w = (
        Window.partitionBy(*[F.col(c) for c in by_cols])
        .orderBy(epoch_micros(df, ts_col))
        .rangeBetween(-window_seconds * _US, 0)
    )
    out = df.select(
        "*", *[expr.over(w).alias(name) for name, expr in aggs.items()]
    )
    if min_periods is not None:
        n = F.count(F.lit(1)).over(w)
        out = out.select(
            *df.columns,
            *[
                F.when(n >= min_periods, F.col(name))
                .otherwise(F.lit(None))
                .alias(name)
                for name in aggs
            ],
        )
    return out
