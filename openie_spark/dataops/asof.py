"""As-of (nearest-prior) join — the time-series operator Spark's built-in
joins lack, shaped for scale.

A naive as-of is a range join (``l.ts >= r.ts`` + per-row argmax), which
Spark plans as a broadcast-nested-loop or sort-merge over an exploded
range — quadratic blowup per key at web scale. This implementation is the
UNION + WINDOW shape instead: tag both sides, union on the (by, on) keys,
sort each key group once, and carry the most recent right-side payload
forward with ``last(..., ignoreNulls=True)`` over an unbounded-preceding
running window. One shuffle on ``by``, O(n log n) per key, no join node
at all — the plan a 100 TB event stream needs (AQE handles skewed keys;
no CartesianProduct is reachable, plan-tested).

Tie semantics (pinned by the driver oracle vs DuckDB's native ASOF JOIN):
the match is INCLUSIVE (a right row at exactly ``l.on`` matches, like
DuckDB's ``l.ts >= r.ts``). Right rows must be unique per (by, on) —
pre-aggregate duplicates (e.g. keep the max event id); the function
raises nothing itself, but with duplicate (by, on) right rows the
surviving payload is the last in (on, tie) order, which is
nondeterministic — dedupe first, as the entry query does.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Union[str, Sequence[str], None] = None,
    direction: str = "backward",
    tolerance: Optional[float] = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every left row, plus the payload of the nearest
    right row at-or-before it (``direction="backward"``) or at-or-after
    it (``"forward"``) within the same ``by`` group; unmatched rows keep
    NULL payloads (left-outer semantics).

    ``tolerance``: max allowed |left.on - match.on| — in SECONDS for
    timestamp ``on`` columns, in the column's own units for numeric ones;
    matches farther away are nulled out (the row still survives).

    Output: all left columns + ``{prefix}{on}`` (the matched right ``on``
    value) + one ``{prefix}{col}`` per right payload column.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward: {direction!r}")
    by_cols: List[str] = (
        [] if by is None else ([by] if isinstance(by, str) else list(by))
    )
    payload = [c for c in right.columns if c != on and c not in by_cols]
    if not payload:
        raise ValueError("right side has no payload columns besides keys")

    l_only = [c for c in left.columns if c not in by_cols]
    r_types = dict(right.dtypes)
    l_types = dict(left.dtypes)

    left_t = left.select(
        *[F.col(c) for c in by_cols],
        *[F.col(c) for c in l_only],
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(r_types[on]).alias("_r_on"),
        *[F.lit(None).cast(r_types[c]).alias(f"_r_{c}") for c in payload],
    )
    right_t = right.select(
        *[F.col(c) for c in by_cols],
        *[
            (F.col(on) if c == on else F.lit(None).cast(l_types[c])).alias(c)
            for c in l_only
        ],
        F.lit(0).alias("_is_left"),
        F.col(on).alias("_r_on"),
        *[F.col(c).alias(f"_r_{c}") for c in payload],
    )
    unioned = left_t.unionByName(right_t)

    # inclusive tie order: at equal `on`, the right row (0) sorts before
    # the left row (1) so the running last() already sees it
    order = (
        [F.col(on).asc(), F.col("_is_left").asc()]
        if direction == "backward"
        else [F.col(on).desc(), F.col("_is_left").asc()]
    )
    w = (
        Window.partitionBy(*[F.col(c) for c in by_cols])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        F.last("_r_on", ignorenulls=True).over(w).alias("_m_on"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in payload
        ],
    )
    out = carried.filter(F.col("_is_left") == 1)

    if tolerance is not None:
        is_ts = r_types[on].startswith("timestamp")
        lo = F.col(on).cast("double") if not is_ts else F.unix_timestamp(on)
        mo = (
            F.col("_m_on").cast("double")
            if not is_ts
            else F.unix_timestamp("_m_on")
        )
        gap = (lo - mo) if direction == "backward" else (mo - lo)
        ok = F.col("_m_on").isNotNull() & (gap <= F.lit(float(tolerance)))

        def keep(c):
            return F.when(ok, F.col(c)).otherwise(F.lit(None))
        out = out.withColumn("_m_on", keep("_m_on"))
        for c in payload:
            out = out.withColumn(f"_m_{c}", keep(f"_m_{c}"))

    return out.select(
        *[F.col(c) for c in by_cols],
        *[F.col(c) for c in l_only],
        F.col("_m_on").alias(f"{prefix}{on}"),
        *[F.col(f"_m_{c}").alias(f"{prefix}{c}") for c in payload],
    )
