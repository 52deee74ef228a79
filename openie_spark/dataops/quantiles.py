"""Exact per-group quantiles (``percentile_disc``) at shuffle scale.

``approxQuantile`` / ``percentile_approx`` trade accuracy for speed and
are driver-side or sketch-based; data audits (token-length cutoffs,
quality-score thresholds) often need the EXACT order statistic, and
need it per group. This computes ANSI ``percentile_disc(q) WITHIN GROUP
(ORDER BY v)`` — the smallest element whose cumulative distribution is
>= q — with ONE shuffle: a window sort per group assigns ``row_number``
and the group size, then the rank-hit rows collapse via a groupBy that
reuses the window's hash partitioning (no second exchange; plan-tested).

The selected value is an EXISTING element of the group (never an
interpolation), so results are bitwise engine-portable. The rank is
``max(1, ceil(q * n))``; with dyadic q (0.25, 0.5, 0.75, …, k/2^m —
exactly representable doubles) the float ceil is exact for any group
size below 2^52, and the boundary decision provably matches an engine
comparing ``rn/n >= q`` in floats: at the first qualifying rank the
rational gap |rn/n - q| is either 0 (both exact) or >= 1/(n * 2^m),
astronomically wider than double rounding error. Non-dyadic q is
accepted but the last-rank choice may differ from another engine by one
element when q*n lands within an ulp of an integer — pass dyadic q when
cross-engine equality matters.

Scale note: the per-group sort is O(n log n) inside each group's
partitions; a single pathological group still sorts in parallel across
its partitions (Spark's window sort is a partial sort + merge), and no
row leaves the one exchange.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_quantiles(
    df: DataFrame,
    value_col: str,
    qs: Sequence[float],
    by: Union[str, Sequence[str]] = "event_type",
    prefix: str = "p",
) -> DataFrame:
    """One row per group: ``n`` (group size) plus, for each q in ``qs``,
    a column ``{prefix}{q*100:g}`` holding the exact percentile_disc
    element of ``value_col`` (e.g. qs=[0.25, 0.5] → p25, p50). NULL
    values are excluded from both n and the ranks, matching
    ``WITHIN GROUP`` semantics."""
    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"quantiles must be in (0, 1]: {q}")
    by_cols = [by] if isinstance(by, str) else list(by)
    grp = Window.partitionBy(*[F.col(c) for c in by_cols])
    w = grp.orderBy(F.col(value_col).asc())

    ranked = df.filter(F.col(value_col).isNotNull()).select(
        *by_cols,
        F.col(value_col).alias("_v"),
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(grp).alias("_n"),
    )

    def _name(q: float) -> str:
        return f"{prefix}{q * 100:g}".replace(".", "_")

    hits = [
        F.max(
            F.when(
                F.col("_rn")
                == F.greatest(F.lit(1), F.ceil(F.lit(float(q)) * F.col("_n"))),
                F.col("_v"),
            )
        ).alias(_name(q))
        for q in qs
    ]
    # groupBy on the window's partition keys: Catalyst reuses the existing
    # hash partitioning — the whole computation is a single exchange
    return ranked.groupBy(*by_cols).agg(
        F.max("_n").alias("n"), *hits
    )
