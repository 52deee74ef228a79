"""Rank calibration: per-group percent-rank as a TABLE over distinct
values — the score-normalization step before mixing heterogeneous
quality signals ("is 0.73 from scorer A better than 0.9 from scorer
B?" — compare ranks, not raw scores).

The naive formulation windows over every ROW (``percent_rank() OVER
(ORDER BY v)``), which is a single-reducer global sort at 100 TB. This
operator instead aggregates to DISTINCT (group, value) counts first —
a map-side-combinable groupBy — and windows over that far smaller frame
(bounded by distinct scores, which for quantized quality signals is
thousands, not billions). The result is a calibration TABLE the caller
broadcast-joins back onto the data; rank semantics match SQL
``rank()`` exactly (ties share the rank of their first row).

All integers: the value is quantized to bigint micros per row (the
repo's standard round(v*1e6) portable quantizer), ``rank`` = 1 +
cumulative count of strictly-smaller values, and ``pr_micros`` =
``1e6 * (rank - 1) div (n_group - 1)`` (0 for a single-row group) — so
percent-rank, normally a float, sits under the full value-hash
contract.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def rank_calibration(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """(group..., value_micros, n_rows, rank, n_group, pr_micros) per
    DISTINCT (group, quantized value): ``n_rows`` = rows at that value,
    ``rank`` = SQL rank() of those rows, ``pr_micros`` = integer
    percent-rank in [0, 1e6]. Join it back on (group, value_micros) to
    calibrate row scores."""
    g = list(group_cols)
    vm = F.round(F.col(value_col) * 1e6).cast("bigint")
    counts = (
        df.select(*g, vm.alias("value_micros"))
        .groupBy(*g, "value_micros")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
    wg = Window.partitionBy(*g) if g else Window.partitionBy()
    ordered = wg.orderBy("value_micros")
    cum = (
        F.sum("n_rows")
        .over(ordered.rowsBetween(Window.unboundedPreceding, -1))
    )
    total = F.sum("n_rows").over(wg)
    return (
        counts.withColumn("rank", (F.coalesce(cum, F.lit(0)) + 1).cast("long"))
        .withColumn("n_group", total.cast("long"))
        .withColumn(
            "pr_micros",
            F.when(F.col("n_group") > 1,
                   F.expr("(1000000 * (rank - 1)) div (n_group - 1)"))
            .otherwise(F.lit(0))
            .cast("long"),
        )
    )
