"""Growth/retention curves over an event stream: daily active, new,
returning, and cumulative distinct keys — computed the way that scales,
not the way the SQL reads.

The naive formulation — ``count(DISTINCT user) OVER (ORDER BY day ROWS
UNBOUNDED PRECEDING)`` — re-scans every prior day per day and cannot be
partially aggregated; at 100 TB it is quadratic in history. The
first-seen decomposition makes every piece one map-side-combinable
aggregation:

- ``first_day(key) = min(day)`` — one shuffle on key.
- new(day) = |{key : first_day = day}|; active(day) = |distinct (day,
  key)|; returning = active - new; cumulative(day) = running sum of
  new — and because "distinct users ever seen up to d" == "users whose
  FIRST day is <= d", that running sum over the tiny per-day frame IS
  the cumulative-distinct curve, no expanding re-scan.

All outputs are integer counts over exact sets, so the curve sits under
the full value-hash contract. The final cumulative window runs on the
per-day aggregate — one row per day (a few thousand rows for years of
history), so its single-partition sort is deliberate and bounded, never
a data-sized shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def activity_curve(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """(day, active_keys, new_keys, returning_keys, cum_keys) per day
    with >= 1 event. ``cum_keys`` counts distinct keys seen on ANY day
    <= day (the growth curve); days with zero events simply don't
    appear (the curve is a step function — join a calendar spine
    downstream if you need dense days)."""
    day = F.to_date(F.col(ts_col)).alias("day")
    # exact distinct actives per day: dedup (day, key) map-side first
    active = (
        df.select(day, F.col(key_col).alias("_k"))
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("active_keys"))
    )
    new = (
        df.select(F.col(key_col).alias("_k"), day)
        .groupBy("_k")
        .agg(F.min("day").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("new_keys"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        active.join(new, "day", "left")
        .select(
            "day",
            "active_keys",
            F.coalesce(F.col("new_keys"), F.lit(0))
            .cast("long")
            .alias("new_keys"),
        )
        .withColumn(
            "returning_keys",
            (F.col("active_keys") - F.col("new_keys")).cast("long"),
        )
        .withColumn(
            "cum_keys", F.sum("new_keys").over(w).cast("long")
        )
    )
