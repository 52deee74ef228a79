"""First-touch funnel analysis: how far each user progresses through an
ordered sequence of event types — the conversion query every
product/events pipeline runs.

Semantics (the standard greedy first-match funnel): scan a user's
events in time order; at state k (seeking step k+1), accept the FIRST
event whose type matches step k+1 and whose timestamp is STRICTLY
after the previously accepted step. This greedy scan is provably
equivalent to the iterated conditional minimum
``t_{k+1} = min{ts : type = s_{k+1}, ts > t_k}`` — which is exactly how
the DuckDB oracle recomputes it, making the oracle an independent
second implementation rather than a replay.

Scale shape: ONE shuffle (groupBy user), then a JVM-side
``sort_array`` + ``aggregate`` fold over each user's event array — no
UDF, no self-joins (the textbook SQL needs one join per step, each a
full shuffle of the events table; this does k steps in 0 extra
shuffles). Per-user event lists are session-scale (thousands), far
below array limits; a pathological mega-user is one reducer key, the
same skew unit as any sessionization. Timestamps fold as integer
micros, and ties are broken by (ts, type) lexicographic sort — fully
deterministic, so the integer output sits under the value-hash
contract.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .timeutil import epoch_micros

# any real timestamp is strictly greater: funnel step 1 accepts the
# first matching event unconditionally
_NEG_INF = -(1 << 62)


def funnel(
    df: DataFrame,
    steps: Sequence[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """(user, steps_completed, converted) per user with >= 1 event:
    ``steps_completed`` in [0, len(steps)] counts the funnel prefix the
    user traversed in order; ``converted`` = completed every step.
    Steps may repeat (e.g. ['view', 'view'] = two views at strictly
    increasing timestamps)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    for s in steps:
        if "'" in s:
            raise ValueError(f"step name may not contain a quote: {s!r}")
    n = len(steps)
    steps_lit = ", ".join(f"'{s}'" for s in steps)
    evs = (
        df.select(
            F.col(user_col).alias("user"),
            F.struct(
                # dtype-aware, session-TZ-independent micros (timeutil)
                epoch_micros(df, ts_col).alias("tm"),
                F.col(type_col).alias("tp"),
            ).alias("_e"),
        )
        .groupBy("user")
        .agg(F.collect_list("_e").alias("_evs"))
    )
    fold = f"""
        aggregate(
          sort_array(_evs),
          struct(CAST(0 AS INT) AS k, CAST({_NEG_INF} AS BIGINT) AS last),
          (acc, x) -> IF(
            acc.k < {n}
            AND x.tp = element_at(array({steps_lit}), acc.k + 1)
            AND x.tm > acc.last,
            struct(CAST(acc.k + 1 AS INT) AS k, x.tm AS last),
            acc
          ),
          acc -> acc.k
        )
    """
    return evs.select(
        "user",
        F.expr(fold).cast("long").alias("steps_completed"),
    ).withColumn("converted", F.col("steps_completed") == n)
