"""Sessionization — gaps-and-islands over an event stream.

Batch (:func:`sessionize` / :func:`session_rollup`): one window per user
(lag + running sum of gap-breaks), a single shuffle on the user key —
the standard scalable shape; session numbering is deterministic
(order by ts, then event id on timestamp ties).

Streaming (:func:`stream_session_rollup`): Spark's native
``session_window`` with a watermark — state is bounded by (watermark ×
active users), sessions close when the gap passes, and over any closed
input the emitted sessions EQUAL the batch rollup (pinned by test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .timeutil import epoch_micros


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Tag every event with its per-user ``session_seq`` (1-based): a new
    session starts when the gap since the user's previous event exceeds
    ``gap_seconds``. Microsecond-exact arithmetic (``unix_micros``), ties
    on ts broken by event id — deterministic and oracle-matchable."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    us = epoch_micros(events, ts_col)
    prev = F.lag(us).over(w)
    brk = F.when(
        prev.isNull() | (us - prev > gap_seconds * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    return events.withColumn(
        "session_seq",
        F.sum(brk).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_rollup(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
    value_col: str = "value",
) -> DataFrame:
    """Per-session aggregate: (user, session_seq, n_events, start/end in
    epoch micros, summed value). One extra groupBy on (user, session) —
    already co-partitioned by the sessionize window's shuffle, so Catalyst
    plans it without a second exchange."""
    s = sessionize(events, user_col, ts_col, id_col, gap_seconds)
    us = epoch_micros(events, ts_col)
    return s.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(us).alias("start_us"),
        F.max(us).alias("end_us"),
        F.sum(value_col).alias("value_sum"),
    )


def stream_session_rollup(
    events_stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
    value_col: str = "value",
) -> DataFrame:
    """Streaming sessions via native ``session_window`` (dynamic-gap state
    merged by the engine, bounded by the watermark): emits one row per
    closed session with the same (n_events, start, value sum) the batch
    rollup computes over a closed input — equality pinned in tests. The
    session END differs by design: session_window's window end is
    last_event + gap, so the batch ``end_us`` (last event time) is
    recoverable as ``max_ts_us``.

    Late data (both pinned in test_dataops): an event inside the
    watermark is folded into session state — including merging two
    provisionally-separate sessions it bridges — so the flushed session
    still equals the batch rollup; an event beyond the watermark is
    DROPPED (the engine applies the watermark with a one-trigger lag),
    which is the one documented divergence from the batch path — size
    ``watermark`` to the pipeline's real lateness tolerance."""
    ws = events_stream.withWatermark(ts_col, watermark)
    us = epoch_micros(events_stream, ts_col)
    return ws.groupBy(
        F.col(user_col),
        F.session_window(F.col(ts_col), f"{gap_seconds} seconds"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(us).alias("start_us"),
        F.max(us).alias("max_ts_us"),
        F.sum(value_col).alias("value_sum"),
    )


def transition_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """The corpus-wide event-transition (Markov bigram) matrix:
    (prev_type, next_type, n) counting consecutive event pairs within
    each user's time-ordered stream — the path-analysis aggregate
    behind "what do users do after X". Row normalization (transition
    probabilities) is one division the caller does; the counts stay
    bigint under the hash contract.

    Scale shape: ONE shuffle (the per-user window), then a groupBy on
    the (prev, next) pair whose key space is |types|^2 — tiny — with
    map-side combine. Ordering ties on ts break by event id, exactly
    like :func:`sessionize`, so the pairing is deterministic on any
    engine/layout."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    prev = F.lag(F.col(type_col)).over(w)
    return (
        events.select(prev.alias("prev_type"), F.col(type_col).alias("next_type"))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def top_paths(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    gap_seconds: int = 1800,
    path_len: int = 5,
    k: int = 20,
) -> DataFrame:
    """The k most common session paths: (path, n_sessions, rank) where
    ``path`` is the '>'-joined sequence of the session's first
    ``path_len`` event types — the "what do sessions look like"
    aggregate behind UX funnels and bot-pattern triage.

    Built on :func:`sessionize` (same gap and deterministic
    (ts, event_id) ordering): one user-window shuffle to tag sessions
    and rank events, one groupBy((user, session)) collecting the
    first-``path_len`` types JVM-side, one groupBy(path) count — path
    cardinality is bounded by |types|^path_len, tiny — and a final
    global top-k window over that tiny aggregate, ordered
    (n desc, path) so the cut is deterministic. Integer counts/ranks
    under the hash contract."""
    if path_len <= 0 or k <= 0:
        raise ValueError("path_len and k must be positive")
    tagged = sessionize(events, user_col, ts_col, id_col, gap_seconds)
    w = Window.partitionBy(user_col, "session_seq").orderBy(
        F.col(ts_col), F.col(id_col)
    )
    paths = (
        tagged.withColumn("_pos", F.row_number().over(w))
        .filter(F.col("_pos") <= path_len)
        .groupBy(user_col, "session_seq")
        .agg(
            F.concat_ws(
                ">",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_pos", F.col(type_col)))
                    ),
                    lambda s: s[type_col],
                ),
            ).alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
    )
    top = Window.orderBy(F.desc("n_sessions"), F.asc("path"))
    return (
        paths.withColumn("rank", F.row_number().over(top).cast("long"))
        .filter(F.col("rank") <= k)
    )
