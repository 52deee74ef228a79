"""Timezone-proof epoch-micros derivation, shared by every operator
that exposes or folds absolute microsecond timestamps.

Why this exists: ``unix_micros(ts)`` requires a TIMESTAMP (instant)
input. Casting a TIMESTAMP_NTZ column to TIMESTAMP routes through
``spark.sql.session.timeZone`` — under a non-UTC session the derived
micros shift by the zone offset (and across DST transitions the
local→instant mapping is non-monotonic, which can even reorder a
sort). A DuckDB ``epoch_us(ts)`` oracle is TZ-independent, so the
cast-based form hashes differently in any non-UTC driver session —
the exact signature of the events_sessions mismatch in rounds 6-7.

The TZ-proof derivation is dtype-dispatched:

- TIMESTAMP_NTZ input → ``timestampdiff(MICROSECOND,
  TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)`` — pure wall-clock
  arithmetic, no session zone anywhere (verified identical under UTC
  and America/New_York).
- TIMESTAMP input → ``unix_micros(ts)`` directly — already an
  instant; casting it to NTZ would introduce the same session-zone
  dependence in the other direction.
- anything else (string timestamps) → the legacy
  ``unix_micros(cast(ts as timestamp))`` parse, unchanged.

Under a UTC session all three forms agree bit-for-bit, so adopting
this helper cannot change any oracle-checked result; it removes the
environment dependence only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

_NTZ_EPOCH = "TIMESTAMP_NTZ'1970-01-01 00:00:00'"


def epoch_micros(df: DataFrame, col_name: str) -> Column:
    """Microseconds since the epoch for ``df[col_name]``, independent of
    ``spark.sql.session.timeZone`` (see module docstring). NTZ columns
    are interpreted as UTC wall-clock — matching DuckDB's
    ``epoch_us``."""
    dt = df.schema[col_name].dataType
    c = F.col(col_name)
    if isinstance(dt, TimestampNTZType):
        quoted = col_name.replace("`", "``")
        return F.expr(
            f"timestampdiff(MICROSECOND, {_NTZ_EPOCH}, `{quoted}`)"
        ).cast("long")
    if isinstance(dt, TimestampType):
        return F.unix_micros(c)
    return F.unix_micros(c.cast("timestamp"))
