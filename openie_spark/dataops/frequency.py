"""Mergeable count-min frequency sketch in pure integer arithmetic —
the frequency complement to dataops.cardinality's HLL: "how MANY times
does each key occur" where HLL answers "how many KEYS".

Why not a plain groupBy count: at 100 TB the interesting keys (hot
URLs, hot predicates, hot n-grams) are buried in a tail of billions of
near-unique keys; a full exact count materializes the whole tail. The
count-min sketch is a FIXED-size (group x D x W) integer counter table
that upper-bounds every key's count, is built in one pass, and —
because its registers combine by plain addition — is mergeable across
partitions, days, and engines by union + sum. The sketch table is the
deliverable: any engine can query it later.

Construction (Cormode-Muthukrishnan, D=4 rows, W=512 columns):
- row r's column for a value = first 32 bits of md5(r || '|' || value)
  mod W — the same md5-slice idiom as cardinality/sampling, identical
  in every engine (the DuckDB oracle replays it verbatim).
- register (r, c) = SUM of weights of all values hashing there: sum is
  associative/commutative, so partition layout is irrelevant and
  re-aggregation is trivial (``cm_merge``).
- estimate(key) = min over rows of register[r][h_r(key)] (0 when the
  register row is absent): min of exact integers — deterministic,
  engine-portable, and a guaranteed UPPER bound on the true count
  (every occurrence of the key lands in all D of its registers;
  collisions only ever add). Error: overcount <= 2N/W with probability
  1 - 2^-D per the classic bound.

Scale shape: one narrow D-way explode (no shuffle) + one groupBy with
map-side partial aggregation; the register table is at most
``groups * D * W`` rows regardless of input size. Estimation joins the
(small) key set against the registers on (row, col) — broadcast-able
by construction.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

D = 4  # sketch depth (independent hash rows)
W = 512  # sketch width (columns per row)


def _cm_col(value: F.Column, row: int) -> F.Column:
    h = F.md5(F.concat(F.lit(f"{row}|"), value.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % W).cast(
        "int"
    )


def cm_registers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    weight_col: Optional[str] = None,
) -> DataFrame:
    """The sketch itself: (group..., row, col, cnt) with cnt the sum of
    weights (1 per input row when ``weight_col`` is None). This table
    IS the mergeable state — union any number of register tables and
    re-sum to combine them (:func:`cm_merge`)."""
    g = list(group_cols)
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    v = F.col(value_col)
    lanes = F.array(
        *[
            F.struct(
                F.lit(r).cast("int").alias("row"),
                _cm_col(v, r).alias("col"),
            )
            for r in range(D)
        ]
    )
    return (
        df.select(*g, F.explode(lanes).alias("_l"), w.alias("_w"))
        .groupBy(*g, F.col("_l.row").alias("row"), F.col("_l.col").alias("col"))
        .agg(F.sum("_w").cast("long").alias("cnt"))
    )


def cm_merge(*register_tables: DataFrame) -> DataFrame:
    """Combine sketches built by :func:`cm_registers` (sum-merge).
    Associative/commutative — merge order and partitioning cannot
    change the result (unlike HLL's max-merge it is NOT idempotent:
    don't merge the same sketch twice)."""
    if not register_tables:
        raise ValueError("need at least one register table")
    out = register_tables[0]
    for t in register_tables[1:]:
        out = out.unionByName(t)
    g = [c for c in out.columns if c not in ("row", "col", "cnt")]
    return out.groupBy(*g, "row", "col").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def cm_estimate(
    registers: DataFrame,
    keys: DataFrame,
    key_col: str = "key",
) -> DataFrame:
    """(group..., key, est) for every key in ``keys`` (a DataFrame with
    ``key_col``; extra columns are dropped), est = min over rows of the
    key's register — the count-min upper bound. Keys are expanded to
    their D (row, col) probes and equi-joined against the register
    table; with a small key set Spark broadcasts the probe side. A key
    whose registers are all absent estimates 0."""
    g = [c for c in registers.columns if c not in ("row", "col", "cnt")]
    v = F.col(key_col)
    lanes = F.array(
        *[
            F.struct(
                F.lit(r).cast("int").alias("row"),
                _cm_col(v, r).alias("col"),
            )
            for r in range(D)
        ]
    )
    probes = (
        keys.select(v.alias("key")).distinct()
        .select("key", F.explode(lanes).alias("_l"))
        .select("key", F.col("_l.row").alias("row"), F.col("_l.col").alias("col"))
    )
    if g:
        # every key is estimated against EVERY group's sketch; a probe
        # that misses a group's register table means that register was
        # never incremented -> it counts as 0 (the min then pins est=0),
        # which is why the join must be probes x groups, not a bare
        # (row, col) equi-join that silently skips absent registers.
        probes = probes.crossJoin(F.broadcast(registers.select(*g).distinct()))
    hit = probes.join(registers, g + ["row", "col"], "left")
    return (
        hit.groupBy(*g, "key")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias("est")
        )
    )


def heavy_hitters(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    min_count: int = 1,
) -> DataFrame:
    """(group..., key, est, exact) for every distinct value whose
    sketch estimate reaches ``min_count`` — the one-pass hot-key report
    with the exact count alongside so the upper-bound property
    ``est >= exact`` is visible in the output (and testable by the
    oracle). The exact count here serves the report; a pure streaming
    deployment would keep only the sketch and a candidate heap."""
    regs = cm_registers(df, group_cols, value_col)
    est = cm_estimate(regs, df.select(F.col(value_col).alias("key")))
    exact = (
        df.groupBy(*group_cols, F.col(value_col).alias("key"))
        .agg(F.count(F.lit(1)).cast("long").alias("exact"))
    )
    join_on = list(group_cols) + ["key"]
    return (
        est.join(exact, join_on)
        .filter(F.col("est") >= min_count)
        .select(*join_on, "est", "exact")
    )
