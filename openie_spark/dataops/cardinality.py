"""Mergeable approximate-distinct sketches in pure integer arithmetic —
HyperLogLog re-derived so its ESTIMATE is engine- and layout-portable.

Why not ``F.approx_count_distinct``: Spark's HLL++ is a black box whose
exact integer output can't be reproduced by a second engine, so it can
never sit under this repo's value-hash oracle contract, and its sketch
bytes can't be re-aggregated by anything that isn't Spark. At 100 TB
the sketch (not the count) is the deliverable — per-partition register
tables are unioned and max-merged across days/sources without touching
raw data again — so the registers must be a plain (group, bucket, rho)
TABLE with documented hashing, not an opaque binary.

Construction (classic Flajolet HLL, m = 256 registers):
- ``bucket`` = first 8 bits of md5(value); ``rho`` = leading zeros of
  the NEXT 20 bits + 1 (so rho ∈ [1, 21]; the md5 slice is identical
  in every engine).
- register M_j = max(rho) per (group, bucket): max is commutative,
  associative, and duplicate-absorbing — duplicates need no pre-
  distinct, re-adding data is a no-op, partition layout is irrelevant.
- estimate = alpha_m * m^2 / sum_j 2^(-M_j), computed ENTIRELY in
  integers: the harmonic denominator is scaled by 2^21 (every term
  2^(21 - M_j) is an exact bigint; absent registers contribute 2^21),
  alpha_m is a micro-unit literal, and the final value is one bigint
  floor division — associative, so the estimate is bit-identical on
  any engine/layout (the DuckDB oracle reproduces it to the last
  digit). No small-range linear-counting correction (it needs ln);
  below ~2.5*m distinct the raw HLL estimate biases high — callers
  counting tiny sets should count exactly. Standard error ~1.04/16 ≈
  6.5%.

Scale shape: two map-side-combinable aggregations (max, then sum) —
the ideal distributed shape; the register table is at most
``groups * 256`` rows regardless of input size.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

M = 256  # registers (b = 8 bucket bits)
RHO_BITS = 20  # rho computed over this many bits after the bucket
RHO_MAX = RHO_BITS + 1
# alpha_256 = 0.7213 / (1 + 1.079/256), floored to micro-units. The
# DuckDB oracle embeds the same literal — keep them in sync.
ALPHA_MICROS = 718_272
# estimate = (ALPHA_MICROS * M^2 * 2^RHO_MAX) // (D * 1_000_000) where
# D = sum_j 2^(RHO_MAX - M_j); numerator is a compile-time constant
# that must fit int64: 718272 * 65536 * 2^21 ≈ 9.87e16 < 2^63.
EST_NUMERATOR = ALPHA_MICROS * M * M * (1 << RHO_MAX)


def _bucket_rho(value_col: str) -> List[F.Column]:
    h = F.md5(F.col(value_col).cast("string"))
    x = F.conv(F.substring(h, 3, 5), 16, 10).cast("long")
    # leading zeros of a RHO_BITS-wide value + 1; bin(x) has no leading
    # zeros, so its length is the MSB position (x=0 -> rho = RHO_MAX).
    rho = F.when(x == 0, F.lit(RHO_MAX)).otherwise(
        F.lit(RHO_MAX) - F.length(F.bin(x))
    )
    return [
        F.conv(F.substring(h, 1, 2), 16, 10).cast("int").alias("bucket"),
        rho.cast("int").alias("rho"),
    ]


def hll_registers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """The sketch itself: (group..., bucket, rho) with rho = the
    register maximum. This table IS the mergeable state — union any
    number of register tables (from other partitions, days, engines)
    and re-run this groupBy to combine them."""
    g = list(group_cols)
    return (
        df.select(*g, *_bucket_rho(value_col))
        .groupBy(*g, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Combine sketches built by :func:`hll_registers` (max-merge).
    Associative/commutative/idempotent — merge order, duplication, and
    partitioning cannot change the result."""
    if not register_tables:
        raise ValueError("need at least one register table")
    out = register_tables[0]
    for t in register_tables[1:]:
        out = out.unionByName(t)
    g = [c for c in out.columns if c not in ("bucket", "rho")]
    return out.groupBy(*g, "bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(registers: DataFrame) -> DataFrame:
    """(group..., est_distinct, registers_used) from a register table —
    one bigint floor division, bit-identical on any engine."""
    g = [c for c in registers.columns if c not in ("bucket", "rho")]
    denom = (
        F.sum(F.expr(f"shiftleft(1L, {RHO_MAX} - rho)"))
        + (F.lit(M) - F.count(F.lit(1))) * F.lit(1 << RHO_MAX)
    ).cast("long")
    return (
        registers.groupBy(*g)
        .agg(
            denom.alias("_denom"),
            F.count(F.lit(1)).cast("long").alias("registers_used"),
        )
        .select(
            *g,
            F.expr(f"{EST_NUMERATOR} div (_denom * 1000000)")
            .cast("long")
            .alias("est_distinct"),
            "registers_used",
        )
    )


def approx_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Per-group approximate distinct count of ``value_col`` —
    :func:`hll_registers` piped into :func:`hll_estimate`."""
    return hll_estimate(hll_registers(df, group_cols, value_col))
