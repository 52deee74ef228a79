"""Exact integer-binned histograms — the value-distribution dashboard
(score distributions, doc-length profiles, latency spreads) computed as
ONE map-side-combinable aggregation.

Binning is integer-micros end to end, the same discipline as
dataops/intervals.py: the value is converted to bigint micros PER ROW
(``round(v * 1e6)::BIGINT`` — the repo's standard portable quantizer)
and the bin index is one integer multiply + floor division,
``(vm - lo) * n_bins div (hi - lo)``. Float bin arithmetic
(``floor((v - lo) / width)``) can mis-bin a boundary value by an ulp —
a row silently lands in the neighbor bin and the layout-portable hash
breaks; the integer form cannot disagree with itself or with another
engine. Out-of-range rows are kept, not dropped: bin -1 (underflow)
and bin ``n_bins`` (overflow), so histogram totals always reconcile
with row counts.

Scale shape: one narrow projection + one groupBy((group..., bin)) with
map-side combine — at most ``groups * (n_bins + 2)`` rows shuffle no
matter the input size. Only non-empty bins appear (join a bin spine
downstream if you render dense axes).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """(group..., bin, bin_lo_micros, n): equal-width histogram of
    ``value_col`` over [lo, hi) with ``n_bins`` bins; bin -1 holds
    values below lo, bin ``n_bins`` holds values >= hi (their
    ``bin_lo_micros`` is NULL). ``bin_lo_micros`` is the bin's exact
    integer lower edge, ``lo_m + bin * (hi_m - lo_m) div n_bins`` —
    derived from the bin index, so it can never contradict the
    binning."""
    if n_bins <= 0:
        raise ValueError("n_bins must be positive")
    lo_m = round(lo * 1e6)
    hi_m = round(hi * 1e6)
    if hi_m <= lo_m:
        raise ValueError("hi must be greater than lo")
    g = list(group_cols)
    vm = F.round(F.col(value_col) * 1e6).cast("bigint")
    span = hi_m - lo_m
    # built via expr to keep the integer div literal-exact and readable
    bin_expr = (
        f"CASE WHEN _vm < {lo_m} THEN -1L "
        f"WHEN _vm >= {hi_m} THEN {n_bins}L "
        f"ELSE (_vm - {lo_m}) * {n_bins} div {span} END"
    )
    edge_expr = (
        f"CASE WHEN bin >= 0 AND bin < {n_bins} "
        f"THEN {lo_m} + bin * {span} div {n_bins} END"
    )
    return (
        df.select(*g, vm.alias("_vm"))
        .select(*g, F.expr(bin_expr).cast("long").alias("bin"))
        .groupBy(*g, "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            *g,
            "bin",
            F.expr(edge_expr).cast("long").alias("bin_lo_micros"),
            "n",
        )
    )
