"""Corpus composition cube: every (lang x source) subtotal in ONE pass —
the mixture report a training-data curator reads before setting sampling
weights ("how many tokens of German web text do we have? of German
anything? of anything?").

Why CUBE and not four queries: Spark plans GROUPING SETS as a single
Expand + one aggregation — each input row is replicated once per
grouping set map-side and partially aggregated before the one shuffle,
so the full subtotal lattice costs barely more than the finest-grain
groupBy and reads the corpus ONCE. At 100 TB, re-scanning per subtotal
level is the difference between one job and 2^dims jobs.

``grouping_id`` disambiguates a real NULL dimension value from a
subtotal row (bit = 1 means the column is rolled up, first dim = high
bit — the same encoding DuckDB's GROUPING() emits, which is what lets
the oracle match bit-for-bit). All metrics are bigint counts/sums of
per-row integers, so the cube sits under the full value-hash contract.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import token_count


def corpus_cube(
    df: DataFrame,
    dims: Sequence[str] = ("lang", "source"),
    text_col: str = "text",
) -> DataFrame:
    """(dims..., gid, n_docs, n_tokens, n_chars) for every cell of the
    full CUBE lattice over ``dims``: per-combination, per-dim subtotals
    and the grand total. ``n_tokens`` uses the repo's whitespace token
    count (textstats.token_count); ``n_chars`` is raw string length —
    both computed per row BEFORE the Expand so the cube aggregates
    plain integers."""
    d = list(dims)
    pre = df.select(
        *d,
        token_count(text_col).cast("long").alias("_tok"),
        F.length(F.col(text_col)).cast("long").alias("_chr"),
    )
    return (
        pre.cube(*d)
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_tok").cast("long").alias("n_tokens"),
            F.sum("_chr").cast("long").alias("n_chars"),
        )
    )
