"""Deterministic, reproducible corpus sampling.

``df.sample()`` is partition-dependent (same seed, different layout →
different rows), which makes training-data subsets unreproducible across
repartitions, engines, and re-runs — the thing a data-lineage audit can't
tolerate. These samplers key the keep-decision on a HASH OF THE ROW KEY
alone, so the same (key, salt, rate) always selects the same rows on any
engine: the decision is ``md5(salt || key)``'s first 8 hex digits,
compared lexicographically against the rate threshold (lowercase hex
compares identically to the numeric value, and md5 is available
everywhere — the DuckDB oracle reproduces the exact row set).

All pure column expressions: no shuffle, no UDF, fully pushable."""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hex_threshold(rate: float) -> str:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1]: {rate}")
    if rate >= 1.0:
        return "g"  # lexicographically above every hex bucket: keep ALL
    return format(int(rate * 2**32), "08x")


def hash_bucket(key_col: str, salt: str = "") -> F.Column:
    """The 8-hex-digit decision bucket for a row key (lowercase hex —
    lexicographic order == numeric order)."""
    return F.substring(
        F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 8
    )


def hash_sample(
    df: DataFrame,
    rate: float,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Keep ~``rate`` of rows, chosen deterministically by key hash.
    Disjoint samples: different ``salt``s are independent; the same salt
    at a higher rate is a SUPERSET of the lower rate (nested samples —
    grow a training subset without resampling what you already used)."""
    return df.filter(hash_bucket(key_col, salt) < F.lit(_hex_threshold(rate)))


def stratified_hash_sample(
    df: DataFrame,
    rates: Dict[str, float],
    stratum_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "",
    default_rate: Optional[float] = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-mixing primitive
    (e.g. keep 100% of wiki, 10% of common-crawl): each stratum gets its
    own rate; strata not listed get ``default_rate`` (None → keep all).
    Same nested-sample and cross-engine guarantees as hash_sample."""
    if default_rate is None:
        thr = F.lit("g")  # keep all unlisted strata
    else:
        thr = F.lit(_hex_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(
            F.col(stratum_col) == value, F.lit(_hex_threshold(rate))
        ).otherwise(thr)
    return df.filter(hash_bucket(key_col, salt) < thr)
