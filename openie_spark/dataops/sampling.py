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

import math
from typing import Dict, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


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


def upsample(
    df: DataFrame,
    weights: Dict[str, float],
    stratum_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "",
    default_weight: float = 1.0,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Epoch-weighted corpus mixing — the data-recipe primitive for
    "repeat wiki 3.2x, common-crawl 0.5x": every row appears
    ``floor(w)`` times plus one more iff its key hash falls under the
    fractional part, so a weight of 3.2 repeats EVERY doc 3 times and
    a deterministic 20% of docs a 4th — giving exactly the recipe's
    expected token mix without a random generator anywhere. Weights
    < 1 degrade to plain stratified sampling. Output adds ``epoch_col``
    (0-based copy index) so downstream shuffling/sharding can keep
    copies of a document in different training epochs.

    Determinism contract (same as the other samplers): the decision is
    ``md5(salt || key)`` — same rows, same copy counts, on any engine,
    any layout, any rerun. The fractional-copy row set at weight w+f
    equals the ``hash_sample(f)`` row set, so recipes compose with the
    nested-sample property.

    Scale shape: one ``explode(sequence(...))`` — a narrow map, no
    shuffle, no UDF; the fan-out is the weight itself (the minimum any
    upsampler must write). Skew note: upsampling multiplies a
    stratum's rows; if a downstream groupBy keys on the stratum, salt
    that key — the copies land in the SAME partition otherwise.
    """
    for v, w in weights.items():
        if w < 0:
            raise ValueError(f"weight must be >= 0: {v}={w}")
    if default_weight < 0:
        raise ValueError(f"default_weight must be >= 0: {default_weight}")

    def _n_copies(w: float) -> F.Column:
        whole = int(w)
        frac = w - whole
        extra = (
            hash_bucket(key_col, salt) < F.lit(_hex_threshold(frac))
        ).cast("int")
        return F.lit(whole) + extra

    n = _n_copies(default_weight)
    for value, w in sorted(weights.items()):
        n = F.when(F.col(stratum_col) == value, _n_copies(w)).otherwise(n)
    return df.withColumn("_n", n).select(
        "*",
        F.explode(
            F.when(
                F.col("_n") >= 1,
                F.sequence(F.lit(0), F.col("_n") - 1),
            ).otherwise(F.array().cast("array<int>"))
        ).alias(epoch_col),
    ).drop("_n").withColumn(epoch_col, F.col(epoch_col).cast("long"))


def exact_k_sample(
    df: DataFrame,
    k: int,
    stratum_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "",
    prefilter: bool = True,
) -> DataFrame:
    """EXACTLY ``min(k, stratum size)`` rows per stratum, chosen
    deterministically: the k smallest ``md5(salt || key)`` buckets in
    each stratum (ties broken by key — keys must be unique within a
    stratum for full determinism, which doc ids are). Unlike the
    rate-based samplers this hits quota exactly — the corpus-mixing
    contract when the recipe says "exactly 1M docs of wiki" — and keeps
    the prefix property: the k-sample is a SUBSET of the k'-sample for
    k' > k (both take prefixes of the same hash order), so a grown
    quota never resamples what a smaller run already used.

    Scale shape: a per-stratum top-k is a window sort, and a window
    over a 100 TB stratum sorts the whole stratum. ``prefilter=True``
    (default) first computes per-stratum counts (one map-side-combined
    agg collapsing to #strata rows — a plan-statistics collect, not a
    data collect) and filters to buckets below ``(k + 6*sqrt(k) + 16) /
    n`` — a Chernoff-sized slice that keeps ~k rows per stratum, so the
    window sorts thousands of rows instead of billions. Correctness
    NEVER rests on the bound: a verification agg counts what each
    stratum actually yielded, and any shortfallen stratum (hash
    clustering above the slice — probability ~1e-9, but possible) is
    re-run without the prefilter. Worst case = one extra scan of the
    deficient strata only; expected case = counts scan + a ~k-row sort
    per stratum.
    """
    if k <= 0:
        raise ValueError(f"k must be > 0: {k}")
    bucket = hash_bucket(key_col, salt)
    win = Window.partitionBy(stratum_col).orderBy("_b", key_col)

    def _topk(frame: DataFrame) -> DataFrame:
        return (
            frame.withColumn("_b", bucket)
            .withColumn("_rn", F.row_number().over(win))
            .filter(F.col("_rn") <= k)
            .drop("_b", "_rn")
        )

    if not prefilter:
        return _topk(df)

    counts = {
        r["_s"]: r["_n"]
        for r in df.groupBy(F.col(stratum_col).alias("_s"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    }
    slice_k = k + 6 * math.sqrt(k) + 16
    thr = F.lit("")  # unknown strata (none exist) keep nothing
    for value, n in sorted(counts.items()):
        thr = F.when(
            F.col(stratum_col) == value,
            F.lit(_hex_threshold(min(1.0, slice_k / n))),
        ).otherwise(thr)
    sel = _topk(df.filter(bucket < thr))
    got = {
        r["_s"]: r["_n"]
        for r in sel.groupBy(F.col(stratum_col).alias("_s"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    }
    deficient = [
        s
        for s, n in counts.items()
        if got.get(s, 0) < min(k, n)
    ]
    if deficient:
        sel = sel.filter(~F.col(stratum_col).isin(deficient)).unionByName(
            _topk(df.filter(F.col(stratum_col).isin(deficient)))
        )
    return sel


def assign_splits(
    df: DataFrame,
    weights: Dict[str, float],
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic train/val/test (any k-way) split assignment: adds
    a ``split`` column keyed on the row's hash bucket against the
    cumulative weight thresholds — the reproducible, engine-portable
    replacement for ``randomSplit`` (which, like ``sample``, is
    partition-layout-dependent). Splits are EXACTLY disjoint and
    exhaustive by construction (one bucket, consecutive half-open
    threshold intervals; split names assigned in sorted-name order so
    the mapping itself is deterministic), and each split is the SAME
    row set that :func:`hash_sample` at the cumulative rates would
    select — recipes compose. Weights must sum to 1 (tolerance 1e-9).
    Pure column expression: no shuffle, pushable when filtered on."""
    if not weights:
        raise ValueError("weights must be non-empty")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    bucket = hash_bucket(key_col, salt)
    expr = None
    cum = 0.0
    names = sorted(weights)
    for name in names[:-1]:
        cum += weights[name]
        thr = _hex_threshold(min(cum, 1.0))
        cond = bucket < F.lit(thr)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)
