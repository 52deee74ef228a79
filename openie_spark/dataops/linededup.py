"""Line-level corpus deduplication (CCNet-style boilerplate removal).

Web corpora repeat LINES across documents — navigation text, cookie
banners, footers — even when whole documents are unique. The standard
training-data cure (CCNet, RefinedWeb, Dolma) removes every line whose
document frequency exceeds a threshold, keeping the rest of each doc in
original order. Documents that were 100% boilerplate disappear — they
carry no signal.

Reference scope note: the reference pipeline (sudoandros/OpenIE) dedups
nothing; this operator is part of the training-data layer the brief asks
for beyond reference parity.

Shape, designed for one pass over 100 TB:
- doc-frequency count: explode lines once, ONE shuffle on the 64-bit
  line hash with partial (map-side) aggregation of distinct doc ids —
  within-doc repeats collapse before the exchange via the (hash, doc)
  distinct's partial agg.
- boilerplate set: lines with doc_freq >= min_doc_freq — by construction
  at most total_lines/min_doc_freq entries and in practice tiny (it IS
  the repeated content), so it broadcasts.
- removal, two interchangeable strategies (equality pinned in tests):
  * ``join``: lines explode, LEFT ANTI join against the broadcast
    boilerplate hashes, regroup by doc — one shuffle on doc id; the
    always-works default.
  * ``filter``: the boilerplate hashes collect into a literal ``InSet``
    (bounded by ``max_collect``; Catalyst compiles ``isin`` over a long
    list to an O(1) hash-set probe inside codegen) and each doc's line
    array is filtered IN PLACE — ZERO additional shuffle, the
    scale-optimal path while the set fits in a task binary (~8 B/hash;
    the collect is bounded exactly like IVF centroids).

Lines are matched by ``xxhash64(trim(line))``. A 64-bit collision merges
two distinct lines (one stray line dropped corpus-wide) with probability
~n²/2⁶⁴ — the standard CCNet trade; exactness is not load-bearing
because removal is advisory filtering, not dedup bookkeeping.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_lines(text_col: str = "text", delim: str = "\n") -> F.Column:
    """Array of lines. ``delim`` is a Java regex (split semantics)."""
    return F.split(F.col(text_col), delim)


def _line_key(line: F.Column) -> F.Column:
    return F.xxhash64(F.trim(line))


def token_chunk_lines(text_col: str = "text", k: int = 4) -> F.Column:
    """Pseudo-lines for unstructured text: whitespace tokens grouped into
    fixed ``k``-token chunks (the last chunk may be short). Gives line-
    level dedup a deterministic unit when documents carry no newlines.
    The token array is let-bound (one split per row — see
    dedup.word_shingles for the CollapseProject re-evaluation trap)."""
    toks = F.split(F.col(text_col), " ")
    return F.transform(
        F.array(toks),
        lambda t: F.when(
            F.size(t) > 0,
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.size(t) / F.lit(k)).cast("int") - 1,
                ),
                lambda i: F.array_join(F.slice(t, i * k + 1, k), " "),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )[0]


def line_doc_freq(
    df: DataFrame,
    id_col: str = "doc_id",
    lines_col: str = "lines",
) -> DataFrame:
    """(line_hash, doc_freq): number of DISTINCT docs containing each
    trimmed line. One shuffle; within-doc repeats collapse map-side."""
    ex = df.select(
        F.col(id_col), F.explode(F.col(lines_col)).alias("line")
    ).select(F.col(id_col), _line_key(F.col("line")).alias("line_hash"))
    return (
        ex.distinct()  # (doc, hash) distinct has a partial phase
        .groupBy("line_hash")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
    )


def boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    lines_col: str = "lines",
    min_doc_freq: int = 4,
) -> DataFrame:
    """The small side: line hashes appearing in >= min_doc_freq docs."""
    return line_doc_freq(df, id_col, lines_col).filter(
        F.col("doc_freq") >= min_doc_freq
    )


def dedup_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "\n",
    join_delim: str = "\n",
    min_doc_freq: int = 4,
    lines_col: Optional[str] = None,
    strategy: str = "join",
    max_collect: int = 1_000_000,
) -> DataFrame:
    """Remove every line whose trimmed form appears in >= ``min_doc_freq``
    distinct documents; reassemble survivors in original order.

    Returns (id, clean_text, n_kept, n_dropped). Documents whose every
    line was boilerplate are DROPPED (the CCNet contract: an all-
    boilerplate doc is itself a duplicate artifact).

    ``lines_col`` bypasses the ``delim`` split when the caller already
    has a line-array column (e.g. token-chunked pseudo-lines).
    ``strategy``: 'join' (anti-join + regroup, one doc-id shuffle) or
    'filter' (literal InSet probe, zero extra shuffle; raises if the
    boilerplate set exceeds ``max_collect``)."""
    if lines_col is None:
        base = df.select(
            F.col(id_col), split_lines(text_col, delim).alias("_lines")
        )
    else:
        base = df.select(F.col(id_col), F.col(lines_col).alias("_lines"))
    bp = boilerplate_lines(base, id_col, "_lines", min_doc_freq).select(
        "line_hash"
    )

    if strategy == "filter":
        hashes = [r[0] for r in bp.limit(max_collect + 1).collect()]
        if len(hashes) > max_collect:
            raise ValueError(
                f"boilerplate set exceeds max_collect={max_collect}; "
                "use strategy='join'"
            )
        if hashes:
            keep = F.filter(
                F.col("_lines"), lambda l: ~_line_key(l).isin(hashes)
            )
        else:
            keep = F.col("_lines")
        # chained selects: _kept is non-cheap and referenced 3×, so
        # CollapseProject leaves the projection boundary alone
        # (SPARK-36718) — the filter evaluates once per row
        packed = base.select(
            F.col(id_col),
            keep.alias("_kept"),
            F.size("_lines").alias("_n_total"),
        )
        return packed.filter(F.size("_kept") > 0).select(
            F.col(id_col),
            F.array_join(F.col("_kept"), join_delim).alias("clean_text"),
            F.size("_kept").alias("n_kept"),
            (F.col("_n_total") - F.size("_kept")).alias("n_dropped"),
        )

    if strategy != "join":
        raise ValueError(f"unknown strategy {strategy!r}")

    with_total = base.select(
        F.col(id_col), F.col("_lines"), F.size("_lines").alias("_n_total")
    )
    ex = with_total.select(
        F.col(id_col),
        F.col("_n_total"),
        F.posexplode(F.col("_lines")).alias("_pos", "line"),
    ).withColumn("line_hash", _line_key(F.col("line")))
    kept = ex.join(F.broadcast(bp), "line_hash", "left_anti")
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_pos", "line"))
                    ),
                    lambda s: s["line"],
                ),
                join_delim,
            ).alias("clean_text"),
            F.count(F.lit(1)).alias("n_kept"),
            (F.first("_n_total") - F.count(F.lit(1))).alias("n_dropped"),
        )
    )
