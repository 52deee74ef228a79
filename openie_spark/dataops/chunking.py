"""Token-window document chunking — the context-length splitter every
LLM training/embedding pipeline runs between cleaning and tokenization:
cut each document into fixed-size token windows with a configurable
overlap, keeping provenance (doc id, chunk index, token span) so a
chunk can always be traced back to its source page.

Reference scope note: the reference (sudoandros/OpenIE) processes whole
texts per url (text_processing.py) and has no chunking; this is part of
the training-data layer beyond parity.

Chunk policy (the part every ad-hoc splitter gets subtly wrong):
windows start at 0, stride, 2*stride, ... with ``stride = size -
overlap``. A start ``s > 0`` is emitted only when its window holds at
least one token the previous window does not (``s <= n - overlap - 1``)
— otherwise the tail "chunk" would be a strict sub-span of its
predecessor and duplicate training text. A document shorter than
``size`` yields exactly one chunk (itself); an empty document yields
none. Chunk ids are ``s // stride`` so they are stable under any
filtering of the output.

Shape at 100 TB: everything is a pure JVM array expression — split →
sequence of starts → slice/array_join under ``posexplode`` — so chunking
is a narrow map with NO shuffle and no Python in the path; Catalyst
prunes to (id, text) at the scan. Output row count is ~n_tokens/stride
per doc, which is exactly the fan-out any downstream tokenizer needs —
there is nothing to co-locate, so no repartition is imposed here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalized_text


def chunk_tokens(
    df: DataFrame,
    size: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Explode each document into overlapping token windows.

    Returns (id_col, chunk_id, start_token, n_tokens, chunk) — integer
    token offsets and the space-rejoined window text. Deterministic and
    engine-portable: whitespace-normalized tokens, integer arithmetic
    only, no layout dependence (the DuckDB oracle reproduces the exact
    row set).
    """
    if size <= 0:
        raise ValueError(f"size must be > 0: {size}")
    if not 0 <= overlap < size:
        raise ValueError(f"overlap must be in [0, size): {overlap}")
    stride = size - overlap
    toks = F.array_remove(F.split(normalized_text(text_col), " "), "")
    # let-bind the token array in its own projection: deriving n and the
    # start list from the _toks ATTRIBUTE means the normalize+split
    # chain evaluates once per doc — with the expression inline, the
    # Generate node and the size/array columns each re-evaluated it
    # (a constant-factor cousin of the CollapseProject trap)
    base = df.select(F.col(id_col), toks.alias("_toks"))
    n = F.size(F.col("_toks"))
    # 0-based starts; emit s iff s == 0 or s + overlap < n (the window
    # contributes a new token). sequence() is inclusive and would
    # DESCEND on an empty doc — the n >= 1 guard prevents that.
    starts = F.filter(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride)),
        lambda s: (s == 0) | (s + overlap < n),
    )
    starts = F.when(n >= 1, starts).otherwise(
        F.array().cast("array<int>")
    )
    exploded = base.select(
        F.col(id_col),
        n.alias("_n"),
        F.col("_toks"),
        F.explode(starts).alias("start_token"),
    )
    return exploded.select(
        id_col,
        (F.col("start_token") / stride).cast("long").alias("chunk_id"),
        F.col("start_token").cast("long"),
        F.least(F.lit(size), F.col("_n") - F.col("start_token"))
        .cast("long")
        .alias("n_tokens"),
        F.array_join(
            # slice() is 1-based
            F.slice(F.col("_toks"), F.col("start_token") + 1, size),
            " ",
        ).alias("chunk"),
    )
