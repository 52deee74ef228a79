"""Inverted-index construction: (term, doc_id, positions) posting rows
with document-frequency pruning — the search/retrieval sink a corpus
pipeline materializes next to the documents themselves.

Scale shape: positions are gathered per (doc, term) with a SHUFFLE-FREE
array expression — tokenize once, posexplode, and re-group WITHIN the
row is wrong (that's a per-doc groupBy); instead the whole per-doc
posting set is computed inside one ``aggregate``-free pair of
higher-order functions (distinct terms -> their positions via
``filter`` over the indexed token array), so the only exchange in the
plan is the final partitionBy(term) the caller asks for via
``repartition`` — or none at all when writing doc-partitioned.
Document-frequency pruning mirrors the dedup family's posting-list
hygiene: terms in more than ``max_df_frac`` of documents are stopwords
that bloat the index with no retrieval signal and create the hottest
shuffle keys, so they are dropped by a broadcast semi-join of the tiny
capped term list.

All outputs integers/strings (0-based positions), so the index sits
under the full value-hash contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalized_text


def inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_df_frac: float = 1.0,
) -> DataFrame:
    """(term, doc_id, positions, tf): one row per (term, document) with
    the 0-based token positions (ascending) and the term frequency.
    Terms appearing in fewer than ``min_df`` or more than
    ``max_df_frac`` of documents are pruned (df computed on distinct
    (term, doc) pairs)."""
    if not 0.0 < max_df_frac <= 1.0:
        raise ValueError("max_df_frac must be in (0, 1]")
    toks = F.split(normalized_text(text_col), " ")
    # (doc, term, positions) without a per-doc shuffle: let-bind the
    # token array (the word_shingles idiom), pair each distinct term
    # with the positions where the array holds it
    postings = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.transform(
                F.array(toks),
                lambda tk: F.transform(
                    F.array_distinct(F.filter(tk, lambda t: t != "")),
                    lambda term: F.struct(
                        term.alias("term"),
                        F.filter(
                            F.transform(
                                tk,
                                lambda t, i: F.when(t == term, i).otherwise(
                                    F.lit(None)
                                ),
                            ),
                            lambda p: p.isNotNull(),
                        ).alias("positions"),
                    ),
                ),
            )[0]
        ).alias("_p"),
    ).select(
        F.col("_p.term").alias("term"),
        "doc_id",
        F.col("_p.positions").cast("array<long>").alias("positions"),
        F.size("_p.positions").cast("long").alias("tf"),
    )
    # df cutoff deferred into the plan (ADVICE r7): the old eager
    # .distinct().count() ran a full corpus scan at CONSTRUCTION time —
    # every caller paid a job before any action on the returned frame.
    # The doc count is now a 1-row scalar aggregate cross-joined in, and
    # the cutoff compares with EXACT integer arithmetic (df·den ≤
    # num·n_docs via the fraction's rational form) instead of a float
    # multiply/truncate that can disagree with a rational oracle cutoff
    # for adversarial fractions (for the driver's 0.9 the two agree on
    # every n, so the query result is unchanged).
    from fractions import Fraction

    frac = Fraction(max_df_frac).limit_denominator(1_000_000_000)
    nd = df.select(
        F.count_distinct(F.col(id_col)).cast("long").alias("_n_docs")
    )
    dfreq = (
        postings.groupBy("term")
        .agg(F.count(F.lit(1)).alias("_df"))
        .crossJoin(F.broadcast(nd))
        .filter(
            (F.col("_df") >= min_df)
            & (
                F.col("_df") * F.lit(frac.denominator)
                <= F.lit(frac.numerator) * F.col("_n_docs")
            )
        )
        .select("term")
    )
    return postings.join(F.broadcast(dfreq), "term", "left_semi")
