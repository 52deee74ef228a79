"""Token co-occurrence counts and PMI — the statistical substrate of
knowledge-graph construction from raw text (PMI-weighted co-occurrence
edges are the classic pre-parse KG signal, and the counts table is the
standard input for phrase mining and embedding objectives like GloVe).

Reference scope note: the reference pipeline (sudoandros/OpenIE) builds
edges only from dependency-parse triples; this operator family is part
of the training-data layer beyond reference parity.

Shape, designed for one pass over 100 TB:
- pairs are generated IN-ARRAY per document (an ``aggregate`` fold over
  the sorted distinct token array that pairs each token with everything
  already seen) — no self-join, no second shuffle: the only exchanges
  are the two groupBy counts (pairs, tokens), both with map-side partial
  aggregation. A (doc, token) self-join would shuffle the exploded
  corpus twice and is strictly worse.
- the fold evaluates its input array exactly ONCE (the same
  CollapseProject trap documented at dedup.word_shingles: a nested
  ``transform(sequence, i -> ... t ...)`` re-evaluates the token-array
  subtree per element after projection collapse).
- doc-level co-occurrence counts distinct tokens once per doc, so
  ``pair_docs`` is "number of documents containing both" — the PMI
  convention for document co-occurrence.
- fan-out control: per-doc pair count is O(distinct_tokens²);
  ``max_vocab`` bounds it by restricting pairing to the top-N tokens by
  document frequency (N collected to the driver and applied as one
  ``array_intersect`` against a literal — the same bounded-collect
  contract as IVF centroids). At web scale you ALWAYS set this: vocab
  follows Zipf, and the top 64k tokens carry the co-occurrence signal.

All oracled columns are integer counts (associative sums — partition-
layout-proof); PMI itself is a float convenience column computed from
them (``pmi_scores``), deliberately NOT part of the value-hash contract
(ln() is not guaranteed bitwise-identical across engines).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalized_text


def doc_tokens(text_col: str = "text", distinct: bool = True) -> F.Column:
    """Sorted (distinct) token array of the normalized text; empty tokens
    removed so blank docs contribute nothing."""
    toks = F.array_remove(F.split(normalized_text(text_col), " "), "")
    if distinct:
        toks = F.array_distinct(toks)
    return F.array_sort(toks)


def _pair_fold(tokens: F.Column) -> F.Column:
    """All unordered pairs (a < b) of a sorted array: for each position
    ``i`` (1-based, from 2), pair every earlier element with
    ``tokens[i]`` — the same (earlier, later) pair multiset the old
    aggregate fold produced, generated directly.

    Why not an ``aggregate`` fold that concats onto an accumulator: the
    accumulator arrays (``seen`` and the growing ``pairs``) are COPIED
    on every ``concat`` — at step i that copies O(i²) accumulated pair
    structs, so a doc with T distinct tokens costs O(T³) element copies
    for O(T²) output (measured 2.6s → 1.4s for the sf0.1 token_pmi
    span, and the gap widens with doc length). ``flatten ∘ transform``
    allocates each pair exactly once. The input array is still
    let-bound via the 1-element transform (the CollapseProject trap —
    see module docstring): ``tk`` is a lambda variable, so the
    token-array subtree evaluates once per row no matter how many times
    the lambda body references it."""
    empty = F.array().cast("array<struct<token_a:string,token_b:string>>")
    return F.transform(
        F.array(tokens),
        lambda tk: F.when(
            F.size(tk) >= 2,
            F.flatten(
                F.transform(
                    F.sequence(F.lit(2), F.size(tk)),
                    lambda i: F.transform(
                        F.slice(tk, 1, i - 1),
                        lambda s: F.struct(
                            s.alias("token_a"),
                            F.element_at(tk, i).alias("token_b"),
                        ),
                    ),
                )
            ),
        ).otherwise(empty),
    )[0]


def token_doc_freq(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(token, docs): document frequency per token. One shuffle."""
    return (
        df.select(F.explode(doc_tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("docs"))
    )


def cooccurrence_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_vocab: Optional[int] = None,
    min_pair_docs: int = 1,
) -> DataFrame:
    """Document-level co-occurrence table:
    (token_a, token_b, pair_docs, a_docs, b_docs, n_docs), token_a <
    token_b, all counts integer.

    ``max_vocab`` restricts pairing to the top-N tokens by document
    frequency (ties broken by token string for determinism); the N
    tokens collect to the driver and prune each doc's array before the
    pair fold. ``min_pair_docs`` filters rare pairs after the count —
    at web scale set it > 1 so the output table stays sketch-sized."""
    tf = token_doc_freq(df, id_col, text_col)

    toks = doc_tokens(text_col)
    if max_vocab is not None:
        top = [
            r["token"]
            for r in tf.orderBy(F.desc("docs"), "token")
            .limit(max_vocab)
            .collect()
        ]
        toks = F.array_sort(
            F.array_intersect(toks, F.array(*[F.lit(t) for t in top]))
        )
        # the freq side of the joins is now vocab-bounded → broadcast
        tf = F.broadcast(tf.filter(F.col("token").isin(top)))
        # (an uncapped tf follows raw vocab size — leave its join
        # strategy to AQE rather than forcing a broadcast)

    pairs = (
        df.select(F.explode(_pair_fold(toks)).alias("p"))
        .select("p.token_a", "p.token_b")
        .groupBy("token_a", "token_b")
        .agg(F.count(F.lit(1)).alias("pair_docs"))
    )
    if min_pair_docs > 1:
        pairs = pairs.filter(F.col("pair_docs") >= min_pair_docs)

    n_docs = df.select(F.count(F.lit(1)).cast("long").alias("n_docs"))
    tf_a = tf.select(
        F.col("token").alias("token_a"), F.col("docs").alias("a_docs")
    )
    tf_b = tf.select(
        F.col("token").alias("token_b"), F.col("docs").alias("b_docs")
    )
    return (
        pairs.join(tf_a, "token_a")
        .join(tf_b, "token_b")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "token_a",
            "token_b",
            "pair_docs",
            "a_docs",
            "b_docs",
            "n_docs",
        )
    )


def pmi_scores(counts: DataFrame, positive: bool = True) -> DataFrame:
    """PMI = ln(pair_docs·n_docs / (a_docs·b_docs)) from the integer
    counts; ``positive`` clamps at 0 (PPMI). Float by nature — kept out
    of the oracle-hash contract."""
    pmi = F.log(
        (F.col("pair_docs") * F.col("n_docs"))
        / (F.col("a_docs") * F.col("b_docs"))
    )
    if positive:
        pmi = F.greatest(pmi, F.lit(0.0))
    return counts.withColumn("pmi", pmi)
