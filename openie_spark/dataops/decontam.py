"""Exact n-gram decontamination — the GPT-3/PaLM/Llama-style leakage
guard: flag (or drop) every training document that shares at least one
exact token n-gram with an eval/benchmark document.

Complements :func:`openie_spark.dataops.dedup.decontaminate` (minhash
near-dup decontamination): minhash catches paraphrased/whole-document
overlap; exact n-gram overlap catches a verbatim benchmark QUESTION
embedded inside an otherwise-unrelated page, which whole-doc Jaccard
misses entirely. Production pipelines run both.

Reference scope note: the reference (sudoandros/OpenIE) has no corpus
operators; this is part of the training-data layer beyond parity.

Shape at 100 TB: the eval side is tiny by definition (benchmarks are
thousands of docs, not billions) — its distinct n-gram set broadcasts,
so the training corpus is scanned ONCE with a broadcast semi/inner join
and one final groupBy on the training doc id. No shuffle touches eval
data; the only shuffle is the per-doc match count aggregation, and
`flag` pushes even that down to a broadcast LEFT SEMI with zero
aggregation when only the contaminated-id set is needed. N-gram
generation is pure JVM array expressions (split → slice → array_join)
— no explode on the train side until after the in-array distinct, so a
doc with heavy internal repetition contributes each n-gram once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalized_text


def doc_ngrams(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
) -> F.Column:
    """Column expression: the DISTINCT space-joined token ``n``-grams of
    the normalized text, as an array (empty when the doc has fewer than
    ``n`` tokens — guarded, because ``sequence(0, -1)`` would DESCEND).
    Exposed as a column so callers can count (``F.size``) without paying
    an explode.

    The token array is LET-BOUND via a 1-element ``transform`` (the
    word_shingles idiom): referencing ``toks`` directly inside the
    per-gram lambda re-evaluates the whole normalize→split chain once
    PER GRAM (CollapseProject inlines it), turning gram construction
    O(len²) per doc — measured 115s → 2.4s for the sf0.1 bench span
    when this was fixed."""
    toks = F.array_remove(F.split(normalized_text(text_col), " "), "")
    return F.transform(
        F.array(toks),
        lambda tk: F.when(
            F.size(tk) >= n,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(tk) - (n - 1)),
                    lambda i: F.array_join(F.slice(tk, i, n), " "),
                )
            ),
        ).otherwise(F.array().cast("array<string>")),
    )[0]


def ngram_overlap(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """Per-training-doc exact n-gram overlap with the eval corpus.

    Returns (``id_col``, n_ngrams, matched) — total distinct n-grams in
    the doc and how many of them appear anywhere in ``eval_df``; only
    docs with ``matched >= 1`` are returned (the flag set). Counts are
    integers, so the result hashes identically on any engine and any
    partition layout. The derived contamination fraction is
    ``matched / n_ngrams`` — compute it downstream; it is deliberately
    not part of the integer contract.

    The eval n-gram set is deduplicated and broadcast (see module
    docstring); n_ngrams rides the groupBy key so no second shuffle or
    join-back is needed.
    """
    grams = doc_ngrams(train, id_col, text_col, n)
    # Materialize the gram array in its OWN projection below the
    # explode. Putting size(grams) and explode(grams) in one select
    # plants size's copy of the whole gram-construction expression in
    # the Project ABOVE the Generate (ExtractGenerator), where it is
    # re-evaluated once per exploded ROW — O(len²) string building per
    # doc, the same trap class as the r7 doc_ngrams fix (guide §7.2:
    # watch for duplicated subtrees). With the array let-bound in a
    # lower Project, Generate carries the computed array through and
    # size() above it is O(1) per row. Measured 9.1s → 1.3s on the
    # sf0.1 bench span (bench_extra ngram_overlap A/B).
    base = train.select(F.col(id_col), grams.alias("_grams"))
    tr = base.select(
        F.col(id_col),
        F.size("_grams").cast("long").alias("n_ngrams"),
        F.explode("_grams").alias("ngram"),
    )
    ev = (
        eval_df.select(
            F.explode(doc_ngrams(eval_df, id_col, text_col, n)).alias("ngram")
        )
        .distinct()
    )
    return (
        tr.join(F.broadcast(ev), "ngram")
        .groupBy(id_col, "n_ngrams")
        .agg(F.count(F.lit(1)).cast("long").alias("matched"))
    )


def ngram_decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    min_matched: int = 1,
) -> DataFrame:
    """Drop every training doc sharing >= ``min_matched`` exact n-grams
    with the eval corpus. ``min_matched=1`` is the strict standard;
    raising it tolerates incidental collocations at small ``n``.

    For ``min_matched=1`` the contaminated-id set is a pure broadcast
    LEFT SEMI (no aggregation at all); above 1 it needs the counted
    overlap. Either way the output is an anti-join of ``train`` against
    a set of ids."""
    if min_matched <= 1:
        grams = doc_ngrams(train, id_col, text_col, n)
        tr = train.select(F.col(id_col), F.explode(grams).alias("ngram"))
        ev = (
            eval_df.select(
                F.explode(doc_ngrams(eval_df, id_col, text_col, n)).alias(
                    "ngram"
                )
            )
            .distinct()
        )
        contaminated = (
            tr.join(F.broadcast(ev), "ngram", "left_semi")
            .select(id_col)
            .distinct()
        )
    else:
        contaminated = (
            ngram_overlap(train, eval_df, id_col, text_col, n)
            .filter(F.col("matched") >= min_matched)
            .select(id_col)
        )
    return train.join(contaminated, id_col, "left_anti")


def ngram_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_df: int = 2,
) -> DataFrame:
    """The corpus n-gram table: (ngram, tf, df) — total occurrences and
    document frequency of every token n-gram appearing in at least
    ``min_df`` documents. The Google-Books-ngrams-style artifact a
    corpus pipeline materializes for language-model heuristics,
    collocation mining, and boilerplate diagnosis.

    Unlike :func:`doc_ngrams` (distinct per doc — membership
    semantics), tf needs EVERY occurrence, so the gram list here is
    NOT deduplicated; df still counts distinct documents. One narrow
    let-bound gram construction (the same CollapseProject-safe idiom),
    one explode, ONE groupBy(ngram) computing tf and df together
    (count + two-phase distinct in the same aggregation). The unique
    tail shuffles once as pre-combined single rows and then dies at the
    ``min_df`` filter; the head — where the volume is — arrives
    map-side collapsed. At 100 TB, shard by an n-gram hash prefix if a
    single output table is not required."""
    toks = F.array_remove(F.split(normalized_text(text_col), " "), "")
    grams = F.transform(
        F.array(toks),
        lambda tk: F.when(
            F.size(tk) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(tk) - (n - 1)),
                lambda i: F.array_join(F.slice(tk, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )[0]
    exploded = df.select(
        F.col(id_col).alias("_doc"), F.explode(grams).alias("ngram")
    )
    return (
        exploded.groupBy("ngram")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tf"),
            F.count_distinct("_doc").cast("long").alias("df"),
        )
        .filter(F.col("df") >= min_df)
    )
