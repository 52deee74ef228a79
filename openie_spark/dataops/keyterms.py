"""Per-document distinctive terms (TF-IDF family) — the keyword layer a
KG-construction pipeline uses to nominate entity candidates and a
training-data pipeline uses for topic tagging and corpus diagnostics.

Reference scope note: the reference (sudoandros/OpenIE) extracts
relation triples only; keyword nomination is part of the training-data
layer beyond reference parity.

Determinism stance: the RANKING the oracle checks is integer-only —
(tf desc, doc-frequency asc, term asc) — i.e. most frequent in the doc,
rarest in the corpus on ties, lexicographic last. True float TF-IDF
(tf·ln(N/df)) is exposed as a derived column (``tfidf_scores``) and
pinned in pytest against numpy, but kept out of the cross-engine
value-hash contract: comparing floats ranks near-ties differently per
engine, integers never do.

Shape at 100 TB: two counting aggregations (term-per-doc, doc-frequency
— both with map-side partial aggregation), one join on term, one window
by doc. The doc-frequency side follows VOCABULARY size, not corpus
size; with ``max_df_frac`` (stopword drop) applied before the join and
a Zipf vocabulary, broadcast it by wrapping in ``F.broadcast`` upstream
or let AQE decide (default).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .cooccur import token_doc_freq
from .dedup import normalized_text


def term_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, term, tf): within-doc term frequency over normalized tokens.
    One shuffle, partial-agg combine."""
    toks = F.array_remove(F.split(normalized_text(text_col), " "), "")
    return (
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_df: int = 1,
    max_df_frac: Optional[float] = None,
) -> DataFrame:
    """Top-``k`` distinctive terms per doc by the integer ordering
    (tf desc, term_df asc, term asc). ``min_df`` drops hapax noise,
    ``max_df_frac`` drops stopword-like terms appearing in more than
    that fraction of docs (the IDF cutoff as a pre-join filter).
    Returns (id, term, tf, term_df, rank) — all integers + the term."""
    tc = term_counts(df, id_col, text_col)
    # Formulation note (r8, measured both ways): deriving dfreq FROM tc
    # (groupBy(term).count over the per-doc term table — identical
    # counts, one corpus tokenize pass on paper) measured ~2× SLOWER at
    # 50k docs (1.35→2.78s): tc is consumed twice and the expected
    # exchange reuse does not materialize, so the corpus pass runs
    # twice PLUS the extra aggregation. The two independent passes
    # stay (guide §1.2: a first-principles "ideal" plan loses to the
    # measured one).
    dfreq = token_doc_freq(df, id_col, text_col).select(
        F.col("token").alias("term"), F.col("docs").alias("term_df")
    )
    if min_df > 1:
        dfreq = dfreq.filter(F.col("term_df") >= min_df)
    if max_df_frac is not None:
        n_docs = df.select(
            F.count(F.lit(1)).cast("long").alias("_n_docs")
        )
        dfreq = (
            dfreq.crossJoin(F.broadcast(n_docs))
            .filter(F.col("term_df") <= max_df_frac * F.col("_n_docs"))
            .drop("_n_docs")
        )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("tf"), F.asc("term_df"), F.asc("term")
    )
    return (
        tc.join(dfreq, "term")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(F.col(id_col), "term", "tf", "term_df", "rank")
    )


def tfidf_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, term, tf, term_df, tfidf) with the classic float score
    tf · ln(N/df) — convenience over the integer counts; excluded from
    the oracle-hash contract by design (see module docstring)."""
    tc = term_counts(df, id_col, text_col)
    dfreq = token_doc_freq(df, id_col, text_col).select(
        F.col("token").alias("term"), F.col("docs").alias("term_df")
    )
    n_docs = df.select(F.count(F.lit(1)).cast("long").alias("_n_docs"))
    return (
        tc.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf") * F.log(F.col("_n_docs") / F.col("term_df")),
        )
        .drop("_n_docs")
        .select(F.col(id_col), "term", "tf", "term_df", "tfidf")
    )
