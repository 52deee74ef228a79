"""Gopher-style repetition signals — the quality filters a web-scale
training-data pipeline runs over EVERY document (Rae et al. 2021 §A1.1,
"repetition removal"; same family in RefinedWeb/Dolma): documents
dominated by repeated lines or by one high-frequency n-gram are
low-quality boilerplate/spam and get filtered before training.

Reference scope note: the reference pipeline (sudoandros/OpenIE) has no
quality filtering; this is part of the training-data layer beyond
reference parity.

Shape: every signal is computed IN-ARRAY per document — sorted-run
folds over the doc's own lines/n-grams — so the operator is a pure
narrow projection: NO explode, NO shuffle, NO Python (plan-tested
Exchange-free). At 100 TB that is the difference between a map-only
pass and two corpus-wide exchanges (the explode → groupBy(doc, gram) →
regroup(doc) alternative).

Determinism contract: the oracled columns are integers and the winning
n-gram STRING; ties on the top n-gram count break to the
lexicographically smallest gram (the fold scans a sorted array and
replaces only on strictly-greater counts). Fractions are derived
ratios for human use, excluded from the value-hash contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalized_text


def _word_ngrams(t: F.Column, n: int) -> F.Column:
    """Word n-grams of a token array (empty when len < n)."""
    return F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - n),
            lambda i: F.array_join(F.slice(t, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _top_run(sorted_arr: F.Column) -> F.Column:
    """(best_item, best_count) of a SORTED array via one fold counting
    runs; strictly-greater replacement = smallest item wins count ties.
    Returns struct(item string, cnt long); item '' / cnt 0 when empty."""
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit("").alias("best"),
        F.lit(0).cast("long").alias("best_cnt"),
    )

    def step(acc, x):
        is_run = (acc["run"] > 0) & (x == acc["prev"])
        run = F.when(is_run, acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        better = run > acc["best_cnt"]
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.when(better, x).otherwise(acc["best"]).alias("best"),
            F.when(better, run).otherwise(acc["best_cnt"]).alias("best_cnt"),
        )

    return F.aggregate(
        sorted_arr,
        zero,
        step,
        lambda acc: F.struct(
            acc["best"].alias("item"), acc["best_cnt"].alias("cnt")
        ),
    )


def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_delim: str = "\n",
    ngram_n: int = 2,
    lines_col: str | None = None,
) -> DataFrame:
    """Per-document repetition statistics:

    - ``n_lines`` / ``n_dup_line_instances``: total lines and how many
      line instances are repeats of an earlier identical (trimmed) line
      in the SAME doc — Gopher's duplicate-line signal as integers
      (``len - len(distinct)``).
    - ``top_ngram`` / ``top_ngram_count`` / ``n_ngrams``: the most
      frequent word ``ngram_n``-gram of the normalized text, its count,
      and the total n-gram count — Gopher's top-n-gram-coverage signal;
      character coverage is ``top_ngram_count · len(top_ngram)`` over
      the normalized char count (``dup_line_frac`` / ``top_ngram_frac``
      derived as doubles).

    ``lines_col`` bypasses the ``line_delim`` split (pair with
    linededup.token_chunk_lines for newline-free corpora)."""
    packed = _signals_col(text_col, line_delim, ngram_n, lines_col)
    out = df.select(F.col(id_col), packed.alias("_r"))
    n_lines = F.col("_r.n_lines").cast("long")
    n_dup = F.col("_r.n_dup_line_instances").cast("long")
    n_ngrams = F.col("_r.g.n_ngrams").cast("long")
    n_chars = F.col("_r.n_chars").cast("long")
    top_gram = F.col("_r.g.top.item")
    top_cnt = F.col("_r.g.top.cnt")
    return out.select(
        F.col(id_col),
        n_lines.alias("n_lines"),
        n_dup.alias("n_dup_line_instances"),
        top_gram.alias("top_ngram"),
        top_cnt.alias("top_ngram_count"),
        n_ngrams.alias("n_ngrams"),
        n_chars.alias("n_chars_norm"),
        F.when(n_lines > 0, n_dup / n_lines)
        .otherwise(F.lit(0.0))
        .alias("dup_line_frac"),
        F.when(n_ngrams > 0, (top_cnt * F.length(top_gram)) / n_chars)
        .otherwise(F.lit(0.0))
        .alias("top_ngram_frac"),
    )


def _signals_col(
    text_col: str,
    line_delim: str,
    ngram_n: int,
    lines_col: str | None = None,
) -> F.Column:
    """The packed per-row signals struct (n_lines, n_dup_line_instances,
    top struct(item, cnt), n_ngrams, n_chars) — every subtree let-bound
    so lines/tokens/grams each evaluate once per row."""
    if lines_col is None:
        lines_src = F.split(F.col(text_col), line_delim)
    else:
        lines_src = F.col(lines_col)
    # NB: F.trim must be wrapped — passed bare, its optional second
    # parameter binds the lambda variable and the trim silently no-ops
    lines = F.transform(
        F.array(lines_src),
        lambda ls: F.transform(ls, lambda x: F.trim(x)),
    )[0]
    toks = F.array_remove(F.split(normalized_text(text_col), " "), "")
    return F.transform(
        F.array(F.struct(lines.alias("ls"), toks.alias("t"))),
        lambda s: F.struct(
            F.size(s["ls"]).alias("n_lines"),
            (F.size(s["ls"]) - F.size(F.array_distinct(s["ls"]))).alias(
                "n_dup_line_instances"
            ),
            F.transform(
                F.array(_word_ngrams(s["t"], ngram_n)),
                lambda gs: F.struct(
                    _top_run(F.array_sort(gs)).alias("top"),
                    F.size(gs).alias("n_ngrams"),
                ),
            )[0].alias("g"),
            F.length(F.array_join(s["t"], " ")).alias("n_chars"),
        ),
    )[0]


def repetition_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dup_line_frac: float = 0.3,
    max_top_ngram_frac: float = 0.2,
    ngram_n: int = 2,
    line_delim: str = "\n",
) -> DataFrame:
    """Gopher-style keep/drop: docs whose duplicate-line fraction or
    top-n-gram character coverage exceeds a threshold are dropped.
    The decision is a PER-ROW predicate on the same packed signals
    struct — no join, no shuffle; the filter composes with further
    narrow ops in the same stage."""
    packed = _signals_col(text_col, line_delim, ngram_n)
    tmp = df.withColumn("_r", packed)
    n_lines = F.col("_r.n_lines").cast("long")
    n_dup = F.col("_r.n_dup_line_instances").cast("long")
    n_ngrams = F.col("_r.g.n_ngrams").cast("long")
    n_chars = F.col("_r.n_chars").cast("long")
    dup_frac = F.when(n_lines > 0, n_dup / n_lines).otherwise(F.lit(0.0))
    top_frac = F.when(
        n_ngrams > 0,
        (F.col("_r.g.top.cnt") * F.length(F.col("_r.g.top.item"))) / n_chars,
    ).otherwise(F.lit(0.0))
    return tmp.filter(
        (dup_frac <= max_dup_line_frac) & (top_frac <= max_top_ngram_frac)
    ).drop("_r")
