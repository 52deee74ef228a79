"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.

Everything here is a pure JVM-side column expression (split / filter /
arithmetic), deliberately: these run over every document of a 100 TB
corpus, so they must stay inside whole-stage codegen. Each has an
exactly-equivalent ANSI SQL form used as its DuckDB oracle in
__spark_entry__.py.

Marker-word counting is token-membership based (split + filter), NOT
``\\b``-regex based: Java regex ``\\b`` is ASCII-word-boundary by default,
so it never matches around Cyrillic words — a silent zero for Russian.
Token filtering is alphabet-agnostic and has identical semantics in DuckDB
(``list_filter``), which keeps the oracles honest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalized_text

# tiny high-frequency function-word lists; the heuristic is hit-count argmax
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "was", "for", "with", "that"],
    "es": ["el", "la", "los", "las", "de", "que", "y", "en", "un", "una", "por"],
    "ru": ["и", "в", "не", "на", "что", "с", "по", "как", "это", "был"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "für", "nicht"],
}
LANG_ORDER = ["en", "es", "ru", "de"]  # deterministic tie order


def _tokens(text_col: str) -> F.Column:
    return F.split(normalized_text(text_col), " ")


def marker_hits(text_col: str, markers: list) -> F.Column:
    """Count tokens that are marker words (codegen'd filter, no regex)."""
    lit_markers = F.array(*[F.lit(m) for m in markers])
    return F.size(
        F.filter(_tokens(text_col), lambda t: F.array_contains(lit_markers, t))
    )


def token_count(text_col: str = "text") -> F.Column:
    """Whitespace token count (0 for empty)."""
    t = F.trim(F.col(text_col))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def bpe_ish_token_count(text_col: str = "text") -> F.Column:
    """Subword-ish token count: alnum runs and single non-space symbols —
    a deterministic stand-in for BPE vocab tokenization."""
    return F.size(
        F.regexp_extract_all(
            F.col(text_col),
            F.lit(r"[A-Za-zА-Яа-я0-9]+|[^\sA-Za-zА-Яа-я0-9]"),
            0,
        )
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features: length, token stats, punct / digit /
    uppercase ratios, stopword ratio (en markers), mean word length."""
    t = F.col(text_col)
    n_chars = F.length(t)
    toks = token_count(text_col)
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[\.,;:!\?]"), 0))
    n_digit = F.size(F.regexp_extract_all(t, F.lit(r"[0-9]"), 0))
    n_upper = F.size(F.regexp_extract_all(t, F.lit(r"[A-Z]"), 0))
    n_stop = marker_hits(text_col, LANG_MARKERS["en"])
    return df.withColumns(
        {
            "n_chars": n_chars,
            "n_tokens": toks,
            "punct_ratio": F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0)),
            "digit_ratio": F.when(n_chars > 0, n_digit / n_chars).otherwise(F.lit(0.0)),
            "upper_ratio": F.when(n_chars > 0, n_upper / n_chars).otherwise(F.lit(0.0)),
            "stopword_ratio": F.when(toks > 0, n_stop / toks).otherwise(F.lit(0.0)),
            "mean_word_len": F.when(toks > 0, (n_chars - toks + 1) / toks).otherwise(
                F.lit(0.0)
            ),
        }
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scalar quality score in [0, 1]: length sweet spot, low punct/digit
    noise, healthy stopword density. Deterministic, monotone pieces."""
    qf = quality_features(df, text_col)
    length_score = F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0))
    noise_penalty = F.greatest(
        F.lit(0.0),
        F.lit(1.0) - 2.0 * F.col("punct_ratio") - 2.0 * F.col("digit_ratio"),
    )
    stop_score = F.least(F.col("stopword_ratio") * 4.0, F.lit(1.0))
    return qf.withColumn(
        "quality",
        F.round((length_score + noise_penalty + stop_score) / 3.0, 6),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of marker-word hit counts, ties broken
    by LANG_ORDER; 'und' when no marker hits at all."""
    hits = {lang: marker_hits(text_col, LANG_MARKERS[lang]) for lang in LANG_ORDER}
    best = F.greatest(*[hits[l] for l in LANG_ORDER])
    expr = F.lit("und")
    for lang in reversed(LANG_ORDER):  # earlier languages win ties
        expr = F.when((hits[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    out = df.withColumn("lang_pred", expr)
    for lang in LANG_ORDER:
        out = out.withColumn(f"hits_{lang}", hits[lang])
    return out


def content_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact content fingerprint: md5 over normalized text (ANSI-portable)."""
    return df.withColumn("fingerprint", F.md5(normalized_text(text_col)))


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing (rolling-hash) fingerprints: per doc, the set of window
    minima over k-gram hashes — the standard near-copy detection sketch.
    JVM-side: k-gram shingles → hash → sliding-window min via transform."""
    # both levels LET-BOUND (the word_shingles idiom): referencing the
    # token array inside the per-k-gram lambda — or the k-gram hash
    # array inside the per-window lambda — re-evaluates the captured
    # subtree once PER ELEMENT after CollapseProject (O(len²) per doc,
    # twice over); binding each as a lambda variable evaluates each
    # exactly once per row
    toks = _tokens(text_col)
    mins = F.transform(
        F.array(toks),
        lambda t: F.transform(
            F.array(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(F.size(t) - k, F.lit(0))),
                    lambda i: F.xxhash64(F.array_join(F.slice(t, i + 1, k), " ")),
                )
            ),
            lambda kg: F.transform(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.size(kg) - window + 1, F.lit(1)) - 1,
                ),
                lambda w: F.array_min(F.slice(kg, w + 1, window)),
            ),
        )[0],
    )[0]
    return df.select(
        F.col(id_col), F.array_distinct(mins).alias("fingerprints")
    )
