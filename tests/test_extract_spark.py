"""End-to-end Spark parity: pages → clean → parse → extract vs the reference
oracle run on the same known parse trees. This is the P/R≥0.95 contract —
at this scale we require P = R = 1.0 (the rules are deterministic)."""

from __future__ import annotations

import pytest

from openie_spark.corpus import (
    STOPWORDS_FIXTURE,
    gen_pages_rows,
    gen_sentence,
    pages_df,
)
from openie_spark.extract import extract_triples_df, ok_triples
from openie_spark.parse import parse_pages, template_parse_page
from openie_spark.textclean import clean_pages

from .reference_oracle import reference_available, reference_triples

N_PAGES = 30
SEED = 11
N_SENTS = 5


def oracle_triple_set():
    """Reference triples for every ru page, keyed by url."""
    rows = gen_pages_rows(N_PAGES, seed=SEED, n_sents=N_SENTS)
    expected = set()
    for i, row in enumerate(rows):
        if row["lang"] != "ru":
            continue
        for j in range(N_SENTS):
            _, tokens = gen_sentence(SEED, i, j)
            ref_tokens = [(f, l, u, h, d) for f, l, u, h, d in tokens]
            for l, rel, r, *_ in reference_triples(
                ref_tokens, stopwords=STOPWORDS_FIXTURE, additional=True
            ):
                expected.add((row["url"], l, rel, r))
    return expected


@pytest.mark.skipif(not reference_available(), reason="reference not present")
def test_pipeline_triples_match_reference(spark):
    pages = pages_df(spark, N_PAGES, seed=SEED, n_sents=N_SENTS, partitions=4)
    cleaned = clean_pages(pages, lang="ru")
    parses = parse_pages(cleaned, template_parse_page)
    triples = ok_triples(
        extract_triples_df(parses, frozenset(STOPWORDS_FIXTURE), with_vectors=False)
    )
    got = {
        (r["url"], r["left_arg"], r["relation"], r["right_arg"])
        for r in triples.collect()
    }
    expected = oracle_triple_set()
    assert expected, "oracle produced no triples — fixture broken"
    missing = expected - got
    extra = got - expected
    assert not missing, f"recall failure, {len(missing)} missing e.g. {sorted(missing)[:5]}"
    assert not extra, f"precision failure, {len(extra)} extra e.g. {sorted(extra)[:5]}"


def test_extract_vectors_shape(spark):
    pages = pages_df(spark, 6, seed=SEED, n_sents=3, partitions=2)
    cleaned = clean_pages(pages, lang="ru")
    parses = parse_pages(cleaned)
    from openie_spark.embeddings import EmbeddingProvider

    vocab = [f"{l}_NOUN" for l in ("контракт", "компания", "договор")]
    prov = EmbeddingProvider(dim=16, vocabulary=vocab)
    df = ok_triples(
        extract_triples_df(
            parses, frozenset(STOPWORDS_FIXTURE), prov.as_dict(), dim=16
        )
    )
    row = df.first()
    if row is not None:
        assert len(row["left_vec"]) == 16
        assert len(row["sent_vec"]) == 16


def test_parse_stage_recovers_generated_trees(spark):
    """TemplateParser recovers the exact generated token/head/deprel arrays."""
    pages = pages_df(spark, 10, seed=3, n_sents=4, partitions=2)
    parses = parse_pages(clean_pages(pages, lang="ru")).collect()
    assert parses
    rows = gen_pages_rows(10, seed=3, n_sents=4)
    idx = {r["url"]: i for i, r in enumerate(rows)}
    checked = 0
    for p in parses:
        i = idx[p["url"]]
        _, tokens = gen_sentence(3, i, p["sent_id"])
        got = [(t["form"], t["lemma"], t["upostag"], t["head"], t["deprel"]) for t in p["tokens"]]
        assert got == tokens
        checked += 1
    assert checked > 0


def test_fused_extract_identity(spark):
    """extract_triples_from_pages (one mapInPandas) must equal the unfused
    clean→parse→extract stages row-for-row, vectors included."""
    from openie_spark.corpus import STOPWORDS_FIXTURE, pages_df
    from openie_spark.extract import (
        extract_triples_df,
        extract_triples_from_pages,
        ok_triples,
    )
    from openie_spark.parse import parse_pages
    from openie_spark.textclean import clean_pages

    pages = pages_df(spark, 60, seed=3)
    stops = frozenset(STOPWORDS_FIXTURE)
    unfused = ok_triples(
        extract_triples_df(
            parse_pages(clean_pages(pages, lang="ru")), stops, dim=8
        )
    )
    fused = ok_triples(
        extract_triples_from_pages(pages, stops, dim=8, lang="ru")
    )
    cols = [
        "url", "sent_id", "sent_text", "left_arg", "left_arg_lemmas",
        "relation", "relation_lemmas", "right_arg", "right_arg_lemmas",
        "right_deprel",
    ]

    def snap(df):
        return sorted(
            (
                *[r[c] for c in cols],
                tuple(r["left_vec"]), tuple(r["right_vec"]), tuple(r["sent_vec"]),
            )
            for r in df.collect()
        )

    assert snap(unfused) == snap(fused)


def test_fused_extract_lang_pushdown(spark, tmp_path):
    from openie_spark.corpus import STOPWORDS_FIXTURE, pages_df
    from openie_spark.extract import extract_triples_from_pages

    pages_df(spark, 30, seed=1).write.parquet(str(tmp_path / "pages"))
    pages = spark.read.parquet(str(tmp_path / "pages"))
    df = extract_triples_from_pages(pages, frozenset(STOPWORDS_FIXTURE), lang="ru")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "EqualTo(lang,ru)" in plan
