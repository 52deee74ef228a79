"""Byte-identity tests for the cleaning stage.

The contract (BASELINE.json input_hint): extracted text per url must be
byte-identical to the reference's clean_text. The oracle is the reference's
own syntax.py executed live on the same inputs.
"""

from __future__ import annotations

import pytest

from openie_spark.corpus import gen_pages_rows
from openie_spark.textclean import clean_page, clean_text, format_of_url, sniff_decode

from .reference_oracle import load_reference_syntax, reference_available

CASES = [
    ("<p>Hello &amp; world</p>", ""),
    ("a = b\nplain text here.", "htm"),
    ("junk\nTEXT_THEMAN_ANNO=Новость дня. Курс вырос.\nmore", "hdr"),
    ("1 2 3 4 5 6 Правительство одобрило бюджет.", "sts"),
    ("Заголовок без точки\nТело текста.", ""),
    ("literal\\n\\nbackslash n", ""),
    ("ends mid\nsentence &quot;quoted&quot;", ""),
    ("<div class='x'>tag <b>bold</b></div>\nnext line!", "htm"),
    ("", ""),
    ("a\n\n\nb", ""),
]


@pytest.mark.skipif(not reference_available(), reason="reference not present")
@pytest.mark.parametrize("text,fmt", CASES)
def test_clean_text_byte_identity(text, fmt):
    syntax = load_reference_syntax()
    expected = syntax.clean_text(text, format_=fmt or None)
    assert clean_text(text, fmt) == expected


@pytest.mark.skipif(not reference_available(), reason="reference not present")
def test_generated_pages_byte_identity():
    """Every synthetic page, decoded and cleaned, matches the reference
    cleaner byte for byte."""
    syntax = load_reference_syntax()
    rows = gen_pages_rows(n_pages=60, seed=7)
    for row in rows:
        decoded = sniff_decode(row["html"])
        fmt = format_of_url(row["url"]) or None
        expected = syntax.clean_text(decoded, format_=fmt)
        got = clean_page(row["url"], row["html"], row["text"])
        assert got == expected, row["url"]


def test_sniff_decode_cp1251_and_utf8():
    ru = "Привет мир"
    assert sniff_decode(ru.encode("utf-8")) == ru
    assert sniff_decode(ru.encode("cp1251")) == ru
    # pure ascii: identical under both candidate encodings
    assert sniff_decode(b"hello") == "hello"


def test_format_of_url():
    assert format_of_url("http://x/y/z.hdr") == "hdr"
    assert format_of_url("http://x/y/z.sts?q=1") == "sts"
    assert format_of_url("http://x/y/z") == ""
    assert format_of_url(None) == ""


def test_literal_backslash_n_quirk():
    # the collapse pattern matches the two-char sequence backslash+n, NOT
    # newlines; the later headline fixup then converts the produced "\n"
    # after a non-sentence-final char into ". "
    # NB the pattern is backslash + "n+", so "\n\n" → TWO newlines (each
    # pair replaced separately), and the headline fixup can then match the
    # first newline as its [^.!?] char — verified against the oracle.
    assert clean_text("a\\n\\nb") == "a. b"
    assert clean_text("a.\\n\\nb") == "a.\n. b"
    assert clean_text("a\\nnnnb") == "a. b"  # backslash + n-run collapses, then fixup


def test_clean_pages_spark(spark):
    from openie_spark.corpus import pages_df
    from openie_spark.textclean import clean_pages

    from .reference_oracle import load_reference_syntax

    pages = pages_df(spark, n_pages=40, seed=7, partitions=4)
    cleaned = clean_pages(pages, lang="ru").collect()
    assert cleaned, "lang filter removed everything?"
    if reference_available():
        syntax = load_reference_syntax()
        raw = {r["url"]: r for r in gen_pages_rows(n_pages=40, seed=7)}
        for row in cleaned:
            src = raw[row["url"]]
            expected = syntax.clean_text(
                sniff_decode(src["html"]), format_=format_of_url(src["url"]) or None
            )
            assert row["clean_text"] == expected, row["url"]
    # lang filter honored
    langs = {r["lang"] for r in cleaned}
    assert langs == {"ru"}
