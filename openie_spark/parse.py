"""Parser seam: cleaned text → dependency-parsed sentence rows.

The reference drives a UDPipe C++ model through SWIG, one sentence at a time
(/root/reference/udpipe_model.py:23-57). That model isn't available in this
sandbox, so the seam has two interchangeable implementations, both running
as batched ``mapInPandas`` stages (model/lexicon loaded once per executor
process, never per row):

- ``TemplateParser`` — the deterministic grammar parser paired with
  openie_spark.corpus. Real tokenize + lexicon lookup + pattern match work
  per sentence; known-correct parses, so end-to-end correctness is testable.
- ``conllu_to_parses`` — the pre-parsed CoNLL-U ingestion path, mirroring
  the reference's own parser bypass (``is_conllu=y``,
  /root/reference/app.py:81-82; CLI .conllu dirs, relations.py:1067-1071).

A production UDPipe deployment plugs in by implementing
``parse_page(url, text) -> list[(sent_text, tokens)]`` and passing it to
``parse_pages`` — the Spark plumbing (schema, batching, explode shape) is
identical.

Scale notes: this is a narrow stage (no shuffle); one input page row fans
out to N sentence rows inside the same task. Arrow batch size is capped by
the session config so batches of long pages stay bounded.
"""

from __future__ import annotations

import re
from typing import Callable, Iterable, Iterator, List, Optional, Tuple

import pandas as pd

from .conllu import PARSE_SCHEMA, parse_conllu, tokens_to_rows
from .corpus import LEXICON, PATTERN_BY_UPOS_SEQ

_SENT_SPLIT_RE = re.compile(r"(?<=[.!?])\s+")
_TRAIL_PUNCT_RE = re.compile(r"[.!?]+$")

# (sent_text, tokens) where tokens are 10-field CoNLL-U tuples
ParsedSentence = Tuple[str, List[tuple]]
PageParser = Callable[[Optional[str], str], List[ParsedSentence]]


def template_parse_page(url: Optional[str], text: str) -> List[ParsedSentence]:
    """Deterministic grammar parse of one cleaned page."""
    out: List[ParsedSentence] = []
    if not text:
        return out
    for raw_sent in _SENT_SPLIT_RE.split(text.strip()):
        sent = raw_sent.strip()
        if not sent:
            continue
        forms = _TRAIL_PUNCT_RE.sub("", sent).split()
        entries = [LEXICON.get(f) for f in forms]
        if not entries or any(e is None for e in entries):
            continue  # unparseable noise line — dropped, like a tagger failure
        upos_seq = tuple(e[1] for e in entries)
        spec = PATTERN_BY_UPOS_SEQ.get(upos_seq)
        if spec is None:
            continue
        heads, deprels = spec
        tokens = [
            (
                i + 1,
                forms[i],
                entries[i][0],
                entries[i][1],
                "_",
                "_",
                heads[i],
                deprels[i],
                "_",
                "_",
            )
            for i in range(len(forms))
        ]
        out.append((sent, tokens))
    return out


def parse_pages(clean_df, page_parser: PageParser = template_parse_page):
    """(url, warc_ts, lang, clean_text) → parses(url, sent_id, sent_text, tokens).

    One mapInPandas stage; each Arrow batch is parsed in-process and exploded
    to sentence rows.
    """

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, sids, texts, toks = [], [], [], []
            for url, text in zip(pdf["url"].tolist(), pdf["clean_text"].tolist()):
                for sent_id, (sent_text, tokens) in enumerate(
                    page_parser(url, text or "")
                ):
                    urls.append(url)
                    sids.append(sent_id)
                    texts.append(sent_text)
                    toks.append(tokens_to_rows(tokens))
            yield pd.DataFrame(
                {"url": urls, "sent_id": sids, "sent_text": texts, "tokens": toks}
            )

    return clean_df.select("url", "clean_text").mapInPandas(run, schema=PARSE_SCHEMA)


def conllu_to_parses(conllu_df, url_col: str = "url", conllu_col: str = "conllu"):
    """Pre-parsed CoNLL-U ingestion (the reference's is_conllu bypass):
    (url, conllu text) rows → parses rows."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, sids, texts, toks = [], [], [], []
            for url, text in zip(pdf[url_col].tolist(), pdf[conllu_col].tolist()):
                for sent_id, (sent_text, tokens) in enumerate(parse_conllu(text or "")):
                    urls.append(url)
                    sids.append(sent_id)
                    texts.append(
                        sent_text
                        if sent_text is not None
                        else " ".join(t[1] for t in tokens)
                    )
                    toks.append(tokens_to_rows(tokens))
            yield pd.DataFrame(
                {"url": urls, "sent_id": sids, "sent_text": texts, "tokens": toks}
            )

    return conllu_df.select(url_col, conllu_col).mapInPandas(run, schema=PARSE_SCHEMA)
