"""CoNLL-U codec: 10-column text blocks ↔ token-struct arrays.

The reference round-trips every corpus through CoNLL-U text (write:
/root/reference/udpipe_model.py:59-68, read: :30-49, re-parse boundary at
relations.py:969). We keep the same serialization boundary as our stage
checkpoint / parity output, but the canonical in-engine representation is a
``tokens array<struct<...>>`` column (FIXTURES.md §2) — columnar, prunable,
and Arrow-transportable.

Multi-word-token ranges (``1-2``) and empty nodes (``1.1``) are skipped on
read, matching how the reference's extraction rules only ever index integer
word ids.
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Tuple

from pyspark.sql import types as T

TOKEN_FIELDS = [
    ("id", T.IntegerType()),
    ("form", T.StringType()),
    ("lemma", T.StringType()),
    ("upostag", T.StringType()),
    ("xpostag", T.StringType()),
    ("feats", T.StringType()),
    ("head", T.IntegerType()),
    ("deprel", T.StringType()),
    ("deps", T.StringType()),
    ("misc", T.StringType()),
]

TOKEN_TYPE = T.StructType([T.StructField(n, t, True) for n, t in TOKEN_FIELDS])

PARSE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("sent_id", T.IntegerType(), False),
        T.StructField("sent_text", T.StringType(), True),
        T.StructField("tokens", T.ArrayType(TOKEN_TYPE), True),
    ]
)

Token = Tuple  # (id, form, lemma, upostag, xpostag, feats, head, deprel, deps, misc)


def parse_conllu(text: str) -> List[Tuple[Optional[str], List[tuple]]]:
    """CoNLL-U text → list of (sent_text, tokens). Comment ``# text =`` lines
    populate sent_text; token lines with range/decimal ids are skipped."""
    sentences: List[Tuple[Optional[str], List[tuple]]] = []
    sent_text: Optional[str] = None
    tokens: List[tuple] = []
    for raw in text.splitlines():
        line = raw.rstrip("\n")
        if not line.strip():
            if tokens:
                sentences.append((sent_text, tokens))
            sent_text, tokens = None, []
            continue
        if line.startswith("#"):
            body = line[1:].strip()
            if body.startswith("text =") or body.startswith("text="):
                sent_text = body.split("=", 1)[1].strip()
            continue
        cols = line.split("\t")
        if len(cols) != 10:
            continue
        tid = cols[0]
        if not tid.isdigit():
            continue  # multiword range or empty node
        head = int(cols[6]) if cols[6].isdigit() else 0
        tokens.append(
            (int(tid), cols[1], cols[2], cols[3], cols[4], cols[5], head, cols[7], cols[8], cols[9])
        )
    if tokens:
        sentences.append((sent_text, tokens))
    return sentences


def write_conllu(sent_text: Optional[str], tokens: Iterable[tuple]) -> str:
    """(sent_text, tokens) → one CoNLL-U block (with ``# text =`` comment)."""
    lines = []
    if sent_text:
        lines.append(f"# text = {sent_text}")
    for t in tokens:
        lines.append(
            "\t".join(
                [
                    str(t[0]),
                    t[1] or "_",
                    t[2] or "_",
                    t[3] or "_",
                    t[4] or "_",
                    t[5] or "_",
                    str(t[6]),
                    t[7] or "_",
                    t[8] or "_",
                    t[9] or "_",
                ]
            )
        )
    return "\n".join(lines) + "\n\n"


def tokens_to_rows(tokens: List[tuple]) -> List[dict]:
    """Tuple tokens → struct-row dicts matching TOKEN_TYPE."""
    return [
        {
            "id": t[0],
            "form": t[1],
            "lemma": t[2],
            "upostag": t[3],
            "xpostag": t[4],
            "feats": t[5],
            "head": t[6],
            "deprel": t[7],
            "deps": t[8],
            "misc": t[9],
        }
        for t in tokens
    ]
