"""Golden + oracle-parity tests for the triple-extraction rule algebra.

Golden fixtures G1-G6 come from FIXTURES.md §5 (produced by executing the
reference's own SentenceReltuples). The oracle-parity tests re-execute the
reference live (tests/reference_oracle.py) on the same inputs and require
exact triple-set equality.
"""

from __future__ import annotations

import pytest

from openie_spark.rules import Sent, clean_phrase, extract_triples

from .reference_oracle import reference_available, reference_triples

# tokens: (form, lemma, upostag, head, deprel) — 1-indexed heads, 0 = root
G1_TOKENS = [
    ("John", "john", "PROPN", 5, "nsubj"),
    ("Smith", "smith", "PROPN", 1, "flat:name"),
    ("director", "director", "NOUN", 1, "appos"),
    ("the", "the", "DET", 3, "det"),
    ("signed", "sign", "VERB", 0, "root"),
    ("contract", "contract", "NOUN", 5, "obj"),
    ("with", "with", "ADP", 8, "case"),
    ("company", "company", "NOUN", 5, "obl"),
    ("in", "in", "ADP", 10, "case"),
    ("May", "may", "PROPN", 5, "obl"),
]

G2_TOKENS = [
    ("city", "city", "NOUN", 4, "nsubj"),
    ("not", "not", "PART", 4, "advmod"),
    ("was", "be", "AUX", 4, "cop"),
    ("capital", "capital", "NOUN", 0, "root"),
]

G3_TOKENS = [
    ("government", "government", "NOUN", 2, "nsubj"),
    ("wants", "want", "VERB", 0, "root"),
    ("to", "to", "PART", 4, "mark"),
    ("raise", "raise", "VERB", 2, "xcomp"),
    ("taxes", "tax", "NOUN", 4, "obj"),
]

G4_TOKENS = [
    ("company", "company", "NOUN", 2, "nsubj"),
    ("bought", "buy", "VERB", 0, "root"),
    ("shares", "share", "NOUN", 2, "obj"),
    ("and", "and", "CCONJ", 5, "cc"),
    ("sold", "sell", "VERB", 2, "conj"),
    ("bonds", "bond", "NOUN", 5, "obj"),
]

G5_TOKENS = [
    ("director", "director", "NOUN", 4, "nsubj"),
    ("of", "of", "ADP", 3, "case"),
    ("company", "company", "NOUN", 1, "nmod"),
    ("signed", "sign", "VERB", 0, "root"),
    ("deal", "deal", "NOUN", 4, "obj"),
]

G6_TOKENS = [
    ("he", "he", "PRON", 2, "nsubj"),
    ("saw", "see", "VERB", 0, "root"),
    ("it", "it", "PRON", 2, "obj"),
]


def run(tokens, stopwords=(), additional=True):
    forms, lemmas, upos, heads, deprels = zip(*tokens)
    sent = Sent(forms, lemmas, upos, heads, deprels)
    rows = extract_triples(
        sent, frozenset(stopwords), additional_relations=additional
    )
    return {(r["left_arg"], r["relation"], r["right_arg"], r["right_deprel"]) for r in rows}


def test_g1_verb_case_stealing_flat_appos():
    got = run(G1_TOKENS, stopwords=("the",))
    assert got == {
        ("john smith director the", "signed", "contract", "obj"),
        ("john smith director the", "signed with", "company", "obl"),
        ("john smith director the", "signed in", "may", "obl"),
        ("john smith director the", "_is_a_", "smith", "flat:name"),
        ("john smith director the", "_is_a_", "director the", "appos"),
        ("director the", "_is_a_", "director", "appos"),
        ("john smith director the", "_is_a_", "john", "nsubj"),
    }


def test_g2_copula_part():
    assert run(G2_TOKENS) == {("city", "not was", "capital", "root")}


def test_g3_xcomp_chain():
    assert run(G3_TOKENS) == {("government", "wants to raise", "taxes", "obj")}


def test_g4_conj_subject_inheritance():
    assert run(G4_TOKENS) == {
        ("company", "bought", "shares", "obj"),
        ("company", "sold", "bonds", "obj"),
    }


def test_g5_nmod_relates_to():
    assert run(G5_TOKENS) == {
        ("director of company", "signed", "deal", "obj"),
        ("director of company", "_relates_to_", "of company", "nmod"),
        ("of company", "_is_a_", "company", "nmod"),
        ("director of company", "_is_a_", "director", "nsubj"),
    }


def test_g6_stopword_suppression():
    assert run(G6_TOKENS, stopwords=("he",)) == set()


def test_clean_phrase():
    assert clean_phrase("  Hello, World! ") == "hello, world"
    assert clean_phrase("_is_a_") == "_is_a_"
    assert clean_phrase("Привет—мир?") == "привет—мир"
    assert clean_phrase(" .,:;-") == ""


def test_single_char_lemma_filtered():
    tokens = [
        ("x", "x", "NOUN", 2, "nsubj"),
        ("saw", "see", "VERB", 0, "root"),
        ("tree", "tree", "NOUN", 2, "obj"),
    ]
    assert run(tokens) == set()


def test_no_additional_relations():
    got = run(G5_TOKENS, additional=False)
    assert got == {("director of company", "signed", "deal", "obj")}


# ---- live oracle parity ----------------------------------------------------

ORACLE_CASES = {
    "g1": (G1_TOKENS, ("the",)),
    "g2": (G2_TOKENS, ()),
    "g3": (G3_TOKENS, ()),
    "g4": (G4_TOKENS, ()),
    "g5": (G5_TOKENS, ()),
    "g6": (G6_TOKENS, ("he",)),
    # double right-arg with two subjects: exercises the case-steal mutation
    # being visible to the second subject
    "two_subj_case_steal": (
        [
            ("anna", "anna", "PROPN", 3, "nsubj"),
            ("ivan", "ivan", "PROPN", 3, "nsubj"),
            ("walked", "walk", "VERB", 0, "root"),
            ("to", "to", "ADP", 5, "case"),
            ("school", "school", "NOUN", 3, "obl"),
        ],
        (),
    ),
    # double copula
    "double_copula": (
        [
            ("he", "he", "PRON", 5, "nsubj"),
            ("was", "be", "AUX", 5, "cop"),
            ("and", "and", "CCONJ", 5, "cc"),
            ("is", "be", "AUX", 5, "cop"),
            ("king", "king", "NOUN", 0, "root"),
        ],
        (),
    ),
    # nested nmod chains
    "nested_nmod": (
        [
            ("head", "head", "NOUN", 6, "nsubj"),
            ("of", "of", "ADP", 3, "case"),
            ("department", "department", "NOUN", 1, "nmod"),
            ("of", "of", "ADP", 5, "case"),
            ("physics", "physics", "NOUN", 3, "nmod"),
            ("resigned", "resign", "VERB", 0, "root"),
            ("yesterday", "yesterday", "NOUN", 6, "obl"),
        ],
        (),
    ),
    # conj under xcomp: grandparent climbing
    "conj_under_xcomp": (
        [
            ("board", "board", "NOUN", 2, "nsubj"),
            ("decided", "decide", "VERB", 0, "root"),
            ("to", "to", "PART", 4, "mark"),
            ("approve", "approve", "VERB", 2, "xcomp"),
            ("budget", "budget", "NOUN", 4, "obj"),
            ("and", "and", "CCONJ", 7, "cc"),
            ("reject", "reject", "VERB", 4, "conj"),
            ("proposal", "proposal", "NOUN", 7, "obj"),
        ],
        (),
    ),
    # aux chain + obl:agent (passive-ish)
    "aux_passive": (
        [
            ("law", "law", "NOUN", 3, "nsubj:pass"),
            ("was", "be", "AUX", 3, "aux:pass"),
            ("adopted", "adopt", "VERB", 0, "root"),
            ("by", "by", "ADP", 5, "case"),
            ("parliament", "parliament", "NOUN", 3, "obl:agent"),
        ],
        (),
    ),
    # flat chain inside obj
    "flat_in_obj": (
        [
            ("press", "press", "NOUN", 2, "nsubj"),
            ("quoted", "quote", "VERB", 0, "root"),
            ("president", "president", "NOUN", 2, "obj"),
            ("Ivan", "ivan", "PROPN", 3, "flat:name"),
            ("Petrov", "petrov", "PROPN", 4, "flat:name"),
        ],
        (),
    ),
}


@pytest.mark.skipif(not reference_available(), reason="reference not present")
@pytest.mark.parametrize("name", sorted(ORACLE_CASES))
def test_oracle_parity(name):
    tokens, stops = ORACLE_CASES[name]
    expected = {
        (l, rel, r, dep) for l, rel, r, dep, *_ in reference_triples(
            tokens, stopwords=stops, additional=True
        )
    }
    assert run(tokens, stopwords=stops) == expected


@pytest.mark.skipif(not reference_available(), reason="reference not present")
@pytest.mark.parametrize("name", sorted(ORACLE_CASES))
def test_oracle_parity_lemmas(name):
    """Also match the lemmatized forms and full tuple shape."""
    tokens, stops = ORACLE_CASES[name]
    expected = {
        (l, rel, r, dep, ll, rl, rr)
        for l, rel, r, dep, ll, rl, rr in reference_triples(
            tokens, stopwords=stops, additional=True
        )
    }
    forms, lemmas, upos, heads, deprels = zip(*tokens)
    rows = extract_triples(
        Sent(forms, lemmas, upos, heads, deprels),
        frozenset(stops),
        additional_relations=True,
    )
    got = {
        (
            r["left_arg"],
            r["relation"],
            r["right_arg"],
            r["right_deprel"],
            r["left_arg_lemmas"],
            r["relation_lemmas"],
            r["right_arg_lemmas"],
        )
        for r in rows
    }
    assert got == expected
