"""Pure-Python dependency-tree triple-extraction rule algebra.

This module is the semantic core of the engine: given one dependency-parsed
sentence (parallel token arrays), emit the same (subject, relation, object)
triples the reference extracts (reference behavior: SentenceReltuples,
/root/reference/relations.py:44-369). It is deliberately free of any Spark
import — a pure function of one sentence — so it can be

  * unit-tested against golden outputs without a SparkSession, and
  * executed batched inside ``mapInPandas`` (openie_spark.extract) where each
    Arrow batch drives thousands of sentences through it JVM→Arrow→numpy with
    no per-row Python UDF at the Spark API level.

Semantics replicated exactly (each rule cites the reference behavior it
mirrors; see SURVEY.md §2.4 for the verified golden examples):

- verb SVO rule with xcomp-skip (relations.py:148-159)
- subject discovery with conj/xcomp inheritance (relations.py:291-300)
- right-arg discovery incl. xcomp / conj-under-xcomp climbing
  (relations.py:277-289)
- relation phrase prefix/postfix (case/aux/aux:pass/PART) with recursive
  xcomp chaining (relations.py:211-252)
- case-stealing: the first pre-root ``case`` token of a right arg moves into
  the relation postfix and *mutates the shared arg list*, so a second subject
  paired with the same arg no longer sees the stolen case
  (relations.py:247-251, 315-321) — replicated including the mutation order.
- copula rule: PART-run + copula as relation, head subtree minus copulas
  minus subjects as right arg (relations.py:161-166, 261-275, 323-342)
- additional nominal rules: appos/flat/flat:foreign/flat:name/conj →
  ``_is_a_``; nmod → ``_relates_to_``; residual main-phrase links — including
  the reference's quirk that the post-nmod residual link is labelled
  ``_is_a_`` (relations.py:168-209)
- self-loop filter on cleaned surface forms (relations.py:53-57)
- stopword filter: arg lemma-set ⊆ stopwords, or single 1-char alphabetic
  lemma (relations.py:144-146, 353-360)
- string cleaning: keep Unicode alnum / whitespace / ",.;-—_/:%", lowercase,
  strip " .,:;-" (relations.py:117-127)
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

IS_A = "_is_a_"
RELATES_TO = "_relates_to_"

_IS_A_DEPRELS = ("appos", "flat", "flat:foreign", "flat:name", "conj")
_RELATES_TO_DEPRELS = ("nmod",)
_SUBJECT_DEPRELS = ("nsubj", "nsubj:pass")
_RIGHT_ARG_DEPRELS = ("obj", "iobj", "obl", "obl:agent", "iobl")
_RELATION_AFFIX_DEPRELS = ("case", "aux", "aux:pass")
_KEEP_PUNCT = set(",.;-—_/:%")
_STRIP_CHARS = " .,:;-"

# A relation is either a list of token ids or one of the literal labels.
RelSpec = Union[List[int], str]
IdTriple = Tuple[List[int], RelSpec, List[int]]


class Sent:
    """One parsed sentence as 1-indexed parallel arrays.

    Index 0 is an artificial root placeholder (empty strings, head=-1) so that
    CoNLL-U ids can be used as direct indices, matching how the reference
    indexes ``sentence.words`` by id. ``children[h]`` lists dependents of
    token ``h`` in ascending id order (token insertion order — the order the
    reference's UDPipe child lists carry).
    """

    __slots__ = ("n", "form", "lemma", "upos", "head", "deprel", "children", "text")

    def __init__(
        self,
        forms: Sequence[str],
        lemmas: Sequence[str],
        upos: Sequence[str],
        heads: Sequence[int],
        deprels: Sequence[str],
        text: Optional[str] = None,
    ):
        n = len(forms)
        if not (len(lemmas) == len(upos) == len(heads) == len(deprels) == n):
            raise ValueError("parallel token arrays must have equal length")
        self.n = n
        # index 0 mirrors the reference's artificial root word, whose form is
        # the literal "<root>" placeholder (it can leak into an argument when
        # a degenerate parse hangs a cop/arg subtree off id 0 — the cleaned
        # surface then contains "root", and we must match that byte-for-byte).
        self.form = ["<root>"] + list(forms)
        self.lemma = [""] + list(lemmas)
        self.upos = [""] + list(upos)
        self.head = [-1] + [int(h) for h in heads]
        self.deprel = [""] + list(deprels)
        children: List[List[int]] = [[] for _ in range(n + 1)]
        for i in range(1, n + 1):
            h = self.head[i]
            if 0 <= h <= n:
                children[h].append(i)
        self.children = children
        self.text = text if text is not None else " ".join(forms)


def clean_phrase(s: str) -> str:
    """Normalize an argument/relation surface string (relations.py:117-127)."""
    kept = "".join(
        ch for ch in s if ch.isalnum() or ch.isspace() or ch in _KEEP_PUNCT
    )
    return kept.lower().strip(_STRIP_CHARS)


def subtree_ids(sent: Sent, root_id: int) -> List[int]:
    """Token ids of the subtree at ``root_id`` in textual in-order
    (pre-root children first, then root, then post-root children;
    relations.py:302-313)."""
    kids = sent.children[root_id]
    if not kids:
        return [root_id]
    out: List[int] = []
    for c in kids:
        if c < root_id:
            out.extend(subtree_ids(sent, c))
    out.append(root_id)
    for c in kids:
        if c > root_id:
            out.extend(subtree_ids(sent, c))
    return out


def root_of(sent: Sent, ids: Sequence[int]) -> Optional[int]:
    """Id of the member whose head lies outside ``ids`` — last such member
    wins, as in the reference's scan (relations.py:344-351)."""
    if not ids:
        return None
    idset = set(ids)
    found = None
    for i in ids:
        if sent.head[i] not in idset:
            found = i
    return found


class _Extractor:
    """Stateful walk over one sentence; produces id-level triples."""

    def __init__(self, sent: Sent, stopwords: frozenset):
        self.s = sent
        self.stop = stopwords

    # -- top level ---------------------------------------------------------

    def id_triples(self, additional: bool) -> List[IdTriple]:
        s = self.s
        found: List[IdTriple] = []
        for i in range(1, s.n + 1):
            if s.deprel[i] == "cop":
                found.extend(self._copula_triples(i))
            elif s.upos[i] == "VERB":
                found.extend(self._verb_triples(i))
        if additional:
            # Distinct args (as id tuples) from both sides; the reference
            # iterates a Python set — order only affects list order, and each
            # arg expands independently, so we sort for determinism.
            args = {tuple(l) for l, _, _ in found} | {tuple(r) for _, _, r in found}
            for arg in sorted(args):
                found.extend(self._nominal_triples(list(arg)))
        return [
            (l, rel, r)
            for l, rel, r in found
            if not self._is_stop_arg(l) and not self._is_stop_arg(r)
        ]

    # -- verb rule ---------------------------------------------------------

    def _verb_triples(self, verb: int) -> List[IdTriple]:
        s = self.s
        if any(s.deprel[c] == "xcomp" for c in s.children[verb]):
            return []  # the xcomp child's own rule covers the chain
        subjects = self._subjects_of(verb)
        right_args = self._verb_right_args(verb)
        out: List[IdTriple] = []
        # Pair order and shared mutable right-arg lists matter: the relation
        # builder steals the first case token out of the arg in place, so the
        # second subject sees the arg without it (reference mutation order).
        for subj in subjects:
            for arg in right_args:
                rel = self._relation_ids(verb, right_arg=arg)
                out.append((subj, rel, arg))
        return out

    def _subjects_of(self, word: int) -> List[List[int]]:
        s = self.s
        subj = [
            subtree_ids(s, c)
            for c in s.children[word]
            if s.deprel[c] in _SUBJECT_DEPRELS
        ]
        if not subj and s.deprel[word] in ("conj", "xcomp"):
            return self._subjects_of(s.head[word])
        return subj

    def _verb_right_args(self, word: int) -> List[List[int]]:
        s = self.s
        args = [
            subtree_ids(s, c)
            for c in s.children[word]
            if s.deprel[c] in _RIGHT_ARG_DEPRELS
        ]
        parent = s.head[word]
        if s.deprel[word] == "xcomp":
            args += self._verb_right_args(parent)
        if s.deprel[word] == "conj" and s.deprel[parent] == "xcomp":
            args += self._verb_right_args(s.head[parent])
        return args

    def _relation_ids(self, word: int, right_arg: Optional[List[int]] = None) -> List[int]:
        return (
            self._relation_prefix(word)
            + [word]
            + self._relation_postfix(word, right_arg=right_arg)
        )

    def _is_affix_child(self, c: int) -> bool:
        s = self.s
        return s.deprel[c] in _RELATION_AFFIX_DEPRELS or s.upos[c] == "PART"

    def _relation_prefix(self, word: int) -> List[int]:
        s = self.s
        prefix = [c for c in s.children[word] if self._is_affix_child(c) and c < word]
        parent = s.head[word]
        if s.deprel[word] == "xcomp":
            prefix = self._relation_ids(parent) + prefix
        if s.deprel[word] == "conj" and s.deprel[parent] == "xcomp":
            prefix = self._relation_ids(s.head[parent]) + prefix
        return prefix

    def _relation_postfix(self, word: int, right_arg: Optional[List[int]] = None) -> List[int]:
        s = self.s
        postfix = [c for c in s.children[word] if self._is_affix_child(c) and c > word]
        if right_arg:
            case_id = self._first_case(right_arg)
            if case_id is not None:
                postfix.append(case_id)
                right_arg.remove(case_id)  # deliberate shared-list mutation
        return postfix

    def _first_case(self, ids: List[int]) -> Optional[int]:
        s = self.s
        root = root_of(s, ids)
        for i in ids:
            if i < root and s.deprel[i] == "case":
                return i
        return None

    # -- copula rule -------------------------------------------------------

    def _copula_triples(self, cop: int) -> List[IdTriple]:
        s = self.s
        right_arg = self._copula_right_arg(cop)
        subjects = self._subjects_of(s.head[cop])
        relation = self._copula_run(cop)
        return [(subj, relation, right_arg) for subj in subjects]

    def _copula_right_arg(self, cop: int) -> List[int]:
        s = self.s
        parent = s.head[cop]
        ids = subtree_ids(s, parent)
        for run in self._all_copula_runs(parent):
            for i in run:
                ids.remove(i)
        for subj in self._subjects_of(parent):
            for i in subj:
                try:
                    ids.remove(i)
                except ValueError:
                    continue
        return ids

    def _copula_run(self, cop: int) -> List[int]:
        """The copula token plus the run of PART siblings immediately before
        it in child order (relations.py:323-334)."""
        s = self.s
        parts: List[int] = []
        for sib in s.children[s.head[cop]]:
            if sib == cop:
                return parts + [sib]
            if s.upos[sib] == "PART":
                parts.append(sib)
            else:
                parts = []
        return []

    def _all_copula_runs(self, word: int) -> List[List[int]]:
        s = self.s
        return [
            self._copula_run(c) for c in s.children[word] if s.deprel[c] == "cop"
        ]

    # -- additional nominal rules -------------------------------------------

    def _nominal_triples(self, ids: List[int]) -> List[IdTriple]:
        s = self.s
        out: List[IdTriple] = []
        main = ids
        root = root_of(s, ids)
        root_kids = [i for i in ids if i in s.children[root]]

        for c in root_kids:
            if s.deprel[c] in _IS_A_DEPRELS:
                sub = set(subtree_ids(s, c))
                desc = [i for i in ids if i in sub]
                out.append((ids, IS_A, desc))
                out.extend(self._nominal_triples(desc))
                main = [i for i in main if i not in desc]
        if len(ids) != len(main):  # an _is_a_ split happened
            out.append((ids, IS_A, main))
            out.extend(self._nominal_triples(main))
            return out

        before = len(main)
        for c in root_kids:
            if s.deprel[c] in _RELATES_TO_DEPRELS:
                sub = set(subtree_ids(s, c))
                desc = [i for i in ids if i in sub]
                out.append((ids, RELATES_TO, desc))
                out.extend(self._nominal_triples(desc))
                main = [i for i in main if i not in desc]
        if before != len(main):
            # Reference labels this residual link _is_a_ (relations.py:205),
            # not _relates_to_ — kept verbatim for parity.
            out.append((ids, IS_A, main))
            out.extend(self._nominal_triples(main))
        elif len(main) > 1:
            out.append((main, IS_A, [root]))
        return out

    # -- filters & stringification ------------------------------------------

    def _is_stop_arg(self, ids: List[int]) -> bool:
        s = self.s
        lemmas = {s.lemma[i] for i in ids}
        if lemmas.issubset(self.stop):
            return True
        return (
            len(ids) == 1
            and len(s.lemma[ids[0]]) == 1
            and s.lemma[ids[0]].isalpha()
        )

    def arg_string(self, ids: Sequence[int], lemmatized: bool) -> str:
        s = self.s
        src = s.lemma if lemmatized else s.form
        return clean_phrase(" ".join(src[i].strip() for i in ids))

    def rel_string(self, rel: RelSpec, lemmatized: bool) -> str:
        if isinstance(rel, str):
            return clean_phrase(rel)
        s = self.s
        src = s.lemma if lemmatized else s.form
        # note: relation tokens are NOT individually stripped (unlike args) —
        # matches the reference's two different join paths.
        return clean_phrase(" ".join(src[i] for i in rel))


def extract_triples(
    sent: Sent,
    stopwords: frozenset = frozenset(),
    additional_relations: bool = True,
) -> List[dict]:
    """Extract (subject, relation, object) triples from one parsed sentence.

    Returns a list of dicts with the surface/lemma forms, the right arg's
    root deprel, and the raw id lists (for downstream vectorization). The
    self-loop filter compares cleaned surface forms (relations.py:53-57).
    """
    ex = _Extractor(sent, stopwords)
    out: List[dict] = []
    for left_ids, rel, right_ids in ex.id_triples(additional_relations):
        left_arg = ex.arg_string(left_ids, lemmatized=False)
        right_arg = ex.arg_string(right_ids, lemmatized=False)
        if left_arg == right_arg:
            continue
        rroot = root_of(sent, right_ids)
        out.append(
            {
                "left_arg": left_arg,
                "left_arg_lemmas": ex.arg_string(left_ids, lemmatized=True),
                "relation": ex.rel_string(rel, lemmatized=False),
                "relation_lemmas": ex.rel_string(rel, lemmatized=True),
                "right_arg": right_arg,
                "right_arg_lemmas": ex.arg_string(right_ids, lemmatized=True),
                "right_deprel": sent.deprel[rroot] if rroot is not None else "",
                "left_ids": list(left_ids),
                "right_ids": list(right_ids),
                "relation_ids": list(rel) if isinstance(rel, list) else [],
            }
        )
    return out
