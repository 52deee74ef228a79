"""Test-only oracle: execute the READ-ONLY reference implementation at
/root/reference to produce golden outputs.

No reference code is copied into this repo — we import the reference modules
in-process (with its unavailable heavy deps stubbed out, the same technique
SURVEY.md used) and run them on mock parse trees. Our engine must match the
behavior this oracle exhibits.

If /root/reference is absent (e.g. running the test suite elsewhere), tests
that need the live oracle are skipped; the checked-in golden fixtures in the
test files still run.
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

REFERENCE_DIR = Path("/root/reference")


def reference_available() -> bool:
    return (REFERENCE_DIR / "relations.py").is_file()


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        # a real-looking spec + version so other libraries (e.g. pyspark's
        # capability probes) that introspect the module don't choke on it
        import importlib.machinery

        mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
        mod.__version__ = "0.0.0"
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


_loaded = {}


def load_reference_relations():
    """Import the reference's relations.py with unavailable deps stubbed."""
    if "relations" in _loaded:
        return _loaded["relations"]
    if not reference_available():
        raise RuntimeError("reference not available")

    import numpy as np

    # gensim / sklearn / scipy / tqdm / ufal are not installed in this
    # sandbox; the extraction rules never touch them (vectors use a plain
    # dict lookup), so minimal stubs suffice.
    gensim = _stub("gensim")
    _stub("gensim.downloader", load=lambda *a, **k: {})
    gensim.downloader = sys.modules["gensim.downloader"]

    def _cosine(u, v):
        u = np.asarray(u, dtype=float)
        v = np.asarray(v, dtype=float)
        nu, nv = np.linalg.norm(u), np.linalg.norm(v)
        if nu == 0 or nv == 0:
            return 0.0  # matches scipy's uv==0 convention closely enough for gates
        return 1.0 - float(np.dot(u, v) / (nu * nv))

    scipy = _stub("scipy")
    spatial = _stub("scipy.spatial")
    dist_mod = _stub("scipy.spatial.distance", cosine=_cosine)
    spatial.distance = dist_mod
    scipy.spatial = spatial

    sklearn = _stub("sklearn")
    cluster_mod = _stub("sklearn.cluster", KMeans=object)
    metrics_mod = _stub("sklearn.metrics", silhouette_score=lambda *a, **k: 0.0)
    neighbors_mod = _stub("sklearn.neighbors", LocalOutlierFactor=object)
    sklearn.cluster = cluster_mod
    sklearn.metrics = metrics_mod
    sklearn.neighbors = neighbors_mod

    _stub("tqdm", tqdm=lambda x, *a, **k: x)
    _stub("udpipe_model", UDPipeModel=object)

    sys.path.insert(0, str(REFERENCE_DIR))
    try:
        import importlib

        relations = importlib.import_module("relations")
    finally:
        sys.path.remove(str(REFERENCE_DIR))
    _loaded["relations"] = relations
    return relations


def load_reference_syntax():
    """Import the reference's syntax.py (clean_text oracle)."""
    if "syntax" in _loaded:
        return _loaded["syntax"]
    if not reference_available():
        raise RuntimeError("reference not available")
    _stub("udpipe_model", UDPipeModel=object)
    sys.path.insert(0, str(REFERENCE_DIR))
    try:
        import importlib

        syntax = importlib.import_module("syntax")
    finally:
        sys.path.remove(str(REFERENCE_DIR))
    _loaded["syntax"] = syntax
    return syntax


class MockWord:
    """Duck-typed ufal.udpipe Word for the reference rules."""

    def __init__(self, id_, form, lemma, upostag, head, deprel):
        self.id = id_
        self.form = form
        self.lemma = lemma
        self.upostag = upostag
        self.head = head
        self.deprel = deprel
        self.children = []


class MockSentence:
    """Duck-typed ufal.udpipe Sentence: words[0] is the artificial root."""

    def __init__(self, tokens, text=None):
        # tokens: list of (form, lemma, upostag, head, deprel), 1-indexed ids
        self.words = [MockWord(0, "<root>", "", "", -1, "")]
        for i, (form, lemma, upostag, head, deprel) in enumerate(tokens, start=1):
            self.words.append(MockWord(i, form, lemma, upostag, head, deprel))
        for w in self.words[1:]:
            if 0 <= w.head < len(self.words):
                self.words[w.head].children.append(w.id)
        self._text = text if text is not None else " ".join(
            w.form for w in self.words[1:]
        )

    def getText(self):
        return self._text


def reference_triples(tokens, stopwords=(), additional=True, text=None):
    """Run the reference's SentenceReltuples; return the triple list as
    (left_arg, relation, right_arg, right_deprel, left_lemmas, rel_lemmas,
    right_lemmas) tuples."""
    relations = load_reference_relations()
    sent = MockSentence(tokens, text=text)
    sr = relations.SentenceReltuples(
        sent, {}, additional_relations=additional, stopwords=list(stopwords)
    )
    return [
        (
            t.left_arg,
            t.relation,
            t.right_arg,
            t.right_deprel,
            t.left_arg_lemmas,
            t.relation_lemmas,
            t.right_arg_lemmas,
        )
        for t in sr._reltuples
    ]


class _FakeSent:
    def __init__(self, text):
        self._t = text

    def getText(self):
        return self._t


class _FakeSentenceReltuples:
    """Duck-typed SentenceReltuples: iterable of Reltuple + .sentence."""

    def __init__(self, sent_text, reltuples):
        self.sentence = _FakeSent(sent_text)
        self._r = list(reltuples)

    def __iter__(self):
        return iter(self._r)


def make_reltuple(left, relation, right, right_deprel="obj",
                  left_vec=None, right_vec=None, dim=8):
    """Build a reference Reltuple; lemmas default to the surface forms."""
    import numpy as np

    relations = load_reference_relations()
    z = np.zeros(dim)
    return relations.Reltuple(
        left, left, np.asarray(left_vec) if left_vec is not None else z,
        relation, relation,
        right, right,
        right_deprel,
        np.asarray(right_vec) if right_vec is not None else z,
    )


def build_reference_graph(sentences):
    """sentences: list of (sent_text, cluster, [Reltuple,...]) → RelGraph
    after add_sentence_reltuples for each sentence."""
    relations = load_reference_relations()
    g = relations.RelGraph()
    for sent_text, cluster, tuples in sentences:
        g.add_sentence_reltuples(
            _FakeSentenceReltuples(sent_text, tuples), cluster=cluster
        )
    return g


def graph_snapshot(g):
    """RelGraph → (nodes dict, edges dict) with " | " sets exploded, for
    comparison against our DataFrame tables."""
    nx_g = g._graph
    nodes = {}
    for n, a in nx_g.nodes(data=True):
        nodes[n] = {
            "label_parts": a["label"].split(" | ") if a.get("label") else [],
            "weight": a["weight"],
            "descriptions": set(a["description"].split(" | ")),
            "clusters": {int(x) for x in a["feat_type"].split(" | ")},
        }
    edges = {}
    for s, t, k, a in nx_g.edges(keys=True, data=True):
        edges[(s, t, k)] = {
            "label_parts": set(a["label"].split(" | ")),
            "weight": a["weight"],
            "descriptions": set(a["description"].split(" | ")),
            "clusters": {int(x) for x in a["feat_type"].split(" | ")},
        }
    return nodes, edges
