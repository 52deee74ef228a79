"""Embedding provider seam + phrase-vector math.

The reference looks up ``"{lemma}_{UPOS}"`` keys in an in-RAM ~1.5 GB gensim
word2vec model and averages hits (zeros on total miss)
(/root/reference/relations.py:1032-1053). Our seam is a broadcast dict of
``key → float32[dim]`` — at cluster scale the vocabulary is pruned to the
corpus lemma set (a small fraction of the full model) and broadcast once per
executor, which is exactly the broadcast-dictionary-join shape the north
star names; the alternative explode-lemmas ⋈ embeddings-table join would
shuffle every token row and is strictly worse here.

The sandbox provider is deterministic-seeded (FIXTURES.md §4): vector(key) =
RandomState(stable_hash(key)).rand(dim), with optional planted families so
cosine-gate tests can construct near (<0.3) and far (>0.3) pairs on demand.
"""

from __future__ import annotations

import hashlib
from typing import Dict, Iterable, Optional

import numpy as np

DEFAULT_DIM = 64  # reference uses 300; dim is a config knob, math is dim-free


def _stable_hash(key: str) -> int:
    return int.from_bytes(hashlib.sha256(key.encode()).digest()[:4], "big")


def seeded_vector(key: str, dim: int = DEFAULT_DIM) -> np.ndarray:
    rs = np.random.RandomState(_stable_hash(key) % (2**31))
    return rs.rand(dim).astype(np.float32)


class EmbeddingProvider:
    """Deterministic embedding dict with planted similarity families.

    ``families`` maps a family name → list of keys; all keys in a family get
    the family base vector plus tiny noise (pairwise cosine ≪ 0.3), while
    unrelated keys stay effectively orthogonal-ish random (cosine of two
    uniform-random positive vectors is high! — so family planting uses
    *signed* vectors to keep non-family cosines > 0.3).
    """

    def __init__(
        self,
        dim: int = DEFAULT_DIM,
        families: Optional[Dict[str, Iterable[str]]] = None,
        vocabulary: Optional[Iterable[str]] = None,
    ):
        self.dim = dim
        self._vectors: Dict[str, np.ndarray] = {}
        for fam, keys in (families or {}).items():
            rs = np.random.RandomState(_stable_hash("family:" + fam) % (2**31))
            base = rs.randn(dim).astype(np.float32)
            base /= np.linalg.norm(base)
            for i, key in enumerate(keys):
                noise_rs = np.random.RandomState(_stable_hash(f"{fam}:{key}") % (2**31))
                noise = noise_rs.randn(dim).astype(np.float32) * 0.05
                self._vectors[key] = base + noise
        for key in vocabulary or ():
            if key not in self._vectors:
                rs = np.random.RandomState(_stable_hash("solo:" + key) % (2**31))
                v = rs.randn(dim).astype(np.float32)
                self._vectors[key] = v / np.linalg.norm(v)

    def __contains__(self, key: str) -> bool:
        return key in self._vectors

    def get(self, key: str) -> Optional[np.ndarray]:
        return self._vectors.get(key)

    def as_dict(self) -> Dict[str, np.ndarray]:
        return dict(self._vectors)


def phrase_vector(
    lemmas: Iterable[str],
    upos: Iterable[str],
    vectors: Dict[str, np.ndarray],
    dim: int,
) -> np.ndarray:
    """Mean of found ``{lemma}_{UPOS}`` vectors; zeros if none found —
    matches the reference's accumulate-and-divide (relations.py:1032-1053)."""
    acc = np.zeros(dim, dtype=np.float64)
    count = 0
    for lemma, pos in zip(lemmas, upos):
        v = vectors.get(f"{lemma}_{pos}")
        if v is not None:
            acc += v
            count += 1
    if count:
        acc /= count
    return acc.astype(np.float32)


def cosine_distance(u: np.ndarray, v: np.ndarray) -> float:
    """1 - cos(u, v); 0-vector operands → distance 0 (merge gates treat
    missing vectors as identical, matching how scipy's NaN would *not* be
    > threshold in the reference's comparison)."""
    nu = float(np.linalg.norm(u))
    nv = float(np.linalg.norm(v))
    if nu == 0.0 or nv == 0.0:
        return 0.0
    return 1.0 - float(np.dot(u, v)) / (nu * nv)
