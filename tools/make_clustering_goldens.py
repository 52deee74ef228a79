"""Generate the golden assignment for the M2 clustering driver oracle.

A pure-numpy second implementation of the KMeans sweep the operator
declares (openie_spark/clustering.py, mirroring the reference's sweep at
/root/reference/relations.py:1005-1029): for cluster_size in
range(50, 100, 10), k = n // cluster_size (skip k < 2), Lloyd's to
convergence from a deterministic k-means++-style init, keep the labeling
with the best squared-euclidean silhouette (>= : later sweep step wins
ties). Imports nothing from pyspark; the fixture vectors come from the
same pure function both sides use (openie_spark.corpus.
clustering_fixture_rows). Output is canonicalized to (url, cluster_rep)
where cluster_rep is the min url in the point's cluster — cluster-id
permutation invariant.

On the extreme-separation fixture the optimal partition is unique, so
Spark ML's seeded k-means|| and this Lloyd's must agree exactly; a Spark
sweep-wiring bug (wrong k, wrong tie rule, wrong join-back) diverges.

Usage: python tools/make_clustering_goldens.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from openie_spark.corpus import clustering_fixture_rows  # noqa: E402
from tools.golden_digest import golden_digest  # noqa: E402


def lloyds(X: np.ndarray, k: int, seed: int = 0, iters: int = 300) -> np.ndarray:
    rng = np.random.RandomState(seed)
    # k-means++-style init (full D² weighting)
    centers = [X[rng.randint(len(X))]]
    for _ in range(k - 1):
        d2 = np.min(
            ((X[:, None, :] - np.asarray(centers)[None, :, :]) ** 2).sum(-1), axis=1
        )
        centers.append(X[rng.choice(len(X), p=d2 / d2.sum())])
    C = np.asarray(centers)
    labels = np.zeros(len(X), dtype=int)
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        new_labels = d2.argmin(axis=1)
        if (new_labels == labels).all() and _ > 0:
            break
        labels = new_labels
        for j in range(k):
            if (labels == j).any():
                C[j] = X[labels == j].mean(axis=0)
    return labels


def silhouette_sq(X: np.ndarray, labels: np.ndarray) -> float:
    """Mean silhouette with SQUARED euclidean distance (the metric Spark's
    ClusteringEvaluator uses by default)."""
    uniq = np.unique(labels)
    if len(uniq) < 2:
        return -1.0
    d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    s = np.zeros(len(X))
    for i in range(len(X)):
        own = labels == labels[i]
        n_own = own.sum()
        a = d2[i][own].sum() / max(n_own - 1, 1) if n_own > 1 else 0.0
        b = min(
            d2[i][labels == c].mean() for c in uniq if c != labels[i]
        )
        s[i] = 0.0 if max(a, b) == 0 else (b - a) / max(a, b)
    return float(s.mean())


def main() -> None:
    rows = clustering_fixture_rows()
    urls = [r[0] for r in rows]
    X = np.array([r[2] for r in rows], dtype=np.float64)
    n = len(X)

    best_labels, best_score, best_k = None, -1.0, None
    for cluster_size in range(50, 100, 10):
        k = n // cluster_size
        if k < 2:
            continue
        labels = lloyds(X, k)
        score = silhouette_sq(X, labels)
        print(f"size={cluster_size} k={k} silhouette={score:.4f}", file=sys.stderr)
        if score >= best_score:
            best_score, best_labels, best_k = score, labels, k

    print(f"selected k={best_k} score={best_score:.4f}", file=sys.stderr)
    reps: dict = {}
    for u, l in zip(urls, best_labels):
        reps[l] = min(reps.get(l, u), u)
    out_rows = [
        {"url": u, "cluster_rep": reps[l]} for u, l in zip(urls, best_labels)
    ]
    out_dir = REPO / "goldens" / "clustering"
    out_dir.mkdir(parents=True, exist_ok=True)
    path = out_dir / "assignments.parquet"
    pq.write_table(
        pa.table(
            {
                "url": pa.array([r["url"] for r in out_rows]),
                "cluster_rep": pa.array([r["cluster_rep"] for r in out_rows]),
            }
        ),
        path,
    )
    print(f"{path} rows={len(out_rows)} digest={golden_digest(out_rows)}")


if __name__ == "__main__":
    main()
