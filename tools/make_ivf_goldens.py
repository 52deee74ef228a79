"""Golden expected output for the ANN-IVF driver oracle.

Pure-numpy second implementation of similarity.ivf_topk's declared
construction on the 5-blob clustering fixture (corpus.
clustering_fixture_rows, vec_id = row index, vectors cast to float32
exactly as Spark's array<float> column stores them): Lloyd's coarse
quantizer (the blob partition is the unique optimum, so Spark ML's seeded
k-means|| must find the same cells), probe = vec 0's vector, the n_probe=2
nearest cells by centroid L2, exact cosine top-k=20 over their members
(ties broken by vec_id asc — the operator's ordering). Output golden:
goldens/ivf/expected_topk.parquet (vec_id, cosine_e4).

Usage: python tools/make_ivf_goldens.py
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
from tools.make_clustering_goldens import lloyds  # noqa: E402

N_CELLS = 5
N_PROBE = 2
K = 20
# batch oracle probes: one member of each blob (fixture = 5 blobs × 60)
BATCH_PROBE_IDS = [0, 75, 150, 225, 290]


def main() -> None:
    rows = clustering_fixture_rows()
    X = np.array([r[2] for r in rows], dtype=np.float32).astype(np.float64)
    n = len(X)

    labels = lloyds(X, N_CELLS)
    centers = np.array([X[labels == j].mean(axis=0) for j in range(N_CELLS)])
    probe = X[0]
    d = ((centers - probe) ** 2).sum(axis=1)
    cells = set(np.argsort(d)[:N_PROBE].tolist())
    cand = [i for i in range(n) if labels[i] in cells]

    def cosine(u, v):
        nu, nv = np.linalg.norm(u), np.linalg.norm(v)
        if nu == 0 or nv == 0:
            return 0.0
        return float(np.dot(u, v) / (nu * nv))

    scored = sorted(
        ((cosine(X[i], probe), i) for i in cand), key=lambda t: (-t[0], t[1])
    )[:K]
    out_rows = [
        {"vec_id": i, "cosine_e4": int(round(c * 1e4))} for c, i in scored
    ]
    out_dir = REPO / "goldens" / "ivf"
    out_dir.mkdir(parents=True, exist_ok=True)
    path = out_dir / "expected_topk.parquet"
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r["vec_id"] for r in out_rows], pa.int64()),
                "cosine_e4": pa.array([r["cosine_e4"] for r in out_rows], pa.int64()),
            }
        ),
        path,
    )
    print(f"{path} rows={len(out_rows)} digest={golden_digest(out_rows)}")

    # batch-query golden: the same construction for one probe per blob
    batch_rows = []
    for pid in BATCH_PROBE_IDS:
        probe = X[pid]
        d = ((centers - probe) ** 2).sum(axis=1)
        cells = set(np.argsort(d)[:N_PROBE].tolist())
        cand = [i for i in range(n) if labels[i] in cells]
        scored = sorted(
            ((cosine(X[i], probe), i) for i in cand), key=lambda t: (-t[0], t[1])
        )[:K]
        batch_rows += [
            {"probe_id": pid, "vec_id": i, "cosine_e4": int(round(c * 1e4))}
            for c, i in scored
        ]
    bpath = out_dir / "expected_batch_topk.parquet"
    pq.write_table(
        pa.table(
            {
                "probe_id": pa.array([r["probe_id"] for r in batch_rows], pa.int64()),
                "vec_id": pa.array([r["vec_id"] for r in batch_rows], pa.int64()),
                "cosine_e4": pa.array(
                    [r["cosine_e4"] for r in batch_rows], pa.int64()
                ),
            }
        ),
        bpath,
    )
    print(f"{bpath} rows={len(batch_rows)} digest={golden_digest(batch_rows)}")


if __name__ == "__main__":
    main()
