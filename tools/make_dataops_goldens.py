"""Generate cross-implementation goldens for the non-SQL-expressible hash
families used by the approximate dedup/ANN operators, so their driver
queries get full value-hash oracles instead of rows-only checks.

INDEPENDENCE: this tool imports NOTHING from openie_spark — each hash
family is re-implemented here from its public definition (pure Python /
numpy), so the goldens are a genuine second implementation, not a dump of
the Spark path's own output:

- simhash_sigs.parquet   (doc_id, simhash int64): per-token blake2b-64
  bit-vote SimHash over lowercase whitespace tokens — the standard
  Charikar construction. The oracle SQL recomputes all-pairs hamming with
  DuckDB xor+bit_count on these signatures; the Spark operator's banding
  is pigeonhole-exact (n_bands = max_hamming+1), so its output must equal
  the golden-derived pair set exactly.
- ann_buckets.parquet    (vec_id, bucket int64): random-hyperplane sign
  buckets, planes = np.random.RandomState(seed).randn(dim, n_planes) —
  the published construction lsh_topk declares.
- ann_probe_buckets.parquet (bucket int64): the multiprobe bucket list
  (≤2 bit flips) for the probe vector vec_id=0, same construction.

Run: python tools/make_dataops_goldens.py [sf_dir]
Re-run only when the testdata corpus changes; tests/test_entry.py pins the
printed digests so silent regeneration is loud.
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent


def simhash64(text: str) -> int:
    """Charikar SimHash, 64-bit, blake2b-8 token hashes (signed int64)."""
    toks = (text or "").lower().split()
    if not toks:
        return 0
    votes = [0] * 64
    for tok in toks:
        h = int.from_bytes(
            hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big"
        )
        for i in range(64):
            votes[i] += 1 if (h >> i) & 1 else -1
    sig = 0
    for i in range(64):
        if votes[i] > 0:
            sig |= 1 << i
    return sig - (1 << 64) if sig >= (1 << 63) else sig


def hyperplane_bucket(vecs: np.ndarray, dim: int, n_planes: int, seed: int) -> np.ndarray:
    planes = np.random.RandomState(seed).randn(dim, n_planes).astype(np.float64)
    signs = (vecs @ planes) > 0
    powers = 1 << np.arange(n_planes, dtype=np.int64)
    return (signs @ powers).astype(np.int64)


def multiprobe(bucket: int, n_planes: int, bits: int) -> list[int]:
    probes = [bucket]
    if bits >= 1:
        probes += [bucket ^ (1 << i) for i in range(n_planes)]
    if bits >= 2:
        probes += [
            bucket ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    return sorted(set(probes))


def digest(table: pa.Table) -> str:
    h = hashlib.sha256()
    for line in sorted(repr(r) for r in table.to_pylist()):
        h.update(line.encode())
        h.update(b"\x00")
    return h.hexdigest()[:16]


def main() -> None:
    import duckdb

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = REPO / "goldens" / "dataops_sf001"
    out_dir.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()

    docs = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    sig_table = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "simhash": pa.array([simhash64(t) for _, t in docs], pa.int64()),
        }
    )
    pq.write_table(sig_table, out_dir / "simhash_sigs.parquet")

    emb = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in emb], dtype=np.int64)
    vecs = np.array([np.asarray(r[1], dtype=np.float64) for r in emb])
    n_planes, seed, probe_id, probe_bits = 12, 42, 0, 2
    buckets = hyperplane_bucket(vecs, vecs.shape[1], n_planes, seed)
    bucket_table = pa.table(
        {"vec_id": pa.array(ids), "bucket": pa.array(buckets)}
    )
    pq.write_table(bucket_table, out_dir / "ann_buckets.parquet")

    probe_vec = vecs[ids == probe_id][0]
    probe_bucket = int(
        hyperplane_bucket(probe_vec[None, :], vecs.shape[1], n_planes, seed)[0]
    )
    probes = multiprobe(probe_bucket, n_planes, probe_bits)
    probe_table = pa.table({"bucket": pa.array(probes, pa.int64())})
    pq.write_table(probe_table, out_dir / "ann_probe_buckets.parquet")

    for name, t in (
        ("simhash_sigs", sig_table),
        ("ann_buckets", bucket_table),
        ("ann_probe_buckets", probe_table),
    ):
        print(f"{name}: rows={t.num_rows} digest={digest(t)}")


if __name__ == "__main__":
    main()
