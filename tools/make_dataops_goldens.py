"""Generate cross-implementation goldens for the non-SQL-expressible hash
families used by the approximate dedup/ANN operators, so their driver
queries get full value-hash oracles instead of rows-only checks.

INDEPENDENCE SCOPE (be precise about what these catch): this tool imports
NOTHING from openie_spark or pyspark — each hash family is re-implemented
here (pure Python / numpy) from the construction the operator declares.
That makes the goldens a second implementation of the SAME SPEC: they
catch any Spark-path bug (plumbing, codegen, Arrow transfer, banding,
join, partitioning), but a formula-level misreading shared by both
implementations would pass. Where feasible the second implementation is
genuinely structurally different (SimHash token hashes come from a pure-
Python XXH64 written from the public spec, tools/pure_xxh64.py, vs Spark's
JVM codegen XXH64); the ANN plane construction is definitionally the same
``RandomState(seed).randn`` recipe, so for ann_* the check is
Spark-plumbing-only.

- simhash_sigs.parquet   (doc_id, simhash int64): Charikar SimHash,
  XXH64(utf8(token), seed=42) token hashes over lowercase tokens split on
  Java-\\s runs — exactly the family dedup.simhash_df declares. The oracle
  SQL recomputes all-pairs hamming with DuckDB xor+bit_count on these
  signatures; the Spark operator's banding is pigeonhole-exact
  (n_bands = max_hamming+1), so its output must equal the golden-derived
  pair set exactly.
- ann_buckets.parquet    (vec_id, bucket int64): random-hyperplane sign
  buckets, planes = np.random.RandomState(seed).randn(dim, n_planes) —
  the published construction lsh_topk declares.
- ann_probe_buckets.parquet (bucket int64): the multiprobe bucket list
  (≤2 bit flips) for the probe vector vec_id=0, same construction.

Run: python tools/make_dataops_goldens.py [sf_dir]
sf_dir defaults to /root/testdata/sf0.01 — the DRIVER'S correctness scale
factor (goldens/dataops_sf01 is named for it). Re-run only when the
testdata corpus or a declared hash family changes; tests/test_entry.py
pins the printed digests (same scheme — tools/golden_digest.py) so silent
regeneration is loud.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.golden_digest import golden_digest  # noqa: E402
from tools.pure_xxh64 import xxh64  # noqa: E402

# Java regex \s = [ \t\n\x0B\f\r] — NOT Python's unicode-aware \s
_JAVA_WS = re.compile("[ \t\n\x0b\f\r]+")


def simhash64(text: str) -> int:
    """Charikar SimHash, 64-bit, XXH64-seed-42 token hashes (signed int64).

    Token spec mirrors what dedup.simhash_df declares: lowercase, split on
    Java-\\s whitespace runs, empty tokens dropped, empty docs -> 0."""
    toks = [t for t in _JAVA_WS.split((text or "").lower()) if t]
    if not toks:
        return 0
    votes = [0] * 64
    for tok in toks:
        h = xxh64(tok.encode("utf-8")) & ((1 << 64) - 1)
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


def main() -> None:
    import duckdb

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = REPO / "goldens" / "dataops_sf01"
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

    (out_dir / "README.md").write_text(
        f"Generated by tools/make_dataops_goldens.py from sf_dir={sf_dir}\n"
        "(the driver's correctness scale factor). Digests below use\n"
        "tools/golden_digest.py — the same scheme tests/test_entry.py pins.\n\n"
        + "\n".join(
            f"- {name}.parquet rows={t.num_rows} digest={golden_digest(t.to_pylist())}"
            for name, t in (
                ("simhash_sigs", sig_table),
                ("ann_buckets", bucket_table),
                ("ann_probe_buckets", probe_table),
            )
        )
        + "\n"
    )
    for name, t in (
        ("simhash_sigs", sig_table),
        ("ann_buckets", bucket_table),
        ("ann_probe_buckets", probe_table),
    ):
        print(f"{name}: rows={t.num_rows} digest={golden_digest(t.to_pylist())}")


if __name__ == "__main__":
    main()
