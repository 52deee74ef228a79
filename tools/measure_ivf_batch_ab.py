"""IVF corpus-vs-corpus A/B (VERDICT r6 item 5): ivf_query_batch's
``broadcast_probes`` knob has a plan test but no measured datapoint. This
measures the broadcast-exploded-probes plan vs the shuffle-both-sides
plan when the probe table is CORPUS-SIZED (the neighbor-search-everything
shape), plus a query-sized probe leg as the contrast, so SCALE.md can
state crossover guidance from data instead of reasoning.

Protocol: one deterministic corpus (seeded per-id hash vectors, dim 64),
one index build shared by all legs, interleaved A/B order per rep
(broadcast first then shuffle, then reversed), row-count equality
asserted between legs every rep (same candidates either way — the knob
only changes the physical join), min-of-reps per leg reported.

Usage: python tools/measure_ivf_batch_ab.py [--n 200000] [--cells 64]
       [--reps 2] [--out BENCH/ivf_batch_ab.json]
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--cells", type=int, default=64)
    ap.add_argument("--n-probe", type=int, default=3)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--query-probes", type=int, default=256)
    ap.add_argument("--out", default=str(REPO / "BENCH" / "ivf_batch_ab.json"))
    args = ap.parse_args()

    import sys

    sys.path.insert(0, str(REPO))
    from pyspark.sql import functions as F

    from openie_spark.dataops.similarity import build_ivf_index, ivf_query_batch
    from openie_spark.session import build_session

    spark = build_session(app_name="ivf-batch-ab")
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic synthetic corpus: dim seeded JVM-side hash lanes per id
    # (no driver data, no numpy broadcast) — clustered enough for KMeans to
    # split into balanced cells, fully reproducible
    lanes = F.array(
        *[
            (
                (F.xxhash64(F.col("vec_id"), F.lit(j)) % 1000) / 1000.0
                + F.when(F.col("vec_id") % args.cells == j % args.cells, 2.0)
                .otherwise(0.0)
            ).cast("double")
            for j in range(args.dim)
        ]
    )
    corpus = (
        spark.range(args.n)
        .select(F.col("id").alias("vec_id"), lanes.alias("embedding"))
        .cache()
    )
    corpus.count()

    index = build_ivf_index(corpus, n_cells=args.cells, seed=42)
    index.assigned.count()  # materialize the cache outside timings

    def leg(probe_df, broadcast: bool) -> tuple[float, int]:
        t0 = time.monotonic()
        out = ivf_query_batch(
            index,
            probe_df,
            k=args.k,
            n_probe=args.n_probe,
            probe_id_col="vec_id",
            broadcast_probes=broadcast,
        )
        n = out.count()
        return time.monotonic() - t0, n

    corpus_probes = corpus  # corpus-vs-corpus: every vector is a probe
    query_probes = corpus.filter(
        F.col("vec_id") < args.query_probes
    ).cache()
    query_probes.count()

    results: dict = {
        "n_corpus": args.n,
        "dim": args.dim,
        "n_cells": args.cells,
        "n_probe": args.n_probe,
        "k": args.k,
        "reps": args.reps,
        "legs": {},
    }
    for name, probes in (
        ("corpus_probes", corpus_probes),
        (f"query_probes_{args.query_probes}", query_probes),
    ):
        walls = {"broadcast": [], "shuffle": []}
        counts = set()
        for rep in range(args.reps):
            order = (
                [("broadcast", True), ("shuffle", False)]
                if rep % 2 == 0
                else [("shuffle", False), ("broadcast", True)]
            )
            for lname, flag in order:
                w, n = leg(probes, flag)
                walls[lname].append(round(w, 2))
                counts.add(n)
                print(f"{name} {lname} rep{rep}: {w:.2f}s rows={n}", flush=True)
        assert len(counts) == 1, f"legs disagree on rows: {counts}"
        results["legs"][name] = {
            "broadcast_walls_s": walls["broadcast"],
            "shuffle_walls_s": walls["shuffle"],
            "broadcast_best_s": min(walls["broadcast"]),
            "shuffle_best_s": min(walls["shuffle"]),
            "rows": counts.pop(),
        }

    Path(args.out).write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
