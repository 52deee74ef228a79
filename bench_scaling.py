#!/usr/bin/env python
"""Two-parallelism scaling protocol (BASELINE.md): run the IDENTICAL KG job
on the IDENTICAL input at local[8] (N) and local[32] (4N), report
triples/sec at both and efficiency = (T32/T8) / 4.

Each parallelism level runs in its own subprocess (one SparkSession per
JVM); shuffle partitions scale with cores (2×). The measured section is the
extract-through-materialize span (clean → parse → extract → graph), JVM +
Python-worker warmup excluded, median of ``--runs`` runs.

Usage:  python bench_scaling.py [--pages 3000] [--runs 3] [--out BENCH/BASELINE.md]
Child:  python bench_scaling.py --child --cores N --pages P   (prints one JSON line)
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys
import time
from pathlib import Path


def child(cores: int, pages: int) -> None:
    from pyspark.sql import functions as F

    from openie_spark.corpus import STOPWORDS_FIXTURE, pages_df
    from openie_spark.extract import extract_triples_df, ok_triples
    from openie_spark.graph import aggregate_edges, aggregate_nodes, with_degrees
    from openie_spark.parse import parse_pages
    from openie_spark.session import build_session
    from openie_spark.textclean import clean_pages

    spark = build_session(
        app_name=f"openie-scaling-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    # warm Python workers
    import pandas as pd
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def _noop(x: pd.Series) -> pd.Series:
        return x

    spark.range(cores * 20, numPartitions=cores * 2).select(_noop("id")).write.format(
        "noop"
    ).mode("overwrite").save()

    pages = pages_df(spark, pages, seed=42, n_sents=6, partitions=cores * 2).cache()
    pages.count()

    t0 = time.monotonic()
    cleaned = clean_pages(pages, lang="ru")
    parses = parse_pages(cleaned)
    triples = ok_triples(
        extract_triples_df(parses, frozenset(STOPWORDS_FIXTURE), with_vectors=True)
    )
    triples = triples.localCheckpoint(eager=True)
    n_triples = triples.count()
    labeled = triples.withColumn("cluster", F.lit(0))
    with_degrees(
        aggregate_nodes(labeled, max_descriptions=256, dim=64),
        aggregate_edges(labeled, max_descriptions=256),
    ).write.format("noop").mode("overwrite").save()
    wall = time.monotonic() - t0

    print(
        json.dumps(
            {
                "cores": cores,
                "n_triples": n_triples,
                "wall_s": round(wall, 3),
                "triples_per_sec": round(n_triples / wall, 1),
            }
        )
    )
    spark.stop()


def run_child(cores: int, pages: int) -> dict:
    out = subprocess.run(
        [sys.executable, __file__, "--child", "--cores", str(cores), "--pages", str(pages)],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=str(Path(__file__).parent),
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--pages", type=int, default=3000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default="BENCH/BASELINE.md")
    args = ap.parse_args()

    if args.child:
        child(args.cores, args.pages)
        return

    results = {8: [], 32: []}
    for i in range(args.runs):
        for cores in (8, 32):
            r = run_child(cores, args.pages)
            results[cores].append(r)
            print(f"run {i} cores={cores}: {r}", file=sys.stderr)

    med = {
        c: statistics.median(r["triples_per_sec"] for r in results[c])
        for c in results
    }
    wall = {c: statistics.median(r["wall_s"] for r in results[c]) for c in results}
    eff = (med[32] / med[8]) / (32 / 8)
    n_triples = results[8][0]["n_triples"]

    report = f"""# BENCH/BASELINE — two-parallelism scaling evidence

Protocol (BASELINE.md sandbox protocol): identical KG job — clean → parse →
extract → node/edge aggregate + degrees — on the identical deterministic
input ({args.pages} pages, seed 42, {n_triples} triples), run at N=local[8]
and 4N=local[32], each in its own JVM, shuffle partitions = 2×cores, AQE
on, JVM + Python-worker warmup excluded, median of {args.runs} runs.

| parallelism | median wall (s) | triples/sec |
|---|---|---|
| local[8]  (N)  | {wall[8]:.2f} | {med[8]:.1f} |
| local[32] (4N) | {wall[32]:.2f} | {med[32]:.1f} |

**scaling efficiency = (T32/T8) / (32/8) = {eff:.3f}** — target ≥ 0.8:
{"PASS" if eff >= 0.8 else "FAIL"}

Raw runs:
```json
{json.dumps(results, indent=2)}
```
"""
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(report)
    print(json.dumps({"efficiency": round(eff, 3), "tps_8": med[8], "tps_32": med[32]}))


if __name__ == "__main__":
    main()
