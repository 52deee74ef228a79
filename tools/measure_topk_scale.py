"""Measure find_nodes_to_keep + bypass_and_drop at realistic scale
(VERDICT r2 item 7): a synthetic ≥1M-node graph with entities_limit=10^4.

The claim under test: the swap refinement collects a driver slice bounded
by entities_limit·3 (30k rows — fine by design), and the bypass rounds are
distributed joins converging in ~O(log |removed|) hash-minima batches.
This records actual wall + rounds; results go to SCALE.md §8.

Graph shape: Zipf-ish node weights (heavy head like real entity mentions),
edges between random nodes biased toward the head (hot predicates), ~15%
structural (_is_a_/_relates_to_) labels so the swap loop does real work.

Run: python tools/measure_topk_scale.py [n_nodes] [n_edges]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 3_000_000
    entities_limit = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000

    from pyspark.sql import functions as F

    from openie_spark.session import build_session
    from openie_spark.topk import bypass_and_drop, find_nodes_to_keep

    spark = build_session(app_name="topk-scale")
    spark.sparkContext.setLogLevel("ERROR")

    # Zipf-ish weights: weight = max(1, n_nodes/(rank+1))^0.7-ish via pow
    nodes = (
        spark.range(n_nodes)
        .select(
            F.concat(F.lit("n"), F.col("id")).alias("lemma_key"),
            (
                F.pow(F.lit(float(n_nodes)) / (F.col("id") + 1.0), F.lit(0.7))
                .cast("long")
                + 1
            ).alias("weight"),
        )
        .repartition(64)
        .localCheckpoint(eager=True)
    )
    # head-biased endpoints: square a uniform to bias toward low ids
    labels = F.array(
        F.lit("_is_a_"), F.lit("_relates_to_"),
        *[F.lit(f"rel{i}") for i in range(12)],
    )
    edges = (
        spark.range(n_edges)
        .select(
            F.concat(
                F.lit("n"),
                (F.pow(F.rand(1), 2.0) * n_nodes).cast("long"),
            ).alias("src"),
            F.concat(
                F.lit("n"),
                (F.pow(F.rand(2), 2.0) * n_nodes).cast("long"),
            ).alias("dst"),
            F.element_at(labels, (F.rand(3) * 14).cast("int") + 1).alias("label"),
        )
        .filter(F.col("src") != F.col("dst"))
        .withColumn("edge_key", F.concat(F.col("label"), F.lit(" + obj")))
        .withColumn("weight", F.lit(1).cast("long"))
        .withColumn("lemmas", F.col("label"))
        .withColumn("deprel", F.lit("obj"))
        .withColumn("descriptions", F.array().cast("array<string>"))
        .withColumn("clusters", F.array().cast("array<int>"))
        .repartition(64)
        .localCheckpoint(eager=True)
    )
    n_e = edges.count()

    print(f"graph built: {n_nodes} nodes, {n_e} edges", file=sys.stderr)
    t0 = time.monotonic()
    keep = find_nodes_to_keep(nodes, edges, entities_limit)
    t_keep = time.monotonic() - t0
    print(f"find_nodes_to_keep: {t_keep:.1f}s, |keep|={len(keep)}", file=sys.stderr)

    stats: dict = {}
    t0 = time.monotonic()
    f_nodes, f_edges = bypass_and_drop(nodes, edges, keep, stats=stats)
    n_kept_edges = f_edges.count()
    n_kept_nodes = f_nodes.count()
    t_bypass = time.monotonic() - t0
    print(f"bypass: {t_bypass:.1f}s rounds={stats['rounds']}", file=sys.stderr)

    out = {
        "n_nodes": n_nodes,
        "n_edges": n_e,
        "entities_limit": entities_limit,
        "keep_size": len(keep),
        "find_nodes_to_keep_s": round(t_keep, 1),
        "bypass_rounds": stats["rounds"],
        "bypass_truncated": stats["truncated"],
        "bypass_s": round(t_bypass, 1),
        "kept_nodes": n_kept_nodes,
        "kept_edges": n_kept_edges,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
