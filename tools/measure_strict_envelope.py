"""Strict-parity run against the derived merge envelope (VERDICT r5 item 6).

The r5 envelope (tools/make_merge_envelope.py → goldens/p500/
merge_envelope*.json) showed the BULK-round distributed merge lands inside
the reference's own order-variance node-count band with a key sym-diff of
45 vs the reference's internal spread of 28; the residual 17 was
ATTRIBUTED to the two documented semantic deltas (bulk-round candidate
application + parallel-edge plain-sum weights). This tool tests that
attribution: run the SAME p500 pipeline under ``strict_parity=True``
(which pins the reference's absorbed-node in-edge drop) and record both
modes' min-over-orders key distances side by side. If the attribution is
right, the strict run's distance drops toward the internal spread.

Usage: python tools/measure_strict_envelope.py [--out BENCH/strict_envelope.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run_mode(spark, pages, strict: bool):
    from pyspark.sql import functions as F

    from openie_spark.pipeline import PipelineConfig, run_pipeline

    cfg = PipelineConfig(
        skip_clustering=True,
        skip_merge=False,
        entities_limit=None,
        strict_parity=strict,
    )
    out = run_pipeline(
        spark, pages, cfg, input_fingerprint=f"envelope:strict={strict}"
    )
    nodes = out["nodes"]
    keys = {r["lemma_key"] for r in nodes.select("lemma_key").collect()}
    return {
        "n_nodes": nodes.count(),
        "n_edges": out["edges"].count(),
        "total_node_weight": nodes.agg(F.sum("weight")).first()[0],
        "keys": keys,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-pages", type=int, default=500)
    ap.add_argument("--out", default="BENCH/strict_envelope.json")
    args = ap.parse_args()

    from openie_spark.corpus import pages_df
    from openie_spark.session import build_session

    env = json.loads((REPO / "goldens/p500/merge_envelope.json").read_text())
    env_keys = {
        k: set(v)
        for k, v in json.loads(
            (REPO / "goldens/p500/merge_envelope_keys.json").read_text()
        ).items()
    }
    d_internal = env["max_pairwise_key_symdiff"]

    spark = build_session(app_name="strict-envelope")
    spark.sparkContext.setLogLevel("ERROR")
    pages = pages_df(spark, args.n_pages, seed=42, n_sents=6)

    result = {"internal_spread": d_internal, "envelope": {
        "node_count_min": env["node_count_min"],
        "node_count_max": env["node_count_max"],
    }}
    for mode, strict in (("bulk", False), ("strict", True)):
        r = run_mode(spark, pages, strict)
        dists = {
            name: len(r["keys"] ^ ks) for name, ks in env_keys.items()
        }
        result[mode] = {
            "n_nodes": r["n_nodes"],
            "n_edges": r["n_edges"],
            "total_node_weight": r["total_node_weight"],
            "min_key_symdiff": min(dists.values()),
            "per_order_symdiff": dists,
            "inside_node_band": bool(
                env["node_count_min"] <= r["n_nodes"] <= env["node_count_max"]
            ),
        }
        print(
            f"{mode}: nodes={r['n_nodes']} min_symdiff="
            f"{result[mode]['min_key_symdiff']} (internal spread {d_internal})",
            file=sys.stderr,
        )

    (REPO / args.out).write_text(json.dumps(result, indent=1))
    print(json.dumps({
        "bulk_min_symdiff": result["bulk"]["min_key_symdiff"],
        "strict_min_symdiff": result["strict"]["min_key_symdiff"],
        "internal_spread": d_internal,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
