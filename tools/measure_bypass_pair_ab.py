"""Bypass round-pairing A/B (VERDICT r6 item 7): measure the effect of
chaining ROUNDS_PER_CKPT bypass rounds lazily per localCheckpoint (one
job barrier per pair instead of per round; inner shuffles deduped by
ReuseExchange) against the one-barrier-per-round baseline, on the same
1M-node / 3M-edge synthetic graph measure_topk_scale.py uses.

Protocol (the repo's established A/B discipline): taskset-pinned 16
cores, interleaved leg order per rep, child-tree jiffies via
RUSAGE_CHILDREN so CPU inflation is measured, correctness gated by
identical (kept_nodes, kept_edges, truncated) across legs every rep.

Usage: python tools/measure_bypass_pair_ab.py [--reps 2] [--nodes 1000000]
       [--edges 3000000] [--out BENCH/bypass_pair_ab.json]
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
CPUSET_16 = "0,2,4,6,8,10,12,14,16,18,20,22,24,26,28,30"


def run_leg(pair: int, n_nodes: int, n_edges: int) -> dict:
    cmd = [
        "taskset", "-c", CPUSET_16,
        sys.executable, str(REPO / "tools" / "measure_topk_scale.py"),
        str(n_nodes), str(n_edges),
    ]
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS="16",
        OPENIE_BYPASS_ROUNDS_PER_CKPT=str(pair),
    )
    ru0 = resource.getrusage(resource.RUSAGE_CHILDREN)
    t0 = time.monotonic()
    proc = subprocess.run(
        cmd, capture_output=True, text=True, cwd=str(REPO), env=env
    )
    wall = time.monotonic() - t0
    ru1 = resource.getrusage(resource.RUSAGE_CHILDREN)
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else "{}"
    try:
        out = json.loads(line)
    except json.JSONDecodeError:
        out = {"error": (proc.stderr or line)[-400:]}
    out["rounds_per_ckpt"] = pair
    out["leg_wall_s"] = round(wall, 1)
    out["cpu_s"] = round(
        (ru1.ru_utime - ru0.ru_utime) + (ru1.ru_stime - ru0.ru_stime), 1
    )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--edges", type=int, default=3_000_000)
    ap.add_argument(
        "--out", default=str(REPO / "BENCH" / "bypass_pair_ab.json")
    )
    args = ap.parse_args()

    legs: list[dict] = []
    for rep in range(args.reps):
        order = (1, 2) if rep % 2 == 0 else (2, 1)
        for pair in order:
            res = run_leg(pair, args.nodes, args.edges)
            legs.append(res)
            print(
                f"rep{rep} pair={pair}: bypass={res.get('bypass_s')}s "
                f"rounds={res.get('bypass_rounds')} "
                f"kept=({res.get('kept_nodes')},{res.get('kept_edges')}) "
                f"cpu={res.get('cpu_s')}s",
                flush=True,
            )
            # incremental write: a killed run keeps its completed legs
            Path(args.out).write_text(
                json.dumps({"partial": True, "legs": legs}, indent=1) + "\n"
            )

    ok_legs = [l for l in legs if "bypass_s" in l]
    shapes = {
        (l.get("kept_nodes"), l.get("kept_edges"), l.get("bypass_truncated"))
        for l in ok_legs
    }
    result = {
        "n_nodes": args.nodes,
        "n_edges": args.edges,
        "reps": args.reps,
        "kept_shape_consistent": len(shapes) == 1,
        "kept_shapes": sorted(str(s) for s in shapes),
        "legs": legs,
        "best_bypass_s": {
            str(p): min(
                (l["bypass_s"] for l in ok_legs if l["rounds_per_ckpt"] == p),
                default=None,
            )
            for p in (1, 2)
        },
    }
    Path(args.out).write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result["best_bypass_s"]))


if __name__ == "__main__":
    main()
