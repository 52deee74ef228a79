"""Interleaved A/B of the Observation probe-fusion (VERDICT r5 item 2).

Old leg = the pre-fusion commit checked out in a worktree (passed via
--old-dir); new leg = this working tree. Same protocol as
BENCH/edge_skip_probe.json: 16 taskset-pinned cores, legs back-to-back in
the same hypervisor window, order alternating per rep, the self-checking
scale children (closed-form merge counts; topk kept-graph invariants)
verifying every timed run. OPENIE_MERGE_DEBUG captures the per-round
find/apply/edge_par split so the fixed-cost delta is attributable to the
removed per-round probe jobs, not noise.

Usage: python tools/measure_fixed_cost_ab.py --old-dir .ab_old [--reps 2]
       [--groups 250000] [--noise-edges 2400000]
       [--topk-nodes 1000000] [--topk-edges 3000000]
       [--out BENCH/fixed_cost_ab.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
CPUSET_16 = "0,2,4,6,8,10,12,14,16,18,20,22,24,26,28,30"


def _steal():
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:9]]
    return v


def _steal_pct(a, b):
    return round(100.0 * (b[7] - a[7]) / max(sum(b) - sum(a), 1), 2)


def run_leg(repo_dir: Path, tool: str, targs: list[str]) -> dict:
    cmd = [
        "taskset", "-c", CPUSET_16,
        sys.executable, str(repo_dir / "tools" / tool), *targs,
    ]
    env = dict(os.environ, SPARK_GRAFT_CPUS="16", OPENIE_MERGE_DEBUG="1")
    before = _steal()
    t0 = time.monotonic()
    proc = subprocess.run(
        cmd, capture_output=True, text=True, cwd=str(repo_dir), env=env
    )
    wall = time.monotonic() - t0
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else "{}"
    try:
        out = json.loads(line)
    except json.JSONDecodeError:
        out = {"error": line[:300]}
    out["leg_wall_s"] = round(wall, 1)
    out["steal_pct"] = _steal_pct(before, _steal())
    out["rc"] = proc.returncode
    # per-round split from the debug stderr (merge child only)
    rounds = re.findall(
        r"merge round (\d+): find=([\d.]+)s apply=([\d.]+)s edge_par=([\d.]+)s",
        proc.stderr,
    )
    if rounds:
        out["round_split"] = [
            {"round": int(r), "find_s": float(f), "apply_s": float(a),
             "edge_par_s": float(e)}
            for r, f, a, e in rounds
        ]
    if proc.returncode != 0:
        out["stderr_tail"] = proc.stderr[-400:]
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--old-dir", required=True)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--groups", type=int, default=250_000)
    ap.add_argument("--noise-edges", type=int, default=2_400_000)
    ap.add_argument("--topk-nodes", type=int, default=1_000_000)
    ap.add_argument("--topk-edges", type=int, default=3_000_000)
    ap.add_argument("--cooldown", type=int, default=30)
    ap.add_argument("--out", default="BENCH/fixed_cost_ab.json")
    args = ap.parse_args()

    old_dir = (REPO / args.old_dir).resolve()
    merge_args = [str(args.groups), str(args.noise_edges)]
    topk_args = [str(args.topk_nodes), str(args.topk_edges)]
    results = {"merge": {"old": [], "new": []}, "topk": {"old": [], "new": []}}

    for rep in range(args.reps):
        order = [("old", old_dir), ("new", REPO)]
        if rep % 2 == 1:
            order.reverse()
        for phase, tool, targs in (
            ("merge", "measure_merge_scale.py", merge_args),
            ("topk", "measure_topk_scale.py", topk_args),
        ):
            for name, d in order:
                print(
                    f"rep {rep + 1}/{args.reps} {phase} [{name}] @16c...",
                    file=sys.stderr, flush=True,
                )
                results[phase][name].append(run_leg(d, tool, targs))
                time.sleep(args.cooldown)

    def spans(phase, name, keys):
        return [
            round(sum(float(r.get(k, 0.0)) for k in keys), 1)
            for r in results[phase][name]
        ]

    summary = {
        "merge_wall_old_s": spans("merge", "old", ("wall_s",)),
        "merge_wall_new_s": spans("merge", "new", ("wall_s",)),
        "topk_span_old_s": spans(
            "topk", "old", ("find_nodes_to_keep_s", "bypass_s")
        ),
        "topk_span_new_s": spans(
            "topk", "new", ("find_nodes_to_keep_s", "bypass_s")
        ),
        "merges_correct": all(
            r.get("merges_correct") for r in
            results["merge"]["old"] + results["merge"]["new"]
        ),
    }
    out = {
        "what": (
            "Interleaved old-vs-new A/B of the Observation probe fusion "
            "(merge edges_par changed-scan, bypass removed.isEmpty, reach "
            "BFS isEmpty folded into checkpoint actions), 16 pinned cores, "
            "1M-node workloads, alternating order per rep"
        ),
        "protocol": "same as BENCH/edge_skip_probe.json",
        "summary": summary,
        "runs": results,
    }
    Path(REPO / args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
