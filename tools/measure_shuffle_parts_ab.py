"""Shuffle-partition A/B at fixed cores (VERDICT r5 item 5): test the
task-count-overhead hypothesis for the merge fixpoint's 0.62 variable-part
discovery efficiency — the 16-core leg burned 1.9x the vCPU of the 4-core
leg for identical output, with 32-vs-8 shuffle partitions the suspected
axis (4x the tasks on seconds-long stages).

Protocol: 16 taskset-pinned cores both legs, SPARK_GRAFT_EXTRA_CONF
overrides spark.sql.shuffle.partitions (8 vs the default 32), interleaved
order per rep, the self-checking merge child verifying every run, process-
tree jiffies recorded (user+sys of the child tree) so CPU inflation is
measured, not inferred.

Usage: python tools/measure_shuffle_parts_ab.py [--reps 2] [--groups 250000]
       [--noise-edges 2400000] [--out BENCH/shuffle_parts_ab.json]
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


def run_leg(parts: int, targs: list[str]) -> dict:
    cmd = [
        "taskset", "-c", CPUSET_16,
        sys.executable, str(REPO / "tools" / "measure_merge_scale.py"),
        *targs,
        # pin the session conf as THE axis — don't let the in-fixpoint
        # data-scaled policy override the leg's partition count
        "--no-round-parts",
    ]
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS="16",
        SPARK_GRAFT_EXTRA_CONF=f"spark.sql.shuffle.partitions={parts}",
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
        out = {"error": line[:300]}
    out["shuffle_partitions"] = parts
    out["leg_wall_s"] = round(wall, 1)
    out["cpu_s"] = round(
        (ru1.ru_utime + ru1.ru_stime) - (ru0.ru_utime + ru0.ru_stime), 1
    )
    out["rc"] = proc.returncode
    if proc.returncode != 0:
        out["stderr_tail"] = proc.stderr[-400:]
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--groups", type=int, default=250_000)
    ap.add_argument("--noise-edges", type=int, default=2_400_000)
    ap.add_argument("--cooldown", type=int, default=30)
    ap.add_argument("--out", default="BENCH/shuffle_parts_ab.json")
    args = ap.parse_args()

    targs = [str(args.groups), str(args.noise_edges)]
    results: dict = {"p8": [], "p32": []}
    for rep in range(args.reps):
        order = [8, 32] if rep % 2 == 0 else [32, 8]
        for parts in order:
            print(
                f"rep {rep + 1}/{args.reps} shuffle.partitions={parts} @16c...",
                file=sys.stderr, flush=True,
            )
            results[f"p{parts}"].append(run_leg(parts, targs))
            time.sleep(args.cooldown)

    summary = {
        "wall_p8_s": [r.get("wall_s") for r in results["p8"]],
        "wall_p32_s": [r.get("wall_s") for r in results["p32"]],
        "cpu_p8_s": [r.get("cpu_s") for r in results["p8"]],
        "cpu_p32_s": [r.get("cpu_s") for r in results["p32"]],
        "merges_correct": all(
            r.get("merges_correct") for r in results["p8"] + results["p32"]
        ),
    }
    out = {
        "what": (
            "merge fixpoint @16 pinned cores, spark.sql.shuffle.partitions "
            "8 vs 32, interleaved, process-tree CPU recorded — tests the "
            "task-count-overhead hypothesis behind the 0.62 variable-part "
            "efficiency (BENCH/MERGE_TOPK_SCALING.md)"
        ),
        "summary": summary,
        "runs": results,
    }
    Path(REPO / args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
