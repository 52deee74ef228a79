"""Host scaling-ceiling probe (Spark-free): how well does PURE CPU work
scale from N to 4N pinned cores on THIS host?

Motivation: the sandbox is a Firecracker VM (32 vCPU on 16 physical cores
× SMT) with hypervisor burst-credit throttling. Any wall-clock scaling
efficiency the Spark engine reports is bounded above by what the host
gives embarrassingly-parallel pure-CPU work with zero coordination — this
probe measures that ceiling so the engine's number can be read against it.

Workload: fixed total work W = ``--chunks`` identical chunks of
integer-heavy Python (no allocation churn, no shared state), executed by a
multiprocessing pool of exactly N processes, the whole process tree pinned
with taskset to N spread vCPUs (same pinning policy as bench_scaling.py).
Efficiency(N→4N) = (W/wall_4N) / (W/wall_N) / 4.

Run:    python tools/host_ceiling_probe.py [--pairs 1,4 2,8] [--reps 3]
Child:  python tools/host_ceiling_probe.py --child --procs N --chunks C
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time


def _burn(chunk_id: int) -> int:
    # ~0.4s of pure integer work per chunk on this host; deterministic
    x = chunk_id + 1
    for i in range(2_500_000):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
    return x


def child(procs: int, chunks: int) -> None:
    import multiprocessing as mp

    with mp.Pool(procs) as pool:
        pool.map(_burn, range(procs))  # warm the pool (fork + import)
        t0 = time.monotonic()
        pool.map(_burn, range(chunks), chunksize=1)
        wall = time.monotonic() - t0
    cpu = os.times()
    print(
        json.dumps(
            {
                "procs": procs,
                "chunks": chunks,
                "wall_s": round(wall, 3),
                "child_cpu_s": round(cpu.children_user + cpu.children_system, 2),
            }
        )
    )


def run_child(procs: int, chunks: int) -> dict:
    n_cpus = os.cpu_count() or 32
    stride = max(1, n_cpus // procs)
    cpu_list = ",".join(str(i * stride) for i in range(procs))
    out = subprocess.run(
        [
            "taskset", "-c", cpu_list, sys.executable, __file__,
            "--child", "--procs", str(procs), "--chunks", str(chunks),
        ],
        capture_output=True,
        text=True,
        timeout=1200,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--procs", type=int, default=1)
    ap.add_argument("--chunks", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--pairs", nargs="*", default=["1,4", "2,8", "8,32"],
        help="N,4N core pairs to probe",
    )
    args = ap.parse_args()
    if args.child:
        child(args.procs, args.chunks)
        return

    results: dict = {}
    for rep in range(args.reps):
        for pair in args.pairs:
            lo, hi = (int(x) for x in pair.split(","))
            r_hi = run_child(hi, args.chunks)  # high leg first: credits fresh
            time.sleep(20)
            r_lo = run_child(lo, args.chunks)
            time.sleep(30)
            eff = (args.chunks / r_hi["wall_s"]) / (args.chunks / r_lo["wall_s"]) / (
                hi / lo
            )
            results.setdefault(pair, []).append(
                {
                    "rep": rep,
                    "eff": round(eff, 3),
                    "wall_lo": r_lo["wall_s"],
                    "wall_hi": r_hi["wall_s"],
                    "cpu_lo": r_lo["child_cpu_s"],
                    "cpu_hi": r_hi["child_cpu_s"],
                }
            )
            print(f"rep {rep} pair {pair}: eff={eff:.3f}", file=sys.stderr)
    summary = {
        pair: {
            "effs": [r["eff"] for r in rs],
            "median_eff": round(statistics.median(r["eff"] for r in rs), 3),
            "cpu_ratio_hi_over_lo": round(
                statistics.median(r["cpu_hi"] / r["cpu_lo"] for r in rs), 3
            ),
        }
        for pair, rs in results.items()
    }
    print(json.dumps({"summary": summary, "runs": results}, indent=2))


if __name__ == "__main__":
    main()
