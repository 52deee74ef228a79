"""Decontamination at capstone scale (VERDICT r6 item 6): minhash_join
/ decontaminate is exact-oracled at sf0.01; this runs it once at the
384k-doc capstone scale so the 100 TB claim (eval side broadcasts, the
training corpus is scanned once) has a measured datapoint next to the
capstone numbers.

Construction (fully deterministic, no external data):
- train = dedup_docs_df(n) — the Zipf-vocabulary bench corpus,
- eval  = n_eval docs; EVEN eval ids are planted near-dups of train doc
  (j * 9973) % n (every 25th token mutated — the same mutation class the
  corpus itself uses for its in-corpus near-dups, J ≈ 0.85 ≥ 0.7),
  ODD eval ids are fresh texts from a disjoint seed (uncontaminated).

Recorded: wall for the full decontaminate (banding both sides, the
(band, band_hash) equi-join, exact verify, anti-join), contaminated-id
count, survivor count, and the expected plant count; the physical plan
is asserted to broadcast the eval band side and to contain no cartesian.

Usage: python tools/run_capstone_decontaminate.py [n_train] [n_eval]
       [--out BENCH/capstone_decontaminate.json]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_train = int(args[0]) if args else 384_000
    n_eval = int(args[1]) if len(args) > 1 else 2_000
    out_path = "BENCH/capstone_decontaminate.json"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from openie_spark.corpus import (
        _DEDUP_VOCAB,
        _gen_doc_tokens,
        _rng_for,
    )
    from openie_spark.dataops.dedup import decontaminate, minhash_join_pairs
    from openie_spark.session import build_session

    spark = build_session(app_name="capstone-decontaminate")
    spark.sparkContext.setLogLevel("ERROR")

    from openie_spark.corpus import dedup_docs_df

    train = dedup_docs_df(spark, n_train, seed=42)

    def gen_eval(j: int) -> dict:
        if j % 2 == 0:  # planted near-dup of a train doc
            src = (j * 9973) % n_train
            toks = _gen_doc_tokens(42, src)
            rng = _rng_for(42, "evalmut", j)
            for p in range(0, len(toks), 25):
                toks[p] = _DEDUP_VOCAB[rng.randrange(len(_DEDUP_VOCAB))]
        else:  # fresh, uncontaminated
            toks = _gen_doc_tokens(777_000 + j, j)
        return {"doc_id": 10_000_000 + j, "text": " ".join(toks)}

    sc = spark.sparkContext
    eval_df = spark.createDataFrame(
        sc.parallelize(range(n_eval), 8).map(lambda j: Row(**gen_eval(j))),
        "doc_id long, text string",
    )

    params = dict(n_hashes=64, bands=8, jaccard_threshold=0.7)

    # static plan guard: no cartesian anywhere (the broadcast decision is
    # AQE's — in-memory sources carry no stats, so the STATIC plan shows
    # SortMergeJoin and only the post-execution final plan is honest)
    pairs_plan = minhash_join_pairs(train, eval_df, **params)
    plan = pairs_plan._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan[:2000]

    t0 = time.monotonic()
    pairs = minhash_join_pairs(train, eval_df, **params)
    contaminated = pairs.select("id_a").distinct()
    n_contaminated = contaminated.count()
    wall_pairs = time.monotonic() - t0
    # the FINAL adaptive plan, read after execution: did AQE broadcast the
    # (tiny) banded eval side as the contract promises?
    final_plan = pairs._jdf.queryExecution().executedPlan().toString()
    final_section = final_plan.split("== Initial Plan ==")[0]
    broadcast_final = "BroadcastHashJoin" in final_section

    t1 = time.monotonic()
    survivors = decontaminate(train, eval_df, **params)
    n_survivors = survivors.count()
    wall_total = time.monotonic() - t1 + wall_pairs

    result = {
        "n_train": n_train,
        "n_eval": n_eval,
        "n_planted_contaminations": n_eval // 2,
        "n_contaminated_train_docs": n_contaminated,
        "n_survivors": n_survivors,
        "n_dropped": n_train - n_survivors,
        "wall_pairs_s": round(wall_pairs, 1),
        "wall_total_s": round(wall_total, 1),
        "train_docs_per_sec": round(n_train / wall_total, 1),
        "params": params,
        "broadcast_in_static_plan": "BroadcastHashJoin" in plan,
        "broadcast_in_final_adaptive_plan": broadcast_final,
    }
    print(json.dumps(result))
    (REPO / out_path).write_text(json.dumps(result, indent=1) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
