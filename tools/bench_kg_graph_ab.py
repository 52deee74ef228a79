"""Settle the r4 kg_graph "regression" (3.25s r3 -> 4.28s r4, VERDICT r4 #1).

Bisect preface (recorded here because it makes the A/B design): between the
r3 bench commit (ed13d13) and r4 (5f3da82), `git diff` shows graph.py,
extract.py, parse.py, textclean.py are BYTE-IDENTICAL, corpus.py gained only
new fixture builders (pages_df untouched), and bench.py's kg_graph call site
(cached-triples input, cooldown=30, force(with_degrees(...))) is unchanged.
There is no r3-vs-r4 code axis to interleave — the two "versions" are the
same bytes. What remains is measurement: this tool runs the exact bench.py
kg_graph protocol N times in one session (default 10 reps, 30s cooldowns —
the same credit-refill pause bench.py uses) and reports the full
distribution, so the r3 and r4 one-shot numbers can be placed inside or
outside the same-code variance envelope.

Usage: python tools/bench_kg_graph_ab.py [reps] [cooldown_s]
Writes BENCH/kg_graph_ab.json.
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    cooldown = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from openie_spark.corpus import STOPWORDS_FIXTURE, pages_df
    from openie_spark.extract import extract_triples_df, ok_triples
    from openie_spark.graph import aggregate_edges, aggregate_nodes, with_degrees
    from openie_spark.parse import parse_pages
    from openie_spark.session import build_session
    from openie_spark.textclean import clean_pages

    spark = build_session(app_name="kg-graph-ab")
    spark.range(1000).selectExpr("sum(id)").collect()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_pages = max(200, docs.count())
    pages = pages_df(spark, n_pages, seed=42, n_sents=6).cache()
    pages.count()
    triples = ok_triples(
        extract_triples_df(
            parse_pages(clean_pages(pages, lang="ru")),
            frozenset(STOPWORDS_FIXTURE),
            with_vectors=True,
        )
    ).cache()
    triples.count()

    labeled = triples.withColumn("cluster", F.lit(0))
    nodes = aggregate_nodes(labeled, max_descriptions=256, dim=64)
    edges = aggregate_edges(labeled, max_descriptions=256)

    # one untimed warmup rep: bench.py's number includes HotSpot tier-up of
    # the dim-64 sum fold only via _warm_heavy_shapes; replicate by warming
    force(with_degrees(nodes, edges))

    samples = []
    for i in range(reps):
        time.sleep(cooldown)
        t0 = time.monotonic()
        force(with_degrees(nodes, edges))
        dt = time.monotonic() - t0
        samples.append(round(dt, 3))
        print(f"rep {i + 1}/{reps}: {dt:.3f}s", file=sys.stderr)

    out = {
        "query": "kg_graph",
        "sf_dir": sf_dir,
        "n_pages": n_pages,
        "reps": reps,
        "cooldown_s": cooldown,
        "samples_s": samples,
        "min_s": min(samples),
        "median_s": round(statistics.median(samples), 3),
        "max_s": max(samples),
        "stdev_s": round(statistics.stdev(samples), 3) if reps > 1 else 0.0,
        "r3_oneshot_s": 3.25,
        "r4_oneshot_s": 4.28,
        "note": (
            "graph.py/extract.py/parse.py/textclean.py and the bench call "
            "site are byte-identical r3..r4 (git diff ed13d13..5f3da82); "
            "this is same-code variance characterization, not a code A/B"
        ),
    }
    print(json.dumps(out))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/kg_graph_ab.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
