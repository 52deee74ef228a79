"""Growth-rate bench: run the headline queries at sf0.1-equivalent scale
and at 10× (sf1-equivalent), report per-query scaling exponents
(log10 t_10x/t_1x; 1.0 = linear, <1 = fixed overhead amortizing, >1 =
superlinear growth to investigate) — VERDICT r3 item 6.

Inputs at 10× are derived with no external data: the KG corpus and the
dedup corpus are deterministic generators (corpus.pages_df /
dedup_docs_df) evaluated at 10·n, and the testdata-backed tables
(documents, lineitem, embeddings) are self-unioned 10× with id offsets —
same distributions, 10× the rows.

Usage: python tools/bench_growth.py [base_n_pages] [sf_dir]
Prints one JSON line; intermediate timings on stderr.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    base_n = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cooldown = int(os.environ.get("GROWTH_COOLDOWN", "20"))

    from pyspark.sql import functions as F

    from openie_spark.corpus import STOPWORDS_FIXTURE, dedup_docs_df, pages_df
    from openie_spark.dataops.dedup import exact_dedup, minhash_lsh_pairs
    from openie_spark.dataops.similarity import brute_force_topk
    from openie_spark.dataops.textstats import lang_id, quality_score
    from openie_spark.extract import extract_triples_df, ok_triples
    from openie_spark.graph import aggregate_edges, aggregate_nodes, with_degrees
    from openie_spark.parse import parse_pages
    from openie_spark.session import build_session
    from openie_spark.textclean import clean_pages

    spark = build_session(app_name="bench-growth")
    spark.sparkContext.setLogLevel("ERROR")
    stop = frozenset(STOPWORDS_FIXTURE)

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def offset_union(df, id_col: str, factor: int = 10):
        """Self-union with id offsets: same distribution, factor× rows."""
        n = df.count()
        parts = [
            df.withColumn(id_col, F.col(id_col) + F.lit(i * n)) for i in range(factor)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # warm shapes once at small scale (JIT, Python workers)
    warm = pages_df(spark, 200, seed=1, n_sents=6)
    force(
        ok_triples(
            extract_triples_df(parse_pages(clean_pages(warm, lang="ru")), stop)
        )
    )
    force(minhash_lsh_pairs(dedup_docs_df(spark, 200, seed=1), n_hashes=64, bands=8))

    results: dict = {}

    def run_scale(scale_name: str, factor: int):
        n = base_n * factor
        times: dict = {}

        def bench(name, fn):
            time.sleep(cooldown)
            t0 = time.monotonic()
            fn()
            dt = time.monotonic() - t0
            times[name] = round(dt, 3)
            print(f"[{scale_name}] {name}: {dt:.2f}s", file=sys.stderr)

        pages = pages_df(spark, n, seed=42, n_sents=6).cache()
        pages.count()
        cleaned = clean_pages(pages, lang="ru")
        bench("kg_clean", lambda: force(cleaned))
        parses = parse_pages(cleaned).cache()
        bench("kg_parse", lambda: parses.count())
        triples = ok_triples(extract_triples_df(parses, stop, with_vectors=True)).cache()
        bench("kg_extract", lambda: triples.count())
        labeled = triples.withColumn("cluster", F.lit(0))
        nodes = aggregate_nodes(labeled, max_descriptions=256, dim=64)
        edges = aggregate_edges(labeled, max_descriptions=256)
        bench("kg_graph", lambda: force(with_degrees(nodes, edges)))
        pages.unpersist()
        parses.unpersist()
        triples.unpersist()

        ddocs = dedup_docs_df(spark, n, seed=42).cache()
        ddocs.count()
        bench(
            "minhash_dedup",
            lambda: force(
                minhash_lsh_pairs(ddocs, n_hashes=64, bands=8, jaccard_threshold=0.7)
            ),
        )
        ddocs.unpersist()

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        if factor > 1:
            docs = offset_union(docs, "doc_id", factor)
            li = li  # lineitem keys are join keys, not ids — replicate rows
            li_parts = [li] * factor
            li2 = li_parts[0]
            for p in li_parts[1:]:
                li2 = li2.unionByName(p)
            li = li2
            emb = offset_union(emb, "vec_id", factor)
        docs = docs.cache()
        docs.count()
        emb = emb.cache()
        emb.count()
        bench("exact_dedup", lambda: force(exact_dedup(docs)))
        bench("lang_id", lambda: force(lang_id(docs).select("doc_id", "lang_pred")))
        bench("quality", lambda: force(quality_score(docs).select("doc_id", "quality")))
        probe = emb.filter(F.col("vec_id") == 0).first()["embedding"]
        bench("ann_brute", lambda: brute_force_topk(emb, probe, k=20).collect())
        bench(
            "edge_aggregate",
            lambda: force(
                li.groupBy("l_suppkey", "l_partkey").agg(
                    F.count(F.lit(1)).alias("weight"),
                    F.sum("l_quantity").alias("qty"),
                )
            ),
        )
        docs.unpersist()
        emb.unpersist()
        results[scale_name] = times

    run_scale("x1", 1)
    run_scale("x10", 10)

    exponents = {
        q: round(
            math.log10(max(results["x10"][q], 1e-3) / max(results["x1"][q], 1e-3)),
            3,
        )
        for q in results["x1"]
    }
    print(
        json.dumps(
            {
                "base_n": base_n,
                "x1": results["x1"],
                "x10": results["x10"],
                "exponent": exponents,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
