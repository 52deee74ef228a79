#!/usr/bin/env python
"""Focused per-operator A/B bench (guide §1.4/§1.5): times individual
bench.py spans through the noop sink with job descriptions, repeat=N
per span reporting MIN — for isolating one operator's change without a
full bench.py run. bench.py itself is FROZEN for driver measurement;
this file only feeds the numbers cited in OPTIMIZATION_r08.md.

Usage: python bench_extra.py <span> [span ...]   (default: all)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS, BENCH_EXTRA_REPEAT (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # noqa: F401  (pandas_udf type-hint resolution)


def force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeat = int(os.environ.get("BENCH_EXTRA_REPEAT", "3"))
    only = set(sys.argv[1:])

    from pyspark.sql import functions as F

    from openie_spark.session import build_session

    spark = build_session(app_name="openie-bench-extra")
    spark.range(1000).selectExpr("sum(id)").collect()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")

    def graph_edges():
        fwd = li.select(
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
            F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
        )
        rev = li.filter(F.col("l_partkey") % 5 == 0).select(
            F.concat(F.lit("p"), F.col("l_partkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        return fwd.unionByName(rev)

    def co_pairs():
        sp = li.select(
            F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
        ).distinct()
        return (
            sp.alias("a")
            .join(sp.alias("b"), "p")
            .filter(F.col("a.s") < F.col("b.s"))
            .groupBy(F.col("a.s").alias("src"), F.col("b.s").alias("dst"))
            .agg(F.count(F.lit(1)).alias("co"))
            .filter(F.col("co") >= 150)
            .select("src", "dst")
        )

    def span_ngram_overlap():
        from openie_spark.dataops.decontam import ngram_overlap

        return force(
            ngram_overlap(
                docs.filter(F.col("doc_id") % 2 == 0),
                docs.filter(F.col("doc_id") % 2 == 1),
                n=5,
            )
        )

    def span_token_pmi():
        from openie_spark.dataops.cooccur import cooccurrence_counts

        return force(cooccurrence_counts(docs))

    def span_top_terms():
        from openie_spark.dataops.keyterms import top_terms

        return force(top_terms(docs, k=3))

    def span_pagerank():
        from openie_spark.graph_analytics import pagerank_micros

        return force(pagerank_micros(graph_edges(), iterations=5))

    def span_hits():
        from openie_spark.graph_analytics import hits_micros

        return force(hits_micros(graph_edges(), iterations=4))

    def span_k_hop():
        from openie_spark.graph_analytics import k_hop_neighborhood

        return force(
            k_hop_neighborhood(
                li.select(
                    F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
                    F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
                ),
                ["s1"],
                3,
            )
        )

    def span_triangles():
        from openie_spark.graph_analytics import triangle_count

        return force(triangle_count(co_pairs()))

    _kg_state: dict = {}

    def _kg_triples():
        """Build + cache the triples table ONCE (outside span timing),
        mirroring bench.py which caches triples before the kg_graph
        span."""
        if "triples" in _kg_state:
            return _kg_state["triples"]
        from openie_spark.corpus import STOPWORDS_FIXTURE, pages_df
        from openie_spark.extract import extract_triples_df, ok_triples
        from openie_spark.parse import parse_pages
        from openie_spark.textclean import clean_pages

        n_docs = docs.count()
        pages = pages_df(spark, max(200, n_docs), seed=42, n_sents=6)
        triples = ok_triples(
            extract_triples_df(
                parse_pages(clean_pages(pages, lang="ru")),
                frozenset(STOPWORDS_FIXTURE),
                with_vectors=True,
            )
        ).cache()
        triples.count()
        _kg_state["triples"] = triples
        return triples

    def span_kg_graph():
        from openie_spark.graph import (
            aggregate_edges,
            aggregate_nodes,
            with_degrees,
        )

        labeled = _kg_triples().withColumn("cluster", F.lit(0))
        nodes = aggregate_nodes(labeled, max_descriptions=256, dim=64)
        edges = aggregate_edges(labeled, max_descriptions=256)
        return force(with_degrees(nodes, edges))

    def span_heavy_hitters():
        from openie_spark.dataops.frequency import heavy_hitters

        return force(
            heavy_hitters(
                ev.select(
                    "event_type",
                    F.col("user_id").cast("string").alias("uid"),
                ),
                ["event_type"],
                "uid",
            )
        )

    def span_line_dedup():
        from openie_spark.dataops.linededup import (
            dedup_lines,
            token_chunk_lines,
        )

        chunked = docs.select(
            "doc_id", token_chunk_lines("text", k=4).alias("lines")
        )
        return force(dedup_lines(chunked, lines_col="lines", min_doc_freq=4))

    def span_k_core():
        from openie_spark.graph_analytics import k_core

        return force(k_core(co_pairs(), k=5))

    spans = {
        "ngram_overlap": span_ngram_overlap,
        "token_pmi": span_token_pmi,
        "top_terms": span_top_terms,
        "pagerank": span_pagerank,
        "hits": span_hits,
        "k_hop": span_k_hop,
        "triangles": span_triangles,
        "kg_graph": span_kg_graph,
        "heavy_hitters": span_heavy_hitters,
        "line_dedup": span_line_dedup,
        "k_core": span_k_core,
    }

    times: dict = {}
    for name, fn in spans.items():
        if only and name not in only:
            continue
        samples = []
        for i in range(repeat):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.monotonic()
            fn()
            samples.append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        times[name] = {"min": min(samples), "samples": samples}
        print(json.dumps({name: times[name]}), flush=True)

    print(json.dumps({"sf_dir": sf_dir, "spans": times}))
    spark.stop()


if __name__ == "__main__":
    main()
