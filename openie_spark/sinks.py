"""Output sinks: per-sentence triples JSON, CoNLL-U parity output, node/edge
table writes, small-graph GEXF export.

The node/edge parquet writers are the primary sink (the reference's GEXF is
replaced by queryable partitioned tables, SURVEY.md §2.1 S8); GEXF survives
as a driver-side export utility for human-scale graphs only.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .conllu import write_conllu

IS_A = "_is_a_"
RELATES_TO = "_relates_to_"


def triples_json_df(triples_df: DataFrame) -> DataFrame:
    """sentence_text → [(left, relation, right)...] as one JSON string per
    sentence (reference: dict dumped at app.py:96-100). A dict keyed by
    sentence text collapses duplicate sentences — we group by sent_text for
    the same effect."""
    return (
        triples_df.groupBy("sent_text")
        .agg(
            F.to_json(
                F.collect_list(F.array("left_arg", "relation", "right_arg"))
            ).alias("triples_json")
        )
    )


def write_triples_json(triples_df: DataFrame, path: str) -> None:
    triples_json_df(triples_df).write.mode("overwrite").json(path)


def conllu_df(parses_df: DataFrame) -> DataFrame:
    """parses → (url, conllu) — one CoNLL-U document per page."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            by_url: dict = {}
            for url, sent_id, sent_text, tokens in zip(
                pdf["url"], pdf["sent_id"], pdf["sent_text"], pdf["tokens"]
            ):
                by_url.setdefault(url, []).append(
                    (
                        sent_id,
                        write_conllu(
                            sent_text,
                            [
                                (
                                    t["id"], t["form"], t["lemma"], t["upostag"],
                                    t["xpostag"], t["feats"], t["head"],
                                    t["deprel"], t["deps"], t["misc"],
                                )
                                for t in tokens
                            ],
                        ),
                    )
                )
            yield pd.DataFrame(
                {
                    "url": list(by_url),
                    "conllu": [
                        "".join(block for _, block in sorted(blocks))
                        for blocks in by_url.values()
                    ],
                }
            )

    return parses_df.repartition("url").mapInPandas(
        run, schema="url string, conllu string"
    )


def write_graph_tables(
    nodes_df: DataFrame, edges_df: DataFrame, out_dir: str, buckets: int = 16
) -> None:
    """Partitioned node/edge table writes (Iceberg-ready layout).

    Nodes/edges are hash-bucketed on their key so a downstream join on
    lemma_key scans co-located files; with an Iceberg catalog this becomes
    ``partitionedBy(bucket(N, lemma_key))`` hidden partitioning.
    """
    (
        nodes_df.withColumn(
            "bucket", F.pmod(F.xxhash64("lemma_key"), F.lit(buckets)).cast("int")
        )
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{out_dir}/nodes")
    )
    (
        edges_df.withColumn(
            "bucket", F.pmod(F.xxhash64("src"), F.lit(buckets)).cast("int")
        )
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{out_dir}/edges")
    )


def export_gexf(nodes_df: DataFrame, edges_df: DataFrame, path: str, max_nodes: int = 50000) -> None:
    """Small-graph GEXF export with the reference's bipartite reification:
    each edge becomes a ``label(src; dst)`` relation-node with two plain
    edges; relation-node weight = min(endpoint weights)
    (/root/reference/relations.py:894-915). Driver-side by design — GEXF is
    a visualization format, not a data path."""
    nodes = nodes_df.limit(max_nodes).collect()
    keep = {r["lemma_key"] for r in nodes}
    edges = [
        e
        for e in edges_df.collect()
        if e["src"] in keep and e["dst"] in keep
    ]
    weights = {r["lemma_key"]: r["weight"] for r in nodes}

    NS = "http://www.gexf.net/1.1draft"
    ET.register_namespace("", NS)
    root = ET.Element(f"{{{NS}}}gexf", version="1.1")
    graph = ET.SubElement(root, f"{{{NS}}}graph", defaultedgetype="directed")
    nodes_el = ET.SubElement(graph, f"{{{NS}}}nodes")
    edges_el = ET.SubElement(graph, f"{{{NS}}}edges")

    def add_node(nid: str, label: str, node_type: str, weight: int):
        ET.SubElement(
            nodes_el,
            f"{{{NS}}}node",
            id=nid,
            label=label or nid,
            weight=str(weight),
            node_type=node_type,
        )

    for r in nodes:
        add_node(r["lemma_key"], r["label"], "argument", r["weight"])

    eid = 0
    for e in edges:
        rel_id = f'{e["label"]}({e["src"]}; {e["dst"]})'
        add_node(
            rel_id,
            e["label"],
            "relation",
            min(weights[e["src"]], weights[e["dst"]]),
        )
        for s, t in ((e["src"], rel_id), (rel_id, e["dst"])):
            ET.SubElement(edges_el, f"{{{NS}}}edge", id=str(eid), source=s, target=t)
            eid += 1

    ET.ElementTree(root).write(path, encoding="utf-8", xml_declaration=True)
