"""Top-K entity filtering + removed-node bypass.

Reference behavior (/root/reference/relations.py:496-498, 828-892):

1. ``_find_nodes_to_remove``: keep the N heaviest nodes, then iteratively
   swap out any kept node whose edges *within the kept set* are all
   ``_is_a_``/``_relates_to_``, pulling in the next-heaviest. Two quirks
   kept verbatim (SURVEY.md §2.8 G6): the in-edge check tests
   ``target in nodes_to_leave`` — for an in-edge the target IS the node, so
   in-edge labels count unconditionally; and the swap-in cursor starts at
   index ``min(N, len)+1``, skipping one node. Weight ties, nondeterministic
   set order in the reference, are broken by lemma DESC (matching the
   (weight, node)-desc sort used by merge-main election).

2. ``_perform_filtering``: for each removed node, add pred→succ bypass
   edges where in-label == out-label, then drop the node. Sequential in the
   reference; we process *independent batches* of removed nodes per round
   (a removed node defers if it has an edge to a removed neighbor with a
   smaller hash) so simultaneous removals can't break label-equal chains —
   the batch version composes to the same result as the sequential one.

Scale: the swap refinement runs on a driver-collected slice bounded by
entities_limit (default 10,000 — /root/reference/instance/config.json:5)
plus a swap buffer; the bypass rounds are joins, fully distributed.
"""

from __future__ import annotations

from typing import Optional, Set, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IS_A = "_is_a_"
RELATES_TO = "_relates_to_"


def find_nodes_to_keep(
    nodes: DataFrame,
    edges: DataFrame,
    n_nodes_to_leave: int,
    buffer_factor: int = 3,
) -> Set[str]:
    """Driver-side replica of the reference's swap refinement, on a
    collected top slice (≤ N·buffer_factor rows — N is entities_limit-scale,
    so this is a small collect by design)."""
    n_buffer = n_nodes_to_leave * buffer_factor + 64
    top = (
        nodes.select("lemma_key", "weight")
        .orderBy(F.desc("weight"), F.desc("lemma_key"))
        .limit(n_buffer)
        .collect()
    )
    all_nodes = [r["lemma_key"] for r in top]
    cand_set = set(all_nodes)

    spark = nodes.sparkSession
    cand_df = F.broadcast(
        spark.createDataFrame([(k,) for k in sorted(cand_set)], "k string")
    )
    induced = (
        edges.join(cand_df.withColumnRenamed("k", "src"), "src", "left_semi")
        .join(cand_df.withColumnRenamed("k", "dst"), "dst", "left_semi")
        .select("src", "dst", "label")
        .collect()
    )
    out_edges: dict = {}
    for e in induced:
        if e["src"] in cand_set and e["dst"] in cand_set:
            out_edges.setdefault(e["src"], []).append((e["dst"], e["label"]))
    # The reference's in-edge quirk counts a node's in-edge labels
    # UNCONDITIONALLY (target==node is trivially in nodes_to_leave), so the
    # in-edge side must NOT be restricted to candidate-set sources — a
    # non-structural in-edge from a below-buffer node must still pin its
    # target. Since in-labels never depend on nodes_to_leave membership, the
    # only signal needed per candidate is "has ≥1 in-edge whose label is not
    # _is_a_/_relates_to_" — aggregated distributed-side, never collected
    # per-edge (a hub node may have millions of in-edges at scale).
    nonstructural_in = {
        r["dst"]
        for r in edges.filter(~F.col("label").isin(IS_A, RELATES_TO))
        .join(cand_df.withColumnRenamed("k", "dst"), "dst", "left_semi")
        .select("dst")
        .distinct()
        .collect()
    }

    keep = min(n_nodes_to_leave, len(all_nodes))
    nodes_to_leave = set(all_nodes[:keep])
    next_node_index = keep + 1  # reference's +1 skip quirk

    while True:
        for node in sorted(nodes_to_leave):  # deterministic scan order
            # in-edge quirk: target==node is always in nodes_to_leave, so a
            # single non-structural in-edge (from ANY node) pins the node
            if node in nonstructural_in:
                continue
            out_labels = [
                lbl for tgt, lbl in out_edges.get(node, []) if tgt in nodes_to_leave
            ]
            if all(l in (IS_A, RELATES_TO) for l in out_labels):
                nodes_to_leave.discard(node)
                if next_node_index < len(all_nodes):
                    nodes_to_leave.add(all_nodes[next_node_index])
                    next_node_index += 1
                break
        else:
            break
    return nodes_to_leave


def bypass_and_drop(
    nodes: DataFrame,
    edges: DataFrame,
    keep_keys: Set[str],
    max_rounds: int = 50,
    stats: Optional[dict] = None,
) -> Tuple[DataFrame, DataFrame]:
    """Drop all nodes not in ``keep_keys``, adding pred→succ bypass edges
    where the in-label equals the out-label (relations.py:865-892).

    Independent-batch rounds: per round, a removed node is processed only
    if none of its removed neighbors hashes smaller; edges incident to the
    processed batch are consumed, bypass edges join the live set.

    Round bound: per round every local-hash-minimum among removed nodes is
    consumed, so rounds ≤ longest strictly-hash-decreasing path in the
    removed-adjacency graph — O(log |removed|) in expectation for the
    uniform xxhash64 (measured in tests/test_graph.py: 1k-node removed
    chain resolves in ≤14 rounds). Before the rounds, a sound pre-filter
    drops every removed↔removed edge whose label L has no kept→removed
    in-edge or no removed→kept out-edge anywhere: a final kept→kept bypass
    edge of label L needs both ends of a label-homogeneous chain (bypass
    only fuses equal labels), so such edges can never contribute — at web
    scale with entities_limit ≪ |V| this discards the bulk of the edge set
    up front instead of grinding it through the rounds.

    If ``max_rounds`` is exhausted with removed nodes remaining, the
    leftover edges touching non-kept nodes are dropped (never returned
    dangling) and the event is recorded in ``stats['truncated']``.
    """
    spark = nodes.sparkSession
    keep_df = F.broadcast(
        spark.createDataFrame([(k,) for k in sorted(keep_keys)], "lemma_key string")
    )

    # sound label pre-filter on removed↔removed edges (see docstring)
    k_src = keep_df.withColumnRenamed("lemma_key", "src")
    k_dst = keep_df.withColumnRenamed("lemma_key", "dst")
    src_kept = F.col("src_kept")
    dst_kept = F.col("dst_kept")
    tagged = (
        edges.join(k_src.withColumn("src_kept", F.lit(True)), "src", "left")
        .join(k_dst.withColumn("dst_kept", F.lit(True)), "dst", "left")
        .withColumn("src_kept", F.coalesce(src_kept, F.lit(False)))
        .withColumn("dst_kept", F.coalesce(dst_kept, F.lit(False)))
    )
    useful_labels = F.broadcast(
        tagged.filter(src_kept & ~dst_kept)
        .select("label")
        .intersect(tagged.filter(~src_kept & dst_kept).select("label"))
    )
    cur_edges = (
        tagged.join(
            useful_labels.withColumn("_useful", F.lit(True)), "label", "left"
        )
        .filter(
            src_kept | dst_kept | F.coalesce(F.col("_useful"), F.lit(False))
        )
        .drop("src_kept", "dst_kept", "_useful")
        .select(edges.columns)
    )

    rounds = 0
    truncated = False
    for _ in range(max_rounds):
        removed = (
            cur_edges.select(F.col("src").alias("lemma_key"))
            .unionByName(cur_edges.select(F.col("dst").alias("lemma_key")))
            .distinct()
            .join(keep_df, "lemma_key", "left_anti")
        )
        if removed.isEmpty():
            break
        rounds += 1
        removed = removed.withColumn("h", F.xxhash64("lemma_key"))

        # defer removed nodes adjacent (among current edges) to a
        # smaller-hash removed node
        r_src = removed.select(
            F.col("lemma_key").alias("src"), F.col("h").alias("h_src")
        )
        r_dst = removed.select(
            F.col("lemma_key").alias("dst"), F.col("h").alias("h_dst")
        )
        adj = (
            cur_edges.join(r_src, "src").join(r_dst, "dst")
            .select("src", "dst", "h_src", "h_dst")
        )
        losers = (
            adj.filter(F.col("h_src") > F.col("h_dst"))
            .select(F.col("src").alias("lemma_key"))
            .unionByName(
                adj.filter(F.col("h_dst") > F.col("h_src")).select(
                    F.col("dst").alias("lemma_key")
                )
            )
            # equal hashes on distinct keys: defer the lexically larger
            .unionByName(
                adj.filter(
                    (F.col("h_src") == F.col("h_dst")) & (F.col("src") > F.col("dst"))
                ).select(F.col("src").alias("lemma_key"))
            )
            .unionByName(
                adj.filter(
                    (F.col("h_dst") == F.col("h_src")) & (F.col("dst") > F.col("src"))
                ).select(F.col("dst").alias("lemma_key"))
            )
            .distinct()
        )
        batch = removed.select("lemma_key").join(losers, "lemma_key", "left_anti")
        batch = F.broadcast(batch)

        # Self-loops on a batch node must not participate in bypass pairs:
        # in the reference any bypass edge with an endpoint on the removed
        # node is deleted together with the node (relations.py:884-892), so
        # only pred != mid and succ != mid pairs survive. Without this
        # filter a (pred->v, v->v) pair re-adds pred->v each round and v is
        # never consumed (non-convergence).
        b_in = cur_edges.join(
            batch.withColumnRenamed("lemma_key", "dst"), "dst"
        ).filter(F.col("src") != F.col("dst")).select(
            F.col("dst").alias("mid"),
            F.col("src").alias("pred"),
            F.col("label").alias("in_label"),
        )
        b_out = cur_edges.join(
            batch.withColumnRenamed("lemma_key", "src"), "src"
        ).filter(F.col("dst") != F.col("src")).select(
            F.col("src").alias("mid"),
            F.col("dst").alias("succ"),
            F.col("label").alias("out_label"),
            "edge_key",
            "weight",
            "lemmas",
            "deprel",
            "descriptions",
            "clusters",
        )
        bypass = (
            b_in.join(b_out, "mid")
            .filter(F.col("in_label") == F.col("out_label"))
            .select(
                F.col("pred").alias("src"),
                F.col("succ").alias("dst"),
                "edge_key",
                "weight",
                F.col("out_label").alias("label"),
                "lemmas",
                "deprel",
                "descriptions",
                "clusters",
            )
        )
        untouched = (
            cur_edges.join(batch.withColumnRenamed("lemma_key", "src"), "src", "left_anti")
            .join(batch.withColumnRenamed("lemma_key", "dst"), "dst", "left_anti")
        )
        cur_edges = (
            untouched.select(bypass.columns)
            .unionByName(bypass)
            .groupBy("src", "dst", "edge_key")
            .agg(
                F.sum("weight").alias("weight"),
                F.min("label").alias("label"),
                F.min("lemmas").alias("lemmas"),
                F.min("deprel").alias("deprel"),
                F.array_distinct(F.flatten(F.collect_list("descriptions"))).alias(
                    "descriptions"
                ),
                F.array_distinct(F.flatten(F.collect_list("clusters"))).alias(
                    "clusters"
                ),
            )
            .localCheckpoint(eager=True)
        )

    else:
        # max_rounds exhausted: never return edges referencing nodes absent
        # from new_nodes — drop any leftovers loudly instead of dangling.
        cleaned = cur_edges.join(
            keep_df.withColumnRenamed("lemma_key", "src"), "src", "left_semi"
        ).join(keep_df.withColumnRenamed("lemma_key", "dst"), "dst", "left_semi")
        if cur_edges.count() != cleaned.count():
            import logging

            logging.getLogger(__name__).warning(
                "bypass_and_drop: max_rounds=%d exhausted; dropping edges "
                "still touching non-kept nodes without bypassing them",
                max_rounds,
            )
            truncated = True
        cur_edges = cleaned

    if stats is not None:
        stats["rounds"] = rounds
        stats["truncated"] = truncated
    new_nodes = nodes.join(keep_df, "lemma_key", "left_semi")
    return new_nodes, cur_edges


def filter_nodes(
    nodes: DataFrame,
    edges: DataFrame,
    entities_limit: Optional[int],
) -> Tuple[DataFrame, DataFrame]:
    """The reference's filter_nodes: keep the refined top-K, bypass the rest."""
    if entities_limit is None:
        return nodes, edges
    keep = find_nodes_to_keep(nodes, edges, entities_limit)
    return bypass_and_drop(nodes, edges, keep)
