"""Physical-plan assertions: the optimizations SCALE.md claims must be
visible in the executed plan, or a regression silently costs 100× at scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_lang_filter_pushes_into_scan(spark, tmp_path):
    from openie_spark.corpus import pages_df
    from openie_spark.textclean import clean_pages

    pages_df(spark, 30, seed=1).write.parquet(str(tmp_path / "pages"))
    pages = spark.read.parquet(str(tmp_path / "pages"))
    plan = _plan(clean_pages(pages, lang="ru"))
    assert "PushedFilters" in plan
    assert "EqualTo(lang,ru)" in plan


def test_column_pruning_token_count(spark):
    import pathlib

    if not pathlib.Path("/root/testdata/sf0.001").exists():
        pytest.skip("testdata not present")
    from openie_spark.dataops.textstats import token_count

    # A cached full-width relation over the same path anywhere in the session
    # would be substituted into this plan and defeat pruning; start clean.
    spark.catalog.clearCache()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(docs.select("doc_id", token_count().alias("n")))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" in read_schema and "doc_id" in read_schema
    assert "source" not in read_schema and "lang" not in read_schema


def test_topk_is_partial_topk_not_global_sort(spark):
    from openie_spark.dataops.similarity import brute_force_topk

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(50)], "vec_id long, embedding array<float>"
    )
    plan = _plan(brute_force_topk(df, [1.0, 0.0], k=5))
    assert "TakeOrderedAndProject" in plan


def test_embedding_neardup_never_cartesian(spark):
    """With no blocking column, embedding_neardup_pairs must block on
    hyperplane buckets — an all-pairs CartesianProduct is unreachable."""
    from openie_spark.dataops.dedup import embedding_neardup_pairs

    df = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0, 0.5]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    out = embedding_neardup_pairs(df, blocking_col=None)
    plan = _plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    out.collect()  # and it actually runs


def test_merge_mapping_rewrite_is_broadcast(spark):
    from openie_spark.graph import aggregate_edges, aggregate_nodes
    from openie_spark.merge import MergeConfig, apply_node_mapping

    t = spark.createDataFrame(
        [("u", 0, "s", "a", "a", "r", "r", "b", "b", "obj", None, None, 0)],
        "url string, sent_id int, sent_text string, left_arg string, "
        "left_arg_lemmas string, relation string, relation_lemmas string, "
        "right_arg string, right_arg_lemmas string, right_deprel string, "
        "left_vec array<float>, right_vec array<float>, cluster int",
    )
    n, e = aggregate_nodes(t, dim=0), aggregate_edges(t)
    mapping = spark.createDataFrame([("a", "b")], "other string, main string")
    _, me = apply_node_mapping(n, e, mapping, MergeConfig(dim=0))
    assert "BroadcastHashJoin" in _plan(me)


def test_minhash_signatures_plan_is_narrow(spark):
    """The r4 signature fold must stay a pure narrow projection: one string
    hash per shingle + affine lane mixes, NO shuffle — a regression to an
    explode/groupBy shape would shuffle n_docs x n_shingles rows at scale."""
    from openie_spark.dataops.dedup import minhash_signatures

    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "h i j k l m n")], "doc_id long, text string"
    )
    plan = _plan(minhash_signatures(df))
    assert "Exchange" not in plan, plan


def test_simhash_plan_is_narrow_and_python_free(spark):
    """The r4 JVM SimHash must stay shuffle-free AND Python-free — no
    Exchange, no ArrowEvalPython/BatchEvalPython (the old per-token
    blake2b pandas UDF would reappear as an eval-python node)."""
    from openie_spark.dataops.dedup import simhash_df

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "d e f")], "doc_id long, text string"
    )
    plan = _plan(simhash_df(df))
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_bucketed_graph_tables_prune_on_key_read(spark, tmp_path):
    """write_graph_tables' Iceberg-ready bucket layout must actually prune:
    a lemma_key point read through read_graph_nodes carries a bucket
    PartitionFilter and scans exactly one of the `buckets` partition
    directories — the layout's pruning claim tested, not asserted
    (VERDICT r4 #8). Same for an edge src read."""
    from openie_spark.sinks import read_graph_edges, read_graph_nodes, write_graph_tables

    nodes = spark.createDataFrame(
        [(f"lemma{i}", 1 + i, f"L{i}") for i in range(40)],
        "lemma_key string, weight long, label string",
    )
    edges = spark.createDataFrame(
        [(f"lemma{i}", f"lemma{(i + 1) % 40}", 1) for i in range(40)],
        "src string, dst string, weight long",
    )
    out = str(tmp_path / "graph_tables")
    write_graph_tables(nodes, edges, out, buckets=8)

    probe = read_graph_nodes(spark, out, lemma_key="lemma7", buckets=8)
    rows = probe.collect()
    assert [r["lemma_key"] for r in rows] == ["lemma7"]

    # the bucket equality must appear in PartitionFilters (directory-level
    # pruning), not merely as a post-scan row filter
    plan = probe._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [", 1)
    assert len(pf) == 2, plan[:1500]
    pf_body = pf[1].split("]")[0]
    assert "bucket" in pf_body and "=" in pf_body, pf_body
    # and only the one matching bucket directory contributes files
    fnames = {
        r[0]
        for r in probe.select(F.input_file_name()).distinct().collect()
    }
    assert len({f.split("bucket=")[1].split("/")[0] for f in fnames}) == 1

    eprobe = read_graph_edges(spark, out, src="lemma3", buckets=8)
    erows = eprobe.collect()
    assert {r["src"] for r in erows} == {"lemma3"}
    eplan = eprobe._jdf.queryExecution().executedPlan().toString()
    epf = eplan.split("PartitionFilters: [", 1)
    assert len(epf) == 2 and "bucket" in epf[1].split("]")[0], eplan[:1500]


def test_ivf_query_batch_plan_broadcast_cell_join(spark):
    """ivf_query_batch's candidate step must be a broadcast equi-join on
    ``cell`` (probe side exploded from an Arrow cell-assignment UDF) — no
    CartesianProduct / nested-loop, no row-at-a-time BatchEvalPython. With
    broadcast_probes=False the join degrades to a shuffle equi-join, still
    never a cartesian (the corpus-vs-corpus configuration)."""
    from openie_spark.dataops.similarity import build_ivf_index, ivf_query_batch

    emb = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 5), 1.0]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    index = build_ivf_index(emb, n_cells=4, seed=1)
    probes = spark.createDataFrame(
        [(i, [float(i % 7), 0.5, 1.0]) for i in range(10)],
        "probe_id long, embedding array<float>",
    )
    out = ivf_query_batch(index, probes, k=3, n_probe=2)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan  # Arrow only, never per-row Python
    assert out.count() > 0

    shuffled = ivf_query_batch(
        index, probes, k=3, n_probe=2, broadcast_probes=False
    )
    splan = _plan(shuffled)
    assert "CartesianProduct" not in splan
    assert "BroadcastNestedLoopJoin" not in splan
    index.unpersist()


def test_chunking_and_mixing_are_shuffle_free(spark):
    """chunk_tokens and upsample promise narrow, shuffle-free plans —
    at 100 TB an accidental Exchange here would re-shuffle the whole
    corpus for operators that are pure per-row fan-out."""
    from openie_spark.dataops.chunking import chunk_tokens
    from openie_spark.dataops.sampling import upsample

    docs = spark.createDataFrame(
        [(i, f"s{i % 3}", "tok " * 40) for i in range(50)],
        "doc_id long, source string, text string",
    )
    for df in (
        chunk_tokens(docs, size=16, overlap=4),
        upsample(docs, {"s0": 2.5}, salt="x"),
    ):
        plan = _plan(df)
        assert "Exchange" not in plan, plan[:2000]
        assert "BatchEvalPython" not in plan


def test_hll_aggs_have_mapside_partial_combine(spark):
    """approx_distinct: exactly two exchanges (register agg, then
    estimate agg), each preceded by a partial HashAggregate — the
    map-side combine that keeps the shuffled register table at
    groups*256 rows regardless of input size."""
    from openie_spark.dataops.cardinality import approx_distinct

    df = spark.createDataFrame(
        [(f"g{i % 4}", f"v{i % 97}") for i in range(500)],
        "grp string, val string",
    )
    plan = _plan(approx_distinct(df, ["grp"], "val"))
    assert plan.count("Exchange") <= 2, plan[:3000]
    assert "partial_max" in plan or "partial" in plan, plan[:3000]
    assert "BatchEvalPython" not in plan


def test_count_min_plans_are_jvm_and_partial(spark):
    """cm_registers: one exchange with a partial map-side sum before
    it (the register table arrives pre-collapsed); cm_estimate over a
    small key set: probe side broadcast, never a row-wise cartesian of
    keys x registers, and nothing drops to Python."""
    from openie_spark.dataops.frequency import cm_estimate, cm_registers

    df = spark.createDataFrame(
        [(f"g{i % 3}", f"v{i % 50}") for i in range(400)],
        "grp string, val string",
    )
    regs = cm_registers(df, ["grp"], "val")
    plan = _plan(regs)
    assert plan.count("Exchange") <= 1, plan[:3000]
    assert "partial_sum" in plan or "partial" in plan, plan[:3000]
    assert "BatchEvalPython" not in plan

    from pyspark.sql import functions as F

    est = cm_estimate(regs, df.select(F.col("val").alias("key")))
    eplan = _plan(est)
    assert "CartesianProduct" not in eplan, eplan[:3000]
    assert "BatchEvalPython" not in eplan


def test_cube_is_single_expand_single_agg_exchange(spark):
    """corpus_cube: the whole subtotal lattice is one Expand + one
    aggregation exchange — never one job per grouping set."""
    from openie_spark.dataops.corpusstats import corpus_cube

    df = spark.createDataFrame(
        [("en", "web", "a b"), ("de", "wiki", "c")],
        "lang string, source string, text string",
    )
    plan = _plan(corpus_cube(df))
    assert plan.count("Expand") >= 1, plan[:3000]
    assert plan.count("Exchange") <= 1, plan[:3000]
    assert "BatchEvalPython" not in plan


def test_funnel_and_transitions_single_shuffle(spark):
    """funnel: one exchange (the user groupBy) and the fold stays in
    JVM expressions; transition_matrix: the user window exchange plus
    the tiny pair-count agg, no Python anywhere."""
    from openie_spark.dataops.funnel import funnel
    from openie_spark.dataops.sessions import transition_matrix

    df = spark.createDataFrame(
        [(1, 1, "2024-01-01 00:00:00", "a")],
        "event_id long, user_id long, ts string, event_type string",
    ).selectExpr(
        "event_id", "user_id", "cast(ts as timestamp) ts", "event_type"
    )
    fplan = _plan(funnel(df, ["a", "b"]))
    assert fplan.count("Exchange") <= 1, fplan[:3000]
    assert "BatchEvalPython" not in fplan
    tplan = _plan(transition_matrix(df))
    assert tplan.count("Exchange") <= 2, tplan[:3000]
    assert "BatchEvalPython" not in tplan


def test_late_r7_operators_plan_hygiene(spark):
    """histogram: single partial-agg exchange; inverted_index: df
    pruning is a BROADCAST semi-join and nothing drops to Python;
    bipartite/host_rollup: equi-joins only, no cartesian."""
    from pyspark.sql import functions as F

    from openie_spark.dataops.histogram import histogram
    from openie_spark.dataops.invindex import inverted_index
    from openie_spark.graph_analytics import bipartite_project
    from openie_spark.weblinks import host_rollup

    ev = spark.createDataFrame(
        [("a", 1.5), ("b", 2.5)], "grp string, value double"
    )
    hplan = _plan(histogram(ev, "value", 0.0, 10.0, 4, ["grp"]))
    assert hplan.count("Exchange") <= 1, hplan[:3000]
    assert "BatchEvalPython" not in hplan

    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b c")], "doc_id long, text string"
    )
    iplan = _plan(inverted_index(docs, min_df=1))
    assert "BroadcastHashJoin" in iplan, iplan[:3000]
    assert "CartesianProduct" not in iplan
    assert "BatchEvalPython" not in iplan

    rel = spark.createDataFrame([("u", "r")], "l string, r string")
    bplan = _plan(bipartite_project(rel, "l", "r", max_right_degree=5))
    assert "CartesianProduct" not in bplan, bplan[:3000]
    assert "BatchEvalPython" not in bplan

    links = spark.createDataFrame(
        [("https://a.com/p", "https://b.org/x")],
        "src_url string, dst_url string",
    )
    rplan = _plan(host_rollup(links))
    assert "CartesianProduct" not in rplan, rplan[:3000]
    assert "BatchEvalPython" not in rplan
