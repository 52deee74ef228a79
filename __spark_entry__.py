"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``  — flagship KG-construction pipeline on sf0.001.
- ``queries()``     — one callable per implemented operator (SURVEY.md §2
  plus the dataops training-data operators); each takes (spark, sf_dir).
- ``oracle_sql()``  — DuckDB-equivalent ANSI SQL for EVERY query (22/22).
  Non-SQL-expressible hash families (dependency parsing + rule extraction,
  SimHash/hyperplane bucketing) are oracled via checked-in goldens produced
  by independent second implementations: the LIVE reference repo for the
  KG pipeline (tools/make_goldens.py) and Spark-free pure-Python/numpy for
  the dataops hash families (tools/make_dataops_goldens.py). The formerly
  approximate queries are exact-checkable because their verify stages make
  precision 1 by construction and their candidate recall is either
  guaranteed (simhash pigeonhole) or exactly 1 on the driver corpus
  (minhash banding, pytest-pinned) or part of the contract (ann_lsh:
  bucket-restricted top-k, buckets independently recomputed).

Column-name and value-representation discipline: every computed column is
aliased identically in the Spark plan and the SQL; every float is emitted
as bigint micro-units (round(x*1e6)) on both sides so value hashes can't
diverge on formatting.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF001 = "/root/testdata/sf0.001"

EN_MARKERS = ["the", "and", "of", "to", "in", "is", "was", "for", "with", "that"]
ES_MARKERS = ["el", "la", "los", "las", "de", "que", "y", "en", "un", "una", "por"]
RU_MARKERS = ["и", "в", "не", "на", "что", "с", "по", "как", "это", "был"]
DE_MARKERS = ["der", "die", "das", "und", "ist", "von", "mit", "den", "für", "nicht"]


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _micros(col: F.Column) -> F.Column:
    return F.round(col * 1e6).cast("bigint")


def _sum_micros(col_name: str) -> F.Column:
    """Order-independent micro-unit sum: convert each double to bigint
    micros PER ROW, then sum integers. ``round(sum(double)*1e6)`` is NOT
    partition-order-stable (IEEE addition isn't associative — a last-ulp
    difference between Spark's partial-agg order and DuckDB's scan order
    flips the rounding on any group whose sum sits on a .5 micro
    boundary); integer addition is associative, so this form hashes
    identically under ANY partition layout. Mirrored in the oracle SQL as
    ``sum(round(x*1e6)::BIGINT)::BIGINT``."""
    return F.sum(F.round(F.col(col_name) * 1e6).cast("bigint"))


def _sampling_thr(rate: float) -> str:
    """The hash_sample decision threshold, shared with the oracle SQL so
    both engines compare against byte-identical literals."""
    from openie_spark.dataops.sampling import _hex_threshold

    return _hex_threshold(rate)


# ---------------------------------------------------------------------------
# flagship KG pipeline
# ---------------------------------------------------------------------------

_KG_CACHE: dict = {}


def _kg_pipeline(spark: SparkSession, sf_dir: str, with_merge: bool = True):
    """Run the full KG-construction pipeline over a deterministic synthetic
    Common-Crawl-style corpus sized by the sf's documents table (the
    template grammar guarantees known-correct parses; triple-level parity
    with the reference is pytest-enforced). Results are cached per
    (sf_dir, with_merge) so kg_nodes / kg_edges share one run."""
    key = (sf_dir, with_merge)
    if key in _KG_CACHE:
        return _KG_CACHE[key]
    from openie_spark.corpus import pages_df
    from openie_spark.pipeline import PipelineConfig, run_pipeline

    n_docs = _read(spark, sf_dir, "documents").count()
    n_pages = max(50, int(n_docs))
    pages = pages_df(spark, n_pages, seed=42, n_sents=6)
    cfg = PipelineConfig(
        skip_clustering=True,  # sandbox corpora < MIN_CLUSTER_SIZE*2 sentences
        skip_merge=not with_merge,
        entities_limit=None,
    )
    out = run_pipeline(spark, pages, cfg, input_fingerprint=f"entry:{n_pages}")
    # materialize the shared tables once; kg_nodes/kg_edges both read them
    for k in ("triples", "nodes", "edges"):
        out[k] = out[k].localCheckpoint(eager=False)
    _KG_CACHE[key] = out
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the (subj, relation, obj) triples the corpus asserts."""
    out = _kg_pipeline(spark, SF001, with_merge=False)
    return out["triples"].select(
        "url", "sent_id", "left_arg", "relation", "right_arg", "right_deprel"
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_kg_triples(spark, sf_dir):
    """Full clean→parse→extract pipeline; oracled against the checked-in
    golden triples parquet produced by the LIVE reference implementation on
    the same deterministic 500-page corpus (tools/make_goldens.py) — the
    P/R=1.0 contract surface, hash-exact."""
    out = _kg_pipeline(spark, sf_dir, with_merge=False)
    return out["triples"].select(
        "url", "sent_id", "left_arg", "relation", "right_arg", "right_deprel"
    )


def q_kg_nodes(spark, sf_dir):
    """A1 node aggregation + A4 degrees over the pipeline's triples;
    oracled as SQL over the reference-derived golden triples parquet.
    (The post-merge graph has no exact cross-engine oracle: the reference's
    merge is a sequential greedy fixpoint in networkx edge-insertion order
    and is not confluent — our bulk-round fixpoint is parity-tested against
    the live reference on order-insensitive fixtures in tests/test_graph.py
    instead.)"""
    out = _kg_pipeline(spark, sf_dir, with_merge=False)
    return out["nodes"].select(
        "lemma_key", "weight", "degree_in", "degree_out", "in_weight", "out_weight"
    )


def q_kg_edges(spark, sf_dir):
    """A2 edge aggregation over the pipeline's triples; oracled as SQL over
    the golden triples parquet (see q_kg_nodes on merge oracle scope)."""
    out = _kg_pipeline(spark, sf_dir, with_merge=False)
    return out["edges"].select("src", "dst", "edge_key", "weight")


def q_kg_merge_apply(spark, sf_dir):
    """G3: the broadcast other→main mapping rewrite (apply_node_mapping)
    with a deterministic SQL-expressible mapping: per (src, edge_key) group
    of non-literal edges, targets map to the max-(weight, lemma) target,
    with the same conflict resolution the merge fixpoint uses (best main
    per other; absorbed mains defer). Exercises the rewrite join + edge
    re-aggregation end-to-end with a DuckDB oracle."""
    from pyspark.sql import Window

    from openie_spark.merge import IS_A, RELATES_TO, MergeConfig, apply_node_mapping

    out = _kg_pipeline(spark, sf_dir, with_merge=False)
    nodes, edges = out["nodes"], out["edges"]

    cand = (
        edges.filter(~F.col("label").isin(IS_A, RELATES_TO))
        .select(F.col("src").alias("anchor"), "edge_key", F.col("dst").alias("cand"))
        .distinct()
        .join(
            nodes.select(F.col("lemma_key").alias("cand"), F.col("weight").alias("cand_weight")),
            "cand",
        )
    )
    w_grp = Window.partitionBy("anchor", "edge_key")
    w_rank = w_grp.orderBy(F.desc("cand_weight"), F.desc("cand"))
    ranked = (
        cand.withColumn("n", F.count(F.lit(1)).over(w_grp))
        .filter(F.col("n") >= 2)
        .withColumn("pos", F.row_number().over(w_rank))
    )
    mains = ranked.filter(F.col("pos") == 1).select(
        "anchor", "edge_key",
        F.col("cand").alias("main"), F.col("cand_weight").alias("main_weight"),
    )
    others = ranked.filter(F.col("pos") > 1).select(
        "anchor", "edge_key", F.col("cand").alias("other")
    )
    pairs = others.join(mains, ["anchor", "edge_key"]).select(
        "other", "main", "main_weight"
    )
    w_other = Window.partitionBy("other").orderBy(F.desc("main_weight"), F.desc("main"))
    mapping = (
        pairs.withColumn("r", F.row_number().over(w_other))
        .filter(F.col("r") == 1)
        .select("other", "main")
        .distinct()
    )
    absorbed = mapping.select(F.col("other").alias("k"))
    mapping = mapping.join(absorbed, mapping.main == absorbed.k, "left_anti").select(
        "other", "main"
    )
    _, merged_edges = apply_node_mapping(nodes, edges, mapping, MergeConfig(dim=64))
    return merged_edges.select("src", "dst", "edge_key", "weight")


_MERGE_FX_CACHE: dict = {}


def _merge_fixture_graph(spark: SparkSession, sf_dir: str):
    """Full G1 merge fixpoint (the DISTRIBUTED DataFrame rounds, forced via
    merge_local_threshold=0) over the CONFLUENT merge-fixture corpus
    (openie_spark.corpus.merge_fixture_*): disjoint 2-candidate merge
    groups plus chain groups whose second-round group only becomes
    discoverable after round 1, so every merge order converges to the same
    graph — the reference's sequential greedy output (goldens/
    merge_fixture/, tools/make_merge_goldens.py; digest-identical under two
    PYTHONHASHSEED values) is therefore an EXACT oracle. strict_parity=True
    reproduces the reference's absorbed-node in-edge drop."""
    if sf_dir in _MERGE_FX_CACHE:
        return _MERGE_FX_CACHE[sf_dir]
    from openie_spark.corpus import MERGE_FX_MAX_GROUPS, merge_fixture_pages_df
    from openie_spark.pipeline import PipelineConfig, run_pipeline

    n_docs = _read(spark, sf_dir, "documents").count()
    n_groups = max(4, min(n_docs // 4, MERGE_FX_MAX_GROUPS))
    pages = merge_fixture_pages_df(spark, n_groups)
    cfg = PipelineConfig(
        skip_clustering=True,
        skip_merge=False,
        entities_limit=None,
        strict_parity=True,
        merge_local_threshold=0,
    )
    out = run_pipeline(spark, pages, cfg, input_fingerprint=f"mergefx:{n_groups}")
    for k in ("nodes", "edges"):
        out[k] = out[k].localCheckpoint(eager=False)
    _MERGE_FX_CACHE[sf_dir] = out
    return out


def q_kg_merge_fixpoint_nodes(spark, sf_dir):
    """G1 (the iterated merge loop, distributed branch) — converged node
    table vs the reference's merge_relations on the confluent fixture."""
    out = _merge_fixture_graph(spark, sf_dir)
    return out["nodes"].select(
        "lemma_key", "weight", "degree_in", "degree_out", "in_weight", "out_weight"
    )


def q_kg_merge_fixpoint_edges(spark, sf_dir):
    """G1 — converged edge table vs the reference (see nodes docstring)."""
    out = _merge_fixture_graph(spark, sf_dir)
    return out["edges"].select("src", "dst", "edge_key", "weight")


def q_kg_clustering(spark, sf_dir):
    """M2: the KMeans sweep + silhouette model selection (cluster_sentences)
    on the deterministic 5-blob fixture (corpus.clustering_fixture_rows —
    separation makes the optimal partition unique and the sweep argmax
    unambiguous). Input is coalesced to ONE partition so Spark's seeded
    k-means|| is fully deterministic across environments/parallelism.
    Output canonicalizes cluster ids to the min-url member, so the
    label-permutation between Spark and the golden's pure-numpy Lloyd's
    sweep (tools/make_clustering_goldens.py) cancels; the oracle is exact
    SELECT-from-golden."""
    from pyspark.sql import Window

    from openie_spark.clustering import cluster_sentences
    from openie_spark.corpus import clustering_fixture_rows

    rows = clustering_fixture_rows()
    fixture = spark.createDataFrame(
        rows, "url string, sent_id int, sent_vec array<float>"
    ).coalesce(1)
    labels = cluster_sentences(fixture, seed=42)
    w = Window.partitionBy("cluster")
    return labels.withColumn("cluster_rep", F.min("url").over(w)).select(
        "url", "cluster_rep"
    )


def q_node_aggregate(spark, sf_dir):
    # A1 shape: salted-groupBy node upsert (weight=count, attrs aggregated)
    orders = _read(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_custkey").alias("node_key")).agg(
        F.count(F.lit(1)).alias("weight"),
        _sum_micros("o_totalprice").alias("total_micros"),
        F.min("o_orderdate").cast("date").cast("string").alias("first_seen"),
    )


def q_edge_aggregate(spark, sf_dir):
    # A2 shape: edge upsert aggregate on (src, dst)
    li = _read(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_suppkey").alias("src"), F.col("l_partkey").alias("dst")
    ).agg(
        F.count(F.lit(1)).alias("weight"),
        _sum_micros("l_quantity").alias("qty_micros"),
    )


def q_degrees(spark, sf_dir):
    # A4/J-degree shape: degree + frequency aggregates per node
    li = _read(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_suppkey").alias("node_key")).agg(
        F.countDistinct("l_partkey").alias("degree_out"),
        F.count(F.lit(1)).alias("out_weight"),
    )


def q_topk_window(spark, sf_dir):
    # G6/O3 shape: deterministic top-K by weight with lemma tie-break
    from pyspark.sql import Window

    orders = _read(spark, sf_dir, "orders")
    w = Window.orderBy(F.desc("weight"), F.col("node_key"))
    return (
        orders.groupBy(F.col("o_custkey").alias("node_key"))
        .agg(F.count(F.lit(1)).alias("weight"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 100)
    )


def q_merge_candidates(spark, sf_dir):
    # J3 shape: candidate groups sharing (anchor, key) with ≥2 members
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.select(F.col("l_partkey").alias("anchor"), F.col("l_suppkey").alias("cand"))
        .distinct()
        .groupBy("anchor")
        .agg(
            F.count(F.lit(1)).alias("n_cands"),
            F.array_join(F.array_sort(F.collect_set("cand")), ",").alias("cand_list"),
        )
        .filter(F.col("n_cands") >= 2)
    )


def q_set_ops(spark, sf_dir):
    # O4 shape: set-union semantics as sorted distinct arrays
    orders = _read(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_custkey").alias("node_key")).agg(
        F.array_join(F.array_sort(F.collect_set("o_orderpriority")), "|").alias(
            "priority_set"
        ),
        F.array_join(F.array_sort(F.collect_set("o_orderstatus")), "|").alias(
            "status_set"
        ),
    )


def q_exact_dedup(spark, sf_dir):
    from openie_spark.dataops.dedup import exact_dedup

    docs = _read(spark, sf_dir, "documents")
    return exact_dedup(docs).select("content_hash", "keep_id", "n_copies")


def q_token_count(spark, sf_dir):
    from openie_spark.dataops.textstats import token_count

    docs = _read(spark, sf_dir, "documents")
    return docs.select("doc_id", token_count().alias("n_tokens"))


def q_text_quality(spark, sf_dir):
    from openie_spark.dataops.textstats import quality_features

    docs = _read(spark, sf_dir, "documents")
    qf = quality_features(docs)
    length_score = F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0))
    noise_penalty = F.greatest(
        F.lit(0.0),
        F.lit(1.0) - 2.0 * F.col("punct_ratio") - 2.0 * F.col("digit_ratio"),
    )
    stop_score = F.least(F.col("stopword_ratio") * 4.0, F.lit(1.0))
    return qf.select(
        "doc_id",
        F.col("n_tokens").alias("n_tokens"),
        _micros((length_score + noise_penalty + stop_score) / 3.0).alias(
            "quality_micros"
        ),
    )


def q_lang_id(spark, sf_dir):
    from openie_spark.dataops.textstats import lang_id

    docs = _read(spark, sf_dir, "documents")
    return lang_id(docs).select(
        "doc_id", "lang_pred", "hits_en", "hits_es", "hits_ru", "hits_de"
    )


def q_fingerprint(spark, sf_dir):
    from openie_spark.dataops.textstats import content_fingerprint

    docs = _read(spark, sf_dir, "documents")
    return content_fingerprint(docs).select("doc_id", "fingerprint")


def q_ann_cosine_topk(spark, sf_dir):
    from openie_spark.dataops.similarity import brute_force_topk

    emb = _read(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    top = brute_force_topk(emb, probe, k=20)
    return top.select(
        "vec_id", F.round(F.col("cosine") * 1e4).cast("bigint").alias("cosine_e4")
    )


def q_ann_lsh_topk(spark, sf_dir):
    """Scale-path ANN. Exact-oracled: the hyperplane hash family is
    deterministic (seeded), so the bucket-restricted candidate set is a
    fixed, reproducible subset — the oracle recomputes the buckets with a
    SECOND IMPLEMENTATION of the same construction in pure numpy
    (tools/make_dataops_goldens.py, goldens/dataops_sf01/
    ann_buckets.parquet) and takes the exact cosine top-k over the same
    candidates in SQL. Because both sides use the declared
    RandomState(seed).randn recipe, this catches Spark-path bugs
    (Arrow-batched bucketing UDF, multiprobe filter, TakeOrdered) to full
    value-hash equality — not spec-level bugs common to both. Recall vs
    unrestricted brute force remains approximate by construction and is
    pytest-bounded separately."""
    from openie_spark.dataops.similarity import lsh_topk

    emb = _read(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    return lsh_topk(emb, probe, k=20, multiprobe_bits=2).select(
        "vec_id", F.round(F.col("cosine") * 1e4).cast("bigint").alias("cosine_e4")
    )


def q_ann_ivf_topk(spark, sf_dir):
    """IVF ANN (KMeans coarse quantizer + n_probe nearest cells + exact
    cosine top-k) on the deterministic 5-blob fixture: the blob partition
    is the UNIQUE k-means optimum, so Spark ML's seeded k-means|| and the
    golden's pure-numpy Lloyd's (tools/make_ivf_goldens.py) must agree on
    the cells, the probed candidate set, and hence the exact top-k.
    Single-partition input for cross-environment determinism (same trick
    as kg_clustering). Oracle: SELECT from golden expected output."""
    from openie_spark.corpus import clustering_fixture_rows
    from openie_spark.dataops.similarity import build_ivf_index, ivf_query

    rows = clustering_fixture_rows()
    fixture = spark.createDataFrame(
        [(i, r[2]) for i, r in enumerate(rows)],
        "vec_id long, embedding array<float>",
    ).coalesce(1)
    probe = rows[0][2]
    # build-once / query-many API (r5): the quantizer fits once per data
    # version; each probe touches only its n_probe cells
    index = build_ivf_index(fixture, n_cells=5, seed=42, persist=False)
    return ivf_query(index, probe, k=20, n_probe=2).select(
        "vec_id",
        F.round(F.col("cosine") * 1e4).cast("bigint").alias("cosine_e4"),
    )


def q_ann_ivf_batch(spark, sf_dir):
    """Batched IVF ANN (r5): one build_ivf_index + a single ivf_query_batch
    job answering one probe per blob of the 5-blob fixture. Same
    unique-optimum argument as ann_ivf_topk, extended per probe; oracle is
    the pure-numpy golden (tools/make_ivf_goldens.py BATCH_PROBE_IDS)."""
    from openie_spark.corpus import clustering_fixture_rows
    from openie_spark.dataops.similarity import build_ivf_index, ivf_query_batch

    rows = clustering_fixture_rows()
    fixture = spark.createDataFrame(
        [(i, r[2]) for i, r in enumerate(rows)],
        "vec_id long, embedding array<float>",
    ).coalesce(1)
    index = build_ivf_index(fixture, n_cells=5, seed=42, persist=False)
    probes = [(pid, rows[pid][2]) for pid in (0, 75, 150, 225, 290)]
    return ivf_query_batch(index, probes, k=20, n_probe=2).select(
        "probe_id",
        "vec_id",
        F.round(F.col("cosine") * 1e4).cast("bigint").alias("cosine_e4"),
    )


def q_minhash_dedup(spark, sf_dir):
    """Exact-oracled: the operator's contract is LSH-candidates verified by
    EXACT shingle Jaccard ≥ threshold, so precision is 1 by construction,
    and on this corpus at these parameters (n_hashes=32, bands=8 → 4-row
    bands, t≈0.6) banding recall over the J≥0.6 pair set is exactly 1
    (pytest-pinned in test_entry.py) — the output therefore equals the full
    all-pairs exact-Jaccard ≥ 0.6 set, which the oracle computes directly
    in SQL via a shared-shingle candidate join. A banding recall miss or a
    max_bucket drop of a true pair would surface as a driver hash mismatch."""
    from openie_spark.dataops.dedup import minhash_lsh_pairs

    docs = _read(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        docs, n_hashes=32, bands=8, jaccard_threshold=0.6
    ).select("id_a", "id_b", _micros(F.col("jaccard")).alias("jaccard_micros"))


def q_minhash_join(spark, sf_dir):
    """Cross-corpus near-dup join (dataops/dedup.minhash_join_pairs — the
    decontamination primitive): documents split by doc_id parity stand in
    for train (even) vs eval (odd); output = exact-Jaccard ≥ 0.6 pairs
    with one id on each side. Exact-oracled by the same argument as
    minhash_dedup: band entries are deterministic per text, so a true
    pair bucketed together within-corpus is bucketed together across the
    split — banding recall 1 within (pytest-pinned) ⇒ recall 1 across —
    and verification is exact, so the output equals the cross-parity
    subset of the all-pairs exact-Jaccard ≥ 0.6 set, which the oracle
    computes in SQL. Emitted as (least, greatest) to match the oracle's
    canonical orientation."""
    from openie_spark.dataops.dedup import minhash_join_pairs

    docs = _read(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 2 == 0)
    eval_df = docs.filter(F.col("doc_id") % 2 == 1)
    pairs = minhash_join_pairs(
        train, eval_df, n_hashes=32, bands=8, jaccard_threshold=0.6
    )
    return pairs.select(
        F.least("id_a", "id_b").alias("id_a"),
        F.greatest("id_a", "id_b").alias("id_b"),
        _micros(F.col("jaccard")).alias("jaccard_micros"),
    )


def q_neardup_components(spark, sf_dir):
    """Pairs→clusters closure (dataops/components.py): distributed
    connected components (alternating large-star/small-star, Kiveris et
    al. SOCC'14) over the minhash near-dup pair set, labeling every
    paired doc with its component MINIMUM (= the dedup survivor id).
    Exact-oracled: the pair set equals the all-pairs exact-Jaccard ≥ 0.6
    set (see q_minhash_dedup), and DuckDB computes the same closure with
    a recursive CTE — full value-hash equality on (node, component)."""
    from openie_spark.dataops.components import connected_components
    from openie_spark.dataops.dedup import minhash_lsh_pairs

    docs = _read(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, n_hashes=32, bands=8, jaccard_threshold=0.6)
    return connected_components(pairs, a_col="id_a", b_col="id_b")


def q_simhash_dedup(spark, sf_dir):
    """Exact-oracled: pigeonhole banding (n_bands = max_hamming+1) has
    guaranteed recall and candidates are popcount-verified, so the output
    is EXACTLY the all-pairs hamming ≤ k set. The oracle recomputes the
    signatures with a pure-Python SimHash whose token hashes come from an
    XXH64 written from the public spec (tools/pure_xxh64.py — a genuinely
    different implementation of the hash family than Spark's JVM codegen)
    and derives the pair set with DuckDB xor + bit_count — full value-hash
    equality, no approximation left. Goldens: tools/make_dataops_goldens.py
    → goldens/dataops_sf01/simhash_sigs.parquet."""
    from openie_spark.dataops.dedup import simhash_neardup_pairs

    docs = _read(spark, sf_dir, "documents")
    return simhash_neardup_pairs(docs, max_hamming=6).select(
        "id_a", "id_b", "hamming"
    )


def q_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs, EXACT within the blocking key
    (blocking_col='label' → a per-block self-join, no approximation), so
    the DuckDB oracle is the same self-join with list_cosine_similarity.
    Threshold 0.35 sized to the testdata's within-label cosine
    distribution (max 0.475 — the tables carry no true near-dups)."""
    from openie_spark.dataops.dedup import embedding_neardup_pairs

    emb = _read(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(
        emb, blocking_col="label", min_cosine=0.35
    ).select(
        "id_a",
        "id_b",
        F.round(F.col("cosine") * 1e4).cast("bigint").alias("cosine_e4"),
    )


def q_ngram_jaccard(spark, sf_dir):
    from openie_spark.dataops.dedup import ngram_jaccard_pairs

    docs = _read(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        docs, shingle_n=3, threshold=0.5, blocking_col="source"
    ).select("id_a", "id_b", _micros(F.col("jaccard")).alias("jaccard_micros"))


def q_events_top_event(spark, sf_dir):
    # window/top-1-per-key over the events stream table
    from pyspark.sql import Window

    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("value"), F.col("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", _micros(F.col("value")).alias("value_micros"))
    )


def q_events_rollup(spark, sf_dir):
    ev = _read(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        _sum_micros("value").alias("value_micros"),
    )


def q_events_asof(spark, sf_dir):
    """As-of join (dataops/asof.py): every click matched to the latest
    at-or-before view of the same user — the union+window shape (one
    shuffle on user_id, NO join node in the plan, plan-tested) vs the
    range-join blowup a naive as-of costs at scale. Right side is
    pre-deduplicated per (user_id, ts) (max event_id carries its value)
    so tie semantics are unambiguous; the oracle is DuckDB's NATIVE
    ASOF LEFT JOIN over the identically deduped side — an independent
    implementation of the same inclusive backward-match semantics."""
    from openie_spark.dataops.asof import asof_join

    ev = _read(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("view_event_id"),
            F.expr("max_by(value, event_id)").alias("view_value"),
        )
    )
    out = asof_join(clicks, views, on="ts", by="user_id")
    return out.select(
        "event_id",
        F.col("asof_view_event_id").alias("view_event_id"),
        _micros(F.col("asof_view_value")).alias("view_value_micros"),
        (F.unix_timestamp("ts") - F.unix_timestamp("asof_ts"))
        .cast("bigint")
        .alias("lag_s"),
    )


def q_events_sessions(spark, sf_dir):
    """Sessionization rollup (dataops/sessions.py): per-user gaps-and-
    islands with a 30-minute timeout — lag + running break-sum in ONE
    shuffle on user_id (the session groupBy reuses the window's
    partitioning, no second exchange), microsecond-exact arithmetic, ties
    broken by event_id. Oracle: the same deterministic definition in
    DuckDB window SQL — full value equality. The session value is summed
    as PER-ROW bigint micros (see _sum_micros) so the hash is stable
    under any partition layout — round(sum(double)) was the one r6
    driver-environment hash flip."""
    from openie_spark.dataops.sessions import session_rollup

    ev = _read(spark, sf_dir, "events").withColumn(
        "value_us", F.round(F.col("value") * 1e6).cast("bigint")
    )
    out = session_rollup(ev, gap_seconds=1800, value_col="value_us")
    return out.select(
        "user_id",
        "session_seq",
        "n_events",
        "start_us",
        "end_us",
        F.col("value_sum").cast("bigint").alias("value_micros"),
    )


def q_hash_sample(spark, sf_dir):
    """Deterministic stratified sampling (dataops/sampling.py): keep 100%
    of src0, 40% of src1, 10% of everything else, decided purely by
    md5(salt || doc_id)'s first 8 hex digits vs the rate threshold —
    reproducible across partitionings, engines, and runs (df.sample is
    none of those). Oracle: the identical md5 expression in DuckDB —
    full row-set equality, plus n_chars carried through to prove rows,
    not just ids, survive."""
    from openie_spark.dataops.sampling import stratified_hash_sample

    docs = _read(spark, sf_dir, "documents")
    out = stratified_hash_sample(
        docs,
        rates={"src0": 1.0, "src1": 0.4},
        stratum_col="source",
        key_col="doc_id",
        salt="r6",
        default_rate=0.1,
    )
    return out.select("doc_id", "source", "n_chars")


def q_events_intervals(spark, sf_dir):
    """Point-in-interval join (dataops/intervals.py): every non-error
    event that falls inside the 4-hour window after an error by the same
    user. The naive BETWEEN theta-join plans as a nested-loop/cartesian;
    this is the binned shape — intervals explode to the time bins they
    span, points map to exactly ONE bin, and the match is a plain
    (user_id, bin) equi-join + exact residual (no duplicate pairs by
    construction, plan-tested no-cartesian). Bin arithmetic is integer
    microseconds, so binning can never disagree with the residual at a
    boundary. Oracle: the literal BETWEEN join in DuckDB."""
    from openie_spark.dataops.intervals import interval_join

    ev = _read(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("interval_id"),
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 4 HOURS")).alias("end_ts"),
    )
    pts = ev.filter(F.col("event_type") != "error")
    out = interval_join(
        pts, errors, point_ts="ts", by="user_id", bin_seconds=4 * 3600
    )
    from openie_spark.dataops.timeutil import epoch_micros

    return out.select(
        "event_id",
        F.col("ivl_interval_id").alias("interval_id"),
        (epoch_micros(out, "ts") - epoch_micros(out, "ivl_start_ts")).alias(
            "gap_us"
        ),
    )


def q_events_rolling(spark, sf_dir):
    """Time-range rolling features (dataops/intervals.py rolling_agg):
    per event, the count and value-sum of the same user's events in the
    preceding hour (inclusive) — ONE rangeBetween window over integer
    microseconds, one shuffle, no self-join. The sum is per-row bigint
    micros (associative — partition-layout-proof, see _sum_micros).
    Oracle: the identical ANSI RANGE frame in DuckDB."""
    from openie_spark.dataops.intervals import rolling_agg

    ev = _read(spark, sf_dir, "events").withColumn(
        "value_us", F.round(F.col("value") * 1e6).cast("bigint")
    )
    out = rolling_agg(
        ev,
        {
            "n_1h": F.count(F.lit(1)),
            "value_1h_micros": F.sum("value_us"),
        },
        ts_col="ts",
        by="user_id",
        window_seconds=3600,
    )
    return out.select("event_id", "n_1h", "value_1h_micros")


def q_events_quantiles(spark, sf_dir):
    """Exact per-group quantiles (dataops/quantiles.py): percentile_disc
    quartiles of event value per event_type — window rank + rank-hit
    collapse in a SINGLE exchange (the groupBy reuses the window's hash
    partitioning, plan-tested). Dyadic q (k/2^m) makes the ceil(q*n)
    rank float-exact, so the selected ELEMENT (never an interpolation)
    is bitwise engine-portable. Oracle: DuckDB's native percentile_disc
    WITHIN GROUP."""
    from openie_spark.dataops.quantiles import group_quantiles

    ev = _read(spark, sf_dir, "events")
    out = group_quantiles(ev, "value", [0.25, 0.5, 0.75], by="event_type")
    return out.select(
        "event_type",
        "n",
        _micros(F.col("p25")).alias("p25_micros"),
        _micros(F.col("p50")).alias("p50_micros"),
        _micros(F.col("p75")).alias("p75_micros"),
    )


def q_line_dedup(spark, sf_dir):
    """CCNet-style line-level boilerplate removal (dataops/linededup.py):
    lines whose trimmed form appears in >= 4 distinct docs are removed
    from EVERY doc; survivors reassemble in original order; docs that
    were 100% boilerplate drop. The documents table has no newlines, so
    lines are deterministic 4-token chunks (token_chunk_lines) on both
    sides. Shape: one shuffle to count line doc-frequency (partial-agg),
    the tiny boilerplate set broadcast to a left-anti join, one doc-id
    shuffle to regroup. Oracle: the identical chunk/count/anti-join/
    string_agg pipeline in DuckDB, joined on the trimmed line STRING
    (Spark joins on xxhash64 of it — hash-collision-free at this scale,
    so the two forms agree row-for-row)."""
    from openie_spark.dataops.linededup import dedup_lines, token_chunk_lines

    docs = _read(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", token_chunk_lines("text", k=4).alias("lines")
    )
    out = dedup_lines(
        base, lines_col="lines", min_doc_freq=4, join_delim="\n"
    )
    return out.select(
        "doc_id",
        "clean_text",
        F.col("n_kept").cast("long").alias("n_kept"),
        F.col("n_dropped").cast("long").alias("n_dropped"),
    )


def q_token_pmi(spark, sf_dir):
    """Document-level token co-occurrence counts (dataops/cooccur.py) —
    the PMI substrate for co-occurrence KG edges. Pairs are generated
    IN-ARRAY per doc (aggregate fold over sorted distinct tokens — no
    self-join); the only shuffles are the two counting groupBys. Every
    output column is an integer count (associative — layout-proof); the
    float PMI itself is a derived convenience column excluded from the
    contract. Oracle: the per-doc distinct-token self-join formulation
    in DuckDB — an independent pair-generation strategy over the same
    normalization."""
    from openie_spark.dataops.cooccur import cooccurrence_counts

    docs = _read(spark, sf_dir, "documents")
    return cooccurrence_counts(docs).select(
        "token_a", "token_b", "pair_docs", "a_docs", "b_docs", "n_docs"
    )


def q_repetition(spark, sf_dir):
    """Gopher-style repetition signals (dataops/repetition.py): per-doc
    duplicate-line instances (over 4-token pseudo-lines) and the most
    frequent word 2-gram with its counts — the quality-filter substrate
    (Rae et al. 2021 A1.1). Computed as in-array sorted-run folds: NO
    explode, NO shuffle (plan-tested Exchange-free in pytest); ties on
    the top gram break to the smallest string on both engines. Oracle:
    explode + group-count + QUALIFY row_number in DuckDB — an
    independent counting strategy; compared columns are integers and the
    winning gram string only (the derived fractions are floats, pytest-
    pinned instead)."""
    from openie_spark.dataops.linededup import token_chunk_lines
    from openie_spark.dataops.repetition import repetition_signals

    docs = _read(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", "text", token_chunk_lines("text", k=4).alias("lines")
    )
    out = repetition_signals(base, lines_col="lines")
    return out.select(
        "doc_id",
        F.col("n_lines").cast("long").alias("n_lines"),
        F.col("n_dup_line_instances").cast("long").alias("n_dup_lines"),
        "top_ngram",
        F.col("top_ngram_count").cast("long").alias("top_ngram_count"),
        F.col("n_ngrams").cast("long").alias("n_ngrams"),
        F.col("n_chars_norm").cast("long").alias("n_chars_norm"),
    )


def q_top_terms(spark, sf_dir):
    """Per-doc distinctive terms (dataops/keyterms.py): top-3 by the
    integer ordering (tf desc, corpus doc-freq asc, term asc) after a
    50%-doc-frequency stopword cutoff — the deterministic core of
    TF-IDF keyword nomination (the float score itself is pytest-pinned,
    out of the hash contract). Two counting shuffles + term join + doc
    window. No df cutoff here — the test corpus vocabulary is tiny and
    Zipf, so a stopword cutoff empties the output (the cutoff path is
    pytest-pinned instead); 3 rows per doc exercise the three-key
    tie-break heavily. Oracle: the same counts and window in DuckDB —
    integer comparisons only, so ranks are engine-portable."""
    from openie_spark.dataops.keyterms import top_terms

    docs = _read(spark, sf_dir, "documents")
    return top_terms(docs, k=3)


def q_ngram_overlap(spark, sf_dir):
    """Exact n-gram decontamination (dataops/decontam.py): per-training-
    doc count of distinct 5-grams shared with the eval corpus (doc_id
    parity split, as in minhash_join) — the verbatim-benchmark-leakage
    guard minhash cannot provide. Eval n-gram set broadcasts; train is
    scanned once; output columns are all integers so the hash is
    layout- and engine-proof. n=5 at this scale flags 18/250 train docs
    (n=13 is the production default for real corpora)."""
    from openie_spark.dataops.decontam import ngram_overlap

    docs = _read(spark, sf_dir, "documents")
    return ngram_overlap(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        n=5,
    )


def q_k_hop(spark, sf_dir):
    """K-hop neighborhood extraction (graph_analytics.py): every node
    within 3 hops of supplier s1 on the undirected supplier-part supply
    graph, with its exact minimum hop distance — the subgraph-export /
    entity-context primitive a KG serves to RAG consumers. Nodes are
    string-namespaced ('s'||key vs 'p'||key) because supplier and part
    keys share an integer range. Frontier BFS: one frontier-vs-edges
    join + one visited anti-join per hop, edge table repartitioned once.
    Integer distances — layout- and engine-proof. Oracle: DuckDB
    recursive CTE (UNION dedup) + min(dist) rollup."""
    from openie_spark.graph_analytics import k_hop_neighborhood

    li = _read(spark, sf_dir, "lineitem")
    edges = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
    )
    return k_hop_neighborhood(edges, ["s1"], 3)


def q_triangles(spark, sf_dir):
    """Per-node triangle counting (graph_analytics.py) on the strong
    co-supply graph: suppliers joined when they co-supply >= 150 distinct
    parts (sf0.01: 355 edges / 100 nodes, 287 triangles over 64 nodes) —
    the clustering-coefficient numerator, a standard KG-density
    diagnostic. Degree-ordered orientation bounds wedge fan-out at
    O(sqrt(m)) per node, each triangle found exactly once; all counts
    integers. Oracle: DuckDB 3-way self-join with u<v<w."""
    from openie_spark.graph_analytics import triangle_count

    li = _read(spark, sf_dir, "lineitem")
    sp = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
    ).distinct()
    pairs = (
        sp.alias("a")
        .join(sp.alias("b"), "p")
        .filter(F.col("a.s") < F.col("b.s"))
        .groupBy(F.col("a.s").alias("src"), F.col("b.s").alias("dst"))
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= 150)
        .select("src", "dst")
    )
    return triangle_count(pairs)


def q_exact_k_sample(spark, sf_dir):
    """Exact-quota stratified sampling (dataops/sampling.py): exactly
    min(k, stratum size) docs per source (k=10 of 25, the quota binds in every stratum), the k smallest md5 buckets —
    the corpus-mixing primitive when the recipe demands exact counts,
    with the prefix property (k-sample ⊆ k'-sample). Runs the SCALE
    path (prefilter=True: Chernoff slice + verify + fallback) and must
    equal the plain window the oracle computes — the prefilter is pure
    optimization, invisible in the result."""
    from openie_spark.dataops.sampling import exact_k_sample

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return exact_k_sample(docs, k=10, salt="r7")


def q_chunk_tokens(spark, sf_dir):
    """Token-window chunking (dataops/chunking.py): 64-token windows,
    16-token overlap, provenance columns (chunk_id, start_token,
    n_tokens) — the context-length splitter between cleaning and
    tokenization. Pure JVM array expressions, narrow (no shuffle).
    Oracle: DuckDB range() starts + inclusive list slicing."""
    from openie_spark.dataops.chunking import chunk_tokens

    docs = _read(spark, sf_dir, "documents")
    return chunk_tokens(docs, size=64, overlap=16)


def q_upsample(spark, sf_dir):
    """Epoch-weighted corpus mixing (dataops/sampling.py upsample):
    repeat src0 3.2x (3 copies + a deterministic 20% get a 4th), halve
    src1, drop src2, keep the rest 1x — the data-recipe primitive,
    with a 0-based epoch column so copies shard into different
    training epochs. One explode(sequence), no shuffle, no RNG: the
    fractional-copy decision is the same md5 bucket as hash_sample, so
    the recipe composes with the nested-sample guarantees."""
    from openie_spark.dataops.sampling import upsample

    docs = _read(spark, sf_dir, "documents").select("doc_id", "source")
    return upsample(
        docs,
        weights={"src0": 3.2, "src1": 0.5, "src2": 0.0},
        salt="r7m",
    )


def q_pack_sequences(spark, sf_dir):
    """Sequence packing (dataops/packing.py): greedy in-order fill of
    256-token training windows with the 64/16 chunks of q_chunk_tokens
    — the padding-elimination step between chunking and tokenization.
    A running-remainder recurrence no window algebra expresses: the
    repo's documented Arrow applyInPandas tier, one shuffle on the
    shard key, linear scan per shard, integer state throughout (the
    DuckDB oracle replays the recurrence as a recursive CTE and must
    match bit-for-bit)."""
    from openie_spark.dataops.chunking import chunk_tokens
    from openie_spark.dataops.packing import pack_sequences

    docs = _read(spark, sf_dir, "documents")
    chunks = chunk_tokens(docs, size=64, overlap=16).select(
        (F.col("doc_id") % 4).alias("shard"),
        (F.col("doc_id") * 1000 + F.col("chunk_id")).alias("item_id"),
        "n_tokens",
    )
    return pack_sequences(chunks, capacity=256)


def q_approx_distinct(spark, sf_dir):
    """Integer HyperLogLog (dataops/cardinality.py): per-source
    approximate distinct-token counts — the vocabulary-size / corpus-
    diversity profile a mixing recipe reads, as a MERGEABLE sketch
    (plain (group, bucket, rho) register table, max-merge) instead of
    Spark's opaque HLL++ bytes. The estimate is one bigint floor
    division over a 2^21-scaled harmonic denominator, so the sketch
    AND the estimate are bit-identical on any engine/layout — an
    approximate operator under a full value-hash oracle."""
    from openie_spark.dataops.cardinality import approx_distinct
    from openie_spark.dataops.dedup import normalized_text

    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(
            F.array_remove(F.split(normalized_text("text"), " "), "")
        ).alias("tok"),
    )
    return approx_distinct(toks, ["source"], "tok")


def _synth_pages(docs, multi_host=False):
    """Deterministic crawl-page synthesis from the documents table —
    identical string expressions on both engines (the DuckDB oracles
    mirror this concat verbatim): per doc an absolute-with-tracking
    anchor, plus root-relative / path-relative / mailto anchors keyed
    on doc_id residues. ``multi_host`` spreads the pages over nine
    h{0..8}.example.org hosts (doc_id % 9) so host-level rollups have a
    real internal/external structure to aggregate."""
    did = F.col("doc_id").cast("string")
    mod7 = (F.col("doc_id") % 7).cast("string")
    html = F.concat(
        F.lit('<html><body><p>Doc</p>'
              '<a href="HTTPS://Example.COM:443/d/'),
        mod7,
        F.lit('?utm_source=feed&ref='),
        F.col("source"),
        F.lit('#top">Item <b>'),
        mod7,
        F.lit("</b></a>"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit('<a href="/rel/'), did, F.lit('">rel  link</a>')
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.lit('<a href="sub/page.html?a=1&utm_campaign=x&b=2">'
                  "relative</a>"),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.lit('<a href="mailto:a@b.c">mail</a>'),
        ).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    if multi_host:
        url = F.concat(
            F.lit("https://h"),
            (F.col("doc_id") % 9).cast("string"),
            F.lit(".example.org/sub/dir/page"),
            did,
            F.lit(".html"),
        )
    else:
        url = F.concat(
            F.lit("https://news.example.org/sub/dir/page"),
            did,
            F.lit(".html"),
        )
    return docs.select(url.alias("url"), html.alias("html"))


def q_link_graph(spark, sf_dir):
    """Web link-graph extraction (weblinks.py) over _synth_pages:
    link_graph extracts/resolves/normalizes — uppercase hosts lowered,
    :443 dropped, utm_* stripped, mailto dropped, relatives joined
    against the base directory. The DuckDB oracle re-implements every
    rule in RE2, so the URL-canonicalization contract is pinned
    cross-engine at full value equality."""
    from openie_spark.weblinks import link_graph

    return link_graph(_synth_pages(_read(spark, sf_dir, "documents")))


def q_anchor_dictionary(spark, sf_dir):
    """Anchor-text dictionary (weblinks.py) over the q_link_graph
    edges: the entity-linking prior P(target | surface form) as
    integer (n_links, n_total) with a deterministic per-anchor rank —
    one groupBy + one anchor window on top of the extraction. Oracle
    composes the link_graph SQL with the same groupBy/window."""
    from openie_spark.weblinks import anchor_dictionary, link_graph

    links = link_graph(_synth_pages(_read(spark, sf_dir, "documents")))
    return anchor_dictionary(links)


def q_clustering_coeff(spark, sf_dir):
    """Per-node local clustering coefficient (graph_analytics.py) on
    the same strong co-supply graph as q_triangles — (degree,
    triangles, wedges, coeff_micros) with coeff_micros = floor(1e6 *
    tri / C(deg,2)): all-integer, so the density diagnostic sits under
    the full hash contract. Triangle-free and degree-1 nodes included
    with coefficient 0."""
    from openie_spark.graph_analytics import clustering_coefficients

    li = _read(spark, sf_dir, "lineitem")
    sp = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
    ).distinct()
    pairs = (
        sp.alias("a")
        .join(sp.alias("b"), "p")
        .filter(F.col("a.s") < F.col("b.s"))
        .groupBy(F.col("a.s").alias("src"), F.col("b.s").alias("dst"))
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= 150)
        .select("src", "dst")
    )
    return clustering_coefficients(pairs)


def q_pagerank(spark, sf_dir):
    """Quantized integer PageRank (graph_analytics.py) on a directed
    supply graph: supplier->part edges from lineitem, plus the reversed
    part->supplier edge for every fifth part — cycles AND dangling
    sinks, the two things that make PageRank hard to oracle. All
    arithmetic is bigint micros (contribution = rank div out_degree,
    damping and the dangling share via integer div), so the fixpoint
    iterate is bit-identical on any engine and any partition layout —
    the only way an iterative float algorithm can live under this
    repo's value-hash contract. 5 synchronous iterations; oracle is the
    SAME recurrence unrolled as a DuckDB CTE chain (r0..r5) with `//`.
    """
    from openie_spark.graph_analytics import pagerank_micros

    li = _read(spark, sf_dir, "lineitem")
    fwd = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
    )
    rev = li.filter(F.col("l_partkey") % 5 == 0).select(
        F.concat(F.lit("p"), F.col("l_partkey")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
    )
    return pagerank_micros(fwd.unionByName(rev), iterations=5)


def q_pagerank_seeded(spark, sf_dir):
    """Personalized PageRank (graph_analytics.py, seeds=): teleport,
    dangling redistribution, and initial mass restricted to three seed
    suppliers — per-entity relevance over the same directed supply
    graph as q_pagerank, same integer quantization, oracled against
    the seeded variant of the unrolled CTE chain."""
    from openie_spark.graph_analytics import pagerank_micros

    li = _read(spark, sf_dir, "lineitem")
    fwd = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
    )
    rev = li.filter(F.col("l_partkey") % 5 == 0).select(
        F.concat(F.lit("p"), F.col("l_partkey")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
    )
    return pagerank_micros(
        fwd.unionByName(rev), iterations=5, seeds=["s1", "s7", "s13"]
    )


def q_assign_splits(spark, sf_dir):
    """Deterministic k-way split assignment (sampling.py
    assign_splits): every document labeled train/val/test by its md5
    bucket against cumulative thresholds — the reproducible
    randomSplit replacement. The driver row returns the per-(source,
    split) counts AND the exact per-split min/max doc ids, so the
    oracle pins the actual row assignment, not just proportions."""
    from openie_spark.dataops.sampling import assign_splits

    docs = _read(spark, sf_dir, "documents")
    out = assign_splits(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}, salt="r7"
    )
    return out.groupBy("source", "split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("doc_id").cast("long").alias("min_id"),
        F.max("doc_id").cast("long").alias("max_id"),
        F.sum("doc_id").cast("long").alias("sum_ids"),
    )


def q_ngram_counts(spark, sf_dir):
    """Corpus trigram table (decontam.py ngram_counts): (ngram, tf,
    df) with tf counting EVERY occurrence and df distinct docs,
    min_df=3 pruning the unique tail. Oracle replays the let-bound
    gram construction and the combined count/count-distinct in
    DuckDB."""
    from openie_spark.dataops.decontam import ngram_counts

    return ngram_counts(
        _read(spark, sf_dir, "documents"), n=3, min_df=3
    )


def q_media_decode(spark, sf_dir):
    """Multimodal plumbing under the FULL oracle: real PNG
    signature+IHDR bytes are synthesized JVM-side (unhex of a hex
    concat planting width = 16 + doc_id % 32, height = 8 + doc_id %
    16), decode_media's Arrow mapInPandas stage parses them BACK with
    the stdlib headers decoder, and every 10th doc is a truncated
    payload that must isolate into a deterministic decode_error. The
    oracle states the planted ground truth directly — Spark only
    matches if the binary round-trip (construct -> Arrow batch ->
    struct.unpack) is exact."""
    from openie_spark.dataops.multimodal import decode_media

    docs = _read(spark, sf_dir, "documents").select("doc_id")
    w = 16 + F.col("doc_id") % 32
    h = 8 + F.col("doc_id") % 16
    good = F.concat(
        F.lit("89504E470D0A1A0A0000000D49484452"),
        F.lpad(F.hex(w), 8, "0"),
        F.lpad(F.hex(h), 8, "0"),
        F.lit("0802000000DEADBEEF"),
    )
    bad = F.lit("89504E470D0A1A0A")  # signature only -> missing IHDR
    media = F.unhex(
        F.when(F.col("doc_id") % 10 == 0, bad).otherwise(good)
    )
    mdf = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image/png").alias("mime"),
        media.alias("media"),
    )
    return decode_media(mdf, decoder="headers").select(
        "media_id", "mime", "width", "height", "n_frames", "decode_error"
    )


def q_media_wav(spark, sf_dir):
    """The audio lane of the multimodal layer under the full oracle:
    RIFF/WAVE headers synthesized JVM-side with a little-endian
    byte-swap of the planted data size (n_frames = 100 + doc_id % 50,
    block_align 4), parsed back by the stdlib chunk walk; every 7th
    doc omits the data chunk and must isolate into the deterministic
    decode_error. Oracle states the planted ground truth."""
    from openie_spark.dataops.multimodal import decode_media

    docs = _read(spark, sf_dir, "documents").select("doc_id")
    nf = 100 + F.col("doc_id") % 50
    hx = F.lpad(F.hex(nf * 4), 8, "0")
    # little-endian byte swap of the 32-bit data-chunk size
    sz_le = F.concat(
        F.substring(hx, 7, 2), F.substring(hx, 5, 2),
        F.substring(hx, 3, 2), F.substring(hx, 1, 2),
    )
    fmt_chunk = (
        "666D7420" "10000000"      # 'fmt ' + size 16
        "0100" "0200" "44AC0000"   # pcm, stereo, 44100 Hz
        "10B10200" "0400" "1000"   # byte rate, block_align 4, 16 bit
    )
    good = F.concat(
        F.lit("52494646" "00000000" "57415645" + fmt_chunk + "64617461"),
        sz_le,
    )
    bad = F.lit("52494646" "00000000" "57415645" + fmt_chunk)
    media = F.unhex(
        F.when(F.col("doc_id") % 7 == 0, bad).otherwise(good)
    )
    mdf = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio/wav").alias("mime"),
        media.alias("media"),
    )
    return decode_media(mdf, decoder="headers").select(
        "media_id", "mime", "width", "height", "n_frames", "decode_error"
    )


def q_media_gif_jpeg(spark, sf_dir):
    """The remaining two container branches under the full oracle:
    even docs carry a GIF89a logical screen descriptor (16-bit
    LITTLE-endian dims, byte-swapped at construction), odd docs a
    minimal JPEG SOI + SOF0 frame header (16-bit BIG-endian dims) —
    the decoder's marker walk and both endianness paths must agree
    with the planted ground truth. With media_decode (PNG) and
    media_wav, all four stdlib container parsers are oracle-pinned."""
    from openie_spark.dataops.multimodal import decode_media

    docs = _read(spark, sf_dir, "documents").select("doc_id")
    w = 20 + F.col("doc_id") % 40
    h = 10 + F.col("doc_id") % 20
    wx = F.lpad(F.hex(w), 4, "0")
    hx = F.lpad(F.hex(h), 4, "0")
    gif = F.concat(
        F.lit("474946383961"),  # GIF89a
        F.substring(wx, 3, 2), F.substring(wx, 1, 2),  # width LE
        F.substring(hx, 3, 2), F.substring(hx, 1, 2),  # height LE
    )
    jpeg = F.concat(
        F.lit("FFD8FFC0" "0011" "08"),  # SOI, SOF0, len 17, 8-bit
        hx, wx,                         # height, width BIG-endian
    )
    is_gif = F.col("doc_id") % 2 == 0
    mdf = docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(is_gif, F.lit("image/gif"))
        .otherwise(F.lit("image/jpeg"))
        .alias("mime"),
        F.unhex(F.when(is_gif, gif).otherwise(jpeg)).alias("media"),
    )
    return decode_media(mdf, decoder="headers").select(
        "media_id", "mime", "width", "height", "n_frames", "decode_error"
    )


def q_events_pivot(spark, sf_dir):
    """Pivot: per-user event-type count matrix via Spark's
    groupBy().pivot() with an EXPLICIT value list — the wide
    feature-table operator (one pass, map-side partial agg per cell;
    an implicit pivot would add a distinct-values job and make the
    schema data-dependent, which the fixed list avoids by design).
    Oracle: conditional aggregation in DuckDB (the engine-portable
    spelling of the same thing)."""
    ev = _read(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
            for t in types
        ],
    )


def q_events_unpivot(spark, sf_dir):
    """Unpivot/melt — the inverse wide-to-long operator (Spark
    DataFrame.unpivot, the 3.4+ native melt): the q_events_pivot
    matrix melted back to (user_id, event_type, n), zero cells
    dropped. The oracle is simply the original long-form groupBy count
    in DuckDB — pinning the pivot/unpivot ROUNDTRIP, not a replay of
    either side."""
    wide = q_events_pivot(spark, sf_dir)
    types = ["click", "error", "purchase", "signup", "view"]
    long = wide.unpivot(
        ["user_id"],
        [f"n_{t}" for t in types],
        "event_type",
        "n",
    )
    return (
        long.filter(F.col("n") > 0)
        .select(
            "user_id",
            F.expr("substring(event_type, 3)").alias("event_type"),
            F.col("n").cast("long").alias("n"),
        )
    )


def q_host_similarity(spark, sf_dir):
    """Host-by-outlink set similarity (dataops/setsim.py
    set_jaccard_join) over the multi-host link graph: which hosts link
    to the same places — the mirror/affiliate detector. Exact integer
    jaccard micros; oracle recomputes sets relationally in DuckDB."""
    from openie_spark.dataops.setsim import set_jaccard_join
    from openie_spark.weblinks import host_of, link_graph

    links = link_graph(
        _synth_pages(_read(spark, sf_dir, "documents"), multi_host=True)
    )
    rel = links.select(
        host_of(F.col("src_url")).alias("host"), F.col("dst_url")
    )
    return set_jaccard_join(
        rel, "host", "dst_url", threshold_micros=10_000
    )


def q_k_core(spark, sf_dir):
    """5-core of the strong co-supply graph (graph_analytics.py
    k_core): iterative peel to fixpoint (4 rounds at this sf). Oracle
    unrolls EIGHT peel rounds as a materialized CTE chain — extra
    rounds past the fixpoint are no-ops, so the unroll equals the
    fixpoint whenever the data converges within the margin (it does:
    4 < 8; a non-convergent unroll would hash-mismatch, not silently
    pass)."""
    from openie_spark.graph_analytics import k_core

    li = _read(spark, sf_dir, "lineitem")
    sp = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
    ).distinct()
    pairs = (
        sp.alias("a")
        .join(sp.alias("b"), "p")
        .filter(F.col("a.s") < F.col("b.s"))
        .groupBy(F.col("a.s").alias("src"), F.col("b.s").alias("dst"))
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= 150)
        .select("src", "dst")
    )
    return k_core(pairs, k=5)


def q_url_policy(spark, sf_dir):
    """Crawl-policy filtering (weblinks.py url_filter_predicate) over
    the multi-host link graph's destinations: https-only, example.com
    blocked by host, one host's /rel/ section blocked by prefix —
    surviving distinct urls with their inlink counts. The predicate is
    a single pushable boolean column (plan-pinned StartsWith pushdown
    in pytest); oracle mirrors the rules as LIKE/equality in DuckDB."""
    from openie_spark.weblinks import link_graph, url_filter_predicate

    links = link_graph(
        _synth_pages(_read(spark, sf_dir, "documents"), multi_host=True)
    )
    pred = url_filter_predicate(
        url_col="dst_url",
        deny_hosts=("example.com",),
        deny_prefixes=("https://h3.example.org/rel/",),
    )
    return (
        links.filter(pred)
        .groupBy(F.col("dst_url").alias("url"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_links"))
    )


def q_digraph_stats(spark, sf_dir):
    """One-row integer digraph summary (graph_analytics.py
    digraph_stats) of the q_pagerank supply graph — reciprocity (the
    %5 reversed edges are exactly the reciprocal set), degree maxima
    and moments, assortativity sufficient statistics. Oracle computes
    the same aggregates relationally in DuckDB."""
    from openie_spark.graph_analytics import digraph_stats

    li = _read(spark, sf_dir, "lineitem")
    fwd = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
    )
    rev = li.filter(F.col("l_partkey") % 5 == 0).select(
        F.concat(F.lit("p"), F.col("l_partkey")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
    )
    return digraph_stats(fwd.unionByName(rev))


def q_inverted_index(spark, sf_dir):
    """Inverted index (dataops/invindex.py) over documents: (term,
    doc_id, positions, tf) postings, df-pruned to terms in [2, 90%] of
    docs — positions gathered shuffle-free inside array expressions.
    Oracle replays tokenization, per-term position extraction, and the
    df window in DuckDB list functions."""
    from openie_spark.dataops.invindex import inverted_index

    return inverted_index(
        _read(spark, sf_dir, "documents"), min_df=2, max_df_frac=0.9
    )


def q_domain_authority(spark, sf_dir):
    """Domain authority: weighted integer PageRank over the HOST-level
    link graph (weblinks host_of + graph_analytics pagerank_micros
    weight_col=) — edge weight = number of links between the host pair,
    the real crawl-ranking composition (crawl -> link graph -> host
    rollup -> authority). Oracle: the weighted CTE chain over the
    host-aggregated link-graph SQL."""
    from openie_spark.graph_analytics import pagerank_micros
    from openie_spark.weblinks import host_of, link_graph

    links = link_graph(
        _synth_pages(_read(spark, sf_dir, "documents"), multi_host=True)
    )
    edges = links.groupBy(
        host_of(F.col("src_url")).alias("src"),
        host_of(F.col("dst_url")).alias("dst"),
    ).agg(F.count(F.lit(1)).cast("long").alias("w"))
    return pagerank_micros(edges, iterations=5, weight_col="w")


def q_pagerank_weighted(spark, sf_dir):
    """Weighted integer PageRank (graph_analytics.py weight_col=): the
    same supply graph as q_pagerank but with edge weight = lineitem
    pair multiplicity (link frequency), so a source's mass splits
    proportionally — contribution = (rank * w) div sum_w. Oracle: the
    weighted variant of the unrolled CTE chain."""
    from openie_spark.graph_analytics import pagerank_micros

    li = _read(spark, sf_dir, "lineitem")
    fwd = li.groupBy(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
    ).agg(F.count(F.lit(1)).cast("long").alias("w"))
    rev = (
        li.filter(F.col("l_partkey") % 5 == 0)
        .groupBy(
            F.concat(F.lit("p"), F.col("l_partkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    return pagerank_micros(
        fwd.unionByName(rev), iterations=5, weight_col="w"
    )


def q_bipartite(spark, sf_dir):
    """Capped bipartite projection (graph_analytics.py
    bipartite_project): customer co-purchase network from orders x
    lineitem (customers sharing >= 8 distinct parts), hub parts capped
    at degree 40 before pairing — the named operator behind every
    co-occurrence graph in the repo. Oracle mirrors dedup, degree cap,
    pairing, and HAVING in DuckDB."""
    from openie_spark.graph_analytics import bipartite_project

    li = _read(spark, sf_dir, "lineitem")
    orders = _read(spark, sf_dir, "orders")
    rel = li.join(
        orders.select(
            F.col("o_orderkey").alias("l_orderkey"),
            F.col("o_custkey").alias("cust"),
        ),
        "l_orderkey",
    ).select("cust", F.col("l_partkey").alias("part"))
    return bipartite_project(
        rel, "cust", "part", min_co=8, max_right_degree=40
    )


def q_rank_calibration(spark, sf_dir):
    """Per-event-type rank calibration table (dataops/calibrate.py)
    over events.value: integer percent-rank per DISTINCT quantized
    value — the scalable form (window over distinct scores, not rows).
    Oracle mirrors the cumulative-count ranking in DuckDB."""
    from openie_spark.dataops.calibrate import rank_calibration

    return rank_calibration(
        _read(spark, sf_dir, "events"), "value", ["event_type"]
    )


def q_top_paths(spark, sf_dir):
    """Top-20 session paths (dataops/sessions.py top_paths): sessions
    from the standard 1800s gap sessionize, path = first 5 event types
    '>'-joined in (ts, event_id) order, deterministic (n desc, path)
    top-k. Oracle replays gaps-and-islands + ordered string_agg in
    DuckDB."""
    from openie_spark.dataops.sessions import top_paths

    return top_paths(
        _read(spark, sf_dir, "events"), path_len=5, k=20
    )


def q_containment(spark, sf_dir):
    """Asymmetric containment join (dataops/dedup.py
    containment_pairs): pairs where either side's shingle set is >= 80%
    inside the intersection — the quote/excerpt/contamination relation
    Jaccard misses. Same DF-capped posting-list candidates as
    ngram_jaccard, integer micros both directions; oracle recomputes
    the full pipeline over DuckDB list functions. The corpus is
    augmented with deterministic 12-token EXCERPT docs (every 11th
    doc, id + 100000) — true containment-1.0 relationships that
    Jaccard would score near zero, synthesized identically on both
    engines."""
    from openie_spark.dataops.dedup import containment_pairs, normalized_text

    docs = _read(spark, sf_dir, "documents")
    toks = F.split(normalized_text("text"), " ")
    excerpts = docs.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        "source",
        F.concat_ws(" ", F.slice(toks, 1, 12)).alias("text"),
    )
    base = docs.select("doc_id", "source", "text").unionByName(excerpts)
    return containment_pairs(
        base, shingle_n=3, threshold_micros=800_000, blocking_col="source"
    )


def q_crawl_frontier(spark, sf_dir):
    """Next-wave crawl frontier (weblinks.py) over the multi-host link
    graph: unseen destinations (seen = every crawled page, i.e. every
    distinct src_url), deduped with inlink-count priority, capped at 3
    per host with a deterministic (n_inlinks desc, url) order. Oracle
    composes the link-graph SQL with the same anti-join + QUALIFY
    window."""
    from openie_spark.weblinks import crawl_frontier, link_graph

    links = link_graph(
        _synth_pages(_read(spark, sf_dir, "documents"), multi_host=True)
    )
    seen = links.select(F.col("src_url").alias("url"))
    return crawl_frontier(links, seen, per_host_cap=3)


def q_histogram(spark, sf_dir):
    """Integer-binned value histogram (dataops/histogram.py) of
    events.value over [0, 500) x 20 bins, grouped by event_type —
    per-row micros quantization + one integer multiply/div per row, so
    a boundary value can never mis-bin by an ulp on either engine.
    Under/overflow bins kept; totals reconcile to count(*)."""
    from openie_spark.dataops.histogram import histogram

    return histogram(
        _read(spark, sf_dir, "events"), "value", 0.0, 500.0, 20,
        ["event_type"],
    )


def q_transitions(spark, sf_dir):
    """Event-transition (Markov bigram) matrix (dataops/sessions.py)
    over the events table: consecutive event-type pairs within each
    user's (ts, event_id)-ordered stream, counted corpus-wide. Oracle:
    the identical lag window in DuckDB. 25 integer cells at 5 event
    types."""
    from openie_spark.dataops.sessions import transition_matrix

    return transition_matrix(_read(spark, sf_dir, "events"))


def q_corpus_cube(spark, sf_dir):
    """Corpus composition CUBE over (lang, source)
    (dataops/corpusstats.py): all subtotal levels in one Expand +
    one aggregation pass — docs/tokens/chars per cell, with
    grouping_id disambiguating subtotal rows from genuine NULL dims.
    Oracle: DuckDB GROUP BY CUBE with GROUPING(), which emits the
    identical bit encoding. All bigint."""
    from openie_spark.dataops.corpusstats import corpus_cube

    return corpus_cube(_read(spark, sf_dir, "documents"))


def q_funnel(spark, sf_dir):
    """First-touch funnel signup -> view -> click -> purchase
    (dataops/funnel.py) over a deterministic 1-in-7 event subsample
    (so progress actually varies). Spark runs the one-shuffle greedy
    array fold; the oracle recomputes the provably-equivalent iterated
    conditional minimum (one min-join per step) — an independent
    second implementation, not a replay. Integer outputs."""
    from openie_spark.dataops.funnel import funnel

    ev = _read(spark, sf_dir, "events").filter(F.col("event_id") % 7 == 0)
    return funnel(ev, ["signup", "view", "click", "purchase"])


def q_activity_curve(spark, sf_dir):
    """Daily active/new/returning/cumulative distinct users
    (dataops/retention.py) over the events table — the first-seen
    decomposition that replaces the quadratic expanding
    count(DISTINCT): cum_keys is a running sum of first-appearances,
    oracled against DuckDB computing the same curve from the SAME
    decomposition expressed relationally (min(day) per user + window
    sum). All integer counts."""
    from openie_spark.dataops.retention import activity_curve

    return activity_curve(_read(spark, sf_dir, "events"))


def q_heavy_hitters(spark, sf_dir):
    """Count-min heavy hitters (dataops/frequency.py): per event_type,
    every user's sketch estimate next to the exact count — the one-pass
    hot-key report. The sketch registers are md5-lane integer sums
    (mergeable, engine-portable) and the estimate is a min of bigints,
    so the APPROXIMATE operator sits under the full value-hash oracle:
    DuckDB replays the identical lanes and matches to the last digit
    (est >= exact visible per row — real collisions at 150 keys x 512
    columns)."""
    from openie_spark.dataops.frequency import heavy_hitters

    ev = _read(spark, sf_dir, "events").select(
        "event_type", F.col("user_id").cast("string").alias("uid")
    )
    return heavy_hitters(ev, ["event_type"], "uid")


def q_host_rollup(spark, sf_dir):
    """Per-host web-graph rollup (weblinks.py) over the multi-host
    _synth_pages link graph: pages published, outbound split
    (total/internal/distinct external hosts), inbound links and
    distinct external referrer hosts — all bigint counts. Oracle
    composes the multi-host link-graph SQL with the same two
    aggregations + full outer join."""
    from openie_spark.weblinks import host_rollup, link_graph

    pages = _synth_pages(_read(spark, sf_dir, "documents"), multi_host=True)
    return host_rollup(link_graph(pages))


def q_hits(spark, sf_dir):
    """Quantized integer HITS (graph_analytics.py) on the same directed
    supply graph as q_pagerank (cycles + pure sources + pure sinks —
    the shapes that separate hubs from authorities). All arithmetic is
    bigint micros with an L1 rescale via a precomputed floor-division
    scalar, so the iterative eigen-sweep is bit-identical on any engine
    and any partition layout. 4 sweeps; oracle is the same recurrence
    unrolled as a DuckDB CTE chain (a1/h1 .. a4/h4) with `//`."""
    from openie_spark.graph_analytics import hits_micros

    li = _read(spark, sf_dir, "lineitem")
    fwd = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
    )
    rev = li.filter(F.col("l_partkey") % 5 == 0).select(
        F.concat(F.lit("p"), F.col("l_partkey")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
    )
    return hits_micros(fwd.unionByName(rev), iterations=4)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """All 80 declared queries. ORDER IS A COVERAGE POLICY, not
    aesthetics (VERDICT r7 item 4): the r7 driver validated exactly the
    FIRST 50 entries, so entries are ordered least-recently-
    driver-checked first — (1) the 30 queries the driver has never
    checked (all locally oracle-verified every round), then (2) the
    queries whose implementation this round touched (the events-family
    TZ fix and the optimization-round restructures), then (3) the
    remainder, every one locally green under both the UTC and
    America/New_York sweep legs. No query's semantics, name, or oracle
    SQL changed — only dict insertion order."""
    return {
        # --- (1) never driver-checked as of CORRECTNESS_r07 ---
        "link_graph": q_link_graph,
        "anchor_dictionary": q_anchor_dictionary,
        "pagerank_seeded": q_pagerank_seeded,
        "hits": q_hits,
        "host_rollup": q_host_rollup,
        "heavy_hitters": q_heavy_hitters,
        "activity_curve": q_activity_curve,
        "funnel": q_funnel,
        "corpus_cube": q_corpus_cube,
        "transitions": q_transitions,
        "histogram": q_histogram,
        "crawl_frontier": q_crawl_frontier,
        "containment": q_containment,
        "top_paths": q_top_paths,
        "rank_calibration": q_rank_calibration,
        "bipartite": q_bipartite,
        "pagerank_weighted": q_pagerank_weighted,
        "domain_authority": q_domain_authority,
        "inverted_index": q_inverted_index,
        "digraph_stats": q_digraph_stats,
        "url_policy": q_url_policy,
        "k_core": q_k_core,
        "host_similarity": q_host_similarity,
        "events_pivot": q_events_pivot,
        "events_unpivot": q_events_unpivot,
        "media_decode": q_media_decode,
        "media_wav": q_media_wav,
        "media_gif_jpeg": q_media_gif_jpeg,
        "ngram_counts": q_ngram_counts,
        "assign_splits": q_assign_splits,
        # --- (2) touched this round (r8): the TZ fix + optimizations ---
        "events_sessions": q_events_sessions,
        "events_intervals": q_events_intervals,
        "events_rolling": q_events_rolling,
        "events_asof": q_events_asof,
        "pagerank": q_pagerank,
        "k_hop": q_k_hop,
        "triangles": q_triangles,
        "clustering_coeff": q_clustering_coeff,
        "token_pmi": q_token_pmi,
        "top_terms": q_top_terms,
        "ngram_overlap": q_ngram_overlap,
        "chunk_tokens": q_chunk_tokens,
        "pack_sequences": q_pack_sequences,
        "minhash_dedup": q_minhash_dedup,
        "minhash_join": q_minhash_join,
        "neardup_components": q_neardup_components,
        "line_dedup": q_line_dedup,
        # KG pipeline flagships (parse + rule extraction run live;
        # oracled against reference-derived goldens)
        "kg_triples": q_kg_triples,
        "kg_nodes": q_kg_nodes,
        "kg_edges": q_kg_edges,
        # --- (3) driver-checked green in r7, untouched this round ---
        "kg_merge_apply": q_kg_merge_apply,
        "kg_merge_fixpoint_nodes": q_kg_merge_fixpoint_nodes,
        "kg_merge_fixpoint_edges": q_kg_merge_fixpoint_edges,
        "kg_clustering": q_kg_clustering,
        "node_aggregate": q_node_aggregate,
        "edge_aggregate": q_edge_aggregate,
        "degrees": q_degrees,
        "topk_window": q_topk_window,
        "merge_candidates": q_merge_candidates,
        "set_ops": q_set_ops,
        "exact_dedup": q_exact_dedup,
        "token_count": q_token_count,
        "text_quality": q_text_quality,
        "lang_id": q_lang_id,
        "fingerprint": q_fingerprint,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "ann_ivf_batch": q_ann_ivf_batch,
        "simhash_dedup": q_simhash_dedup,
        "ngram_jaccard": q_ngram_jaccard,
        "embedding_neardup": q_embedding_neardup,
        "events_top_event": q_events_top_event,
        "events_rollup": q_events_rollup,
        "events_quantiles": q_events_quantiles,
        "hash_sample": q_hash_sample,
        "repetition": q_repetition,
        "exact_k_sample": q_exact_k_sample,
        "approx_distinct": q_approx_distinct,
        "upsample": q_upsample,
    }


def _pagerank_oracle(
    iterations: int = 5, damping: int = 85, seeds=None,
    weighted: bool = False, e_sql: str = None,
) -> str:
    """The pagerank_micros recurrence unrolled as a DuckDB CTE chain
    (r0 -> r{iterations}); every operation is bigint `//`, the exact
    mirror of Spark's `div`, so the two engines cannot disagree by even
    one micro. Built by a loop because the driver compares a static SQL
    string — the chain IS the independent second implementation (DuckDB
    executes each iteration as its own joins/aggregates; nothing is
    shared with the Spark loop). ``seeds`` restricts the teleport set
    (init, teleport, dangling redistribution) to the listed nodes —
    personalized PageRank, same quantization."""
    if seeds is None:
        tset_where = ""
    else:
        in_list = ", ".join(f"'{s}'" for s in seeds)
        tset_where = f" WHERE node IN ({in_list})"
    if e_sql is not None:
        # arbitrary weighted edge source (src, dst, w) — MATERIALIZED:
        # the chain references e once per iteration, and the source may
        # itself be a heavy composition (the link-graph SQL)
        e_cte = f"""
        WITH e AS MATERIALIZED (
          SELECT src, dst, sum(w)::BIGINT AS w FROM ({e_sql})
          WHERE src <> dst GROUP BY 1, 2
        ),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        deg AS (SELECT src, sum(w)::BIGINT AS deg FROM e GROUP BY src),"""
        contrib_expr = "sum((r.rank_micros * e.w) // dg.deg)::BIGINT"
    elif weighted:
        # edge weight = lineitem pair multiplicity (mirrors the Spark
        # query's groupBy-count edge build); mass splits as
        # (rank * w) // sum_w — same integer quantization
        e_cte = """
        WITH e AS (
          SELECT src, dst, sum(w)::BIGINT AS w FROM (
            SELECT 's' || l_suppkey AS src, 'p' || l_partkey AS dst,
                   count(*)::BIGINT AS w
            FROM lineitem GROUP BY 1, 2
            UNION ALL
            SELECT 'p' || l_partkey, 's' || l_suppkey,
                   count(*)::BIGINT
            FROM lineitem WHERE l_partkey % 5 = 0 GROUP BY 1, 2
          ) WHERE src <> dst GROUP BY 1, 2
        ),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        deg AS (SELECT src, sum(w)::BIGINT AS deg FROM e GROUP BY src),"""
        contrib_expr = "sum((r.rank_micros * e.w) // dg.deg)::BIGINT"
    else:
        e_cte = """
        WITH e AS (
          SELECT DISTINCT src, dst FROM (
            SELECT 's' || l_suppkey AS src, 'p' || l_partkey AS dst
            FROM lineitem
            UNION ALL
            SELECT 'p' || l_partkey, 's' || l_suppkey
            FROM lineitem WHERE l_partkey % 5 = 0
          ) WHERE src <> dst
        ),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        deg AS (SELECT src, count(*)::BIGINT AS deg FROM e GROUP BY src),"""
        contrib_expr = "sum(r.rank_micros // dg.deg)::BIGINT"
    parts = [
        e_cte
        + f"""
        tset AS (SELECT node FROM nodes{tset_where}),
        tn AS (SELECT count(*)::BIGINT AS t FROM tset),
        r0 AS (
          SELECT n.node,
                 (CASE WHEN ts.node IS NOT NULL THEN 1000000 // t
                       ELSE 0 END)::BIGINT AS rank_micros
          FROM nodes n CROSS JOIN tn
          LEFT JOIN tset ts ON ts.node = n.node
        )"""
    ]
    for i in range(iterations):
        parts.append(
            f""",
        d{i} AS (
          SELECT coalesce(sum(r.rank_micros), 0)::BIGINT AS dang
          FROM r{i} r LEFT JOIN deg ON r.node = deg.src
          WHERE deg.src IS NULL
        ),
        c{i} AS (
          SELECT e.dst AS node,
                 {contrib_expr} AS in_sum
          FROM r{i} r
          JOIN deg dg ON r.node = dg.src
          JOIN e ON e.src = r.node
          GROUP BY e.dst
        ),
        r{i + 1} AS (
          SELECT nd.node,
                 ((CASE WHEN ts.node IS NOT NULL
                        THEN (({100 - damping}) * 1000000 // 100) // tn.t
                        ELSE 0 END)
                  + ({damping} * (coalesce(c.in_sum, 0)
                     + (CASE WHEN ts.node IS NOT NULL
                             THEN d.dang // tn.t ELSE 0 END)))
                    // 100)::BIGINT AS rank_micros
          FROM nodes nd CROSS JOIN tn CROSS JOIN d{i} d
          LEFT JOIN c{i} c ON c.node = nd.node
          LEFT JOIN tset ts ON ts.node = nd.node
        )"""
        )
    parts.append(
        f"""
        SELECT node, rank_micros FROM r{iterations}"""
    )
    return "".join(parts)


def _hits_oracle(iterations: int = 4) -> str:
    """The hits_micros recurrence unrolled as a DuckDB CTE chain
    (h0 -> a{i}/h{i}); every operation is a bigint sum or `//` — the
    exact mirror of Spark's `div` — with the L1 rescale denominator
    ``greatest(1, total // 1e6)`` computed as a 1-row CTE per sweep and
    CROSS JOINed in (mirroring Spark's scalar broadcast). The chain
    CTEs are MATERIALIZED: each is referenced twice (denominator +
    rescale), and DuckDB's default inlining would re-evaluate the whole
    prefix 2^sweeps times. Built by a loop because the driver compares
    a static SQL string; the chain IS the independent second
    implementation."""
    parts = [
        """
        WITH e AS MATERIALIZED (
          SELECT DISTINCT src, dst FROM (
            SELECT 's' || l_suppkey AS src, 'p' || l_partkey AS dst
            FROM lineitem
            UNION ALL
            SELECT 'p' || l_partkey, 's' || l_suppkey
            FROM lineitem WHERE l_partkey % 5 = 0
          ) WHERE src <> dst
        ),
        nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
        h0 AS MATERIALIZED (SELECT node, 1000000::BIGINT AS s FROM nodes)"""
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f""",
        a{i}r AS MATERIALIZED (
          SELECT e.dst AS node, sum(h.s)::BIGINT AS raw
          FROM h{i - 1} h JOIN e ON e.src = h.node
          GROUP BY e.dst
        ),
        a{i}d AS MATERIALIZED (
          SELECT greatest(1, coalesce(sum(raw), 0) // 1000000)::BIGINT
                 AS den
          FROM a{i}r
        ),
        a{i} AS MATERIALIZED (
          SELECT n.node, (coalesce(r.raw, 0) // d.den)::BIGINT AS s
          FROM nodes n CROSS JOIN a{i}d d
          LEFT JOIN a{i}r r ON r.node = n.node
        ),
        h{i}r AS MATERIALIZED (
          SELECT e.src AS node, sum(a.s)::BIGINT AS raw
          FROM a{i} a JOIN e ON e.dst = a.node
          GROUP BY e.src
        ),
        h{i}d AS MATERIALIZED (
          SELECT greatest(1, coalesce(sum(raw), 0) // 1000000)::BIGINT
                 AS den
          FROM h{i}r
        ),
        h{i} AS MATERIALIZED (
          SELECT n.node, (coalesce(r.raw, 0) // d.den)::BIGINT AS s
          FROM nodes n CROSS JOIN h{i}d d
          LEFT JOIN h{i}r r ON r.node = n.node
        )"""
        )
    parts.append(
        f"""
        SELECT a.node, a.s AS auth_micros, h.s AS hub_micros
        FROM a{iterations} a JOIN h{iterations} h ON a.node = h.node"""
    )
    return "".join(parts)


def _k_core_oracle(k: int = 5, rounds: int = 8) -> str:
    """The k_core peel unrolled as a materialized CTE chain over the
    same co-supply pair graph: per round, degree count over the
    symmetrized edge set, then keep only edges whose BOTH endpoints
    have degree >= k. Rounds past the fixpoint are no-ops."""
    parts = [
        """
        WITH sp AS MATERIALIZED (
          SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
        ),
        pairs AS MATERIALIZED (
          SELECT a.s AS u, b.s AS v
          FROM sp a JOIN sp b ON a.p = b.p AND a.s < b.s
          GROUP BY 1, 2 HAVING count(*) >= 150
        ),
        e0 AS MATERIALIZED (
          SELECT u AS a, v AS b FROM pairs
          UNION SELECT v, u FROM pairs
        )"""
    ]
    for i in range(rounds):
        parts.append(
            f""",
        d{i} AS MATERIALIZED (
          SELECT a AS node, count(*)::BIGINT AS degree
          FROM e{i} GROUP BY 1
        ),
        keep{i} AS MATERIALIZED (
          SELECT node FROM d{i} WHERE degree >= {k}
        ),
        e{i + 1} AS MATERIALIZED (
          SELECT e.a, e.b FROM e{i} e
          JOIN keep{i} ka ON e.a = ka.node
          JOIN keep{i} kb ON e.b = kb.node
        )"""
        )
    parts.append(
        f"""
        SELECT a AS node, count(*)::BIGINT AS degree
        FROM e{rounds} GROUP BY 1"""
    )
    return "".join(parts)


def _duck_normalize_url(e: str) -> str:
    """weblinks.normalize_url re-expressed in RE2 for DuckDB over the
    SQL expression ``e`` — same steps, same order: fragment strip,
    lowercase scheme://host with default-port drop, tracking-param
    removal, delimiter tidy-up."""
    n0 = f"regexp_replace({e}, '#.*', '')"
    prefix = (
        f"regexp_extract({n0}, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*')"
    )
    low = (
        "regexp_replace(regexp_replace("
        f"lower({prefix}), '^(http://[^/:?]*):80$', '\\1'),"
        " '^(https://[^/:?]*):443$', '\\1')"
    )
    joined = f"({low} || substr({n0}, length({prefix}) + 1))"
    no_track = (
        f"regexp_replace({joined},"
        " '([?&])(utm_[^&=#]*|fbclid|gclid|msclkid)=[^&]*', '\\1', 'g')"
    )
    return (
        "regexp_replace(regexp_replace(regexp_replace("
        f"{no_track}, '&&+', '&', 'g'), '\\?&', '?'), '[?&]$', '')"
    )


def _link_graph_oracle(multi_host: bool = False) -> str:
    """The link_graph RE2 re-implementation over _synth_pages — kept a
    helper so anchor_dictionary and host_rollup compose on top of the
    same SQL. ``multi_host`` mirrors _synth_pages(multi_host=True)."""
    if multi_host:
        url_expr = (
            "'https://h' || (doc_id % 9) || '.example.org/sub/dir/page'"
            " || doc_id || '.html'"
        )
    else:
        url_expr = (
            "'https://news.example.org/sub/dir/page' || doc_id || '.html'"
        )
    return f"""
            WITH pages AS (
              SELECT {url_expr} AS url,
                     '<html><body><p>Doc</p><a href="HTTPS://Example.COM:443/d/'
                     || (doc_id % 7) || '?utm_source=feed&ref=' || source
                     || '#top">Item <b>' || (doc_id % 7) || '</b></a>'
                     || CASE WHEN doc_id % 3 = 0
                        THEN '<a href="/rel/' || doc_id || '">rel  link</a>'
                        ELSE '' END
                     || CASE WHEN doc_id % 4 = 0
                        THEN '<a href="sub/page.html?a=1&utm_campaign=x&b=2">relative</a>'
                        ELSE '' END
                     || CASE WHEN doc_id % 5 = 0
                        THEN '<a href="mailto:a@b.c">mail</a>'
                        ELSE '' END
                     || '</body></html>' AS html
              FROM documents
            ),
            arrs AS (
              SELECT url,
                     regexp_extract_all(html,
                       '(?is)<a\\s[^>]*?href\\s*=\\s*"([^"]*)"[^>]*>(.*?)</a>', 1) AS hs,
                     regexp_extract_all(html,
                       '(?is)<a\\s[^>]*?href\\s*=\\s*"([^"]*)"[^>]*>(.*?)</a>', 2) AS ts
              FROM pages
            ),
            anchors AS (
              SELECT url, unnest(generate_series(1, len(hs))) AS i, hs, ts
              FROM arrs
            ),
            resolved AS (
              SELECT url,
                     (i - 1)::BIGINT AS link_no,
                     hs[i] AS href,
                     trim(regexp_replace(regexp_replace(ts[i],
                          '<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g'))
                       AS anchor_text,
                     CASE
                       WHEN trim(hs[i]) = '' THEN NULL
                       WHEN trim(hs[i]) LIKE '#%' THEN NULL
                       WHEN regexp_matches(trim(hs[i]),
                            '^(mailto:|javascript:|tel:|data:)') THEN NULL
                       WHEN regexp_matches(trim(hs[i]),
                            '^[hH][tT][tT][pP][sS]?://') THEN trim(hs[i])
                       WHEN trim(hs[i]) LIKE '//%' THEN
                         regexp_extract(url,
                           '^([a-zA-Z][a-zA-Z0-9+.-]*):', 1)
                         || ':' || trim(hs[i])
                       WHEN trim(hs[i]) LIKE '/%' THEN
                         regexp_extract(url,
                           '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1)
                         || trim(hs[i])
                       ELSE
                         regexp_extract(url,
                           '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1)
                         || CASE WHEN regexp_extract(
                                regexp_replace(url, '[?#].*', ''),
                                '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*(/.*/)',
                                1) <> ''
                            THEN regexp_extract(
                                regexp_replace(url, '[?#].*', ''),
                                '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*(/.*/)',
                                1)
                            ELSE '/' END
                         || trim(hs[i])
                     END AS dst_raw
              FROM anchors
            )
            SELECT {_duck_normalize_url('url')} AS src_url,
                   link_no, href,
                   {_duck_normalize_url('dst_raw')} AS dst_url,
                   anchor_text
            FROM resolved
            WHERE dst_raw IS NOT NULL
    """


def oracle_sql() -> dict[str, str]:
    en = ",".join(f"'{m}'" for m in EN_MARKERS)
    es = ",".join(f"'{m}'" for m in ES_MARKERS)
    ru = ",".join(f"'{m}'" for m in RU_MARKERS)
    de = ",".join(f"'{m}'" for m in DE_MARKERS)
    norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    toks = f"string_split({norm}, ' ')"
    hits = lambda lst: f"len(list_filter({toks}, t -> t IN ({lst})))"
    # reference-derived goldens (tools/make_goldens.py; 500-page corpus =
    # the documents count at the driver's correctness sf)
    G_TRIPLES = "'/root/repo/goldens/p500/triples.parquet'"
    # second-implementation goldens (tools/make_dataops_goldens.py; dir is
    # named for the sf it was generated from — the driver's sf0.01)
    G_SIMHASH = "'/root/repo/goldens/dataops_sf01/simhash_sigs.parquet'"
    G_ANN_BUCKETS = "'/root/repo/goldens/dataops_sf01/ann_buckets.parquet'"
    G_ANN_PROBES = "'/root/repo/goldens/dataops_sf01/ann_probe_buckets.parquet'"
    # reference-derived goldens for the FULL merge fixpoint on the
    # confluent fixture corpus (tools/make_merge_goldens.py)
    G_MFX_NODES = "'/root/repo/goldens/merge_fixture/nodes_merged.parquet'"
    G_MFX_EDGES = "'/root/repo/goldens/merge_fixture/edges_merged.parquet'"
    # shared CTE list: the EXACT near-dup pair set (all-pairs shingle
    # Jaccard ≥ 0.6 via a shared-shingle candidate join) — used verbatim by
    # BOTH minhash_dedup and neardup_components so the closure oracle is
    # provably over the same pair set the pair oracle pins (a drift between
    # two copies would silently break that premise).
    neardup_pair_ctes = f"""
            base AS (
              SELECT doc_id, {toks} AS tk FROM documents
            ),
            sh AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       generate_series(0, greatest(len(tk) - 3, 0)),
                       i -> array_to_string(tk[i + 1 : i + 3], ' ')
                     )) AS shs
              FROM base WHERE len(tk) > 0
            ),
            expl AS (SELECT doc_id, unnest(shs) AS s FROM sh),
            cand AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM expl a JOIN expl b ON a.s = b.s AND a.doc_id < b.doc_id
            ),
            jac AS (
              SELECT c.id_a, c.id_b,
                     len(list_intersect(sa.shs, sb.shs))::DOUBLE
                       / (len(sa.shs) + len(sb.shs) - len(list_intersect(sa.shs, sb.shs)))
                       AS jaccard
              FROM cand c
              JOIN sh sa ON sa.doc_id = c.id_a
              JOIN sh sb ON sb.doc_id = c.id_b
            ),
            dup AS (SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= 0.6)
    """
    # shared CTE: A2 edge aggregation over the golden triples. Grouped by
    # (src, dst, edge_key) ONLY — two surface relations sharing lemmas
    # (inflections) share one edge. A non-literal edge always has a
    # non-literal edge_key, so downstream literal filters test edge_key.
    kg_edges_cte = f"""
        WITH t AS (SELECT * FROM {G_TRIPLES}),
        e AS (
          SELECT left_arg_lemmas AS src, right_arg_lemmas AS dst,
                 CASE WHEN relation IN ('_is_a_', '_relates_to_') THEN relation
                      ELSE relation_lemmas || ' + ' || right_deprel END AS edge_key,
                 count(*)::BIGINT AS weight
          FROM t GROUP BY 1, 2, 3
        )
    """
    return {
        "kg_triples": f"""
            SELECT url, sent_id, left_arg, relation, right_arg, right_deprel
            FROM {G_TRIPLES}
        """,
        "kg_nodes": f"""
            {kg_edges_cte},
            occ AS (
              SELECT left_arg_lemmas AS lemma_key FROM t
              UNION ALL
              SELECT right_arg_lemmas FROM t
            ),
            nodes AS (SELECT lemma_key, count(*)::BIGINT AS weight FROM occ GROUP BY lemma_key),
            outd AS (SELECT src AS lemma_key, count(*)::BIGINT AS degree_out,
                            sum(weight)::BIGINT AS out_weight FROM e GROUP BY src),
            ind AS (SELECT dst AS lemma_key, count(*)::BIGINT AS degree_in,
                           sum(weight)::BIGINT AS in_weight FROM e GROUP BY dst)
            SELECT n.lemma_key, n.weight,
                   coalesce(i.degree_in, 0)::BIGINT AS degree_in,
                   coalesce(o.degree_out, 0)::BIGINT AS degree_out,
                   coalesce(i.in_weight, 0)::BIGINT AS in_weight,
                   coalesce(o.out_weight, 0)::BIGINT AS out_weight
            FROM nodes n
            LEFT JOIN outd o USING (lemma_key)
            LEFT JOIN ind i USING (lemma_key)
        """,
        "kg_edges": f"""
            {kg_edges_cte}
            SELECT src, dst, edge_key, weight FROM e
        """,
        "kg_merge_apply": f"""
            {kg_edges_cte},
            occ AS (
              SELECT left_arg_lemmas AS lemma_key FROM t
              UNION ALL
              SELECT right_arg_lemmas FROM t
            ),
            nodes AS (SELECT lemma_key, count(*)::BIGINT AS weight FROM occ GROUP BY lemma_key),
            cand AS (
              SELECT DISTINCT e.src AS anchor, e.edge_key, e.dst AS cand, n.weight AS cand_weight
              FROM e JOIN nodes n ON n.lemma_key = e.dst
              WHERE e.edge_key NOT IN ('_is_a_', '_relates_to_')
            ),
            ranked AS (
              SELECT *,
                     count(*) OVER (PARTITION BY anchor, edge_key) AS n,
                     row_number() OVER (PARTITION BY anchor, edge_key
                                        ORDER BY cand_weight DESC, cand DESC) AS pos
              FROM cand
            ),
            mains AS (
              SELECT anchor, edge_key, cand AS main, cand_weight AS main_weight
              FROM ranked WHERE n >= 2 AND pos = 1
            ),
            others AS (
              SELECT anchor, edge_key, cand AS other FROM ranked WHERE n >= 2 AND pos > 1
            ),
            pairs AS (
              SELECT o.other, m.main, m.main_weight
              FROM others o JOIN mains m USING (anchor, edge_key)
            ),
            best AS (
              SELECT DISTINCT other, main FROM (
                SELECT *, row_number() OVER (PARTITION BY other
                                             ORDER BY main_weight DESC, main DESC) AS r
                FROM pairs
              ) WHERE r = 1
            ),
            mapping AS (
              SELECT other, main FROM best
              WHERE main NOT IN (SELECT other FROM best)
            ),
            rewritten AS (
              SELECT coalesce(ms.main, e.src) AS src,
                     coalesce(md.main, e.dst) AS dst,
                     e.edge_key, e.weight
              FROM e
              LEFT JOIN mapping ms ON e.src = ms.other
              LEFT JOIN mapping md ON e.dst = md.other
            )
            SELECT src, dst, edge_key, sum(weight)::BIGINT AS weight
            FROM rewritten GROUP BY 1, 2, 3
        """,
        "kg_merge_fixpoint_nodes": f"""
            SELECT lemma_key, weight, degree_in, degree_out, in_weight, out_weight
            FROM {G_MFX_NODES}
        """,
        "kg_merge_fixpoint_edges": f"""
            SELECT src, dst, edge_key, weight FROM {G_MFX_EDGES}
        """,
        "kg_clustering": """
            SELECT url, cluster_rep
            FROM '/root/repo/goldens/clustering/assignments.parquet'
        """,
        "ann_ivf_topk": """
            SELECT vec_id, cosine_e4
            FROM '/root/repo/goldens/ivf/expected_topk.parquet'
        """,
        "ann_ivf_batch": """
            SELECT probe_id, vec_id, cosine_e4
            FROM '/root/repo/goldens/ivf/expected_batch_topk.parquet'
        """,
        "ngram_jaccard": f"""
            WITH base AS (
              SELECT doc_id, source, {toks} AS tk FROM documents
            ),
            sh AS (
              SELECT doc_id, source,
                     list_distinct(list_transform(
                       generate_series(0, greatest(len(tk) - 3, 0)),
                       i -> array_to_string(tk[i + 1 : i + 3], ' ')
                     )) AS shs
              FROM base
            ),
            expl AS (SELECT doc_id, source, unnest(shs) AS s FROM sh),
            df_ok AS (SELECT s FROM expl GROUP BY s HAVING count(*) <= 1000),
            posts AS (SELECT e.doc_id, e.source, e.s FROM expl e JOIN df_ok USING (s)),
            cand AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM posts a JOIN posts b ON a.s = b.s AND a.source = b.source
                            AND a.doc_id < b.doc_id
            ),
            jac AS (
              SELECT c.id_a, c.id_b,
                     len(list_intersect(sa.shs, sb.shs))::DOUBLE
                       / (len(sa.shs) + len(sb.shs) - len(list_intersect(sa.shs, sb.shs)))
                       AS jaccard
              FROM cand c
              JOIN sh sa ON sa.doc_id = c.id_a
              JOIN sh sb ON sb.doc_id = c.id_b
            )
            SELECT id_a, id_b, round(jaccard * 1e6)::BIGINT AS jaccard_micros
            FROM jac WHERE jaccard >= 0.5
        """,
        "node_aggregate": """
            SELECT o_custkey AS node_key,
                   count(*) AS weight,
                   sum(round(o_totalprice * 1e6)::BIGINT)::BIGINT AS total_micros,
                   strftime(min(o_orderdate), '%Y-%m-%d') AS first_seen
            FROM orders GROUP BY o_custkey
        """,
        "edge_aggregate": """
            SELECT l_suppkey AS src, l_partkey AS dst,
                   count(*) AS weight,
                   sum(round(l_quantity * 1e6)::BIGINT)::BIGINT AS qty_micros
            FROM lineitem GROUP BY l_suppkey, l_partkey
        """,
        "degrees": """
            SELECT l_suppkey AS node_key,
                   count(DISTINCT l_partkey) AS degree_out,
                   count(*) AS out_weight
            FROM lineitem GROUP BY l_suppkey
        """,
        "topk_window": """
            SELECT * FROM (
              SELECT o_custkey AS node_key, count(*) AS weight,
                     row_number() OVER (ORDER BY count(*) DESC, o_custkey) AS rank
              FROM orders GROUP BY o_custkey
            ) WHERE rank <= 100
        """,
        "merge_candidates": """
            SELECT anchor, count(*) AS n_cands,
                   list_aggregate(list_sort(list(cand)), 'string_agg', ',') AS cand_list
            FROM (SELECT DISTINCT l_partkey AS anchor, l_suppkey AS cand FROM lineitem)
            GROUP BY anchor HAVING count(*) >= 2
        """,
        "set_ops": """
            SELECT o_custkey AS node_key,
                   list_aggregate(list_sort(list(DISTINCT o_orderpriority)), 'string_agg', '|') AS priority_set,
                   list_aggregate(list_sort(list(DISTINCT o_orderstatus)), 'string_agg', '|') AS status_set
            FROM orders GROUP BY o_custkey
        """,
        "exact_dedup": f"""
            SELECT md5({norm}) AS content_hash,
                   min(doc_id) AS keep_id,
                   count(*) AS n_copies
            FROM documents GROUP BY 1
        """,
        "token_count": r"""
            SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
            FROM documents
        """,
        "text_quality": f"""
            WITH feats AS (
              SELECT doc_id,
                     length(text) AS n_chars,
                     CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
                     len(regexp_extract_all(text, '[\\.,;:!\\?]')) AS n_punct,
                     len(regexp_extract_all(text, '[0-9]')) AS n_digit,
                     {hits(en)} AS n_stop
              FROM documents
            ), ratios AS (
              SELECT doc_id, n_tokens,
                     CASE WHEN n_chars > 0 THEN n_punct::DOUBLE / n_chars ELSE 0 END AS punct_ratio,
                     CASE WHEN n_chars > 0 THEN n_digit::DOUBLE / n_chars ELSE 0 END AS digit_ratio,
                     CASE WHEN n_tokens > 0 THEN n_stop::DOUBLE / n_tokens ELSE 0 END AS stopword_ratio
              FROM feats
            )
            SELECT doc_id, n_tokens,
                   round((least(n_tokens / 100.0, 1.0)
                        + greatest(0.0, 1.0 - 2.0 * punct_ratio - 2.0 * digit_ratio)
                        + least(stopword_ratio * 4.0, 1.0)) / 3.0 * 1e6)::BIGINT AS quality_micros
            FROM ratios
        """,
        "lang_id": f"""
            WITH h AS (
              SELECT doc_id,
                     {hits(en)} AS hits_en, {hits(es)} AS hits_es,
                     {hits(ru)} AS hits_ru, {hits(de)} AS hits_de
              FROM documents
            )
            SELECT doc_id,
                   CASE WHEN greatest(hits_en, hits_es, hits_ru, hits_de) = 0 THEN 'und'
                        WHEN hits_en = greatest(hits_en, hits_es, hits_ru, hits_de) THEN 'en'
                        WHEN hits_es = greatest(hits_en, hits_es, hits_ru, hits_de) THEN 'es'
                        WHEN hits_ru = greatest(hits_en, hits_es, hits_ru, hits_de) THEN 'ru'
                        ELSE 'de' END AS lang_pred,
                   hits_en, hits_es, hits_ru, hits_de
            FROM h
        """,
        "fingerprint": f"""
            SELECT doc_id, md5({norm}) AS fingerprint FROM documents
        """,
        "embedding_neardup": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.embedding, b.embedding) * 1e4)::BIGINT AS cosine_e4
            FROM embeddings a
            JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.35
        """,
        "ann_cosine_topk": """
            SELECT vec_id,
                   round(list_cosine_similarity(embedding,
                       (SELECT embedding FROM embeddings WHERE vec_id = 0)) * 1e4)::BIGINT AS cosine_e4
            FROM embeddings
            ORDER BY list_cosine_similarity(embedding,
                       (SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC, vec_id
            LIMIT 20
        """,
        "events_top_event": """
            SELECT user_id, event_id, round(value * 1e6)::BIGINT AS value_micros
            FROM (
              SELECT user_id, event_id, value,
                     row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
              FROM events
            ) WHERE rn = 1
        """,
        "events_rollup": """
            SELECT event_type, count(*) AS n_events,
                   count(DISTINCT user_id) AS n_users,
                   sum(round(value * 1e6)::BIGINT)::BIGINT AS value_micros
            FROM events GROUP BY event_type
        """,
        # - events_sessions: gaps-and-islands sessionization, identical
        #   deterministic definition (lag + running break-sum, ties on
        #   event_id, microsecond arithmetic) in DuckDB window SQL. The
        #   value sum is per-row bigint micros on BOTH sides (integer
        #   addition is associative — the hash cannot drift with
        #   partition layout, unlike round(sum(double))).
        "events_sessions": """
            WITH s AS (
              SELECT user_id, event_id, ts, value, epoch_us(ts) AS us,
                     CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                            OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                               > 1800 * 1000000
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            s2 AS (
              SELECT *, sum(brk) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING
              ) AS session_seq FROM s
            )
            SELECT user_id, session_seq, count(*) AS n_events,
                   min(us) AS start_us, max(us) AS end_us,
                   sum(round(value * 1e6)::BIGINT)::BIGINT AS value_micros
            FROM s2 GROUP BY user_id, session_seq
        """,
        # - events_intervals: the literal point-in-interval BETWEEN join
        #   DuckDB can afford at this scale — Spark computes the same
        #   pair set via the binned (user_id, bin) equi-join, which is
        #   the shape that survives 100 TB. Exact timestamp arithmetic
        #   on both sides; half-open upper bound.
        "events_intervals": """
            WITH ivl AS (
              SELECT event_id AS interval_id, user_id, ts AS start_ts,
                     ts + INTERVAL 4 HOUR AS end_ts
              FROM events WHERE event_type = 'error'
            )
            SELECT e.event_id, ivl.interval_id,
                   (epoch_us(e.ts) - epoch_us(ivl.start_ts))::BIGINT AS gap_us
            FROM events e JOIN ivl
              ON e.user_id = ivl.user_id
             AND e.ts >= ivl.start_ts AND e.ts < ivl.end_ts
            WHERE e.event_type <> 'error'
        """,
        # - events_rolling: the identical ANSI RANGE frame (integer
        #   microseconds, both ends inclusive, equal-ts rows are peers)
        #   in DuckDB window SQL; the windowed sum is per-row bigint
        #   micros on both sides so it cannot drift with layout.
        "events_rolling": """
            SELECT event_id,
                   count(*) OVER w AS n_1h,
                   (sum(round(value * 1e6)::BIGINT) OVER w)::BIGINT
                     AS value_1h_micros
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        """,
        # - events_quantiles: DuckDB's NATIVE percentile_disc — an
        #   independent implementation of the same order statistic
        #   (smallest element with cume_dist >= q). Dyadic q keeps the
        #   rank decision float-exact on both engines; the output is an
        #   existing element, so micros-rounding it is deterministic.
        "events_quantiles": """
            SELECT event_type, count(value) AS n,
              round(percentile_disc(0.25) WITHIN GROUP (ORDER BY value)
                    * 1e6)::BIGINT AS p25_micros,
              round(percentile_disc(0.5)  WITHIN GROUP (ORDER BY value)
                    * 1e6)::BIGINT AS p50_micros,
              round(percentile_disc(0.75) WITHIN GROUP (ORDER BY value)
                    * 1e6)::BIGINT AS p75_micros
            FROM events GROUP BY event_type
        """,
        # - line_dedup: the identical chunk → doc-freq → anti-join →
        #   ordered string_agg pipeline in DuckDB, matching lines by the
        #   trimmed STRING where Spark matches by xxhash64(trim(line)) —
        #   equal results absent a 64-bit collision (none at this scale).
        #   Zipped unnest keeps (pos, line) aligned; all-boilerplate docs
        #   drop on both sides.
        "line_dedup": """
            WITH toks AS (
              SELECT doc_id, string_split(text, ' ') AS t FROM documents
            ),
            lines AS (
              SELECT doc_id,
                     unnest([array_to_string(t[(i*4+1):(i*4+4)], ' ')
                             FOR i IN range(CAST(ceil(len(t)/4.0) AS BIGINT))]) AS line,
                     unnest(range(CAST(ceil(len(t)/4.0) AS BIGINT))) AS pos
              FROM toks WHERE len(t) > 0
            ),
            bp AS (
              SELECT trim(line) AS key FROM lines
              GROUP BY 1 HAVING count(DISTINCT doc_id) >= 4
            ),
            kept AS (
              SELECT l.doc_id, l.pos, l.line
              FROM lines l ANTI JOIN bp b ON trim(l.line) = b.key
            ),
            tot AS (SELECT doc_id, count(*) AS n_total FROM lines GROUP BY 1)
            SELECT k.doc_id,
                   string_agg(k.line, chr(10) ORDER BY k.pos) AS clean_text,
                   count(*)::BIGINT AS n_kept,
                   (any_value(t.n_total) - count(*))::BIGINT AS n_dropped
            FROM kept k JOIN tot t USING (doc_id)
            GROUP BY k.doc_id
        """,
        # - token_pmi: independent pair generation — DuckDB self-joins the
        #   exploded (doc, distinct token) relation where Spark folds pairs
        #   in-array; identical normalization; every compared column is an
        #   integer count, so the hash cannot drift with layout.
        "token_pmi": f"""
            WITH toks AS (
              SELECT doc_id,
                     list_sort(list_distinct(list_filter(
                       string_split({norm}, ' '), x -> x <> ''))) AS t
              FROM documents
            ),
            l AS (SELECT doc_id, unnest(t) AS token FROM toks),
            pc AS (
              SELECT a.token AS token_a, b.token AS token_b,
                     count(*)::BIGINT AS pair_docs
              FROM l a JOIN l b
                ON a.doc_id = b.doc_id AND a.token < b.token
              GROUP BY 1, 2
            ),
            tc AS (SELECT token, count(*)::BIGINT AS docs FROM l GROUP BY 1),
            nd AS (SELECT count(*)::BIGINT AS n_docs FROM documents)
            SELECT pc.token_a, pc.token_b, pc.pair_docs,
                   ta.docs AS a_docs, tb.docs AS b_docs, nd.n_docs
            FROM pc
            JOIN tc ta ON pc.token_a = ta.token
            JOIN tc tb ON pc.token_b = tb.token
            CROSS JOIN nd
        """,
        # - repetition: independent counting strategy — DuckDB explodes
        #   2-grams and group-counts with a QUALIFY row_number tie-break
        #   (count desc, gram asc) where Spark folds sorted runs in-array;
        #   pseudo-lines are the same 4-token chunks as line_dedup;
        #   integer/string columns only.
        "repetition": f"""
            WITH toksraw AS (
              SELECT doc_id, string_split(text, ' ') AS t FROM documents
            ),
            lines AS (
              SELECT doc_id,
                     unnest([trim(array_to_string(t[(i*4+1):(i*4+4)], ' '))
                             FOR i IN range(CAST(ceil(len(t)/4.0) AS BIGINT))]) AS line
              FROM toksraw WHERE len(t) > 0
            ),
            lstats AS (
              SELECT doc_id, count(*)::BIGINT AS n_lines,
                     (count(*) - count(DISTINCT line))::BIGINT AS n_dup_lines
              FROM lines GROUP BY 1
            ),
            toks AS (
              SELECT doc_id,
                     list_filter(string_split({norm}, ' '), x -> x <> '') AS t,
                     len({norm})::BIGINT AS n_chars_norm
              FROM documents
            ),
            grams AS (
              SELECT doc_id, unnest([t[i] || ' ' || t[i+1]
                                     FOR i IN range(1, len(t))]) AS g
              FROM toks WHERE len(t) >= 2
            ),
            gc AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2),
            top AS (
              SELECT doc_id, g AS top_ngram, c::BIGINT AS top_ngram_count
              FROM gc
              QUALIFY row_number() OVER (
                PARTITION BY doc_id ORDER BY c DESC, g ASC) = 1
            ),
            ng AS (SELECT doc_id, count(*)::BIGINT AS n_ngrams
                   FROM grams GROUP BY 1)
            SELECT ls.doc_id, ls.n_lines, ls.n_dup_lines,
                   coalesce(top.top_ngram, '') AS top_ngram,
                   coalesce(top.top_ngram_count, 0)::BIGINT AS top_ngram_count,
                   coalesce(ng.n_ngrams, 0)::BIGINT AS n_ngrams,
                   tk.n_chars_norm
            FROM lstats ls
            JOIN toks tk USING (doc_id)
            LEFT JOIN top USING (doc_id)
            LEFT JOIN ng USING (doc_id)
        """,
        # - top_terms: identical integer ranking in DuckDB window SQL —
        #   (tf desc, df asc, term asc) compares only integers/strings,
        #   so row_number agrees across engines.
        "top_terms": f"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split({norm}, ' '), x -> x <> '') AS t
              FROM documents
            ),
            l AS (SELECT doc_id, unnest(t) AS term FROM toks),
            tc AS (SELECT doc_id, term, count(*)::BIGINT AS tf
                   FROM l GROUP BY 1, 2),
            dfq AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS term_df
                    FROM l GROUP BY 1),
            nd AS (SELECT count(*)::BIGINT AS n FROM documents)
            SELECT doc_id, term, tf, term_df, rank FROM (
              SELECT tc.doc_id, tc.term, tc.tf, dfq.term_df,
                     row_number() OVER (
                       PARTITION BY tc.doc_id
                       ORDER BY tc.tf DESC, dfq.term_df ASC, tc.term ASC
                     )::BIGINT AS rank
              FROM tc JOIN dfq USING (term)
            ) WHERE rank <= 3
        """,
        # - ngram_overlap: the same 5-gram sets derived independently
        #   with DuckDB list ops (generate_series + inclusive slicing vs
        #   Spark's sequence + slice); counts are integers so the join +
        #   group agrees bit-for-bit. generate_series(1, len-4) is empty
        #   when the doc is shorter than n, matching the Spark guard.
        "ngram_overlap": f"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split({norm}, ' '), x -> x <> '') AS t
              FROM documents
            ),
            grams AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       generate_series(1, greatest(len(t) - 4, 0)),
                       i -> array_to_string(t[i:i+4], ' '))) AS g
              FROM toks
            ),
            tr AS (SELECT doc_id, len(g)::BIGINT AS n_ngrams,
                          unnest(g) AS ngram
                   FROM grams WHERE doc_id % 2 = 0),
            ev AS (SELECT DISTINCT unnest(g) AS ngram
                   FROM grams WHERE doc_id % 2 = 1)
            SELECT tr.doc_id, n_ngrams, count(*)::BIGINT AS matched
            FROM tr JOIN ev USING (ngram)
            GROUP BY 1, 2
        """,
        # - k_hop: recursive CTE with UNION dedup — rows are (node, dist)
        #   pairs so the recursion is bounded by nodes x k; min() rollup
        #   recovers BFS distances. Integer distances, string node ids.
        "k_hop": """
            WITH RECURSIVE e AS (
              SELECT DISTINCT 's' || l_suppkey AS s, 'p' || l_partkey AS d
              FROM lineitem
              UNION
              SELECT DISTINCT 'p' || l_partkey, 's' || l_suppkey
              FROM lineitem
            ),
            walk(node, dist) AS (
              SELECT 's1', 0
              UNION
              SELECT e.d, walk.dist + 1
              FROM walk JOIN e ON e.s = walk.node
              WHERE walk.dist < 3
            )
            SELECT node, min(dist)::BIGINT AS dist
            FROM walk GROUP BY node
        """,
        # - triangles: same co-supply graph, then the textbook 3-way
        #   self-join with u<v<w (each triangle once), per-node unnest +
        #   count. Pure integers end to end.
        "triangles": """
            WITH sp AS (
              SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
            ),
            pairs AS (
              SELECT a.s AS u, b.s AS v
              FROM sp a JOIN sp b ON a.p = b.p AND a.s < b.s
              GROUP BY 1, 2 HAVING count(*) >= 150
            ),
            tri AS (
              SELECT e1.u AS a, e1.v AS b, e2.v AS c
              FROM pairs e1
              JOIN pairs e2 ON e1.v = e2.u
              JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v
            )
            SELECT node, count(*)::BIGINT AS triangles
            FROM (SELECT unnest([a, b, c]) AS node FROM tri)
            GROUP BY node
        """,
        # - link_graph: identical page synthesis by string concat, then
        #   an independent RE2 re-implementation of anchor extraction
        #   (regexp_extract_all groups 1/2 aligned by position),
        #   resolution CASE ladder, and _duck_normalize_url. Pins the
        #   URL-canonicalization contract cross-engine.
        "link_graph": _link_graph_oracle(),
        # - anchor_dictionary: the same link-graph SQL as a derived
        #   table, then the identical case-folded groupBy + per-anchor
        #   window (total + rank with the dst tiebreak) in DuckDB.
        "anchor_dictionary": f"""
            SELECT anchor, dst_url, n_links,
                   sum(n_links) OVER (PARTITION BY anchor)::BIGINT
                     AS n_total,
                   row_number() OVER (
                     PARTITION BY anchor
                     ORDER BY n_links DESC, dst_url
                   )::BIGINT AS rank
            FROM (
              SELECT trim(lower(anchor_text)) AS anchor, dst_url,
                     count(*)::BIGINT AS n_links
              FROM ({_link_graph_oracle()}) lg
              WHERE trim(lower(anchor_text)) <> ''
              GROUP BY 1, 2
            )
        """,
        # - clustering_coeff: the triangles oracle composed with a
        #   UNION ALL degree count over the same canonical pair set;
        #   wedges and coeff_micros via integer `//` exactly like the
        #   operator's `div`.
        "clustering_coeff": """
            WITH sp AS (
              SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
            ),
            pairs AS (
              SELECT a.s AS u, b.s AS v
              FROM sp a JOIN sp b ON a.p = b.p AND a.s < b.s
              GROUP BY 1, 2 HAVING count(*) >= 150
            ),
            deg AS (
              SELECT node, count(*)::BIGINT AS degree FROM (
                SELECT u AS node FROM pairs
                UNION ALL SELECT v FROM pairs
              ) GROUP BY node
            ),
            tri AS (
              SELECT e1.u AS a, e1.v AS b, e2.v AS c
              FROM pairs e1
              JOIN pairs e2 ON e1.v = e2.u
              JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v
            ),
            tcount AS (
              SELECT node, count(*)::BIGINT AS triangles
              FROM (SELECT unnest([a, b, c]) AS node FROM tri)
              GROUP BY node
            )
            SELECT d.node, d.degree,
                   coalesce(t.triangles, 0)::BIGINT AS triangles,
                   (d.degree * (d.degree - 1) // 2)::BIGINT AS wedges,
                   (CASE WHEN d.degree >= 2
                         THEN (1000000 * coalesce(t.triangles, 0))
                              // (d.degree * (d.degree - 1) // 2)
                         ELSE 0 END)::BIGINT AS coeff_micros
            FROM deg d LEFT JOIN tcount t ON d.node = t.node
        """,
        # - pagerank: the integer-micros recurrence unrolled to a CTE
        #   chain — DuckDB runs each iteration as its own join+agg over
        #   the same edge/degree tables with `//`; Spark runs a loop
        #   with `div`. Both floor on non-negative bigints, so the hash
        #   is exact by construction, not by luck of the layout.
        "pagerank": _pagerank_oracle(iterations=5, damping=85),
        # - pagerank_seeded: the same chain with the teleport set
        #   restricted to the three seed suppliers (init, teleport,
        #   dangling share all seed-only) — personalized PageRank.
        "pagerank_seeded": _pagerank_oracle(
            iterations=5, damping=85, seeds=["s1", "s7", "s13"]
        ),
        # - pagerank_weighted: the same chain with weighted edges —
        #   w = pair multiplicity, deg = sum(w), contribution =
        #   (rank * w) // deg.
        "pagerank_weighted": _pagerank_oracle(
            iterations=5, damping=85, weighted=True
        ),
        # - domain_authority: the weighted chain over the host-level
        #   aggregation of the multi-host link-graph SQL.
        "domain_authority": _pagerank_oracle(
            iterations=5,
            damping=85,
            e_sql=f"""
              SELECT regexp_extract(src_url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*)', 1) AS src,
                     regexp_extract(dst_url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*)', 1) AS dst,
                     1 AS w
              FROM ({_link_graph_oracle(multi_host=True)}) lg
            """,
        ),
        # - media_decode: the planted ground truth — Spark matches
        #   only if construct -> Arrow -> struct.unpack round-trips.
        "media_decode": """
            SELECT doc_id AS media_id,
                   'image/png' AS mime,
                   CASE WHEN doc_id % 10 = 0 THEN NULL
                        ELSE (16 + doc_id % 32) END::INT AS width,
                   CASE WHEN doc_id % 10 = 0 THEN NULL
                        ELSE (8 + doc_id % 16) END::INT AS height,
                   CASE WHEN doc_id % 10 = 0 THEN NULL
                        ELSE 1 END::INT AS n_frames,
                   CASE WHEN doc_id % 10 = 0
                        THEN 'ValueError: PNG missing IHDR'
                   END AS decode_error
            FROM documents
        """,
        # - assign_splits: the identical md5-bucket decision with
        #   threshold literals from the operator's own _hex_threshold
        #   (sorted-name order: test 0.1 | train 0.9 | val rest).
        "assign_splits": f"""
            WITH labeled AS (
              SELECT source, doc_id,
                     CASE WHEN substr(md5('r7' || doc_id::VARCHAR), 1, 8)
                               < '{_sampling_thr(0.1)}' THEN 'test'
                          WHEN substr(md5('r7' || doc_id::VARCHAR), 1, 8)
                               < '{_sampling_thr(0.9)}' THEN 'train'
                          ELSE 'val' END AS split
              FROM documents
            )
            SELECT source, split, count(*)::BIGINT AS n_docs,
                   min(doc_id)::BIGINT AS min_id,
                   max(doc_id)::BIGINT AS max_id,
                   sum(doc_id)::BIGINT AS sum_ids
            FROM labeled GROUP BY 1, 2
        """,
        # - ngram_counts: non-distinct trigram explode, one grouped
        #   count + count-distinct, min_df prune — same tokenization.
        "ngram_counts": f"""
            WITH base AS (
              SELECT doc_id,
                     list_filter({toks}, x -> x <> '') AS tk
              FROM documents
            ),
            grams AS (
              SELECT doc_id,
                     unnest(CASE WHEN len(tk) >= 3
                       THEN list_transform(
                         generate_series(1, len(tk) - 2),
                         i -> array_to_string(tk[i : i + 2], ' ')
                       )
                       ELSE [] END) AS ngram
              FROM base
            )
            SELECT ngram, count(*)::BIGINT AS tf,
                   count(DISTINCT doc_id)::BIGINT AS df
            FROM grams GROUP BY 1 HAVING count(DISTINCT doc_id) >= 3
        """,
        # - media_gif_jpeg: planted dims; both endianness paths of
        #   the header parsers must round-trip.
        "media_gif_jpeg": """
            SELECT doc_id AS media_id,
                   CASE WHEN doc_id % 2 = 0 THEN 'image/gif'
                        ELSE 'image/jpeg' END AS mime,
                   (20 + doc_id % 40)::INT AS width,
                   (10 + doc_id % 20)::INT AS height,
                   1::INT AS n_frames,
                   NULL AS decode_error
            FROM documents
        """,
        # - media_wav: planted WAV ground truth (frames from the
        #   little-endian data size; chunk-walk parse must agree).
        "media_wav": """
            SELECT doc_id AS media_id,
                   'audio/wav' AS mime,
                   CASE WHEN doc_id % 7 = 0 THEN NULL
                        ELSE 0 END::INT AS width,
                   CASE WHEN doc_id % 7 = 0 THEN NULL
                        ELSE 0 END::INT AS height,
                   CASE WHEN doc_id % 7 = 0 THEN NULL
                        ELSE (100 + doc_id % 50) END::INT AS n_frames,
                   CASE WHEN doc_id % 7 = 0
                        THEN 'ValueError: WAV missing fmt/data chunk'
                   END AS decode_error
            FROM documents
        """,
        # - events_unpivot: the original long-form counts — melting
        #   the pivot must reproduce them exactly (roundtrip pin).
        "events_unpivot": """
            SELECT user_id, event_type, count(*)::BIGINT AS n
            FROM events GROUP BY 1, 2
        """,
        # - events_pivot: conditional aggregation — the portable
        #   spelling of PIVOT with a fixed value list.
        "events_pivot": """
            SELECT user_id,
                   sum(CASE WHEN event_type = 'click' THEN 1
                       ELSE 0 END)::BIGINT AS n_click,
                   sum(CASE WHEN event_type = 'error' THEN 1
                       ELSE 0 END)::BIGINT AS n_error,
                   sum(CASE WHEN event_type = 'purchase' THEN 1
                       ELSE 0 END)::BIGINT AS n_purchase,
                   sum(CASE WHEN event_type = 'signup' THEN 1
                       ELSE 0 END)::BIGINT AS n_signup,
                   sum(CASE WHEN event_type = 'view' THEN 1
                       ELSE 0 END)::BIGINT AS n_view
            FROM events GROUP BY user_id
        """,
        # - host_similarity: distinct (host, dst) relation, value-key
        #   self-join for intersections, exact sizes, integer jaccard.
        "host_similarity": f"""
            WITH lg AS MATERIALIZED (
              SELECT * FROM ({_link_graph_oracle(multi_host=True)})
            ),
            rel AS MATERIALIZED (
              SELECT DISTINCT
                     regexp_extract(src_url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*)', 1) AS k,
                     dst_url AS v
              FROM lg
            ),
            sizes AS (SELECT k, count(*)::BIGINT AS size
                      FROM rel GROUP BY 1),
            ok AS (SELECT v FROM rel GROUP BY v
                   HAVING count(*) <= 1000),
            capped AS (SELECT rel.k, rel.v FROM rel JOIN ok USING (v)),
            co AS (
              SELECT a.k AS key_a, b.k AS key_b, count(*)::BIGINT AS co
              FROM capped a JOIN capped b ON a.v = b.v AND a.k < b.k
              GROUP BY 1, 2
            )
            SELECT co.key_a, co.key_b, co.co,
                   sa.size AS size_a, sb.size AS size_b,
                   ((1000000 * co.co)
                    // (sa.size + sb.size - co.co))::BIGINT
                     AS jaccard_micros
            FROM co
            JOIN sizes sa ON sa.k = co.key_a
            JOIN sizes sb ON sb.k = co.key_b
            WHERE (1000000 * co.co) // (sa.size + sb.size - co.co)
                  >= 10000
        """,
        # - k_core: the peel unrolled 8 rounds (fixpoint at 4 here;
        #   extra rounds are no-ops) over the co-supply pair graph.
        "k_core": _k_core_oracle(k=5, rounds=8),
        # - url_policy: the same scheme/host/prefix rules as
        #   equality + LIKE over the link-graph SQL.
        "url_policy": f"""
            WITH lg AS (
              SELECT * FROM ({_link_graph_oracle(multi_host=True)})
            )
            SELECT dst_url AS url, count(*)::BIGINT AS n_links
            FROM lg
            WHERE lower(regexp_extract(dst_url,
                    '^([a-zA-Z][a-zA-Z0-9+.-]*):', 1)) IN ('http', 'https')
              AND regexp_extract(dst_url,
                    '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*)', 1)
                  <> 'example.com'
              AND dst_url NOT LIKE 'https://h3.example.org/rel/%'
            GROUP BY 1
        """,
        # - digraph_stats: the same edge dedup, degree aggregations,
        #   reversed-pair semi-join, and integer moments in DuckDB.
        "digraph_stats": """
            WITH e AS MATERIALIZED (
              SELECT DISTINCT src, dst FROM (
                SELECT 's' || l_suppkey AS src, 'p' || l_partkey AS dst
                FROM lineitem
                UNION ALL
                SELECT 'p' || l_partkey, 's' || l_suppkey
                FROM lineitem WHERE l_partkey % 5 = 0
              ) WHERE src <> dst
            ),
            od AS (SELECT src AS n, count(*)::BIGINT AS d
                   FROM e GROUP BY 1),
            idg AS (SELECT dst AS n, count(*)::BIGINT AS d
                    FROM e GROUP BY 1),
            ann AS MATERIALIZED (
              SELECT o.d AS du, i.d AS dv
              FROM e JOIN od o ON e.src = o.n JOIN idg i ON e.dst = i.n
            )
            SELECT
              (SELECT count(*) FROM (
                 SELECT src AS n FROM e UNION SELECT dst FROM e
               ))::BIGINT AS n_nodes,
              (SELECT count(*) FROM e)::BIGINT AS n_edges,
              (SELECT count(*) FROM e a
                WHERE EXISTS (SELECT 1 FROM e b
                              WHERE b.src = a.dst AND b.dst = a.src)
              )::BIGINT AS n_reciprocal,
              (SELECT max(d) FROM od)::BIGINT AS max_out_degree,
              (SELECT max(d) FROM idg)::BIGINT AS max_in_degree,
              (SELECT sum(d * d) FROM od)::BIGINT AS sum_out_sq,
              (SELECT sum(du) FROM ann)::BIGINT AS sum_du,
              (SELECT sum(dv) FROM ann)::BIGINT AS sum_dv,
              (SELECT sum(du * dv) FROM ann)::BIGINT AS sum_dudv,
              (SELECT sum(du * du) FROM ann)::BIGINT AS sum_du2,
              (SELECT sum(dv * dv) FROM ann)::BIGINT AS sum_dv2
        """,
        # - inverted_index: tokenize, one row per (doc, distinct term)
        #   with 0-based positions via an indexed list_transform, then
        #   distinct-doc frequency pruning — same [min_df, max_df]
        #   bounds (max_df = floor(0.9 * n_docs)).
        "inverted_index": f"""
            WITH base AS (
              SELECT doc_id,
                     list_filter({toks}, x -> x <> '') AS tk
              FROM documents
            ),
            nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
            expl AS (
              SELECT doc_id, tk, unnest(list_distinct(tk)) AS term
              FROM base
            ),
            posts AS (
              SELECT term, doc_id,
                     list_filter(
                       list_transform(
                         generate_series(1, len(tk)),
                         i -> CASE WHEN tk[i] = term THEN i - 1 END
                       ),
                       p -> p IS NOT NULL
                     ) AS positions
              FROM expl
            ),
            dfreq AS (
              SELECT term FROM posts CROSS JOIN nd
              GROUP BY term, nd.n
              HAVING count(*) >= 2 AND count(*) <= (n * 9 // 10)
            )
            SELECT p.term, p.doc_id, p.positions,
                   len(p.positions)::BIGINT AS tf
            FROM posts p JOIN dfreq USING (term)
        """,
        # - bipartite: dedup -> degree cap -> right-key self-join ->
        #   pair count, identical thresholds.
        "bipartite": """
            WITH rel AS (
              SELECT DISTINCT o.o_custkey AS l, li.l_partkey AS r
              FROM lineitem li
              JOIN orders o ON li.l_orderkey = o.o_orderkey
            ),
            ok AS (
              SELECT r FROM rel GROUP BY r HAVING count(*) <= 40
            ),
            capped AS (SELECT rel.l, rel.r FROM rel JOIN ok USING (r))
            SELECT a.l AS src, b.l AS dst, count(*)::BIGINT AS co
            FROM capped a JOIN capped b ON a.r = b.r AND a.l < b.l
            GROUP BY 1, 2 HAVING count(*) >= 8
        """,
        # - rank_calibration: the same distinct-value cumulative-count
        #   ranking in DuckDB — rank = 1 + running sum of smaller
        #   values' counts, pr = 1e6*(rank-1) // (n-1). All integers.
        "rank_calibration": """
            WITH counts AS (
              SELECT event_type, round(value * 1e6)::BIGINT AS value_micros,
                     count(*)::BIGINT AS n_rows
              FROM events GROUP BY 1, 2
            ),
            ranked AS (
              SELECT event_type, value_micros, n_rows,
                     (1 + coalesce(sum(n_rows) OVER (
                        PARTITION BY event_type ORDER BY value_micros
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                      ), 0))::BIGINT AS rank,
                     sum(n_rows) OVER (
                       PARTITION BY event_type
                     )::BIGINT AS n_group
              FROM counts
            )
            SELECT event_type, value_micros, n_rows, rank, n_group,
                   (CASE WHEN n_group > 1
                         THEN (1000000 * (rank - 1)) // (n_group - 1)
                         ELSE 0 END)::BIGINT AS pr_micros
            FROM ranked
        """,
        # - top_paths: gaps-and-islands sessionization (same 1800s gap
        #   and (ts, event_id) order as the operator), first-5 types
        #   per session via an ordered string_agg, deterministic top-k.
        "top_paths": """
            WITH ord AS (
              SELECT user_id, ts, event_id, event_type,
                     lag(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                     ) AS prev
              FROM events
            ),
            sess AS (
              SELECT *, sum(
                       CASE WHEN prev IS NULL
                                 OR epoch_us(ts) - epoch_us(prev)
                                    > 1800000000
                            THEN 1 ELSE 0 END
                     ) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING
                     ) AS session_seq
              FROM ord
            ),
            pos AS (
              SELECT *, row_number() OVER (
                       PARTITION BY user_id, session_seq
                       ORDER BY ts, event_id
                     ) AS p
              FROM sess
            ),
            paths AS (
              SELECT user_id, session_seq,
                     string_agg(event_type, '>' ORDER BY p) AS path
              FROM pos WHERE p <= 5 GROUP BY 1, 2
            ),
            cnt AS (
              SELECT path, count(*)::BIGINT AS n_sessions
              FROM paths GROUP BY 1
            )
            SELECT path, n_sessions, rank FROM (
              SELECT path, n_sessions,
                     row_number() OVER (
                       ORDER BY n_sessions DESC, path
                     )::BIGINT AS rank
              FROM cnt
            ) WHERE rank <= 20
        """,
        # - containment: the ngram_jaccard candidate pipeline with the
        #   asymmetric integer-micros verify — 1e6 * inter // size per
        #   direction, keep if the larger clears 0.8.
        "containment": f"""
            WITH base AS (
              SELECT doc_id, source, tk FROM (
                SELECT doc_id, source, {toks} AS tk FROM documents
                UNION ALL
                SELECT doc_id + 100000, source,
                       string_split(array_to_string(tk0[1:12], ' '), ' ')
                FROM (SELECT doc_id, source, {toks} AS tk0 FROM documents)
                WHERE doc_id % 11 = 0
              )
            ),
            sh AS (
              SELECT doc_id, source,
                     list_distinct(list_transform(
                       generate_series(0, greatest(len(tk) - 3, 0)),
                       i -> array_to_string(tk[i + 1 : i + 3], ' ')
                     )) AS shs
              FROM base
            ),
            expl AS (SELECT doc_id, source, unnest(shs) AS s FROM sh),
            df_ok AS (SELECT s FROM expl GROUP BY s HAVING count(*) <= 1000),
            posts AS (SELECT e.doc_id, e.source, e.s
                      FROM expl e JOIN df_ok USING (s)),
            cand AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM posts a JOIN posts b ON a.s = b.s AND a.source = b.source
                            AND a.doc_id < b.doc_id
            ),
            v AS (
              SELECT c.id_a, c.id_b,
                     len(list_intersect(sa.shs, sb.shs))::BIGINT AS inter,
                     len(sa.shs)::BIGINT AS size_a,
                     len(sb.shs)::BIGINT AS size_b
              FROM cand c
              JOIN sh sa ON sa.doc_id = c.id_a
              JOIN sh sb ON sb.doc_id = c.id_b
            )
            SELECT id_a, id_b, inter, size_a, size_b,
                   ((1000000 * inter) // size_a)::BIGINT
                     AS containment_a_micros,
                   ((1000000 * inter) // size_b)::BIGINT
                     AS containment_b_micros
            FROM v
            WHERE greatest((1000000 * inter) // size_a,
                           (1000000 * inter) // size_b) >= 800000
        """,
        # - crawl_frontier: the multi-host link-graph SQL + the same
        #   dedup/priority groupBy, anti-join against the crawled page
        #   set, and per-host QUALIFY window with the identical
        #   (n_inlinks desc, url) order.
        "crawl_frontier": f"""
            WITH lg AS MATERIALIZED (
              SELECT * FROM ({_link_graph_oracle(multi_host=True)})
            ),
            cand AS (
              SELECT dst_url AS url, count(*)::BIGINT AS n_inlinks
              FROM lg GROUP BY 1
            ),
            unseen AS (
              SELECT c.url, c.n_inlinks,
                     regexp_extract(c.url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*)', 1) AS host
              FROM cand c
              WHERE c.url NOT IN (SELECT DISTINCT src_url FROM lg)
            )
            SELECT url, host, n_inlinks, rank FROM (
              SELECT url, host, n_inlinks,
                     row_number() OVER (
                       PARTITION BY host ORDER BY n_inlinks DESC, url
                     )::BIGINT AS rank
              FROM unseen
            ) WHERE rank <= 3
        """,
        # - histogram: the identical integer-micros binning in DuckDB —
        #   round(v*1e6)::BIGINT per row, then one multiply + `//`;
        #   edges derived from the bin index the same way.
        "histogram": """
            WITH binned AS (
              SELECT event_type,
                     (CASE WHEN vm < 0 THEN -1
                           WHEN vm >= 500000000 THEN 20
                           ELSE (vm - 0) * 20 // 500000000 END)::BIGINT
                       AS bin
              FROM (
                SELECT event_type, round(value * 1e6)::BIGINT AS vm
                FROM events
              )
            )
            SELECT event_type, bin,
                   (CASE WHEN bin >= 0 AND bin < 20
                         THEN 0 + bin * 500000000 // 20 END)::BIGINT
                     AS bin_lo_micros,
                   count(*)::BIGINT AS n
            FROM binned GROUP BY 1, 2
        """,
        # - transitions: the same per-user lag window in DuckDB — the
        #   (ts, event_id) order key makes the pairing deterministic on
        #   both engines.
        "transitions": """
            WITH lagged AS (
              SELECT lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                     ) AS prev_type,
                     event_type AS next_type
              FROM events
            )
            SELECT prev_type, next_type, count(*)::BIGINT AS n
            FROM lagged WHERE prev_type IS NOT NULL
            GROUP BY 1, 2
        """,
        # - corpus_cube: DuckDB GROUP BY CUBE + GROUPING() — the same
        #   subtotal lattice and the same grouping-bit encoding (first
        #   dim = high bit) as Spark's cube()/grouping_id(). Token and
        #   char counts are the repo's standard integer expressions,
        #   computed per row before the cube.
        "corpus_cube": r"""
            WITH pre AS (
              SELECT lang, source,
                     (CASE WHEN length(trim(text)) = 0 THEN 0
                           ELSE len(string_split_regex(trim(text), '\s+'))
                      END)::BIGINT AS tok,
                     length(text)::BIGINT AS ch
              FROM documents
            )
            SELECT lang, source,
                   GROUPING(lang, source)::BIGINT AS gid,
                   count(*)::BIGINT AS n_docs,
                   sum(tok)::BIGINT AS n_tokens,
                   sum(ch)::BIGINT AS n_chars
            FROM pre GROUP BY CUBE(lang, source)
        """,
        # - funnel: the iterated conditional minimum — t_{k+1} =
        #   min(ts of step-(k+1) events strictly after t_k) — which is
        #   provably the same as the operator's greedy sorted-array
        #   fold. Strictly-after on raw timestamps (micros precision on
        #   both engines).
        "funnel": """
            WITH src AS (
              SELECT user_id, ts, event_type FROM events
              WHERE event_id % 7 = 0
            ),
            u AS (SELECT DISTINCT user_id FROM src),
            t1 AS (
              SELECT user_id, min(ts) AS t FROM src
              WHERE event_type = 'signup' GROUP BY 1
            ),
            t2 AS (
              SELECT s.user_id, min(s.ts) AS t
              FROM src s JOIN t1 ON s.user_id = t1.user_id
              WHERE s.event_type = 'view' AND s.ts > t1.t GROUP BY 1
            ),
            t3 AS (
              SELECT s.user_id, min(s.ts) AS t
              FROM src s JOIN t2 ON s.user_id = t2.user_id
              WHERE s.event_type = 'click' AND s.ts > t2.t GROUP BY 1
            ),
            t4 AS (
              SELECT s.user_id, min(s.ts) AS t
              FROM src s JOIN t3 ON s.user_id = t3.user_id
              WHERE s.event_type = 'purchase' AND s.ts > t3.t GROUP BY 1
            )
            SELECT u.user_id AS user,
                   (CASE WHEN t4.t IS NOT NULL THEN 4
                         WHEN t3.t IS NOT NULL THEN 3
                         WHEN t2.t IS NOT NULL THEN 2
                         WHEN t1.t IS NOT NULL THEN 1
                         ELSE 0 END)::BIGINT AS steps_completed,
                   (t4.t IS NOT NULL) AS converted
            FROM u
            LEFT JOIN t1 ON u.user_id = t1.user_id
            LEFT JOIN t2 ON u.user_id = t2.user_id
            LEFT JOIN t3 ON u.user_id = t3.user_id
            LEFT JOIN t4 ON u.user_id = t4.user_id
        """,
        # - activity_curve: the same first-seen decomposition in SQL —
        #   actives from a per-day distinct, news from min(day) per
        #   user, cum as a window sum over the day frame. Integers.
        "activity_curve": """
            WITH act AS (
              SELECT ts::DATE AS day,
                     count(DISTINCT user_id)::BIGINT AS active_keys
              FROM events GROUP BY 1
            ),
            fs AS (
              SELECT user_id, min(ts::DATE) AS day FROM events GROUP BY 1
            ),
            new AS (
              SELECT day, count(*)::BIGINT AS new_keys FROM fs GROUP BY 1
            )
            SELECT a.day, a.active_keys,
                   coalesce(n.new_keys, 0)::BIGINT AS new_keys,
                   (a.active_keys - coalesce(n.new_keys, 0))::BIGINT
                     AS returning_keys,
                   sum(coalesce(n.new_keys, 0)) OVER (
                     ORDER BY a.day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   )::BIGINT AS cum_keys
            FROM act a LEFT JOIN new n ON a.day = n.day
        """,
        # - heavy_hitters: the count-min pipeline replayed end to end —
        #   same md5 lane hashing ('r|value', first 8 hex chars mod
        #   512), same register sums, same min-over-lanes with absent
        #   registers as 0 (the probes x groups cross join mirrors
        #   cm_estimate exactly). All integers; est >= exact per row.
        "heavy_hitters": """
            WITH src AS MATERIALIZED (
              SELECT event_type AS g, user_id::VARCHAR AS v FROM events
            ),
            regs AS MATERIALIZED (
              SELECT g, r.range::INT AS row,
                     (('0x' || substr(md5(r.range || '|' || v), 1, 8))
                        ::BIGINT % 512)::INT AS col,
                     count(*)::BIGINT AS cnt
              FROM src CROSS JOIN range(4) r
              GROUP BY 1, 2, 3
            ),
            probes AS (
              SELECT k.key, gs.g, r.range::INT AS row,
                     (('0x' || substr(md5(r.range || '|' || k.key), 1, 8))
                        ::BIGINT % 512)::INT AS col
              FROM (SELECT DISTINCT v AS key FROM src) k
              CROSS JOIN range(4) r
              CROSS JOIN (SELECT DISTINCT g FROM regs) gs
            ),
            est AS (
              SELECT p.g, p.key,
                     min(coalesce(regs.cnt, 0))::BIGINT AS est
              FROM probes p
              LEFT JOIN regs ON regs.g = p.g AND regs.row = p.row
                            AND regs.col = p.col
              GROUP BY 1, 2
            ),
            exact AS (
              SELECT g, v AS key, count(*)::BIGINT AS exact
              FROM src GROUP BY 1, 2
            )
            SELECT est.g AS event_type, est.key, est.est, exact.exact
            FROM est JOIN exact ON est.g = exact.g AND est.key = exact.key
            WHERE est.est >= 1
        """,
        # - host_rollup: the multi-host link-graph SQL composed with
        #   the same host extraction, two aggregations (outbound /
        #   inbound, conditional distinct ignoring the NULL arm exactly
        #   like Spark's count_distinct(when(...))) and a full outer
        #   join — all bigint counts.
        "host_rollup": f"""
            WITH e AS (
              SELECT regexp_extract(src_url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*)', 1) AS sh,
                     regexp_extract(dst_url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*)', 1) AS dh,
                     src_url
              FROM ({_link_graph_oracle(multi_host=True)}) lg
            ),
            o AS (
              SELECT sh AS host,
                     count(DISTINCT src_url)::BIGINT AS n_pages,
                     count(*)::BIGINT AS out_links,
                     sum(CASE WHEN sh = dh THEN 1 ELSE 0 END)::BIGINT
                       AS out_internal,
                     count(DISTINCT CASE WHEN sh <> dh THEN dh END)::BIGINT
                       AS out_hosts
              FROM e GROUP BY sh
            ),
            i AS (
              SELECT dh AS host,
                     count(*)::BIGINT AS in_links,
                     count(DISTINCT CASE WHEN sh <> dh THEN sh END)::BIGINT
                       AS in_hosts
              FROM e GROUP BY dh
            )
            SELECT coalesce(o.host, i.host) AS host,
                   coalesce(n_pages, 0)::BIGINT AS n_pages,
                   coalesce(out_links, 0)::BIGINT AS out_links,
                   coalesce(out_internal, 0)::BIGINT AS out_internal,
                   coalesce(out_hosts, 0)::BIGINT AS out_hosts,
                   coalesce(in_links, 0)::BIGINT AS in_links,
                   coalesce(in_hosts, 0)::BIGINT AS in_hosts
            FROM o FULL OUTER JOIN i ON o.host = i.host
        """,
        # - hits: the integer-micros hub/authority recurrence unrolled
        #   to a CTE chain over the same edge table; the L1 rescale
        #   denominator is a scalar subquery per sweep, mirrored by a
        #   1-row broadcast in Spark. Exact by construction.
        "hits": _hits_oracle(iterations=4),
        # - pack_sequences: the greedy running-remainder recurrence
        #   replayed as a DuckDB RECURSIVE CTE stepping row_number
        #   within each shard — a genuinely independent second
        #   implementation of a stateful scan (Spark runs it as an
        #   Arrow applyInPandas per shard). All-integer state, so the
        #   match is exact. Chunk derivation mirrors chunk_tokens.
        "pack_sequences": f"""
            WITH RECURSIVE t AS (
              SELECT doc_id,
                     list_filter(string_split({norm}, ' '),
                                 x -> x <> '') AS toks
              FROM documents
            ),
            base AS (SELECT doc_id, len(toks) AS n FROM t
                     WHERE len(toks) >= 1),
            starts AS (
              SELECT doc_id, n, unnest(range(0, n, 48)) AS s FROM base
            ),
            chunks AS (
              SELECT doc_id % 4 AS shard,
                     doc_id * 1000 + (s // 48) AS item_id,
                     least(64, n - s)::BIGINT AS n_tokens
              FROM starts WHERE s = 0 OR s + 16 < n
            ),
            items AS (
              SELECT shard, item_id, n_tokens,
                     row_number() OVER (
                       PARTITION BY shard ORDER BY item_id
                     ) AS rn
              FROM chunks
            ),
            walk(shard, rn, item_id, n_tokens, pack_id, fill) AS (
              SELECT shard, rn, item_id, n_tokens, 0::BIGINT, n_tokens
              FROM items WHERE rn = 1
              UNION ALL
              SELECT i.shard, i.rn, i.item_id, i.n_tokens,
                     CASE WHEN w.fill + i.n_tokens > 256
                          THEN w.pack_id + 1 ELSE w.pack_id END,
                     CASE WHEN w.fill + i.n_tokens > 256
                          THEN i.n_tokens ELSE w.fill + i.n_tokens END
              FROM walk w
              JOIN items i ON i.shard = w.shard AND i.rn = w.rn + 1
            )
            SELECT shard, item_id, n_tokens, pack_id,
                   (fill - n_tokens)::BIGINT AS offset,
                   n_tokens > 256 AS overflow
            FROM walk
        """,
        # - upsample: copy counts rebuilt in SQL — floor(w) plus the
        #   md5-threshold fractional copy (thresholds from the
        #   operator's own _hex_threshold via the identical w - int(w)
        #   float op), unnest(range(0, n)) as the epoch index. range()
        #   on n=0 is empty, so weight-0 strata vanish exactly like the
        #   operator's empty-array explode.
        "upsample": f"""
            WITH base AS (
              SELECT doc_id, source,
                     CASE source
                       WHEN 'src0' THEN 3 + CASE
                         WHEN substr(md5('r7m' || doc_id::VARCHAR), 1, 8)
                              < '{_sampling_thr(3.2 - 3)}' THEN 1 ELSE 0 END
                       WHEN 'src1' THEN CASE
                         WHEN substr(md5('r7m' || doc_id::VARCHAR), 1, 8)
                              < '{_sampling_thr(0.5)}' THEN 1 ELSE 0 END
                       WHEN 'src2' THEN 0
                       ELSE 1
                     END AS n
              FROM documents
            )
            SELECT doc_id, source, unnest(range(0, n))::BIGINT AS epoch
            FROM base
        """,
        # - approx_distinct: DuckDB re-runs the ENTIRE integer HLL
        #   pipeline — same md5 slices (bucket = first 8 bits, rho =
        #   21 - length(bin(next 20 bits))), same max registers, same
        #   2^21-scaled bigint harmonic denominator, same single floor
        #   division — so even the approximation is hash-exact. The
        #   constants mirror cardinality.py (ALPHA_MICROS=718272,
        #   EST_NUMERATOR = alpha * 256^2 * 2^21).
        "approx_distinct": f"""
            WITH vals AS (
              SELECT source,
                     unnest(list_filter(string_split({norm}, ' '),
                                        x -> x <> '')) AS tok
              FROM documents
            ),
            br AS (
              SELECT source,
                     ('0x' || substr(md5(tok), 1, 2))::INT AS bucket,
                     CASE WHEN ('0x' || substr(md5(tok), 3, 5))::BIGINT = 0
                          THEN 21
                          ELSE 21 - length(bin(
                               ('0x' || substr(md5(tok), 3, 5))::BIGINT))
                     END AS rho
              FROM vals
            ),
            regs AS (
              SELECT source, bucket, max(rho) AS rho
              FROM br GROUP BY 1, 2
            )
            SELECT source,
                   ({718_272 * 256 * 256 * (1 << 21)} //
                    ((sum((1::BIGINT << (21 - rho)))::BIGINT
                      + (256 - count(*)) * {1 << 21}) * 1000000)
                   )::BIGINT AS est_distinct,
                   count(*)::BIGINT AS registers_used
            FROM regs GROUP BY source
        """,
        # - exact_k_sample: the plain per-stratum window the operator's
        #   prefilter path must be indistinguishable from — QUALIFY over
        #   the identical md5 bucket order with the identical tiebreak.
        "exact_k_sample": """
            SELECT doc_id, source, n_chars FROM (
              SELECT doc_id, source, n_chars,
                     row_number() OVER (
                       PARTITION BY source
                       ORDER BY substr(md5('r7' || doc_id::VARCHAR), 1, 8),
                                doc_id
                     ) AS rn
              FROM documents
            ) WHERE rn <= 10
        """,
        # - chunk_tokens: range() starts (exclusive stop == Spark's
        #   inclusive n-1 sequence), the same s=0-or-new-token filter,
        #   DuckDB's 1-based INCLUSIVE list slice mirroring slice(toks,
        #   s+1, size). Integer spans + rejoined text, engine-portable.
        "chunk_tokens": f"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split({norm}, ' '),
                                 x -> x <> '') AS toks
              FROM documents
            ),
            base AS (SELECT doc_id, toks, len(toks) AS n FROM t
                     WHERE len(toks) >= 1),
            starts AS (
              SELECT doc_id, toks, n,
                     unnest(range(0, n, 48)) AS s
              FROM base
            )
            SELECT doc_id,
                   (s // 48)::BIGINT AS chunk_id,
                   s::BIGINT AS start_token,
                   least(64, n - s)::BIGINT AS n_tokens,
                   array_to_string(toks[s + 1 : s + 64], ' ') AS chunk
            FROM starts
            WHERE s = 0 OR s + 16 < n
        """,
        # - hash_sample: the identical md5-bucket decision in DuckDB —
        #   deterministic sampling must reproduce the exact row set on
        #   any engine, which is the operator's whole contract. Threshold
        #   literals come from the operator's own _hex_threshold so the
        #   truncation arithmetic cannot drift between the two engines.
        "hash_sample": f"""
            SELECT doc_id, source, n_chars
            FROM documents
            WHERE substr(md5('r6' || doc_id::VARCHAR), 1, 8) <
                  CASE source
                    WHEN 'src0' THEN '{_sampling_thr(1.0)}'
                    WHEN 'src1' THEN '{_sampling_thr(0.4)}'
                    ELSE '{_sampling_thr(0.1)}'
                  END
        """,
        # - events_asof: DuckDB's NATIVE ASOF LEFT JOIN — an independent
        #   implementation of the inclusive backward as-of match — over
        #   the identically deduped view side. Spark computes it with the
        #   union+window shape (no join node); full value equality incl.
        #   NULL payloads for clicks with no prior view.
        "events_asof": """
            WITH l AS (SELECT * FROM events WHERE event_type = 'click'),
            r AS (
              SELECT user_id, ts, max(event_id) AS view_event_id,
                     max_by(value, event_id) AS view_value
              FROM events WHERE event_type = 'view' GROUP BY user_id, ts
            )
            SELECT l.event_id,
                   r.view_event_id,
                   round(r.view_value * 1e6)::BIGINT AS view_value_micros,
                   date_diff('second', r.ts, l.ts)::BIGINT AS lag_s
            FROM l ASOF LEFT JOIN r
              ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        # The three formerly-gray approximate queries, now exact-oracled
        # (see each query's docstring for why equality holds):
        # - ann_lsh_topk: bucket membership from a pure-numpy second
        #   implementation of the seeded hyperplane family (goldens/
        #   dataops_sf01), exact cosine top-k over those candidates.
        "ann_lsh_topk": f"""
            WITH cand AS (
              SELECT e.vec_id, e.embedding
              FROM embeddings e
              JOIN {G_ANN_BUCKETS} b USING (vec_id)
              WHERE b.bucket IN (SELECT bucket FROM {G_ANN_PROBES})
            )
            SELECT vec_id,
                   round(list_cosine_similarity(embedding,
                       (SELECT embedding FROM embeddings WHERE vec_id = 0)) * 1e4)::BIGINT AS cosine_e4
            FROM cand
            ORDER BY list_cosine_similarity(embedding,
                       (SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC, vec_id
            LIMIT 20
        """,
        # - minhash_dedup: output == ALL pairs with exact shingle Jaccard
        #   ≥ 0.6 (precision exact by the verify stage; banding recall 1 on
        #   this corpus, pytest-pinned) — computed directly in SQL.
        "minhash_dedup": f"""
            WITH {neardup_pair_ctes}
            SELECT id_a, id_b, round(jaccard * 1e6)::BIGINT AS jaccard_micros
            FROM dup
        """,
        # - minhash_join: the cross-parity subset of the same exact pair
        #   set (train = even ids, eval = odd ids) — deterministic band
        #   entries make cross-corpus banding recall equal within-corpus
        #   recall (= 1 here, pytest-pinned), and the verify is exact.
        "minhash_join": f"""
            WITH {neardup_pair_ctes}
            SELECT id_a, id_b, round(jaccard * 1e6)::BIGINT AS jaccard_micros
            FROM dup
            WHERE (id_a % 2) <> (id_b % 2)
        """,
        # - neardup_components: transitive closure of the same exact
        #   near-dup pair set — component = min reachable id, computed in
        #   DuckDB with a recursive CTE (components are near-dup clusters,
        #   so the closure is tiny); Spark computes it with the alternating
        #   large-star/small-star algorithm. Full value equality.
        "neardup_components": f"""
            WITH RECURSIVE {neardup_pair_ctes},
            edges AS (
              SELECT id_a AS a, id_b AS b FROM dup
              UNION
              SELECT id_b AS a, id_a AS b FROM dup
            ),
            reach(a, b) AS (
              SELECT a, b FROM edges
              UNION
              SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
              WHERE e.b <> r.a
            )
            SELECT a AS node, least(a, min(b)) AS component
            FROM reach GROUP BY a
        """,
        # - simhash_dedup: output == ALL pairs at hamming ≤ 6 (pigeonhole
        #   recall + popcount verify); signatures from an independent
        #   pure-Python SimHash, hamming via DuckDB xor + bit_count.
        "simhash_dedup": f"""
            WITH s AS (SELECT * FROM {G_SIMHASH}),
            pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     bit_count(xor(a.simhash, b.simhash)) AS hamming
              FROM s a JOIN s b ON a.doc_id < b.doc_id
            )
            SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 6
        """,
    }


if __name__ == "__main__":
    from openie_spark.session import build_session

    spark = build_session(app_name="openie-entry")
    df = entry(spark)
    n = df.count()
    print(f"entry: {n} triples")
    df.show(10, truncate=False)
