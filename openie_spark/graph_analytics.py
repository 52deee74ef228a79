"""Graph-analytics operators over the KG edge table: k-hop neighborhood
extraction and triangle counting.

These are the query-side complement to the construction pipeline
(graph.py builds the node/edge tables; merge.py/topk.py rewrite them):
a KG consumer asks "give me everything within k hops of this entity"
(subgraph export, entity-context retrieval for RAG) and "how clustered
is this node's neighborhood" (triangle counts → clustering coefficient,
a standard KG-quality diagnostic). The reference (sudoandros/OpenIE)
holds its graph in a single-process networkx object where these are
one-liners; at 100 TB the edge table is distributed and the algorithms
must be reshaped, not translated.

Scale notes:
- ``k_hop_neighborhood``: classic frontier BFS — per hop, ONE join of
  the (small) frontier against the edge table and one anti-join against
  the visited set. The edge table is repartitioned on the join key ONCE
  and cached by the caller (or pass ``prepartition=True``); each hop
  then shuffles only the frontier. Frontiers and the visited set are
  localCheckpoint-materialized per hop (bounded lineage — the same
  idiom as topk._reach, which this generalizes to a public operator).
  k is a small constant (2-4 in practice) so the loop unrolls to a
  handful of stages.
- ``triangle_count``: the standard degree-ordered orientation (each
  undirected edge directed from the (degree, id)-smaller endpoint) makes
  every out-neighborhood O(sqrt(m)), so the wedge join's fan-out is
  bounded even on power-law graphs — the all-pairs blowup a naive
  wedge join has on hub nodes cannot happen. Three shuffles total:
  degree count, wedge self-join on the low vertex, closing-edge
  equi-join. All counts integers.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# rows per shuffle partition for the iterative operators' edge tables.
# The partition count derives from the DATA size, clamped above by
# spark.sql.shuffle.partitions (the cluster-configured ceiling), so the
# same code sizes itself at sf0.1 and at 100 TB instead of hard-coding
# either (guide §2.2: fewer, larger partitions — but measured, not
# assumed). 250k edge rows ≈ tens of MB per partition; A/B at both
# 0.7M and 12M edges: 1M rows/partition under-parallelized the 12M-edge
# graph on this machine (12 tasks), while 250k keeps the small-graph
# win (8 partitions at 0.7M edges) and restores ~full parallelism at
# 12M (48), converging to the configured ceiling as data grows.
_EDGE_ROWS_PER_PARTITION = 250_000


def _adaptive_parts(
    spark, row_estimate: int, num_partitions: Optional[int]
) -> int:
    if num_partitions is not None:
        return num_partitions
    sp = int(spark.conf.get("spark.sql.shuffle.partitions"))
    target = -(-max(1, row_estimate) // _EDGE_ROWS_PER_PARTITION)
    return min(sp, max(8, target))


def _sym_edges(
    edges: DataFrame, src: str, dst: str, directed: bool
) -> DataFrame:
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    if not directed:
        e = e.unionByName(
            edges.select(F.col(dst).alias("_s"), F.col(src).alias("_d"))
        )
    return e.filter(F.col("_s") != F.col("_d")).distinct()


def _sym_edges_partitioned(
    edges: DataFrame, src: str, dst: str, directed: bool, parts: int
) -> DataFrame:
    """_sym_edges already laid out on the _s join key, in ONE exchange:
    repartition FIRST, dedup second — hashpartitioning(_s) clusters
    every (_s, _d) pair into one partition, so Catalyst plans the
    dropDuplicates WITHOUT a second exchange (a distinct-then-
    repartition order pays two; guide §2.4: share one exchange between
    operations keyed compatibly)."""
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    if not directed:
        e = e.unionByName(
            edges.select(F.col(dst).alias("_s"), F.col(src).alias("_d"))
        )
    return (
        e.filter(F.col("_s") != F.col("_d"))
        .repartition(parts, "_s")
        .dropDuplicates(["_s", "_d"])
    )


def k_hop_neighborhood(
    edges: DataFrame,
    seeds: Sequence,
    k: int,
    src: str = "src",
    dst: str = "dst",
    directed: bool = False,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """All nodes within ``k`` hops of ``seeds``, with their minimum hop
    distance: (node, dist), dist in [0, k], seeds at 0. Undirected by
    default (edges traversed both ways).

    Distances are exact minimums by construction — each hop's frontier
    is anti-joined against everything already visited, so a node is
    emitted the FIRST time it is reached. Integer output: engine- and
    partition-layout-portable.

    ``seeds`` is a driver-side list (entity ids a user asks about — if
    you have a DataFrame of seeds, collect is wrong at scale; pass it
    through the same loop shape with a join instead). The edge table is
    symmetrized + deduped once, repartitioned on the source key, and
    cached for the k reuses; each hop shuffles only the frontier.
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    spark = edges.sparkSession
    if k > 0:
        # one cheap metadata-ish count sizes the edge layout from the
        # data (×2 when symmetrized); the repartition-then-dedup order
        # plans a single exchange (see _sym_edges_partitioned)
        m_est = edges.count() * (1 if directed else 2)
        parts = _adaptive_parts(spark, m_est, num_partitions)
        e = _sym_edges_partitioned(edges, src, dst, directed, parts).persist()
    else:
        e = _sym_edges(edges, src, dst, directed)

    seed_df = spark.createDataFrame(
        [(s,) for s in seeds], f"node {edges.schema[src].dataType.simpleString()}"
    ).distinct()
    visited = seed_df.withColumn("dist", F.lit(0).cast("long")).localCheckpoint(
        eager=True
    )
    frontier = visited.select("node")
    try:
        for hop in range(1, k + 1):
            nxt = (
                frontier.join(e, frontier["node"] == e["_s"])
                .select(F.col("_d").alias("node"))
                .distinct()
                .join(visited, "node", "left_anti")
                .withColumn("dist", F.lit(hop).cast("long"))
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                break
            # both sides are materialized checkpoints — the union is a
            # free lazy view, no re-checkpoint barrier (topk._reach idiom)
            visited = visited.unionByName(nxt)
            frontier = nxt.select("node")
    finally:
        if k > 0:
            e.unpersist()
    return visited


def pagerank_micros(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping_pct: int = 85,
    num_partitions: Optional[int] = None,
    seeds: Optional[Sequence] = None,
    weight_col: Optional[str] = None,
) -> DataFrame:
    """Quantized PageRank: (node, rank_micros) after ``iterations``
    synchronous power iterations, all arithmetic in INTEGER micro-units.

    Why quantized: textbook float PageRank sums IEEE doubles in
    partition order, so the same graph hashes differently per layout and
    per engine — unacceptable under this repo's value-hash contract.
    Here ranks are bigint micros of probability mass; a node's
    contribution is ``rank // out_degree`` (floor division), damping is
    ``(damping_pct * in_sum) // 100``, and dangling mass is
    redistributed uniformly as ``dangling // N``. Integer addition is
    associative and floor division is engine-portable, so the result is
    bit-identical on ANY engine and ANY partition layout, within
    ~iterations/1e6 of the float fixpoint (flooring only ever drops
    sub-micro remainders; total mass shrinks by < N + dangling-remainder
    micros per iteration — diagnostic, not drift).

    Scale shape: the edge table (src, out_degree) is built once,
    repartitioned on src, and cached; each iteration is ONE
    ranks-vs-edges equi-join + ONE groupBy(dst) sum (map-side partial
    agg) + a 1-row dangling scalar broadcast. Ranks are
    localCheckpoint-materialized per iteration (bounded lineage). At
    1000 executors this is the standard Pregel-unrolled topology; the
    per-iteration shuffle keys on the same column so AQE reuses the
    layout.

    ``seeds`` switches to PERSONALIZED PageRank: the teleport vector
    (and the dangling redistribution, and the initial mass) is uniform
    over the seed set instead of all nodes — relevance of every entity
    to the seeds, the KG query behind "what matters near these
    entities". Same integer quantization: per-seed teleport =
    ``total_teleport // |S|``, per-seed dangling share = ``dang //
    |S|``. Seeds absent from the graph are ignored; at least one must
    be present.

    ``weight_col`` switches to WEIGHTED PageRank with positive integer
    edge weights (link frequency, anchor counts): parallel edges
    aggregate by weight sum and a source's mass splits proportionally,
    ``contribution = (rank * w) div sum_w(source)`` — still one integer
    multiply + floor division per edge, so the quantized contract is
    unchanged (weights are bigints; rank <= 1e6, so the product stays
    far inside int64 for any realistic weight). Rows with aggregate
    weight <= 0 are dropped (a zero-weight edge is no edge). The
    unweighted path is bit-identical to before: w = 1 makes
    ``(rank * 1) div deg`` the exact old expression.
    """
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    spark = edges.sparkSession
    # One cheap count sizes the edge layout from the DATA (clamped by
    # spark.sql.shuffle.partitions — see _adaptive_parts); repartition
    # BEFORE dedup/weight-agg so the whole degree-annotated edge build
    # runs in a SINGLE exchange: hashpartitioning(_s) clusters every
    # (_s, _d) pair, so the dedup (or weight groupBy), the out-degree
    # groupBy(_s), and the e⋈outdeg equi-join all reuse that one layout
    # with no further Exchange (guide §2.4). The persisted e_deg is
    # materialized ONCE here; every setup table below (nodes, dangling,
    # no-in) derives from the cache instead of re-running the dedup
    # subtree per setup job (measured: the old shape recomputed the
    # scan+distinct 3× across the nodes/dangling/e_deg jobs).
    m_est = edges.count()
    parts = _adaptive_parts(spark, m_est, num_partitions)
    if weight_col is None:
        e = (
            edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
            .filter(F.col("_s") != F.col("_d"))
            .repartition(parts, "_s")
            .dropDuplicates(["_s", "_d"])
            .withColumn("_w", F.lit(1).cast("long"))
        )
    else:
        e = (
            edges.select(
                F.col(src).alias("_s"),
                F.col(dst).alias("_d"),
                F.col(weight_col).cast("long").alias("_w"),
            )
            .filter(F.col("_s") != F.col("_d"))
            .repartition(parts, "_s")
            .groupBy("_s", "_d")
            .agg(F.sum("_w").cast("long").alias("_w"))
            .filter(F.col("_w") > 0)
        )
    outdeg = e.groupBy(F.col("_s")).agg(
        F.sum("_w").cast("long").alias("_deg")
    )
    e_deg = e.join(outdeg, "_s").persist()
    e_deg.count()  # materialize the cache; everything below reads it
    nodes = (
        e_deg.select(F.col("_s").alias("node"))
        .unionByName(e_deg.select(F.col("_d").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        e_deg.unpersist()
        return nodes.withColumn("rank_micros", F.lit(0).cast("long"))
    if seeds is not None:
        seed_list = list(seeds)
        n_seeds = nodes.filter(F.col("node").isin(seed_list)).count()
        if n_seeds == 0:
            e_deg.unpersist()
            raise ValueError("no seed is present in the graph")
        is_tele = F.col("node").isin(seed_list)
        tele_n = n_seeds
    else:
        is_tele = F.lit(True)
        tele_n = n
    # nodes with no out-edges — static across iterations
    dangling_nodes = nodes.join(
        e_deg.select(F.col("_s").alias("node")).distinct(),
        "node",
        "left_anti",
    ).localCheckpoint(eager=True)
    # nodes with no IN-edges — also static: they receive in_sum = 0
    # every iteration, so the per-iteration dense `nodes LEFT JOIN
    # contrib` (one extra join + exchange per iteration) is replaced by
    # a narrow UNION of this precomputed zero set with the contrib
    # aggregate (guide §2.4: remove shuffles outright). contrib's key
    # set is exactly the distinct in-edge endpoints, so the union
    # covers every node exactly once — bit-identical output.
    no_in_nodes = (
        nodes.join(
            e_deg.select(F.col("_d").alias("node")).distinct(),
            "node",
            "left_anti",
        )
        .withColumn("in_sum", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    base = 1_000_000 // tele_n  # uniform init over the teleport set
    teleport = ((100 - damping_pct) * 1_000_000 // 100) // tele_n
    ranks = nodes.withColumn(
        "rank_micros",
        F.when(is_tele, F.lit(base)).otherwise(F.lit(0)).cast("long"),
    ).localCheckpoint(eager=True)
    try:
        for _ in range(iterations):
            # `div` = integer floor division on bigints in BOTH Spark and
            # the DuckDB oracle ( // ) — no float ever enters the math
            contrib = (
                ranks.join(e_deg, ranks["node"] == e_deg["_s"])
                .select(
                    F.col("_d").alias("node"),
                    F.expr("(rank_micros * _w) div _deg").alias("c"),
                )
                .groupBy("node")
                .agg(F.sum("c").cast("long").alias("in_sum"))
            )
            dangling = (
                ranks.join(dangling_nodes, "node", "left_semi")
                .agg(
                    F.coalesce(F.sum("rank_micros"), F.lit(0))
                    .cast("long")
                    .alias("dang")
                )
            )
            ranks = (
                contrib.unionByName(no_in_nodes)
                .crossJoin(F.broadcast(dangling))
                .withColumn(
                    "_inner",
                    (
                        F.coalesce(F.col("in_sum"), F.lit(0))
                        + F.when(
                            is_tele, F.expr(f"dang div {tele_n}")
                        ).otherwise(F.lit(0))
                    ).cast("long"),
                )
                .select(
                    "node",
                    (
                        F.when(is_tele, F.lit(teleport))
                        .otherwise(F.lit(0))
                        .cast("long")
                        + F.expr(f"({damping_pct} * _inner) div 100")
                    )
                    .cast("long")
                    .alias("rank_micros"),
                )
                .localCheckpoint(eager=True)
            )
    finally:
        e_deg.unpersist()
    return ranks


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """The k-core of the undirected simple graph: (node, degree) for
    every node of the maximal subgraph where all degrees are >= k —
    the standard dense-region extractor (spam-farm and boilerplate
    rings in a web graph are high-core; the periphery peels away).

    Iterative peel: drop every node with degree < k, recompute degrees
    over the induced subgraph, repeat to fixpoint. Each round is one
    map-side-combinable degree count + two semi-joins of the edge set
    against the surviving nodes; the edge set is
    localCheckpoint-materialized per round (bounded lineage, the
    fixpoint idiom shared with merge/topk). Rounds are data-dependent
    but small in practice (each round removes the entire current
    periphery, not one node); ``max_rounds`` is a safety bound that
    raises rather than returning a non-fixpoint. Integer output under
    the hash contract."""
    if k < 1:
        raise ValueError("k must be >= 1")
    e = _sym_edges(edges, src, dst, directed=False).localCheckpoint(
        eager=True
    )
    for _ in range(max_rounds):
        # materialize the (small, per-node) degree table once per round:
        # the old shape re-ran the groupBy for deg.count(), keep.count()
        # AND each semi-join — ~3× the per-round aggregation work
        # (ADVICE r7); now one aggregation job + one cheap count on the
        # materialized result decide convergence, and the semi-joins
        # read the same checkpoint.
        deg = e.groupBy(F.col("_s").alias("node")).agg(
            F.count(F.lit(1)).cast("long").alias("degree")
        ).localCheckpoint(eager=True)
        n_bad = deg.filter(F.col("degree") < k).count()
        if n_bad == 0:
            return deg
        keep = deg.filter(F.col("degree") >= k).select("node")
        e = (
            e.join(keep.withColumnRenamed("node", "_s"), "_s", "left_semi")
            .join(keep.withColumnRenamed("node", "_d"), "_d", "left_semi")
            .localCheckpoint(eager=True)
        )
    raise RuntimeError(f"k_core did not converge in {max_rounds} rounds")


def digraph_stats(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """One-row integer summary of a directed simple graph (self-loops
    and duplicate edges dropped): the crawl-graph health dashboard.

    Columns: n_nodes, n_edges, n_reciprocal (directed edges whose
    reverse also exists — link-exchange/mirror detection; reciprocity
    ratio = n_reciprocal / n_edges downstream), max_out_degree,
    max_in_degree, sum_out_sq (second moment of the out-degree
    distribution — the hub-heaviness signal that predicts join skew),
    and the degree-assortativity sufficient statistics over edges
    (sum_du, sum_dv, sum_dudv, sum_du2, sum_dv2 with du =
    out_degree(src), dv = in_degree(dst)) — Pearson's r is one float
    formula the caller applies; the statistics themselves stay bigint
    under the hash contract.

    Scale shape: two degree aggregations, one left-semi self-join on
    the reversed pair for reciprocity (equi-keyed both columns), two
    broadcast-able degree attachments, then a single global aggregate —
    every sum map-side combinable. Products du*dv are bounded by
    max_deg² ≤ 1e12-ish on real crawls; sums of ≤ 1e12 terms need the
    caller to shard only past ~1e6 max-degree hubs (document, not
    guard: bigint overflow needs sum > 9.2e18)."""
    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .filter(F.col("_s") != F.col("_d"))
        .distinct()
    )
    outdeg = e.groupBy(F.col("_s").alias("n")).agg(
        F.count(F.lit(1)).cast("long").alias("od")
    )
    indeg = e.groupBy(F.col("_d").alias("n")).agg(
        F.count(F.lit(1)).cast("long").alias("idg")
    )
    rev = e.select(F.col("_d").alias("_s"), F.col("_s").alias("_d"))
    n_recip = e.join(rev, ["_s", "_d"], "left_semi").count()
    nodes = (
        e.select(F.col("_s").alias("n"))
        .unionByName(e.select(F.col("_d").alias("n")))
        .distinct()
    )
    n_nodes = nodes.count()
    annotated = (
        e.join(outdeg, e["_s"] == outdeg["n"])
        .drop("n")
        .join(indeg, e["_d"] == indeg["n"])
        .drop("n")
    )
    row = annotated.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.max("od").cast("long").alias("max_out_degree"),
        F.max("idg").cast("long").alias("max_in_degree"),
        F.sum("od").cast("long").alias("sum_du"),
        F.sum("idg").cast("long").alias("sum_dv"),
        F.sum(F.col("od") * F.col("idg")).cast("long").alias("sum_dudv"),
        F.sum(F.col("od") * F.col("od")).cast("long").alias("sum_du2"),
        F.sum(F.col("idg") * F.col("idg")).cast("long").alias("sum_dv2"),
    )
    sum_out_sq = outdeg.agg(
        F.sum(F.col("od") * F.col("od")).cast("long").alias("sum_out_sq")
    )
    return (
        row.crossJoin(F.broadcast(sum_out_sq))
        .withColumn("n_nodes", F.lit(n_nodes).cast("long"))
        .withColumn("n_reciprocal", F.lit(n_recip).cast("long"))
        .select(
            "n_nodes", "n_edges", "n_reciprocal",
            "max_out_degree", "max_in_degree", "sum_out_sq",
            "sum_du", "sum_dv", "sum_dudv", "sum_du2", "sum_dv2",
        )
    )


def bipartite_project(
    df: DataFrame,
    left_col: str,
    right_col: str,
    min_co: int = 1,
    max_right_degree: Optional[int] = None,
) -> DataFrame:
    """Project a bipartite relation onto its left side: (src, dst, co)
    edges between distinct left nodes that share >= ``min_co`` distinct
    right values, src < dst canonical. This is THE graph constructor
    behind co-mention, co-citation, co-purchase, and co-supply
    networks (clustering_coeff's driver query builds exactly this
    shape inline; here it is the named, capped operator).

    Scale shape: the relation is deduped (one map-side-combinable
    distinct), then self-joined ON THE RIGHT KEY — fan-out per right
    value is degree², so ``max_right_degree`` is the load-bearing
    knob: right values with more partners than the cap are dropped
    before the join (the posting-list/DF-cap idiom from the dedup
    family; a "stopword" right value that half the left side touches
    contributes O(n²) pairs of pure noise). One groupBy((src, dst))
    with map-side combine finishes. All counts bigint."""
    if min_co < 1:
        raise ValueError("min_co must be >= 1")
    lr = (
        df.select(
            F.col(left_col).alias("_l"), F.col(right_col).alias("_r")
        )
        .distinct()
    )
    if max_right_degree is not None:
        ok = (
            lr.groupBy("_r")
            .agg(F.count(F.lit(1)).alias("_deg"))
            .filter(F.col("_deg") <= max_right_degree)
            .select("_r")
        )
        lr = lr.join(F.broadcast(ok), "_r", "left_semi")
    pairs = (
        lr.alias("a")
        .join(lr.alias("b"), "_r")
        .filter(F.col("a._l") < F.col("b._l"))
        .groupBy(
            F.col("a._l").alias("src"), F.col("b._l").alias("dst")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("co"))
    )
    return pairs.filter(F.col("co") >= min_co)


def hits_micros(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Quantized HITS: (node, auth_micros, hub_micros) after
    ``iterations`` synchronous hub/authority sweeps, all arithmetic in
    INTEGER micro-units — the link-analysis complement to
    :func:`pagerank_micros` (PageRank ranks endorsement flow; HITS
    separates *directories* (hubs) from *endorsed content*
    (authorities), the classic Kleinberg decomposition of a web link
    graph).

    Recurrence per iteration: ``auth_raw(v) = sum of hub(u) over
    in-edges (u, v)``, then L1-rescale to ~1e6 total mass via
    ``auth = auth_raw div max(1, total_raw div 1_000_000)``; the hub
    sweep mirrors it over out-edges using the JUST-rescaled auth
    (Gauss-Seidel ordering, the textbook formulation). The rescale is a
    floor division by a precomputed scalar — no value is ever
    multiplied up, so nothing can overflow bigint even on a 1e12-edge
    graph (raw totals are bounded by m * 1e6), and integer sums are
    associative, so the result is bit-identical on ANY engine and ANY
    partition layout — an iterative algorithm under the full value-hash
    contract. The L1 norm replaces the textbook L2 (a sqrt of a float
    sum — exactly the order-dependent construct this repo bans); both
    converge to the same principal eigenvector direction, quantized.

    Scale shape: the deduped edge set is repartitioned on the join key
    once and persisted; each iteration is TWO equi-join + groupBy-sum
    passes (map-side partial agg) and two 1-row scalar broadcasts.
    Scores are localCheckpoint-materialized per iteration (bounded
    lineage). Nodes with no in-edges hold auth 0; no out-edges, hub 0.
    """
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    spark = edges.sparkSession
    m_est = edges.count()
    parts = _adaptive_parts(spark, m_est, num_partitions)
    # TWO persisted copies, one per join key: the auth sweep joins on
    # _s, the hub sweep on _d — a single _s-partitioned copy forces a
    # full edge-table re-shuffle on EVERY hub sweep (iterations× the
    # dominant shuffle; guide §2.4 "two operations keyed the same way
    # can share one exchange"). One extra materialization, paid once.
    # repartition-then-dedup plans the _s copy in a single exchange
    # (see _sym_edges_partitioned's rationale).
    e_s = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .filter(F.col("_s") != F.col("_d"))
        .repartition(parts, "_s")
        .dropDuplicates(["_s", "_d"])
        .persist()
    )
    e_s.count()  # materialize once; the _d copy and nodes read the cache
    e_d = e_s.repartition(parts, "_d").persist()
    nodes = (
        e_s.select(F.col("_s").alias("node"))
        .unionByName(e_s.select(F.col("_d").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    hub = nodes.withColumn("hub_micros", F.lit(1_000_000).cast("long"))
    auth = nodes.withColumn("auth_micros", F.lit(0).cast("long"))

    def _sweep(scores, in_col, edge_side, join_on, emit, out_col):
        """One half-iteration: propagate `in_col` across edges from
        endpoint `join_on` to endpoint `emit`, then L1-rescale into
        `out_col`. Scores are SPARSE between sweeps: a node whose raw
        sum is 0 is simply absent — it contributes nothing to the next
        sweep's join and nothing to the L1 total, and the final select
        coalesces it back to literal 0, so the dense per-sweep
        `nodes LEFT JOIN raw` (one join per sweep over every node) is
        dropped with bit-identical output."""
        raw = (
            scores.join(edge_side, scores["node"] == edge_side[join_on])
            .select(F.col(emit).alias("node"), F.col(in_col).alias("s"))
            .groupBy("node")
            .agg(F.sum("s").cast("long").alias("raw"))
        )
        total = raw.agg(
            F.greatest(
                F.lit(1).cast("long"),
                F.expr("coalesce(sum(raw), 0) div 1000000").cast("long"),
            ).alias("_den")
        )
        return (
            raw.crossJoin(F.broadcast(total))
            .select(
                "node",
                F.expr("raw div _den").cast("long").alias(out_col),
            )
        )

    try:
        for _ in range(iterations):
            auth = _sweep(
                hub, "hub_micros", e_s, "_s", "_d", "auth_micros"
            ).localCheckpoint(eager=True)
            hub = _sweep(
                auth, "auth_micros", e_d, "_d", "_s", "hub_micros"
            ).localCheckpoint(eager=True)
    finally:
        e_s.unpersist()
        e_d.unpersist()
    return (
        nodes.join(auth, "node", "left")
        .join(hub, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("auth_micros"), F.lit(0))
            .cast("long")
            .alias("auth_micros"),
            F.coalesce(F.col("hub_micros"), F.lit(0))
            .cast("long")
            .alias("hub_micros"),
        )
    )


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle count on the undirected simple graph induced by
    ``edges`` (self-loops dropped, directions and duplicates collapsed):
    (node, triangles) for every node incident to >= 1 triangle.

    Degree-ordered orientation: rank nodes by (degree, id) and direct
    each edge from the smaller endpoint — every triangle {a,b,c} then
    has exactly ONE wedge-closing orientation (a->b, a->c, b->c with a
    the smallest-ranked vertex), so each triangle is found once, and
    out-degrees are O(sqrt(m)) which bounds the wedge join's fan-out on
    hubs. The final per-node count explodes each triangle to its three
    vertices and sums — integers end to end.
    """
    und, deg = _canonical_und(edges, src, dst)
    return _triangles_from(und, deg)


def _canonical_und(edges: DataFrame, src: str, dst: str):
    """(und, deg) shared by the triangle family: the canonical
    undirected edge set (one row per {u,v}, _s < _d), MATERIALIZED via
    localCheckpoint, and the per-node degree derived from it.

    Why materialize: und feeds the orientation join, the closing join,
    and (twice, via deg) the ranking — with an expensive upstream (the
    co-occurrence self-join the driver queries build) each consumer
    re-executes the whole subtree; the executed r7 plan showed 28
    parquet scans / 61 Exchanges and zero reuse for one triangle count
    (guide §7.2: duplicated subtrees; §3.3: materialize to truncate).
    Degree comes from exploding und's two endpoints — identical to
    counting the symmetrized distinct edge set per source, without
    re-deriving it."""
    e = _sym_edges(edges, src, dst, directed=False)
    und = e.filter(F.col("_s") < F.col("_d")).localCheckpoint(eager=True)
    deg = (
        und.select(F.col("_s").alias("n"))
        .unionByName(und.select(F.col("_d").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    return und, deg


def _triangles_from(und: DataFrame, deg: DataFrame) -> DataFrame:
    """Per-node triangle counts from the materialized canonical parts
    (see :func:`_canonical_und`)."""
    # orientation key: (degree, id) — total order, deterministic
    ranked = und.alias("u").join(
        deg.alias("da"), F.col("u._s") == F.col("da.n")
    ).join(deg.alias("db"), F.col("u._d") == F.col("db.n"))
    lower_first = (F.col("da.deg") < F.col("db.deg")) | (
        (F.col("da.deg") == F.col("db.deg")) & (F.col("u._s") < F.col("u._d"))
    )
    # oriented is consumed TWICE by the wedge self-join — materialize so
    # the two sides read one copy instead of re-running the ranking
    oriented = ranked.select(
        F.when(lower_first, F.col("u._s")).otherwise(F.col("u._d")).alias("a"),
        F.when(lower_first, F.col("u._d")).otherwise(F.col("u._s")).alias("b"),
    ).localCheckpoint(eager=True)
    # wedges from the low vertex: (a->b, a->c), b != c; close with b->c
    # in EITHER orientation of the remaining edge — compare on the
    # canonical (min, max) form so the closing join stays one equi-join.
    w = oriented.alias("e1").join(oriented.alias("e2"), "a").filter(
        F.col("e1.b") < F.col("e2.b")
    )
    wedges = w.select(
        F.col("a"), F.col("e1.b").alias("b"), F.col("e2.b").alias("c")
    )
    closing = und.select(F.col("_s").alias("b"), F.col("_d").alias("c"))
    tris = wedges.join(closing, ["b", "c"])
    return (
        tris.select(
            F.explode(F.array("a", "b", "c")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("triangles"))
    )


def clustering_coefficients(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node local clustering coefficient on the undirected simple
    graph: (node, degree, triangles, wedges, coeff_micros) for every
    node with degree >= 1 — the KG-density diagnostic that tells a
    curator whether an entity's neighborhood is a clique (boilerplate
    co-mention cluster) or a hub of unrelated facts.

    All integers: ``wedges = deg*(deg-1)/2`` (exact — consecutive
    integers), ``coeff_micros = (1_000_000 * triangles) div wedges``
    (0 when wedges == 0, i.e. degree-1 nodes), so the column is
    layout- and engine-portable like everything else under the hash
    contract. Triangle counts come from :func:`triangle_count` (degree-
    ordered orientation, each triangle once); degrees from the same
    symmetrized edge set, so the two sides cannot disagree on the
    graph. One extra left join + the degree agg on top of the triangle
    plan — nodes without triangles get 0, not dropped.
    """
    und, deg0 = _canonical_und(edges, src, dst)
    deg = deg0.select(
        F.col("n").alias("node"), F.col("deg").cast("long").alias("degree")
    )
    tri = _triangles_from(und, deg0)
    # integer div, not `/` — float division loses exactness past 2^53
    # (a 100M-degree hub squares beyond double precision)
    wedges = F.expr("degree * (degree - 1) div 2").cast("long")
    return (
        deg.join(tri, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce(F.col("triangles"), F.lit(0))
            .cast("long")
            .alias("triangles"),
            wedges.alias("wedges"),
        )
        .withColumn(
            "coeff_micros",
            F.when(F.col("wedges") > 0,
                   F.expr("(1000000 * triangles) div wedges"))
            .otherwise(F.lit(0))
            .cast("long"),
        )
    )
