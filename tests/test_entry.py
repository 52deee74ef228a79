"""Replicates the driver's correctness gate locally: run every
__spark_entry__ query at sf0.001 and compare SQL-expressible ones against
their DuckDB oracles (row count + order-insensitive values)."""

from __future__ import annotations

import math
from pathlib import Path

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
DRIVER_SF_DIR = "/root/testdata/sf0.01"
HAVE_TESTDATA = Path(SF_DIR).exists()

pytestmark = pytest.mark.skipif(not HAVE_TESTDATA, reason="testdata not present")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# queries whose oracles read goldens/dataops_sf01 (generated from the
# driver's correctness sf0.01 — the documents/embeddings tables DIFFER
# between sf levels, so these must be checked at the sf the goldens were
# built for)
GOLDEN_SF_QUERIES = {"ann_lsh_topk", "simhash_dedup"}


def _connect(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


@pytest.fixture(scope="module")
def duck():
    return _connect(SF_DIR)


@pytest.fixture(scope="module")
def duck_driver_sf():
    return _connect(DRIVER_SF_DIR)


def normalize(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c] if not isinstance(r, tuple) else r[cols.index(c)]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def _compare_with_oracle(spark, con, name, sf_dir):
    q = entrymod.queries()[name]
    sdf = q(spark, sf_dir)
    cols = sdf.columns
    spark_rows = normalize([r.asDict() for r in sdf.collect()], cols)

    res = con.execute(entrymod.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    assert sorted(duck_cols) == sorted(cols), f"column mismatch: {duck_cols} vs {cols}"
    duck_rows = res.fetchall()
    duck_dicts = [dict(zip(duck_cols, r)) for r in duck_rows]
    duck_rows_n = normalize(duck_dicts, cols)

    assert len(spark_rows) == len(duck_rows_n), (
        f"{name}: row count {len(spark_rows)} vs oracle {len(duck_rows_n)}"
    )
    mismatches = [
        (a, b) for a, b in zip(spark_rows, duck_rows_n) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql()))
def test_query_matches_duckdb_oracle(spark, duck, duck_driver_sf, name):
    if name in GOLDEN_SF_QUERIES:
        sf_dir, con = DRIVER_SF_DIR, duck_driver_sf
    else:
        sf_dir, con = SF_DIR, duck
    _compare_with_oracle(spark, con, name, sf_dir)


def test_minhash_banding_recall_exact_at_driver_sf(spark, duck_driver_sf):
    """Pins the claim that makes the minhash_dedup oracle exact: at the
    driver's correctness sf, LSH banding recall over the true J≥0.6 pair
    set is exactly 1 (and precision is 1 via the verify stage), so the
    operator output equals the all-pairs exact-Jaccard set the SQL oracle
    computes. If corpus or parameters drift this fails before the driver
    sees a hash mismatch."""
    _compare_with_oracle(spark, duck_driver_sf, "minhash_dedup", DRIVER_SF_DIR)


@pytest.mark.parametrize(
    "name",
    [
        "events_sessions",
        "events_rollup",
        "node_aggregate",
        "events_rolling",
        "events_quantiles",
        "pagerank",
    ],
)
def test_micros_sums_partition_order_independent(spark, name):
    """Pins the r6 driver-hash failure mode: every oracled micro-unit SUM
    must be computed as sum(per-row bigint micros) — order-independent by
    integer associativity — never round(sum(double)*1e6), whose last-ulp
    partial-agg order dependence flips the rounding on .5-micro-boundary
    groups under a different partition layout. Checked two ways: the
    micros column is integral (a double sum would be rounded at the end,
    type long either way, so also...) the full result set is identical
    under two different shuffle-partition counts."""
    q = entrymod.queries()[name]

    prior = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        a = q(spark, SF_DIR)
        micros_cols = [c for c in a.columns if c.endswith("_micros")]
        assert micros_cols, name
        for c in micros_cols:
            assert dict(a.dtypes)[c] == "bigint", (name, c)
        rows_a = normalize([r.asDict() for r in a.collect()], a.columns)
        spark.conf.set("spark.sql.shuffle.partitions", "37")
        b = q(spark, SF_DIR)
        rows_b = normalize([r.asDict() for r in b.collect()], b.columns)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)
    assert rows_a == rows_b, f"{name}: result depends on partition layout"


def test_rows_only_queries_run(spark):
    """Queries without oracles must at least run and return a stable schema."""
    no_oracle = set(entrymod.queries()) - set(entrymod.oracle_sql())
    # keep the heavy kg_nodes/kg_edges for the dedicated test below
    for name in sorted(no_oracle - {"kg_nodes", "kg_edges", "kg_triples"}):
        df = entrymod.queries()[name](spark, SF_DIR)
        assert df.columns, name
        df.limit(5).collect()


def test_entry_returns_triples(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {
        "url", "sent_id", "left_arg", "relation", "right_arg", "right_deprel"
    }


GOLDEN_DIGESTS = {
    # reference-derived KG goldens (tools/make_goldens.py — live import of
    # /root/reference); regeneration or corpus drift must be LOUD, because
    # kg_triples/kg_nodes/kg_edges hash-exactness is only meaningful if
    # these bytes are the ones the reference actually produced.
    "p500/triples.parquet": ("28305dee1432f63e", 5244),
    "p500/nodes_merged.parquet": ("7acf80729fd210b7", 1831),
    "p500/edges_merged.parquet": ("4484dec5dcc35544", 4345),
    # reference-derived CONFLUENT merge-fixture goldens backing the exact
    # kg_merge_fixpoint_{nodes,edges} oracles (tools/make_merge_goldens.py;
    # digest-identical under two PYTHONHASHSEED values = empirical
    # order-insensitivity of the reference's greedy merge on this corpus)
    "merge_fixture/nodes_merged.parquet": ("336590b09cd2047d", 281),
    "merge_fixture/edges_merged.parquet": ("5366aec5ae7a8200", 156),
    # pure-numpy Lloyd's sweep golden backing the kg_clustering (M2) oracle
    # (tools/make_clustering_goldens.py; unique optimal partition by
    # construction — see corpus.clustering_fixture_rows)
    "clustering/assignments.parquet": ("1212be52f2a9d846", 300),
    # pure-numpy IVF expected-output golden backing the ann_ivf_topk
    # oracle (tools/make_ivf_goldens.py; same unique-optimum blob fixture)
    "ivf/expected_topk.parquet": ("73f1cdd2c2979fc9", 20),
    # per-probe batch variant of the same construction (r5,
    # tools/make_ivf_goldens.py BATCH_PROBE_IDS — one probe per blob)
    "ivf/expected_batch_topk.parquet": ("1c9f4f823c057ea4", 100),
    # second-implementation pure-Python/numpy goldens
    # (tools/make_dataops_goldens.py) backing the simhash_dedup /
    # ann_lsh_topk oracles; dir named for its source sf (driver sf0.01).
    "dataops_sf01/simhash_sigs.parquet": ("3aa550772694206c", 500),
    "dataops_sf01/ann_buckets.parquet": ("faf3ec9e257a5578", 500),
    "dataops_sf01/ann_probe_buckets.parquet": ("eaa9676e039b2635", 79),
}


def test_golden_digests_pinned():
    """Pins the content digest of every checked-in golden parquet, using
    the SAME digest scheme the generator tools print
    (tools/golden_digest.py) so pins and tool output are comparable."""
    import pyarrow.parquet as pq

    from tools.golden_digest import golden_digest

    root = Path(__file__).resolve().parent.parent / "goldens"
    found = {str(p.relative_to(root)) for p in root.rglob("*.parquet")}
    assert found == set(GOLDEN_DIGESTS), (
        f"golden inventory drift: {found ^ set(GOLDEN_DIGESTS)}"
    )
    for rel, (want_digest, want_rows) in GOLDEN_DIGESTS.items():
        rows = pq.read_table(root / rel).to_pylist()
        assert (golden_digest(rows), len(rows)) == (want_digest, want_rows), rel


def test_merged_graph_vs_reference_goldens(spark):
    """DERIVED-bound tolerance oracle on the post-merge graph vs the
    reference's own order-variance envelope (VERDICT r4 #6). The
    reference's greedy merge_relations is not confluent — so instead of
    asserting 1%/3% bands, the live reference was run under 5 shuffled
    sentence-insertion orders plus the canonical one
    (tools/make_merge_envelope.py → goldens/p500/merge_envelope*.json),
    and the bounds are what the reference's own variance measures:

    - total node weight: INVARIANT across every reference order (10488) —
      asserted exactly equal;
    - node count: our bulk-round result must lie INSIDE the reference's
      own [min, max] across orders (measured [1825, 1834]; ours 1826) —
      strictly tighter than the old ±1% band;
    - node key set: the reference's internal max pairwise sym-diff is D
      (measured 28 keys, 1.5%); our min-over-orders sym-diff measures 45
      — just OUTSIDE the pure order-variance cloud, the residual being
      the documented bulk-round-vs-one-at-a-time and edge-weight-sum
      semantic deltas — asserted ≤ 2·D (within twice the reference's own
      internal spread, and decomposed in this docstring rather than
      hidden inside a flat 3% band). The attribution is MEASURED, not
      asserted (r6, tools/measure_strict_envelope.py →
      BENCH/strict_envelope.json): re-running the same corpus under
      strict_parity=True drops the distance 45 → 33, most of the way
      into the reference's own variance cloud, with edge count moving
      4599 → 4442 toward the reference's [4338, 4381] — confirming the
      two semantic deltas account for the residual (strict lands 1838
      nodes, +4 over the band max, the bulk-round interaction in the
      other direction: dropping absorbed in-edges forfeits a few later
      merges);
    - edge count: ours (4599) reflects the documented plain-sum parallel-
      edge semantics (SURVEY §2.6 A5) vs the reference's union — the
      envelope shows order variance alone moves reference edges only
      [4338, 4381] (1%), so the ≤10% band is semantic, kept and now
      attributed; edge weight total stays exactly one-per-triple."""
    import json as _json

    from pyspark.sql import functions as F

    env = _json.loads(Path("goldens/p500/merge_envelope.json").read_text())
    env_keys = _json.loads(
        Path("goldens/p500/merge_envelope_keys.json").read_text()
    )

    out = entrymod._kg_pipeline(spark, SF_DIR, with_merge=True)
    nodes, edges = out["nodes"], out["edges"]
    gn = spark.read.parquet("goldens/p500/nodes_merged.parquet")

    n_ours = nodes.count()
    assert env["node_count_min"] <= n_ours <= env["node_count_max"], (
        n_ours,
        env["node_count_min"],
        env["node_count_max"],
    )

    w_ours = nodes.agg(F.sum("weight")).first()[0]
    assert [w_ours] == env["total_node_weight_values"], w_ours

    ours_keys = {r["lemma_key"] for r in nodes.select("lemma_key").collect()}
    d_internal = env["max_pairwise_key_symdiff"]
    min_symdiff = min(
        len(ours_keys ^ set(ks)) for ks in env_keys.values()
    )
    assert min_symdiff <= 2 * d_internal, (min_symdiff, d_internal)

    ge = spark.read.parquet("goldens/p500/edges_merged.parquet")
    e_ours, e_gold = edges.count(), ge.count()
    assert abs(e_ours - e_gold) / e_gold <= 0.10, (e_ours, e_gold)

    ew_ours = edges.agg(F.sum("weight")).first()[0]
    n_triples = spark.read.parquet("goldens/p500/triples.parquet").count()
    assert ew_ours == n_triples, (ew_ours, n_triples)


def test_kg_nodes_edges_consistent(spark):
    nodes = entrymod.q_kg_nodes(spark, SF_DIR)
    edges = entrymod.q_kg_edges(spark, SF_DIR)
    n = nodes.count()
    e = edges.count()
    assert n > 0 and e > 0
    # every edge endpoint is a node
    from pyspark.sql import functions as F

    srcs = edges.select(F.col("src").alias("lemma_key")).distinct()
    missing = srcs.join(nodes, "lemma_key", "left_anti").count()
    assert missing == 0
