"""Replicates the driver's correctness gate locally: run every
__spark_entry__ query at sf0.001 and compare SQL-expressible ones against
their DuckDB oracles (row count + order-insensitive values)."""

from __future__ import annotations

import math
from pathlib import Path

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
HAVE_TESTDATA = Path(SF_DIR).exists()

pytestmark = pytest.mark.skipif(not HAVE_TESTDATA, reason="testdata not present")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


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


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql()))
def test_query_matches_duckdb_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    cols = sdf.columns
    spark_rows = normalize([r.asDict() for r in sdf.collect()], cols)

    res = duck.execute(entrymod.oracle_sql()[name])
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
