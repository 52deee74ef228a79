"""Local replica of the driver's CORRECTNESS gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB side-by-side at sf0.01,
compare row count, schema (column names sorted), and an order-insensitive
value hash. Use before every round so oracle regressions never reach the
driver.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def value_hash(cols, rows) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    for line in sorted(
        "\x01".join(_cell(r[i]) for i in order) for r in rows
    ):
        h.update(line.encode())
        h.update(b"\x00")
    return h.hexdigest()[:16]


def _cell(v) -> str:
    if v is None:
        return "\x02NULL"
    if isinstance(v, float):
        return repr(round(v, 9))
    return str(v)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    from __spark_entry__ import oracle_sql, queries
    from openie_spark.session import build_session

    spark = build_session(app_name="check-oracles")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    oracles = oracle_sql()
    failures = 0
    for name, fn in queries().items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        s_rows = sdf.collect()
        s_cols = sdf.columns
        if name not in oracles:
            print(f"{name:18s} rows={len(s_rows):6d}  (no_oracle)")
            continue
        o = con.sql(oracles[name])
        o_rows = o.fetchall()
        o_cols = [d[0] for d in o.description]
        ok_rows = len(s_rows) == len(o_rows)
        ok_schema = sorted(s_cols) == sorted(o_cols)
        sh = value_hash(s_cols, [[r[c] for c in s_cols] for r in s_rows])
        oh = value_hash(o_cols, o_rows)
        ok_hash = sh == oh
        status = "OK" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        schema_msg = "ok" if ok_schema else f"{sorted(s_cols)}<>{sorted(o_cols)}"
        hash_msg = "ok" if ok_hash else f"{sh}<>{oh}"
        print(
            f"{name:18s} rows={len(s_rows):6d}/{len(o_rows):6d} "
            f"schema={schema_msg} hash={hash_msg}  {status}"
        )
    print("FAILURES:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
