"""Capture .explain("formatted") for declared queries into
plans/<tag>/<query>_<suffix>.txt — the optimization-round evidence trail
(guide §1: record the plan shape before and after every change).

Usage: python tools/capture_plans.py <tag> <suffix> [query ...]
e.g.   python tools/capture_plans.py r08 before ngram_overlap token_pmi
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    only = sys.argv[3:]
    sf_dir = "/root/testdata/sf0.01"

    from __spark_entry__ import queries
    from openie_spark.session import build_session

    spark = build_session(app_name=f"capture-plans-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = REPO / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)

    for name, fn in queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # capture the failure instead of dying
            text = f"EXPLAIN FAILED: {exc!r}\n"
        (out_dir / f"{name}_{suffix}.txt").write_text(text)
        print(f"{name}: {len(text)} bytes")
    spark.stop()


if __name__ == "__main__":
    main()
