"""spark-submit entry point.

    spark-submit --py-files openie_spark.zip -m openie_spark run \\
        --pages /data/pages --out /data/kg --entities-limit 10000

Subcommands:
- ``run``       batch pipeline over a pages parquet/table path
- ``demo``      deterministic synthetic corpus end-to-end (no input needed)
- ``parse``     parse-only: pages → CoNLL-U (EP3, the reference's /parse
                route, app.py:63-66 — text in, CoNLL-U out, no extraction)
- ``stream``    streaming clean→parse→extract from a directory source
- ``package``   build openie_spark.zip for --py-files shipping

In local sandbox use, ``python -m openie_spark demo --pages-n 500`` runs
the whole engine without any external data or cluster.
"""

from __future__ import annotations

import argparse
import sys


def _add_common(ap: argparse.ArgumentParser) -> None:
    ap.add_argument("--lang", default="ru")
    ap.add_argument("--entities-limit", type=int, default=None)
    ap.add_argument("--work-dir", default=None, help="checkpoint/lineage dir")
    ap.add_argument("--out", default=None, help="output dir for node/edge tables")
    ap.add_argument("--no-merge", action="store_true")
    ap.add_argument("--no-cluster", action="store_true")
    ap.add_argument("--max-descriptions", type=int, default=None)
    ap.add_argument("--strict-parity", action="store_true")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="openie_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    run_p = sub.add_parser("run", help="batch pipeline over pages parquet")
    run_p.add_argument("--pages", required=True)
    _add_common(run_p)

    demo_p = sub.add_parser("demo", help="synthetic corpus end-to-end")
    demo_p.add_argument("--pages-n", type=int, default=500)
    _add_common(demo_p)

    parse_p = sub.add_parser("parse", help="parse-only: pages → CoNLL-U")
    parse_p.add_argument("--pages", default=None, help="pages parquet path")
    parse_p.add_argument("--pages-n", type=int, default=None, help="demo corpus size")
    parse_p.add_argument("--out", required=True)
    parse_p.add_argument("--lang", default="ru")
    parse_p.add_argument(
        "--text-files",
        action="store_true",
        help="also write one .conllu file per page (driver-side, small outputs)",
    )

    stream_p = sub.add_parser("stream", help="streaming triple extraction")
    stream_p.add_argument("--source", required=True)
    stream_p.add_argument("--out", required=True)
    stream_p.add_argument("--checkpoint", required=True)
    stream_p.add_argument("--lang", default="ru")

    pkg_p = sub.add_parser("package", help="build zip for --py-files")
    pkg_p.add_argument("--out", default="openie_spark.zip")

    args = ap.parse_args(argv)

    if args.cmd == "package":
        return _package(args.out)

    from .session import build_session

    spark = build_session(app_name=f"openie-{args.cmd}")

    if args.cmd == "parse":
        from .corpus import pages_df
        from .parse import parse_pages
        from .sinks import conllu_df
        from .textclean import clean_pages

        if args.pages:
            pages = spark.read.parquet(args.pages)
        else:
            pages = pages_df(spark, args.pages_n or 500, seed=42, n_sents=6)
        out_df = conllu_df(parse_pages(clean_pages(pages, lang=args.lang)))
        out_df.write.mode("overwrite").parquet(f"{args.out}/conllu")
        n = spark.read.parquet(f"{args.out}/conllu").count()
        print(f"conllu_pages={n} written: {args.out}/conllu")
        if args.text_files:
            import hashlib
            import re
            from pathlib import Path

            d = Path(args.out, "files")
            d.mkdir(parents=True, exist_ok=True)
            for r in spark.read.parquet(f"{args.out}/conllu").collect():
                # distinct urls can share a sanitized 120-char suffix; a
                # stable hash of the full url keeps filenames collision-free
                safe = re.sub(r"[^A-Za-z0-9._-]", "_", r["url"])[-120:]
                tag = hashlib.sha1(r["url"].encode("utf-8")).hexdigest()[:8]
                (d / f"{safe}-{tag}.conllu").write_text(r["conllu"], encoding="utf-8")
            print(f"files: {d}")
        return 0

    if args.cmd == "stream":
        from .streaming import read_pages_stream, start_triples_sink, stream_triples

        stream = stream_triples(read_pages_stream(spark, args.source), lang=args.lang)
        q = start_triples_sink(stream, args.out, args.checkpoint)
        q.awaitTermination()
        return 0

    from .pipeline import PipelineConfig, run_pipeline

    cfg = PipelineConfig(
        lang=args.lang,
        entities_limit=args.entities_limit,
        work_dir=args.work_dir,
        skip_merge=args.no_merge,
        skip_clustering=args.no_cluster,
        max_descriptions=args.max_descriptions,
        strict_parity=args.strict_parity,
    )

    if args.cmd == "demo":
        from .corpus import pages_df

        pages = pages_df(spark, args.pages_n, seed=42, n_sents=6)
        fingerprint = f"demo:{args.pages_n}"
    else:
        pages = spark.read.parquet(args.pages)
        fingerprint = f"run:{args.pages}"

    out = run_pipeline(spark, pages, cfg, input_fingerprint=fingerprint)
    n_triples = out["triples"].count()
    n_nodes = out["nodes"].count()
    n_edges = out["edges"].count()
    print(f"triples={n_triples} nodes={n_nodes} edges={n_edges}")

    if args.out:
        from .sinks import write_graph_tables

        write_graph_tables(out["nodes"], out["edges"], args.out)
        out["triples"].write.mode("overwrite").parquet(f"{args.out}/triples")
        print(f"written: {args.out}/{{nodes,edges,triples}}")
    return 0


def _package(out: str) -> int:
    import zipfile
    from pathlib import Path

    pkg_dir = Path(__file__).parent
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in sorted(pkg_dir.rglob("*.py")):
            zf.write(p, f"openie_spark/{p.relative_to(pkg_dir)}")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
