"""CLI subcommand tests (in-process main(); build_session getOrCreate
reuses the test session)."""

from __future__ import annotations

from pathlib import Path

from openie_spark.__main__ import main


def test_parse_subcommand_emits_conllu(spark, tmp_path):
    out = str(tmp_path / "parsed")
    rc = main(["parse", "--pages-n", "40", "--out", out, "--text-files"])
    assert rc == 0

    df = spark.read.parquet(f"{out}/conllu")
    rows = df.collect()
    assert rows and all(r["conllu"].strip() for r in rows)

    # round-trip: emitted CoNLL-U parses back into sentences with tokens
    from openie_spark.conllu import parse_conllu

    sents = parse_conllu(rows[0]["conllu"])
    assert sents and all(toks for _, toks in sents)

    files = list(Path(out, "files").glob("*.conllu"))
    assert len(files) == len(rows)
    assert files[0].read_text(encoding="utf-8").strip()
