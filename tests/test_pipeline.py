"""End-to-end pipeline + checkpoint-resume + lineage tests."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from openie_spark.corpus import pages_df
from openie_spark.pipeline import PipelineConfig, run_pipeline


def test_pipeline_end_to_end(spark, tmp_path):
    pages = pages_df(spark, 40, seed=5, n_sents=5, partitions=4)
    cfg = PipelineConfig(
        work_dir=str(tmp_path / "work"),
        skip_clustering=True,  # corpus ≪ MIN_CLUSTER_SIZE·2 sentences
        entities_limit=None,
    )
    out = run_pipeline(spark, pages, cfg, input_fingerprint="t1")

    n_triples = out["triples"].count()
    assert n_triples > 0
    nodes = out["nodes"]
    edges = out["edges"]
    assert nodes.count() > 0
    assert edges.count() > 0
    # degree/frequency aggregates present
    cols = set(nodes.columns)
    assert {"degree_in", "degree_out", "in_weight", "out_weight"} <= cols
    # stage manifests written
    manifests = {p.stem for p in (tmp_path / "work" / "manifests").glob("*.json")}
    assert {"clean", "parses", "triples", "nodes", "edges"} <= manifests
    # lineage has per-partition rows for each stage
    lineage = spark.read.parquet(str(tmp_path / "work" / "lineage"))
    stages = {r["stage"] for r in lineage.select("stage").distinct().collect()}
    assert {"clean", "parses", "triples"} <= stages


def test_pipeline_resume_skips_completed_stages(spark, tmp_path):
    pages = pages_df(spark, 20, seed=6, n_sents=4, partitions=2)
    cfg = PipelineConfig(
        work_dir=str(tmp_path / "work"),
        skip_clustering=True,
        entities_limit=None,
    )
    out1 = run_pipeline(spark, pages, cfg, input_fingerprint="r1")
    t1 = {
        (r["url"], r["left_arg"], r["relation"], r["right_arg"])
        for r in out1["triples"].collect()
    }

    def poisoned_parser(url, text):
        raise RuntimeError("parse stage was re-executed on resume")

    out2 = run_pipeline(
        spark, pages, cfg, page_parser=poisoned_parser, input_fingerprint="r1"
    )
    t2 = {
        (r["url"], r["left_arg"], r["relation"], r["right_arg"])
        for r in out2["triples"].collect()
    }
    assert t1 == t2

    # changing the fingerprint invalidates the resume
    with pytest.raises(Exception):
        run_pipeline(
            spark, pages, cfg, page_parser=poisoned_parser, input_fingerprint="r2"
        )["triples"].count()


def test_manifest_contents(spark, tmp_path):
    pages = pages_df(spark, 10, seed=8, n_sents=3, partitions=2)
    cfg = PipelineConfig(
        work_dir=str(tmp_path / "w"), skip_clustering=True, entities_limit=None,
        skip_merge=True,
    )
    run_pipeline(spark, pages, cfg, input_fingerprint="m1")
    m = json.loads((tmp_path / "w" / "manifests" / "triples.json").read_text())
    assert m["status"] == "ok"
    assert m["rows"] > 0
    assert m["n_partitions"] >= 1
    assert "url" in m["schema"]


def test_fingerprint_is_process_stable():
    """Resume across spark-submit invocations requires a stable fingerprint;
    Python's salted hash() would invalidate every cross-process resume."""
    import subprocess
    import sys

    code = (
        "from openie_spark.pipeline import PipelineConfig;"
        "print(PipelineConfig().fingerprint())"
    )
    outs = {
        subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, cwd="/root/repo",
        ).stdout.strip()
        for _ in range(2)
    }
    assert len(outs) == 1 and "" not in outs


def test_scale_profile_and_parity_guard():
    """PipelineConfig.for_scale() is the documented large-corpus profile
    (VERDICT r4 #5): description sets capped (the measured OOM/
    anti-scaling risk), distributed merge fixpoint forced, work_dir wired
    through — while the bare PipelineConfig() parity defaults stay
    untouched, and strict_parity refuses a description cap (the cap can
    change shared-sentence merge exclusions)."""
    cfg = PipelineConfig.for_scale("/tmp/scale_wd", n_salts=16)
    assert cfg.max_descriptions == 256
    assert cfg.merge_local_threshold == 0
    assert cfg.work_dir == "/tmp/scale_wd"
    assert cfg.n_salts == 16  # overrides pass through
    assert "maxd=256" in cfg.fingerprint()

    assert PipelineConfig().max_descriptions is None  # parity default

    with pytest.raises(ValueError, match="strict_parity"):
        PipelineConfig(strict_parity=True, max_descriptions=256)
    with pytest.raises(ValueError, match="strict_parity"):
        PipelineConfig.for_scale(strict_parity=True)
