"""Checkpoint-resume stage ledger + per-partition lineage metrics.

north_rule requirements: "resumable from checkpoint with per-partition
lineage + metrics" and "checkpoint-resume at every stage boundary". Design:

- Every pipeline stage materializes to ``{work_dir}/stages/{name}`` parquet
  (an Iceberg-ready layout: the writer is isolated here so swapping
  ``df.write.parquet`` for ``df.writeTo(...).using("iceberg")`` is a
  one-line change when the runtime catalog exists).
- A manifest JSON per stage records the input fingerprint, row count, wall
  time and schema. A resumed run re-uses any stage whose manifest exists
  and whose fingerprint matches — the reference has no resume at all; its
  closest analogue is the CoNLL-U re-parse boundary it round-trips through
  (/root/reference/relations.py:969), which is exactly our `parses` stage
  checkpoint.
- Per-partition metrics rows (stage, partition_id, rows, bytes-est) land in
  ``{work_dir}/lineage`` parquet, appended per stage.

Fingerprints are caller-supplied strings (config + upstream fingerprints),
not data hashes — hashing 100 TB to decide whether to skip a stage would
defeat the point.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StageLedger:
    def __init__(self, spark: SparkSession, work_dir: str):
        self.spark = spark
        self.work_dir = Path(work_dir)
        (self.work_dir / "stages").mkdir(parents=True, exist_ok=True)
        (self.work_dir / "manifests").mkdir(parents=True, exist_ok=True)

    # -- manifest bookkeeping -------------------------------------------------

    def _manifest_path(self, name: str) -> Path:
        return self.work_dir / "manifests" / f"{name}.json"

    def _stage_path(self, name: str) -> Path:
        return self.work_dir / "stages" / name

    def completed(self, name: str, fingerprint: str) -> bool:
        p = self._manifest_path(name)
        if not p.is_file():
            return False
        try:
            m = json.loads(p.read_text())
        except json.JSONDecodeError:
            return False
        return m.get("fingerprint") == fingerprint and m.get("status") == "ok"

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(str(self._stage_path(name)))

    # -- the stage runner -------------------------------------------------------

    def run_stage(
        self,
        name: str,
        fingerprint: str,
        build: Callable[[], DataFrame],
        partition_by: Optional[list] = None,
    ) -> DataFrame:
        """Run (or resume) one stage: build → write parquet → manifest →
        lineage metrics → read back (so downstream plans scan the
        materialized table, cutting lineage and enabling column pruning)."""
        if self.completed(name, fingerprint):
            return self.read(name)

        t0 = time.monotonic()
        df = build()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(str(self._stage_path(name)))
        wall_s = time.monotonic() - t0

        out = self.read(name)
        part_rows = (
            out.groupBy(F.spark_partition_id().alias("partition_id"))
            .count()
            .collect()
        )
        rows = sum(r["count"] for r in part_rows)

        metrics = self.spark.createDataFrame(
            [
                (name, int(r["partition_id"]), int(r["count"]), float(wall_s))
                for r in part_rows
            ]
            or [(name, -1, 0, float(wall_s))],
            "stage string, partition_id int, rows long, stage_wall_s double",
        ).withColumn("recorded_at", F.current_timestamp())
        metrics.write.mode("append").parquet(str(self.work_dir / "lineage"))

        self._manifest_path(name).write_text(
            json.dumps(
                {
                    "stage": name,
                    "fingerprint": fingerprint,
                    "status": "ok",
                    "rows": rows,
                    "n_partitions": len(part_rows),
                    "wall_s": wall_s,
                    "schema": out.schema.simpleString(),
                },
                indent=2,
            )
        )
        return out

    def lineage(self) -> Optional[DataFrame]:
        p = self.work_dir / "lineage"
        if not p.exists():
            return None
        return self.spark.read.parquet(str(p))

    def invalidate(self, name: str) -> None:
        p = self._manifest_path(name)
        if p.is_file():
            p.unlink()
