"""SparkSession factory tuned for this engine.

Every knob here is chosen for the 100 TB design point and documented with
why it also behaves at local[32] sandbox scale:

- AQE on (+ skew join + partition coalescing): the node/edge aggregations
  group by Zipfian lemma keys; AQE splits skewed join partitions at runtime
  and coalesces the long tail of near-empty shuffle partitions.
- Arrow on, batch size capped: the parse/extract stages are mapInPandas;
  10k-row batches keep per-batch Python overhead amortized without letting
  a batch of long documents blow executor memory.
- shuffle.partitions defaults to 2-4× cores locally; on a real cluster this
  is overridden via spark-submit conf (or left to AQE's coalescing from a
  high initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "openie-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N]: N slots; 2× gives AQE room to coalesce without tiny tasks
        n = cpus if not master.startswith("local[") else _local_cores(master, cpus)
        shuffle_partitions = max(8, 2 * n)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # 16 MB: genuinely small dims (stopwords, merge mappings, cluster
        # labels) still broadcast; accidental broadcasts of million-row
        # degree/candidate tables — built single-threaded on the driver —
        # do not (measured as the serial chunk of the graph phase)
        .config("spark.sql.autoBroadcastJoinThreshold", str(16 * 1024 * 1024))
        # Exclude wide plans from whole-stage codegen. The node aggregation
        # carries dim (64+) element-wise vector-sum columns; codegen of that
        # aggregate generates a method past the JIT's huge-method limit, so
        # it runs as INTERPRETED BYTECODE — measured slower than Spark's own
        # non-codegen path (15.7s vs 6.6s warm at sf0.1) — and its one-time
        # janino compile costs ~25s of the first execution (the 44.9s
        # kg_graph outlier in BENCH_r01). Narrow hot paths (≤50 fields:
        # extract, cleaning, joins, dedup) keep codegen.
        .config("spark.sql.codegen.maxFields", "50")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    # experiment hook: SPARK_GRAFT_EXTRA_CONF="k=v;k2=v2" overlays configs
    # without touching call sites (used by the scaling A/B tools)
    for kv in filter(None, os.environ.get("SPARK_GRAFT_EXTRA_CONF", "").split(";")):
        k, _, v = kv.partition("=")
        builder = builder.config(k.strip(), v.strip())
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _local_cores(master: str, default: int) -> int:
    inner = master[len("local[") : -1]
    if inner == "*":
        return os.cpu_count() or default
    try:
        return int(inner)
    except ValueError:
        return default
