"""Structured Streaming lift of the stateless pipeline prefix.

The reference is strictly batch (SURVEY.md §2.10) — this module is the
engine's incremental-ingest extension: clean → parse → extract are
stateless per page, so they lift directly onto a streaming DataFrame; the
global stages (clustering, graph aggregation, merge fixpoint) stay batch
and are driven per micro-batch or on a schedule over the accumulated
triples stage table.

Modes:
- ``stream_triples`` + ``start_triples_sink``: fully streaming
  clean→parse→extract appended to the triples stage table (the
  checkpoint boundary).
- ``start_graph_refresh``: per micro-batch, merge the batch's node/edge
  aggregation deltas into persistent state tables, so the downstream
  graph follows the stream too; ``read_graph_state`` opens the latest
  refreshed graph in the batch output shape.

Watermarking: pages carry ``warc_ts``; a watermark bounds state if a
windowed aggregate (e.g. triples/minute monitoring) is attached. The
extraction path itself is stateless, so late data simply flows through.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .corpus import PAGES_SCHEMA_DDL, STOPWORDS_FIXTURE
from .extract import extract_triples_df, ok_triples
from .parse import PageParser, parse_pages, template_parse_page
from .textclean import clean_pages


def read_pages_stream(
    spark: SparkSession,
    source_dir: str,
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """File-source stream of pages parquet drops (Common-Crawl-dump shape:
    a directory that accumulates WARC-derived parquet files)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def stream_triples(
    pages_stream: DataFrame,
    stopwords=STOPWORDS_FIXTURE,
    embedding_dict: Optional[Dict[str, np.ndarray]] = None,
    lang: Optional[str] = "ru",
    page_parser: PageParser = template_parse_page,
    with_vectors: bool = False,
    dim: int = 64,
) -> DataFrame:
    """Streaming clean→parse→extract: returns a streaming triples frame
    (append-mode compatible — all three stages are stateless projections)."""
    cleaned = clean_pages(pages_stream, lang=lang)
    parses = parse_pages(cleaned, page_parser)
    return ok_triples(
        extract_triples_df(
            parses,
            frozenset(stopwords),
            embedding_dict=embedding_dict,
            dim=dim,
            with_vectors=with_vectors,
        )
    )


def start_triples_sink(
    triples_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    trigger_seconds: Optional[int] = None,
):
    """Append the streaming triples to the triples stage table. Exactly-once
    via the streaming checkpoint; this IS the pipeline's checkpoint-resume
    boundary in streaming mode."""
    writer = (
        triples_stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def triples_rate_monitor(
    pages_stream: DataFrame,
    stopwords=STOPWORDS_FIXTURE,
    lang: Optional[str] = "ru",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Windowed triples-per-warc_ts-window monitor with a watermark bounding
    state for late pages (the one stateful streaming op the engine ships)."""
    cleaned = clean_pages(pages_stream, lang=lang)
    parses = parse_pages(cleaned)
    triples = ok_triples(
        extract_triples_df(parses, frozenset(stopwords), with_vectors=False)
    )
    # re-attach warc_ts (extract keeps only url/sent ids) via the page key
    keyed = pages_stream.select("url", "warc_ts").withWatermark(
        "warc_ts", watermark
    )
    return (
        triples.join(keyed, "url")
        .groupBy(F.window("warc_ts", window))
        .agg(F.count(F.lit(1)).alias("n_triples"))
    )


def start_graph_refresh(
    triples_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    dim: int = 64,
    max_descriptions: Optional[int] = None,
    trigger_seconds: Optional[int] = None,
):
    """Per-micro-batch incremental graph refresh: aggregate each batch of
    triples into node/edge DELTA state and merge it into the persistent
    state tables by key — so the downstream graph tables follow the stream
    instead of stopping at the triples stage.

    The state combine is associative (sums, min-occurrence carries, set
    unions; vectors kept as element-wise sums — see graph.py node_state_
    delta), so over any closed input the refreshed graph EQUALS the batch
    aggregate_nodes/aggregate_edges output regardless of how the stream
    chopped it into micro-batches (pinned by test_streaming_sinks).

    Storage layout: ``{state_dir}/v{epoch:08d}/{nodes,edges}`` — one
    immutable version per epoch, named by the foreachBatch epoch_id so a
    RETRIED epoch overwrites its own directory (idempotent) instead of
    corrupting the previous state, which the merge is still lazily
    reading. The old-state lookup is bounded to versions strictly below
    the current epoch, so a retry whose first attempt already completed
    both table writes (but died before the streaming checkpoint commit)
    re-merges against the PRE-epoch state rather than double-counting
    its own output. Readers open the highest complete version
    (:func:`read_graph_state`); old versions are retained for exactly-once
    retry safety — GC them once the streaming checkpoint has advanced.

    Triples without a ``cluster`` column (clustering is a global batch
    stage) get cluster=0, matching the batch pipeline's skip_clustering
    labeling.
    """
    refresh = make_graph_refresh(
        state_dir, dim=dim, max_descriptions=max_descriptions
    )

    writer = (
        triples_stream.writeStream.foreachBatch(refresh)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def make_graph_refresh(
    state_dir: str,
    dim: int = 64,
    max_descriptions: Optional[int] = None,
):
    """Build the foreachBatch callable :func:`start_graph_refresh` installs.

    Module-level (not a closure inside the writer setup) so the retry
    contract is directly testable: calling ``refresh(batch, N)`` twice —
    the completed-write-but-uncommitted-checkpoint replay — must leave
    state equal to a single application, because the old-state lookup is
    bounded to versions strictly below N (never the retried epoch's own
    v{N} output, which would both double-merge the batch and overwrite a
    path being lazily read)."""
    from .graph import (
        edge_state_delta,
        merge_edge_state,
        merge_node_state,
        node_state_delta,
    )

    def refresh(batch_df: DataFrame, epoch_id: int) -> None:
        if "cluster" not in batch_df.columns:
            batch_df = batch_df.withColumn("cluster", F.lit(0))
        spark = batch_df.sparkSession
        delta_n = node_state_delta(
            batch_df, dim=dim, max_descriptions=max_descriptions
        )
        delta_e = edge_state_delta(batch_df, max_descriptions=max_descriptions)
        cur = _latest_state_version(
            spark, state_dir, max_version=int(epoch_id) - 1
        )
        if cur is not None:
            old_n = spark.read.parquet(f"{state_dir}/v{cur:08d}/nodes")
            old_e = spark.read.parquet(f"{state_dir}/v{cur:08d}/edges")
            new_n = merge_node_state(old_n, delta_n, max_descriptions)
            new_e = merge_edge_state(old_e, delta_e, max_descriptions)
        else:
            new_n, new_e = delta_n, delta_e
        vdir = f"{state_dir}/v{int(epoch_id):08d}"
        new_n.write.mode("overwrite").parquet(f"{vdir}/nodes")
        new_e.write.mode("overwrite").parquet(f"{vdir}/edges")

    return refresh


def _latest_state_version(
    spark: SparkSession, state_dir: str, max_version: Optional[int] = None
) -> Optional[int]:
    """Highest COMPLETE (``_SUCCESS``-marked, both tables) version under
    state_dir, or None. ``max_version`` (inclusive) bounds the search —
    :func:`start_graph_refresh` passes ``epoch_id - 1`` so a retried epoch
    never reads its own output. Hadoop FS API — works on HDFS/S3 paths too."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(state_dir)
    fs = root.getFileSystem(conf)
    if not fs.exists(root):
        return None
    best = None
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("v")):
            continue
        try:
            v = int(name[1:])
        except ValueError:
            continue
        if max_version is not None and v > max_version:
            continue
        ok = all(
            fs.exists(
                jvm.org.apache.hadoop.fs.Path(
                    f"{state_dir}/{name}/{t}/_SUCCESS"
                )
            )
            for t in ("nodes", "edges")
        )
        if ok and (best is None or v > best):
            best = v
    return best


def gc_graph_state(
    spark: SparkSession, state_dir: str, keep: int = 2
) -> int:
    """Drop all but the ``keep`` newest COMPLETE state versions (plus any
    incomplete ones newer than the newest complete, which may be a write
    in flight). Old versions exist only for retry safety — once the
    streaming checkpoint has advanced past an epoch, its predecessors are
    dead weight. Returns the number of versions removed."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(state_dir)
    fs = root.getFileSystem(conf)
    if not fs.exists(root):
        return 0
    complete = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("v")):
            continue
        try:
            v = int(name[1:])
        except ValueError:
            continue
        ok = all(
            fs.exists(
                jvm.org.apache.hadoop.fs.Path(f"{state_dir}/{name}/{t}/_SUCCESS")
            )
            for t in ("nodes", "edges")
        )
        if ok:
            complete.append(v)
    complete.sort()
    removed = 0
    for v in complete[: max(0, len(complete) - max(keep, 1))]:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{state_dir}/v{v:08d}"), True)
        removed += 1
    return removed


def read_graph_state(
    spark: SparkSession,
    state_dir: str,
    max_descriptions: Optional[int] = None,
):
    """Open the latest complete refreshed graph as FINALIZED nodes/edges
    (the aggregate_nodes/aggregate_edges output shape). Returns
    (nodes, edges) or (None, None) when no version is complete yet."""
    from .graph import finalize_edge_state, finalize_node_state

    cur = _latest_state_version(spark, state_dir)
    if cur is None:
        return None, None
    vdir = f"{state_dir}/v{cur:08d}"
    nodes = finalize_node_state(
        spark.read.parquet(f"{vdir}/nodes"), max_descriptions
    )
    edges = finalize_edge_state(
        spark.read.parquet(f"{vdir}/edges"), max_descriptions
    )
    return nodes, edges


def stream_dedup_docs(
    docs_stream: DataFrame,
    ts_col: str = "ingest_ts",
    watermark: str = "10 minutes",
    text_col: str = "text",
) -> DataFrame:
    """First-seen-only streaming exact dedup on the normalized content hash
    — the ingest-side filter of a training-data pipeline (drop re-crawled
    boilerplate before it ever reaches storage).

    Built on ``dropDuplicatesWithinWatermark``: per-key dedup state is
    EVICTED once the watermark passes it, so state is bounded by the
    (event-time window × distinct-hash rate), not by the total corpus —
    the property that makes this viable on an unbounded crawl. A duplicate
    arriving after its original's state expired is re-emitted; choose the
    watermark as the max re-crawl lag to suppress. The content hash is the
    same ``md5(normalized_text)`` the batch exact_dedup groups on, so the
    streamed survivor set matches batch exact_dedup's hash set over any
    closed input."""
    from .dataops.dedup import normalized_text

    hashed = docs_stream.withColumn("content_hash", F.md5(normalized_text(text_col)))
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )
