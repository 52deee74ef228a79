"""Structured Streaming lift of the stateless pipeline prefix.

The reference is strictly batch (SURVEY.md §2.10) — this module is the
engine's incremental-ingest extension: clean → parse → extract are
stateless per page, so they lift directly onto a streaming DataFrame; the
global stages (clustering, graph aggregation, merge fixpoint) stay batch
and are driven per micro-batch or on a schedule over the accumulated
triples stage table.

Two modes:
- ``stream_triples``: fully streaming clean→parse→extract; append-mode sink.
- ``stream_pipeline_foreachBatch``: per micro-batch, extract triples and
  append them to the triples stage table (the checkpoint boundary); graph
  refresh happens out-of-band (e.g. the batch pipeline on the stage table).

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
