"""openie_spark — a PySpark-native open-information-extraction and
knowledge-graph-construction engine.

Brand-new, Spark-first re-design (NOT a port) with the query / data-processing
capabilities of the reference system sudoandros/OpenIE (studied in SURVEY.md):

- HTML-to-text extraction, byte-identical per url to the reference cleaners
  (/root/reference/syntax.py:17-57), as a vectorized Arrow pandas UDF.
- Batched tokenize / tag / dependency-parse behind a pluggable Parser seam
  (mapInPandas; the reference's UDPipe model is a C++ singleton,
  /root/reference/udpipe_model.py:17-21).
- The reference's per-sentence dependency-tree triple-extraction rule algebra
  (/root/reference/relations.py:44-369) re-implemented as pure Python functions
  executed inside mapInPandas.
- Entity canonicalization (cluster- and cosine-gated node merging,
  /root/reference/relations.py:417-810) as a driver-side fixpoint loop of
  DataFrame joins + broadcast-map rewrites.
- Graph materialization as partitioned parquet (Iceberg-ready) node/edge
  tables with degree and frequency aggregates.
- Checkpoint-resume at every stage boundary with per-partition lineage rows.

Plus the large-scale training-data operators a 100 TB corpus pipeline needs:
exact / MinHash-LSH / SimHash / n-gram-Jaccard deduplication, embedding
similarity search, language-ID / quality scoring / token counting /
fingerprinting, and multimodal binary-column plumbing (openie_spark.dataops).
"""

__version__ = "0.1.0"
