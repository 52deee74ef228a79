"""Large-scale training-data pipeline operators.

These go beyond the reference's own operator set (SURVEY.md §2): the
deduplication / similarity-search / text-analysis / multimodal plumbing a
100 TB web-corpus pipeline needs around KG construction. All operators are
DataFrame-native (JVM-side expressions) except where linear algebra
genuinely wants numpy — those run as Arrow-vectorized pandas UDFs.
"""
