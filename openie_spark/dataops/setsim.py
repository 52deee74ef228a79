"""Generic set-similarity join over a (key, value) relation — Jaccard
between the value-sets of every key pair that shares at least one
value: hosts by outlink targets, users by items, entities by
co-mentions. The categorical generalization of the text family
(ngram_jaccard works on shingle strings; this works on any relation
without materializing per-key arrays of text).

Scale shape: candidates come from a self-join ON THE VALUE key with
the posting-list hygiene the dedup family standardized — values shared
by more than ``max_value_df`` keys are dropped before pairing (a hub
value contributes O(df²) candidate pairs of near-zero signal, and its
absence only LOWERS estimated similarity; set sizes stay exact).
Intersection counts come from the same capped relation in one
map-side-combinable groupBy — no arrays are carried; union sizes via
|A| + |B| - |A∩B|. Output similarity is integer micros
(``1e6 * co div union``), so the join sits under the full value-hash
contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def set_jaccard_join(
    df: DataFrame,
    key_col: str,
    value_col: str,
    threshold_micros: int = 100_000,
    max_value_df: int = 1000,
) -> DataFrame:
    """(key_a, key_b, co, size_a, size_b, jaccard_micros) for every
    key pair with jaccard >= threshold, key_a < key_b canonical.
    ``co`` counts shared values among the df-capped value set; sizes
    are exact distinct-value counts per key (so the reported
    similarity is a floor — dropping a hub value can only undercount
    the intersection)."""
    rel = (
        df.select(
            F.col(key_col).alias("_k"), F.col(value_col).alias("_v")
        )
        .distinct()
    )
    sizes = rel.groupBy(F.col("_k").alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("size")
    )
    ok = (
        rel.groupBy("_v")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= max_value_df)
        .select("_v")
    )
    capped = rel.join(F.broadcast(ok), "_v", "left_semi")
    co = (
        capped.alias("a")
        .join(capped.alias("b"), "_v")
        .filter(F.col("a._k") < F.col("b._k"))
        .groupBy(
            F.col("a._k").alias("key_a"), F.col("b._k").alias("key_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("co"))
    )
    out = (
        co.join(
            sizes.select(
                F.col("key").alias("key_a"), F.col("size").alias("size_a")
            ),
            "key_a",
        )
        .join(
            sizes.select(
                F.col("key").alias("key_b"), F.col("size").alias("size_b")
            ),
            "key_b",
        )
        .withColumn(
            "jaccard_micros",
            F.expr("(1000000 * co) div (size_a + size_b - co)").cast(
                "long"
            ),
        )
        .select(
            "key_a", "key_b", "co", "size_a", "size_b", "jaccard_micros"
        )
    )
    return out.filter(F.col("jaccard_micros") >= threshold_micros)
