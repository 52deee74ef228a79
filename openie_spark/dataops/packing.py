"""Sequence packing — fill fixed-capacity training windows with whole
chunks so the tokenizer emits dense batches instead of padding: the
step between chunking and tokenization in every LLM data pipeline
(padding a 2048-token context with 60%-empty sequences wastes exactly
that fraction of the training compute).

Reference scope note: the reference (sudoandros/OpenIE) has no corpus
operators; this is the training-data layer beyond parity.

Algorithm: greedy in-order packing — items are scanned in ascending id
order within a shard; an item joins the current pack iff ``fill + len
<= capacity``, else it opens a new pack. Oversized items (len >
capacity) therefore always sit alone in their own pack, with
``overflow`` flagged — callers truncate or split upstream. Greedy
in-order is the streaming-packer standard: deterministic, single pass,
and within-shard locality keeps chunks of the same document adjacent
(ids sort that way), which downstream attention-mask builders want.

Why applyInPandas and not window algebra: the pack assignment is a
RUNNING-REMAINDER recurrence (the state resets on overflow), which no
combination of cumulative windows can express — this is precisely the
case the repo's UDF policy reserves Arrow-batched ``applyInPandas``
for. The sequential scan is per SHARD, and shards are independent:

Scale shape at 100 TB: one shuffle on the shard key, then a linear
in-memory scan per shard. Shard by anything with bounded size (day,
source-bucket, ``doc_id % N``) — a shard must fit one executor's
memory, and ``n_shards`` is the parallelism of the packing stage.
Packing quality is unaffected by sharding (packs never cross shards by
design — a pack is a unit one trainer node reads). Output ids are
(shard, pack_id) — stable under re-runs, engine-portable, and the
whole recurrence is integer arithmetic, so the result is bit-identical
anywhere (the DuckDB oracle replays it as a recursive CTE).
"""

from __future__ import annotations

from typing import List

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    capacity: int,
    shard_col: str = "shard",
    id_col: str = "item_id",
    len_col: str = "n_tokens",
) -> DataFrame:
    """Assign every item a (shard, pack_id, offset) by greedy in-order
    packing. Input must have unique ``id_col`` per shard (the scan
    order); ``len_col`` is the item's token count. Returns the input
    columns plus ``pack_id``, ``offset`` (start position inside the
    pack), and ``overflow`` (len > capacity: the item sits alone).
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be > 0: {capacity}")

    out_schema = df.select(
        shard_col,
        id_col,
        F.col(len_col).cast("long").alias(len_col),
    ).schema.add("pack_id", "long").add("offset", "long").add(
        "overflow", "boolean"
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(
            drop=True
        )
        packs: List[int] = []
        offsets: List[int] = []
        pack, fill = 0, 0
        first = True
        for ln in pdf[len_col]:
            ln = int(ln)
            if first:
                first = False
                fill = ln
            elif fill + ln > capacity:
                pack += 1
                fill = ln
            else:
                fill += ln
            packs.append(pack)
            offsets.append(fill - ln)
        pdf["pack_id"] = pd.Series(packs, dtype="int64")
        pdf["offset"] = pd.Series(offsets, dtype="int64")
        pdf["overflow"] = pdf[len_col] > capacity
        return pdf

    narrow = df.select(
        shard_col, id_col, F.col(len_col).cast("long").alias(len_col)
    )
    return narrow.groupBy(shard_col).applyInPandas(_pack, out_schema)
