"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding near-dup.

Design stance: EVERYTHING stays JVM-side — shingling is a let-bound
``transform``/``sequence`` over split tokens, MinHash signatures hash each
shingle once (``xxhash64`` mod 2³¹−1) and derive lanes with affine mixes,
SimHash is an xxhash64-per-token bit-vote ``aggregate`` fold, LSH banding
is a groupBy on banded signature slices, Jaccard verification is an
array-intersect join. There is NO Python in any hot path.

Scale notes per operator:
- exact: one shuffle on the content hash; the canonical-survivor choice is
  min(doc_id) so re-runs are stable.
- MinHash LSH: shuffle is on (band_id, band_hash) — bucket sizes are the
  skew risk; ``max_bucket`` drops pathological buckets (boilerplate pages)
  exactly like production dedup pipelines do, and drops are observable in
  the returned bucket stats rather than silent.
- n-gram Jaccard: candidate generation via shared-shingle equi-join is
  quadratic per shingle posting list; ``blocking_col`` (e.g. source/domain)
  and a DF (document-frequency) cap bound it.
- embedding near-dup: exact within blocking key; the scale path is the
  random-hyperplane bucketing in similarity.py reused as the blocker.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def normalized_text(col: str = "text") -> F.Column:
    """Lowercase + whitespace-collapse + trim — the canonical form used by
    exact dedup and fingerprinting (kept identical in the DuckDB oracles)."""
    return F.trim(F.regexp_replace(F.lower(F.col(col)), r"\s+", " "))


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup on md5(normalized text): one survivor (min id) per
    content hash, with the duplicate count."""
    h = F.md5(normalized_text(text_col)).alias("content_hash")
    return (
        df.select(F.col(id_col), h)
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def word_shingles(text_col: str, n: int = 3) -> F.Column:
    """Distinct word n-gram shingles as an array column (JVM-side).

    The token array is LET-BOUND via a 1-element ``transform`` so the
    normalize+split subtree evaluates once per row. Referencing it directly
    inside the shingle lambda re-evaluates the whole
    lower→regexp_replace→trim→split chain once per shingle element
    (higher-order-function lambdas re-eval captured subtrees per element;
    measured: ~50× re-normalization per doc, 3.6s → 0.2s at 5k docs)."""
    toks = F.split(normalized_text(text_col), " ")
    return F.transform(
        F.array(toks),
        lambda t: F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(t) - n, F.lit(0))),
                lambda i: F.array_join(F.slice(t, i + 1, n), " "),
            )
        ),
    )[0]


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, signature array<long>) — signature[i] = min over shingles of
    lane_i(shingle), where lane_i is a universal affine hash.

    Each shingle STRING is hashed exactly ONCE (``xxhash64`` reduced mod
    the Mersenne prime p = 2³¹−1); the ``n_hashes`` signature lanes are
    then derived with affine mixes ``(aᵢ·h + bᵢ) mod p`` — the standard
    universal family for MinHash (Broder's original construction). Same
    MinHash guarantees, ~64× fewer string-hash evaluations than the
    previous ``xxhash64(shingle, seed_i)``-per-lane fold, which was 55% of
    total bench wall. The affine arithmetic is pure long multiply/add/mod:
    a, h < 2³¹ keeps every product under 2⁶² — no overflow, ANSI-safe.

    Signatures are per-document state, so this is a pure narrow projection:
    one ``transform`` (string hash per shingle) + one ``aggregate`` fold
    per row, NO explode, NO shuffle, no wide aggregate. The fold shape
    matters: a nested ``transform(seeds, i -> array_min(transform(
    shingles, ...)))`` re-evaluates the O(len²) shingle construction once
    per seed after Catalyst collapses the projections (measured: minutes
    instead of seconds at 5k docs). ``aggregate``/``transform`` evaluate
    their input array exactly once. Documents with zero shingles are
    dropped, matching the old aggregate formulation.

    Reducing h to 31 bits merges distinct shingles with probability
    ~n²/2³² per document (≈2% odds at 10k shingles) — harmless: a merged
    shingle perturbs the Jaccard ESTIMATE only, and every emitted pair is
    exact-verified downstream (verify_jaccard)."""
    import random

    P31 = (1 << 31) - 1  # Mersenne prime 2^31 - 1
    # deterministic lane coefficients: fixed seed, independent of n_hashes
    rnd = random.Random(0x9E3779B9)
    lanes = [(rnd.randrange(1, P31), rnd.randrange(0, P31)) for _ in range(n_hashes)]
    ab = F.array(
        *[
            F.struct(
                F.lit(a).cast("long").alias("a"), F.lit(b).cast("long").alias("b")
            )
            for a, b in lanes
        ]
    )  # foldable → one literal array
    shs = word_shingles(text_col, shingle_n)
    # Formulation note (r8, measured both ways): a transposed per-lane
    # scalar ``aggregate`` over the let-bound hash array (no per-shingle
    # array allocation) measured 2× FASTER at 5k docs (0.87→0.46s) but
    # ~25% SLOWER at 50k docs (2.63→3.34s) — the zip_with fold wins at
    # scale, so it stays (guide §1.2: re-measure at more than one size
    # before adopting).
    hv = F.transform(F.col("_shs"), lambda s: F.pmod(F.xxhash64(s), F.lit(P31)))
    sig = F.aggregate(
        hv,
        F.array_repeat(F.lit(P31).cast("long"), n_hashes),
        lambda acc, h: F.zip_with(
            acc, ab, lambda m, c: F.least(m, (c["a"] * h + c["b"]) % P31)
        ),
    )
    return (
        df.select(F.col(id_col), shs.alias("_shs"))
        .filter(F.size("_shs") > 0)
        .select(F.col(id_col), sig.alias("signature"))
    )


def minhash_bands(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, band, band_hash) — each document's LSH banding entries: the
    signature split into ``bands`` row-groups, each hashed to one bucket
    key. Deterministic per (text, parameters), so entries computed in
    different batches are join-compatible — the property the streaming
    dedup refresh relies on (a cross-batch near-dup pair surfaces when
    the later doc's band entry joins the earlier doc's stored entry)."""
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n_hashes, shingle_n)
    return sig.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.array_join(
                        F.transform(
                            F.slice(
                                F.col("signature"),
                                b * rows_per_band + 1,
                                rows_per_band,
                            ),
                            lambda x: x.cast("string"),
                        ),
                        ",",
                    )
                ),
            )
        ).alias("band", "band_hash"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 8,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.7,
    max_bucket: int = 200,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact Jaccard verify.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.
    """
    banded = minhash_bands(df, id_col, text_col, n_hashes, bands, shingle_n)
    # drop pathological buckets (boilerplate) — observable, not silent
    w = Window.partitionBy("band", "band_hash")
    banded = banded.withColumn("bucket_size", F.count(F.lit(1)).over(w)).filter(
        F.col("bucket_size") <= max_bucket
    )
    a = banded.select(
        F.col("band"), F.col("band_hash"), F.col(id_col).alias("id_a")
    )
    b = banded.select(
        F.col("band"), F.col("band_hash"), F.col(id_col).alias("id_b")
    )
    cand = (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return verify_jaccard(df, cand, id_col, text_col, shingle_n).filter(
        F.col("jaccard") >= jaccard_threshold
    )


def minhash_join_pairs(
    df_a: DataFrame,
    df_b: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 8,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.7,
    max_bucket: int = 200,
    checkpoint_dir: Optional[str] = None,
) -> DataFrame:
    """Cross-corpus near-duplicate pairs — the DECONTAMINATION primitive
    of a training-data pipeline: which docs in ``df_a`` (the training
    set) are near-dups of docs in ``df_b`` (the eval/benchmark set).

    Returns (id_a, id_b, jaccard) with id_a from df_a, id_b from df_b,
    exact shingle Jaccard ≥ threshold. Same contract as minhash_lsh_pairs
    restricted to cross pairs: band entries are deterministic per (text,
    parameters) (see minhash_bands), so each side is banded independently
    and candidates are one (band, band_hash) equi-join — never |A|×|B|.
    The skew cap drops buckets exceeding ``max_bucket`` PER SIDE (a
    boilerplate bucket is pathological whichever corpus it comes from);
    verification is exact on the candidate set, so precision is 1 by
    construction. At 100 TB: the eval side is typically tiny — its banded
    table broadcasts and the training corpus is scanned once."""
    ba = minhash_bands(
        df_a, id_col, text_col, n_hashes, bands, shingle_n
    ).select("band", "band_hash", F.col(id_col).alias("id_a"))
    bb = minhash_bands(
        df_b, id_col, text_col, n_hashes, bands, shingle_n
    ).select("band", "band_hash", F.col(id_col).alias("id_b"))

    def cap(df):
        w = Window.partitionBy("band", "band_hash")
        return df.withColumn("_bs", F.count(F.lit(1)).over(w)).filter(
            F.col("_bs") <= max_bucket
        ).drop("_bs")

    cand = (
        cap(ba)
        .join(cap(bb), ["band", "band_hash"])
        .select("id_a", "id_b")
        .distinct()
    )
    # consumed three times (two id semi-joins + the final pair join): pin
    # so the banding join runs once, not thrice — same rationale and
    # tradeoff as verify_jaccard's pairs cache. With checkpoint_dir the
    # pin is a durable per-call parquet snapshot (gc_join_pairs reclaims
    # it) — the loop-safe choice: cache() leaves blocks pinned until the
    # returned plan is dropped, so repeated decontamination calls in one
    # long session would otherwise accumulate cached candidate sets.
    if checkpoint_dir is not None:
        import uuid as _uuid

        path = f"{checkpoint_dir}/join_pairs/run_{_uuid.uuid4().hex[:12]}"
        cand.write.mode("overwrite").parquet(path)
        cand = df_a.sparkSession.read.parquet(path)
    else:
        cand = cand.cache()
    sh_a = df_a.join(
        cand.select(F.col("id_a").alias(id_col)).distinct(), id_col, "left_semi"
    ).select(
        F.col(id_col).alias("id_a"),
        word_shingles(text_col, shingle_n).alias("shs_a"),
    )
    sh_b = df_b.join(
        cand.select(F.col("id_b").alias(id_col)).distinct(), id_col, "left_semi"
    ).select(
        F.col(id_col).alias("id_b"),
        word_shingles(text_col, shingle_n).alias("shs_b"),
    )
    return (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn("n_inter", F.size(F.array_intersect("shs_a", "shs_b")))
        .withColumn(
            "jaccard",
            F.col("n_inter")
            / (F.size("shs_a") + F.size("shs_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **join_kwargs,
) -> DataFrame:
    """Drop every training doc that near-duplicates an eval/benchmark doc
    (the standard leakage guard before pretraining). One anti-join against
    the contaminated-id set from :func:`minhash_join_pairs`."""
    pairs = minhash_join_pairs(train, eval_df, id_col, text_col, **join_kwargs)
    contaminated = pairs.select(F.col("id_a").alias(id_col)).distinct()
    return train.join(contaminated, id_col, "left_anti")


def verify_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    method: str = "arrays",
    checkpoint_dir: Optional[str] = None,
) -> DataFrame:
    """Exact Jaccard on shingle sets for candidate pairs.

    method="arrays" (default): join the pair list to pre-aggregated shingle
    arrays (two id-key joins) and compute ``size(array_intersect(...))``
    JVM-side. One shuffle per side, no shingle re-explode — candidate counts
    are already bounded by banding / DF caps upstream, so carrying two
    arrays per pair row is cheap and this beats the explode plan by an
    order of magnitude at bench scale.

    r4: shingles are computed ONLY for documents that appear in a pair —
    the candidate-id set (tiny by the banding/DF-cap bounds) is
    semi-joined against ``df`` BEFORE the shingle projection. The naive
    shape shingled the FULL corpus twice (the shingle subtree appears
    once per join side and Catalyst does not CSE across subtrees) — two
    extra full-corpus passes at 100 TB. ``pairs`` is consumed three times
    (two joins + the id set), so it is pinned: ``cache()`` by default —
    lazy (this function stays plan-building with no eager side effect)
    and fault-tolerant (a lost block recomputes from lineage, unlike the
    non-replicated executor blocks of localCheckpoint — SCALE.md §4) —
    or a durable parquet round-trip when ``checkpoint_dir`` is given (the
    cluster-grade choice when the candidate lineage is too expensive to
    risk recomputing; this path IS eager: it writes on call). Measured
    sandbox tradeoff (sf0.1, A/B): pinning + semi-join add ~0.7s of
    fixed stage latency vs the double-full-shingle shape (2.4s → 3.2s) —
    accepted, because at corpus scale the old shape's two extra full
    passes dominate while the new shape's extra cost stays O(candidates).
    The cached pairs table is O(candidates) rows of two ids — eviction
    pressure is negligible; callers looping many verify calls can
    ``unpersist()`` the returned plan's source or pass checkpoint_dir.

    method="explode": the shingle-equi-join plan — keeps per-row state tiny
    (one shingle per row), the right choice only when individual documents
    have huge shingle sets AND the candidate pair list is massive.
    """
    if method == "arrays":
        if checkpoint_dir is not None:
            import uuid as _uuid

            # per-call unique snapshot under a gc-able root: the returned
            # plan reads this path lazily, so no call may delete a sibling
            # implicitly — reclaim old snapshots with gc_verify_pairs
            path = (
                f"{checkpoint_dir}/verify_pairs/run_{_uuid.uuid4().hex[:12]}"
            )
            pairs.write.mode("overwrite").parquet(path)
            pairs = df.sparkSession.read.parquet(path)
        else:
            pairs = pairs.cache()
        ids = (
            pairs.select(F.col("id_a").alias(id_col))
            .unionByName(pairs.select(F.col("id_b").alias(id_col)))
            .distinct()
        )
        cand_docs = df.join(ids, id_col, "left_semi")
        sh = cand_docs.select(
            F.col(id_col).alias("_id"),
            word_shingles(text_col, shingle_n).alias("shs"),
        )
        out = (
            pairs.join(
                sh.select(F.col("_id").alias("id_a"), F.col("shs").alias("shs_a")),
                "id_a",
            )
            .join(
                sh.select(F.col("_id").alias("id_b"), F.col("shs").alias("shs_b")),
                "id_b",
            )
            .withColumn("n_inter", F.size(F.array_intersect("shs_a", "shs_b")))
            .withColumn(
                "jaccard",
                F.col("n_inter")
                / (F.size("shs_a") + F.size("shs_b") - F.col("n_inter")),
            )
        )
        return out.select("id_a", "id_b", "jaccard")
    if method != "explode":
        raise ValueError(f"unknown verify method: {method!r}")
    return _verify_jaccard_explode(df, pairs, id_col, text_col, shingle_n)


def gc_join_pairs(spark, checkpoint_dir: str, keep: int = 1) -> int:
    """Garbage-collect old minhash_join_pairs candidate snapshots under
    ``{checkpoint_dir}/join_pairs`` (one per call when checkpoint_dir is
    passed), keeping the ``keep`` most recent. Returns dirs removed."""
    from ..fsgc import gc_child_dirs

    return gc_child_dirs(spark, f"{checkpoint_dir}/join_pairs", keep)


def gc_verify_pairs(spark, checkpoint_dir: str, keep: int = 1) -> int:
    """Explicitly garbage-collect old verify_jaccard pair snapshots under
    ``{checkpoint_dir}/verify_pairs``, keeping the ``keep`` most recent.
    verify_jaccard(checkpoint_dir=...) writes one snapshot per call and
    its returned plan reads it lazily, so — like merge/cc runs — disk is
    reclaimed only by this explicit step. Returns dirs removed."""
    from ..fsgc import gc_child_dirs

    return gc_child_dirs(spark, f"{checkpoint_dir}/verify_pairs", keep)


def _verify_jaccard_explode(df, pairs, id_col, text_col, shingle_n):
    sh = df.select(
        F.col(id_col).alias("_id"), word_shingles(text_col, shingle_n).alias("shs")
    )
    sizes = sh.select("_id", F.size("shs").alias("n_sh"))
    exploded = sh.select("_id", F.explode("shs").alias("sh"))

    pa = pairs.join(exploded.withColumnRenamed("_id", "id_a"), "id_a").select(
        "id_a", "id_b", "sh"
    )
    pb = exploded.withColumnRenamed("_id", "id_b").withColumnRenamed("sh", "sh_b")
    inter = (
        pa.join(pb, (pa.id_b == pb.id_b) & (pa.sh == pb.sh_b))
        .groupBy("id_a", pa.id_b)
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .fillna(0, subset=["n_inter"])
        .join(sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
    )
    return out.select("id_a", "id_b", "jaccard")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
    blocking_col: Optional[str] = None,
    max_shingle_df: int = 1000,
) -> DataFrame:
    """All-pairs n-gram Jaccard ≥ threshold via shared-shingle candidate
    join. ``max_shingle_df`` drops stop-shingles (posting lists longer than
    this generate O(df²) candidates for no signal)."""
    cols = [F.col(id_col).alias("_id"), word_shingles(text_col, shingle_n).alias("shs")]
    if blocking_col:
        cols.append(F.col(blocking_col).alias("_blk"))
    sh = df.select(*cols)
    exploded = sh.select(
        "_id", *( ["_blk"] if blocking_col else [] ), F.explode("shs").alias("sh")
    )
    df_counts = exploded.groupBy("sh").count().filter(F.col("count") <= max_shingle_df)
    exploded = exploded.join(F.broadcast(df_counts.select("sh")), "sh", "left_semi")

    join_keys = ["sh"] + (["_blk"] if blocking_col else [])
    a = exploded.select(*join_keys, F.col("_id").alias("id_a"))
    b = exploded.select(*join_keys, F.col("_id").alias("id_b"))
    cand = (
        a.join(b, join_keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return verify_jaccard(df, cand, id_col, text_col, shingle_n).filter(
        F.col("jaccard") >= threshold
    )


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold_micros: int = 800_000,
    blocking_col: Optional[str] = None,
    max_shingle_df: int = 1000,
) -> DataFrame:
    """ASYMMETRIC overlap detection: pairs where either document's
    shingle set is >= threshold contained in the intersection —
    ``containment(A, B) = |A ∩ B| / |A|`` — the quote/excerpt/
    boilerplate-inclusion relation that symmetric Jaccard structurally
    misses (a paragraph quoted inside a book has Jaccard ≈ |p|/|book|
    ≈ 0 but containment(p) = 1; train-eval contamination is usually
    THIS shape: the eval item embedded in a larger page).

    Candidates come from the same DF-capped shared-shingle posting join
    as :func:`ngram_jaccard_pairs` (a contained document shares ALL its
    shingles, so any non-stop shingle surfaces the pair; ``max_shingle_df``
    bounds hub-shingle fan-out). Verification joins the two
    pre-aggregated shingle arrays and emits integer micros both
    directions: (id_a, id_b, inter, size_a, size_b,
    containment_a_micros, containment_b_micros), keeping pairs where
    the LARGER direction clears ``threshold_micros``. All counts and
    micros are integers (``1e6 * inter div size``), so the operator
    sits under the full value-hash contract."""
    cols = [
        F.col(id_col).alias("_id"),
        word_shingles(text_col, shingle_n).alias("shs"),
    ]
    if blocking_col:
        cols.append(F.col(blocking_col).alias("_blk"))
    sh = df.select(*cols)
    exploded = sh.select(
        "_id",
        *(["_blk"] if blocking_col else []),
        F.explode("shs").alias("sh"),
    )
    df_counts = (
        exploded.groupBy("sh").count().filter(F.col("count") <= max_shingle_df)
    )
    exploded = exploded.join(
        F.broadcast(df_counts.select("sh")), "sh", "left_semi"
    )
    join_keys = ["sh"] + (["_blk"] if blocking_col else [])
    a = exploded.select(*join_keys, F.col("_id").alias("id_a"))
    b = exploded.select(*join_keys, F.col("_id").alias("id_b"))
    cand = (
        a.join(b, join_keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .cache()
    )
    # verify on pre-aggregated arrays, shingling ONLY candidate docs
    # (the r4 verify_jaccard lesson: semi-join before the projection)
    ids = (
        cand.select(F.col("id_a").alias(id_col))
        .unionByName(cand.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    arrs = (
        df.join(ids, id_col, "left_semi")
        .select(
            F.col(id_col).alias("_id"),
            word_shingles(text_col, shingle_n).alias("shs"),
        )
    )
    joined = (
        cand.join(
            arrs.select(
                F.col("_id").alias("id_a"), F.col("shs").alias("_sa")
            ),
            "id_a",
        )
        .join(
            arrs.select(
                F.col("_id").alias("id_b"), F.col("shs").alias("_sb")
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("_sa", "_sb")).cast("long").alias("inter"),
            F.size("_sa").cast("long").alias("size_a"),
            F.size("_sb").cast("long").alias("size_b"),
        )
    )
    out = joined.select(
        "id_a",
        "id_b",
        "inter",
        "size_a",
        "size_b",
        F.expr("(1000000 * inter) div size_a").cast("long").alias(
            "containment_a_micros"
        ),
        F.expr("(1000000 * inter) div size_b").cast("long").alias(
            "containment_b_micros"
        ),
    )
    return out.filter(
        F.greatest(
            F.col("containment_a_micros"), F.col("containment_b_micros")
        )
        >= threshold_micros
    )


# ---- SimHash ----------------------------------------------------------------

def simhash_df(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64
) -> DataFrame:
    """(id, simhash long) — Charikar SimHash, fully JVM-side.

    Tokens are the non-empty runs of ``split(lower(text), '\\s+')``; each
    token is hashed ONCE with Spark's built-in ``xxhash64`` (XXH64, seed
    42); per-bit votes accumulate in an ``aggregate`` fold over the
    per-token hash array (narrow, no explode, no shuffle, no Python — this
    replaced a per-token ``hashlib.blake2b`` pandas UDF, the last
    row-at-a-time Python in any hot path). Bit tests use literal masks
    rather than variable shifts (the Python shift APIs take int literals
    only); the sign bits then pack into one long with a bitwise-OR fold.

    Cross-implementation parity: tools/make_dataops_goldens.py recomputes
    these signatures with a pure-Python XXH64 written from the public spec
    (tools/pure_xxh64.py), and tests pin that the two hash implementations
    agree token-for-token."""
    masks = []
    for i in range(bits):
        m = 1 << i
        if m >= 1 << 63:
            m -= 1 << 64  # bit 63 as a signed long literal
        masks.append(m)
    mask_arr = F.array(*[F.lit(m).cast("long") for m in masks])
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda t: t != F.lit(""),
    )
    hs = F.transform(toks, lambda t: F.xxhash64(t))
    votes = F.aggregate(
        hs,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(
            acc,
            mask_arr,
            lambda v, m: v
            + F.when(h.bitwiseAND(m) != 0, F.lit(1)).otherwise(F.lit(-1)),
        ),
    )
    sig = F.aggregate(
        F.zip_with(
            votes,
            mask_arr,
            lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a.bitwiseOR(x),
    )
    return df.select(F.col(id_col), sig.alias("simhash"))


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_bands: Optional[int] = None,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming. Banding on
    disjoint bit slices covering all 64 bits: a pair within hamming
    ``n_bands - 1`` agrees exactly on at least one slice (pigeonhole), so
    candidate recall is guaranteed only when ``n_bands > max_hamming`` —
    ``n_bands`` therefore defaults to ``max_hamming + 1`` and an explicit
    smaller value is rejected rather than silently missing pairs.
    Candidates are then popcount-verified JVM-side (bit_count)."""
    if n_bands is None:
        n_bands = max_hamming + 1
    if n_bands <= max_hamming:
        raise ValueError(
            f"n_bands={n_bands} cannot guarantee recall at max_hamming="
            f"{max_hamming}; need n_bands > max_hamming (pigeonhole)"
        )
    if n_bands > 64:
        n_bands = 64  # slices are bits; hamming ≤ 63 is always covered
    sig = simhash_df(df, id_col, text_col).cache()
    # even-as-possible disjoint slice boundaries covering all 64 bits
    bounds = [64 * i // n_bands for i in range(n_bands + 1)]
    slices = []
    for b in range(n_bands):
        lo, hi = bounds[b], bounds[b + 1]
        width = hi - lo
        shifted = F.shiftrightunsigned(F.col("simhash"), lo)
        if width >= 64:
            slices.append(shifted)
        else:
            slices.append(shifted.bitwiseAND(F.lit((1 << width) - 1)))
    banded = sig.select(
        F.col(id_col),
        "simhash",
        F.posexplode(F.array(*slices)).alias("band", "band_val"),
    )
    a = banded.select("band", "band_val", F.col(id_col).alias("id_a"), F.col("simhash").alias("sig_a"))
    b = banded.select("band", "band_val", F.col(id_col).alias("id_b"), F.col("simhash").alias("sig_b"))
    cand = (
        a.join(b, ["band", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
    )
    return cand.withColumn(
        "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    ).filter(F.col("hamming") <= max_hamming).select("id_a", "id_b", "hamming")


def embedding_neardup_pairs(
    emb_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    blocking_col: Optional[str] = "label",
    min_cosine: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
    dim: Optional[int] = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs within a blocking key (exact within
    block). When ``blocking_col`` is None, the blocker defaults to
    random-hyperplane sign buckets (similarity.hyperplane_buckets) — there
    is deliberately NO all-pairs cartesian path: at 100 TB an unblocked
    self-join is a non-starter. The hyperplane blocker is approximate
    (a pair at cosine ≥ 0.95 lands in the same bucket unless a plane
    separates it — miss probability ≈ n_planes·angle/π per pair; lower
    ``n_planes`` for higher recall, or pass an explicit blocking column for
    exactness within blocks)."""
    from ..merge import cosine_distance_col

    if blocking_col is None:
        from .similarity import hyperplane_buckets

        if dim is None:
            # probe costs one extra Spark job; pass dim explicitly to skip it
            first = emb_df.select(F.size(F.col(vec_col)).alias("d")).first()
            if first is None:
                return emb_df.sparkSession.createDataFrame(
                    [], "id_a long, id_b long, cosine double"
                )
            dim = first["d"]
        if dim is None or dim <= 0:
            raise ValueError(
                f"embedding_neardup_pairs: vector dim resolved to {dim!r} — "
                f"first {vec_col!r} row is NULL/empty; pass dim= explicitly "
                "or clean null vectors upstream"
            )
        emb_df = hyperplane_buckets(
            emb_df, dim=dim, n_planes=n_planes, seed=seed,
            id_col=id_col, vec_col=vec_col,
        )
        blocking_col = "bucket"

    base = emb_df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.col(blocking_col).alias("_blk"),
    )
    a = base.select("_blk", F.col("_id").alias("id_a"), F.col("_v").alias("v_a"))
    b = base.select("_blk", F.col("_id").alias("id_b"), F.col("_v").alias("v_b"))
    pairs = a.join(b, ["_blk"]).filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn(
            "cosine", F.lit(1.0) - cosine_distance_col(F.col("v_a"), F.col("v_b"))
        )
        .filter(F.col("cosine") >= min_cosine)
        .select("id_a", "id_b", "cosine")
    )
