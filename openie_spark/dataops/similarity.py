"""Similarity search over embedding columns.

- ``brute_force_topk``: exact cosine top-k against a probe vector. The dot
  product is a JVM-side ``aggregate(zip_with(...))`` — no Python in the
  scan — and top-k is a single ``orderBy().limit()`` which Spark executes
  as per-partition partial top-k + driver merge (TakeOrderedAndProject), so
  it scales linearly with no full sort.
- ``hyperplane_buckets`` + ``lsh_topk``: the scale path — random-hyperplane
  (sign) LSH. Bucketing prunes the scan to candidates sharing a signature
  prefix; planes are a broadcast numpy matrix applied in one Arrow-batched
  pandas UDF (matmul per batch, not per row).
- ``ivf_topk``: IVF-style — a pyspark.ml KMeans coarse quantizer assigns
  each vector to a centroid; probes search only the ``n_probe`` nearest
  centroid cells. The index (centroids) is tiny and broadcast.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..merge import cosine_distance_col


def cosine_sim_col(vec_col: str, probe: Sequence[float]) -> F.Column:
    probe_col = F.array(*[F.lit(float(x)) for x in probe])
    return F.lit(1.0) - cosine_distance_col(F.col(vec_col), probe_col)


def brute_force_topk(
    emb_df: DataFrame,
    probe: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (id, cosine) ordered desc, deterministic
    tie-break on id."""
    return (
        emb_df.select(
            F.col(id_col), cosine_sim_col(vec_col, probe).alias("cosine")
        )
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def hyperplane_buckets(
    emb_df: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Add a ``bucket`` column: sign-pattern of ``n_planes`` random
    hyperplane projections (one Arrow matmul per batch)."""
    from pyspark.sql.types import LongType

    planes = np.random.RandomState(seed).randn(dim, n_planes).astype(np.float64)
    spark = emb_df.sparkSession
    b_planes = spark.sparkContext.broadcast(planes)

    @F.pandas_udf(LongType())
    def bucket_udf(vecs: pd.Series) -> pd.Series:
        P = b_planes.value
        M = np.array([np.asarray(v, dtype=np.float64) for v in vecs.tolist()])
        if M.size == 0:
            return pd.Series([], dtype="int64")
        signs = (M @ P) > 0
        powers = 1 << np.arange(P.shape[1], dtype=np.int64)
        return pd.Series((signs @ powers).astype(np.int64))

    return emb_df.withColumn("bucket", bucket_udf(F.col(vec_col)))


def lsh_topk(
    emb_df: DataFrame,
    probe: Sequence[float],
    k: int = 10,
    dim: Optional[int] = None,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe_bits: int = 1,
) -> DataFrame:
    """Approximate top-k: scan only vectors whose hyperplane signature is
    within ``multiprobe_bits`` bit-flips of the probe's bucket."""
    dim = dim or len(probe)
    bucketed = hyperplane_buckets(
        emb_df, dim, n_planes=n_planes, seed=seed, id_col=id_col, vec_col=vec_col
    )
    planes = np.random.RandomState(seed).randn(dim, n_planes)
    sig = int(
        ((np.asarray(probe, dtype=np.float64) @ planes) > 0)
        @ (1 << np.arange(n_planes, dtype=np.int64))
    )
    probes: List[int] = [sig]
    if multiprobe_bits >= 1:
        probes += [sig ^ (1 << i) for i in range(n_planes)]
    if multiprobe_bits >= 2:
        probes += [
            sig ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    cand = bucketed.filter(F.col("bucket").isin(probes))
    return brute_force_topk(cand, probe, k=k, id_col=id_col, vec_col=vec_col)


class IvfIndex:
    """A built IVF index: the coarse-quantizer centroids (tiny, driver-held
    numpy array) plus the cell-assigned vector table. Build ONCE per data
    version with :func:`build_ivf_index`; answer many probes with
    :func:`ivf_query` — each probe touches only its ``n_probe`` cells and
    never re-fits the quantizer (the r4 design nit: a per-probe KMeans
    refit made the "index" cost O(fit) per query and silently moved cell
    boundaries between calls)."""

    __slots__ = ("centroids", "assigned", "id_col", "vec_col")

    def __init__(
        self,
        centroids: np.ndarray,
        assigned: DataFrame,
        id_col: str,
        vec_col: str,
    ):
        self.centroids = centroids
        self.assigned = assigned
        self.id_col = id_col
        self.vec_col = vec_col

    @property
    def n_cells(self) -> int:
        return int(self.centroids.shape[0])

    def unpersist(self) -> None:
        self.assigned.unpersist()


def build_ivf_index(
    emb_df: DataFrame,
    n_cells: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    persist: bool = True,
    storage_path: Optional[str] = None,
) -> IvfIndex:
    """Fit the KMeans coarse quantizer ONCE and materialize the cell
    assignment. ``persist=True`` caches the assigned table (every query
    scans it); ``storage_path`` additionally writes it as parquet
    PARTITIONED BY cell — the durable cluster form, where a query's
    ``cell IN (...)`` filter becomes partition pruning and each probe
    reads only its n_probe directories (use :func:`load_ivf_index` to
    reopen without re-fitting)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vdf = emb_df.withColumn("features", array_to_vector(F.col(vec_col)))
    km = KMeans(k=n_cells, seed=seed, featuresCol="features", predictionCol="cell")
    model = km.fit(vdf)
    assigned = model.transform(vdf).drop("features")
    centers = np.array([np.asarray(c) for c in model.clusterCenters()])

    if storage_path is not None:
        spark = emb_df.sparkSession
        assigned.write.mode("overwrite").partitionBy("cell").parquet(
            f"{storage_path}/assigned"
        )
        spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
            "cell int, centroid array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(f"{storage_path}/centroids")
        assigned = spark.read.parquet(f"{storage_path}/assigned")
    elif persist:
        assigned = assigned.cache()
    return IvfIndex(centers, assigned, id_col, vec_col)


def load_ivf_index(
    spark,
    storage_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> IvfIndex:
    """Reopen an index written by build_ivf_index(storage_path=...) without
    re-fitting: centroids collect to the driver (n_cells rows), the
    assigned table stays a lazy partitioned-parquet scan."""
    rows = spark.read.parquet(f"{storage_path}/centroids").collect()
    centers = np.array(
        [r["centroid"] for r in sorted(rows, key=lambda r: r["cell"])]
    )
    assigned = spark.read.parquet(f"{storage_path}/assigned")
    return IvfIndex(centers, assigned, id_col, vec_col)


def ivf_query(
    index: IvfIndex,
    probe: Sequence[float],
    k: int = 10,
    n_probe: int = 3,
) -> DataFrame:
    """Answer one probe against a built index: rank cells by squared
    euclidean distance to the probe driver-side (n_cells is tiny), scan
    only the n_probe nearest cells, exact cosine top-k within them."""
    p = np.asarray(probe, dtype=np.float64)
    d = ((index.centroids - p) ** 2).sum(axis=1)
    cells = [int(c) for c in np.argsort(d)[:n_probe]]
    cand = index.assigned.filter(F.col("cell").isin(cells))
    return brute_force_topk(
        cand, probe, k=k, id_col=index.id_col, vec_col=index.vec_col
    )


def ivf_query_batch(
    index: IvfIndex,
    probes,
    k: int = 10,
    n_probe: int = 3,
    probe_id_col: str = "probe_id",
    probe_vec_col: Optional[str] = None,
    broadcast_probes: bool = True,
) -> DataFrame:
    """Answer MANY probes in ONE Spark job instead of one job per probe.

    ``probes`` is either a driver-side list of ``(probe_id, vector)``
    pairs (ids may be ints or strings — the schema is inferred) or a
    DataFrame, read by NAME via ``probe_id_col`` (default ``probe_id``)
    and ``probe_vec_col`` (default: the index's vec_col, falling back to
    the first non-id column).

    The probe side is NEVER collected to the driver: each probe's
    ``n_probe`` nearest cells are assigned in one Arrow-batched matmul
    against the broadcast centroid matrix, exploded to (cell, probe)
    rows, and equi-joined to the assigned vectors on ``cell`` — so a
    corpus-vs-corpus neighbor search (probe side = another full table)
    runs as a plain distributed join, each probe's candidates limited to
    its n_probe cells. A per-probe window keeps the top-k with ties
    broken on id, matching :func:`ivf_query`.

    ``broadcast_probes=True`` (default) hints a broadcast of the exploded
    probe side — right when probes are query-sized; set False for
    corpus-scale probe tables so Spark shuffles both sides on ``cell``.
    No cartesian anywhere either way."""
    from pyspark.sql import Window
    from pyspark.sql.types import ArrayType, IntegerType

    spark = index.assigned.sparkSession
    if isinstance(probes, DataFrame):
        if probe_vec_col is None:
            if index.vec_col in probes.columns:
                probe_vec_col = index.vec_col
            else:
                others = [c for c in probes.columns if c != probe_id_col]
                if not others:
                    raise ValueError(
                        "probes DataFrame needs a vector column besides "
                        f"{probe_id_col!r}; got {probes.columns}"
                    )
                probe_vec_col = others[0]
        probe_df = probes.select(
            F.col(probe_id_col).alias("probe_id"),
            F.col(probe_vec_col).cast("array<double>").alias("probe_vec"),
        )
    else:
        probes = list(probes)
        if not probes:
            raise ValueError("empty probe list")
        id_type = "string" if isinstance(probes[0][0], str) else "long"
        probe_df = spark.createDataFrame(
            [(pid, [float(x) for x in vec]) for pid, vec in probes],
            f"probe_id {id_type}, probe_vec array<double>",
        )

    # Arrow-batched cell assignment against the broadcast centroid matrix
    # — the probe side stays distributed (no driver collect).
    b_cent = spark.sparkContext.broadcast(
        np.asarray(index.centroids, dtype=np.float64)
    )
    np_ = int(n_probe)

    @F.pandas_udf(ArrayType(IntegerType()))
    def nearest_cells(vecs: pd.Series) -> pd.Series:
        C = b_cent.value
        # Per-row ((C - p)**2).sum — the SAME float expression, in the
        # same operation order, as ivf_query's driver-side assignment, so
        # near-tied cells rank and tie-break identically on both paths
        # (the expanded ||c||²-2p·c+||p||² matmul form is not bitwise
        # equal in IEEE arithmetic and can flip an argsort on ties).
        # Still vectorized: each row is one (n_cells × dim) numpy
        # broadcast; Arrow batches are ≤10k rows, C is tiny.
        out = []
        for v in vecs.tolist():
            p = np.asarray(v, dtype=np.float64)
            d = ((C - p) ** 2).sum(axis=1)
            out.append(np.argsort(d)[:np_].astype("int32").tolist())
        return pd.Series(out, dtype=object)

    exploded = probe_df.withColumn(
        "cell", F.explode(nearest_cells(F.col("probe_vec")))
    )
    if broadcast_probes:
        exploded = F.broadcast(exploded)
    cand = index.assigned.join(exploded, "cell")
    sim = cand.select(
        "probe_id",
        F.col(index.id_col),
        (
            F.lit(1.0)
            - cosine_distance_col(F.col(index.vec_col), F.col("probe_vec"))
        ).alias("cosine"),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cosine"), F.col(index.id_col)
    )
    return (
        sim.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def ivf_topk(
    emb_df: DataFrame,
    probe: Sequence[float],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One-shot convenience: build + single query. For repeated probes use
    build_ivf_index + ivf_query — this wrapper re-fits the quantizer per
    call, which is only acceptable for a single ad-hoc probe."""
    index = build_ivf_index(
        emb_df,
        n_cells=n_cells,
        seed=seed,
        id_col=id_col,
        vec_col=vec_col,
        persist=False,
    )
    return ivf_query(index, probe, k=k, n_probe=n_probe)
