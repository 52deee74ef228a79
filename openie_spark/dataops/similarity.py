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
    probes,  # list of (probe_id, vector) or DataFrame(probe_id, vector)
    k: int = 10,
    n_probe: int = 3,
) -> DataFrame:
    """Answer MANY probes in ONE Spark job instead of one job per probe:
    rank cells per probe driver-side against the tiny centroid matrix,
    build a (cell, probe_id, probe_vec) table, and join it to the
    assigned vectors on ``cell`` — each probe's scan still touches only
    its n_probe cells (the join key IS the cell), and a per-probe window
    keeps the top-k. Per-probe top-k ties break on id, matching
    ivf_query. Probe count is assumed driver-small (≤ ~10⁵); the
    candidate volume is n_probes × n_probe cells, sharded by the cell
    join — no cartesian anywhere."""
    from pyspark.sql import Window

    spark = index.assigned.sparkSession
    if isinstance(probes, DataFrame):
        probes = [(r[0], list(r[1])) for r in probes.collect()]
    C = index.centroids
    rows = []
    for pid, vec in probes:
        p = np.asarray(vec, dtype=np.float64)
        d = ((C - p) ** 2).sum(axis=1)
        for c in np.argsort(d)[:n_probe]:
            rows.append((int(c), pid, [float(x) for x in vec]))
    probe_df = spark.createDataFrame(
        rows, "cell int, probe_id long, probe_vec array<double>"
    )
    cand = index.assigned.join(F.broadcast(probe_df), "cell")
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
