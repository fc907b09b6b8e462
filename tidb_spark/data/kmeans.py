"""Distributed k-means over an embedding column — the clustering
building block for SemDeDup-style semantic dedup, diversity sampling,
and IVF index construction.

Scale shape (Lloyd iteration on a cluster):
- centroids are k rows — they ALWAYS fit the driver, so each iteration
  collects k rows and re-broadcasts them as a literal-backed dimension
  frame.  The data-sized work per iteration is one broadcast hash join
  (assign) + one map-side-combined groupBy (update): no shuffle of the
  points beyond the k-way aggregation, no driver materialization of
  anything O(n).
- iteration count is FIXED (training-pipeline k-means is always run
  with a step budget); no convergence collect inside the loop.

Determinism contract (what makes this oracle-checkable bit-exactly,
unlike textbook float k-means): vectors are quantized to integers
(round(x * scale)) up front, distances are exact integer math, centroid
updates are integer floor-division averages, and argmin ties break to
the lowest centroid id.  Two engines computing in any partition order
agree exactly — float summation order never enters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, LongType, StructField, StructType

_Q = "__km_q"


def quantize(vec_col: str, *, scale: int = 1000) -> F.Column:
    """round(x*scale) per component, as exact longs (JVM codegen)."""
    return F.transform(
        F.col(vec_col), lambda x: F.round(x * F.lit(scale)).cast("long")
    )


def _sqdist(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, d: acc + d,
    )


def _assign(pts: DataFrame, centroids: DataFrame) -> DataFrame:
    """Attach cluster_id = argmin_c ||q - centroid_c||^2 (ties -> lowest id).

    centroids is k rows — broadcast crossJoin, then a min-by over the k
    candidates per point.  k is a constant, so this is O(k·n) work with
    zero point-side shuffle.
    """
    cand = pts.crossJoin(F.broadcast(centroids)).withColumn(
        "__km_dist", _sqdist(F.col(_Q), F.col("__km_centroid"))
    )
    w = Window.partitionBy("vec_id").orderBy("__km_dist", "cluster_id")
    return (
        cand.withColumn("__km_rn", F.row_number().over(w))
        .where(F.col("__km_rn") == 1)
        .drop("__km_rn", "__km_dist", "__km_centroid")
    )


def _update(assigned: DataFrame, dim: int) -> DataFrame:
    """New centroid = per-dimension floor(sum/count) — exact integer math.

    groupBy(cluster_id) with array-sum via aggregate of posexploded dims
    would shuffle n·dim rows; instead fold arrays with zip_with inside a
    single agg (Spark sums the struct-free long arrays map-side)."""
    summed = assigned.groupBy("cluster_id").agg(
        F.aggregate(
            F.collect_list(_Q),
            F.array([F.lit(0).cast("long")] * dim),
            lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
        ).alias("__km_sum"),
        F.count("*").alias("__km_n"),
    )
    return summed.select(
        "cluster_id",
        F.transform(
            F.col("__km_sum"),
            lambda s: F.floor(s / F.col("__km_n")).cast("long"),
        ).alias("__km_centroid"),
    )


def kmeans_assignments(
    emb: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 2,
    scale: int = 1000,
) -> DataFrame:
    """Run `iters` Lloyd steps from deterministic seeds (the k rows with
    the smallest ids) and return (vec_id, cluster_id) final assignments.

    NOTE on collect_list in _update: per-cluster vector lists must fit an
    executor — true for k >= parallelism-sized clusters of quantized
    64-1024 dim vectors up to ~10M rows/cluster; beyond that swap the
    fold for a posexplode + (cluster, dim) groupBy (documented switch,
    same results).  Chosen default keeps ONE narrow shuffle per iter.
    """
    spark = emb.sparkSession
    pts = emb.select(
        F.col(id_col).alias("vec_id"), quantize(vec_col, scale=scale).alias(_Q)
    )
    probe = pts.select(_Q).first()
    if probe is None:
        raise ValueError("kmeans_assignments: input has no rows")
    dim = len(probe[0])
    seeds = pts.orderBy("vec_id").limit(k).collect()  # k rows by contract
    cent_schema = StructType(
        [
            StructField("cluster_id", IntegerType()),
            StructField("__km_centroid", ArrayType(LongType())),
        ]
    )
    centroids = spark.createDataFrame(
        [(i, list(r[_Q])) for i, r in enumerate(seeds)], cent_schema
    )
    for step in range(iters):
        assigned = _assign(pts, centroids)
        if step == iters - 1:
            return assigned.select("vec_id", "cluster_id")
        # k rows to the driver, re-broadcast next round: the O(k) sync
        # point every distributed k-means has.
        new_rows = _update(assigned, dim).collect()
        centroids = spark.createDataFrame(
            [(int(r["cluster_id"]), list(r["__km_centroid"])) for r in new_rows],
            cent_schema,
        )
    return _assign(pts, centroids).select("vec_id", "cluster_id")
