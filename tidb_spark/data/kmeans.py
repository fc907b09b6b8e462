"""Distributed k-means over an embedding column — the clustering
building block for SemDeDup-style semantic dedup, diversity sampling,
and IVF index construction.

Scale shape (Lloyd iteration on a cluster):
- centroids are k rows — they fit the driver (k ≪ n even when k scales
  with the corpus), so each iteration collects k rows; the data-sized
  work per iteration is one assign pass + one map-side-combined groupBy
  (update): no driver materialization of anything O(n).
- the assign pass dispatches on k (`_FLAT_ASSIGN_K`): constant small k
  gets the flat broadcast crossJoin (n·k candidates); corpus-scaled k
  (SemDeDup sets k = n/512) gets the exact two-level pruned assign —
  O(n·√k) coarse bounds against a √k-row broadcast, then a keyed join
  with only the unprunable cells' members, so neither the broadcast nor
  the candidate rowset ever grows O(n·k) = O(n²/512).  Both paths are
  bit-identical (integer bounds, lowest-id ties; property-tested).
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

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, LongType, StructField, StructType

_Q = "__km_q"

# Above this k the assign stage switches from the flat broadcast-crossJoin
# (n·k candidate rows, k-row broadcast — the right plan for constant k) to
# the exact two-level pruned assign (n·√k coarse work, √k-row broadcast —
# the right plan once k scales with the corpus, as SemDeDup's k = n/512
# does).  Both paths are bit-identical by construction; tests force the
# pruned path at tiny k to prove it.
_FLAT_ASSIGN_K = 64


def _isqrt(x: F.Column) -> F.Column:
    """Exact floor(sqrt(x)) for non-negative longs.

    Float sqrt is within 1 ulp for inputs < 2^53 (all our squared
    distances are ≲ 2^40), so one ±1 integer correction restores the
    exact integer floor — pure codegen, no UDF."""
    s = F.floor(F.sqrt(x.cast("double"))).cast("long")
    s = F.when((s + 1) * (s + 1) <= x, s + 1).otherwise(s)
    return F.when(s * s > x, s - 1).otherwise(s)


def _csqrt(x: F.Column) -> F.Column:
    """Exact ceil(sqrt(x)) for non-negative longs."""
    s = _isqrt(x)
    return F.when(s * s < x, s + 1).otherwise(s)


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


def _assign(pts: DataFrame, centroids: DataFrame, k: int) -> DataFrame:
    """Attach cluster_id = argmin_c ||q - centroid_c||^2 (ties -> lowest id).

    Dispatches on k: flat broadcast assign while k is small (the classic
    constant-k plan), exact two-level pruned assign once k scales with
    the corpus (SemDeDup's k = n/512 makes the flat plan O(n²/512) rows
    and an O(n)-sized broadcast — the one shape that cannot survive a
    100× scale-up).  Both paths produce identical rows."""
    if k <= _FLAT_ASSIGN_K:
        return _assign_flat(pts, centroids)
    return _assign_pruned(pts, centroids, k)


def _assign_flat(pts: DataFrame, centroids: DataFrame) -> DataFrame:
    """Flat assign: broadcast all k centroids, n·k candidates, window
    argmin.  Right plan for constant small k — zero point-side shuffle
    beyond the per-point window."""
    cand = pts.crossJoin(F.broadcast(centroids)).withColumn(
        "__km_dist", _sqdist(F.col(_Q), F.col("__km_centroid"))
    )
    w = Window.partitionBy("vec_id").orderBy("__km_dist", "cluster_id")
    return (
        cand.withColumn("__km_rn", F.row_number().over(w))
        .where(F.col("__km_rn") == 1)
        .drop("__km_rn", "__km_dist", "__km_centroid")
    )


def _assign_pruned(pts: DataFrame, centroids: DataFrame, k: int) -> DataFrame:
    """Exact two-level assign for corpus-scaled k: O(n·√k) coarse work
    with a √k-row broadcast, then a keyed join against only the cells
    that can contain the argmin.

    Shape: the k centroids are first grouped into g = ⌈√k⌉ coarse cells
    (cell seeds = every ⌈k/g⌉-th centroid by id; membership = a recursive
    _assign of k rows against g seeds — k-scale work, never n-scale).
    Each non-empty cell keeps its seed vector and an integer ceiling of
    its member radius r_j = max ‖c − g_j‖.  Every point then evaluates,
    in ONE shuffle-free projection against a single broadcast row of g
    structs, the exact triangle-inequality bounds

        lb_j = ⌊‖p − g_j‖⌋ − ⌈r_j⌉      (≤ distance to ANY member of j)
        ub   = min_j (⌈‖p − g_j‖⌉ + ⌈r_j⌉)  (≥ distance to SOME centroid)

    and prunes every cell with lb_j > ub: such a cell's members are all
    strictly farther than ub ≥ d(nearest), so neither the argmin nor any
    tie can live there — the lowest-id tie-break is preserved exactly.
    All bounds are integers (exact ⌊√·⌋/⌈√·⌉ via _isqrt/_csqrt), so no
    float ever decides an assignment.  Surviving (point, cell) rows join
    the centroid frame BY KEY — a shuffle hash join at any k, no O(k)
    broadcast — and a map-side-combinable min(struct(dist, id)) takes
    the exact argmin.  The cell achieving ub always survives its own
    bound, so every point keeps ≥ 1 candidate cell.
    """
    g = math.isqrt(k - 1) + 1
    stride = -(-k // g)  # ceil(k/g); cluster ids are 0..k-1 contiguous
    seeds = centroids.where(F.col("cluster_id") % stride == 0).select(
        (F.col("cluster_id") / stride).cast("int").alias("__km_cell"),
        F.col("__km_centroid").alias("__km_seed"),
    )
    # Cell membership of each centroid — k rows vs g seeds, recursive
    # (g ≈ √k stays under the flat threshold until k ≈ 4096; beyond that
    # the recursion adds a third level, still exact).
    cent_cells = _assign(
        centroids.select(
            F.col("cluster_id").alias("vec_id"),
            F.col("__km_centroid").alias(_Q),
        ),
        seeds.select(
            F.col("__km_cell").alias("cluster_id"),
            F.col("__km_seed").alias("__km_centroid"),
        ),
        g,
    ).select(
        F.col("vec_id").alias("cluster_id"),
        F.col(_Q).alias("__km_centroid"),
        F.col("cluster_id").alias("__km_cell"),
    )
    # Per-cell ceil'd member radius; inner joins drop EMPTY cells from
    # both the bounds and the fine pass (an empty cell's seed distance
    # bounds no real centroid, so it must not contribute to ub).
    radii = (
        cent_cells.join(F.broadcast(seeds), "__km_cell")
        .groupBy("__km_cell")
        .agg(
            F.max(
                _csqrt(_sqdist(F.col("__km_centroid"), F.col("__km_seed")))
            ).alias("__km_r")
        )
    )
    cells_row = (
        seeds.join(radii, "__km_cell")
        .agg(
            F.collect_list(
                F.struct("__km_cell", "__km_seed", "__km_r")
            ).alias("__km_cells")
        )
    )
    # Coarse pass: one broadcast row of g structs, higher-order functions
    # only — no shuffle, no row expansion until the survivor explode.
    scored = pts.crossJoin(F.broadcast(cells_row)).withColumn(
        "__km_cd",
        F.transform(
            F.col("__km_cells"),
            lambda c: F.struct(
                c["__km_cell"].alias("cell"),
                _sqdist(F.col(_Q), c["__km_seed"]).alias("dsq"),
                c["__km_r"].alias("r"),
            ),
        ),
    ).drop("__km_cells")
    scored = scored.withColumn(
        "__km_cd",
        F.transform(
            F.col("__km_cd"),
            lambda c: F.struct(
                c["cell"].alias("cell"),
                c["r"].alias("r"),
                c["dsq"].alias("dsq"),
                _isqrt(c["dsq"]).alias("fl"),
            ),
        ),
    ).withColumn(
        "__km_ub",
        F.array_min(
            F.transform(
                F.col("__km_cd"),
                lambda c: c["fl"]
                + F.when(c["fl"] * c["fl"] < c["dsq"], F.lit(1)).otherwise(F.lit(0))
                + c["r"],
            )
        ),
    )
    cand = scored.select(
        *pts.columns,
        F.explode(
            F.transform(
                F.filter(
                    F.col("__km_cd"),
                    lambda c: c["fl"] - c["r"] <= F.col("__km_ub"),
                ),
                lambda c: c["cell"],
            )
        ).alias("__km_cell"),
    )
    fine = cand.join(cent_cells, "__km_cell").withColumn(
        "__km_dist", _sqdist(F.col(_Q), F.col("__km_centroid"))
    )
    carry = [c for c in pts.columns if c != "vec_id"]
    return (
        fine.groupBy("vec_id")
        .agg(
            F.min(F.struct(F.col("__km_dist"), F.col("cluster_id"))).alias(
                "__km_best"
            ),
            *[F.first(c).alias(c) for c in carry],
        )
        .select(*pts.columns, F.col("__km_best.cluster_id").alias("cluster_id"))
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
    k = len(seeds)  # actual k (input may have < k rows)
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
        assigned = _assign(pts, centroids, k)
        if step == iters - 1:
            return assigned.select("vec_id", "cluster_id")
        # k rows to the driver, re-broadcast next round: the O(k) sync
        # point every distributed k-means has.
        new_rows = _update(assigned, dim).collect()
        centroids = spark.createDataFrame(
            [(int(r["cluster_id"]), list(r["__km_centroid"])) for r in new_rows],
            cent_schema,
        )
    return _assign(pts, centroids, k).select("vec_id", "cluster_id")
