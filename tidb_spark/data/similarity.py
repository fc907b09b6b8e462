"""Similarity search over embedding columns (array<float>).

Three tiers:

- brute-force top-k: broadcast the query set, Arrow-batched numpy dot
  product (pandas UDF), per-query top-k via window row_number.  O(n·q·d) —
  the exact baseline; at 100 TB this is the verification path, not the
  serving path.
- LSH (random hyperplanes): sign-bit bucket key; candidates share a bucket
  (multi-probe = several independent tables).  Turns the scan into a
  bucket-join — the scale path.
- IVF: coarse quantizer (deterministic centroid sample), probe the nearest
  clusters only.  The partition-pruning analogue for vectors: cluster id is
  the partition key at rest, so a query touches nprobe/nlist of the data.

Vector math runs in pandas UDFs (Arrow batch → numpy einsum/matmul), NOT
array higher-order functions: Spark evaluates HOF lambdas interpreted, per
element — ~100× slower than a vectorized numpy kernel for dense float work.
The Column-expression forms (:func:`dot`, :func:`cosine`, …) are kept as
single-expression conveniences for tiny arrays.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from tidb_spark.data.dedup import _hash_params


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i in double, JVM-side (zip_with + aggregate fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def quantized_dot(a: Column, b: Column, scale: int = 1_000_000) -> Column:
    """Exact integer dot product of floor-quantized vectors — bit-identical
    across engines (used by the correctness oracle; FP dot products are
    order/fma-sensitive)."""
    q = lambda v: F.floor(v.cast("double") * scale).cast("long")  # noqa: E731
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: q(x) * q(y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


# ---------------------------------------------------------------------------
# Arrow-batched scorers (the hot path).


@pandas_udf(DoubleType())
def dot_pd(a: pd.Series, b: pd.Series) -> pd.Series:
    A = np.vstack(a.to_numpy()).astype(np.float64)
    B = np.vstack(b.to_numpy()).astype(np.float64)
    return pd.Series(np.einsum("ij,ij->i", A, B))


@pandas_udf(DoubleType())
def cosine_pd(a: pd.Series, b: pd.Series) -> pd.Series:
    A = np.vstack(a.to_numpy()).astype(np.float64)
    B = np.vstack(b.to_numpy()).astype(np.float64)
    num = np.einsum("ij,ij->i", A, B)
    den = np.sqrt(np.einsum("ij,ij->i", A, A)) * np.sqrt(np.einsum("ij,ij->i", B, B))
    with np.errstate(divide="ignore", invalid="ignore"):
        return pd.Series(np.where(den == 0, 0.0, num / den))


def cosine_micros_pd(scale: int = 1_000_000):
    """Factory: pandas UDF computing true cosine over floor-quantized
    vectors, presented as micro-units — bit-identical across engines.

    Every step is deterministic IEEE-754: the quantized dot and squared
    norms are EXACT int64 (≤ dim·scale² < 2^53, so exactly representable
    as float64), and scalar sqrt//*// are correctly-rounded single ops —
    unlike a float SUM, there is no fold-order sensitivity anywhere.  The
    DuckDB oracle spells the identical expression
    ``FLOOR((dot * CAST(1000000 AS DOUBLE)) / (sqrt(na2) * sqrt(nb2)))`` —
    note the explicit DOUBLE cast: a ``1000000.0`` literal is DECIMAL(8,1)
    in DuckDB and silently switches the multiply to exact decimal
    arithmetic, off-by-one at floor boundaries vs IEEE doubles."""

    @pandas_udf(LongType())
    def _cm(a: pd.Series, b: pd.Series) -> pd.Series:
        A = np.floor(np.vstack(a.to_numpy()).astype(np.float64) * scale).astype(
            np.int64
        )
        B = np.floor(np.vstack(b.to_numpy()).astype(np.float64) * scale).astype(
            np.int64
        )
        dot = np.einsum("ij,ij->i", A, B).astype(np.float64)
        na = np.sqrt(np.einsum("ij,ij->i", A, A).astype(np.float64))
        nb = np.sqrt(np.einsum("ij,ij->i", B, B).astype(np.float64))
        den = na * nb
        with np.errstate(divide="ignore", invalid="ignore"):
            s = np.where(den == 0, 0.0, np.floor((1_000_000.0 * dot) / den))
        return pd.Series(s.astype(np.int64))

    return _cm


def quantized_dot_pd(scale: int = 1_000_000):
    """Factory: pandas UDF computing the exact int64 dot of floor-quantized
    vectors — bit-identical to the SQL `floor(cast(x as double)*scale)`
    oracle formulation (float32 widens to float64 exactly)."""

    @pandas_udf(LongType())
    def _q(a: pd.Series, b: pd.Series) -> pd.Series:
        A = np.floor(np.vstack(a.to_numpy()).astype(np.float64) * scale).astype(
            np.int64
        )
        B = np.floor(np.vstack(b.to_numpy()).astype(np.float64) * scale).astype(
            np.int64
        )
        return pd.Series(np.einsum("ij,ij->i", A, B))

    return _q


def allpairs_cosine_above(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    threshold_num: int = 2,
    threshold_den: int = 5,
    blocks: int = 8,
) -> DataFrame:
    """All pairs (v1 < v2) with cosine ≥ threshold_num/threshold_den, in
    exact integer arithmetic on floor-quantized vectors.

    Distributed block-pair design (no driver materialization): vectors are
    hashed into ``blocks`` blocks; each row is replicated to every partner
    block it must meet (upper-triangular pairing, so ~B/2 copies per row),
    and a cogrouped ``applyInPandas`` computes an exact int64 block matmul
    per (block_i, block_j) cell, emitting only passing pairs.  Total work is
    the same n²/2 dot products as the broadcast form, but both the memory
    and the shuffle are bounded per cell at (n/B)² and n·B/2 rows — there is
    no driver ``toPandas`` and no whole-corpus broadcast, so corpus size is
    capped by cluster memory, not driver memory.  Size ``blocks`` so a block
    (n/B rows × dim) fits an executor — at 10⁹ vectors, B≈10³ gives 10⁶-row
    blocks.  Exactness bound: dims·scale²·max(num,den)² must stay < 2^63.
    For corpora where even n·B/2 replication is too hot, use
    :func:`lsh_prefiltered_pairs_above` — the registered composition that
    LSH-prefilters candidates and verifies them with this exact kernel.
    """
    num2, den2 = threshold_num * threshold_num, threshold_den * threshold_den
    base = vectors.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(blocks)).alias("_blk"),
    )
    partner = F.explode(F.sequence(F.lit(0), F.lit(blocks - 1))).alias("_p")
    # Upper-triangular pairing: cell (bi, bj) with bi <= bj holds the cross
    # product of block bi (left) × block bj (right); each unordered pair of
    # blocks is computed exactly once.
    left = base.select("_id", "_vec", F.col("_blk").alias("bi"), partner).where(
        F.col("_p") >= F.col("bi")
    ).withColumnRenamed("_p", "bj")
    right = base.select("_id", "_vec", partner, F.col("_blk").alias("bj")).where(
        F.col("_p") <= F.col("bj")
    ).withColumnRenamed("_p", "bi")

    def cell(key, lpdf, rpdf):
        bi, bj = key
        if not len(lpdf) or not len(rpdf):
            return pd.DataFrame({"v1": [], "v2": [], "dot": []}).astype(
                {"v1": np.int64, "v2": np.int64, "dot": np.int64}
            )
        A = np.floor(
            np.vstack(lpdf["_vec"].to_numpy()).astype(np.float64) * scale
        ).astype(np.int64)
        B = np.floor(
            np.vstack(rpdf["_vec"].to_numpy()).astype(np.float64) * scale
        ).astype(np.int64)
        a_ids = lpdf["_id"].to_numpy().astype(np.int64)
        b_ids = rpdf["_id"].to_numpy().astype(np.int64)
        a_n2 = np.einsum("ij,ij->i", A, A)
        b_n2 = np.einsum("ij,ij->i", B, B)
        D = A @ B.T  # exact int64 block matmul
        # The SQUARED threshold test overflows int64 for dims*scale^2 past
        # ~3e9 (dim >= ~608 at scale 1000 — common embedding sizes), and
        # numpy wraps silently.  Decide in float64 (exact for the int64
        # inputs; the PRODUCTS round at ~1e-16 relative), then re-check the
        # rare borderline entries with exact Python bignum arithmetic.
        Df = D.astype(np.float64)
        lhs = Df * Df * den2
        rhs = num2 * (
            a_n2.astype(np.float64)[:, None] * b_n2.astype(np.float64)[None, :]
        )
        ok = (D > 0) & (lhs >= rhs)
        border = (D > 0) & (
            np.abs(lhs - rhs) <= 1e-9 * np.maximum(np.abs(lhs), np.abs(rhs))
        )
        if border.any():
            for bi_, bj_ in zip(*np.nonzero(border)):
                d_ = int(D[bi_, bj_])
                ok[bi_, bj_] = (
                    d_ > 0
                    and d_ * d_ * den2
                    >= num2 * int(a_n2[bi_]) * int(b_n2[bj_])
                )
        if bi == bj:
            # Diagonal cell: both sides are the same block — keep one order.
            ok &= a_ids[:, None] < b_ids[None, :]
        i, j = np.nonzero(ok)
        v1 = np.minimum(a_ids[i], b_ids[j])
        v2 = np.maximum(a_ids[i], b_ids[j])
        return pd.DataFrame({"v1": v1, "v2": v2, "dot": D[i, j]})

    return (
        left.groupby("bi", "bj")
        .cogroup(right.groupby("bi", "bj"))
        .applyInPandas(cell, schema="v1 long, v2 long, dot long")
    )


def lsh_planes_for(n: int) -> int:
    """Sizing rule for LSH near-dup prefiltering: per-table sign bits so
    2^planes grows with the corpus — the same rule as simhash banding
    (COVERAGE r4: 256 buckets went quadratic at 50 k docs).  Candidate
    pair work per table is Σ|bucket|² ≈ n²/2^planes, so planes must
    climb with log₂(n) or the prefilter degenerates to all-pairs.
    Thresholds keep ≥ ~16 expected rows per bucket at the step point.
    High-similarity pairs (the near-dup contract) keep recall at any of
    these settings: P(collide/table) = (1-θ/π)^planes with 8 tables —
    e.g. cos ≥ 0.9 → ≥ 88% at planes=16."""
    if n <= 4096:
        return 8
    if n <= 65536:
        return 12
    return 16


def lsh_prefiltered_pairs_above(
    vectors: DataFrame,
    *,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    threshold_num: int = 2,
    threshold_den: int = 5,
    planes: int = 8,
    tables: int = 8,
) -> DataFrame:
    """LSH-prefiltered near-dup pairs: the scale path
    :func:`allpairs_cosine_above` recommends for corpora where even n·B/2
    block replication is too hot.

    Candidates = pairs co-bucketed in ANY of ``tables`` random-hyperplane
    tables (bucket = ``planes`` integer-exact sign bits, one Arrow matmul
    per table); per table one shuffle on bucket id + a within-bucket
    self-join, so pair work is Σ_b |bucket_b|² per table instead of n²/2 —
    size ``planes`` so 2^planes grows with the corpus (the same sizing
    rule as simhash banding).  Verify = the exact integer cosine test of
    the all-pairs kernel (dot > 0 AND dot²·den² ≥ num²·‖a‖²·‖b‖² on
    floor-quantized vectors), computed JVM-side with zip_with/aggregate —
    no Python in the pair path, no broadcast of anything O(n).

    Recall is the LSH contract: a true pair that collides in no table is
    dropped.  That is a DETERMINISTIC function of the fixed plane
    constants (``lsh_plane_ints``), so candidacy — and therefore the full
    result — is bit-exactly reproducible by an oracle sharing the planes.
    """
    num2 = threshold_num * threshold_num
    den2 = threshold_den * threshold_den
    # All tables' buckets in one Arrow matmul, then ONE shuffle groups
    # each (table, bucket) and streams the i<j pair grid out of the
    # sorted id array (posexplode + per-row tail slice, both pipelined
    # in codegen) — the r8 minhash-band rewrite applied here in r12:
    # versus the bucket self-join it drops one whole exchange of the
    # banded frame plus the join build side, and the Arrow bucket UDF
    # runs once instead of once per join side (measured 3.13 → 2.72 s
    # for the registered query at sf0.1; candidate set bit-identical).
    b = vectors.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            lsh_bucket_multi(F.col(vec_col), dim, planes=planes, tables=tables)
        ).alias("_tbl", "_bkt"),
    )
    # Singleton buckets (the vast majority) cannot form a pair; the
    # repartition re-spreads the small surviving-bucket frame before the
    # quadratic-in-bucket-size pair explode, so AQE's input-sized
    # coalescing cannot serialize the expensive stage (the dedup.py
    # minhash lesson, scripts/aqe_audit.py).
    buckets = (
        b.groupBy("_tbl", "_bkt")
        .agg(F.sort_array(F.collect_set("_id")).alias("ds"))
        .where(F.size("ds") >= 2)
        .repartition(vectors.sparkSession.sparkContext.defaultParallelism)
    )
    cand = (
        buckets.select(F.posexplode("ds").alias("i", "v1"), "ds")
        .select(
            "v1",
            F.explode(F.expr("slice(ds, i + 2, size(ds))")).alias("v2"),
        )
        .dropDuplicates(["v1", "v2"])
    )
    q = F.transform(
        F.col(vec_col), lambda x: F.floor(x.cast("double") * scale).cast("long")
    )
    # The quantized projection is joined TWICE (v1 payload, v2 payload);
    # without the checkpoint each join side re-runs scan + quantize +
    # norm (two identical subtrees in the plan).  Materialize it once —
    # at scale this is "write the quantized projection once, attach it
    # twice" (r12; interleaved A/B means 2.68 → 2.41 s, rows identical).
    side = vectors.select(F.col(id_col).alias("_id"), q.alias("_qv")).withColumn(
        "_n2",
        F.aggregate("_qv", F.lit(0).cast("long"), lambda a, x: a + x * x),
    ).localCheckpoint(eager=False)
    verified = (
        cand.join(
            side.select(
                F.col("_id").alias("v1"),
                F.col("_qv").alias("_q1"),
                F.col("_n2").alias("_na2"),
            ),
            "v1",
        )
        .join(
            side.select(
                F.col("_id").alias("v2"),
                F.col("_qv").alias("_q2"),
                F.col("_n2").alias("_nb2"),
            ),
            "v2",
        )
        .withColumn(
            "dot",
            F.aggregate(
                F.zip_with("_q1", "_q2", lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
        )
    )
    return verified.where(
        (F.col("dot") > 0)
        & (
            F.col("dot") * F.col("dot") * F.lit(den2)
            >= F.lit(num2) * F.col("_na2") * F.col("_nb2")
        )
    ).select("v1", "v2", "dot")


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 10,
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k neighbors per query row.

    Output: (query_id, vec_id, score) — k rows per query, ties broken by
    vec_id for determinism.

    Two-phase top-k: the broadcast cross join + scorer run map-side, then a
    partition-LOCAL partial top-k (mapInPandas, no shuffle) reduces each
    partition to ≤ q·k rows, and only that reduced set — #partitions·q·k
    rows, not n·q — shuffles into the final per-query window.  The previous
    single-window form shuffled the entire scored set into #queries
    partitions, the classic top-k scale trap."""
    scorer = {
        "cosine": cosine_pd,
        "dot": dot_pd,
        "quantized_dot": quantized_dot_pd(),
        "cosine_micros": cosine_micros_pd(),
    }[metric]
    scored = vectors.crossJoin(F.broadcast(queries)).select(
        F.col(query_id_col),
        F.col(id_col),
        scorer(F.col(vec_col), F.col(query_vec_col)).alias("score"),
    )

    qid, vid = query_id_col, id_col

    def partial_topk(batches):
        acc = None
        for pdf in batches:
            acc = pdf if acc is None else pd.concat([acc, pdf], ignore_index=True)
            # Compact every batch so the accumulator stays at ≤ q·k rows.
            acc = (
                acc.sort_values([qid, "score", vid], ascending=[True, False, True])
                .groupby(qid, sort=False)
                .head(k)
            )
        if acc is not None and len(acc):
            yield acc

    schema = scored.schema
    reduced = scored.mapInPandas(partial_topk, schema=schema)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        reduced.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .drop("rank")
    )


def _hyperplane(dim: int, seed_a: int, seed_b: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane components."""
    out = []
    state = (seed_a * 2654435761 + seed_b) % (1 << 63)
    for _ in range(dim):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        out.append((state / float(1 << 63)) * 2.0 - 1.0)
    return out


def _plane_matrix(dim: int, planes: int, table: int) -> np.ndarray:
    params = _hash_params(planes, seed=1000 + table)
    return np.array([_hyperplane(dim, a, b) for a, b in params])  # planes × dim


def lsh_bucket(vec: Column, dim: int, *, planes: int = 16, table: int = 0):
    """Random-hyperplane LSH bucket id: one sign bit per plane, computed as
    one Arrow-batched matmul against the plane matrix.

    Vector AND plane components are floor-quantized to int64 (scale 1e6)
    before the dot: the sign test is then exact integer arithmetic — order-
    independent and bit-identical in any engine — so bucket membership is
    oracle-expressible (a float dot's sign can flip near zero depending on
    fold order).  Sign flips vs the unquantized planes are confined to
    |dot| < dim/scale — no effect on LSH's probabilistic guarantees."""
    P = _plane_matrix(dim, planes, table)
    Pq = np.floor(P * 1_000_000).astype(np.int64)
    weights = (1 << np.arange(planes)).astype(np.int64)

    @pandas_udf(LongType())
    def _bucket(v: pd.Series) -> pd.Series:
        V = np.floor(
            np.vstack(v.to_numpy()).astype(np.float64) * 1_000_000
        ).astype(np.int64)
        bits = (V @ Pq.T) > 0
        return pd.Series(bits @ weights)

    return _bucket(vec)


def lsh_bucket_multi(
    vec: Column, dim: int, *, planes: int, tables: int
) -> Column:
    """All ``tables`` LSH bucket ids in ONE Arrow matmul: the per-table
    plane matrices are stacked into a single (tables·planes × dim) int64
    matrix, so a batch of vectors pays one einsum for every table instead
    of ``tables`` separate UDF invocations (the sign test is the same
    exact integer arithmetic as :func:`lsh_bucket` — bucket ids are
    bit-identical per table)."""
    stacked = np.vstack(
        [
            np.floor(_plane_matrix(dim, planes, t) * 1_000_000).astype(np.int64)
            for t in range(tables)
        ]
    )  # (tables·planes) × dim
    weights = (1 << np.arange(planes)).astype(np.int64)

    @pandas_udf(ArrayType(LongType()))
    def _buckets(v: pd.Series) -> pd.Series:
        V = np.floor(
            np.vstack(v.to_numpy()).astype(np.float64) * 1_000_000
        ).astype(np.int64)
        bits = (V @ stacked.T) > 0  # n × (tables·planes)
        ids = bits.reshape(len(V), tables, planes) @ weights  # n × tables
        return pd.Series(list(ids))

    return _buckets(vec)


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 10,
    planes: int = 12,
    tables: int = 4,
    metric: str = "cosine",
) -> DataFrame:
    """Approximate top-k: exact rescoring restricted to LSH bucket matches
    across ``tables`` independent hash tables.

    One corpus pass (r12; guide §2.4/§4): all ``tables`` bucket ids come
    from a single stacked-matmul Arrow UDF (:func:`lsh_bucket_multi`,
    bit-identical per table) and are posexploded to (table, bucket) rows,
    so ONE broadcast join on (table, bucket) replaces the per-table union
    of joins — the before-plan scanned the corpus once per table and ran
    2·tables Arrow UDF nodes (8 scans / 16 ArrowEvalPython at tables=4);
    a bucket match in table t is the same candidate either way and the
    dropDuplicates below collapses multi-table hits identically."""
    rescorer = {
        "cosine": cosine_pd,
        "cosine_micros": cosine_micros_pd(),
    }[metric]
    v = vectors.select(
        F.col(id_col),
        F.col(vec_col),
        lsh_bucket_multi(
            F.col(vec_col), dim, planes=planes, tables=tables
        ).alias("bks"),
    ).select(
        # posexplode_outer, NOT posexplode: the non-outer form adds an
        # implicit `size(bks) > 0` filter that Catalyst pushes below the
        # UDF projection, DUPLICATING the bucket matmul per row (two
        # stacked ArrowEvalPython nodes in the plan — guide §4.4).  The
        # outer form needs no filter; its null (t, bucket) rows for
        # empty arrays can never satisfy the inner equi-join below, so
        # the candidate set is unchanged.
        id_col, vec_col, F.posexplode_outer("bks").alias("t", "bucket")
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(query_vec_col),
        lsh_bucket_multi(
            F.col(query_vec_col), dim, planes=planes, tables=tables
        ).alias("bks"),
    ).select(
        query_id_col, query_vec_col,
        F.posexplode_outer("bks").alias("t", "bucket"),
    )
    cand = v.join(F.broadcast(q), on=["t", "bucket"]).select(
        query_id_col, id_col, query_vec_col, vec_col
    )
    cand = cand.dropDuplicates([query_id_col, id_col])
    scored = cand.select(
        query_id_col,
        id_col,
        rescorer(F.col(vec_col), F.col(query_vec_col)).alias("score"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("score").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .drop("rank")
    )


def lsh_plane_ints(dim: int, *, planes: int, table: int) -> list[list[int]]:
    """The quantized plane rows :func:`lsh_bucket` tests against, as plain
    ints — lets an external oracle (DuckDB SQL generation) reproduce bucket
    ids exactly."""
    P = _plane_matrix(dim, planes, table)
    return np.floor(P * 1_000_000).astype(np.int64).tolist()


def kmeans_centroids(
    vectors: DataFrame,
    *,
    vec_col: str = "embedding",
    nlist: int = 16,
    max_iter: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Distributed k-means coarse quantizer for IVF: (centroid_id,
    centroid_vec float-array) — pyspark.ml KMeans over the corpus
    (Lloyd's with k-means|| init runs as a handful of Spark jobs; this IS
    the 'offline training job at scale' the id-sample path stands in for).

    Deterministic for a fixed seed.  Gated behind an import-try so
    environments stripping pyspark.ml still get the sample path."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = vectors.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=nlist, maxIter=max_iter, seed=seed).fit(feat)
    spark = vectors.sparkSession
    rows = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return spark.createDataFrame(
        rows, "centroid_id int, centroid_vec array<float>"
    )


def assign_to_centroids(
    vectors: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment as a map-side Arrow argmax: the centroid
    matrix (nlist rows — control-plane-sized, like a broadcast dim) rides
    into a mapInPandas closure and each partition computes cosine against
    all centroids in one matmul, keeping the best per row.  ZERO shuffle —
    the crossJoin + row_number-over-Window form pushed |corpus|×nlist rows
    through a full shuffle keyed on id just to keep the max (VERDICT r2).

    Quantized micro-cosine (same determinism argument as cosine_micros_pd:
    exact int64 dots/norms, correctly-rounded scalar sqrt / * / /): the
    argmax is reproducible bit-for-bit by an external oracle, and
    np.argmax's first-max tie-break = smallest centroid_id over the
    id-sorted rows."""
    cent_rows = centroids.orderBy("centroid_id").collect()
    C = np.vstack(
        [np.asarray(r["centroid_vec"], dtype=np.float64) for r in cent_rows]
    )
    cent_ids = np.array([r["centroid_id"] for r in cent_rows], dtype=np.int64)
    Cq = np.floor(C * 1_000_000).astype(np.int64)
    cn = np.sqrt(np.einsum("ij,ij->i", Cq, Cq).astype(np.float64))

    def _assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            Vq = np.floor(
                np.vstack(pdf[vec_col].to_numpy()).astype(np.float64) * 1_000_000
            ).astype(np.int64)
            D = (Vq @ Cq.T).astype(np.float64)
            vn = np.sqrt(np.einsum("ij,ij->i", Vq, Vq).astype(np.float64))
            den = vn[:, None] * cn[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                S = np.where(den == 0, 0.0, np.floor((D * 1_000_000.0) / den))
            idx = np.argmax(S, axis=1)
            out = pdf[[id_col, vec_col]].copy()
            out["centroid_id"] = cent_ids[idx]
            yield out

    from pyspark.sql.types import IntegerType, StructField, StructType

    base_schema = vectors.select(id_col, vec_col).schema
    assign_schema = StructType(
        base_schema.fields + [StructField("centroid_id", IntegerType())]
    )
    return vectors.select(id_col, vec_col).mapInPandas(
        _assign, schema=assign_schema
    )


def deterministic_centroids(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
) -> DataFrame:
    """The nlist-smallest-id sample as a LOCAL centroid relation (see
    ivf_topk: collected driver-side to avoid a window and per-consumer
    re-evaluation; stands in for kmeans_centroids' offline training)."""
    sample_rows = (
        vectors.select(id_col, vec_col).orderBy(id_col).limit(nlist).collect()
    )
    return vectors.sparkSession.createDataFrame(
        [(i, [float(x) for x in r[vec_col]]) for i, r in enumerate(sample_rows)],
        "centroid_id int, centroid_vec array<float>",
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    centroids: DataFrame | None = None,
    metric: str = "cosine",
) -> DataFrame:
    """IVF-flat ANN: deterministic coarse centroids (the ``nlist`` smallest
    ids — a fixed sample standing in for k-means, which would be an offline
    job at scale), assign vectors to their nearest centroid, probe the
    ``nprobe`` nearest lists per query.

    Centroid selection is ``orderBy(id).limit(nlist)`` — Spark plans it as
    TakeOrderedAndProject (per-partition top-nlist, tiny merge on the
    driver), NOT a global sort: the previous ``dense_rank over (order by
    id)`` formulation shuffled the entire vector table into ONE partition
    just to keep 16 rows.

    Pass ``centroids`` (e.g. from :func:`kmeans_centroids`) to probe a
    trained coarse quantizer instead of the deterministic sample."""
    if centroids is None:
        centroids = deterministic_centroids(
            vectors, id_col=id_col, vec_col=vec_col, nlist=nlist
        )
    assigned = assign_to_centroids(
        vectors, centroids, id_col=id_col, vec_col=vec_col
    )
    rescorer = {
        "cosine": cosine_pd,
        "cosine_micros": cosine_micros_pd(),
    }[metric]
    probe_w = Window.partitionBy(query_id_col).orderBy(
        F.col("cdist").desc(), F.col("centroid_id")
    )
    probes = (
        queries.crossJoin(F.broadcast(centroids))
        .select(
            query_id_col,
            query_vec_col,
            "centroid_id",
            cosine_micros_pd()(
                F.col(query_vec_col), F.col("centroid_vec")
            ).alias("cdist"),
        )
        .withColumn("r", F.row_number().over(probe_w))
        .where(F.col("r") <= nprobe)
        .drop("r", "cdist")
    )
    scored = assigned.join(F.broadcast(probes), on="centroid_id").select(
        query_id_col,
        id_col,
        rescorer(F.col(vec_col), F.col(query_vec_col)).alias("score"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("score").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .drop("rank")
    )


def ivf_bucketed_neardup(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    scale: int = 1000,
    threshold_num: int = 2,
    threshold_den: int = 5,
    centroids: DataFrame | None = None,
    target_bucket: int | None = None,
) -> DataFrame:
    """Semantic near-dup via IVF bucketing — the 100 TB path for embedding
    dedup: assign every vector to its nearest coarse centroid (zero-shuffle
    Arrow argmax), then compare pairs ONLY within a bucket.  Work drops
    from n²/2 to Σ (n_bucket²)/2 ≈ n²/(2·nlist) and, unlike
    :func:`allpairs_cosine_above`, the join is a plain hash join keyed on
    centroid_id — at scale the bucket id is the at-rest partition key, so
    the self-join co-locates without replication.  Recall caveat (standard
    IVF): a pair straddling two buckets is missed; raise nlist overlap via
    multi-assignment if the workload needs it.  The cosine test is the same
    exact integer algebra as allpairs_cosine_above (dot²·den² ≥ num²·‖a‖²·‖b‖²
    on floor-quantized vectors) — bit-identical in any engine.

    ``target_bucket``: scale nlist with the corpus so per-bucket work stays
    CONSTANT per vector — nlist = max(nlist, n // target_bucket).  A fixed
    nlist makes bucket pair work n²/nlist, i.e. still quadratic in n (the
    sf1 scale probe measured 25.7× runtime at 10× vectors with nlist=16);
    with nlist ∝ n the family is linear.  Costs one count() (control-plane
    action).  At true scale pair target_bucket with offline
    ``kmeans_centroids`` — ``deterministic_centroids`` collects nlist rows
    driver-side, fine for thousands of centroids, not millions."""
    num2 = threshold_num * threshold_num
    den2 = threshold_den * threshold_den
    if target_bucket is not None:
        n_vec = vectors.count()
        nlist = max(nlist, n_vec // target_bucket)
    if centroids is None:
        centroids = deterministic_centroids(
            vectors, id_col=id_col, vec_col=vec_col, nlist=nlist
        )
    assigned = assign_to_centroids(
        vectors, centroids, id_col=id_col, vec_col=vec_col
    )

    # Pair stage: ONE applyInPandas cell per bucket running an exact int64
    # matmul — the same kernel shape as within_group_cosine_pairs (the
    # SemDeDup r7 rework, 9.0→2.2 s) but with this family's FLOOR
    # quantization so the pinned oracle algebra is untouched.  The r8
    # formulation (bucket self-join + one Arrow dot per pair) marshaled
    # |bucket|²/2 vector PAIRS through Arrow and, being keyed on
    # centroid_id, ran on ≤ nlist post-AQE tasks; the cell ships each
    # vector ONCE and the n_g×n_g Gram matrix is one numpy op.  Exactness:
    # dot itself is exact int64 (|dot| ≤ dim·scale², far inside 2⁶³); the
    # threshold test dot²·den² ≥ num²·na²·nb² can exceed 2⁵³, so it runs
    # in float64 with borderline cells re-checked in arbitrary-precision
    # Python ints — bit-identical to the oracle's integer algebra.
    # Contract (same as within_group_cosine_pairs): one bucket's vectors
    # fit an executor — target_bucket bounds n_g by construction.
    def cell(key, pdf):
        if len(pdf) < 2:
            return pd.DataFrame(
                {"v1": [], "v2": [], "centroid_id": [], "dot": []}
            ).astype(
                {"v1": np.int64, "v2": np.int64,
                 "centroid_id": np.int32, "dot": np.int64}
            )
        V = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
        Q = np.floor(V * scale).astype(np.int64)
        ids = pdf[id_col].to_numpy().astype(np.int64)
        n2 = np.einsum("ij,ij->i", Q, Q)
        D = Q @ Q.T
        Df = D.astype(np.float64)
        lhs = Df * Df * den2
        rhs = num2 * (
            n2.astype(np.float64)[:, None] * n2.astype(np.float64)[None, :]
        )
        upper = ids[:, None] < ids[None, :]
        ok = (D > 0) & (lhs >= rhs) & upper
        border = (D > 0) & upper & (
            np.abs(lhs - rhs) <= 1e-9 * np.maximum(np.abs(lhs), np.abs(rhs))
        )
        if border.any():
            for i_, j_ in zip(*np.nonzero(border)):
                d_ = int(D[i_, j_])
                ok[i_, j_] = d_ > 0 and d_ * d_ * den2 >= num2 * int(
                    n2[i_]
                ) * int(n2[j_])
        i, j = np.nonzero(ok)
        return pd.DataFrame(
            {
                "v1": ids[i],
                "v2": ids[j],
                "centroid_id": np.full(len(i), key[0], dtype=np.int32),
                "dot": D[i, j],
            }
        )

    return (
        assigned.select("centroid_id", id_col, vec_col)
        .groupby("centroid_id")
        .applyInPandas(cell, schema="v1 long, v2 long, centroid_id int, dot long")
        .select("v1", "v2", "centroid_id", "dot")
    )


def within_group_cosine_pairs(
    df: DataFrame,
    *,
    group_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    threshold_num: int = 2,
    threshold_den: int = 5,
) -> DataFrame:
    """Pairs (group, v1 < v2) with cosine ≥ num/den, searched ONLY within
    each group — the SemDeDup kernel (groups = k-means clusters).

    Same exact integer algebra as :func:`allpairs_cosine_above` but
    round-half-up quantization (matching data/kmeans.py's quantize, so
    one oracle chain covers clustering AND pairing), and one
    applyInPandas cell per group: an exact int64 matmul over the group's
    rows.  Contract: a group (n_g × dim int64) must fit an executor —
    production SemDeDup sizes k ∝ n to bound n_g; groups past that get
    the block-pair treatment of allpairs_cosine_above within the group.
    """
    num2, den2 = threshold_num * threshold_num, threshold_den * threshold_den

    def cell(key, pdf):
        if len(pdf) < 2:
            return pd.DataFrame({"g": [], "v1": [], "v2": []}).astype(
                {"g": np.int64, "v1": np.int64, "v2": np.int64}
            )
        V = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64) * scale
        Q = (np.sign(V) * np.floor(np.abs(V) + 0.5)).astype(np.int64)  # HALF_UP
        ids = pdf[id_col].to_numpy().astype(np.int64)
        n2 = np.einsum("ij,ij->i", Q, Q)
        D = Q @ Q.T
        Df = D.astype(np.float64)
        lhs = Df * Df * den2
        rhs = num2 * (n2.astype(np.float64)[:, None] * n2.astype(np.float64)[None, :])
        ok = (D > 0) & (lhs >= rhs) & (ids[:, None] < ids[None, :])
        border = (D > 0) & (
            np.abs(lhs - rhs) <= 1e-9 * np.maximum(np.abs(lhs), np.abs(rhs))
        ) & (ids[:, None] < ids[None, :])
        if border.any():
            for i_, j_ in zip(*np.nonzero(border)):
                d_ = int(D[i_, j_])
                ok[i_, j_] = d_ > 0 and d_ * d_ * den2 >= num2 * int(
                    n2[i_]
                ) * int(n2[j_])
        i, j = np.nonzero(ok)
        return pd.DataFrame(
            {"g": np.full(len(i), key[0], dtype=np.int64),
             "v1": ids[i], "v2": ids[j]}
        )

    return (
        df.select(F.col(group_col).alias("g"), id_col, vec_col)
        .groupby("g")
        .applyInPandas(cell, schema="g long, v1 long, v2 long")
        .withColumnRenamed("g", group_col)
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) + asymmetric distance computation (ADC).


def pq_adc_topk(
    emb: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    scale: int = 1000,
    n_queries: int = 3,
    topk: int = 10,
) -> DataFrame:
    """Product-quantization ANN: split each vector into ``m`` subvectors,
    train a ``k``-centroid codebook per subspace (Lloyd steps with the
    same integer determinism contract as data/kmeans.py: quantize →
    exact long distances → floor-avg updates → lowest-id tie breaks),
    encode every vector as ``m`` small codes, and answer queries by ADC —
    the distance from query subvector to each codebook centroid is
    computed once per (query, subspace, code) and summed over a vector's
    codes.

    Scale shape: codebooks are m·k rows (driver-synced per Lloyd step,
    like every distributed k-means); encoding is a broadcast join + one
    (vec, subspace) window; query scoring joins the m·k·|Q| broadcast
    distance table onto the codes and re-aggregates per (query, vec) —
    the corpus is never shuffled except that one sum, and the stored
    index is m bytes/vector instead of the raw floats, which is the
    entire point of PQ at 100 TB.

    Returns (query_id, rank, vec_id, adc) for the ``topk`` nearest
    non-identical vectors per query (queries = the ``n_queries`` lowest
    ids), ranked by exact-integer ADC then vec_id.
    """
    from tidb_spark.data import kmeans as km

    spark = emb.sparkSession
    # NOT persisted (r12 negative result, measured with the fixed A/B
    # harness): caching the quantized projection across the four
    # consumers read consistently slightly SLOWER (old best 1.87 vs
    # 2.0 s, 4/5 interleaved pairs) — scan + quantize is cheap codegen
    # work here, and at 100 TB the right posture is writing the encoded
    # index once, not caching the raw quantized corpus (same reasoning
    # as the rejected `subs` checkpoint).
    pts = emb.select(
        F.col(id_col).alias("vec_id"),
        km.quantize(vec_col, scale=scale).alias("qv"),
    )
    seeds = pts.orderBy("vec_id").limit(k).collect()  # k rows by contract
    if not seeds:
        raise ValueError("pq_adc_topk: input has no rows")
    # dim read off the seeds — the former separate first() probe was one
    # whole extra job per call (r12; the seeds collect already scans).
    dim = len(seeds[0]["qv"])
    if dim % m:
        raise ValueError(f"pq_adc_topk: dim {dim} not divisible by m={m}")
    sub_d = dim // m

    sdist = F.aggregate(
        F.zip_with(F.col("sv"), F.col("cv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, d: acc + d,
    )

    subs = pts.select(
        "vec_id",
        F.posexplode(
            F.array(
                *[F.slice(F.col("qv"), j * sub_d + 1, sub_d) for j in range(m)]
            )
        ).alias("sub_id", "sv"),
    )

    cent_schema = StructType(
        [
            StructField("sub_id", IntegerType()),
            StructField("code", IntegerType()),
            StructField("cv", ArrayType(LongType())),
        ]
    )
    codebook = spark.createDataFrame(
        [
            (j, i, list(r["qv"][j * sub_d : (j + 1) * sub_d]))
            for i, r in enumerate(seeds)
            for j in range(m)
        ],
        cent_schema,
    )

    def _assign(cb: DataFrame) -> DataFrame:
        # Nearest code as a combinable argmin — min(struct(d, code, sv))
        # is lexicographic, so ties break on the lower code exactly like
        # the previous row_number(ORDER BY d, code) form, but the partial
        # aggregate collapses each (vec, subspace)'s k candidates
        # MAP-SIDE: the shuffle carries |subs| rows instead of k·|subs|
        # rows into a per-group sort (r9; the window variant shuffled
        # 256k scored rows at sf0.1 twice per run).  sv rides in the
        # struct tail — codes are unique per group, so it never orders.
        return (
            subs.join(F.broadcast(cb), "sub_id")
            .withColumn("__pq_d", sdist)
            .groupBy("vec_id", "sub_id")
            .agg(F.min(F.struct("__pq_d", "code", "sv")).alias("__pq_m"))
            .select(
                "vec_id",
                "sub_id",
                F.col("__pq_m.code").alias("code"),
                F.col("__pq_m.sv").alias("sv"),
            )
        )

    for _ in range(iters - 1):
        assigned = _assign(codebook)
        # Refined codebook stays a LAZY (m*k)-row DataFrame that the next
        # assign (and qdist) broadcast-join directly — no driver collect /
        # re-createDataFrame round-trip per Lloyd step (r13; the collect
        # was a full blocking assign+update job inside query CONSTRUCTION,
        # ~0.9 s of the 1.3 s build at sf0.1).  Identical integer
        # arithmetic runs in the same plan; the duplicated broadcast
        # subtree (next assign + qdist) dedupes to one ReusedExchange at
        # runtime.  At scale this removes one driver sync per Lloyd step;
        # floor-avg sums of longs are order-independent, so laziness
        # cannot change a value.
        codebook = (
            assigned.groupBy("sub_id", "code")
            .agg(
                F.aggregate(
                    F.collect_list("sv"),
                    F.array([F.lit(0).cast("long")] * sub_d),
                    lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
                ).alias("__pq_sum"),
                F.count(F.lit(1)).alias("__pq_n"),
            )
            .select(
                F.col("sub_id").cast("int").alias("sub_id"),
                F.col("code").cast("int").alias("code"),
                F.transform(
                    F.col("__pq_sum"),
                    lambda s: F.floor(s / F.col("__pq_n")).cast("long"),
                ).alias("cv"),
            )
        )

    enc = _assign(codebook).select("vec_id", "sub_id", "code")

    qdist = (
        subs.where(F.col("vec_id") < n_queries)
        .withColumnRenamed("vec_id", "query_id")
        .join(F.broadcast(codebook), "sub_id")
        .withColumn("__pq_d", sdist)
        .select("query_id", "sub_id", "code", F.col("__pq_d").alias("d"))
    )

    adc = (
        enc.join(F.broadcast(qdist), ["sub_id", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d").alias("adc"))
        .where(F.col("vec_id") != F.col("query_id"))
    )
    wq = Window.partitionBy("query_id").orderBy("adc", "vec_id")
    return (
        adc.withColumn("rank", F.row_number().over(wq))
        .where(F.col("rank") <= topk)
        .select("query_id", "rank", "vec_id", "adc")
    )
