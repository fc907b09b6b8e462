"""Operator-level tests for the bucketed range join and quantized k-means
(the query-level oracle mirror in test_correctness.py covers the registered
queries; these pin the operators' contracts directly)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tidb_spark.data.kmeans import kmeans_assignments
from tidb_spark.operators.rangejoin import range_join


def _naive(points, intervals, point_col, lo_col, hi_col):
    return points.crossJoin(intervals).where(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col))
    )


def test_range_join_matches_naive_cross_product(spark):
    points = spark.range(0, 200).select(
        F.col("id").alias("pid"), (F.col("id") * 0.37 % 50).alias("pv")
    )
    intervals = spark.range(0, 60).select(
        F.col("id").alias("iid"),
        (F.col("id") * 0.81 % 45).alias("lo"),
        ((F.col("id") * 0.81 % 45) + 3.0).alias("hi"),
    )
    got = (
        range_join(points, intervals, point_col="pv", lo_col="lo",
                   hi_col="hi", bucket_width=3.0)
        .select("pid", "iid").orderBy("pid", "iid").collect()
    )
    want = (
        _naive(points, intervals, "pv", "lo", "hi")
        .select("pid", "iid").orderBy("pid", "iid").collect()
    )
    assert got == want
    assert len(got) > 0  # non-vacuous


def test_range_join_no_duplicate_pairs_on_bucket_boundary(spark):
    # Interval exactly on a bucket boundary spans 2 buckets; the point on
    # the boundary must appear exactly once.
    points = spark.createDataFrame([(1, 10.0)], "pid long, pv double")
    intervals = spark.createDataFrame(
        [(7, 10.0, 10.0), (8, 5.0, 15.0)], "iid long, lo double, hi double"
    )
    rows = (
        range_join(points, intervals, point_col="pv", lo_col="lo",
                   hi_col="hi", bucket_width=10.0)
        .select("pid", "iid").collect()
    )
    assert sorted((r.pid, r.iid) for r in rows) == [(1, 7), (1, 8)]


def test_range_join_inclusive_bounds(spark):
    points = spark.createDataFrame(
        [(1, 5.0), (2, 7.0), (3, 7.000001)], "pid long, pv double"
    )
    intervals = spark.createDataFrame([(9, 5.0, 7.0)], "iid long, lo double, hi double")
    rows = range_join(points, intervals, point_col="pv", lo_col="lo",
                      hi_col="hi", bucket_width=2.0).collect()
    assert sorted(r.pid for r in rows) == [1, 2]


def test_kmeans_deterministic_and_total(spark):
    emb = spark.range(0, 40).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 4).cast("float"),
            ((F.col("id") * 7) % 5).cast("float"),
            (F.col("id") % 3).cast("float"),
        ).alias("embedding"),
    )
    a1 = kmeans_assignments(emb, k=4, iters=2).orderBy("vec_id").collect()
    a2 = kmeans_assignments(emb, k=4, iters=2).orderBy("vec_id").collect()
    assert a1 == a2  # deterministic end to end
    assert len(a1) == 40  # every point assigned exactly once
    assert {r.cluster_id for r in a1} <= set(range(4))


def test_kmeans_separated_clusters_recovered(spark):
    # Two tight blobs far apart -> 2-means with the blobs' own members as
    # seeds must split them exactly.
    rows = [(i, [float(i % 5), 0.0]) for i in range(10)] + [
        (i, [1000.0 + float(i % 5), 0.0]) for i in range(10, 20)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = kmeans_assignments(emb, k=2, iters=2).orderBy("vec_id").collect()
    low = {r.cluster_id for r in got if r.vec_id < 10}
    high = {r.cluster_id for r in got if r.vec_id >= 10}
    assert len(low) == 1 and len(high) == 1 and low != high


def test_ivf_pair_cell_matches_exact_integer_pairs(spark):
    """The r9 per-bucket matmul cell (ivf_bucketed_neardup) must agree
    pair-for-pair and dot-for-dot with a naive arbitrary-precision
    integer evaluation of the same floor-quantized cosine test —
    including values engineered to sit ON the threshold boundary, where
    the cell's float64 fast path defers to the exact recheck."""
    import math

    from tidb_spark.data.similarity import ivf_bucketed_neardup

    rows = []
    # Boundary engineering: with threshold 3/5 and scale 10, vectors
    # [a, b] with exact integer dots make dot^2*25 == 9*na2*nb2 reachable
    # (e.g. colinear vectors: cos = 1 > 3/5; orthogonal: 0 < 3/5; and a
    # 3-4-5 construction lands exactly on cos = 3/5).
    rows.append((0, [3.0, 4.0]))   # n2 = (30,40) -> 2500
    rows.append((1, [3.0, 4.0]))   # identical: cos = 1
    rows.append((2, [4.0, -3.0]))  # orthogonal to 0: cos = 0
    rows.append((3, [1.0, 0.0]))   # dot with 0 = 30*10 = 300; cos = 0.6 EXACTLY
    rows.append((4, [0.6, 0.8]))   # colinear with 0 again
    for i in range(5, 40):
        rows.append((i, [math.sin(i) * 2, math.cos(i) * 2]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r.v1, r.v2): r.dot
        for r in ivf_bucketed_neardup(
            emb, nlist=1, scale=10, threshold_num=3, threshold_den=5
        ).collect()
    }
    # Naive oracle in pure Python ints (exact at any magnitude).
    q = {i: [math.floor(x * 10) for x in v] for i, v in rows}
    n2 = {i: sum(x * x for x in v) for i, v in q.items()}
    want = {}
    for i in q:
        for j in q:
            if i < j:
                dot = sum(a * b for a, b in zip(q[i], q[j]))
                if dot > 0 and dot * dot * 25 >= 9 * n2[i] * n2[j]:
                    want[(i, j)] = dot
    assert got == want
    # The engineered exact-boundary pair must be present (>= is inclusive).
    assert (0, 3) in want


def _both_paths(monkeypatch, emb, *, k, iters):
    """Run kmeans_assignments with the flat exact path forced, then with
    the Arrow-matmul exact path forced, and return both sorted row
    lists."""
    import tidb_spark.data.kmeans as km

    monkeypatch.setattr(km, "_FLAT_ASSIGN_K", 10_000)
    flat = km.kmeans_assignments(emb, k=k, iters=iters).orderBy("vec_id").collect()
    monkeypatch.setattr(km, "_FLAT_ASSIGN_K", 0)
    matmul = km.kmeans_assignments(emb, k=k, iters=iters).orderBy("vec_id").collect()
    return flat, matmul


def test_kmeans_matmul_assign_bitexact_vs_flat(spark, monkeypatch):
    """The zero-shuffle Arrow-matmul exact assign must be bit-identical
    to the crossJoin+window flat assign — same argmin, same lowest-id
    tie-breaks — across multiple Lloyd steps."""
    emb = spark.range(0, 120).select(
        F.col("id").alias("vec_id"),
        F.array(
            ((F.col("id") * 13) % 17).cast("float"),
            ((F.col("id") * 7) % 11).cast("float"),
            ((F.col("id") * 3) % 5).cast("float"),
        ).alias("embedding"),
    )
    flat, matmul = _both_paths(monkeypatch, emb, k=12, iters=3)
    assert flat == matmul
    assert len(flat) == 120


def test_kmeans_matmul_assign_preserves_tie_breaks(spark, monkeypatch):
    """Equidistant points (1-D grid where every odd point ties between
    its two neighbouring centroids) must keep the lowest-id winner
    through the matmul path."""
    rows = [(i, [float(i)]) for i in range(0, 32)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    flat, matmul = _both_paths(monkeypatch, emb, k=16, iters=2)
    assert flat == matmul


def test_kmeans_matmul_assign_on_fixture(spark, monkeypatch):
    """Matmul vs flat on the real embeddings fixture at a corpus-scaled
    k (the shape that triggers the matmul path in prod)."""
    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", "embedding")
    )
    flat, matmul = _both_paths(monkeypatch, emb, k=20, iters=2)
    assert flat == matmul
    assert len(flat) == 500


def _ivf_reference(V, k, iters):
    """Pure-numpy replay of the documented ivf assign contract
    (two-level: stride seeds, centroid->cell, point->live cell, exact
    argmin within cell; integer floor-average updates)."""
    import math as m

    import numpy as np

    Q = np.round(V * 1000).astype(np.int64)

    def argmin_rows(A, B):
        d = -2 * (A @ B.T) + np.einsum("ij,ij->i", B, B)[None, :]
        return np.argmin(d, axis=1)

    cent = [(i, Q[i].copy()) for i in range(min(k, len(Q)))]
    for step in range(iters):
        kk = len(cent)
        g = m.isqrt(kk - 1) + 1 if kk > 1 else 1
        stride = -(-kk // g)
        C = np.vstack([v for _, v in cent])
        ids = np.array([c for c, _ in cent])
        seeds = C[::stride]
        cell_of = argmin_rows(C, seeds)
        live = np.unique(cell_of)
        pcell = live[argmin_rows(Q, seeds[live])]
        out = np.empty(len(Q), dtype=np.int64)
        for cell in live:
            members = np.where(cell_of == cell)[0]
            pidx = np.where(pcell == cell)[0]
            if len(pidx):
                out[pidx] = ids[members[argmin_rows(Q[pidx], C[members])]]
        if step == iters - 1:
            return out
        new = []
        for cid in np.unique(out):
            sel = Q[out == cid]
            new.append((int(cid), np.floor(sel.sum(0) / len(sel)).astype(np.int64)))
        cent = sorted(new)
    return out


def test_kmeans_ivf_assign_matches_numpy_reference(spark):
    """assign="ivf" (the SemDeDup two-level contract) must reproduce the
    pure-numpy replay of its documented semantics exactly — including
    cell tie-breaks and the live-cell restriction — on the real
    embeddings fixture at a corpus-scaled k."""
    import numpy as np

    from tidb_spark.data.kmeans import kmeans_assignments

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
    )
    rows = emb.collect()
    V = np.vstack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    for k in (8, 20):
        want = _ivf_reference(V, k, 2)
        got = (
            kmeans_assignments(emb, k=k, iters=2, assign="ivf")
            .orderBy("vec_id")
            .collect()
        )
        assert len(got) == len(rows)
        assert [r.cluster_id for r in got] == [int(x) for x in want], k


def test_kmeans_ivf_assign_deterministic(spark):
    from tidb_spark.data.kmeans import kmeans_assignments

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    a1 = kmeans_assignments(emb, k=20, iters=2, assign="ivf").orderBy("vec_id").collect()
    a2 = kmeans_assignments(emb, k=20, iters=2, assign="ivf").orderBy("vec_id").collect()
    assert a1 == a2


def test_kmeans_ivf_local_and_distributed_strategies_agree(spark, monkeypatch):
    """The single-closure (small-k) and cogrouped (corpus-k) executions
    of assign="ivf" are the same deterministic function — forcing the
    distributed pipeline at tiny k must reproduce the local result."""
    import tidb_spark.data.kmeans as km

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    local = km.kmeans_assignments(emb, k=20, iters=2, assign="ivf").orderBy("vec_id").collect()
    monkeypatch.setattr(km, "_LOCAL_IVF_K", 0)
    dist = km.kmeans_assignments(emb, k=20, iters=2, assign="ivf").orderBy("vec_id").collect()
    assert local == dist


def _blob_emb(spark, n=60, dim=3):
    return spark.range(0, n).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 7).cast("float"),
            ((F.col("id") * 13) % 11).cast("float"),
            ((F.col("id") * 3) % 5).cast("float"),
        ).alias("embedding"),
    )


def test_kmeans_update_fold_equals_posexplode(spark):
    """The two `_update` plans (collect_list fold vs posexplode per-dim
    sums) are the same integer function — centroids AND final
    assignments bit-equal, so the auto dispatch is execution-only."""
    emb = _blob_emb(spark)
    a = kmeans_assignments(emb, k=5, iters=3, update="fold").orderBy(
        "vec_id"
    ).collect()
    b = kmeans_assignments(emb, k=5, iters=3, update="posexplode").orderBy(
        "vec_id"
    ).collect()
    assert a == b and len(a) == 60


def test_kmeans_update_centroid_rows_identical(spark):
    """_update itself: identical (cluster_id, centroid array) rows from
    both strategies on a skewed assignment (one giant cluster)."""
    from tidb_spark.data.kmeans import _Q, _update

    assigned = spark.range(0, 200).select(
        F.col("id").alias("vec_id"),
        F.when(F.col("id") < 190, 0).otherwise(1).alias("cluster_id"),
        F.array(
            F.col("id").cast("long"),
            (F.col("id") * 3 + 1).cast("long"),
        ).alias(_Q),
    )
    fold = {
        r["cluster_id"]: list(r["__km_centroid"])
        for r in _update(assigned, 2, strategy="fold").collect()
    }
    pe = {
        r["cluster_id"]: list(r["__km_centroid"])
        for r in _update(assigned, 2, strategy="posexplode").collect()
    }
    assert fold == pe and set(fold) == {0, 1}
    # exact integer floor averages
    assert fold[0] == [sum(range(190)) // 190, (3 * sum(range(190)) + 190) // 190]


def test_kmeans_update_mode_validated(spark):
    import pytest

    emb = _blob_emb(spark, n=10)
    with pytest.raises(ValueError, match="update mode"):
        kmeans_assignments(emb, k=2, update="explode")


def test_ivf_distributed_salted_equals_local(spark, monkeypatch):
    """The distributed ivf fine-assign (cogrouped per-(cell, salt)
    matmul) must produce bit-identical assignments to the zero-shuffle
    local two-level closure — including when the skew guard salts a hot
    cell into multiple sub-tasks.  Forced by shrinking _LOCAL_IVF_K (to
    route small k through the distributed pipeline) and
    _IVF_CELL_TASK_BYTES (to force salts > 1 on a 60-row fixture)."""
    from tidb_spark.data import kmeans as km

    emb = _blob_emb(spark)
    base = kmeans_assignments(emb, k=9, iters=2, assign="ivf").orderBy(
        "vec_id"
    ).collect()
    monkeypatch.setattr(km, "_LOCAL_IVF_K", 1)
    distributed = kmeans_assignments(
        emb, k=9, iters=2, assign="ivf"
    ).orderBy("vec_id").collect()
    assert distributed == base
    # Now force real salting: budget of one vector's bytes per task.
    monkeypatch.setattr(km, "_IVF_CELL_TASK_BYTES", 8 * 3)
    salted = kmeans_assignments(
        emb, k=9, iters=2, assign="ivf"
    ).orderBy("vec_id").collect()
    assert salted == base
