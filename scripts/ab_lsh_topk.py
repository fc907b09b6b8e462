"""Interleaved same-session A/B for the r12 lsh_topk rewrite (one stacked
bucket UDF + posexplode + single broadcast join) vs the r11 per-table
union-of-joins form, plus a row-level result equality check.

Usage: python scripts/ab_lsh_topk.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import Window

from tidb_spark.data import similarity as sim
from tidb_spark.data.similarity import cosine_micros_pd, lsh_bucket
from tidb_spark.session import get_spark


def lsh_topk_old(vectors, queries, *, dim, k=10, planes=12, tables=4):
    rescorer = cosine_micros_pd()
    cand = None
    for t in range(tables):
        v = vectors.select(
            F.col("vec_id"),
            F.col("embedding"),
            lsh_bucket(F.col("embedding"), dim, planes=planes, table=t).alias("bucket"),
        )
        q = queries.select(
            F.col("query_id"),
            F.col("query_vec"),
            lsh_bucket(F.col("query_vec"), dim, planes=planes, table=t).alias("bucket"),
        )
        hits = v.join(F.broadcast(q), on="bucket").select(
            "query_id", "vec_id", "query_vec", "embedding"
        )
        cand = hits if cand is None else cand.unionByName(hits)
    cand = cand.dropDuplicates(["query_id", "vec_id"])
    scored = cand.select(
        "query_id",
        "vec_id",
        rescorer(F.col("embedding"), F.col("query_vec")).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .drop("rank")
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-lsh-topk", **{"spark.ui.showConsoleProgress": "false"})
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    def build(variant):
        fn = lsh_topk_old if variant == "old" else None
        if fn is not None:
            df = fn(emb, queries, dim=64, k=10, planes=12, tables=4)
        else:
            df = sim.lsh_topk(
                emb, queries, dim=64, k=10, planes=12, tables=4,
                metric="cosine_micros",
            )
        return df.orderBy("query_id", "vec_id")

    # result equality first
    a = sorted(map(tuple, build("old").collect()))
    b = sorted(map(tuple, build("new").collect()))
    print(f"rows old={len(a)} new={len(b)} equal={a == b}", flush=True)

    times = {"old": [], "new": []}
    for variant in ("old", "new"):  # prewarm both
        build(variant).write.mode("overwrite").format("noop").save()
    for r in range(reps):
        for variant in ("old", "new") if r % 2 == 0 else ("new", "old"):
            spark.sparkContext.setJobDescription(f"ab:{variant}:{r}")
            t0 = time.perf_counter()
            build(variant).write.mode("overwrite").format("noop").save()
            times[variant].append(round(time.perf_counter() - t0, 3))
    for v, ts in times.items():
        print(f"{v}: best={min(ts)} all={ts}", flush=True)


if __name__ == "__main__":
    main()
