"""Interleaved same-session A/B for the r12 simhash pair-grid rewrite:
"new" = simhash_pairs as shipped (sorted-array pair grid, no persist);
"old" = the r11 band self-join reconstructed inline.  Row-level equality
checked first (hamming column included).

Usage: python scripts/ab_simhash.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import tidb_spark.data.dedup as dd
from tidb_spark.session import get_spark

BITS, CHUNKS, MAXH, HASH = 48, 4, 6, "md5"


def simhash_pairs_old(df):
    chunk_bits = BITS // CHUNKS
    mask = (1 << chunk_bits) - 1
    sig = dd.simhash_signatures(
        df, "text", "doc_id", bits=BITS, hash=HASH
    ).persist()
    banded = sig.select(
        "doc",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_id"),
                        F.shiftrightunsigned(F.col("sig"), i * chunk_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk_val"),
                    )
                    for i in range(CHUNKS)
                ]
            )
        ).alias("c"),
    ).select("doc", "sig", "c.chunk_id", "c.chunk_val")
    a = banded.select(
        F.col("doc").alias("d1"), F.col("sig").alias("sig1"),
        "chunk_id", "chunk_val",
    )
    b = banded.select(
        F.col("doc").alias("d2"), F.col("sig").alias("sig2"),
        "chunk_id", "chunk_val",
    )
    return (
        a.join(b, on=["chunk_id", "chunk_val"])
        .where(F.col("d1") < F.col("d2"))
        .select(
            "d1",
            "d2",
            F.bit_count(F.col("sig1").bitwiseXOR(F.col("sig2")))
            .cast("int")
            .alias("hamming"),
        )
        .where(F.col("hamming") <= MAXH)
        .dropDuplicates(["d1", "d2"])
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-simhash", **{"spark.ui.showConsoleProgress": "false"})
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    def build(variant):
        if variant == "old":
            df = simhash_pairs_old(docs)
        else:
            df = dd.simhash_pairs(
                docs, "text", "doc_id",
                bits=BITS, chunks=CHUNKS, max_hamming=MAXH, hash=HASH,
            )
        return df.orderBy("d1", "d2")

    a = sorted(map(tuple, build("old").collect()))
    b = sorted(map(tuple, build("new").collect()))
    print(f"rows old={len(a)} new={len(b)} equal={a == b}", flush=True)

    times = {"old": [], "new": []}
    for variant in ("old", "new"):
        build(variant).write.mode("overwrite").format("noop").save()
    for r in range(reps):
        for variant in ("old", "new") if r % 2 == 0 else ("new", "old"):
            spark.sparkContext.setJobDescription(f"ab:{variant}:{r}")
            t0 = time.perf_counter()
            build(variant).write.mode("overwrite").format("noop").save()
            times[variant].append(round(time.perf_counter() - t0, 3))
        dd.release_cached()
    for v, ts in times.items():
        print(f"{v}: best={min(ts)} all={ts}", flush=True)


if __name__ == "__main__":
    main()
