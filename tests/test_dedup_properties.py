"""Deterministic contracts of the dedup primitives (r9): properties a
user relies on at scale, pinned on corpora engineered so the guarantees
are exact rather than probabilistic.

- MinHash+LSH candidates are always a SUBSET of something the verify
  tier re-checks exactly, so the operator's output is sound by
  construction; identical texts collide in EVERY band, so J=1 pairs are
  complete deterministically.
- The r9 union-free verify algebra (|∪| = n1 + n2 − |∩|) must equal the
  literal array_union evaluation pair-for-pair.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from tidb_spark.data import dedup as dd


def _corpus(spark):
    base = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy cat again and again"),
        (3, "completely different text with no overlap whatsoever here"),
        (4, "another unrelated document about spark physical planning"),
        (5, "the quick brown fox jumps over the lazy dog again and again!"),
    ]
    return spark.createDataFrame(base, "doc_id long, text string")


def test_lsh_identical_docs_always_pair(spark):
    """J=1 pairs (identical normalized text) share every shingle, hence
    every minhash, hence every band hash — candidacy is deterministic,
    not probabilistic, and the exact-Jaccard verify keeps them at 1.0."""
    docs = _corpus(spark)
    got = {
        (r.d1, r.d2): r.jaccard
        for r in dd.minhash_lsh_pairs(
            docs, "text", "doc_id", k=8, num_hashes=32, bands=8,
            verify_threshold=0.9,
        ).collect()
    }
    assert got.get((0, 1)) == 1.0


def test_lsh_verified_pairs_match_exact_all_pairs_jaccard(spark):
    """Every (d1, d2, jaccard) the verified LSH emits must agree with a
    brute-force exact Jaccard on the same normalized 8-gram shingle
    sets — the verify tier may MISS pairs banding never surfaced (that
    is LSH's contract) but can never emit a wrong value or a
    below-threshold pair."""
    docs = _corpus(spark)
    rows = docs.select(
        "doc_id", dd.normalize_text(F.col("text")).alias("n")
    ).collect()
    sets = {
        r.doc_id: {r.n[i : i + 8] for i in range(max(len(r.n) - 7, 1))}
        for r in rows
    }
    exact = {}
    ids = sorted(sets)
    for i in ids:
        for j in ids:
            if i < j and sets[i] | sets[j]:
                exact[(i, j)] = len(sets[i] & sets[j]) / len(sets[i] | sets[j])
    got = {
        (r.d1, r.d2): r.jaccard
        for r in dd.minhash_lsh_pairs(
            docs, "text", "doc_id", k=8, num_hashes=32, bands=8,
            verify_threshold=0.4,
        ).collect()
    }
    for pair, j in got.items():
        assert j >= 0.4
        assert abs(j - exact[pair]) < 1e-12, (pair, j, exact[pair])


def test_lsh_singleton_and_oversized_buckets_drop(spark):
    """max_bucket guards the quadratic blowup: with max_bucket=1 every
    bucket is dropped (even the identical pair disappears), proving the
    cap is applied before pair generation, not after."""
    docs = _corpus(spark)
    got = dd.minhash_lsh_pairs(
        docs, "text", "doc_id", k=8, num_hashes=32, bands=8,
        verify_threshold=None, max_bucket=1,
    ).collect()
    assert got == []


def test_minhash_verify_strategies_bitequal(spark):
    """The bucket (owner-bucket co-location) and join (per-pair array
    replication) verify strategies are the same exact-Jaccard function —
    identical pairs AND identical float jaccard values — and both agree
    with the test-only blocked grid implementation (an independent
    kernel-based evaluation of the same candidates, demoted from the
    public API in r12 but kept as this cross-check)."""
    from tidb_spark.data.dedup import _verify_jaccard_blocked, minhash_lsh_pairs

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

    def run(strategy):
        return sorted(
            (r.d1, r.d2, r.jaccard)
            for r in minhash_lsh_pairs(
                docs, "text", "doc_id", verify_strategy=strategy
            ).collect()
        )

    b, c = run("join"), run("bucket")
    assert len(b) > 0
    assert b == c  # bit-equal including the IEEE division
    a = sorted(
        (r.d1, r.d2, r.jaccard)
        for r in _verify_jaccard_blocked(
            minhash_lsh_pairs(docs, "text", "doc_id", verify_threshold=None),
            _shingle_sets(docs),
            0.4,
        ).collect()
    )
    assert a == b


def _shingle_sets(docs, k=8):
    """(doc, shingles, n) frame exactly as minhash_lsh_pairs builds it
    for its verify tier (unrestricted: every doc, not just candidates —
    the blocked verify only reads docs its candidate pairs name)."""
    return (
        dd.shingle_posting(docs, "text", "doc_id", k=k, distinct=False)
        .groupBy("doc")
        .agg(F.collect_set("g").alias("shingles"))
        .withColumn("n", F.size("shingles"))
    )


def test_minhash_bucket_verify_salted_bitequal(spark, monkeypatch):
    """Owner buckets whose pair count exceeds the salt budget split into
    sub-tasks with the bucket's sets replicated per salt — forcing
    pair_budget=2 must leave the result bit-identical to the unsalted
    run (per-task CPU/memory is the only thing salting may change)."""
    import tidb_spark.data.dedup as dd_mod

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    def run():
        return sorted(
            (r.d1, r.d2, r.jaccard)
            for r in dd_mod.minhash_lsh_pairs(
                docs, "text", "doc_id", verify_strategy="bucket"
            ).collect()
        )

    base = run()
    monkeypatch.setattr(dd_mod, "_BUCKET_PAIR_BUDGET", 2)
    salted = run()
    assert len(base) > 0
    assert base == salted


def test_minhash_verify_strategy_validated(spark):
    """A typo'd verify_strategy must raise immediately, not silently
    fall through to the join path (r10 ADVICE)."""
    import pytest

    docs = _corpus(spark)
    with pytest.raises(ValueError, match="verify_strategy"):
        dd.minhash_lsh_pairs(docs, "text", "doc_id", verify_strategy="blokced")
    # "blocked" was a public strategy until r12; it must now be rejected
    # loudly, not silently fall through to the join path.
    with pytest.raises(ValueError, match="verify_strategy"):
        dd.minhash_lsh_pairs(docs, "text", "doc_id", verify_strategy="blocked")


def test_blocked_verify_string_ids(spark):
    """String doc ids through the BLOCKED verify: the r10 kernel
    hard-coded long ids, so a switch onto this path would have crashed a
    string-keyed corpus that worked small.  Blocked (test-only) and the
    public join strategy must agree pair-for-pair with string keys, and
    the output id columns must be strings."""
    from tidb_spark.data.dedup import _verify_jaccard_blocked

    docs = _corpus(spark).select(
        F.concat(F.lit("doc-"), F.col("doc_id")).alias("doc_id"), "text"
    )
    kw = dict(k=8, num_hashes=32, bands=8)
    a = sorted(
        (r.d1, r.d2, r.jaccard)
        for r in _verify_jaccard_blocked(
            dd.minhash_lsh_pairs(
                docs, "text", "doc_id", verify_threshold=None, **kw
            ),
            _shingle_sets(docs),
            0.4,
        ).collect()
    )
    b = sorted(
        (r.d1, r.d2, r.jaccard)
        for r in dd.minhash_lsh_pairs(
            docs, "text", "doc_id", verify_strategy="join",
            verify_threshold=0.4, **kw
        ).collect()
    )
    assert len(a) > 0 and a == b
    assert all(isinstance(r[0], str) and isinstance(r[1], str) for r in a)


def test_blocked_verify_empty_shingle_set(spark):
    """A doc whose shingle array is EMPTY must verify to jaccard 0
    against everything (dropped by any threshold > 0) instead of
    IndexError-ing the searchsorted kernel (r10 ADVICE: the guard was
    missing, merely unreachable through today's collect_set posting)."""
    from tidb_spark.data.dedup import _verify_jaccard_blocked

    cand = spark.createDataFrame([(0, 1), (1, 2)], "d1 long, d2 long")
    sets = spark.createDataFrame(
        [(0, [], 0), (1, [3, 5, 9], 3), (2, [3, 5, 7], 3)],
        "doc long, shingles array<bigint>, n int",
    )
    got = sorted(
        (r.d1, r.d2, round(r.jaccard, 6))
        for r in _verify_jaccard_blocked(cand, sets, 0.1, blocks=2).collect()
    )
    assert got == [(1, 2, 0.5)]  # |{3,5}| / |{3,5,7,9}|; (0,1) dropped


def test_blocked_verify_ships_pair_pruned(spark):
    """The blocked verify ships a doc's set only to cells where one of
    its candidate pairs actually lands — never via explode(sequence(0,
    P-1)) over the full grid row/column.  With `_size_blocks` growing P
    linearly in the corpus, the full-grid shape (r10) made verify
    traffic 2·P·payload ∝ corpus² — pair-pruned shipping bounds it by
    the candidate structure instead.  Pinned at the plan level (no
    sequence/explode generator in the verify subtree) plus a value
    check that a huge grid still verifies correctly."""
    from tidb_spark.data.dedup import _verify_jaccard_blocked

    cand = spark.createDataFrame([(0, 1)], "d1 long, d2 long")
    sets = spark.createDataFrame(
        [(0, [3, 5], 2), (1, [3, 5, 7], 3)],
        "doc long, shingles array<bigint>, n int",
    )
    out = _verify_jaccard_blocked(cand, sets, 0.1, blocks=97)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "sequence(" not in plan
    got = [(r.d1, r.d2, round(r.jaccard, 6)) for r in out.collect()]
    assert got == [(0, 1, round(2 / 3, 6))]


def test_size_blocks_scales_linearly_with_payload(spark):
    """blocks grows ~linearly in corpus shingle payload (constant
    per-cell bytes) and respects the floor/cap."""
    from tidb_spark.data.dedup import _BLOCKED_CELL_BUDGET, _size_blocks

    class FakeRow(dict):
        def __getitem__(self, k):
            return dict.__getitem__(self, k)

    class FakeDF:
        def __init__(self, sh, docs):
            self._row = FakeRow(sh=sh, docs=docs)

        def groupBy(self):
            return self

        def agg(self, *a):
            return self

        def first(self):
            return self._row

    small = _size_blocks(FakeDF(10_000, 100))
    assert small == 8  # floor keeps 64-cell parallelism on tiny corpora
    one_gb_longs = (1 << 30) // 8
    mid = _size_blocks(FakeDF(one_gb_longs, 1))
    big = _size_blocks(FakeDF(10 * one_gb_longs, 1))
    assert mid >= 2 * (1 << 30) * 4 // _BLOCKED_CELL_BUDGET  # ≈ 32
    assert 9 <= round(big / mid) <= 11  # linear in payload
    assert _size_blocks(FakeDF(10_000 * one_gb_longs, 1)) == 4096  # cap


def test_jaccard_kernel_trailing_empty_partner():
    """A zero-length partner set that sorts LAST in its d1 group used to
    put starts[-1] == len(mask) and IndexError np.add.reduceat (r11
    ADVICE) — the non-trailing case was masked by the inters[lens==0]=0
    fix-up.  Empty partners must score 0 wherever they appear."""
    import numpy as np
    import pandas as pd

    from tidb_spark.data.dedup import _jaccard_pairs_kernel

    s1 = {1: np.array([3, 5], dtype=np.int64)}
    n1 = {1: 2}
    s2 = {
        2: np.array([3], dtype=np.int64),
        0: np.array([], dtype=np.int64),
    }
    n2 = {2: 1, 0: 0}
    # partner order (2, 0): the empty set is the TRAILING segment.
    ppdf = pd.DataFrame({"d1": [1, 1], "d2": [2, 0]})
    out = _jaccard_pairs_kernel(ppdf, s1, n1, s2, n2, 0.1, "int64", "int64")
    assert sorted(zip(out["d1"], out["d2"], out["jaccard"])) == [(1, 2, 0.5)]
    # Empty set LEADING, and an all-empty partner list.
    ppdf = pd.DataFrame({"d1": [1, 1], "d2": [0, 2]})
    out = _jaccard_pairs_kernel(ppdf, s1, n1, s2, n2, 0.1, "int64", "int64")
    assert sorted(zip(out["d1"], out["d2"], out["jaccard"])) == [(1, 2, 0.5)]
    ppdf = pd.DataFrame({"d1": [1], "d2": [0]})
    out = _jaccard_pairs_kernel(ppdf, s1, n1, s2, n2, 0.1, "int64", "int64")
    assert len(out) == 0


def test_dedup_cache_debt_bounded(spark):
    """The persist()ed verify intermediates (candidate frame + shingle
    sets; simhash signatures) must not accrete without bound in a
    long-lived session issuing many dedup calls (r11 verdict #4).  The
    FIFO debt registry keeps at most _CACHE_DEBT_LIMIT calls' caches
    (recent results stay fast to consume — releasing on result-handle
    GC was tried and unpersisted the cache BEFORE execution whenever a
    caller derived a new frame from the result, recomputing the
    candidate grid); release_cached() flushes everything."""
    docs = _corpus(spark)
    cm = spark._jsparkSession.sharedState().cacheManager()
    spark.catalog.clearCache()
    dd.release_cached()
    assert cm.isEmpty()

    res = dd.minhash_lsh_pairs(docs, "text", "doc_id", verify_threshold=0.4)
    res.count()
    assert not cm.isEmpty()  # intermediates cached while recent
    per_call = cm.cachedData().size()  # entries one call registers

    for _ in range(dd._CACHE_DEBT_LIMIT + 1):
        dd.simhash_pairs(docs, "text", "doc_id").count()
    # The registry holds the newest LIMIT calls only; the cacheManager
    # can never exceed LIMIT × the largest per-call entry count.
    assert len(dd._cache_debt) == dd._CACHE_DEBT_LIMIT
    assert cm.cachedData().size() <= dd._CACHE_DEBT_LIMIT * per_call
    # The oldest call (the minhash one) was evicted along the way.
    dd.release_cached()
    assert cm.isEmpty()
    assert dd._cache_debt == []
