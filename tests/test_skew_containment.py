"""Operator tests: salted join equivalence (incl. hot-key split path) and
containment vs jaccard semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tidb_spark.data.dedup import containment_pairs, ngram_jaccard_pairs
from tidb_spark.operators.skew import salted_join


@pytest.fixture()
def skewed(spark):
    # key 7 is hot (80% of facts); dim has one row per key.
    big = spark.range(0, 500).select(
        F.when(F.col("id") % 5 != 0, F.lit(7)).otherwise(F.col("id") % 40)
        .alias("k"),
        F.col("id").alias("fact_id"),
    )
    small = spark.range(0, 40).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("payload")
    )
    return big, small


def _agg(df):
    return sorted(
        df.groupBy("k").agg(F.count("*").alias("n"),
                            F.sum("fact_id").alias("s")).collect()
    )


def test_salted_join_inner_matches_plain(spark, skewed):
    big, small = skewed
    plain = _agg(big.join(small, "k"))
    salted = _agg(salted_join(big, small, on=["k"], salt=8, how="inner"))
    assert salted == plain


def test_salted_join_left_matches_plain(spark, skewed):
    big, small = skewed
    # Restrict the dim so some fact keys are unmatched.
    small = small.where(F.col("k") < 20)
    plain = _agg(big.join(small, "k", "left"))
    salted = _agg(salted_join(big, small, on=["k"], salt=4, how="left"))
    assert salted == plain


def test_salted_join_hot_keys_branch(spark, skewed):
    big, small = skewed
    hot = spark.createDataFrame([(7,)], "k long")
    plain = _agg(big.join(small, "k"))
    salted = _agg(
        salted_join(big, small, on=["k"], salt=8, how="inner", hot_keys=hot)
    )
    assert salted == plain


def test_salted_join_rejects_right_full(spark, skewed):
    big, small = skewed
    with pytest.raises(ValueError):
        salted_join(big, small, on=["k"], how="full")


def test_containment_catches_embedded_doc_jaccard_misses(spark):
    short = "alpha beta gamma delta epsilon zeta"
    long = short + " " + " ".join(f"filler{i} word{i} pad{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, short), (2, long), (3, "completely different text here entirely")],
        "doc_id long, text string",
    )
    cont = containment_pairs(
        docs, "text", "doc_id", k=8, threshold=0.9, max_posting=None
    ).collect()
    jac = ngram_jaccard_pairs(
        docs, "text", "doc_id", k=8, threshold=0.9, max_posting=None
    ).collect()
    # doc 1 is fully contained in doc 2: containment ~1.0, jaccard tiny.
    assert [(r.d1, r.d2) for r in cont] == [(1, 2)]
    assert jac == []
