"""Correctness gate mirror: every registered query with an oracle is run on
Spark and DuckDB and compared (row count + columns + values), exactly like the
driver's CORRECTNESS harness but at sf0.001 for speed.
"""

from __future__ import annotations

import pytest

from tidb_spark.queries import all_queries
from tests.conftest import TEST_SF_DIR, assert_frames_match

_QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, duck):
    q = _QUERIES[name]
    sdf = q.spark(spark, TEST_SF_DIR)
    spark_pdf = sdf.toPandas()
    if q.oracle is None:
        assert spark_pdf is not None  # rows-only smoke for non-SQL ops
        return
    oracle_pdf = duck.execute(q.oracle).fetchdf()
    assert_frames_match(spark_pdf, oracle_pdf, name)


def test_approx_sketches_within_error_envelope(spark, duck):
    """The one permanently-no-oracle aggregate still gets teeth: HLL++
    distinct counts must sit within the documented relative-error envelope
    of the exact count (approx_count_distinct default rsd=5%, we allow 3x),
    and percentile_approx must land between the exact p25 and p75."""
    pdf = (
        _QUERIES["agg_approx_sketches"].spark(spark, TEST_SF_DIR).toPandas()
    )
    exact = duck.execute(
        "SELECT l_returnflag,"
        "       COUNT(DISTINCT l_partkey) AS exact_parts,"
        "       CAST(quantile_cont(l_quantity, 0.25) AS DOUBLE) AS p25,"
        "       CAST(quantile_cont(l_quantity, 0.75) AS DOUBLE) AS p75"
        " FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
    ).fetchdf()
    merged = pdf.merge(exact, on="l_returnflag")
    assert len(merged) == len(pdf) == len(exact)
    rel_err = (
        (merged.approx_parts - merged.exact_parts).abs() / merged.exact_parts
    )
    assert (rel_err <= 0.15).all(), f"HLL++ rel err too big:\n{merged}"
    ok = (merged.approx_median_qty >= merged.p25) & (
        merged.approx_median_qty <= merged.p75
    )
    assert ok.all(), f"approx median outside [p25, p75]:\n{merged}"
