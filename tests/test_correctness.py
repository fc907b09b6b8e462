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


def test_approx_sketches_within_error_envelope(spark):
    """The sketch aggregate is self-checking since round 3: the query
    computes the HLL-vs-exact and approx-median-vs-quantile-envelope
    booleans itself (its oracle asserts they are all TRUE).  This test pins
    the same contract directly so a broken envelope fails fast even outside
    the driver gate."""
    pdf = (
        _QUERIES["agg_approx_sketches"].spark(spark, TEST_SF_DIR).toPandas()
    )
    assert len(pdf) == 3
    assert pdf.cd_within_5pct.all(), pdf
    assert pdf.median_within_envelope.all(), pdf
