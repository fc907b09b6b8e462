"""Shared pytest fixtures: one SparkSession per test session, and a
Spark-vs-DuckDB comparison helper mirroring the driver's correctness gate
(row count + schema + order-insensitive value compare).
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tidb_spark.catalog import TABLES
from tidb_spark.session import get_spark

TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # local[8], 8 shuffle partitions: the grading driver itself runs
    # local[8], and the sf0.001 fixture rows-per-task at 32 threads round
    # to zero — 32-thread sessions only added task/socket churn (observed:
    # intermittent py4j connection drops late in the 200-test run, gone at
    # 8).  Perf-sensitive behavior is exercised by bench.py, not tests.
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    session = get_spark(
        "tidb-spark-tests", **{"spark.sql.shuffle.partitions": "8"}
    )
    yield session


@pytest.fixture()
def engine(spark, tmp_path):
    """A fresh Engine over the test fixture dir with an isolated managed-
    table workspace."""
    from tidb_spark.engine import Engine

    return Engine(spark, TEST_SF_DIR, workspace=str(tmp_path / "ws"))


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for table in TABLES:
        con.execute(
            f"CREATE VIEW {table} AS SELECT * FROM "
            f"'{TEST_SF_DIR}/{table}.parquet'"
        )
    yield con
    con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by all columns, as the driver does."""
    df = df.reindex(sorted(df.columns), axis=1)
    for col in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[col]):
            df[col] = df[col].astype("datetime64[ns]")
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
            drop=True
        )
    return df


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    assert list(a.columns) == list(b.columns), (
        f"{name}: column mismatch {list(a.columns)} vs {list(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    for col in a.columns:
        av, bv = a[col].to_numpy(), b[col].to_numpy()
        # The driver's value-hash is dtype-sensitive: an int64 Spark column vs
        # a float64 oracle column (e.g. DuckDB SUM(int) -> HUGEINT -> float64)
        # hash-mismatches even when every value is equal.  Catch that class
        # locally instead of letting it slip to the driver (tpch_q12, round 1).
        assert av.dtype.kind == bv.dtype.kind, (
            f"{name}.{col}: dtype kind mismatch spark={av.dtype} vs "
            f"oracle={bv.dtype} — driver hash compare is dtype-sensitive; "
            f"CAST the oracle (or Spark) side so both agree"
        )
        if np.issubdtype(av.dtype, np.floating):
            both_nan = pd.isna(av) & pd.isna(bv)
            close = np.isclose(av, bv, rtol=0, atol=1e-9) | both_nan
            assert close.all(), (
                f"{name}.{col}: value mismatch, max abs diff "
                f"{np.nanmax(np.abs(av - bv))}, first rows "
                f"{av[~close][:3]} vs {bv[~close][:3]}"
            )
            exact = (av == bv) | both_nan
            if not exact.all():
                # Flag near-misses: the driver's hash compare is exact.
                raise AssertionError(
                    f"{name}.{col}: values close but not bit-exact "
                    f"({(~exact).sum()} of {len(av)} rows differ; "
                    f"e.g. {av[~exact][:3]} vs {bv[~exact][:3]})"
                )
        else:
            an = a[col].where(pd.notna(a[col]), None)
            bn = b[col].where(pd.notna(b[col]), None)
            mismatch = ~(an.eq(bn) | (pd.isna(an) & pd.isna(bn)))
            assert not mismatch.any(), (
                f"{name}.{col}: {mismatch.sum()} mismatched values, e.g. "
                f"{an[mismatch].head(3).tolist()} vs {bn[mismatch].head(3).tolist()}"
            )
