"""Property test: asof_join vs pandas.merge_asof as an independent oracle
(random keyed time series, both directions, with and without tolerance).

Deterministic RNG seeds (no hypothesis shrinking needed — failures print
the seed) keep the suite reproducible while still exploring edge shapes:
duplicate timestamps, keys present on one side only, empty sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tidb_spark.operators.asof import asof_join


def _random_frames(seed: int):
    rng = np.random.default_rng(seed)
    n_l, n_r = rng.integers(0, 40, size=2)
    keys = rng.integers(0, 4, size=max(n_l, 1))
    left = pd.DataFrame(
        {
            "k": keys[:n_l],
            "lt": pd.to_datetime(
                rng.integers(0, 5000, size=n_l) * 1_000_000, unit="us"
            ),
            "lv": np.arange(n_l, dtype=np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 4, size=n_r),
            "rt": pd.to_datetime(
                rng.integers(0, 5000, size=n_r) * 1_000_000, unit="us"
            ),
            "rv": np.arange(n_r, dtype=np.int64) + 1000,
        }
    )
    return left, right


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("tol_s", [None, 60])
def test_asof_matches_pandas_merge_asof(spark, seed, direction, tol_s):
    left, right = _random_frames(seed)
    sl = spark.createDataFrame(left) if len(left) else spark.createDataFrame(
        [], "k long, lt timestamp, lv long"
    )
    sr = spark.createDataFrame(right) if len(right) else spark.createDataFrame(
        [], "k long, rt timestamp, rv long"
    )
    got = (
        asof_join(
            sl,
            sr,
            on=["k"],
            left_time="lt",
            right_time="rt",
            direction=direction,
            tolerance_us=None if tol_s is None else tol_s * 1_000_000,
        )
        .select("k", "lt", "lv", F.col("rv_r").alias("rv"))
        .toPandas()
        .sort_values(["k", "lt", "lv"])
        .reset_index(drop=True)
    )
    # pandas oracle: merge_asof needs time-sorted inputs; among EQUAL right
    # times the operator keeps the union-order last one, which for distinct
    # rv values is whichever sorts last — align pandas by making it pick
    # the same row (stable sort by rt keeps input order; our operator's
    # tie-winner among equal (rt, side) rows is the last in sort order,
    # which after a stable sort is the later input row — identical).
    want = (
        pd.merge_asof(
            left.sort_values(["lt", "lv"], kind="mergesort"),
            right.sort_values(["rt", "rv"], kind="mergesort"),
            left_on="lt",
            right_on="rt",
            by="k",
            direction=direction,
            tolerance=None if tol_s is None else pd.Timedelta(seconds=tol_s),
        )[["k", "lt", "lv", "rv"]]
        .sort_values(["k", "lt", "lv"])
        .reset_index(drop=True)
    )
    got_rv = got["rv"].astype("float64")
    want_rv = want["rv"].astype("float64")
    assert len(got) == len(want), f"seed={seed} {direction} tol={tol_s}"
    pd.testing.assert_frame_equal(
        got[["k", "lt", "lv"]], want[["k", "lt", "lv"]], check_dtype=False
    )
    eq = (got_rv == want_rv) | (got_rv.isna() & want_rv.isna())
    assert eq.all(), (
        f"seed={seed} {direction} tol={tol_s}\n"
        f"{got[~eq]}\nvs\n{want[~eq]}"
    )
