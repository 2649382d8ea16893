from __future__ import annotations

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from luc4ir_spark.session import get_spark

SF_TINY = "/root/testdata/sf0.001"
SF_SMALL = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="luc4ir_spark_tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s


def normalize_frame(pdf: pd.DataFrame) -> pd.DataFrame:
    """Mirror the driver's order-insensitive compare: sort columns by
    name, round floats, sort rows by all columns."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in pdf.columns:
        if pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(4)
        elif pdf[c].dtype.kind == "O":
            # array-valued cells (numpy arrays / lists) are unhashable
            # and unsortable — canonicalize to tuples like the driver
            pdf[c] = pdf[c].map(
                lambda v: tuple(v)
                if isinstance(v, (list, tuple))
                or type(v).__name__ == "ndarray"
                else v
            )
    return pdf.sort_values(list(pdf.columns), ignore_index=True)


def assert_frames_match(spark_df, duck_rel, name=""):
    left = normalize_frame(spark_df.toPandas())
    right = normalize_frame(duck_rel.df())
    assert len(left) == len(right), (
        f"{name}: row count {len(left)} != {len(right)}"
    )
    assert list(left.columns) == list(right.columns), (
        f"{name}: columns {list(left.columns)} != {list(right.columns)}"
    )
    for c in left.columns:
        lv, rv = left[c], right[c]
        if lv.dtype.kind == "f" or rv.dtype.kind == "f":
            pd.testing.assert_series_equal(
                lv.astype(float), rv.astype(float),
                check_names=False, atol=1e-6, rtol=1e-6,
            )
        else:
            assert lv.astype(str).tolist() == rv.astype(str).tolist(), (
                f"{name}: column {c} differs"
            )
