from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qcache_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="qcache-spark-tests", cpus=4)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def make_frame(spark, csv_text: str, types: dict | None = None):
    """Build a test frame with reference CSV ingest semantics."""
    from qcache_spark.sources import from_csv

    df, _ = from_csv(spark, csv_text.strip())
    return df


@pytest.fixture(scope="session")
def basic_frame(spark):
    # reference fixture test_qframe.py:16-24
    return make_frame(
        spark,
        """
foo,bar,baz,qux
bbb,1.25,5,qqq
aaa,3.25,7,qqq
ccc,,9,www
""",
    )


@pytest.fixture(scope="session")
def bitwise_frame(spark):
    # reference fixture test_qframe.py:138-147
    return make_frame(
        spark,
        """
foo,bar,baz
1,1.5,abc
2,1.5,def
3,1.5,ghi
4,1.5,ijk
5,1.5,lmn
""",
    )


@pytest.fixture(scope="session")
def string_frame(spark):
    # reference fixture test_qframe.py:197-205
    return make_frame(
        spark,
        """
foo,bar
1,abcd
2,defg
3,ghij
4,gxyj
""",
    )


@pytest.fixture(scope="session")
def calculation_frame(spark):
    # reference fixture test_qframe.py:417-427
    return make_frame(
        spark,
        """
foo,bar
1,10
1,11
2,20
3,30
3,33
""",
    )
