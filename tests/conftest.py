"""Shared fixtures: one SparkSession per test run, small testdata paths."""

from __future__ import annotations

import pytest


SF_TINY = "/root/testdata/sf0.001"
SF_SMALL = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from extractor.session import build_session

    spark = build_session(app_name="extractor-tests", master="local[4]", shuffle_partitions=8)
    yield spark
    spark.stop()
