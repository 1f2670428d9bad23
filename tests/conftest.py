"""Shared fixtures: one SparkSession per test run, small testdata paths."""

from __future__ import annotations

import pytest


SF_TINY = "/root/testdata/sf0.001"
SF_SMALL = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from extractor.session import build_session

    wh = str(tmp_path_factory.mktemp("spark-warehouse"))
    spark = build_session(
        app_name="extractor-tests",
        master="local[4]",
        shuffle_partitions=8,
        # managed tables (the bucketed-join plan test) land in tmp,
        # never in the repo working dir
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    yield spark
    spark.stop()
