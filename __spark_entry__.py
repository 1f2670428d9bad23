"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship extraction pipeline; ``queries`` /
``oracle_sql`` expose the operator registry in
``extractor/queries.py`` (each Spark implementation paired with a
DuckDB oracle where the semantics are SQL-expressible; Python-only
operators are covered by the pytest golden suite instead).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


_SHIPPED: set = set()


def _ship_package(spark: SparkSession) -> None:
    """Make the extractor package importable on executors regardless of
    which session the driver hands us (its session won't have run
    extractor.session.build_session).  Memoized per SparkContext —
    re-zipping the package for every one of the ~40 registry calls is
    pure waste."""
    try:
        key = spark.sparkContext.applicationId
        if key in _SHIPPED:
            return
        from extractor.session import package_pyfiles

        spark.sparkContext.addPyFile(package_pyfiles())
        _SHIPPED.add(key)
    except Exception:
        pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full document→markdown extraction at sf0.001.

    pages (synthesized from documents.parquet) → route → html
    boilerplate-strip + pdf page fan-out/OCR/reassembly → extracted
    table (url, text, pages, success, …).
    """
    _ship_package(spark)
    from extractor.config import ExtractConfig
    from extractor.pipeline import run_extraction
    from extractor.testgen import TEST_MAX_BYTES, pages_df

    pages = pages_df(spark, "/root/testdata/sf0.001")
    return run_extraction(
        spark, pages, ExtractConfig(max_bytes=TEST_MAX_BYTES)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from extractor.queries import REGISTRY

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ship_package(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(qd.spark) for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from extractor.queries import REGISTRY

    return {name: qd.sql for name, qd in REGISTRY.items() if qd.sql is not None}
