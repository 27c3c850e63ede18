"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship BM25 top-k over sf0.001 documents.
queries()     — one callable per implemented operator
                (SURVEY.md §2 + training-data pipeline ops),
                backed by addok_spark.entry_queries.
oracle_sql()  — matching DuckDB SQL per query (same column names,
                same rounding), for the driver's side-by-side
                correctness check at sf0.01.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def _prepare(spark: SparkSession) -> None:
    """Ship the package to executors (pandas-UDF closures unpickle
    addok_spark on workers; ≙ spark-submit --py-files)."""
    try:
        from addok_spark.session import ship_package

        ship_package(spark)
    except Exception:
        pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _prepare(spark)
    from addok_spark.entry_queries import QUERIES

    return QUERIES["bm25_topk"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from addok_spark.entry_queries import QUERIES

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _prepare(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from addok_spark.entry_queries import ORACLES

    return dict(ORACLES)
