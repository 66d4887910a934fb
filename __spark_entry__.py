"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship Bloom build→probe job at sf0.001;
``queries()`` exposes every implemented operator as (spark, sf_dir) →
DataFrame; ``oracle_sql()`` gives the DuckDB-runnable exact oracle per query
(see bloom_filter_spark/plans/queries.py for the conventions).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from bloom_filter_spark.plans import flagship
    return flagship(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from bloom_filter_spark.plans import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted entries are checked
    rows-only by the driver)."""
    from bloom_filter_spark.plans import ORACLES
    return ORACLES()
