"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship hot-items query (SURVEY §2 WA1+T1,
the reference's HotItemApp) at sf0.001. ``queries()``/``oracle_sql()``
expose the full registry from ``gmall_flink_20_spark.queries`` /
``.oracles`` for the driver's DuckDB correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# importable regardless of the caller's working directory
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from gmall_flink_20_spark.oracles import ORACLES
from gmall_flink_20_spark.queries import NO_ORACLE, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["hot_items_topn"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for every oracle-checkable query."""
    return {name: sql for name, sql in ORACLES.items() if name not in NO_ORACLE}
