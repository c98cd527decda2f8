"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG query; ``queries()`` exposes one
callable per implemented operator (SURVEY.md §2); ``oracle_sql()``
gives the DuckDB-equivalent ANSI SQL for every SQL-expressible entry
(UDF-backed tagger/KG ops are rows-only by nature).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: tag the documents
    corpus with the GRU-CRF engine, extract entity mentions + triples,
    and return canonicalized KG edges."""
    from lacspark.queries import SPARK_QUERIES

    return SPARK_QUERIES["kg_edges"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from lacspark.queries import SPARK_QUERIES

    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    from lacspark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
