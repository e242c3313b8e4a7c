"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship CDC materialization at sf0.001; ``queries`` /
``oracle_sql`` expose every batch-expressible operator from SURVEY.md §2
plus the training-data ops — ALL 47 paired with DuckDB-runnable ANSI SQL
(column names aligned on both sides; even the Arrow mapInPandas multimodal
path is oracled via its portable integer fake decode). Streaming-only ops
(exactly-once commit protocol, stateful gap monitor, the postgres-logical
slot state machine) are covered by the pytest suite instead.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full change-log
    materialization (LWW dedup + delete filtering — the batch-expressible
    core of the CDC apply path)."""
    from cdc_spark.queries import q_cdc_materialize

    return q_cdc_materialize(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from cdc_spark.queries import registry

    return {name: fn for name, (fn, _sql) in registry().items()}


def oracle_sql() -> dict[str, str]:
    from cdc_spark.queries import registry

    return {
        name: sql for name, (_fn, sql) in registry().items() if sql is not None
    }
