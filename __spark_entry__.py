"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's word-count
pipeline over the synthetic ``documents`` corpus at sf0.001);
``queries()`` / ``oracle_sql()`` expose the engine's full registered
catalog (mapreduce_word2vec_spark.plans.catalog).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from mapreduce_word2vec_spark.plans import catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: reference word-count pipeline on sf0.001 documents."""
    qs = catalog.queries()
    return qs["doc_wordcount"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    return catalog.oracle_sql()
