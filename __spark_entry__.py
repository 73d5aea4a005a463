"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction slice end-to-end on a
deterministic synthetic Amharic corpus (the graft's input table shape) plus
the driver's sf0.001 parquet, and returns the vendor scorecard.

``queries()`` / ``oracle_sql()`` cover the SURVEY.md §2 operator inventory
over the driver's pre-registered parquet tables, each with a DuckDB ANSI-SQL
twin where SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: synthetic message corpus → extraction → triples →
    vendor scorecard (highest lending score first)."""
    from amharic_ecommerce_data_extractor_spark.data.synthetic import generate_messages
    from amharic_ecommerce_data_extractor_spark.operators.extract import extract_entities
    from amharic_ecommerce_data_extractor_spark.operators.scorecard import vendor_scorecard

    msgs = generate_messages(spark, n_rows=2000, n_vendors=20)
    return vendor_scorecard(extract_entities(msgs))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from amharic_ecommerce_data_extractor_spark.queries import SPARK_QUERIES

    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    from amharic_ecommerce_data_extractor_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
