"""Driver-contract query registry package (split from __spark_entry__.py)."""
from geodesk_spark.driver_queries.registry import (  # noqa: F401
    QUERIES,
    entry,
    oracle_sql,
    queries,
)
