from mmlspark_spark.plans.catalog import CATALOG, QuerySpec, oracle_sql, queries

__all__ = ["CATALOG", "QuerySpec", "oracle_sql", "queries"]
