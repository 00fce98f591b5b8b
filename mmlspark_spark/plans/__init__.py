from mmlspark_spark.plans.catalog import CATALOG, QuerySpec, oracle_sql, queries
from mmlspark_spark.plans.lint import assert_scalable, lint_plan

__all__ = ["CATALOG", "QuerySpec", "assert_scalable", "lint_plan",
           "oracle_sql", "queries"]
