from retail_aws_etl_pipeline_spark.plans.queries import (  # noqa: F401
    REGISTRY,
    QuerySpec,
    queries,
    oracle_sql,
)
