from retail_aws_etl_pipeline_spark.plans.queries import (  # noqa: F401
    EXTRA_REGISTRY,
    REGISTRY,
    QuerySpec,
    all_specs,
    queries,
    oracle_sql,
)

# Importing these modules populates REGISTRY via their @register decorators.
from retail_aws_etl_pipeline_spark.plans import analytics  # noqa: E402,F401
from retail_aws_etl_pipeline_spark.plans import extensions  # noqa: E402,F401
