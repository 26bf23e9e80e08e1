from retail_aws_etl_pipeline_spark.operators.validate import (  # noqa: F401
    QualitySplit,
    split_quality,
)
