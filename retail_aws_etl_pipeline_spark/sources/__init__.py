from retail_aws_etl_pipeline_spark.sources.sniff import sniff_delimiter, sniff_text  # noqa: F401
from retail_aws_etl_pipeline_spark.sources.reader import read_flexible_csv, FlexibleCsvMeta  # noqa: F401
