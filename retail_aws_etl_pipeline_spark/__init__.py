"""retail_aws_etl_pipeline_spark — a PySpark-native analytics engine.

A brand-new, idiomatic-Spark re-expression of the query and data-processing
capabilities of the reference retail ETL pipeline
(Tbrown1998/Retail-AWS-ETL-Pipeline), extended with large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing).

Design principles (see SURVEY.md):
- DataFrame/SQL first; Catalyst plans everything. No RDDs.
- Native ``pyspark.sql.functions`` expressions in the hot path; Pandas UDFs
  only where built-ins genuinely can't express the semantics.
- Partition-aware at 100 TB: broadcast small dims, dynamic partition
  overwrite, AQE, single-pass metrics via ``observe``, no driver collects
  beyond file-head sniffing.
"""

__version__ = "0.1.0"

from retail_aws_etl_pipeline_spark.session import get_spark  # noqa: F401
