from retail_aws_etl_pipeline_spark.functions.timestamps import (  # noqa: F401
    REFERENCE_PATTERNS,
    EXTENDED_PATTERNS,
    parse_timestamp,
)
from retail_aws_etl_pipeline_spark.functions.numeric import (  # noqa: F401
    clean_currency,
    clean_quantity,
)
from retail_aws_etl_pipeline_spark.functions.hashing import (  # noqa: F401
    business_row_hash,
    business_row_hash64,
)
