"""Sources & sinks: schema-declared CSV/JSON/Parquet/ORC readers with
validator parity, and JSON/CSV/Parquet/ORC writers.

Reference surface: SURVEY.md §2.1 S1-S7 (textFile CSV scans, JSON-lines
scan, boto3 JSON sink, pandas CSV sink, derived-table re-ingest).
"""

from bigdata_processing_spark.sources.readers import (  # noqa: F401
    read_csv,
    read_json,
    read_orc,
    read_parquet_evolved,
)
from bigdata_processing_spark.sources.writers import (  # noqa: F401
    write_avro,
    write_csv,
    write_json,
    write_orc,
    write_parquet,
    write_sorted_parquet,
)
