"""Sources and sinks (reference operators S1-S6, SURVEY §2.1)."""

from agent_data_wrangler_spark.sources.readers import (
    read_csv,
    read_parquet,
    read_table,
    require_exists,
)
from agent_data_wrangler_spark.sources.writers import (
    next_version_path,
    write_report,
    write_versioned,
)

__all__ = [
    "read_csv",
    "read_parquet",
    "read_table",
    "require_exists",
    "write_versioned",
    "next_version_path",
    "write_report",
]
