"""Plan introspection & optimization observability."""

from cstore_fdw_spark.plans.verify import (  # noqa: F401
    explain_str, pushed_filters, scan_schema_columns, scan_metrics,
    assert_pushdown, filtered_row_count,
)
from cstore_fdw_spark.plans.estimate import (  # noqa: F401
    explain_estimate, join_by_estimate,
)
