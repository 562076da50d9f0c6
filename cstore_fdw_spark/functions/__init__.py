"""Engine function library: skew handling, misc helpers."""

from cstore_fdw_spark.functions.skew import (  # noqa: F401
    salted_count, salted_join_small, salted_sum_count,
)
