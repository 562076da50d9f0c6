"""Engine function library: skew handling, distributed prefix sums,
misc helpers."""

from cstore_fdw_spark.functions.prefix import (  # noqa: F401
    distributed_cumsum,
)
from cstore_fdw_spark.functions.skew import (  # noqa: F401
    salted_count, salted_join_small, salted_sum_count,
)
