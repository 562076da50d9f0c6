"""Sources & sinks: format-pluggable readers/writers for the engine."""

from cstore_fdw_spark.sources.formats import (  # noqa: F401
    read_source, write_sink, SUPPORTED_FORMATS,
)
