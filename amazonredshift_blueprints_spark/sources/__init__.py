"""External sources/sinks beyond the local parquet catalog."""

from .jdbc import (
    jdbc_reader,
    jdbc_writer,
    parse_connection_url,
    redshift_jdbc_options,
    resolve_jdbc_options,
)

__all__ = [
    "jdbc_reader",
    "jdbc_writer",
    "parse_connection_url",
    "redshift_jdbc_options",
    "resolve_jdbc_options",
]
