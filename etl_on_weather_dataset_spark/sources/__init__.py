"""Schema-pinned sources and sinks."""

from .io import read_csv, read_parquet, write_csv, write_parquet, write_jdbc  # noqa: F401
