"""Sources (reference A1-A4): batch parquet/csv/json readers and the
streaming text-file source."""

from .batch import read_csv, read_json, read_parquet
from .streaming import text_file_stream

__all__ = ["read_parquet", "read_csv", "read_json", "text_file_stream"]
