"""Streaming sources (reference A1/A2).

The reference reads raw batch files "as-is" with the text format so the
parser owns all interpretation (/root/reference/src/consumer/
data_sources.py:9-36); S3/MinIO is the same scan over s3a:// plus
fs.s3a.* session conf (data_sources.py:39-51, session_builder.py:53-81).
Object-store conf is exposed here but unused in the harness (no MinIO).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def text_file_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Unbounded stream of new files under ``path``, one row per line,
    column ``value: string`` — the raw-batch contract."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def s3a_path(uri: str) -> str:
    """Rewrite an s3:// URI to the s3a:// scheme Spark's Hadoop connector
    expects (reference consumer/utilities.py:6-10). Local paths pass
    through unchanged."""
    return f"s3a://{uri[len('s3://'):]}" if uri.startswith("s3://") else uri


def s3a_conf(endpoint: str, access_key: str, secret_key: str) -> dict[str, str]:
    """Session conf for an S3-compatible store (path-style, reference
    session_builder.py:53-81). Returned as a dict for build_session's
    extra_conf — never hardcoded into the engine."""
    return {
        "spark.hadoop.fs.s3a.endpoint": endpoint,
        "spark.hadoop.fs.s3a.access.key": access_key,
        "spark.hadoop.fs.s3a.secret.key": secret_key,
        "spark.hadoop.fs.s3a.path.style.access": "true",
        "spark.hadoop.fs.s3a.impl": "org.apache.hadoop.fs.s3a.S3AFileSystem",
    }
