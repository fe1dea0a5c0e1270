"""Operator families. Each module registers its queries with the central
registry (``spark_streaming_practicum_spark.registry``) at import time."""
