"""spark_streaming_practicum_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference repo
(vsevolodbazhan/spark-streaming-practicum, surveyed in SURVEY.md) as an
idiomatic DataFrame / Structured Streaming library, extended with the
LLM-data-pipeline operator set (dedup, similarity search, text analysis,
multimodal plumbing) designed for 100 TB scale.

Layout:
    session      — tuned SparkSession builder
    catalog      — testdata table loaders / temp-view registration
    registry     — query registry backing ``__spark_entry__.py``
    operators/   — relational + north-star operator implementations
    sources/     — batch & streaming sources (reference A1-A4)
    functions/   — column-expression helpers (vector math, text fns)
    plans/       — plan inspection / assertion helpers
    streaming/   — ingestion parity: parser, router, processor, sinks
"""

__version__ = "0.1.0"
