"""Streaming control plane (reference parity: A24-A28).

Re-expressed from /root/reference/src/consumer/stream_processor.py with
one deliberate fix (SURVEY.md §4 "double computation hazard"): the
reference runs two count() actions plus two writes over uncached lineage
(stream_processor.py:118-129), recomputing the parse up to 4x per
micro-batch. Here each micro-batch is persisted once, observability
counts come off the persisted frame, and both sinks read it.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from .parser import JsonArrayBatchParser
from .router import Router
from .sinks import ParquetSink

logger = logging.getLogger(__name__)


@dataclass
class BatchMetrics:
    batch_id: int
    valid_rows: int
    dead_letter_rows: int


@dataclass
class StreamProcessor:
    """Parse -> validate -> route -> dual-sink, per micro-batch.

    Parity map (reference stream_processor.py):
    - foreachBatch multi-sink routing  :148-157 (A25)
    - micro-batch trigger              :154     (A24)
    - checkpointing                    :150-153 (A26)
    - graceful stop / progress         :131-167 (A27, A28)
    """

    schema: T.StructType
    valid_sink: ParquetSink
    dead_letter_sink: ParquetSink
    checkpoint_location: str
    trigger_interval: str = "30 seconds"
    json_options: dict[str, str] = field(default_factory=dict)
    metrics: list[BatchMetrics] = field(default_factory=list)

    def process_batch(self, batch: DataFrame, batch_id: int) -> BatchMetrics:
        """Route one (micro-)batch; also callable on plain batch frames.

        Observability counts ride the sink writes as ``Observation``
        metrics (CollectMetrics in the plan), so each micro-batch runs
        exactly TWO jobs (one per sink) — the reference runs four over
        uncached lineage (stream_processor.py:118-129)."""
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        parser = JsonArrayBatchParser(self.schema, self.json_options)
        router = Router(self.schema)
        parsed = parser.parse(batch).persist()
        try:
            routed = router.split(parsed)
            obs_v, obs_d = Observation(), Observation()
            self.valid_sink.write(
                routed.valid.observe(obs_v, F.count(F.lit(1)).alias("n"))
            )
            self.dead_letter_sink.write(
                routed.dead_letters.observe(obs_d, F.count(F.lit(1)).alias("n"))
            )
            valid_count = obs_v.get["n"]
            dead_count = obs_d.get["n"]
        finally:
            parsed.unpersist()
        m = BatchMetrics(batch_id=batch_id, valid_rows=valid_count, dead_letter_rows=dead_count)
        self.metrics.append(m)
        logger.info(
            "batch=%d valid=%d dead_letters=%d", m.batch_id, m.valid_rows, m.dead_letter_rows
        )
        return m

    def start(self, stream: DataFrame, available_now: bool = False) -> StreamingQuery:
        """Start the streaming query over a raw text-batch stream.

        ``available_now=True`` switches to Trigger.AvailableNow: process
        everything currently in the source (in rate-limited micro-
        batches, honoring the checkpoint) and stop — the backfill /
        catch-up mode that reuses the exact streaming pipeline and its
        exactly-once bookkeeping for batch drains."""
        writer = stream.writeStream.option("checkpointLocation", self.checkpoint_location)
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=self.trigger_interval)
        return writer.foreachBatch(lambda df, bid: self.process_batch(df, bid)).start()

    @staticmethod
    def log_progress(query: StreamingQuery) -> dict | None:
        """One progress sample (reference stream_processor.py:131-144)."""
        progress = query.lastProgress
        if progress:
            logger.info(
                "stream_progress batch=%s rows=%s in_rps=%s proc_rps=%s trigger_ms=%s",
                progress.get("batchId"),
                progress.get("numInputRows"),
                progress.get("inputRowsPerSecond"),
                progress.get("processedRowsPerSecond"),
                (progress.get("durationMs") or {}).get("triggerExecution"),
            )
        return progress
