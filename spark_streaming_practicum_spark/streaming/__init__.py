"""Ingestion layer: reference-parity parse/validate/route (batch-testable
transforms) plus the Structured Streaming control plane around them."""

from .parser import SERVICE_COLUMNS, JsonArrayBatchParser
from .router import DeadLetterReason, Router

__all__ = ["JsonArrayBatchParser", "Router", "DeadLetterReason", "SERVICE_COLUMNS"]
