"""Interpreter-startup shim for Spark-spawned Python runners.

Shipped to workers by prepending this directory to the PYTHONPATH that
rides the UDF's envVars (see pbcompat.worker_pythonpath); the ``site``
module auto-imports ``sitecustomize`` at startup, which is the only
hook early enough for runners that import pyspark's generated protobuf
gencode before any user code runs (the transformWithStateInPandas
PRE-INIT driver runner does exactly that).

Effect: waive the protobuf gencode-vs-runtime minor-version pin
(gencode 6.33 vs the vendored pure-Python 6.32 runtime — see
pbcompat.py for why that gap is sound to waive). No-op everywhere else.
"""

try:
    from google.protobuf import runtime_version as _rv

    _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
except Exception:
    pass
