"""Every registered query vs its DuckDB oracle — a local mirror of the
driver's correctness gate, deliberately STRICTER than round 1's version.

The driver collects the Spark result as Python rows and fetches the DuckDB
result through pandas, then hashes values type-sensitively. That pipeline
surfaces DuckDB HUGEINT/DECIMAL arithmetic as float64 while Spark bigints
stay ints — so an oracle with an un-cast ``SUM(int)`` is value-identical yet
hash-different. This mirror reproduces both sides of that pipeline:

- Spark side: ``collect()`` → ``pd.DataFrame`` (ints stay Python ints);
- DuckDB side: ``.df()`` (HUGEINT/DECIMAL become float64, DATE becomes
  ``datetime.date`` objects, TIMESTAMP becomes datetime64);
- comparison: canonicalized cells tagged by type KIND — an int on one side
  and a float on the other NEVER compare equal, no matter the value.

Floats are rounded to 9 dp before comparison (both engines round display
columns in-query to ≤6 dp, so this only absorbs last-bit noise).
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import numpy as np
import pandas as pd
import pytest

from spark_streaming_practicum_spark.registry import all_queries

from .conftest import SF_DIR

# The parity sweep is the suite's largest single block (~5 min of the
# ~12-13 min total at round-8 size). The round-7 verdict's suite-time
# plan: when the single-invocation run passes the 10-minute guard,
# split THIS file behind a marker — close runs become two invocations,
# each under the guard, with identical total coverage:
#   python -m pytest tests/ -q -m "not parity and not slow"
#   python -m pytest tests/ -q -m parity
#   python -m pytest tests/ -q -m slow   (whole-registry plan lint, once per round)
pytestmark = pytest.mark.parity

DEFS = all_queries()
SQL_CHECKED = sorted(name for name, d in DEFS.items() if d.oracle is not None)
ROWS_ONLY = sorted(name for name, d in DEFS.items() if d.oracle is None)

# Query construction is not free: several operators run eager driver
# jobs while BUILDING the plan (scaling counts, k-means seeds, MMR
# rounds, checkpointed certificate slices). The parity test, the
# hashable-schema test and the plan lint all need the same DataFrame —
# the session-wide cache in conftest builds each once (round-4 verdict
# task 8).
from .conftest import built_query as _conftest_built


def _built(name, spark):
    return _conftest_built(name, spark)


def _canon_cell(v):
    """Canonicalize one value to a (kind, value) tag. Kinds never cross-match."""
    if v is None or v is pd.NaT:
        return ("null",)
    if isinstance(v, float) and math.isnan(v):
        return ("null",)
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, Decimal):
        # a Decimal leaking to the driver compares as its own kind — flag it
        return ("dec", str(v))
    if isinstance(v, (float, np.floating)):
        return ("f", round(float(v), 9))
    if isinstance(v, (pd.Timestamp, datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ("t", ts.isoformat())
    if isinstance(v, date):
        # the driver's hash equates DATE with midnight TIMESTAMP (observed:
        # round-1 cohort_retention/date_arithmetic passed with Spark dates
        # vs DuckDB date_trunc timestamps) — mirror that here
        return ("t", pd.Timestamp(v).isoformat())
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("a", tuple(_canon_cell(x) for x in v))
    if isinstance(v, bytes):
        return ("y", v)
    return ("s", str(v))


def _canon_frame(pdf: pd.DataFrame):
    cols = sorted(pdf.columns)
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(rows, key=repr)


def spark_frame(sdf) -> pd.DataFrame:
    """Spark result the way the driver sees it: collected Python rows."""
    return pd.DataFrame([tuple(r) for r in sdf.collect()], columns=list(sdf.columns))


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(name, spark, oracle_con):
    d = DEFS[name]
    sdf = _built(name, spark)
    spdf = spark_frame(sdf)
    opdf = oracle_con.execute(d.oracle).df()

    s_cols, s_rows = _canon_frame(spdf)
    o_cols, o_rows = _canon_frame(opdf)

    assert s_cols == o_cols, f"{name}: column names differ: {s_cols} vs {o_cols}"
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count {len(s_rows)} vs oracle {len(o_rows)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
    )


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_oracled_output_is_hashable(name, spark):
    """The driver's value hash cannot digest array/map/struct columns —
    every oracled query must emit scalar columns only."""
    from pyspark.sql import types as T

    sdf = _built(name, spark)
    bad = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not bad, f"{name}: non-hashable output columns {bad}"


def test_registry_fully_oracled():
    """Since round 9 every registered query carries an oracle (the last
    rows-only entry, stream_dedup_within_watermark, gained a
    certified-invariant oracle). A future oracle=None regression must
    fail LOUDLY here, not reappear as a silent rows-only skip
    (round-9 verdict task 7)."""
    assert ROWS_ONLY == [], f"queries silently de-oracled: {ROWS_ONLY}"


if ROWS_ONLY:
    # The weaker rows-only harness, kept for the day the registry is
    # unfrozen with a genuinely non-SQL-expressible query. Defined
    # conditionally: an empty parametrize would otherwise collect one
    # permanently-skipped placeholder (round-9 verdict task 7 wants the
    # suite to show 0 skips outside the Iceberg gate).
    @pytest.mark.parametrize("name", ROWS_ONLY)
    def test_rows_only_queries_run(name, spark):
        d = DEFS[name]
        sdf = d.fn(spark, SF_DIR)
        n = sdf.count()
        assert n >= 0
        # schema must be stable/collectable
        sdf.limit(5).collect()
