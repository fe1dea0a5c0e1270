"""Every registered query vs its DuckDB oracle at sf0.001 — a local mirror
of the driver's correctness gate (row count + column names + order-
insensitive value comparison, with a small float tolerance)."""

from __future__ import annotations

import math
from datetime import datetime

import pytest

from spark_streaming_practicum_spark.registry import all_queries

from .conftest import SF_DIR

DEFS = all_queries()
SQL_CHECKED = sorted(name for name, d in DEFS.items() if d.oracle is not None)
ROWS_ONLY = sorted(name for name, d in DEFS.items() if d.oracle is None)


def _canon_value(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    return v


def _canon_rows(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon_value(row[i]) for i in order) for row in rows]
    return sorted(columns), sorted(out, key=repr)


def _values_close(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, (float, int)):
        return math.isclose(a, float(b), rel_tol=1e-7, abs_tol=1e-7)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_values_close(x, y) for x, y in zip(a, b))
    return a == b


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(name, spark, oracle_con):
    d = DEFS[name]
    sdf = d.fn(spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = list(sdf.columns)

    res = oracle_con.execute(d.oracle)
    duck_cols = [c[0] for c in res.description]
    duck_rows = res.fetchall()

    s_cols, s_rows = _canon_rows(spark_cols, spark_rows)
    o_cols, o_rows = _canon_rows(duck_cols, duck_rows)

    assert s_cols == o_cols, f"{name}: column names differ: {s_cols} vs {o_cols}"
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count {len(s_rows)} vs oracle {len(o_rows)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if not _values_close(a, b)
    ]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name, spark):
    d = DEFS[name]
    sdf = d.fn(spark, SF_DIR)
    n = sdf.count()
    assert n >= 0
    # schema must be stable/collectable
    sdf.limit(5).collect()
