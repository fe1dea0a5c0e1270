"""Falsifiability for the privacy-audit certificates (round-11 verdict
task 4: generalize the ri_ok lesson).

The round-12 vacuity audit (scripts/certificate_vacuity_audit.py)
classified every certificate-style column; two privacy flags came back
clean-data-constant:

- privacy_t_closeness_audit: n_violating is 0 / t_close TRUE on the
  testdata (no cell's EMD crosses t=0.2), so the threshold comparison
  itself — like ri_ok — cannot be falsified by a code flip there
  (worst_t is live and parity-covered; the GATE is not).
- privacy_k_anonymity_audit: k_anonymous is constant FALSE on the
  testdata (violations everywhere). n_violating is live, but the flag
  has never been observed TRUE — both polarities should be reachable.

These tests build tiny deterministic scratch lakes that put each flag
on BOTH sides of its threshold, so a defect in the gate direction or
the threshold constant can no longer hide behind clean data.
"""

from __future__ import annotations

import datetime

from spark_streaming_practicum_spark.registry import all_queries

_DAY = datetime.datetime(2024, 3, 1, 12, 0, 0)
_SCHEMA = "user_id long, ts timestamp, event_type string, value double"


def _write_events(spark, path, rows) -> str:
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.parquet(
        f"{path}/events.parquet"
    )
    return str(path)


def _uniform_rows():
    """Every (age-band, event-type) cell holds one event per value
    decile {5,15,...,95} — each cell's distribution IS the global
    distribution, so every EMD is exactly 0."""
    rows = []
    for uid in range(5):  # bands 0..4
        for et in ("a", "b"):
            for b in range(10):
                rows.append((uid, _DAY, et, 5.0 + 10.0 * b))
    return rows


def test_t_closeness_flips_on_skewed_cell(spark, tmp_path):
    fn = all_queries()["privacy_t_closeness_audit"].fn

    clean = _write_events(spark, tmp_path / "clean", _uniform_rows())
    rows = {r.event_type: r for r in fn(spark, clean).collect()}
    assert set(rows) == {"a", "b"}
    assert all(r.t_close for r in rows.values())
    assert all(r.n_violating == 0 for r in rows.values())
    assert all(r.worst_t == 0.0 for r in rows.values())

    # Poison ONE cell (band 7, type 'a'): a point mass at the top
    # decile. EMD(point-mass-at-9, ~uniform) ~= 0.5 >> t=0.2.
    dirty_rows = _uniform_rows() + [(7, _DAY, "a", 95.0)] * 10
    dirty = _write_events(spark, tmp_path / "dirty", dirty_rows)
    rows = {r.event_type: r for r in fn(spark, dirty).collect()}
    assert not rows["a"].t_close
    assert rows["a"].n_violating == 1
    assert rows["a"].worst_t > 0.2
    # the uniform cells of type 'b' move only via the slightly shifted
    # global profile — still nowhere near the threshold
    assert rows["b"].t_close


def test_k_anonymity_flag_reaches_both_polarities(spark, tmp_path):
    fn = all_queries()["privacy_k_anonymity_audit"].fn

    # k=5: ten cells of exactly 5 rows each -> k-anonymous.
    clean_rows = [(uid, _DAY, "view", 1.0) for uid in range(10) for _ in range(5)]
    clean = _write_events(spark, tmp_path / "clean", clean_rows)
    rows = {r.event_type: r for r in fn(spark, clean).collect()}
    assert rows["view"].k_anonymous  # TRUE is reachable (never seen on testdata)
    assert rows["view"].n_violating == 0
    assert rows["view"].min_group_size == 5

    # One singleton cell (band 11) -> the flag flips with exact counts.
    dirty = _write_events(
        spark, tmp_path / "dirty", clean_rows + [(11, _DAY, "view", 1.0)]
    )
    rows = {r.event_type: r for r in fn(spark, dirty).collect()}
    assert not rows["view"].k_anonymous
    assert rows["view"].n_violating == 1
    assert rows["view"].n_rows_at_risk == 1
    assert rows["view"].min_group_size == 1
