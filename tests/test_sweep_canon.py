"""Pin the strict sweep's canonicalization token semantics
(scripts/driver_contract_sweep.canon): the round-7/8 advice items live
here — NaN distinct from NULL, IEEE -0.0 distinct from +0.0 (the
grpo_group_advantage defect class must stay detectable) while zeros
produced by rounding inside the 1e-12 tolerance are identified with
+0.0, and tokens repr-sort deterministically."""

from __future__ import annotations

import importlib.util
import os


def _canon():
    path = os.path.join(os.path.dirname(__file__), "..", "scripts", "driver_contract_sweep.py")
    spec = importlib.util.spec_from_file_location("driver_contract_sweep", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.canon


def test_sign_of_zero_distinct_but_tolerance_zeros_identified():
    canon = _canon()
    # exact IEEE -0.0 vs +0.0: DISTINCT (the grpo defect class)
    assert canon(-0.0) != canon(0.0)
    # anything that rounds to zero inside the 1e-12 tolerance: identified
    assert canon(1e-15) == canon(0.0)
    assert canon(-1e-15) == canon(0.0)
    assert canon(-1e-15) == canon(1e-15)
    # ... and therefore distinct from an exact -0.0
    assert canon(-0.0) != canon(1e-15)


def test_nan_null_and_floats_distinct():
    canon = _canon()
    assert canon(float("nan")) != canon(None)
    assert canon(float("nan")) == canon(float("nan"))
    assert canon(1.0000000000001) == canon(1.0)  # inside 12-dp rounding
    assert canon(1.001) != canon(1.0)


def test_tokens_repr_sort_deterministically():
    canon = _canon()
    toks = [canon(v) for v in (-0.0, 0.0, 1e-15, -1.5, 2.0, float("nan"), None)]
    once = sorted(toks, key=repr)
    again = sorted(list(reversed(toks)), key=repr)
    assert once == again
