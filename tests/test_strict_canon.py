"""Unit pins for the driver-faithful canonicalizer in
tools/strict_oracle_check.py — the hash-semantics model calibrated from
five rounds of driver evidence (round 7). If canon drifts, the local gate
replica silently diverges from the real gate again (the round-6 k_tower
failure mode), so every calibrated equivalence is pinned here."""

from __future__ import annotations

from datetime import date, datetime
from decimal import Decimal

import numpy as np
import pandas as pd

from tools.strict_oracle_check import canon


def test_integral_float_collapses_to_int():
    # k_count / t_hybrid_rrf were driver-GREEN with DuckDB's NULL-coerced
    # float64 column against Spark's longs
    assert canon(65662.0) == canon(65662)
    assert canon(np.float64(5.0)) == canon(5)
    assert canon(-0.0) == canon(0)


def test_non_integral_float_stays_float():
    assert canon(1.5) != canon(1)
    assert canon(1.5).startswith("f:")


def test_decimal_never_matches_numerics():
    # k_tower went driver-RED in r6: Spark decimal.Decimal vs DuckDB
    # pandas float64 — Decimal must hash distinctly from BOTH
    assert canon(Decimal("65662")) != canon(65662)
    assert canon(Decimal("65662")) != canon(65662.0)


def test_nan_and_nat_are_null():
    # q18 / q24 / q35 were driver-GREEN with pandas NaN/NaT for SQL NULL
    assert canon(float("nan")) == canon(None)
    assert canon(pd.NaT) == canon(None)


def test_numpy_scalars_and_arrays_normalize():
    assert canon(np.int64(7)) == canon(7)
    assert canon(np.bool_(True)) == canon(True)
    assert canon(np.array([1, 2])) == canon([1, 2])


def test_timestamps_and_dates():
    assert canon(pd.Timestamp("2024-01-02 03:04:05")) == canon(
        datetime(2024, 1, 2, 3, 4, 5)
    )
    assert canon(date(2024, 1, 2)).startswith("t:")


def test_big_floats_do_not_collapse():
    # beyond 2^53 a float cannot faithfully represent the int — no collapse
    v = float(2**60)
    assert canon(v).startswith("f:")
