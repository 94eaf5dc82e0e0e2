"""Self-tests for the local verify tooling's value canonicalization.

The driver hashes value REPRESENTATIONS, so the local compare must be
at least as strict: two blind spots have slipped past it (r5: DuckDB
HUGEINT widening, caught only by the driver's schema hash; r6: IEEE
signed zero, -0.0 == 0.0 in Python but different bytes). These tests
pin the bit-exact behavior so the class cannot regress.
"""

from __future__ import annotations

import math


def test_sim_canon_flags_planted_negative_zero():
    from tools.driver_sim import canon

    neg = canon(["x"], [(-0.0,)])
    pos = canon(["x"], [(0.0,)])
    assert neg != pos, "sim canon must distinguish -0.0 from +0.0 bits"


def test_sim_canon_nan_is_stable_and_equal_across_payloads():
    from tools.driver_sim import canon

    a = canon(["x"], [(float("nan"),)])
    b = canon(["x"], [(math.nan,)])
    assert a == b


def test_sim_canon_ordinary_floats_bit_equal():
    from tools.driver_sim import canon

    assert canon(["x"], [(1.5,)]) == canon(["x"], [(1.5,)])
    assert canon(["x"], [(1.5,)]) != canon(["x"], [(1.5000001,)])


def test_pytest_canon_flags_planted_negative_zero():
    from tests.test_correctness import _canon_cell

    assert _canon_cell(-0.0) != _canon_cell(0.0)
    assert _canon_cell(float("nan")) == _canon_cell(math.nan)
    assert _canon_cell(None) is None
    assert _canon_cell("s") == "s"
