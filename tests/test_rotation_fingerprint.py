"""The r9 fingerprint blind spot is closed: editing a shared Python
helper must change the fingerprint of EVERY registered query whose
plan function reaches it — directly, via a nested lambda or
comprehension, through an `import module; module.helper(...)`
attribute call, or through a helper-of-helper chain — so
tools/rotation_check.py promotes the callers into the driver window
mechanically. Pure Python, no Spark session."""

from __future__ import annotations

import importlib.util
import sys
import textwrap

import pytest

import tools.rotation_check as rc

_HELPERS_V1 = """
def util(x):
    return x + 1

def deep(x):
    return x * 2

def mid(x):
    return deep(x) + 1
"""

_CALLERS = """
import fp_test_helpers as H
from fp_test_helpers import util, mid

def caller_direct(spark, sf):
    return util(2)

def caller_nested(spark, sf):
    return [util(i) for i in range(3)]

def caller_attr(spark, sf):
    return H.util(4)

def caller_chain(spark, sf):
    return mid(5)

def caller_unrelated(spark, sf):
    return 42
"""


def _load(tmp_path, name, src):
    p = tmp_path / f"{name}.py"
    p.write_text(textwrap.dedent(src))
    spec = importlib.util.spec_from_file_location(name, p)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def fp_modules(tmp_path, monkeypatch):
    # treat the temp modules as repo-defined for helper traversal
    monkeypatch.setattr(
        rc,
        "_PKG_PREFIXES",
        rc._PKG_PREFIXES + ("fp_test_helpers", "fp_test_callers"),
    )
    helpers = _load(tmp_path, "fp_test_helpers", _HELPERS_V1)
    callers = _load(tmp_path, "fp_test_callers", _CALLERS)
    yield tmp_path, helpers, callers
    sys.modules.pop("fp_test_helpers", None)
    sys.modules.pop("fp_test_callers", None)


def _fps(callers):
    return {
        n: rc.spec_fingerprint("SELECT 1 AS one", getattr(callers, n))
        for n in (
            "caller_direct",
            "caller_nested",
            "caller_attr",
            "caller_chain",
            "caller_unrelated",
        )
    }


def test_helper_edit_changes_every_caller_fingerprint(fp_modules):
    tmp_path, helpers, callers = fp_modules
    before = _fps(callers)

    # edit ONLY the leaf helpers; no caller source changes
    edited = _HELPERS_V1.replace("x + 1", "x + 100").replace(
        "x * 2", "x * 200"
    )
    helpers2 = _load(tmp_path, "fp_test_helpers", edited)
    callers2 = _load(tmp_path, "fp_test_callers", _CALLERS)
    after = _fps(callers2)

    for n in ("caller_direct", "caller_nested", "caller_attr"):
        assert before[n] != after[n], (
            f"{n} must re-fingerprint when util() changes"
        )
    # helper-of-helper: mid() is unchanged but deep() changed
    assert before["caller_chain"] != after["caller_chain"], (
        "a transitive helper edit must reach the caller"
    )
    assert before["caller_unrelated"] == after["caller_unrelated"], (
        "fingerprints must stay stable for functions that do not "
        "reach the edited helper"
    )


def test_fingerprint_is_deterministic(fp_modules):
    _, _, callers = fp_modules
    assert _fps(callers) == _fps(callers)


def test_real_registry_helpers_are_reachable():
    """Spot-check against the real registry: a known shared helper
    (plans/registry.dsum, used by revenue queries) appears in the
    helper closure of a query that calls it, so an edit there would
    re-fingerprint the caller."""
    import __spark_entry__ as e

    spec = e._registry()["pricing_summary"]
    names = {
        s.split("\x01")[0] for s in rc._helper_sources(spec.fn)
    }
    assert any("registry" in n and ".dsum" in n for n in names) or any(
        "dsum" in n for n in names
    ), f"dsum not reachable from pricing_summary helpers: {sorted(names)[:10]}"
