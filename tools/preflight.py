"""One-command pre-round gate: oracle type lint -> full driver sim ->
full pytest. Mirrors exactly what the round driver checks, in the
order that fails fastest.

Usage: python tools/preflight.py [--skip-tests] [sf_dir]
Exit code is nonzero on the first failing stage.
"""

from __future__ import annotations

import subprocess
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent


def _run(label: str, cmd: list[str]) -> None:
    t0 = time.perf_counter()
    print(f"== {label}: {' '.join(cmd)}", flush=True)
    rc = subprocess.call(cmd, cwd=_REPO)
    dt = time.perf_counter() - t0
    if rc != 0:
        print(f"== {label} FAILED (rc={rc}, {dt:.0f}s)", flush=True)
        raise SystemExit(rc)
    print(f"== {label} ok ({dt:.0f}s)", flush=True)


def _bench_summary_fits() -> None:
    """bench.py's FINAL stdout line must survive the driver's ~2000
    char tail capture (r7 lost a round of per-query numbers to silent
    truncation). Exercise compact_summary against a worst-case
    registry — long names, -1 failures, large values — and fail the
    round before the bench artifact can go dark."""
    sys.path.insert(0, str(_REPO))
    from bench import compact_summary

    timings = {f"a_very_long_query_name_number_{i:03d}": 9999.999 for i in range(250)}
    for i in range(10):
        timings[f"a_very_long_failed_query_name_{i:03d}"] = -1.0
    ok = {k: v for k, v in timings.items() if v >= 0}
    out = {
        "value": 999999.999,
        "sf": 1.0,
        "n_queries": len(timings),
        "n_failed": 10,
        "warmup_sec": 99.999,
        "load_avg_1m": 32.0,
    }
    line = compact_summary(out, ok, timings)
    assert len(line) <= 1900, f"compact summary {len(line)} chars > 1900"
    import json

    parsed = json.loads(line)
    assert parsed["n_queries"] == len(timings)
    # r15 contract: the final line carries a `queries` dict (slowest
    # first, truncated to fit) and marks how many entries made it in.
    assert parsed["queries_in_line"] == len(parsed["queries"])
    print(f"== bench-summary cap ok ({len(line)} chars worst-case)")


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    _bench_summary_fits()
    _run("rotation", [sys.executable, "tools/rotation_check.py"])
    _run("lint", [sys.executable, "tools/driver_sim.py", "--lint"])
    _run("sim", [sys.executable, "tools/driver_sim.py", sf_dir])
    if "--skip-tests" not in sys.argv:
        # --pytest-runs=3 before a round closes: the r5 layout-test
        # flake only reproduced under load, so one green run is a
        # weaker signal than three consecutive ones.
        n_runs = 1
        for a in sys.argv[1:]:
            if a.startswith("--pytest-runs="):
                n_runs = int(a.split("=", 1)[1])
        for i in range(n_runs):
            _run(
                f"pytest {i + 1}/{n_runs}",
                [sys.executable, "-m", "pytest", "tests/", "-q"],
            )
    print("== preflight green", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
