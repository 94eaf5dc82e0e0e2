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


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
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
