#!/usr/bin/env python
"""Round-close gate — the end-of-round checklist as ONE command
(the process that kept rounds 7-9 fully green, mechanized):

  1. preflight          (entry imports, registry invariants, collection)
  2. full pytest        (tests/ -q)
  3. bench.py           (rc=0 + the one-line JSON at $SPARK_GRAFT_SF_DIR)
  4. driver sim         (the 50 DRIVER_WINDOW slots on a vanilla session
                         at sf0.01 — the external driver's comparison)
  5. rotation report    (informational: the never-driver-seen debt)

Usage: python tools/round_close.py [--quick]
--quick skips the full pytest (for mid-round spot checks; the real
close must run everything).  Exit 1 on the first failing gate.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(label: str, cmd: list[str], check_json: bool = False) -> None:
    print(f"== {label}: {' '.join(cmd)}", flush=True)
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    dt = time.time() - t0
    tail = "\n".join((proc.stdout or "").strip().splitlines()[-3:])
    print(tail)
    if proc.returncode != 0:
        print("\n".join((proc.stderr or "").strip().splitlines()[-5:]))
        print(f"== {label} FAILED (rc={proc.returncode}, {dt:.0f}s)")
        sys.exit(1)
    if check_json:
        import json

        last = (proc.stdout or "").strip().splitlines()[-1]
        d = json.loads(last)  # raises -> the round-1 `parsed: null` mode
        assert d.get("metric") and "queries" in d, "bench JSON malformed"
        assert not d.get("failures"), f"bench failures: {d['failures']}"
    print(f"== {label} OK ({dt:.0f}s)\n", flush=True)


def main() -> int:
    quick = "--quick" in sys.argv
    py = sys.executable
    _run("preflight", [py, os.path.join(REPO, "tools", "preflight.py")])
    if not quick:
        _run("pytest", [py, "-m", "pytest", "tests/", "-q"])
    _run("bench", [py, os.path.join(REPO, "bench.py")], check_json=True)
    _run("driver-sim(window)", [py, os.path.join(REPO, "tools", "driver_sim.py"), "--window"])
    _run("rotation-report", [py, os.path.join(REPO, "tools", "rotation_report.py")])
    print("ROUND CLOSE: all gates green")
    return 0


if __name__ == "__main__":
    sys.exit(main())
