#!/usr/bin/env python
"""Rotation report — makes the DRIVER_WINDOW evidence debt MECHANICAL
(VERDICT r8 #1): the external driver records correctness rows only for
the FIRST 50 registered queries (the window), so queries outside it
accumulate zero driver-side parity evidence.  This tool scans every
committed CORRECTNESS_r*.json and prints, per registered query, whether
the driver has EVER witnessed it — the never-seen set is next round's
rotation shortlist.

Usage: python tools/rotation_report.py
Exit status is always 0; the output is the artifact.
"""

from __future__ import annotations

import glob
import json
import os
import sys


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    root = _repo_root()
    sys.path.insert(0, root)

    from mini_hadoop_spark.registry import ALL_ORACLES, ALL_QUERIES, DRIVER_WINDOW

    seen: dict[str, list[str]] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = os.path.basename(path)[len("CORRECTNESS_") : -len(".json")]
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, json.JSONDecodeError) as exc:
            print(f"warn: skipping {path}: {exc}", file=sys.stderr)
            continue
        for name in rows:
            seen.setdefault(name, []).append(rnd)

    # rows-only policy (VERDICT r14 what's-wrong #2): window slots are
    # the scarce ORACLED-evidence resource — a query without a DuckDB
    # oracle buys only a rows-only ledger row, so once its one protocol
    # row exists it must not take a slot (its hash evidence channel is
    # the oracled md5 twin + pytest gates; see COVERAGE.md).
    rows_only_in_window = sorted(
        n for n in DRIVER_WINDOW if n not in ALL_ORACLES and n in seen
    )

    never = [n for n in ALL_QUERIES if n not in seen]
    stale = sorted(
        (n, seen[n][-1]) for n in ALL_QUERIES if n in seen and n not in DRIVER_WINDOW
    )
    window_first_ever = [n for n in DRIVER_WINDOW if n not in seen]

    print(f"registered queries : {len(ALL_QUERIES)}")
    print(f"driver-seen ever   : {len(ALL_QUERIES) - len(never)}")
    print(f"never driver-seen  : {len(never)}")
    print(f"window size        : {len(DRIVER_WINDOW)}")
    print(f"window first-evers : {len(window_first_ever)} (rows the NEXT artifact will witness)")
    print()
    if rows_only_in_window:
        print("## POLICY VIOLATION: rows-only queries holding window slots")
        for n in rows_only_in_window:
            print(f"  {n:42s} no oracle + protocol row exists -> rotate out")
        print()
    if never:
        print("## Never driver-seen (rotation shortlist)")
        for n in never:
            mark = "IN WINDOW -> next artifact" if n in DRIVER_WINDOW else ""
            print(f"  {n:42s} {mark}")
        print()
    if stale:
        print("## Out of window (evidence frozen at last-seen round)")
        for n, last in stale:
            print(f"  {n:42s} last seen {last}")
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:  # `| head` closing early is not an error
        sys.exit(0)
