"""bench.py emits ONE JSON line the driver must be able to parse back.
VERDICT r17 #2: the round-16 artifact's line never parsed and the whole
round lost its round-over-round comparison — so the emitter now
self-checks and fails loudly (rc=2) on a line that would not round-trip."""

from __future__ import annotations

import io
import json
import math
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _ok_payload():
    return {
        "metric": "total_query_wall_sec",
        "value": 1.23,
        "unit": "sec",
        "queries": {"q": 1.23},
        "sf": 0.1,
    }


def test_emit_ok_round_trips():
    buf = io.StringIO()
    assert bench.emit_result_line(_ok_payload(), stream=buf) == 0
    lines = buf.getvalue().splitlines()
    assert len(lines) == 1
    assert json.loads(lines[0])["value"] == 1.23


def test_emit_nan_fails_rc2():
    out = _ok_payload()
    out["queries"]["broken"] = math.nan  # a broken timing must not ship
    buf = io.StringIO()
    assert bench.emit_result_line(out, stream=buf) == 2
    assert buf.getvalue() == ""  # nothing printed on failure


def test_emit_infinity_fails_rc2():
    out = _ok_payload()
    out["value"] = math.inf
    buf = io.StringIO()
    assert bench.emit_result_line(out, stream=buf) == 2
    assert buf.getvalue() == ""
