"""The pre-commit preflight gate must reject an unimportable snapshot.

Round 6 shipped a module-level f-string NameError that killed every
import; round 4 shipped a data-drift break.  Both would have been caught
by ``python -c "import __spark_entry__"`` run once before commit.  These
tests pin that tools/preflight.py (wired via .githooks/pre-commit)
actually fails on that class of break — a gate that passes everything
is worse than no gate.
"""
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PREFLIGHT = REPO / "tools" / "preflight.py"


def _run(repo_dir: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, str(PREFLIGHT)],
        env={"PREFLIGHT_REPO": repo_dir, "PATH": "/usr/bin:/bin", "HOME": "/root"},
        capture_output=True,
        text=True,
        timeout=300,
    )


def test_preflight_rejects_unimportable_entry(tmp_path):
    # Reproduce the exact round-6 failure shape: f-string referencing a
    # name defined below it → NameError at import time.
    (tmp_path / "__spark_entry__.py").write_text(
        'BROKEN = f"{_DEFINED_BELOW}"\n_DEFINED_BELOW = "x"\n'
    )
    proc = _run(str(tmp_path))
    assert proc.returncode == 1
    assert "NameError" in proc.stderr


def test_preflight_rejects_missing_oracle_query_symmetry(tmp_path):
    (tmp_path / "__spark_entry__.py").write_text(
        "def queries():\n    return {'a': lambda s, d: None}\n"
        "def oracle_sql():\n    return {'a': 'SELECT 1', 'ghost': 'SELECT 2'}\n"
        "def entry(spark):\n    return None\n"
    )
    proc = _run(str(tmp_path))
    assert proc.returncode == 1
    assert "ghost" in proc.stderr


def test_hook_script_invokes_preflight():
    hook = REPO / ".githooks" / "pre-commit"
    assert hook.exists(), "committed pre-commit hook missing"
    text = hook.read_text()
    assert "tools/preflight.py" in text
    # Executable bit must survive — a non-executable hook silently no-ops.
    assert hook.stat().st_mode & 0o111, "pre-commit hook is not executable"
