"""Static hygiene enforced in-suite (reference wires pytest-flakes into every
pytest run, reference pyproject.toml:81-87; CI runs black+mypy,
.github/workflows/python-app.yml:16-39 — the GitHub workflow here runs the
full toolchain, this test is the locally-runnable subset)."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_lint_clean():
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts/lint.py")],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, f"lint problems:\n{proc.stdout}"


def test_tests_compile():
    """Every test module parses (lint.py covers the source tree)."""
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts/lint.py"), "tests"],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, f"lint problems:\n{proc.stdout}"
