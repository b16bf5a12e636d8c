"""Example scripts (the reference-notebook analogs) run end-to-end.

quickstart.py mirrors notebooks/ablation_cache_test.ipynb;
spectral_interpretation.py mirrors notebooks/spectral_interpretation.ipynb.
results_aggregation.py is exercised against a run dir by the viz pipeline
tests; here it only needs to print usage cleanly with no args.
"""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def run_example(script: str, *args: str, timeout: int = 600):
    env = dict(os.environ)
    env.update({"FDTPU_PLATFORM": "cpu", "PYTHONPATH": str(REPO)})
    result = subprocess.run(
        [sys.executable, str(REPO / "examples" / script), *args],
        capture_output=True, text=True, timeout=timeout, env=env,
    )
    return result


def test_quickstart_example():
    result = run_example("quickstart.py")
    assert result.returncode == 0, result.stderr[-3000:]
    out = result.stdout + result.stderr
    assert "e2crf" in out and "skipped=" in out and "baselines:" in out


def test_spectral_interpretation_example(tmp_path):
    result = run_example("spectral_interpretation.py", "--synthetic")
    assert result.returncode == 0, result.stderr[-3000:]


def test_results_aggregation_usage():
    """With no args the script must print its usage docstring and exit 1
    (not crash some other way)."""
    result = run_example("results_aggregation.py")
    out = result.stdout + result.stderr
    assert result.returncode == 1, out[-2000:]
    assert "results_aggregation.py <runs_dir>" in out, out[-2000:]


def test_roofline_script():
    """scripts/roofline.py post-processes throughput.json into a roofline
    artifact + markdown table; pure CPU, no device."""
    import json

    env = dict(os.environ)
    env.update({"FDTPU_PLATFORM": "cpu", "PYTHONPATH": str(REPO)})
    result = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "roofline.py")],
        capture_output=True, text=True, timeout=120, env=env,
    )
    assert result.returncode == 0, result.stderr[-3000:]
    assert "| arm | bound |" in result.stdout
    art = json.loads((REPO / "docs/benchmarks/roofline.json").read_text())
    arms = art["arms"]
    assert "blockdiag_bf16" in arms and "einsum_fp32" in arms
    for a in arms.values():
        assert a["bound"] in ("memory", "compute")
        assert a["t_roofline_ms"] == max(a["t_compute_ms"], a["t_memory_ms"])
        assert a["roofline_fraction"] > 0
    # The headline qualitative claims the docs make:
    assert arms["einsum_fp32"]["bound"] == "memory"
    assert arms["einsum_fp32"]["roofline_fraction"] > 0.8  # HBM-saturated
    assert arms["blockdiag_bf16"]["roofline_fraction"] < 0.5  # latency-bound
