#!/usr/bin/env python
"""Dataset spectral-interpretation example — the script equivalent of the
reference's ``notebooks/spectral_interpretation.ipynb``.

For every dataset whose raw files are present under <data_dir> (missing
ones are skipped with a warning — most need manual Kaggle downloads, see
fdtpu.data.Datamodule._kaggle_download), computes the normalized spectral
density, temporal energy distribution, and the time/frequency
delocalization metrics, then renders the four paper figures: per-dataset
spectral density, temporal energy, delocalization bars, and the joint
log-log delocalization scatter.

    python examples/spectral_interpretation.py <data_dir>
    python examples/spectral_interpretation.py --synthetic    # no downloads

Outputs land in ``outputs/spectral_interpretation/``.
"""

import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

if os.environ.get("FDTPU_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["FDTPU_PLATFORM"])

from fdtpu.viz import spectral_interpretation_main


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        raise SystemExit(1)
    out = Path("outputs/spectral_interpretation")
    if sys.argv[1] == "--synthetic":
        from fdtpu.data import SyntheticDatamodule

        registry = {
            "Synthetic-100": SyntheticDatamodule(
                data_dir=tempfile.mkdtemp(), max_len=100, num_samples=500
            ),
            "Synthetic-64": SyntheticDatamodule(
                data_dir=tempfile.mkdtemp(), max_len=64, num_samples=500
            ),
        }
        spectral_interpretation_main(".", out, registry=registry)
    else:
        spectral_interpretation_main(Path(sys.argv[1]), out)
    print(f"wrote figures + CSVs to {out}")


if __name__ == "__main__":
    main()
