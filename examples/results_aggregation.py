#!/usr/bin/env python
"""Results aggregation example — the script equivalent of the reference's
``notebooks/results.ipynb`` (and ``results_lstm.ipynb``, which is the same
driver pointed at LSTM-backbone runs).

Aggregates ``results.yaml`` files across run directories into tidy
per-distance DataFrames, renders quality box plots against the self/dummy
baselines, emits mean ± 2·sem summary tables (CSV + LaTeX), and plots
per-run spectral Wasserstein profiles.

    python examples/results_aggregation.py <runs_dir> [run_id ...]
    python examples/results_aggregation.py <runs_dir>          # all runs

Outputs land in ``outputs/results_aggregation/``.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

if os.environ.get("FDTPU_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["FDTPU_PLATFORM"])

from fdtpu.viz import results_main


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        raise SystemExit(1)
    runs_dir = Path(sys.argv[1])
    run_ids = sys.argv[2:] or [
        p.name for p in sorted(runs_dir.iterdir()) if (p / "results.yaml").exists()
    ]
    if not run_ids:
        raise SystemExit(f"no runs with results.yaml under {runs_dir}")
    out = Path("outputs/results_aggregation")
    df, df_baselines = results_main(run_ids, runs_dir, out)
    print(f"aggregated {df['Dataset'].nunique()} dataset(s), "
          f"{len(run_ids)} run(s) -> {out}")
    print(df.groupby(["Dataset", "Metric", "Diffusion Domain"])["Value"].mean())


if __name__ == "__main__":
    main()
