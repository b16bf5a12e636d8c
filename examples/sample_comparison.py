#!/usr/bin/env python
"""Multi-domain sample-comparison grids — the script equivalent of the
reference's ``visualization/visualize.py`` ``__main__`` flow
(visualize.py:316-356): given one run trained in the frequency domain and
one in the time domain, plot generated samples side-by-side with the
training data, as line grids and heatmap grids.

    python examples/sample_comparison.py <runs_dir> <freq_run_id> [time_run_id]
    python examples/sample_comparison.py --demo   # self-contained tiny demo

Outputs land in ``outputs/sample_comparison/figures/``.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

if os.environ.get("FDTPU_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["FDTPU_PLATFORM"])


def demo(out: Path) -> list[Path]:
    """Train nothing: fabricate two tiny 'runs' from the synthetic DGP and
    render the grids — shows the API end-to-end without a GPU/TPU."""
    import tempfile

    import numpy as np
    import yaml

    from fdtpu.viz import visualize_model_comparison

    runs = Path(tempfile.mkdtemp()) / "runs"
    rng = np.random.default_rng(0)
    t = np.linspace(0, 6.28, 100, dtype=np.float32)
    for run_id in ("demo_freq", "demo_time"):
        run = runs / run_id
        run.mkdir(parents=True)
        freqs = rng.beta(2, 2, size=(16, 1, 1)).astype(np.float32) * 4
        phase = rng.normal(size=(16, 1, 1)).astype(np.float32)
        np.save(run / "samples.npy", np.sin(t[None, :, None] * freqs + phase))
        with open(run / "train_config.yaml", "w") as f:
            yaml.safe_dump(
                {
                    "datamodule": {
                        "name": "synthetic",
                        "data_dir": tempfile.mkdtemp(),
                        "max_len": 100,
                        "num_samples": 32,
                        "batch_size": 8,
                        "fourier_transform": False,
                        "standardize": False,
                    }
                },
                f,
            )
    return visualize_model_comparison(
        {"freq": "demo_freq", "time": "demo_time"}, runs, out,
        dataset_name="demo", n_samples=3,
    )


def main() -> None:
    out = Path("outputs/sample_comparison")
    if "--demo" in sys.argv:
        paths = demo(out)
    elif len(sys.argv) >= 3:
        from fdtpu.viz import visualize_model_comparison

        runs_dir = Path(sys.argv[1])
        model_ids = {"freq": sys.argv[2]}
        if len(sys.argv) > 3:
            model_ids["time"] = sys.argv[3]
        paths = visualize_model_comparison(model_ids, runs_dir, out)
    else:
        print(__doc__)
        raise SystemExit(1)
    for p in paths:
        print(f"wrote {p}")


if __name__ == "__main__":
    main()
