"""Generated-vs-DATA quality of the bench flagship (one-off probe).

The headline bench certifies cached-vs-uncached fidelity (SW within the
independent-run noise floor) but never measured how close the flagship's
generated distribution is to the TRAINING DATA distribution.  The round-5
full-protocol Table-2 run on synthetic (docs/benchmarks/
table2_synthetic_full.json) exposed that frequency-domain models at small
step budgets produce variance-inflated samples (reverse chain rms grows
monotonically when the score is underfit), so this probe measures, for the
exact bench flagship (25 epochs, synthetic-freq ml=187, seed 42):

  - SW(generated, data) and the data split-half floor SW(data1, data2)
  - rms of generated vs data samples (time domain, de-standardized)

Writes docs/benchmarks/data_quality.json.  Uses FDTPU_WEIGHTS_CACHE to
reuse the trained flagship (bench.build_model key ml187_e25_s42).

Reference context: the paper's Table 2 (p.8) reports generated-vs-data SW
for real datasets; the reference never reports it for synthetic, and its
sampler (src/fdiff/sampling/sampler.py:105-215) has bit-matching chain
semantics to ours (docs/benchmarks/quality_parity.md), so any distribution
mismatch measured here is a property of the training protocol, not of the
TPU rebuild.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main() -> None:
    import bench
    from fdtpu.data import SyntheticDatamodule
    from fdtpu.ops import idft
    from fdtpu.sampling import DiffusionSampler

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    model = bench.build_model(max_len=187, trained=True, epochs=25)

    # Same DGP/standardization as bench.build_model's training datamodule.
    import tempfile

    dm = SyntheticDatamodule(
        data_dir=tempfile.mkdtemp(), max_len=187, num_samples=2000,
        batch_size=64, fourier_transform=True, standardize=True,
    )
    dm.prepare_data()
    dm.setup()

    sampler = DiffusionSampler(model, sample_batch_size=128, batches_per_call=4)
    s = np.asarray(sampler.sample(n, 1000, key=jax.random.PRNGKey(1)))

    mu, sd = dm.feature_mean_and_std
    gen_time = np.asarray(idft(jnp.asarray(s * sd + mu)))
    data_freq = np.asarray(dm.X_train)  # standardized frequency domain
    data_time = np.asarray(idft(jnp.asarray(data_freq * sd + mu)))

    rng = np.random.default_rng(0)
    idx = rng.permutation(len(data_time))
    half = len(idx) // 2
    d1, d2 = data_time[idx[:half]], data_time[idx[half:2 * half]]

    dirs = rng.normal(size=(200, int(np.prod(data_time.shape[1:]))))
    dirs = (dirs / np.linalg.norm(dirs, axis=1, keepdims=True)).T

    def sw(a, b):
        m = min(len(a), len(b))
        return bench.sliced_w2(a[:m], b[:m], dirs)

    out = {
        "n_generated": n,
        "sw_generated_vs_data": round(sw(gen_time, data_time), 4),
        "sw_data_splithalf_floor": round(sw(d1, d2), 4),
        "rms_generated_time": round(float(np.sqrt((gen_time ** 2).mean())), 4),
        "rms_data_time": round(float(np.sqrt((data_time ** 2).mean())), 4),
        "rms_generated_std_space": round(float(np.sqrt((s ** 2).mean())), 4),
        "abs_max_generated_time": round(float(np.abs(gen_time).max()), 2),
        "protocol": "bench flagship ml187 e25 s42, T=1000 uncached, n-sample SW "
                    "over 200 shared random directions (equal-size subsets)",
    }
    path = REPO / "docs" / "benchmarks" / "data_quality.json"
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
