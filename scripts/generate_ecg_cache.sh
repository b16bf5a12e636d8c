#!/usr/bin/env bash
# Train a frequency-domain ECG model and sample with E²-CRF caching
# (reference generate_ecg_cache.sh).
set -euo pipefail
cd "$(dirname "$0")/.."

python cli/train.py datamodule=ecg fourier_transform=true standardize=true \
    trainer.max_epochs="${MAX_EPOCHS:-10}" "$@"

python cli/sample.py model_id=latest use_cache=true \
    +cache_kwargs.level=score +cache_kwargs.R=10 +cache_kwargs.tau_0=0.05 \
    num_samples="${NUM_SAMPLES:-1000}" num_diffusion_steps="${NUM_STEPS:-1000}"
