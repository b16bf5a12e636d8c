#!/usr/bin/env bash
# Cached sampling for a list of trained model IDs
# (reference generate_cache_samples.sh).
set -euo pipefail
cd "$(dirname "$0")/.."

MODEL_IDS=("$@")
if [ ${#MODEL_IDS[@]} -eq 0 ]; then
    echo "usage: $0 <model_id> [<model_id> ...]" >&2
    exit 1
fi

for model_id in "${MODEL_IDS[@]}"; do
    echo "=== cached sampling for ${model_id} ==="
    python cli/sample.py model_id="${model_id}" use_cache=true \
        +cache_kwargs.level=score +cache_kwargs.R=10 +cache_kwargs.tau_0=0.05 \
        num_samples="${NUM_SAMPLES:-1000}" num_diffusion_steps="${NUM_STEPS:-1000}"
done
