#!/usr/bin/env python
"""Sequence-axis (frequency-token) sharding experiment (SURVEY §2.3/§5.7
stretch goal; VERDICT round-2 ask #8).

Shards the flagship forward's TOKEN axis over the mesh's ``model`` axis and
compares against batch-axis dp, on the virtual 8-device CPU mesh:

* wall-clock per jitted forward (medians of repeats);
* the collectives GSPMD inserts (counted in the compiled HLO);
* an analytic ICI estimate for real v5e hardware.

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      FDTPU_PLATFORM=cpu python scripts/seq_sharding_experiment.py

Writes docs/benchmarks/seq_sharding.json; the conclusion lives in
PARITY.md §2.3.
"""

from __future__ import annotations

import json
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import os

import jax

if os.environ.get("FDTPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["FDTPU_PLATFORM"])

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fdtpu.models import ScoreModelConfig, init_score_model, score_apply


def count_collectives(lowered_text: str) -> dict[str, int]:
    counts: dict[str, int] = {}
    for op in ("all-gather", "all-reduce", "reduce-scatter",
               "collective-permute", "all-to-all"):
        counts[op] = len(re.findall(rf"\b{op}(?:-start)?\(", lowered_text))
    return {k: v for k, v in counts.items() if v}


def timed(fn, *args, repeats=7):
    out = jax.block_until_ready(fn(*args))  # compile
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    assert np.isfinite(np.asarray(out)).all()
    return float(np.median(times))


def main() -> None:
    n_dev = len(jax.devices())
    assert n_dev >= 8, f"need 8 devices (got {n_dev}); set XLA_FLAGS"
    # First finding: the flagship's 187 tokens (= 11 x 17) are indivisible
    # by any mesh size — token sharding would force padded sequences.  The
    # experiment uses T=192 so every arm runs unpadded.
    batch, seq = 64, 192
    cfg = ScoreModelConfig(n_channels=1, max_len=seq)
    variables = init_score_model(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, seq, 1))
    t = jnp.full((batch,), 0.5)

    def fwd(v, x, t):
        return score_apply(v, cfg, x, t)

    results = {
        "batch": batch, "seq": seq, "devices": n_dev,
        "note": "flagship T=187 = 11x17 is indivisible by any mesh size; "
                "T=192 used so the token axis shards unpadded",
        "modes": {},
    }

    for mode, mesh_shape, x_spec in (
        ("replicated_1dev", None, None),
        ("dp_batch_8", (8, 1), P("data", None, None)),
        # Token axis over 8 devices: 187 tokens pad to ceil(187/8) shards.
        ("sp_tokens_8", (1, 8), P(None, "model", None)),
        # Hybrid dp×sp.
        ("dp4_sp2", (4, 2), P("data", "model", None)),
    ):
        if mesh_shape is None:
            f = jax.jit(fwd)
            lowered = f.lower(variables, x, t)
            results["modes"][mode] = {
                "wall_s": timed(f, variables, x, t),
                "collectives": count_collectives(
                    lowered.compile().as_text()
                ),
            }
            continue
        devs = np.asarray(jax.devices()[:8]).reshape(mesh_shape)
        mesh = Mesh(devs, axis_names=("data", "model"))
        xs = jax.device_put(x, NamedSharding(mesh, x_spec))
        vs = jax.tree.map(
            lambda a: jax.device_put(a, NamedSharding(mesh, P())), variables
        )
        f = jax.jit(fwd)
        lowered = f.lower(vs, xs, t)
        results["modes"][mode] = {
            "wall_s": timed(f, vs, xs, t),
            "collectives": count_collectives(lowered.compile().as_text()),
        }
        print(mode, results["modes"][mode], file=sys.stderr)

    # Analytic ICI estimate for real v5e: token sharding makes attention
    # need the full K/V per layer → one all-gather of (B/dp, T, D) per
    # layer per direction.  At seq=187/d72/fp32 that is ~54 KB/layer/elem;
    # the per-forward FLOP share of one chip at batch 64 is already
    # latency-bound (throughput.json: d72 forward ~8% MFU), so adding
    # 2·L=20 sub-100µs collectives per forward cannot pay for splitting
    # ≤512 tokens 8 ways.
    kv_bytes = batch * seq * cfg.d_model * 4
    results["ici_estimate"] = {
        "allgather_bytes_per_layer": kv_bytes,
        "collectives_per_forward": 2 * cfg.num_layers,
        "note": (
            "v5e ICI ~1e-6 s latency + ~45 GB/s per link: "
            f"{2 * cfg.num_layers} collectives x "
            f"{kv_bytes / 1e6:.2f} MB ≈ "
            f"{2 * cfg.num_layers * (1e-6 + kv_bytes / 45e9) * 1e3:.2f} ms "
            "per forward of pure overhead vs a ~2 ms latency-bound forward"
        ),
    }

    out = REPO / "docs" / "benchmarks" / "seq_sharding.json"
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results["modes"]))


if __name__ == "__main__":
    main()
