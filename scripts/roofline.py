#!/usr/bin/env python
"""Roofline analysis of the uncached score-network forward.

Answers WHY the measured MFU numbers in ``throughput.json`` are what they
are: for every measured sampling arm it computes the analytic dense-matmul
FLOPs and an analytic HBM-traffic model of one forward, derives the
compute-bound and bandwidth-bound time limits (the roofline), and compares
them with the measured per-forward wall-clock.  Pure post-processing — no
device needed; reads docs/benchmarks/throughput.json, writes
docs/benchmarks/roofline.json and prints a markdown table.

Traffic model (stated assumptions, per encoder layer):

* Every matmul reads its inputs from and writes its output to HBM once
  (XLA fuses elementwise producers/consumers, so bias/relu/residual adds
  ride along with the matmuls they touch).
* ``einsum`` attention materializes the (B, H, T, T) score tensor in HBM:
  write scores, softmax read+write, read again for the A·V contraction
  (4× score-tensor traffic).  The fused ``blockdiag`` Pallas kernel keeps
  scores in VMEM — zero HBM score traffic (its per-head packing fits VMEM
  for the shapes measured here; the kernel asserts this).
* LayerNorms + residuals: two fused read-modify-write passes over the
  (B, T, D) activation per layer (4 activation-sized transfers).
* Parameters are re-read from HBM every forward (no weight residency
  assumption — at batch 128 they are <2% of traffic anyway).

Chip model: TPU v5e — 197 TFLOP/s dense bf16 MXU peak (fp32 matmuls also
execute on the MXU via multi-pass; MFU convention follows throughput.json
and reports both dtypes against the bf16 peak) and 819 GB/s HBM bandwidth.

Reference context: the reference framework (NoakLiu/FastFourierDiffusion)
has no performance model at all; this artifact is the evidence behind the
repo's "d72 is latency-bound, not FLOP-bound" claims
(docs/benchmarks/README.md, lane-padding and model-scaling sections).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

V5E_PEAK_FLOPS = 197e12  # bf16 MXU peak (convention: both dtypes vs this)
V5E_HBM_BYTES_PER_S = 819e9

ROOT = Path(__file__).resolve().parent.parent
THROUGHPUT = ROOT / "docs/benchmarks/throughput.json"
OUT = ROOT / "docs/benchmarks/roofline.json"


def forward_flops(d, h, layers, f, t, c) -> float:
    """Dense-matmul FLOPs of one single-sample forward (matches
    scripts/bench_throughput.py::forward_flops)."""
    per_layer = 8 * t * d * d + 4 * t * t * d + 4 * t * d * f
    return float(layers * per_layer + 4 * t * c * d)


def forward_hbm_bytes(b, t, d, h, f, c, layers, dtype_bytes, attention) -> float:
    """Analytic HBM traffic of one batch-``b`` forward (bytes), per the
    module-docstring model."""
    s = dtype_bytes
    act = b * t * d * s          # one (B, T, D) activation
    ffn_act = b * t * f * s      # one (B, T, F) activation
    w_proj = d * d * s           # one projection weight matrix
    w_ffn = d * f * s            # one FFN weight matrix

    per_layer = 0.0
    per_layer += 3 * (act + w_proj + act)        # Q/K/V projections
    if attention == "einsum":
        scores = b * h * t * t * s
        per_layer += 3 * act + 4 * scores + act  # read qkv, score traffic, write
    else:  # blockdiag: scores stay in VMEM
        per_layer += 3 * act + act
    per_layer += act + w_proj + act              # output projection
    per_layer += act + w_ffn + ffn_act           # FFN matmul 1 (+fused relu)
    per_layer += ffn_act + w_ffn + act           # FFN matmul 2
    per_layer += 4 * act                         # 2 LayerNorms + residuals

    embed = 2 * (b * t * c * s + act)            # embed + unembed passes
    return float(layers * per_layer + embed)


def analyze(name: str, *, sps: float, steps: int, b: int, t: int, d: int,
            h: int, f: int, c: int, layers: int, dtype: str,
            attention: str) -> dict:
    dtype_bytes = 2 if dtype == "bf16" else 4
    flops = forward_flops(d, h, layers, f, t, c) * b
    hbm = forward_hbm_bytes(b, t, d, h, f, c, layers, dtype_bytes, attention)
    t_compute = flops / V5E_PEAK_FLOPS
    t_memory = hbm / V5E_HBM_BYTES_PER_S
    t_roof = max(t_compute, t_memory)
    t_measured = b / (sps * steps)  # sps covers `steps` sequential forwards
    return {
        "samples_per_s_chip": sps,
        "batch": b,
        "flops_per_batch_forward": flops,
        "hbm_bytes_per_batch_forward": hbm,
        "t_compute_ms": round(1e3 * t_compute, 3),
        "t_memory_ms": round(1e3 * t_memory, 3),
        "t_roofline_ms": round(1e3 * t_roof, 3),
        "t_measured_ms": round(1e3 * t_measured, 3),
        "roofline_fraction": round(t_roof / t_measured, 3),
        "bound": "memory" if t_memory > t_compute else "compute",
        "achieved_hbm_gb_s": round(hbm / t_measured / 1e9, 1),
        "achieved_tflop_s": round(flops / t_measured / 1e12, 1),
    }


def main() -> None:
    payload = json.loads(THROUGHPUT.read_text())
    results = payload.get("results", {})
    out: dict = {
        "chip_model": {
            "peak_bf16_flops": V5E_PEAK_FLOPS,
            "hbm_bytes_per_s": V5E_HBM_BYTES_PER_S,
        },
        "notes": (
            "roofline_fraction > 1 on the einsum-fp32 arms means the "
            "measured forward beats the modeled memory bound: XLA's "
            "softmax fusion pays less than the modeled 4x score-tensor "
            "traffic. The qualitative split is robust to any score-traffic "
            "factor in 2-4x: einsum-fp32 saturates HBM (789-942 GB/s "
            "achieved vs 819 peak) while every blockdiag arm sits at "
            "26-29% of its roofline at a flat ~210-240 GB/s — "
            "latency/occupancy-bound, not bandwidth-bound."
        ),
        "arms": {},
    }

    cfg = payload.get("config", {})
    b = cfg.get("batch", 128)
    steps = cfg.get("steps", 500)
    flagship = dict(t=187, d=72, h=12, f=2048, c=1, layers=10)
    variants = {
        "einsum_fp32": ("fp32", "einsum", flagship),
        "einsum_bf16": ("bf16", "einsum", flagship),
        "blockdiag_fp32": ("fp32", "blockdiag", flagship),
        "blockdiag_bf16": ("bf16", "blockdiag", flagship),
        "d128_fp32": ("fp32", "einsum", dict(flagship, d=128, h=16)),
    }
    for name, (dtype, attn, shape) in variants.items():
        entry = results.get(name)
        if not entry or "samples_per_s_chip" not in entry:
            continue
        out["arms"][name] = analyze(
            name, sps=entry["samples_per_s_chip"], steps=steps, b=b,
            dtype=dtype, attention=attn, **shape,
        )

    scaling = payload.get("model_scaling", {})
    scfg = scaling.get("config", {})
    for name, entry in scaling.items():
        if name == "config" or "samples_per_s_chip" not in entry:
            continue
        # name format: d{D}H{H}_{impl}_{dtype}
        dims, impl, dtype = name.split("_")
        d, h = (int(x) for x in dims[1:].split("H"))
        out["arms"][f"scaling_{name}"] = analyze(
            name, sps=entry["samples_per_s_chip"],
            steps=scfg.get("steps", 500), b=scfg.get("batch", 128),
            t=scfg.get("max_len", 187), d=d, h=h,
            f=scfg.get("dim_feedforward", 2048), c=1,
            layers=scfg.get("num_layers", 10),
            dtype={"fp32": "fp32", "bf16": "bf16"}[dtype],
            attention=impl,
        )

    OUT.write_text(json.dumps(out, indent=2))
    hdr = ("| arm | bound | roofline ms | measured ms | % of roofline "
           "| HBM GB/s | TFLOP/s |")
    print(hdr)
    print("|---|---|---:|---:|---:|---:|---:|")
    for name, a in out["arms"].items():
        print(f"| {name} | {a['bound']} | {a['t_roofline_ms']:.2f} "
              f"| {a['t_measured_ms']:.2f} | {100 * a['roofline_fraction']:.0f}% "
              f"| {a['achieved_hbm_gb_s']:.0f} | {a['achieved_tflop_s']:.1f} |")
    print(f"\nwrote {OUT}", file=sys.stderr)


if __name__ == "__main__":
    main()
