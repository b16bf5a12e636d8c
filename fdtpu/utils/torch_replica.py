"""Torch replica of the reference training/sampling stack, for head-to-head
quality-parity runs against fdtpu on identical data.

This is NOT part of the TPU library — it exists so the quality gate
(BASELINE.json: "match reference sample quality within 1e-3
marginal-Wasserstein delta") can be exercised without network access to the
original repo's checkpoints: we rebuild the reference semantics from torch
primitives (reference score_models.py:54-113, losses.py:39-125,
schedulers/sde.py:168-246, sampler.py:105-228) and train/sample it on the
same arrays fdtpu trains on.

Import-guarded: torch is an environment dependency, not a package one.
"""

from __future__ import annotations

import math

import numpy as np


def _require_torch():
    import torch

    return torch


def build_torch_score_net(
    n_channels: int,
    max_len: int,
    d_model: int = 72,
    num_layers: int = 10,
    n_head: int = 12,
    dim_feedforward: int = 2048,
    seed: int = 0,
):
    """The reference ScoreModule forward pipeline from torch primitives
    (reference score_models.py:54-113): Linear embed → learnable positional
    embedding (max_norm √d) → Gaussian-Fourier time encoding (frozen W) →
    post-norm nn.TransformerEncoder → Linear unembed."""
    torch = _require_torch()

    class TorchScoreNet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.embedder = torch.nn.Linear(n_channels, d_model)
            self.pos_embedding = torch.nn.Embedding(
                max_len, d_model, max_norm=math.sqrt(d_model)
            )
            self.W = torch.nn.Parameter(
                torch.randn((d_model + 1) // 2) * 30.0, requires_grad=False
            )
            self.dense = torch.nn.Linear(d_model, d_model)
            layer = torch.nn.TransformerEncoderLayer(
                d_model=d_model,
                nhead=n_head,
                dim_feedforward=dim_feedforward,
                batch_first=True,
            )
            self.backbone = torch.nn.TransformerEncoder(layer, num_layers=num_layers)
            self.unembedder = torch.nn.Linear(d_model, n_channels)

        def forward(self, x, t):
            x = self.embedder(x)
            pos = torch.arange(x.size(1), device=x.device).unsqueeze(0)
            x = x + self.pos_embedding(pos)
            proj = t[:, None] * self.W[None, :] * 2 * math.pi
            emb = torch.cat([torch.sin(proj), torch.cos(proj)], dim=-1)[:, :d_model]
            x = x + self.dense(emb).unsqueeze(1)
            x = self.backbone(x)
            return self.unembedder(x)

    torch.manual_seed(seed)
    return TorchScoreNet()


def load_fdtpu_variables(net, variables) -> None:
    """Load trained fdtpu transformer score-model variables into the replica,
    in place — the inverse of
    ``fdtpu.utils.torch_migration.convert_torch_state_dict`` keyed to this
    replica's own module names.

    Enables same-weights head-to-head runs: the fdtpu-trained flagship and
    the torch replica then differ only in framework numerics, which is the
    comparison the BASELINE quality gate (≤1e-3 marginal-Wasserstein delta)
    is actually about.
    """
    torch = _require_torch()
    p, c = variables["params"], variables["constants"]

    def t(x):
        return torch.tensor(np.asarray(x, dtype=np.float32))

    sd = {
        "embedder.weight": t(p["embedder"]["w"]).T.contiguous(),
        "embedder.bias": t(p["embedder"]["b"]),
        "pos_embedding.weight": t(p["pos_encoder"]["embedding"]),
        "W": t(c["time_encoder"]["W"]),
        "dense.weight": t(p["time_encoder"]["dense_w"]).T.contiguous(),
        "dense.bias": t(p["time_encoder"]["dense_b"]),
        "unembedder.weight": t(p["unembedder"]["w"]).T.contiguous(),
        "unembedder.bias": t(p["unembedder"]["b"]),
    }
    bb = p["backbone"]
    num_layers = bb["attn"]["in_proj_w"].shape[0]
    for i in range(num_layers):
        pre = f"backbone.layers.{i}."
        sd[pre + "self_attn.in_proj_weight"] = t(bb["attn"]["in_proj_w"][i]).T.contiguous()
        sd[pre + "self_attn.in_proj_bias"] = t(bb["attn"]["in_proj_b"][i])
        sd[pre + "self_attn.out_proj.weight"] = t(bb["attn"]["out_w"][i]).T.contiguous()
        sd[pre + "self_attn.out_proj.bias"] = t(bb["attn"]["out_b"][i])
        sd[pre + "linear1.weight"] = t(bb["linear1"]["w"][i]).T.contiguous()
        sd[pre + "linear1.bias"] = t(bb["linear1"]["b"][i])
        sd[pre + "linear2.weight"] = t(bb["linear2"]["w"][i]).T.contiguous()
        sd[pre + "linear2.bias"] = t(bb["linear2"]["b"][i])
        sd[pre + "norm1.weight"] = t(bb["ln1"]["scale"][i])
        sd[pre + "norm1.bias"] = t(bb["ln1"]["bias"][i])
        sd[pre + "norm2.weight"] = t(bb["ln2"]["scale"][i])
        sd[pre + "norm2.bias"] = t(bb["ln2"]["bias"][i])
    net.load_state_dict(sd)


def torch_noise_scaling(max_len: int, fourier: bool):
    """Diagonal G (reference sde.py:42-58): 1/√2 everywhere except DC and
    (even length) Nyquist."""
    torch = _require_torch()
    if not fourier:
        return torch.ones(max_len)
    g = torch.full((max_len,), 1.0 / math.sqrt(2.0))
    g[0] = 1.0
    if max_len % 2 == 0:
        g[max_len // 2] = 1.0
    return g


def torch_vp_marginal_std(t, g, beta_min=0.1, beta_max=20.0):
    """VP perturbation-kernel std ``(B, T)`` (reference sde.py:187-210)."""
    torch = _require_torch()
    log_mean_coeff = -0.25 * t**2 * (beta_max - beta_min) - 0.5 * t * beta_min
    return torch.sqrt(1.0 - torch.exp(2.0 * log_mean_coeff))[:, None] * g[None, :]


def torch_vp_mean_coeff(t, beta_min=0.1, beta_max=20.0):
    torch = _require_torch()
    return torch.exp(-0.25 * t**2 * (beta_max - beta_min) - 0.5 * t * beta_min)


def torch_dsm_loss(model, x, g, eps=1e-5, beta_min=0.1, beta_max=20.0):
    """Default-weighting DSM loss (reference losses.py:39-125):
    λ(t) = 1/tr(Σ⁻¹), target score = −diag(1/std)·z."""
    torch = _require_torch()
    b = x.shape[0]
    t = torch.rand(b, device=x.device) * (1.0 - eps) + eps
    z = torch.randn_like(x)
    std = torch_vp_marginal_std(t, g, beta_min, beta_max)  # (B, T)
    mean = torch_vp_mean_coeff(t, beta_min, beta_max)[:, None, None] * x
    x_noisy = mean + std[..., None] * z
    score = model(x_noisy, t)
    weighting = 1.0 / torch.sum(1.0 / std**2, dim=1)  # (B,)
    losses = weighting[:, None, None] * (score + z / std[..., None]) ** 2
    return losses.reshape(b, -1).mean(dim=-1).mean()


def torch_train(
    model,
    x_train: np.ndarray,
    epochs: int,
    batch_size: int = 64,
    lr_max: float = 1e-3,
    fourier_scaling: bool = True,
    seed: int = 42,
    log_every: int = 0,
):
    """AdamW + diffusers-style warmup-cosine (reference score_models.py:316-324),
    shuffled epochs, grad-norm clip 1.0 (conf/trainer/default.yaml:4)."""
    torch = _require_torch()
    torch.manual_seed(seed)
    max_len = x_train.shape[1]
    g = torch_noise_scaling(max_len, fourier_scaling)

    steps_per_epoch = max(1, len(x_train) // batch_size)
    total_steps = steps_per_epoch * epochs
    warmup = max(1, total_steps // 10)

    opt = torch.optim.AdamW(model.parameters(), lr=lr_max, weight_decay=0.01)

    def lr_lambda(step):
        if step < warmup:
            return step / warmup
        progress = (step - warmup) / max(1, total_steps - warmup)
        return max(0.0, 0.5 * (1.0 + math.cos(math.pi * progress)))

    sched = torch.optim.lr_scheduler.LambdaLR(opt, lr_lambda)
    rng = np.random.default_rng(seed)

    model.train()
    losses = []
    for _ in range(epochs):
        perm = rng.permutation(len(x_train))
        for i in range(steps_per_epoch):
            xb = torch.tensor(x_train[perm[i * batch_size : (i + 1) * batch_size]])
            loss = torch_dsm_loss(model, xb, g)
            opt.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
            opt.step()
            sched.step()
            losses.append(float(loss))
    model.eval()
    return losses


def torch_sample(
    model,
    num_samples: int,
    max_len: int,
    n_channels: int,
    num_steps: int,
    batch_size: int = 128,
    fourier_scaling: bool = True,
    eps: float = 1e-5,
    beta_min: float = 0.1,
    beta_max: float = 20.0,
    seed: int = 0,
    prior_noise: np.ndarray | None = None,
    step_noise: np.ndarray | None = None,
) -> np.ndarray:
    """Eager reverse Euler–Maruyama loop (reference sampler.py:105-215,
    sde.py:215-246): x ← x − drift·Δt + √Δt·diag(√β·G)·z.

    ``prior_noise`` ``(num_samples, T, C)`` and ``step_noise``
    ``(num_steps, num_samples, T, C)`` inject externally drawn z's so a
    trajectory can be replayed noise-for-noise against the fdtpu sampler
    (same-weights parity runs).
    """
    torch = _require_torch()
    torch.manual_seed(seed)
    g = torch_noise_scaling(max_len, fourier_scaling)
    ts = torch.linspace(1.0, eps, num_steps)
    dt = float(ts[0] - ts[1])

    out = []
    with torch.no_grad():
        done = 0
        while done < num_samples:
            b = min(batch_size, num_samples - done)
            if prior_noise is not None:
                z0 = torch.tensor(prior_noise[done : done + b], dtype=torch.float32)
            else:
                z0 = torch.randn(b, max_len, n_channels)
            x = g[None, :, None] * z0
            for i, t in enumerate(ts):
                t_b = torch.full((b,), float(t))
                score = model(x, t_b)
                beta = beta_min + float(t) * (beta_max - beta_min)
                diffusion = math.sqrt(beta) * g  # (T,)
                drift = -0.5 * beta * x - (diffusion**2)[None, :, None] * score
                if step_noise is not None:
                    z = torch.tensor(
                        step_noise[i, done : done + b], dtype=torch.float32
                    )
                else:
                    z = torch.randn_like(x)
                x = x - drift * dt + math.sqrt(dt) * diffusion[None, :, None] * z
            out.append(x.numpy())
            done += b
    return np.concatenate(out, axis=0)
