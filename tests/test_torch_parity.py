"""Golden-model parity: fdtpu forward == torch reference forward on
IDENTICAL weights (converted via fdtpu.utils.torch_migration).

This is the definitive end-to-end numerical check of the whole model
pipeline (embed → positional → GFP time encoding → post-norm encoder stack →
unembed) against the torch semantics the reference relies on.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from fdtpu.models import ScoreModelConfig, init_score_model, score_apply
from fdtpu.utils.torch_migration import convert_torch_state_dict

MAX_LEN, CHANNELS, D, L, H, FF = 20, 3, 24, 2, 4, 48


class FakeScheduler:
    """Stands in for the reference's pickled VPScheduler hyperparameter."""

    beta_min = 0.1


class TorchRefModel(torch.nn.Module):
    """The reference ScoreModule pipeline built from torch primitives
    (reference score_models.py:54-113 without the Lightning wrapper)."""

    def __init__(self):
        super().__init__()
        self.embedder = torch.nn.Linear(CHANNELS, D)
        self.pos_embedding = torch.nn.Embedding(MAX_LEN, D, max_norm=math.sqrt(D))
        self.W = torch.nn.Parameter(torch.randn((D + 1) // 2) * 30.0, requires_grad=False)
        self.dense = torch.nn.Linear(D, D)
        layer = torch.nn.TransformerEncoderLayer(
            d_model=D, nhead=H, dim_feedforward=FF, batch_first=True
        )
        self.backbone = torch.nn.TransformerEncoder(layer, num_layers=L)
        self.unembedder = torch.nn.Linear(D, CHANNELS)

    def forward(self, x, t):
        x = self.embedder(x)
        pos = torch.arange(x.size(1)).unsqueeze(0)
        x = x + self.pos_embedding(pos)
        proj = t[:, None] * self.W[None, :] * 2 * math.pi
        emb = torch.cat([torch.sin(proj), torch.cos(proj)], dim=-1)[:, :D]
        x = x + self.dense(emb).unsqueeze(1)
        x = self.backbone(x)
        return self.unembedder(x)

    def fdtpu_state_dict(self):
        sd = {
            "embedder.weight": self.embedder.weight,
            "embedder.bias": self.embedder.bias,
            "pos_encoder.embedding.weight": self.pos_embedding.weight,
            "time_encoder.W": self.W,
            "time_encoder.dense.weight": self.dense.weight,
            "time_encoder.dense.bias": self.dense.bias,
            "unembedder.weight": self.unembedder.weight,
            "unembedder.bias": self.unembedder.bias,
        }
        for i, layer in enumerate(self.backbone.layers):
            pre = f"backbone.layers.{i}."
            sd[pre + "self_attn.in_proj_weight"] = layer.self_attn.in_proj_weight
            sd[pre + "self_attn.in_proj_bias"] = layer.self_attn.in_proj_bias
            sd[pre + "self_attn.out_proj.weight"] = layer.self_attn.out_proj.weight
            sd[pre + "self_attn.out_proj.bias"] = layer.self_attn.out_proj.bias
            sd[pre + "linear1.weight"] = layer.linear1.weight
            sd[pre + "linear1.bias"] = layer.linear1.bias
            sd[pre + "linear2.weight"] = layer.linear2.weight
            sd[pre + "linear2.bias"] = layer.linear2.bias
            sd[pre + "norm1.weight"] = layer.norm1.weight
            sd[pre + "norm1.bias"] = layer.norm1.bias
            sd[pre + "norm2.weight"] = layer.norm2.weight
            sd[pre + "norm2.bias"] = layer.norm2.bias
        return sd


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    ref = TorchRefModel().eval()
    cfg = ScoreModelConfig(
        n_channels=CHANNELS, max_len=MAX_LEN, d_model=D, num_layers=L,
        n_head=H, dim_feedforward=FF,
    )
    variables = convert_torch_state_dict(ref.fdtpu_state_dict(), cfg)
    return ref, cfg, variables


def test_converted_tree_matches_init_structure(models):
    _, cfg, variables = models
    template = init_score_model(jax.random.PRNGKey(0), cfg)
    t_paths = jax.tree_util.tree_structure(template)
    v_paths = jax.tree_util.tree_structure(
        jax.tree.map(jnp.asarray, variables)
    )
    assert t_paths == v_paths
    for a, b in zip(jax.tree.leaves(template), jax.tree.leaves(variables)):
        assert a.shape == np.asarray(b).shape


def test_forward_matches_torch_reference(models):
    ref, cfg, variables = models
    rng = np.random.RandomState(1)
    x = rng.randn(6, MAX_LEN, CHANNELS).astype(np.float32)
    t = rng.rand(6).astype(np.float32)

    with torch.no_grad():
        expected = ref(torch.tensor(x), torch.tensor(t)).numpy()
    got = np.asarray(score_apply(jax.tree.map(jnp.asarray, variables), cfg,
                                 jnp.asarray(x), jnp.asarray(t)))
    np.testing.assert_allclose(got, expected, atol=2e-5)


def test_forward_matches_torch_at_extreme_timesteps(models):
    ref, cfg, variables = models
    x = np.random.RandomState(2).randn(4, MAX_LEN, CHANNELS).astype(np.float32)
    for t_val in (1e-5, 0.5, 1.0):
        t = np.full((4,), t_val, np.float32)
        with torch.no_grad():
            expected = ref(torch.tensor(x), torch.tensor(t)).numpy()
        got = np.asarray(score_apply(jax.tree.map(jnp.asarray, variables), cfg,
                                     jnp.asarray(x), jnp.asarray(t)))
        np.testing.assert_allclose(got, expected, atol=3e-5)


def test_load_reference_ckpt_file(models, tmp_path):
    """Lightning-style .ckpt files load even when they carry pickled objects
    from classes that are no longer importable (the reference pickles its
    scheduler into the checkpoint)."""
    import sys

    ref, cfg, variables = models
    ckpt = {
        "state_dict": ref.fdtpu_state_dict(),
        "hyper_parameters": {"noise_scheduler": FakeScheduler(), "d_model": D},
        "epoch": 3,
    }
    path = tmp_path / "epoch=3-val_loss=0.01.ckpt"
    torch.save(ckpt, path)

    from fdtpu.utils.torch_migration import load_reference_checkpoint

    # Happy path: the pickled class is importable.
    loaded = load_reference_checkpoint(path, cfg)
    for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves(variables)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # Unimportable-class path: delete the class so torch.load fails and the
    # tolerant unpickler takes over.
    saved_cls = FakeScheduler
    mod = sys.modules[saved_cls.__module__]
    delattr(mod, "FakeScheduler")
    try:
        loaded = load_reference_checkpoint(path, cfg)
        for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves(variables)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    finally:
        mod.FakeScheduler = saved_cls


def test_export_to_replica_forward_matches():
    """Inverse direction (the quality-gate instrument): trained-style fdtpu
    variables exported into the torch replica
    (fdtpu/utils/torch_replica.load_fdtpu_variables) must produce the same
    forward as score_apply on the same inputs."""
    from fdtpu.utils.torch_replica import build_torch_score_net, load_fdtpu_variables

    cfg = ScoreModelConfig(
        n_channels=CHANNELS, max_len=MAX_LEN, d_model=D, num_layers=L,
        n_head=H, dim_feedforward=FF,
    )
    variables = init_score_model(jax.random.PRNGKey(3), cfg)
    net = build_torch_score_net(
        n_channels=CHANNELS, max_len=MAX_LEN, d_model=D, num_layers=L,
        n_head=H, dim_feedforward=FF, seed=1,
    )
    load_fdtpu_variables(net, variables)
    net.eval()

    rng = np.random.RandomState(7)
    x = rng.randn(5, MAX_LEN, CHANNELS).astype(np.float32)
    t = np.linspace(0.1, 0.9, 5).astype(np.float32)
    s_jax = np.asarray(score_apply(variables, cfg, jnp.asarray(x), jnp.asarray(t)))
    with torch.no_grad():
        s_torch = net(torch.tensor(x), torch.tensor(t)).numpy()
    np.testing.assert_allclose(s_jax, s_torch, atol=2e-5)
