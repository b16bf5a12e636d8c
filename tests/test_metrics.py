"""Metric tests (mirrors reference tests/test_metrics.py:18-82: POT
cross-check replaced by closed-form 1-D W₂ identities since POT is absent)."""

from functools import partial

import numpy as np
import pytest

from fdtpu.metrics import (
    MarginalWasserstein,
    MetricCollection,
    SlicedWasserstein,
    WassersteinDistances,
    wasserstein2_1d,
)


def test_w2_identical_distributions_zero():
    x = np.random.RandomState(0).randn(500)
    assert wasserstein2_1d(x, x.copy()) == pytest.approx(0.0, abs=1e-12)


def test_w2_shifted_distribution_analytic():
    """W₂(X, X + c) = |c| → W₂² = c² for any distribution."""
    x = np.random.RandomState(1).randn(2000)
    c = 1.7
    assert wasserstein2_1d(x, x + c) == pytest.approx(c**2, rel=1e-6)


def test_w2_unequal_sample_counts():
    """Closed form for uniform[0,1] vs uniform[0,1]+c with different N."""
    rng = np.random.RandomState(2)
    a = rng.uniform(0, 1, 5000)
    b = rng.uniform(0, 1, 3000) + 0.5
    # W₂² ≈ 0.25 (pure shift dominates for large N)
    assert wasserstein2_1d(a, b) == pytest.approx(0.25, abs=0.01)


def test_w2_gaussians_analytic():
    """W₂²(N(0,1), N(m,s²)) = m² + (1−s)²."""
    rng = np.random.RandomState(3)
    a = rng.randn(20000)
    b = rng.randn(20000) * 2.0 + 1.0
    assert wasserstein2_1d(a, b) == pytest.approx(1.0 + 1.0, abs=0.05)


def test_marginal_wasserstein_translated_uniform():
    """Reference test_metrics.py analytic check: translating one feature by c
    gives marginal distance |c| in that feature and ~0 elsewhere."""
    rng = np.random.RandomState(4)
    x = rng.uniform(size=(4000, 3))
    y = x.copy()
    y[:, 1] += 0.75
    wd = WassersteinDistances(x, y, seed=0)
    d = wd.marginal_distances()
    assert d[0] == pytest.approx(0.0, abs=1e-6)
    assert d[1] == pytest.approx(0.75, abs=1e-3)
    assert d[2] == pytest.approx(0.0, abs=1e-6)


def test_sliced_wasserstein_shift_upper_bound():
    """For a pure shift c, every 1-D projection has distance |⟨c, θ⟩| ≤ ‖c‖."""
    rng = np.random.RandomState(5)
    x = rng.randn(1000, 4)
    shift = np.array([1.0, 0.0, 0.0, 0.0])
    y = x + shift
    wd = WassersteinDistances(x, y, seed=0)
    d = wd.sliced_distances(200)
    assert (d <= 1.0 + 1e-6).all()
    assert d.mean() > 0.1


def test_sliced_directions_reproducible():
    x = np.random.RandomState(6).randn(100, 5)
    y = x + 0.3
    d1 = WassersteinDistances(x, y, seed=42).sliced_distances(50)
    d2 = WassersteinDistances(x, y, seed=42).sliced_distances(50)
    np.testing.assert_allclose(d1, d2)


def test_metric_collection_keys_and_baselines():
    rng = np.random.RandomState(7)
    orig = rng.randn(200, 24, 2).astype(np.float32)
    other = rng.randn(100, 24, 2).astype(np.float32)
    collection = MetricCollection(
        metrics=[
            partial(SlicedWasserstein, random_seed=42, num_directions=20),
            partial(MarginalWasserstein, random_seed=42),
        ],
        original_samples=orig,
        include_baselines=True,
        include_spectral_density=True,
    )
    results = collection(other)
    for key in [
        "time_sliced_wasserstein_mean",
        "freq_sliced_wasserstein_mean",
        "time_marginal_wasserstein_mean",
        "freq_marginal_wasserstein_mean",
        "time_sliced_wasserstein_mean_self",
        "time_sliced_wasserstein_mean_dummy",
        "spectral_marginal_wasserstein_mean",
    ]:
        assert key in results, key
    assert list(results.keys()) == sorted(results.keys())
    # Same-distribution samples: metric should be near the self-split baseline.
    assert results["time_sliced_wasserstein_mean"] < 3 * max(
        results["time_sliced_wasserstein_mean_self"], 0.05
    )
