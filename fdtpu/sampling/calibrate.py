"""Quality-constrained E²-CRF operating-point calibration.

The skip budget τ₀ that maximizes speedup at acceptable quality is
model-dependent: the better trained the score net, the smoother ε̂ and the
deeper the safe skipping (CLAUDE.md measured 87% skipped on a 40-epoch
flagship vs 98% on random weights at the same τ₀).  The reference leaves
this choice entirely to the user (its τ₀ is a constructor kwarg that the
live policy ignores — quirk Q1, reference caching.py:131-181); fdtpu's
benchmark docs record safe points per artifact, but a *user* with a new
model needs a procedure, not a table.

``calibrate_tau_0`` automates the documented headline protocol
(docs/benchmarks/tau_headline.json, scripts/bench_shape_scaling.py): walk a
descending τ₀ ladder and accept the first (largest) budget whose cached
samples stay within the finite-sample noise floor of two independent
uncached runs (sliced Wasserstein) AND whose error-budget guard telemetry
stays inside the calibrated thresholds.  The returned object carries the
full per-arm evidence so the decision is auditable.

This composes with (not replaces) the runtime guard rail: calibration picks
the operating point up front from pilot trajectories; ``guard="warn"`` /
``auto_calibrate=True`` keep watching production sampling afterwards.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Optional, Sequence

import jax

logger = logging.getLogger(__name__)

#: Descending skip budgets: the first accepted arm is the largest safe one.
DEFAULT_LADDER: tuple[float, ...] = (1.5, 1.2, 1.0, 0.8, 0.6, 0.4)


@dataclasses.dataclass(frozen=True)
class TauArm:
    """Evidence for one ladder arm."""

    tau_0: float
    sw_vs_uncached: float
    steps_skipped_ratio: float
    guard_err_mean: float
    guard_err_max: float
    within_floor: bool
    guard_silent: bool

    @property
    def accepted(self) -> bool:
        return self.within_floor and self.guard_silent


@dataclasses.dataclass(frozen=True)
class TauCalibration:
    """Result of ``calibrate_tau_0``.

    ``tau_0`` is None when no ladder arm passed — sample uncached, or
    retrain: a model whose ε̂ drifts too fast for τ₀=min(ladder) gains
    nothing safe from skipping.
    """

    tau_0: Optional[float]
    sw_noise_floor: float
    arms: tuple[TauArm, ...]
    cache_kwargs: dict[str, Any]

    @property
    def accepted(self) -> Optional[TauArm]:
        for arm in self.arms:
            if arm.accepted:
                return arm
        return None


def calibrate_tau_0(
    model,
    *,
    num_samples: int,
    num_diffusion_steps: int,
    sample_batch_size: Optional[int] = None,
    batches_per_call: int = 1,
    key: Optional[jax.Array] = None,
    ladder: Sequence[float] = DEFAULT_LADDER,
    cache_kwargs: Optional[dict[str, Any]] = None,
    num_directions: int = 200,
    guard_abs_tol: Optional[float] = None,
    guard_max_tol: Optional[float] = None,
    mesh=None,
) -> TauCalibration:
    """Pick the largest safe τ₀ for ``model`` by pilot sampling.

    Runs one uncached pilot (plus an independent-key rerun for the noise
    floor), then walks ``ladder`` downward, sampling cached at each τ₀ with
    the same key as the pilot and accepting the first arm whose
    SW(cached, uncached) ≤ floor and whose realized-error guard telemetry
    stays under the thresholds.  τ₀ is a traced knob (PolicyParams), so the
    ladder arms reuse one compiled program.

    ``cache_kwargs`` seeds the non-τ₀ cache configuration (level, R,
    eps_order, ...); defaults to the validated score-level setting.
    """
    from fdtpu.cache.e2crf import E2CRFConfig
    from fdtpu.metrics import SlicedWasserstein
    from fdtpu.sampling.sampler import DiffusionSampler

    if key is None:
        key = jax.random.PRNGKey(0)
    base_kwargs: dict[str, Any] = {
        "level": "score", "R": 100, "eps_order": 1,
    }
    base_kwargs.update(cache_kwargs or {})
    base_kwargs.pop("tau_0", None)
    # Pilot runs must not spam warnings for arms the ladder itself rejects.
    pilot_kwargs = dict(base_kwargs)
    pilot_kwargs["guard"] = "off"
    probe_cfg = E2CRFConfig(**{
        k: v for k, v in base_kwargs.items() if hasattr(E2CRFConfig, k)
    })
    abs_tol = guard_abs_tol if guard_abs_tol is not None else probe_cfg.guard_abs_tol
    max_tol = guard_max_tol if guard_max_tol is not None else probe_cfg.guard_max_tol

    if sample_batch_size is None:
        sample_batch_size = max(1, num_samples // batches_per_call)

    floor_key = jax.random.split(key, 2)[1]
    uncached = DiffusionSampler(
        model, sample_batch_size=sample_batch_size,
        batches_per_call=batches_per_call, mesh=mesh,
    )
    s_base = uncached.sample(num_samples, num_diffusion_steps, key=key)
    s_base2 = uncached.sample(num_samples, num_diffusion_steps, key=floor_key)
    sw = SlicedWasserstein(
        original_samples=s_base, random_seed=42, num_directions=num_directions
    )
    floor = float(sw(s_base2)["sliced_wasserstein_mean"])

    arms: list[TauArm] = []
    chosen: Optional[float] = None
    for tau in ladder:
        cached = DiffusionSampler(
            model, sample_batch_size=sample_batch_size,
            batches_per_call=batches_per_call, mesh=mesh, use_cache=True,
            cache_kwargs={**pilot_kwargs, "tau_0": float(tau)},
        )
        s_ca = cached.sample(num_samples, num_diffusion_steps, key=key)
        stats = cached.get_cache_stats()
        delta = float(sw(s_ca)["sliced_wasserstein_mean"])
        arm = TauArm(
            tau_0=float(tau),
            sw_vs_uncached=delta,
            steps_skipped_ratio=float(stats["steps_skipped_ratio"]),
            guard_err_mean=float(stats["realized_err_mean"]),
            guard_err_max=float(stats["realized_err_max"]),
            within_floor=delta <= floor,
            guard_silent=(
                stats["realized_err_mean"] <= abs_tol
                and stats["realized_err_max"] <= max_tol
            ),
        )
        arms.append(arm)
        logger.info(
            "calibrate_tau_0: tau=%.3g SW %.4g vs floor %.4g, %.0f%% skipped, "
            "guard mean/max %.3g/%.3g -> %s",
            tau, delta, floor, 100 * arm.steps_skipped_ratio,
            arm.guard_err_mean, arm.guard_err_max,
            "accept" if arm.accepted else "reject",
        )
        if arm.accepted:
            chosen = float(tau)
            break

    return TauCalibration(
        tau_0=chosen,
        sw_noise_floor=floor,
        arms=tuple(arms),
        cache_kwargs={**base_kwargs, "tau_0": chosen}
        if chosen is not None
        else dict(base_kwargs),
    )
