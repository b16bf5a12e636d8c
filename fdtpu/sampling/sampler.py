"""Reverse-diffusion sampling as one compiled `lax.scan`.

TPU-native redesign of the reference sampler
(`/root/reference/src/fdiff/sampling/sampler.py:14-228`), which drives a
per-step Python loop with tqdm.  Here the full trajectory — score forward
(optionally through the E²-CRF cache), optional FreSca scaling, and the
Euler–Maruyama scheduler step — is one `lax.scan` under `jit`:

* Cache decisions are traced computations; the heavy/light paths are selected
  by `lax.switch` (KV level) or `lax.cond` (score level) so cached steps skip
  real FLOPs at runtime, not just Python overhead.
* PRNG is functional: one key threads through prior sampling, the per-step
  reverse noise, and the event policy's random probe.
* The sample batch axis is sharded over the device mesh by the caller
  (see fdtpu.dist.mesh) — sampling is embarrassingly parallel over batch.

Reference parity preserved deliberately: remainder-dropping batch count
(quirk Q6), cache persistence across batches with a global step counter
(quirk Q5, opt-out via `E2CRFConfig.reset_between_batches`), and FreSca's
time-decay schedule fed the SDE time like the torch code does.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

import dataclasses

from fdtpu.cache.e2crf import (
    CacheState,
    E2CRFConfig,
    PolicyParams,
    event_policy,
    guard_relative_error,
    init_cache_state,
    macro_policy,
    record_guard_measurement,
    score_skip_decision,
    token_policy,
    update_after_forward,
)
from fdtpu.diffusion.sde import SDE
from fdtpu.models.score_models import (
    ScoreModel,
    ScoreModelConfig,
    score_apply,
    score_apply_cached,
    score_apply_topk,
)

from fdtpu.ops.fresca import apply_fresca_to_score

Array = jax.Array


def _shard_cache_state(mesh, state: CacheState) -> CacheState:
    """Place the cache on the mesh: KV stores sharded over their batch axis
    (axis 1 of (L, B, T, H, Dh)), ε̂ over axis 0, everything else replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(a, spec):
        return jax.device_put(a, NamedSharding(mesh, spec))

    rep = P()
    kv_spec = P(None, "data", None, None, None) if state.k.ndim > 1 else rep

    def eps_spec_for(a):
        # Zero-size placeholders (e.g. eps_prev2 outside the score level)
        # stay replicated.
        return P("data", None, None) if a.ndim > 1 else rep

    replicated = {
        f: put(getattr(state, f), rep)
        for f in (
            "crf_prev", "delta_tok", "gap_tok", "last_tok", "eps_gap",
            "eps_gap2", "drift_rate", "err_acc", "last_full_step", "cold",
            "crf_low", "crf_high_hist", "crf_t_hist", "hist_len", "step",
            "recompute_count", "cache_hit_count", "full_steps", "mixed_steps",
            "cached_steps", "realized_err_sum", "predicted_err_sum",
            "realized_err_max", "guard_measurements", "overrun",
            "eps_norm_ref", "eps_norm_cold",
        )
    }
    return state.replace(
        k=put(state.k, kv_spec),
        v=put(state.v, kv_spec),
        eps_hat=put(state.eps_hat, eps_spec_for(state.eps_hat)),
        eps_prev=put(state.eps_prev, eps_spec_for(state.eps_prev)),
        eps_prev2=put(state.eps_prev2, eps_spec_for(state.eps_prev2)),
        **replicated,
    )


def _cast_variables(variables: dict[str, Any], model_cfg: ScoreModelConfig):
    """Mixed precision: cast the variables ONCE, outside the compiled scan —
    otherwise the fp32→bf16 parameter conversion is traced into every
    diffusion step.  Shared by the per-batch and device-resident entry
    points so their numerics stay identical."""
    if model_cfg._cdtype == jnp.float32:
        return variables
    return jax.tree.map(lambda a: a.astype(model_cfg._cdtype), variables)


def _prep_cache_for_new_batch(
    state: CacheState, fresh: Optional[CacheState], reset: bool
) -> CacheState:
    """Cross-batch cache prep (quirk Q5), the ONE place both the host loop
    and the resident scan use: a new trajectory either re-inits the store
    (``reset_between_batches``) or keeps it but marks it cold so the first
    steps recompute and re-calibrate the drift rate."""
    if reset:
        assert fresh is not None
        return fresh
    return state.replace(
        cold=jnp.ones((), bool),
        drift_rate=jnp.zeros((), state.drift_rate.dtype),
    )


def _normalize_cache_cfg(
    cache_cfg: Optional[E2CRFConfig],
) -> tuple[Optional[PolicyParams], Optional[E2CRFConfig]]:
    """Split the cache config into traced policy params and a static config.

    The numeric knobs move into :class:`PolicyParams` (traced, so sweeps
    reuse one compiled program) and are zeroed in the static config so its
    hash is sweep-invariant (the guard knobs only act post-sample in
    Python)."""
    if cache_cfg is None:
        return None, None
    pp = cache_cfg.policy_params()
    cache_cfg = dataclasses.replace(
        cache_cfg, K=0, R=0, tau_0=0.0, tau_warn=0.0,
        random_probe_ratio=0.0, guard="", guard_overrun_tol=0.0,
        guard_abs_tol=0.0, guard_max_tol=0.0,
    )
    return pp, cache_cfg


def sample_chain(
    variables: dict[str, Any],
    scheduler: SDE,
    x0: Array,
    key: Array,
    cache_state: Optional[CacheState],
    *,
    model_cfg: ScoreModelConfig,
    cache_cfg: Optional[E2CRFConfig],
    num_steps: int,
    use_fresca: bool = False,
    fresca_low_scale: float = 1.0,
    fresca_high_scale: float = 1.5,
    fresca_cutoff_ratio: float = 0.5,
    fresca_cutoff_strategy: str = "energy",
    guard_trace: bool = False,
) -> tuple[Array, Optional[CacheState]]:
    """Run the full reverse diffusion from prior sample ``x0``.

    Returns the generated batch and the (possibly updated) cache state.

    The numeric cache knobs (K, R, τ₀, τ_warn, probe ratio) and the FreSca
    scales are *traced*, so hyperparameter sweeps reuse one compiled program;
    only structural choices (policy, level, FreqCa) recompile.

    ``guard_trace=True`` (score level only) additionally returns per-step
    guard telemetry arrays ``(measured, rel, eps_norm, err_acc, steps_since)``
    each of shape ``(num_steps,)`` — the raw data behind each
    ``record_guard_measurement`` call, for offline diagnosis of guard
    statistics (docs/benchmarks/guard_demo.json methodology).
    """
    pp, cache_cfg = _normalize_cache_cfg(cache_cfg)
    variables = _cast_variables(variables, model_cfg)
    return _sample_chain(
        variables,
        scheduler,
        x0,
        key,
        cache_state,
        pp,
        jnp.asarray(fresca_low_scale, x0.dtype),
        jnp.asarray(fresca_high_scale, x0.dtype),
        model_cfg=model_cfg,
        cache_cfg=cache_cfg,
        num_steps=num_steps,
        use_fresca=use_fresca,
        fresca_cutoff_ratio=fresca_cutoff_ratio,
        fresca_cutoff_strategy=fresca_cutoff_strategy,
        guard_trace=guard_trace,
    )


def _sample_chain_impl(
    variables: dict[str, Any],
    scheduler: SDE,
    x0: Array,
    key: Array,
    cache_state: Optional[CacheState],
    pp: Optional[PolicyParams],
    fresca_low_scale: Array,
    fresca_high_scale: Array,
    *,
    model_cfg: ScoreModelConfig,
    cache_cfg: Optional[E2CRFConfig],
    num_steps: int,
    use_fresca: bool,
    fresca_cutoff_ratio: float,
    fresca_cutoff_strategy: str,
    guard_trace: bool = False,
) -> tuple[Array, Optional[CacheState]]:
    ts, step_size = scheduler.timesteps(num_steps)
    use_cache = cache_cfg is not None
    batch = x0.shape[0]
    if guard_trace and (not use_cache or cache_cfg.level != "score"):
        raise NotImplementedError("guard_trace only supports level='score'")

    def maybe_fresca(score: Array, t: Array) -> Array:
        if not use_fresca:
            return score
        return apply_fresca_to_score(
            score,
            low_scale=fresca_low_scale,
            high_scale=fresca_high_scale,
            cutoff_ratio=fresca_cutoff_ratio,
            cutoff_strategy=fresca_cutoff_strategy,
            timestep=t,
            num_steps=num_steps,
        )

    if not use_cache:

        def body(carry, t):
            x, k = carry
            k, k_noise = jax.random.split(k)
            t_batch = jnp.full((batch,), t, x.dtype)
            score = score_apply(variables, model_cfg, x, t_batch)
            score = maybe_fresca(score, t)
            z = jax.random.normal(k_noise, x.shape, x.dtype)
            x = scheduler.step(score, t, x, z, step_size)
            return (x, k), None

        (x, _), _ = jax.lax.scan(body, (x0, key), ts)
        return x, None

    max_len = model_cfg.max_len
    order = cache_cfg.eps_order if use_cache else 0
    predictor = cache_cfg.eps_predictor if use_cache else "taylor"

    def eps_predict(c: CacheState, steps_ahead, t):
        """Extrapolate ε̂ ``steps_ahead`` past the last full computation.

        ``eps_predictor="taylor"`` (default): order 0 = frozen reuse,
        order 1 = linear from the last two full computations, order 2 =
        quadratic (Newton form) from the last three.
        ``eps_predictor="freqca"``: frozen low-frequency component +
        Hermite-extrapolated high-frequency component over the refresh
        history ring (the reference's dormant predict_crf_freqca mechanism,
        caching.py:561-597, applied at the ε̂ level; evaluated at the true
        target time ``t``, not span-clipped).
        ``steps_ahead`` broadcasts, so a vector predicts a whole span.
        """
        if predictor == "freqca":
            from fdtpu.ops.fourier import predict_hermite

            k_hist = c.crf_high_hist.shape[0]
            valid = jnp.arange(k_hist) >= (k_hist - c.hist_len)
            high = predict_hermite(
                c.crf_high_hist, c.crf_t_hist, t,
                order=cache_cfg.hermite_order, valid=valid,
                # Extrapolate only once the fit is determined; an
                # underdetermined ridge fit extrapolated past the span
                # diverges (182× realized error on the smoke model).
                clip_target=c.hist_len <= cache_cfg.hermite_order,
            )
            pred = c.crf_low.astype(c.eps_hat.dtype) + high.astype(c.eps_hat.dtype)
            # <2 live observations: frozen reuse (order-0 fallback).
            pred = jnp.where(c.hist_len >= 2, pred, c.eps_hat)
            return pred + 0.0 * steps_ahead
        if order == 0:
            # Frozen reuse; the zero product keeps broadcasting against a
            # span vector identical to the higher orders.
            return c.eps_hat + 0.0 * steps_ahead
        slope1 = jnp.where(
            c.eps_gap > 0, (c.eps_hat - c.eps_prev) / jnp.maximum(c.eps_gap, 1), 0.0
        )
        pred = c.eps_hat + slope1 * steps_ahead
        if order >= 2:
            slope2 = jnp.where(
                c.eps_gap2 > 0,
                (c.eps_prev - c.eps_prev2) / jnp.maximum(c.eps_gap2, 1),
                0.0,
            )
            span = jnp.maximum(c.eps_gap + c.eps_gap2, 1.0) / 2.0
            curvature = jnp.where(
                (c.eps_gap > 0) & (c.eps_gap2 > 0),
                (slope1 - slope2) / span, 0.0,
            )
            pred = pred + 0.5 * curvature * steps_ahead * (steps_ahead + c.eps_gap)
        return pred

    def score_level_body(carry, t):
        x, k, cache = carry
        k, k_noise = jax.random.split(k)
        t_batch = jnp.full((batch,), t, x.dtype)
        _, std = scheduler.marginal_prob(x, t_batch)

        def full_fn(c: CacheState):
            score = score_apply(variables, model_cfg, x, t_batch)
            eps_new = -std[..., None] * score
            denom = jnp.linalg.norm(eps_new) + 1e-8
            # Trajectory noise scale: high-water mark of refresh-time ‖ε̂‖.
            norm_ref = jnp.maximum(c.eps_norm_ref, denom.astype(x.dtype))
            is_cold = c.cold
            steps_since = jnp.maximum(c.step - c.last_full_step, 1).astype(x.dtype)
            # Drift rate measured against what the skip branch WOULD have
            # predicted for this step — the budget tracks the extrapolation
            # residual, not the raw ε̂ change.  The denominator is floored at
            # 10% of the trajectory scale (guard_relative_error): without the
            # floor, the end-of-trajectory ‖ε̂‖ collapse turns the final
            # refresh into a phase-dependent 20× spike (BENCH_r03 guard
            # firing; scripts/diagnose_guard.py).
            eps_pred = eps_predict(c, steps_since, t)
            measured = (~is_cold) & (steps_since > 1)
            rel = guard_relative_error(
                jnp.linalg.norm(eps_new - eps_pred), denom, norm_ref
            )
            drift_rate = jnp.where(is_cold, jnp.zeros((), x.dtype), rel / steps_since)
            trace = (
                measured.astype(jnp.float32),
                rel.astype(jnp.float32),
                denom.astype(jnp.float32),
                c.err_acc.astype(jnp.float32),
                steps_since.astype(jnp.float32),
            )
            # Guard telemetry: a refresh that closes a real skip span
            # (steps_since > 1) measures how far the extrapolation actually
            # drifted vs what the budget predicted (err_acc).
            c = record_guard_measurement(
                c, measured, rel, c.err_acc, pp.guard_abs_tol,
            )
            freqca_updates = {}
            if predictor == "freqca":
                from fdtpu.ops.fourier import frequency_decompose_fft

                eps_low, eps_high = frequency_decompose_fft(
                    eps_new, cache_cfg.low_freq_ratio
                )
                k_hist = c.crf_high_hist.shape[0]
                freqca_updates = dict(
                    crf_low=eps_low.astype(c.crf_low.dtype),
                    crf_high_hist=jnp.concatenate(
                        [
                            c.crf_high_hist[1:],
                            eps_high[None].astype(c.crf_high_hist.dtype),
                        ],
                        axis=0,
                    ),
                    crf_t_hist=jnp.concatenate(
                        [c.crf_t_hist[1:], t[None].astype(c.crf_t_hist.dtype)]
                    ),
                    # A cold refresh starts a new trajectory: the ring's
                    # older entries belong to the previous one — restart
                    # the live count at this single observation.
                    hist_len=jnp.where(
                        is_cold,
                        jnp.ones((), jnp.int32),
                        jnp.minimum(c.hist_len + 1, k_hist),
                    ),
                )
            c = c.replace(
                eps_norm_ref=norm_ref,
                eps_norm_cold=jnp.where(
                    is_cold, denom.astype(c.eps_norm_cold.dtype),
                    c.eps_norm_cold,
                ),
                cold=jnp.zeros((), bool),
                eps_prev2=jnp.where(is_cold, eps_new, c.eps_prev),
                eps_gap2=jnp.where(is_cold, jnp.zeros((), x.dtype), c.eps_gap),
                eps_prev=jnp.where(is_cold, eps_new, c.eps_hat),
                eps_gap=jnp.where(is_cold, jnp.zeros((), x.dtype), steps_since),
                eps_hat=eps_new,
                drift_rate=drift_rate,
                err_acc=jnp.zeros((), x.dtype),
                last_full_step=c.step,
                full_steps=c.full_steps + 1,
                recompute_count=c.recompute_count + max_len,
                **freqca_updates,
            )
            return score, c, trace

        def skip_fn(c: CacheState):
            # Reconstruct the score from the predicted noise — the network
            # is skipped entirely.
            steps_ahead = (c.step - c.last_full_step + 1).astype(x.dtype)
            eps = eps_predict(c, steps_ahead, t)
            score = -eps / std[..., None]
            c = c.replace(
                err_acc=c.err_acc + c.drift_rate,
                cached_steps=c.cached_steps + 1,
                cache_hit_count=c.cache_hit_count + max_len,
            )
            zero = jnp.zeros((), jnp.float32)
            return score, c, (zero, zero, zero, zero, zero)

        compute = score_skip_decision(cache_cfg, pp, cache)
        score, cache, trace = jax.lax.cond(compute, full_fn, skip_fn, cache)
        score = maybe_fresca(score, t)
        z = jax.random.normal(k_noise, x.shape, x.dtype)
        x = scheduler.step(score, t, x, z, step_size)
        cache = cache.replace(step=cache.step + 1)
        return (x, k, cache), (trace if guard_trace else None)

    def token_level_body(carry, t):
        """Per-token E²-CRF with static top-k budget (level="token").

        Three `lax.switch` branches per step: FULL (error-feedback refresh of
        every token + KV rebuild), TOPK (recompute only the ``token_budget``
        highest-priority tokens end-to-end and scatter into the cached K/V
        and ε̂ rows), SKIP (no network at all — every token's ε̂ row is
        extrapolated and rescaled by the current marginal std).  The ε̂ cache
        lives in noise space so stale rows stay correctly scaled as std(t)
        shrinks along the trajectory (same trick as the score level).
        """
        x, k, cache = carry
        k, k_noise, k_probe = jax.random.split(k, 3)
        t_batch = jnp.full((batch,), t, x.dtype)
        _, std = scheduler.marginal_prob(x, t_batch)  # (B, T)
        stdc = std[..., None]  # (B, T, 1)

        budget = min(int(cache_cfg.token_budget), max_len)
        idx_range = jnp.arange(max_len)

        # Per-token linear extrapolation of ε̂ (order 0 = frozen reuse).
        age = (cache.step - cache.last_tok).astype(x.dtype)  # (T,)
        if cache_cfg.eps_order == 0:
            slope = jnp.zeros_like(cache.eps_hat)
        else:
            slope = jnp.where(
                (cache.gap_tok > 0)[None, :, None],
                (cache.eps_hat - cache.eps_prev)
                / jnp.maximum(cache.gap_tok, 1.0)[None, :, None],
                0.0,
            )
        eps_pred = cache.eps_hat + slope * age[None, :, None]  # (B, T, C)

        mode, w_drift, mean_drift = token_policy(cache_cfg, pp, cache, x)

        def _tok_norms(eps):
            return jnp.linalg.norm(eps.astype(jnp.float32), axis=(0, 2))

        def _tok_residual_rate(eps_new, pred, ages, ref):
            """Relative extrapolation residual per token per elapsed step.

            Norms over (batch, channels) in float32; ``ages`` counts the
            steps the prediction had to bridge; ``ref`` is each token's
            trajectory-scale ε̂ norm — the denominator floor
            (guard_relative_error; same end-of-trajectory shrinkage
            mechanism as the score level).
            """
            num = jnp.linalg.norm(
                (eps_new - pred).astype(jnp.float32), axis=(0, 2)
            )
            den = _tok_norms(eps_new) + 1e-8
            rel = guard_relative_error(num, den, ref.astype(jnp.float32))
            return rel / jnp.maximum(ages.astype(jnp.float32), 1.0)

        def full_fn(c: CacheState):
            score, kv_new, _ = score_apply_cached(
                variables, model_cfg, x, t_batch, (c.k, c.v),
                jnp.ones((max_len,), bool), 0,  # MODE_FULL
            )
            eps_new = -stdc * score
            tok_norms = _tok_norms(eps_new).astype(c.eps_norm_ref.dtype)
            norm_ref = jnp.maximum(c.eps_norm_ref, tok_norms)
            rate = jnp.where(
                c.cold,
                jnp.zeros((max_len,), jnp.float32),
                _tok_residual_rate(eps_new, eps_pred, age, norm_ref),
            ).astype(c.delta_tok.dtype)
            # Guard telemetry: realized mean per-token extrapolation error
            # over the spans just closed (rate × age undoes the per-step
            # normalization) vs the accumulated predicted budget.
            realized = jnp.mean(
                rate.astype(jnp.float32) * jnp.maximum(age, 1.0)
            )
            c = record_guard_measurement(
                c, (~c.cold) & (jnp.max(age) > 1), realized, c.err_acc,
                pp.guard_abs_tol,
            )
            c = c.replace(
                k=kv_new[0],
                v=kv_new[1],
                eps_prev=jnp.where(c.cold, eps_new, c.eps_hat),
                gap_tok=jnp.where(c.cold, jnp.zeros_like(age), age),
                eps_hat=eps_new,
                last_tok=jnp.full_like(c.last_tok, c.step),
                delta_tok=rate,
                eps_norm_ref=norm_ref,
                eps_norm_cold=jnp.where(c.cold, tok_norms, c.eps_norm_cold),
                err_acc=jnp.zeros((), c.err_acc.dtype),
                last_full_step=c.step,
                cold=jnp.zeros((), bool),
                full_steps=c.full_steps + 1,
                recompute_count=c.recompute_count + max_len,
            )
            return score, c

        def topk_fn(c: CacheState):
            # Priority: ACCUMULATED predicted error per token — drift rate ×
            # steps since that token's last recompute (weighted by spectral
            # energy).  Using the rate alone starves low-rate tokens forever
            # and their order-1 extrapolation diverges over long ages; the
            # rate×age form spreads the budget so every token's staleness
            # stays bounded.  K low-frequency anchors always in (reference
            # policy's first-2K refresh analog), random probes forced in
            # below the anchors (quirk Q4's random_probe_ratio).
            acc_err = w_drift * (age + 1.0)
            low_bonus = jnp.where(idx_range < pp.K, 2e9, 0.0)
            probe = jnp.where(
                jax.random.uniform(k_probe, (max_len,)) < pp.random_probe_ratio,
                1e9,
                0.0,
            )
            _, idx = jax.lax.top_k(acc_err + low_bonus + probe, budget)

            out_rows, kv_new = score_apply_topk(
                variables, model_cfg, x, t_batch, (c.k, c.v), idx
            )
            std_rows = jnp.take(std, idx, axis=1)  # (B, k)
            eps_rows = -std_rows[..., None] * out_rows
            pred_rows = jnp.take(eps_pred, idx, axis=1)
            age_rows = jnp.take(age, idx)
            ref_rows = jnp.maximum(
                jnp.take(c.eps_norm_ref, idx),
                _tok_norms(eps_rows).astype(c.eps_norm_ref.dtype),
            )
            rate_rows = _tok_residual_rate(
                eps_rows, pred_rows, age_rows, ref_rows
            ).astype(c.delta_tok.dtype)
            # Guard telemetry at TOPK steps: the realized extrapolation
            # error of the rows being refreshed (rate × age undoes the
            # per-step normalization).  Without this, stale-token error is
            # structurally unobservable — the policy only measures tokens
            # it CHOSE to recompute, so a cumulative-bias collapse of the
            # starved tokens never reaches the telemetry
            # (guard_demo_v2.json: token τ₀=3 at SW 50× floor with every
            # per-span statistic in the safe range).  Random probes
            # (random_probe_ratio, within the same token budget) audit
            # stale tokens; this records what the audit finds.
            # MEDIAN over the audited rows, not mean: a safe configuration
            # occasionally refreshes one ancient row whose order-1
            # extrapolation diverged harmlessly (worst-span 6× spikes on
            # within-floor arms in guard_demo_v2), while a collapsing one
            # has MOST audited rows diverged — the median separates where
            # the mean conflates.
            c = record_guard_measurement(
                c,
                (~c.cold) & (jnp.max(age_rows) > 1),
                jnp.median(
                    rate_rows.astype(jnp.float32)
                    * jnp.maximum(age_rows.astype(jnp.float32), 1.0)
                ),
                c.err_acc,
                pp.guard_abs_tol,
            )

            eps_full = eps_pred.at[:, idx].set(eps_rows)
            score = -eps_full / stdc

            # Unattended drift accrues into the error budget; the attended
            # share is considered served this step.
            attended = jnp.sum(jnp.take(w_drift, idx)) / max_len
            err_inc = jnp.maximum(mean_drift - attended, 0.0)
            c = c.replace(
                k=kv_new[0],
                v=kv_new[1],
                eps_prev=c.eps_prev.at[:, idx].set(jnp.take(c.eps_hat, idx, axis=1)),
                gap_tok=c.gap_tok.at[idx].set(age_rows),
                eps_hat=c.eps_hat.at[:, idx].set(eps_rows),
                last_tok=c.last_tok.at[idx].set(c.step),
                delta_tok=c.delta_tok.at[idx].set(rate_rows),
                eps_norm_ref=c.eps_norm_ref.at[idx].set(ref_rows),
                err_acc=c.err_acc + err_inc.astype(c.err_acc.dtype),
                mixed_steps=c.mixed_steps + 1,
                recompute_count=c.recompute_count + budget,
                cache_hit_count=c.cache_hit_count + (max_len - budget),
            )
            return score, c

        def skip_fn(c: CacheState):
            score = -eps_pred / stdc
            c = c.replace(
                err_acc=c.err_acc + mean_drift.astype(c.err_acc.dtype),
                cached_steps=c.cached_steps + 1,
                cache_hit_count=c.cache_hit_count + max_len,
            )
            return score, c

        score, cache = jax.lax.switch(mode, [full_fn, topk_fn, skip_fn], cache)
        score = maybe_fresca(score, t)
        z = jax.random.normal(k_noise, x.shape, x.dtype)
        x = scheduler.step(score, t, x, z, step_size)
        cache = cache.replace(step=cache.step + 1)
        return (x, k, cache), None

    def kv_level_body(carry, t):
        x, k, cache = carry
        k, k_noise, k_probe = jax.random.split(k, 3)
        t_batch = jnp.full((batch,), t, x.dtype)

        if cache_cfg.policy == "macro":
            mode, mask = macro_policy(pp, cache, max_len)
        else:
            mode, mask = event_policy(cache_cfg, pp, cache, x, k_probe)

        score, kv_new, crf = score_apply_cached(
            variables, model_cfg, x, t_batch, (cache.k, cache.v), mask, mode
        )
        cache = update_after_forward(cache_cfg, cache, mode, mask, kv_new, crf, t)
        score = maybe_fresca(score, t)
        z = jax.random.normal(k_noise, x.shape, x.dtype)
        x = scheduler.step(score, t, x, z, step_size)
        cache = cache.replace(step=cache.step + 1)
        return (x, k, cache), None

    if cache_cfg.level == "score":
        body = score_level_body
    elif cache_cfg.level == "token":
        body = token_level_body
    else:
        body = kv_level_body

    # NOTE (measured, round 3): a block-collapsed fast path for long skip
    # spans — telescoping k x-independent steps into one scan iteration
    # with bit-identical PRNG/policy/counters — was implemented and
    # benchmarked at commit 5d7845f, and REMOVED: it changes nothing
    # outside tunnel noise at any operating point (192.2 vs 191.8
    # samples/s/chip at the 96%-skip headline, 510.6 vs 516.2 at 99% skip,
    # +5% at batch 8), because TPU scan iterations carry no measurable
    # launch overhead — the 0.13 ms/step skip body is real compute (noise
    # draw + ε̂ extrapolation + EM update) that vectorizing over steps
    # cannot reduce.  Evidence: docs/benchmarks/block_size.json.
    (x, _, cache_state), ys = jax.lax.scan(body, (x0, key, cache_state), ts)
    if guard_trace:
        return x, cache_state, ys
    return x, cache_state


# Donate the prior sample (dead after the call) so XLA can alias the
# scan carry in place.  The cache state is NOT donated: its freshly
# initialized zero leaves can alias one buffer, and donating aliased
# buffers is rejected.
_sample_chain = partial(
    jax.jit,
    static_argnames=(
        "model_cfg",
        "cache_cfg",
        "num_steps",
        "use_fresca",
        "fresca_cutoff_ratio",
        "fresca_cutoff_strategy",
        "guard_trace",
    ),
    donate_argnums=(2,),
)(_sample_chain_impl)


@partial(
    jax.jit,
    static_argnames=(
        "model_cfg",
        "cache_cfg",
        "num_steps",
        "num_batches",
        "batch_size",
        "x0_sharding",
        "use_fresca",
        "fresca_cutoff_ratio",
        "fresca_cutoff_strategy",
    ),
)
def _sample_batches_resident(
    variables: dict[str, Any],
    scheduler: SDE,
    key: Array,
    cache_state: Optional[CacheState],
    pp: Optional[PolicyParams],
    fresca_low_scale: Array,
    fresca_high_scale: Array,
    *,
    model_cfg: ScoreModelConfig,
    cache_cfg: Optional[E2CRFConfig],
    num_steps: int,
    num_batches: int,
    batch_size: int,
    first_is_fresh: bool,
    x0_sharding: Optional[Any],
    use_fresca: bool,
    fresca_cutoff_ratio: float,
    fresca_cutoff_strategy: str,
) -> tuple[Array, Array, Optional[CacheState]]:
    """Device-resident multi-batch sampling: ``num_batches`` full reverse
    trajectories inside ONE jitted dispatch (a `lax.scan` over batches whose
    body is the per-trajectory diffusion scan).

    The reference generates multi-batch sample sets with a host Python loop
    (sampler.py:125-155, one forward dispatch per *step*); the single-batch
    path here already collapses that to one dispatch per batch, and this
    collapses it further to one dispatch per *call* — on the TPU tunnel the
    fixed per-dispatch cost (~0.3-0.4 s) otherwise dominates cached
    trajectories that execute in ~0.3 s.

    Host-loop parity: the per-batch PRNG split sequence, the cross-batch
    cache persistence (quirk Q5: carry the store, mark it cold so the new
    trajectory re-calibrates) and ``reset_between_batches`` re-init all
    replicate ``DiffusionSampler.sample``'s host loop exactly;
    ``first_is_fresh`` says whether iteration 0 should use ``cache_state``
    as passed (a freshly initialized store) or prep it like any later batch.
    Guard telemetry and the τ₀ auto-calibration high-water mark live in the
    carried state, so they behave identically to the host loop.
    """
    use_cache = cache_cfg is not None
    if use_cache:
        fresh = init_cache_state(
            cache_cfg,
            num_layers=model_cfg.num_layers,
            batch=batch_size,
            n_head=model_cfg.n_head,
            max_len=model_cfg.max_len,
            head_dim=model_cfg.head_dim,
            d_model=model_cfg.d_model,
            n_channels=model_cfg.n_channels,
            kv_dtype=model_cfg._cdtype,
        )

        def prep_for_new_batch(state: CacheState) -> CacheState:
            return _prep_cache_for_new_batch(
                state, fresh, cache_cfg.reset_between_batches
            )

    def body(carry, _):
        key, state, first = carry
        key, k_prior, k_chain = jax.random.split(key, 3)
        x0 = scheduler.prior_sampling(
            k_prior, (batch_size, model_cfg.max_len, model_cfg.n_channels)
        )
        if x0_sharding is not None:
            x0 = jax.lax.with_sharding_constraint(x0, x0_sharding)
        if use_cache:
            state = jax.lax.cond(
                first, lambda s: s, prep_for_new_batch, state
            )
        x, state = _sample_chain_impl(
            variables,
            scheduler,
            x0,
            k_chain,
            state,
            pp,
            # Match the host wrapper's scale dtype (sample_chain casts to
            # x0.dtype) so both paths compute FreSca at the same precision.
            fresca_low_scale.astype(x0.dtype),
            fresca_high_scale.astype(x0.dtype),
            model_cfg=model_cfg,
            cache_cfg=cache_cfg,
            num_steps=num_steps,
            use_fresca=use_fresca,
            fresca_cutoff_ratio=fresca_cutoff_ratio,
            fresca_cutoff_strategy=fresca_cutoff_strategy,
        )
        return (key, state, jnp.zeros((), bool)), x

    first = jnp.asarray(first_is_fresh, bool)
    (key, cache_state, _), xs = jax.lax.scan(
        body, (key, cache_state, first), None, length=num_batches
    )
    return xs, key, cache_state


class DiffusionSampler:
    """User-facing sampler (reference DiffusionSampler, sampler.py:14-228).

    Args mirror the reference constructor; `cache_kwargs` accepts the same
    keys as the torch `E2CRFCache` plus the policy/level extensions
    (see :class:`fdtpu.cache.e2crf.E2CRFConfig`).
    """

    def __init__(
        self,
        score_model: ScoreModel,
        sample_batch_size: int,
        use_cache: bool = False,
        cache_kwargs: Optional[dict] = None,
        use_fresca: bool = False,
        fresca_low_scale: float = 1.0,
        fresca_high_scale: float = 1.5,
        fresca_cutoff_ratio: float = 0.5,
        fresca_cutoff_strategy: str = "energy",
        mesh: Optional[Any] = None,
        batches_per_call: int = 1,
    ) -> None:
        """``mesh``: optional `jax.sharding.Mesh` — the sample batch (and the
        per-batch cache state) are sharded over its ``data`` axis, so one
        compiled chain runs data-parallel across all chips (sampling is
        embarrassingly parallel over the batch; a capability the reference
        lacks entirely, SURVEY.md §2.3).

        ``batches_per_call``: >1 groups that many full-size batches into ONE
        jitted dispatch (a device-resident `lax.scan` over trajectories,
        :func:`_sample_batches_resident`).  Sample values and cache/guard
        semantics are identical to the per-batch host loop; only the
        per-dispatch overhead is amortized — on cached operating points
        where a trajectory executes in ~0.3 s the fixed dispatch cost
        otherwise dominates throughput."""
        self.score_model = score_model
        self.noise_scheduler = score_model.scheduler
        self.sample_batch_size = sample_batch_size
        self.n_channels = score_model.n_channels
        self.max_len = score_model.max_len
        self.mesh = mesh
        self.batches_per_call = max(1, int(batches_per_call))

        self.use_cache = use_cache
        self.cache_config = (
            E2CRFConfig(**(cache_kwargs or {})) if use_cache else None
        )
        if self.cache_config is not None:
            if self.cache_config.eps_predictor not in ("taylor", "freqca"):
                raise ValueError(
                    "eps_predictor must be 'taylor' or 'freqca' "
                    f"(got {self.cache_config.eps_predictor!r})"
                )
            if (
                self.cache_config.eps_predictor == "freqca"
                and self.cache_config.level != "score"
            ):
                raise ValueError(
                    "eps_predictor='freqca' is a score-level predictor "
                    f"(got level={self.cache_config.level!r})"
                )
        if (
            self.cache_config is not None
            and self.cache_config.level == "token"
            and not (1 <= self.cache_config.token_budget <= self.max_len)
        ):
            raise ValueError(
                "level='token' needs 1 <= token_budget <= max_len "
                f"(got {self.cache_config.token_budget}, max_len {self.max_len})"
            )
        if (
            self.cache_config is not None
            and self.cache_config.level == "token"
            and self.cache_config.random_probe_ratio == 0.0
            and self.cache_config.guard != "off"
        ):
            # Guard calibration v2 (docs/benchmarks/guard_demo_v2.json):
            # token-level cumulative collapse happens in rows the top-k
            # never selects, so without random probes the guard's TOPK
            # audit can only measure rows the policy already chose — the
            # probe default (0.02) exists to close exactly that hole.
            import warnings

            warnings.warn(
                "level='token' with random_probe_ratio=0.0: stale rows the "
                "top-k never selects go unaudited, so cumulative collapse "
                "there is invisible to the error-budget guard "
                "(docs/benchmarks/guard_demo_v2.json). Leave "
                "random_probe_ratio unset to get the 0.02 default, or set "
                "guard='off' to silence this warning.",
                stacklevel=2,
            )
        if (
            self.cache_config is not None
            and self.cache_config.level == "kv"
            and self.cache_config.policy == "event"
            and self.cache_config.tau_0 < 1.0
        ):
            # The KV-level CRF drift signal is unnormalized (reference
            # parity): calibrated operating points are tau_0 ∈ [1, 1000]
            # (cli/ablation_cache.py sweep) — the reference's 0.1 default
            # makes tau_warn fire every step and no step is ever cached.
            import warnings

            warnings.warn(
                f"level='kv' with policy='event' and tau_0="
                f"{self.cache_config.tau_0} < 1: the KV-level CRF drift is "
                "unnormalized, so this threshold triggers recomputation "
                "every step (no caching). Calibrated values are "
                "tau_0 in [1, 1000]; see cli/ablation_cache.py.",
                stacklevel=2,
            )
        self.last_cache_state: Optional[CacheState] = None

        self.use_fresca = use_fresca
        self.fresca_low_scale = fresca_low_scale
        self.fresca_high_scale = fresca_high_scale
        self.fresca_cutoff_ratio = fresca_cutoff_ratio
        self.fresca_cutoff_strategy = fresca_cutoff_strategy

    def _init_cache(self, batch_size: int) -> Optional[CacheState]:
        if not self.use_cache:
            return None
        cfg = self.score_model.config
        return init_cache_state(
            self.cache_config,
            num_layers=cfg.num_layers,
            batch=batch_size,
            n_head=cfg.n_head,
            max_len=cfg.max_len,
            head_dim=cfg.head_dim,
            d_model=cfg.d_model,
            n_channels=cfg.n_channels,
            kv_dtype=cfg._cdtype,
        )

    def sample_prior(self, key: Array, batch_size: int) -> Array:
        return self.noise_scheduler.prior_sampling(
            key, (batch_size, self.max_len, self.n_channels)
        )

    def sample(
        self,
        num_samples: int,
        num_diffusion_steps: Optional[int] = None,
        key: Optional[Array] = None,
    ) -> np.ndarray:
        """Generate ``num_samples`` series.  Matches reference semantics:
        remainder-dropping batch count (sampler.py:127) and cache persistence
        across batches (sampler.py:149-153)."""
        if num_diffusion_steps is None:
            num_diffusion_steps = self.score_model.num_training_steps
        if key is None:
            key = jax.random.PRNGKey(0)

        num_batches = max(1, num_samples // self.sample_batch_size)
        if self.batches_per_call > 1 and num_batches > 1:
            # Every batch is exactly sample_batch_size here (remainder
            # dropped, quirk Q6) — static shapes for the resident scan.
            return self._sample_resident(num_batches, num_diffusion_steps, key)
        all_samples = []
        cache_state: Optional[CacheState] = None

        def cache_batch(state: CacheState) -> int:
            # Batch size of whichever per-batch store this level allocates.
            return state.k.shape[1] if state.k.ndim > 1 else state.eps_hat.shape[0]

        for batch_idx in range(num_batches):
            batch_size = min(
                num_samples - batch_idx * self.sample_batch_size,
                self.sample_batch_size,
            )
            key, k_prior, k_chain = jax.random.split(key, 3)
            x0 = self.sample_prior(k_prior, batch_size)

            if self.use_cache and (
                cache_state is None
                or (self.cache_config.reset_between_batches)
                or cache_batch(cache_state) != batch_size
            ):
                cache_state = self._init_cache(batch_size)
            elif self.use_cache and batch_idx > 0:
                # Cache persists across batches (reference quirk Q5) but is
                # marked cold for the new trajectory (shared with the
                # resident scan so the two paths cannot drift apart).
                cache_state = _prep_cache_for_new_batch(
                    cache_state, None, reset=False
                )

            if self.mesh is not None:
                from fdtpu.dist.mesh import shard_batch

                x0 = shard_batch(self.mesh, x0)
                if cache_state is not None:
                    cache_state = _shard_cache_state(self.mesh, cache_state)

            x, cache_state = sample_chain(
                self.score_model.variables,
                self.noise_scheduler,
                x0,
                k_chain,
                cache_state,
                model_cfg=self.score_model.config,
                cache_cfg=self.cache_config,
                num_steps=num_diffusion_steps,
                use_fresca=self.use_fresca,
                fresca_low_scale=self.fresca_low_scale,
                fresca_high_scale=self.fresca_high_scale,
                fresca_cutoff_ratio=self.fresca_cutoff_ratio,
                fresca_cutoff_strategy=self.fresca_cutoff_strategy,
            )
            all_samples.append(np.asarray(jax.block_until_ready(x)))

        self.last_cache_state = cache_state
        self._check_error_budget()
        return np.concatenate(all_samples, axis=0)

    def _sample_resident(
        self, num_batches: int, num_steps: int, key: Array
    ) -> np.ndarray:
        """Device-resident grouped sampling (``batches_per_call`` > 1): one
        jitted dispatch per group of ``batches_per_call`` full-size batches.
        Sample values match the host loop (same per-batch PRNG sequence and
        cross-batch cache semantics)."""
        batch = self.sample_batch_size
        model_cfg = self.score_model.config
        pp, cache_cfg = _normalize_cache_cfg(
            self.cache_config if self.use_cache else None
        )
        variables = _cast_variables(self.score_model.variables, model_cfg)
        cache_state = self._init_cache(batch)
        x0_sharding = None
        if self.mesh is not None:
            from fdtpu.dist.mesh import data_sharding

            x0_sharding = data_sharding(self.mesh, 3)
            if cache_state is not None:
                cache_state = _shard_cache_state(self.mesh, cache_state)

        all_samples = []
        first = True
        num_groups, tail = divmod(num_batches, self.batches_per_call)
        for _ in range(num_groups):
            xs, key, cache_state = _sample_batches_resident(
                variables,
                self.noise_scheduler,
                key,
                cache_state,
                pp,
                jnp.asarray(self.fresca_low_scale, jnp.float32),
                jnp.asarray(self.fresca_high_scale, jnp.float32),
                model_cfg=model_cfg,
                cache_cfg=cache_cfg,
                num_steps=num_steps,
                num_batches=self.batches_per_call,
                batch_size=batch,
                first_is_fresh=first,
                x0_sharding=x0_sharding,
                use_fresca=self.use_fresca,
                fresca_cutoff_ratio=self.fresca_cutoff_ratio,
                fresca_cutoff_strategy=self.fresca_cutoff_strategy,
            )
            first = False
            xs = np.asarray(jax.block_until_ready(xs))
            all_samples.append(
                xs.reshape(self.batches_per_call * batch, *xs.shape[2:])
            )

        # Remainder (< batches_per_call) runs through the standard
        # per-batch program: a tail-sized resident group would be a SECOND
        # static scan length, i.e. a full T-step recompile (minutes on the
        # remote compiler) to save one or two dispatches.  PRNG sequence
        # and cross-batch cache semantics are the same either way.
        for _ in range(tail):
            key, k_prior, k_chain = jax.random.split(key, 3)
            x0 = self.sample_prior(k_prior, batch)
            if self.use_cache and not first:
                if cache_cfg.reset_between_batches:
                    cache_state = self._init_cache(batch)
                    if self.mesh is not None:
                        cache_state = _shard_cache_state(self.mesh, cache_state)
                else:
                    cache_state = _prep_cache_for_new_batch(
                        cache_state, None, reset=False
                    )
            if self.mesh is not None:
                from fdtpu.dist.mesh import shard_batch

                x0 = shard_batch(self.mesh, x0)
            x, cache_state = _sample_chain(
                variables,
                self.noise_scheduler,
                x0,
                k_chain,
                cache_state,
                pp,
                jnp.asarray(self.fresca_low_scale, x0.dtype),
                jnp.asarray(self.fresca_high_scale, x0.dtype),
                model_cfg=model_cfg,
                cache_cfg=cache_cfg,
                num_steps=num_steps,
                use_fresca=self.use_fresca,
                fresca_cutoff_ratio=self.fresca_cutoff_ratio,
                fresca_cutoff_strategy=self.fresca_cutoff_strategy,
            )
            first = False
            all_samples.append(np.asarray(jax.block_until_ready(x)))

        self.last_cache_state = cache_state
        self._check_error_budget()
        return np.concatenate(all_samples, axis=0)

    def _check_error_budget(self) -> None:
        """Collapse detector (runs after every cached sample() call).

        The skip budget assumes the accumulated ε̂ drift it predicts tracks
        the realized extrapolation error.  When realized error runs far
        ahead of predicted (budget_overrun_ratio) or is absolutely large
        (realized_err_mean), the operating point is in the
        silent-distribution-collapse regime documented in
        docs/benchmarks/token_level.md (τ₀=3 → SW 88.8, R=50 → SW 492):
        warn by default, raise under guard="strict".
        """
        cfg = self.cache_config
        if (
            cfg is None
            or cfg.guard == "off"
            or self.last_cache_state is None
        ):
            return
        stats = self.get_cache_stats()
        if not stats.get("guard_measurements"):
            return
        overrun = stats["budget_overrun_ratio"]
        realized = stats["realized_err_mean"]
        worst = stats["realized_err_max"]
        if (
            overrun <= cfg.guard_overrun_tol
            and realized <= cfg.resolved_guard_abs_tol
            and worst <= cfg.guard_max_tol
        ):
            return
        msg = (
            "E2-CRF error-budget guard: realized extrapolation error "
            f"(mean {realized:.3f}, worst span {worst:.3f} over "
            f"{stats['guard_measurements']} refreshes, "
            f"{overrun:.1f}x the predicted budget) is in the "
            f"distribution-collapse regime (tolerances: mean "
            f"{cfg.resolved_guard_abs_tol}, max {cfg.guard_max_tol}, overrun "
            f"{cfg.guard_overrun_tol}; calibration in "
            "docs/benchmarks/guard_demo_v2.json). Lower tau_0 and/or R, "
            "or set cache_kwargs={'auto_calibrate': True} to tighten the "
            "budget automatically. Set guard='off' to silence. "
            "Token-level configs: set random_probe_ratio > 0 so stale "
            "tokens are audited (collapse there is otherwise silent)."
        )
        if cfg.guard == "strict":
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, stacklevel=2)

    def get_cache_stats(self) -> dict[str, Any]:
        from fdtpu.cache.e2crf import cache_stats

        if self.last_cache_state is None:
            return {}
        return cache_stats(self.last_cache_state)
