"""E²-CRF: error-feedback event-driven caching, compiled into the sampler.

TPU-native redesign of the reference caching subsystem
(`/root/reference/src/fdiff/utils/caching.py:19-653`,
`models/cached_transformer.py:28-329`).  The torch implementation is a
mutable Python object holding dict/tensor KV stores and `set[int]` recompute
sets, driven step-by-step from an eager loop.  Here the entire cache is an
immutable pytree carried through `lax.scan`; every decision is a traced
computation on device, and the expensive branches are selected by
`lax.switch`/`lax.cond` so skipped work is *actually skipped* at runtime.

Two caching levels (config ``level``):

* ``"kv"`` — per-token KV reuse inside each transformer layer (the reference
  mechanism).  Pure-cache steps project only Q and reuse K/V, mixed steps
  refresh a masked token subset, full steps rebuild everything.
* ``"score"`` — full-step score reuse: cached steps skip the score network
  entirely, reconstructing the score from the cached noise prediction
  ``ε̂`` rescaled by the current marginal std (score(t) = −ε̂ / std(t)).
  This is the BASELINE.json north star — `lax.cond`-gated so skipped steps
  cost O(elementwise) instead of a transformer forward.
* ``"token"`` — per-token E²-CRF with a **static top-k budget**: each step
  either runs the full network (error-feedback refresh, every R steps),
  recomputes only the ``token_budget`` highest-drift tokens end-to-end
  (gather → project/attend/FFN on the dense (B, k, D) block → scatter into
  the cached K/V and per-token ε̂ rows), or skips the network entirely when
  the accumulated drift budget allows.  This is the mechanism the reference
  paper describes (−50% KV proj / −45% MLP / −30% attention) made fast on
  TPU: the masked MODE_MIXED formulation computes everything and selects
  (zero FLOP savings), the top-k gather/scatter formulation skips real
  FLOPs at static shapes.  Per-token ε̂ rows are cached in noise space and
  rescaled by the current marginal std at use, so stale rows remain
  correctly scaled across diffusion time.

Recompute policies (config ``policy``):

* ``"macro"`` — bit-exact parity with the reference's live behavior
  (caching.py:153-181): step 0 full; every ``interval`` steps refresh the
  first 2K tokens (interval = 500 when R < 100, else R); otherwise pure
  cache.
* ``"event"`` — the *documented* event-driven policy (reference README
  E²-CRF description and paper Algorithm 1, which the reference never wired
  up — SURVEY.md quirk Q1): per-token CRF drift × spectral-energy weighting
  thresholded at τ₀, plus K always-recomputed low-frequency tokens, plus a
  random probe fraction (quirk Q4: the README documents
  ``random_probe_ratio`` but the reference constructor rejects it),
  plus R-periodic full error-feedback refresh.  At the score level the same
  machinery becomes an error-feedback accumulator: each full step measures
  the ε̂ drift rate, and skipping continues until the accumulated predicted
  drift crosses τ₀ (or the hard interval R expires).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from fdtpu.models.transformer import MODE_CACHED, MODE_FULL, MODE_MIXED

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class E2CRFConfig:
    """Static cache configuration (hashable; jit static arg).

    Field names/defaults mirror the reference ``E2CRFCache.__init__``
    (caching.py:28-47) plus the documented-but-missing ``random_probe_ratio``.
    """

    K: int = 5
    R: int = 10
    tau_0: float = 0.1
    tau_warn: float = 0.5
    policy: str = "event"  # "event" | "macro"
    # Default level is "score": full-step skipping is the mode that actually
    # beats the uncached baseline on TPU.  "kv" (the reference's mechanism)
    # is kept for parity but is a measured slowdown at d_model=72 — a
    # "skipped" KV step still runs Q, attention and the full FFN
    # (docs/benchmarks/README.md), so only pick it for parity studies.
    level: str = "score"  # "score" | "token" | "kv"
    # Static recompute budget for level="token": the number of tokens
    # recomputed end-to-end on a TOPK step.  Compile-time constant (shapes
    # the gathered block); must be ≥1 and ≤ max_len for the token level.
    token_budget: int = 0
    # Score-level skip predictor order: 0 = freeze the last ε̂ (pure reuse),
    # 1 = linear extrapolation from the last two full computations — the
    # FreqCa trajectory-prediction idea applied at the noise-prediction
    # level, which cuts the per-step drift and allows deeper skipping at the
    # same error budget.  2 = quadratic (three-point Newton) — higher
    # fidelity at matched τ but its curvature term amplifies over long
    # skips, so 1 remains the best skip-rate/quality frontier and default.
    eps_order: int = 1
    # Fraction of tokens force-refreshed at random on TOPK steps (rides the
    # same token_budget, so it is free — it only reorders the top-k
    # priority).  Guard calibration v2 (guard_demo_v2.json) showed
    # token-level cumulative collapse is structurally invisible without
    # auditing rows the top-k never selects, so the TOKEN level defaults to
    # a small probe.  -1.0 = auto: 0.02 at level="token", 0.0 otherwise.
    # An explicit 0.0 at the token level disables probing and warns at
    # sampler construction unless guard="off".
    random_probe_ratio: float = -1.0
    # Ablation switch: weight per-token CRF drift by spectral energy
    # (paper's energy weighting; reference ablation "no_energy_weighting").
    energy_weighting: bool = True
    # FreqCa (frequency-aware CRF prediction)
    use_freqca: bool = False
    freq_decomp: str = "dct"
    low_freq_ratio: float = 0.3
    max_history: int = 10
    hermite_order: int = 3
    freq_decomp_interval: int = 10
    # Score-level ε̂ predictor for skipped steps: "taylor" (order-``eps_order``
    # extrapolation from the last 2-3 full computations) or "freqca" (the
    # FreqCa mechanism applied at the ε̂ level, reference caching.py:561-597:
    # freeze the low-frequency component at the last refresh, Hermite-
    # extrapolate the high-frequency component over a ring of the last
    # ``max_history`` refreshes at order ``hermite_order``).  The reference
    # never calls its predictor from a live path (quirk Q1); here it is a
    # measurable ablation arm (cli/ablation_cache.py freqca_predictor).
    eps_predictor: str = "taylor"
    # Reference behavior: cache persists across sample batches (quirk Q5).
    reset_between_batches: bool = False
    # ---- Error-budget guard rail (score/token levels) -------------------
    # The skip budget assumes accumulated ε̂ drift grows linearly at the
    # measured per-step rate.  When extrapolation leaves that regime (long
    # skip spans at a loose τ₀ / large R), realized error explodes while the
    # predicted budget stays ≈ τ₀ — silent distribution collapse
    # (docs/benchmarks/token_level.md: τ₀=3 hybrid → SW 88.8; pure-periodic
    # R=50 → SW 492).  Every full refresh therefore measures the REALIZED
    # relative extrapolation error over the span it just closed and compares
    # it with the predicted budget.  ``guard`` controls the post-sample
    # response: "warn" (default) emits a warning, "strict" raises,
    # "off" disables.  Flagged when the WORST span exceeds
    # ``guard_max_tol``, the MEAN realized error exceeds ``guard_abs_tol``,
    # or realized/predicted exceeds ``guard_overrun_tol``.  Thresholds are
    # calibrated across THREE independently trained flagships × T ∈
    # {500, 1000} (docs/benchmarks/guard_demo_v2.json), with ground truth
    # per run (model quality varies 4× across training seeds, so "bad" is
    # SW > 2× that model's own noise floor): score-level collapse spikes
    # the worst span (≥4.2 when quality is >2× floor; safe arms ≤2.3).
    # The per-span MEAN tracks model smoothness, not collapse (weaker
    # seeds run mean 1.6–2.1 at within-floor operating points), so it is
    # only a loose backstop.  ε̂-norm statistics (peak / unit-scale /
    # cold-relative growth, exposed in cache_stats) were measured and
    # REJECTED as detectors: LayerNorm bounds the score net's output so
    # collapse inflates ε̂ only mildly, and weak models legitimately grow
    # 1.6–2.0× — total overlap.  Token-level cumulative collapse is only
    # observable if the policy AUDITS stale tokens: ``random_probe_ratio``
    # > 0 (free — probes ride the same token_budget) makes TOPK refreshes
    # measure genuinely stale rows, and therefore DEFAULTS to 0.02 at the
    # token level (see ``random_probe_ratio`` above).
    guard: str = "warn"  # "warn" | "strict" | "off"
    guard_overrun_tol: float = 5.0
    # 0.0 = auto: 2.5 at score/kv level (weak models run per-span means up
    # to ~2.1 on within-floor operating points), 1.5 at token level (the
    # TOPK audit's per-measurement MEDIAN keeps safe arms ≤0.85 while
    # collapse reads ≥2.0 — guard_demo_v2.json probed arms).
    guard_abs_tol: float = 0.0
    guard_max_tol: float = 4.0

    @property
    def resolved_random_probe_ratio(self) -> float:
        if self.random_probe_ratio >= 0.0:
            return self.random_probe_ratio
        return 0.02 if self.level == "token" else 0.0

    @property
    def resolved_guard_abs_tol(self) -> float:
        if self.guard_abs_tol:
            return self.guard_abs_tol
        return 1.5 if self.level == "token" else 2.5
    # Closed-loop τ₀ auto-calibration: scale the effective skip budget by
    # the high-water mark of the realized/predicted overrun, so a
    # collapsing configuration tightens itself (from the second sample
    # batch on — the collapse signature lands late in a trajectory).
    auto_calibrate: bool = False

    @property
    def macro_interval(self) -> int:
        """Reference auto-scaling: R < 100 → 500 (caching.py:164-167)."""
        return 500 if self.R < 100 else self.R

    def policy_params(self) -> "PolicyParams":
        """Traced numeric knobs — swept values don't recompile the sampler."""
        return PolicyParams(
            K=jnp.asarray(self.K, jnp.int32),
            R=jnp.asarray(self.R, jnp.int32),
            tau_0=jnp.asarray(self.tau_0, jnp.float32),
            tau_warn=jnp.asarray(self.tau_warn, jnp.float32),
            random_probe_ratio=jnp.asarray(
                self.resolved_random_probe_ratio, jnp.float32
            ),
            guard_abs_tol=jnp.asarray(self.resolved_guard_abs_tol, jnp.float32),
        )

    def static_key(self) -> tuple:
        """The structural fields that legitimately shape the compiled program."""
        return (
            self.policy,
            self.level,
            self.token_budget,
            self.eps_order,
            self.use_freqca,
            self.freq_decomp,
            self.low_freq_ratio,
            self.max_history,
            self.hermite_order,
            self.freq_decomp_interval,
            self.energy_weighting,
            self.auto_calibrate,
            self.eps_predictor,
        )


class PolicyParams(struct.PyTreeNode):
    """Numeric cache-policy knobs, traced through the compiled sampler."""

    K: Array
    R: Array
    tau_0: Array
    tau_warn: Array
    random_probe_ratio: Array
    guard_abs_tol: Array


class CacheState(struct.PyTreeNode):
    """Pytree carried through the sampling scan."""

    # Per-layer, per-batch KV store (fixes reference quirk Q3):
    k: Array  # (num_layers, B, T, H, Dh)
    v: Array  # (num_layers, B, T, H, Dh)
    # Cumulative residual features of the previous step (batch element 0,
    # matching reference score_models.py:183-190):
    crf_prev: Array  # (num_layers, T, d_model)
    # Per-token drift signal (event policy input).  KV level: CRF drift
    # measured at the last step.  Token level: per-token relative ε̂
    # extrapolation-residual rate measured at the token's last recompute.
    delta_tok: Array  # (T,)
    # Token level only: per-token extrapolation bookkeeping.
    gap_tok: Array  # (T,) steps between the last two recomputes of each token
    last_tok: Array  # (T,) int32 step of each token's last recompute
    # Score-level cache: last fully-computed noise prediction and drift rate.
    eps_hat: Array  # (B, T, C)
    eps_prev: Array  # (B, T, C) — the full computation before eps_hat
    eps_prev2: Array  # (B, T, C) — the one before eps_prev (order-2 predictor)
    eps_gap: Array  # () steps between eps_prev and eps_hat (extrapolation dt)
    eps_gap2: Array  # () steps between eps_prev2 and eps_prev
    drift_rate: Array  # () per-step relative ε̂ drift measured at last refresh
    err_acc: Array  # () accumulated predicted drift since last refresh
    last_full_step: Array  # () int32
    # Cold start: no valid ε̂ yet (fresh cache or a new trajectory after a
    # batch boundary) — the next step must run the network and must not
    # measure drift against stale cross-trajectory state.
    cold: Array  # () bool
    # FreqCa state: ring buffer of high-frequency CRF history + timesteps.
    crf_low: Array  # (num_layers, T, d_model)
    crf_high_hist: Array  # (max_history, num_layers, T, d_model)
    crf_t_hist: Array  # (max_history,)
    hist_len: Array  # () int32
    # Step counter (global across batches, reference sampler.py:130).
    step: Array  # () int32
    # Statistics (reference caching.py:107-111, 599-653).
    recompute_count: Array  # () int32 — tokens recomputed (KV writes)
    cache_hit_count: Array  # () int32 — tokens served from cache
    full_steps: Array  # () int32
    mixed_steps: Array  # () int32
    cached_steps: Array  # () int32 — pure-cache / skipped steps
    # Error-budget guard telemetry (score/token levels): realized vs
    # predicted relative extrapolation error per closed skip span, measured
    # at each full refresh that followed ≥1 skipped/partial step.
    realized_err_sum: Array  # () float
    predicted_err_sum: Array  # () float
    realized_err_max: Array  # () float
    guard_measurements: Array  # () int32
    # EMA of realized/predicted, drives τ₀ auto-calibration (init 1.0).
    overrun: Array  # () float
    # Running high-water mark of the refresh-time ε̂ norm — the trajectory's
    # noise scale.  Denominators of relative-error statistics are floored at
    # GUARD_NORM_FLOOR_FRAC × this: at the end of a trajectory ‖ε̂‖ collapses
    # (0.61 vs the 154 trajectory scale at T=1000 on the trained flagship,
    # scripts/diagnose_guard.py), so an unfloored ratio turns an 8%-of-scale
    # absolute error into a 20× spike whose size depends on which exact step
    # the final refresh lands on — ±2 steps of cross-compile fusion jitter
    # moved it 3.1 → 20.5 between identical-seed runs (BENCH_r03 guard
    # firing).  Scalar at score level, per-token (T,) at token level.
    eps_norm_ref: Array
    # The COLD refresh's ε̂ norm (t=1, x = pure prior noise) — each
    # model's own baseline scale, so growth = ref/cold is comparable
    # across models of different quality (same shape as eps_norm_ref).
    eps_norm_cold: Array


def init_cache_state(
    cfg: E2CRFConfig,
    num_layers: int,
    batch: int,
    n_head: int,
    max_len: int,
    head_dim: int,
    d_model: int,
    n_channels: int,
    dtype=jnp.float32,
    kv_dtype=None,
) -> CacheState:
    """Allocate only the state the configured level/options actually use —
    unused fields get zero-size placeholders so the scan carry stays lean
    (the KV store alone is tens of MB at flagship batch sizes).

    ``kv_dtype`` (default = dtype) controls the KV/CRF store precision and
    should match the model's compute dtype."""
    if kv_dtype is None:
        kv_dtype = dtype
    zero = jnp.zeros((), jnp.int32)
    kv_shape = (
        (num_layers, batch, max_len, n_head, head_dim)
        if cfg.level in ("kv", "token")
        else (0,)
    )
    crf_shape = (num_layers, max_len, d_model) if cfg.level == "kv" else (0,)
    eps_shape = (
        (batch, max_len, n_channels) if cfg.level in ("score", "token") else (0,)
    )
    eps2_shape = (batch, max_len, n_channels) if cfg.level == "score" else (0,)
    tok_shape = (max_len,) if cfg.level == "token" else (0,)
    # History ring: the kv level stores CRF features (use_freqca), the score
    # level stores ε̂ itself (eps_predictor="freqca") — levels are exclusive
    # so the crf_low/crf_high_hist/crf_t_hist fields are reused for both.
    if cfg.use_freqca and cfg.level == "kv":
        hist_shape = (cfg.max_history, num_layers, max_len, d_model)
    elif cfg.level == "score" and cfg.eps_predictor == "freqca":
        hist_shape = (cfg.max_history, batch, max_len, n_channels)
    else:
        hist_shape = (0,)
    has_hist = len(hist_shape) > 1
    return CacheState(
        k=jnp.zeros(kv_shape, kv_dtype),
        v=jnp.zeros(kv_shape, kv_dtype),
        crf_prev=jnp.zeros(crf_shape, kv_dtype),
        delta_tok=jnp.zeros((max_len,), dtype),
        gap_tok=jnp.zeros(tok_shape, dtype),
        last_tok=jnp.zeros(tok_shape, jnp.int32),
        eps_hat=jnp.zeros(eps_shape, dtype),
        eps_prev=jnp.zeros(eps_shape, dtype),
        eps_prev2=jnp.zeros(eps2_shape, dtype),
        eps_gap=jnp.zeros((), dtype),
        eps_gap2=jnp.zeros((), dtype),
        drift_rate=jnp.zeros((), dtype),
        err_acc=jnp.zeros((), dtype),
        last_full_step=zero,
        cold=jnp.ones((), bool),
        crf_low=jnp.zeros(
            hist_shape[1:] if has_hist else (0,),
            kv_dtype if cfg.level == "kv" else dtype,
        ),
        crf_high_hist=jnp.zeros(
            hist_shape, kv_dtype if cfg.level == "kv" else dtype
        ),
        crf_t_hist=jnp.zeros((cfg.max_history,) if has_hist else (0,), dtype),
        hist_len=zero,
        step=zero,
        recompute_count=zero,
        cache_hit_count=zero,
        full_steps=zero,
        mixed_steps=zero,
        cached_steps=zero,
        realized_err_sum=jnp.zeros((), dtype),
        predicted_err_sum=jnp.zeros((), dtype),
        realized_err_max=jnp.zeros((), dtype),
        guard_measurements=zero,
        overrun=jnp.ones((), dtype),
        eps_norm_ref=jnp.zeros(
            (max_len,) if cfg.level == "token" else (), dtype
        ),
        eps_norm_cold=jnp.zeros(
            (max_len,) if cfg.level == "token" else (), dtype
        ),
    )


# ----------------------------------------------------------------- policies
def macro_policy(
    pp: PolicyParams, state: CacheState, max_len: int
) -> tuple[Array, Array]:
    """Reference live policy (caching.py:153-181).

    Returns (mode, recompute_mask (T,) bool): step 0 → FULL; every
    ``macro_interval`` steps → MIXED over the first min(2K, T) tokens;
    otherwise → CACHED (empty mask).
    """
    step = state.step
    idx = jnp.arange(max_len)
    k_tokens = jnp.minimum(pp.K, max_len)
    refresh_count = jnp.minimum(2 * k_tokens, max_len)
    interval = jnp.where(pp.R < 100, 500, pp.R)

    is_first = step == 0
    is_refresh = (step % interval) == 0

    mode = jnp.where(
        is_first, MODE_FULL, jnp.where(is_refresh, MODE_MIXED, MODE_CACHED)
    ).astype(jnp.int32)
    mask = jnp.where(
        is_first,
        jnp.ones((max_len,), bool),
        jnp.where(is_refresh, idx < refresh_count, jnp.zeros((max_len,), bool)),
    )
    return mode, mask


def event_policy(
    cfg: E2CRFConfig,
    pp: PolicyParams,
    state: CacheState,
    x: Array,
    key: Array,
) -> tuple[Array, Array]:
    """Documented event-driven policy (README E²-CRF / paper Eq. 14-18).

    Token trigger: energy-weighted CRF drift > τ₀, ∪ K lowest-frequency
    tokens, ∪ random probe fraction.  Full refresh at step 0 and every R
    steps (error feedback), or when the mean drift exceeds τ_warn.
    """
    max_len = x.shape[1]
    idx = jnp.arange(max_len)
    step = state.step

    # Spectral-energy weighting: token energy share of the current state.
    if cfg.energy_weighting:
        energy = jnp.mean(x**2, axis=(0, 2))  # (T,)
        energy_w = energy / (jnp.mean(energy) + 1e-8)
    else:
        energy_w = jnp.ones((max_len,), x.dtype)

    weighted_drift = state.delta_tok * energy_w
    trigger = weighted_drift > pp.tau_0
    low = idx < jnp.minimum(pp.K, max_len)
    probe = jax.random.uniform(key, (max_len,)) < pp.random_probe_ratio
    mask = trigger | low | probe

    is_first = step == 0
    is_refresh = (step - state.last_full_step) >= pp.R
    is_warn = jnp.mean(state.delta_tok) > pp.tau_warn
    full = is_first | is_refresh | is_warn

    any_token = jnp.any(mask)
    mode = jnp.where(
        full, MODE_FULL, jnp.where(any_token, MODE_MIXED, MODE_CACHED)
    ).astype(jnp.int32)
    mask = jnp.where(full, jnp.ones((max_len,), bool), mask)
    return mode, mask


def effective_tau(cfg: E2CRFConfig, pp: PolicyParams, state: CacheState) -> Array:
    """Skip budget, optionally tightened by the realized/predicted overrun.

    With ``auto_calibrate`` the budget is τ₀ / max(1, overrun mark): a
    configuration whose extrapolation under-predicts its realized error
    (the silent-collapse regime) automatically earns a smaller budget and
    refreshes more often.  Well-calibrated configurations (overrun ≤ 1)
    are untouched.
    """
    if not cfg.auto_calibrate:
        return pp.tau_0
    return pp.tau_0 / jnp.maximum(1.0, state.overrun)


def score_skip_decision(
    cfg: E2CRFConfig, pp: PolicyParams, state: CacheState
) -> Array:
    """Score-level skip gate: True → run the network this step.

    Error feedback: skip while the accumulated predicted ε̂ drift stays
    under τ₀ and the hard interval R has not expired.
    """
    step = state.step
    # Calibration: right after a cold start the drift rate is unknown (0) —
    # run one extra full step to measure it before trusting the skip budget.
    is_calibration = ((step - state.last_full_step) == 1) & (state.drift_rate == 0)
    interval_expired = (step - state.last_full_step) >= pp.R
    budget_exceeded = state.err_acc >= effective_tau(cfg, pp, state)
    return state.cold | is_calibration | interval_expired | budget_exceeded


TOKEN_FULL = 0
TOKEN_TOPK = 1
TOKEN_SKIP = 2


def token_policy(
    cfg: E2CRFConfig, pp: PolicyParams, state: CacheState, x: Array
) -> tuple[Array, Array, Array]:
    """Step-mode decision for the token level.

    Returns ``(mode, weighted_drift (T,), mean_drift ())`` with mode ∈
    {TOKEN_FULL, TOKEN_TOPK, TOKEN_SKIP}:

    * FULL — error-feedback refresh: cold start, the calibration step right
      after it (per-token drift rates unknown), or the hard interval R
      expired (reference README error-feedback description, paper Eq. 17).
    * SKIP — the state-derived error budget stays under τ₀: reuse every
      token's extrapolated ε̂ and skip the network entirely.  The budget is
      ``mean(drift_rate × age × energy_w)`` — each token's predicted
      accumulated extrapolation error since ITS last recompute — so a TOPK
      step actively drains it (recomputed tokens reset to age 0), and long
      skip-heavy stretches need only cheap TOPK refreshes rather than full
      network passes.
    * TOPK — otherwise: recompute the ``token_budget`` highest-priority
      tokens (energy-weighted accumulated error, K low-frequency anchors,
      random probes).
    """
    max_len = x.shape[1]
    if cfg.energy_weighting:
        energy = jnp.mean(
            x.astype(jnp.float32) ** 2, axis=tuple(i for i in range(x.ndim) if i != 1)
        )  # (T,)
        energy_w = energy / (jnp.mean(energy) + 1e-8)
    else:
        energy_w = jnp.ones((max_len,), jnp.float32)

    w_drift = state.delta_tok.astype(jnp.float32) * energy_w
    mean_drift = jnp.mean(w_drift)
    # Predicted accumulated error if we skip this step: each token's rate ×
    # (its age + 1), energy-weighted.
    age_next = (state.step - state.last_tok + 1).astype(jnp.float32)
    predicted_err = jnp.mean(w_drift * age_next)

    since_full = state.step - state.last_full_step
    is_calibration = (since_full == 1) & (jnp.sum(state.delta_tok) == 0)
    full = state.cold | is_calibration | (since_full >= pp.R)
    skip = (~full) & (predicted_err <= effective_tau(cfg, pp, state))
    mode = jnp.where(
        full, TOKEN_FULL, jnp.where(skip, TOKEN_SKIP, TOKEN_TOPK)
    ).astype(jnp.int32)
    return mode, w_drift, mean_drift


# Per-measurement floor on the predicted budget when forming the overrun
# ratio: spans whose realized error is below ~this are too small to collapse
# anything, so tiny predicted values must not inflate the ratio.
GUARD_PREDICTED_FLOOR = 0.05

# Relative-error denominators are floored at this fraction of the
# trajectory-scale ε̂ norm (CacheState.eps_norm_ref).  Mechanism + evidence
# in the eps_norm_ref field doc: end-of-trajectory ‖ε̂‖ shrinkage otherwise
# turns sub-scale absolute errors into unbounded ratios whose magnitude is a
# function of refresh phase, not of sample quality.
GUARD_NORM_FLOOR_FRAC = 0.1


def guard_relative_error(delta_norm: Array, eps_norm: Array,
                         norm_ref: Array) -> Array:
    """Extrapolation error relative to ``max(‖ε̂‖, 10% of trajectory scale)``.

    Used for BOTH the skip budget's drift rate and the guard's realized
    error, so predicted and realized stay in the same units."""
    return delta_norm / jnp.maximum(
        eps_norm, GUARD_NORM_FLOOR_FRAC * norm_ref
    )


def record_guard_measurement(
    state: CacheState,
    measured: Array,
    realized: Array,
    predicted: Array,
    abs_target: Array,
) -> CacheState:
    """Fold one closed skip span's realized-vs-predicted error into the
    guard telemetry (no-op where ``measured`` is False).

    ``realized`` = relative ε̂ extrapolation error over the span just closed
    by a full refresh; ``predicted`` = the error budget the skip decisions
    had accumulated for that span (err_acc at refresh time);
    ``abs_target`` = the absolute per-span error the configuration deems
    acceptable (``guard_abs_tol``, traced).

    The overrun state that drives τ₀ auto-calibration is a monotone
    HIGH-WATER MARK of the per-measurement miscalibration factor — the
    worse of realized/predicted (extrapolation-divergence failure mode)
    and realized/abs_target (budget-too-loose failure mode), clipped to
    [0, 10].  Monotone because the collapse signature is often a single
    late-trajectory span (guard_demo.json): a decaying average forgets it
    before the next batch, while the mark persists across batches (quirk
    Q5 cache persistence) so subsequent trajectories run under the
    tightened budget.  Construct a fresh sampler to reset it.
    """
    dt = state.realized_err_sum.dtype
    m = measured.astype(dt)
    ratio = realized / jnp.maximum(predicted, GUARD_PREDICTED_FLOOR)
    miscal = jnp.clip(
        jnp.maximum(ratio, realized / jnp.maximum(abs_target, 1e-3)), 0.0, 10.0
    ).astype(dt)
    return state.replace(
        realized_err_sum=state.realized_err_sum + m * realized.astype(dt),
        predicted_err_sum=state.predicted_err_sum + m * predicted.astype(dt),
        realized_err_max=jnp.maximum(
            state.realized_err_max, m * realized.astype(dt)
        ),
        guard_measurements=state.guard_measurements + measured.astype(jnp.int32),
        overrun=jnp.where(
            measured, jnp.maximum(state.overrun, miscal), state.overrun
        ),
    )


# ----------------------------------------------------------------- updates
def update_after_forward(
    cfg: E2CRFConfig,
    state: CacheState,
    mode: Array,
    mask: Array,
    kv_new: tuple[Array, Array],
    crf: Array,
    timestep: Array,
) -> CacheState:
    """Post-forward bookkeeping shared by the KV-level branches.

    Maintains the CRF drift signal, KV store, statistics, and (optionally)
    the FreqCa low/high decomposition history (reference update_crf,
    caching.py:459-522).
    """
    max_len = mask.shape[0]
    is_full = mode == MODE_FULL
    is_mixed = mode == MODE_MIXED
    is_cached = mode == MODE_CACHED

    # Per-token CRF drift (mean |Δ| over layers and features, L2 over d).
    delta = jnp.linalg.norm(
        (crf - state.crf_prev).astype(state.delta_tok.dtype), axis=-1
    )  # (L_layers, T)
    delta_tok = jnp.mean(delta, axis=0)  # (T,)

    n_recomputed = jnp.where(
        is_full, max_len, jnp.where(is_mixed, jnp.sum(mask), 0)
    ).astype(jnp.int32)
    n_hits = (max_len - n_recomputed).astype(jnp.int32)

    new_state = state.replace(
        k=kv_new[0],
        v=kv_new[1],
        crf_prev=crf,
        delta_tok=delta_tok,
        last_full_step=jnp.where(is_full, state.step, state.last_full_step),
        recompute_count=state.recompute_count + n_recomputed,
        cache_hit_count=state.cache_hit_count + n_hits,
        full_steps=state.full_steps + is_full.astype(jnp.int32),
        mixed_steps=state.mixed_steps + is_mixed.astype(jnp.int32),
        cached_steps=state.cached_steps + is_cached.astype(jnp.int32),
    )

    if cfg.use_freqca:
        from fdtpu.ops.fourier import frequency_decompose_fft

        should = (state.step % cfg.freq_decomp_interval) == 0
        crf_low, crf_high = frequency_decompose_fft(
            crf.reshape(-1, crf.shape[-2], crf.shape[-1]), cfg.low_freq_ratio
        )
        crf_low = crf_low.reshape(crf.shape)
        crf_high = crf_high.reshape(crf.shape)
        # Ring-buffer append (shift-left when full).
        hist = jnp.where(
            should,
            jnp.concatenate([state.crf_high_hist[1:], crf_high[None]], axis=0),
            state.crf_high_hist,
        )
        t_hist = jnp.where(
            should,
            jnp.concatenate([state.crf_t_hist[1:], timestep[None]]),
            state.crf_t_hist,
        )
        new_state = new_state.replace(
            crf_low=jnp.where(should, crf_low, state.crf_low),
            crf_high_hist=hist,
            crf_t_hist=t_hist,
            hist_len=jnp.minimum(
                state.hist_len + should.astype(jnp.int32), cfg.max_history
            ),
        )

    return new_state


def compute_event_intensity(cfg: E2CRFConfig, state: CacheState, crf: Array) -> Array:
    """Mean CRF-delta energy normalized by τ₀, capped at 1
    (reference caching.py:524-559)."""
    delta = jnp.linalg.norm(crf - state.crf_prev, axis=-1)
    avg_energy = jnp.mean(delta)
    return jnp.minimum(1.0, avg_energy / cfg.tau_0)


def predict_crf_freqca(cfg: E2CRFConfig, state: CacheState, t_val: Array) -> Array:
    """FreqCa prediction: cached low-frequency CRF + Hermite-extrapolated
    high-frequency component (reference caching.py:561-597)."""
    from fdtpu.ops.fourier import predict_hermite

    # The shift-left ring keeps its newest entry last: only the trailing
    # ``hist_len`` rows are live observations.
    k = state.crf_high_hist.shape[0]
    valid = jnp.arange(k) >= (k - state.hist_len)
    crf_high_pred = predict_hermite(
        state.crf_high_hist, state.crf_t_hist, t_val, cfg.hermite_order,
        valid=valid,
    )
    pred = state.crf_low + crf_high_pred
    # Not enough history → fall back to the previous CRF.
    return jnp.where(state.hist_len >= 2, pred, state.crf_prev)


def cache_stats(state: CacheState) -> dict[str, Any]:
    """Summary statistics (reference get_cache_stats, caching.py:599-653)."""
    recompute = int(state.recompute_count)
    hits = int(state.cache_hit_count)
    total = recompute + hits
    total_steps = int(state.full_steps) + int(state.mixed_steps) + int(
        state.cached_steps
    )
    n_guard = int(state.guard_measurements)
    realized_sum = float(state.realized_err_sum)
    predicted_sum = float(state.predicted_err_sum)
    return {
        "cache_hit_ratio": hits / total if total else 0.0,
        "recompute_count": recompute,
        "cache_hit_count": hits,
        "current_step": int(state.step),
        "full_steps": int(state.full_steps),
        "mixed_steps": int(state.mixed_steps),
        "cached_steps": int(state.cached_steps),
        "steps_skipped_ratio": (
            int(state.cached_steps) / total_steps if total_steps else 0.0
        ),
        # Error-budget guard telemetry (score/token levels; zero elsewhere).
        "guard_measurements": n_guard,
        "realized_err_mean": realized_sum / n_guard if n_guard else 0.0,
        "predicted_err_mean": predicted_sum / n_guard if n_guard else 0.0,
        "realized_err_max": float(state.realized_err_max),
        "budget_overrun_ratio": (
            realized_sum / max(predicted_sum, n_guard * GUARD_PREDICTED_FLOOR)
            if n_guard
            else 0.0
        ),
        "overrun_mark": float(state.overrun),
        # High-water mark of the refresh-time ε̂ norm (max over tokens at
        # the token level).  ε̂ predicts ~unit noise, so a healthy
        # trajectory's peak sits near √(norm numel) and the normalized
        # scale near 1; a trajectory drifting off-manifold (cumulative
        # extrapolation bias — the collapse mode invisible to per-span
        # telemetry) inflates it.
        "eps_norm_peak": float(jnp.max(state.eps_norm_ref)),
        "eps_norm_scale": _eps_norm_scale(state),
        # Peak growth over each model's OWN cold-refresh baseline (t=1,
        # pure prior noise): comparable across models of different quality
        # where the absolute scale is not.
        "eps_norm_growth": float(
            jnp.max(
                jnp.where(
                    state.eps_norm_cold > 0,
                    state.eps_norm_ref / jnp.maximum(state.eps_norm_cold, 1e-6),
                    0.0,
                )
            )
        )
        if state.eps_norm_cold.size
        else 0.0,
    }


def _eps_norm_scale(state: CacheState) -> float:
    """Peak refresh-time ε̂ norm relative to the unit-noise expectation.

    Score level norms over the whole (B, T, C) tensor; token level norms
    per token over (B, C) — the expectation is √(numel of whatever was
    normed)."""
    peak = float(jnp.max(state.eps_norm_ref))
    if state.eps_hat.size == 0 or peak == 0.0:
        return 0.0
    numel = state.eps_hat.size
    if state.eps_norm_ref.ndim == 1:  # token level: per-token over (B, C)
        numel = numel // state.eps_norm_ref.shape[0]
    return peak / float(numel) ** 0.5
