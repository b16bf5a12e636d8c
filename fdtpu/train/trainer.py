"""Training loop: jitted data-parallel train step, checkpoints, run dirs.

Replaces the reference's PyTorch Lightning `Trainer` usage
(`/root/reference/cmd/train.py:59-63`, conf/trainer/default.yaml) with a thin
TPU-first loop:

* one jitted ``train_step`` (loss → grad → AdamW update) whose batch axis is
  sharded over the device-mesh ``data`` axis — XLA inserts the gradient
  all-reduce over ICI (the reference has no data parallelism at all,
  SURVEY.md §2.3);
* per-epoch validation (val/loss, same DSM loss in eval mode);
* best-checkpoint tracking on val/loss with Lightning-style filenames
  (``epoch=N-val_loss=X.ckpt``, conf/trainer/callbacks/default.yaml:2-6),
  stored via Orbax;
* run directory with a config snapshot (``train_config.yaml``) and a JSONL
  metrics log — the functional analog of lightning_logs/<run_id>/.
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import Any, Optional

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from fdtpu.data.datamodules import Datamodule
from fdtpu.diffusion.losses import sde_loss
from fdtpu.dist.mesh import (
    create_mesh,
    data_sharding,
    pad_to_multiple,
    shard_params,
)
from fdtpu.models.score_models import ScoreModel, score_apply
from fdtpu.train.checkpoint import save_checkpoint
from fdtpu.train.state import (
    TrainState,
    init_train_state,
    make_lr_schedule,
    make_optimizer,
)

Array = jax.Array


def get_training_params(datamodule: Datamodule, max_epochs: int, accumulate_grad_batches: int = 1) -> dict[str, Any]:
    """Dataset-derived model kwargs (reference extraction.py:12-17)."""
    params = dict(datamodule.dataset_parameters)
    params["num_training_steps"] = int(
        params["num_training_steps"] * max_epochs / accumulate_grad_batches
    )
    return params


def _group_same_shape(batches: list, cap: int):
    """Yield ``(start, run)`` spans of consecutive same-shape batches,
    ``run <= cap`` — the chunked-dispatch grouping shared by the train
    loop and the val plan (a trailing partial batch ends a span)."""
    i = 0
    while i < len(batches):
        run = 1
        while (
            run < cap
            and i + run < len(batches)
            and batches[i + run].shape == batches[i].shape
        ):
            run += 1
        yield i, run
        i += run


class Trainer:
    def __init__(
        self,
        max_epochs: int = 1,
        gradient_clip_val: float = 1.0,
        run_dir: Path | str = Path.cwd() / "lightning_logs",
        run_id: Optional[str] = None,
        seed: int = 42,
        use_mesh: bool = True,
        mesh: Optional[Any] = None,
        log_every_n_steps: int = 50,
        callbacks: Optional[list] = None,
        accumulate_grad_batches: int = 1,
        resume: bool = False,
        save_resume_state: bool = True,
        steps_per_call: int = 16,
        epochs_per_call: int = 1,
    ) -> None:
        """``accumulate_grad_batches``: micro-batches per optimizer update
        (Lightning semantics — the LR schedule advances once per accumulated
        update; see reference extraction.py:12-17).

        ``resume``: restore the latest mid-training snapshot from
        ``run_dir/resume`` (params + opt_state + PRNG key) and continue the
        interrupted run exactly.  ``save_resume_state``: write that snapshot
        at every epoch end.

        ``mesh``: an explicit `jax.sharding.Mesh` to train over.  The batch
        axis shards over its ``data`` axis; when its ``model`` axis has >1
        device the FFN and attention projections are tensor-parallel
        (fdtpu.dist.mesh.tp_param_spec) with XLA inserting the collectives.
        Default (``use_mesh=True``, ``mesh=None``) builds a data-only mesh
        over all visible devices.

        ``steps_per_call``: optimizer steps executed per jitted dispatch
        (a ``lax.scan`` over stacked batches).  Amortizes per-dispatch
        overhead; 1 restores one dispatch per step.  The training
        trajectory is identical for any value (same per-step PRNG key
        sequence).

        ``epochs_per_call``: >1 switches to the device-resident training
        loop — the train/val splits live in HBM, the per-epoch shuffle is a
        device-side ``jax.random.permutation``, and ``epochs_per_call``
        whole epochs (train + val) run inside ONE jitted ``lax.scan``
        dispatch, with the running-best parameters tracked in the scan
        carry.  ~2-4× faster on small models through the TPU relay
        (per-dispatch overhead amortizes over the whole call).  The
        training trajectory differs from the host loop (device-side
        shuffle and key order) but is invariant to the value of
        ``epochs_per_call`` itself; callbacks and best/resume snapshots
        fire at call boundaries instead of every epoch."""
        self.max_epochs = max_epochs
        self.gradient_clip_val = gradient_clip_val
        self.accumulate_grad_batches = max(1, int(accumulate_grad_batches))
        self.resume = resume
        self.save_resume_state = save_resume_state
        self.seed = seed
        self.use_mesh = use_mesh
        self.mesh = mesh
        self.log_every_n_steps = log_every_n_steps
        self.callbacks = callbacks or []
        self.steps_per_call = max(1, int(steps_per_call))
        self.epochs_per_call = max(1, int(epochs_per_call))

        if run_id is None:
            run_id = time.strftime("%Y%m%d_%H%M%S")
        self.run_id = run_id
        self.run_dir = Path(run_dir) / run_id
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self.metrics_path = self.run_dir / "metrics.jsonl"
        self.best_val_loss = float("inf")
        self.best_checkpoint: Optional[Path] = None

    # ------------------------------------------------------------------ fit
    def fit(self, model: ScoreModel, datamodule: Datamodule) -> ScoreModel:
        key = jax.random.PRNGKey(self.seed)
        # Keep the PRNG key chain on the host CPU backend: each
        # ``jax.random.split`` is otherwise a separate accelerator dispatch
        # (~70 ms through the TPU tunnel relay), and a training epoch does
        # one split per optimizer/val step.  threefry is bit-identical
        # across backends, so the trajectory is unchanged; stacked step
        # keys re-enter the TPU uncommitted via ``np.stack``/``np.asarray``.
        try:
            host_cpu = jax.local_devices(backend="cpu")[0]
            key = jax.device_put(key, host_cpu)
        except RuntimeError:
            host_cpu = None
        cfg = model.config
        scheduler = model.scheduler
        constants = model.variables["constants"]

        tx = make_optimizer(
            lr_max=model.lr_max,
            num_training_steps=model.num_training_steps,
            gradient_clip_val=self.gradient_clip_val,
            accumulate_grad_batches=self.accumulate_grad_batches,
        )
        _lr_schedule = make_lr_schedule(
            lr_max=model.lr_max, num_training_steps=model.num_training_steps
        )

        def lr_schedule(step):
            # optax schedules trace jnp ops; evaluate them on the host CPU
            # device so per-epoch logging never round-trips the relay.
            if host_cpu is not None:
                with jax.default_device(host_cpu):
                    return _lr_schedule(step)
            return _lr_schedule(step)
        state = init_train_state(model.variables["params"], tx)

        start_epoch = 0
        resumed_global_step = 0
        if self.resume:
            from fdtpu.train.checkpoint import load_train_state

            restored = load_train_state(self.run_dir, state, key)
            if restored is not None:
                state, key, resume_meta = restored
                if host_cpu is not None:
                    key = jax.device_put(np.asarray(key), host_cpu)
                start_epoch = int(resume_meta["epoch"]) + 1
                resumed_global_step = int(resume_meta["global_step"])
                self.best_val_loss = float(resume_meta["best_val_loss"])
                logging.info(
                    "resuming from epoch %d (global step %d)",
                    start_epoch, resumed_global_step,
                )

        if self.mesh is not None:
            mesh = self.mesh
        else:
            mesh = create_mesh() if self.use_mesh else None
        n_shards = mesh.shape["data"] if mesh is not None else 1
        if mesh is not None:
            # Replicated on a data-only mesh; tensor-parallel over the
            # ``model`` axis otherwise (optimizer-state leaves mirror the
            # param tree paths, so the same spec rule shards them too).
            state = shard_params(mesh, state)

        def apply_fn(params, xn, t, train, rngs):
            return score_apply(
                {"params": params, "constants": constants}, cfg, xn, t,
                train=train, rngs=rngs,
            )

        def _update(
            state: TrainState, batch: Array, step_key: Array,
            sample_weight: Optional[Array] = None,
        ):
            def loss_fn(params):
                return sde_loss(
                    apply_fn, params, scheduler, batch, step_key,
                    likelihood_weighting=model.likelihood_weighting, train=True,
                    sample_weight=sample_weight,
                )

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return (
                state.replace(params=params, opt_state=opt_state, step=state.step + 1),
                loss,
            )

        # Donate the train state: params/optimizer buffers (3x model size)
        # update in place instead of being copied every step.
        train_step = partial(jax.jit, donate_argnums=(0,))(_update)

        # Multi-step dispatch: run ``steps_per_call`` consecutive optimizer
        # steps inside ONE jitted lax.scan.  Per-dispatch overhead (host
        # Python + transfer + on this box a ~0.3-0.4 s TPU-tunnel relay
        # round-trip) otherwise dominates a small model's train step; the
        # scan amortizes it over k steps.  Step PRNG keys are produced by
        # the same sequential host-side split as the per-step path, so the
        # training trajectory is identical regardless of chunking.
        @partial(jax.jit, donate_argnums=(0,))
        def train_steps_scan(state: TrainState, batches: Array, step_keys: Array):
            def body(st, inp):
                b, sk = inp
                return _update(st, b, sk)

            return jax.lax.scan(body, state, (batches, step_keys))

        def _val_loss(
            params, batch: Array, step_key: Array,
            sample_weight: Optional[Array] = None,
        ):
            return sde_loss(
                apply_fn, params, scheduler, batch, step_key,
                likelihood_weighting=model.likelihood_weighting, train=False,
                sample_weight=sample_weight,
            )

        val_step = jax.jit(_val_loss)

        @jax.jit
        def val_steps_scan(params, batches: Array, step_keys: Array):
            def body(carry, inp):
                b, sk = inp
                return carry, _val_loss(params, b, sk)

            return jax.lax.scan(body, None, (batches, step_keys))[1]

        if self.epochs_per_call > 1:
            return self._fit_on_device(
                model=model, datamodule=datamodule, state=state, key=key,
                _update=_update, _val_loss=_val_loss, mesh=mesh,
                n_shards=n_shards, lr_schedule=lr_schedule,
                start_epoch=start_epoch, global_step=resumed_global_step,
                constants=constants,
            )

        def put_batch(batch: np.ndarray) -> tuple[Array, int]:
            batch, true_n = pad_to_multiple(batch, n_shards)
            arr = jnp.asarray(batch)
            if mesh is not None:
                arr = jax.device_put(arr, data_sharding(mesh, arr.ndim))
            return arr, true_n

        def put_chunk(chunk: list[np.ndarray]) -> Array:
            """Stack k same-shape batches to (k, B, ...) with the batch axis
            (dim 1) padded for even sharding over the mesh 'data' axis."""
            stacked = np.stack(chunk)
            rem = (-stacked.shape[1]) % n_shards
            if rem:
                stacked = np.concatenate(
                    [stacked, np.repeat(stacked[:, :1], rem, axis=1)], axis=1
                )
            arr = jnp.asarray(stacked)
            if mesh is not None:
                arr = jax.device_put(
                    arr,
                    NamedSharding(mesh, P(None, "data", *([None] * (arr.ndim - 2)))),
                )
            return arr

        spc = max(1, int(self.steps_per_call))
        global_step = resumed_global_step

        # One loader per fit (torch DataLoader semantics, reference
        # datamodules.py:102-140 via Lightning): iterating it re-shuffles
        # every epoch, and dataset construction (the full-split DFT — an
        # on-device dispatch) happens once instead of per epoch.  On resume
        # the shuffle RNG fast-forwards so the batch sequence matches an
        # uninterrupted run.
        train_loader = datamodule.train_dataloader()
        val_loader = datamodule.val_dataloader()
        if start_epoch and hasattr(train_loader, "skip_epochs"):
            train_loader.skip_epochs(start_epoch)

        # The val set is static (shuffle=False): group + transfer it to the
        # device ONCE instead of re-stacking and re-putting every epoch.
        # Each plan entry is ("chunk", (k,B,...) array, [true sizes]) for a
        # scanned dispatch or ("single", array, true size) for a lone
        # odd-shaped trailing batch.
        val_plan: list[tuple] = []
        if self.max_epochs > start_epoch:
            val_batches = list(val_loader)
            for i, run in _group_same_shape(val_batches, spc):
                if run > 1:
                    val_plan.append(
                        ("chunk", put_chunk(val_batches[i : i + run]),
                         [b.shape[0] for b in val_batches[i : i + run]])
                    )
                else:
                    arr, true_n = put_batch(val_batches[i])
                    val_plan.append(("single", arr, true_n))

        def log_step(loss_val: Array, epoch: int) -> None:
            # LR at the current *optimizer* step (LearningRateMonitor
            # analog, reference conf/trainer/callbacks/default.yaml:1).
            if global_step % self.log_every_n_steps == 0:
                opt_step = global_step // self.accumulate_grad_batches
                self._log(
                    {"step": global_step, "epoch": epoch,
                     "train/loss": float(loss_val),
                     "lr": float(lr_schedule(opt_step))}
                )

        for epoch in range(start_epoch, self.max_epochs):
            batches = list(train_loader)
            epoch_losses: list[Array] = []
            t0 = time.time()
            for i, run in _group_same_shape(batches, spc):
                if run > 1:
                    step_keys = []
                    for _ in range(run):
                        key, sk = jax.random.split(key)
                        step_keys.append(sk)
                    state, losses = train_steps_scan(
                        state, put_chunk(batches[i : i + run]),
                        np.stack(step_keys),
                    )
                    epoch_losses.append(losses)
                    for off in range(run):
                        global_step += 1
                        log_step(losses[off], epoch)
                else:
                    key, step_key = jax.random.split(key)
                    arr, _ = put_batch(batches[i])
                    state, loss = train_step(state, arr, np.asarray(step_key))
                    epoch_losses.append(jnp.reshape(loss, (1,)))
                    global_step += 1
                    log_step(loss, epoch)

            # Host-side mean over the fetched per-step losses: avoids two
            # extra accelerator dispatches (concatenate + mean) per epoch.
            train_loss = float(
                np.concatenate(
                    [np.asarray(x).ravel() for x in epoch_losses]
                ).mean()
            )

            val_losses, val_weights = [], []
            for entry in val_plan:
                if entry[0] == "chunk":
                    _, chunk_arr, weights = entry
                    step_keys = []
                    for _ in range(len(weights)):
                        key, sk = jax.random.split(key)
                        step_keys.append(sk)
                    losses = val_steps_scan(
                        state.params, chunk_arr, np.stack(step_keys)
                    )
                    val_losses.extend(np.asarray(losses).tolist())
                    val_weights.extend(weights)
                else:
                    _, arr, true_n = entry
                    key, step_key = jax.random.split(key)
                    val_losses.append(
                        float(val_step(state.params, arr, np.asarray(step_key)))
                    )
                    val_weights.append(true_n)
            val_loss = float(np.average(val_losses, weights=val_weights)) if val_losses else float("nan")

            dt = time.time() - t0
            self._log(
                {"step": global_step, "epoch": epoch, "train/loss_epoch": train_loss,
                 "val/loss": val_loss, "epoch_time_s": round(dt, 2),
                 "lr": float(lr_schedule(global_step // self.accumulate_grad_batches))}
            )
            logging.info(
                "epoch %d: train/loss %.5f val/loss %.5f (%.1fs)",
                epoch, train_loss, val_loss, dt,
            )

            if val_loss < self.best_val_loss:
                self.best_val_loss = val_loss
                model.variables = {
                    "params": jax.device_get(state.params),
                    "constants": jax.device_get(constants),
                }
                self.best_checkpoint = save_checkpoint(
                    self.run_dir, model, epoch=epoch, val_loss=val_loss
                )
                # WandbLogger(log_model=true) analog: best checkpoints are
                # also uploaded as model artifacts when a run is active.
                from fdtpu.utils.wandb import maybe_log_model

                maybe_log_model(self.best_checkpoint)

            if self.save_resume_state:
                from fdtpu.train.checkpoint import save_train_state

                save_train_state(
                    self.run_dir, state, key, epoch=epoch,
                    global_step=global_step, best_val_loss=self.best_val_loss,
                )

            for callback in self.callbacks:
                callback.on_train_epoch_end(
                    trainer=self, model_variables={"params": jax.device_get(state.params), "constants": constants},
                    epoch=epoch,
                )

        # Final parameters (even if not best) are kept on the model only when
        # no checkpoint improved — mirroring Lightning's in-memory behavior.
        if self.best_checkpoint is None:
            model.variables = {
                "params": jax.device_get(state.params),
                "constants": jax.device_get(constants),
            }
        return model

    # ------------------------------------------------- device-resident fit
    def _fit_on_device(
        self, *, model, datamodule, state, key, _update, _val_loss, mesh,
        n_shards, lr_schedule, start_epoch, global_step, constants,
    ) -> "ScoreModel":
        """Device-resident training loop (``epochs_per_call`` > 1).

        The standardized train/val splits are transferred to HBM once;
        each jitted call runs up to ``epochs_per_call`` whole epochs as one
        ``lax.scan`` (shuffle = device-side ``jax.random.permutation``,
        partial batches = zero-weight padding rows with exact weighted-mean
        gradients, running best params tracked in the carry).  Through the
        TPU tunnel relay this amortizes per-dispatch overhead over entire
        epochs: ~2× faster than the host loop at batch 256 on the 3.2M-param
        flagship (1,204 vs ~590 samples/s/chip incl. val).
        """
        from functools import partial as _partial

        X_np = np.asarray(
            datamodule.train_dataloader().dataset.standardized(), np.float32
        )
        XV_np = np.asarray(
            datamodule.val_dataloader().dataset.standardized(), np.float32
        )
        n_train, n_val = X_np.shape[0], XV_np.shape[0]
        B = int(datamodule.batch_size)
        B_pad = -(-B // n_shards) * n_shards
        steps_pe = -(-n_train // B)
        vsteps = -(-n_val // B)

        def padded_weights(n: int, steps: int) -> np.ndarray:
            w = np.zeros((steps * B,), np.float32)
            w[:n] = 1.0
            w = w.reshape(steps, B)
            if B_pad > B:
                w = np.pad(w, ((0, 0), (0, B_pad - B)))
            return w

        w_train = jnp.asarray(padded_weights(n_train, steps_pe))
        w_val = jnp.asarray(padded_weights(n_val, vsteps))
        # Exact per-epoch val loss: weight each batch's (weighted-mean) loss
        # by its true row count.
        v_frac = np.asarray(padded_weights(n_val, vsteps)).sum(axis=1)
        v_frac = jnp.asarray(v_frac / v_frac.sum())

        XV_pad = np.zeros((vsteps * B_pad,) + XV_np.shape[1:], np.float32)
        XV_pad = XV_pad.reshape(vsteps, B_pad, *XV_np.shape[1:])
        for i in range(vsteps):
            rows = XV_np[i * B : (i + 1) * B]
            XV_pad[i, : rows.shape[0]] = rows

        X_dev = jnp.asarray(X_np)
        XV_dev = jnp.asarray(XV_pad)
        if mesh is not None:
            # Splits replicated; the gathered batch is resharded over the
            # mesh 'data' axis inside the step.
            rep = NamedSharding(mesh, P(*([None] * X_dev.ndim)))
            X_dev = jax.device_put(X_dev, rep)
            XV_dev = jax.device_put(
                XV_dev, NamedSharding(mesh, P(*([None] * XV_dev.ndim)))
            )

        def shard_batch(batch: Array) -> Array:
            if mesh is not None and B_pad % n_shards == 0:
                return jax.lax.with_sharding_constraint(
                    batch,
                    NamedSharding(mesh, P("data", *([None] * (batch.ndim - 1)))),
                )
            return batch

        @_partial(jax.jit, donate_argnums=(0,))
        def run_epochs(carry, X, XV, epoch_ids, active):
            # ``epoch_ids``/``active`` always have length epochs_per_call —
            # a shorter final call pads and masks instead of changing the
            # scan length, which would recompile this whole multi-epoch
            # program (minutes on the remote compiler) for one tail call.
            def epoch_body(c, inp):
                epoch_idx, is_active = inp
                return jax.lax.cond(
                    is_active,
                    lambda cc: _run_one_epoch(cc, epoch_idx),
                    lambda cc: (
                        cc,
                        (
                            jnp.zeros((steps_pe,), jnp.float32),
                            jnp.asarray(jnp.inf, jnp.float32),
                        ),
                    ),
                    c,
                )

            def _run_one_epoch(c, epoch_idx):
                state, key, best_params, best_val, best_epoch = c
                key, pkey = jax.random.split(key)
                perm = jax.random.permutation(pkey, n_train).astype(jnp.int32)
                idx = jnp.concatenate(
                    [perm, jnp.zeros((steps_pe * B - n_train,), jnp.int32)]
                ).reshape(steps_pe, B)
                if B_pad > B:
                    idx = jnp.pad(idx, ((0, 0), (0, B_pad - B)))

                def step_body(sc, inp):
                    st, k = sc
                    row_idx, w = inp
                    k, sk = jax.random.split(k)
                    batch = shard_batch(jnp.take(X, row_idx, axis=0))
                    st, loss = _update(st, batch, sk, sample_weight=w)
                    return (st, k), loss

                (state, key), step_losses = jax.lax.scan(
                    step_body, (state, key), (idx, w_train)
                )

                def val_body(k, inp):
                    vb, w = inp
                    k, sk = jax.random.split(k)
                    return k, _val_loss(
                        state.params, shard_batch(vb), sk, sample_weight=w
                    )

                key, vlosses = jax.lax.scan(val_body, key, (XV, w_val))
                val_loss = jnp.sum(vlosses * v_frac)

                improved = val_loss < best_val
                best_params = jax.tree.map(
                    lambda b, p: jnp.where(improved, p, b), best_params,
                    state.params,
                )
                best_val = jnp.minimum(best_val, val_loss)
                best_epoch = jnp.where(improved, epoch_idx, best_epoch)
                return (
                    (state, key, best_params, best_val, best_epoch),
                    (step_losses, val_loss),
                )

            carry, (step_losses, val_losses) = jax.lax.scan(
                epoch_body, carry, (epoch_ids, active)
            )
            return carry, step_losses, val_losses

        best_params = jax.tree.map(jnp.copy, state.params)
        carry = (
            state,
            jnp.asarray(np.asarray(key)),
            best_params,
            jnp.asarray(self.best_val_loss, jnp.float32),
            jnp.asarray(-1, jnp.int32),
        )
        saved_best = self.best_val_loss

        ep = start_epoch
        while ep < self.max_epochs:
            n_call = min(self.epochs_per_call, self.max_epochs - ep)
            epoch_ids = jnp.arange(
                ep, ep + self.epochs_per_call, dtype=jnp.int32
            )
            active = jnp.arange(self.epochs_per_call) < n_call
            t0 = time.time()
            carry, step_losses, val_losses = run_epochs(
                carry, X_dev, XV_dev, epoch_ids, active
            )
            state = carry[0]
            step_np, val_np, best_val_np, best_epoch_np = jax.device_get(
                (step_losses, val_losses, carry[3], carry[4])
            )
            dt = time.time() - t0

            for e in range(n_call):
                epoch = ep + e
                for s in range(steps_pe):
                    global_step += 1
                    if global_step % self.log_every_n_steps == 0:
                        opt_step = global_step // self.accumulate_grad_batches
                        self._log(
                            {"step": global_step, "epoch": epoch,
                             "train/loss": float(step_np[e, s]),
                             "lr": float(lr_schedule(opt_step))}
                        )
                train_loss = float(step_np[e].mean())
                val_loss = float(val_np[e])
                self._log(
                    {"step": global_step, "epoch": epoch,
                     "train/loss_epoch": train_loss, "val/loss": val_loss,
                     "epoch_time_s": round(dt / n_call, 2),
                     "lr": float(
                         lr_schedule(global_step // self.accumulate_grad_batches)
                     )}
                )
                logging.info(
                    "epoch %d: train/loss %.5f val/loss %.5f (%.1fs)",
                    epoch, train_loss, val_loss, dt / n_call,
                )

            self.best_val_loss = float(best_val_np)
            if self.best_val_loss < saved_best:
                saved_best = self.best_val_loss
                model.variables = {
                    "params": jax.device_get(carry[2]),
                    "constants": jax.device_get(constants),
                }
                self.best_checkpoint = save_checkpoint(
                    self.run_dir, model, epoch=int(best_epoch_np),
                    val_loss=self.best_val_loss,
                )
                from fdtpu.utils.wandb import maybe_log_model

                maybe_log_model(self.best_checkpoint)

            if self.save_resume_state:
                from fdtpu.train.checkpoint import save_train_state

                save_train_state(
                    self.run_dir, state, carry[1], epoch=ep + n_call - 1,
                    global_step=global_step, best_val_loss=self.best_val_loss,
                )

            for callback in self.callbacks:
                callback.on_train_epoch_end(
                    trainer=self,
                    model_variables={
                        "params": jax.device_get(state.params),
                        "constants": constants,
                    },
                    epoch=ep + n_call - 1,
                )
            ep += n_call

        if self.best_checkpoint is None:
            model.variables = {
                "params": jax.device_get(state.params),
                "constants": jax.device_get(constants),
            }
        return model

    def _log(self, record: dict[str, Any]) -> None:
        with open(self.metrics_path, "a") as f:
            f.write(json.dumps(record) + "\n")
        from fdtpu.utils.wandb import maybe_log_wandb

        maybe_log_wandb(record)
