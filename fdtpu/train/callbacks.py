"""Training-time evaluation callbacks.

Redesign of `/root/reference/src/fdiff/utils/callbacks.py`:

* :class:`SamplingCallback` — every N epochs, generate samples with the
  current parameters, map them back to the data domain (de-standardize +
  idft when frequency-trained), and log Wasserstein metrics
  (reference callbacks.py:16-93).
* :class:`DiffusionMethodComparisonCallback` — time a list of sampling
  method configs (cache on/off, K/R variants, FreSca) against the baseline
  and log speedups (reference callbacks.py:96-277).
"""

from __future__ import annotations

import json
import logging
import time
from dataclasses import replace as dc_replace
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fdtpu.data.datamodules import Datamodule
from fdtpu.data.dataset import DiffusionDataset
from fdtpu.metrics import MarginalWasserstein, SlicedWasserstein
from fdtpu.models.score_models import ScoreModel
from fdtpu.ops import idft
from fdtpu.sampling import DiffusionSampler


class SamplingCallback:
    def __init__(
        self,
        datamodule: Datamodule,
        model_template: ScoreModel,
        every_n_epochs: int = 10,
        sample_batch_size: int = 64,
        num_samples: int = 200,
        num_diffusion_steps: int = 1000,
        num_directions: int = 200,
        random_seed: int = 42,
    ) -> None:
        self.datamodule = datamodule
        self.model_template = model_template
        self.every_n_epochs = every_n_epochs
        self.sample_batch_size = sample_batch_size
        self.num_samples = num_samples
        self.num_diffusion_steps = num_diffusion_steps
        self.random_seed = random_seed

        x_train = datamodule.X_train
        self.train_set = DiffusionDataset(
            X=x_train,
            fourier_transform=datamodule.fourier_transform,
            standardize=datamodule.standardize,
        )
        self.metrics = [
            SlicedWasserstein(
                original_samples=x_train,
                random_seed=random_seed,
                num_directions=num_directions,
            ),
            MarginalWasserstein(original_samples=x_train, random_seed=random_seed),
        ]

    def to_data_domain(self, samples: np.ndarray) -> np.ndarray:
        """De-standardize + inverse DFT (reference callbacks.py:52-62)."""
        if self.datamodule.standardize:
            samples = samples * self.train_set.feature_std + self.train_set.feature_mean
        if self.datamodule.fourier_transform:
            samples = np.asarray(idft(jnp.asarray(samples)))
        return samples

    def on_train_epoch_end(
        self, trainer, model_variables: dict[str, Any], epoch: int
    ) -> None:
        if (epoch + 1) % self.every_n_epochs != 0:
            return
        model = dc_replace(self.model_template, variables=model_variables)
        sampler = DiffusionSampler(model, sample_batch_size=self.sample_batch_size)
        samples = sampler.sample(
            self.num_samples,
            self.num_diffusion_steps,
            key=jax.random.PRNGKey(self.random_seed + epoch),
        )
        samples = self.to_data_domain(samples)
        record: dict[str, Any] = {"epoch": epoch}
        for metric in self.metrics:
            record.update(
                {f"metrics/{k}": v for k, v in metric(samples).items() if not isinstance(v, list)}
            )
        trainer._log(record)
        logging.info("SamplingCallback epoch %d: %s", epoch, record)


class DiffusionMethodComparisonCallback:
    """Time sampling method variants at epoch end (reference callbacks.py:96-277).

    ``methods``: list of dicts with keys
    ``name, num_diffusion_steps, use_cache, cache_kwargs, use_fresca,
    fresca_kwargs`` (same schema as conf/trainer/callbacks/
    diffusion_comparison.yaml).
    """

    def __init__(
        self,
        model_template: ScoreModel,
        methods: list[dict[str, Any]],
        every_n_epochs: int = 1,
        num_samples: int = 5,
        warmup_steps: int = 2,
        sample_batch_size: int = 5,
        random_seed: int = 42,
    ) -> None:
        self.model_template = model_template
        self.methods = methods
        self.every_n_epochs = every_n_epochs
        self.num_samples = num_samples
        self.warmup_steps = warmup_steps
        self.sample_batch_size = sample_batch_size
        self.random_seed = random_seed
        self.last_results: dict[str, Any] = {}

    def run(self, model_variables: dict[str, Any]) -> dict[str, Any]:
        model = dc_replace(self.model_template, variables=model_variables)
        results: dict[str, Any] = {}
        baseline_time: Optional[float] = None
        for method in self.methods:
            name = method["name"]
            sampler = DiffusionSampler(
                model,
                sample_batch_size=self.sample_batch_size,
                use_cache=bool(method.get("use_cache", False)),
                cache_kwargs=method.get("cache_kwargs") or {},
                use_fresca=bool(method.get("use_fresca", False)),
                **(method.get("fresca_kwargs") or {}),
            )
            steps = int(method.get("num_diffusion_steps", 10))
            # Warmup to exclude compilation (reference benchmark_cache.py:62-70).
            sampler.sample(1, self.warmup_steps, key=jax.random.PRNGKey(0))
            t0 = time.time()
            sampler.sample(
                self.num_samples, steps, key=jax.random.PRNGKey(self.random_seed)
            )
            elapsed = time.time() - t0
            entry: dict[str, Any] = {"time_s": round(elapsed, 4)}
            if method.get("use_cache"):
                entry["cache_stats"] = sampler.get_cache_stats()
            if baseline_time is None:
                baseline_time = elapsed
            else:
                entry["speedup_vs_baseline"] = round(baseline_time / elapsed, 3)
            results[name] = entry
        self.last_results = results
        return results

    def on_train_epoch_end(
        self, trainer, model_variables: dict[str, Any], epoch: int
    ) -> None:
        if (epoch + 1) % self.every_n_epochs != 0:
            return
        results = self.run(model_variables)
        trainer._log({"epoch": epoch, "diffusion_comparison": results})
        logging.info(
            "DiffusionMethodComparison epoch %d:\n%s",
            epoch,
            json.dumps(results, indent=2),
        )
