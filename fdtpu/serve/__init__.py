"""Production serving: AOT export of compiled sampling programs."""

from fdtpu.serve.export import export_sampler, load_exported, make_sampling_fn

__all__ = ["export_sampler", "load_exported", "make_sampling_fn"]
