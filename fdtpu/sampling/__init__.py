from fdtpu.sampling.sampler import DiffusionSampler, sample_chain

__all__ = ["DiffusionSampler", "sample_chain"]
