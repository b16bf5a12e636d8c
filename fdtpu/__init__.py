"""fdtpu — TPU-native frequency-domain time-series diffusion with E²-CRF caching.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of
NoakLiu/FastFourierDiffusion (reference layout documented in SURVEY.md):
score-based VP/VE diffusion for time series in the time or orthonormal-DFT
frequency domain, transformer/MLP/LSTM score backbones, E²-CRF error-feedback
event-driven caching compiled into a single `lax.scan` sampling loop, FreSca
frequency-selective score scaling, six datamodules, and sliced/marginal
Wasserstein evaluation.
"""

__version__ = "0.1.0"
