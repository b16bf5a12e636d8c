from fdtpu.sampling.calibrate import TauArm, TauCalibration, calibrate_tau_0
from fdtpu.sampling.sampler import DiffusionSampler, sample_chain

__all__ = [
    "DiffusionSampler",
    "sample_chain",
    "TauArm",
    "TauCalibration",
    "calibrate_tau_0",
]
