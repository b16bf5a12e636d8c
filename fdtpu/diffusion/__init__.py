from fdtpu.diffusion.sde import SDE, VPScheduler, VEScheduler, noise_scaling_matrix
from fdtpu.diffusion.losses import sde_loss

__all__ = ["SDE", "VPScheduler", "VEScheduler", "noise_scaling_matrix", "sde_loss"]
