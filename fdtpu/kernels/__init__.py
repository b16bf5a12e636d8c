from fdtpu.kernels.attention import fused_mha, mha_reference

__all__ = ["fused_mha", "mha_reference"]
