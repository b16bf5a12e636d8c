from fdtpu.ops.fourier import (
    dft,
    idft,
    spectral_density,
    localization_metrics,
    smooth_frequency,
    frequency_decompose_fft,
    frequency_decompose_dct,
    hermite_polynomials,
    hermite_design_matrix,
    predict_hermite,
)
from fdtpu.ops.fresca import (
    create_frequency_masks,
    frequency_scale,
    apply_fresca_to_score,
    analyze_frequency_content,
)

__all__ = [
    "dft",
    "idft",
    "spectral_density",
    "localization_metrics",
    "smooth_frequency",
    "frequency_decompose_fft",
    "frequency_decompose_dct",
    "hermite_polynomials",
    "hermite_design_matrix",
    "predict_hermite",
    "create_frequency_masks",
    "frequency_scale",
    "apply_fresca_to_score",
    "analyze_frequency_content",
]
