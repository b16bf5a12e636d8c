from fdtpu.viz.visualize import (
    visualize_samples,
    plot_sample_lines,
    plot_sample_heatmap,
)
from fdtpu.viz.results import (
    process_results,
    plot_sample_quality,
    results_to_latex,
    process_all_datasets,
)
from fdtpu.viz.spectral_interpretation import (
    plot_spectral_density,
    plot_temporal_energy,
    plot_delocalization,
)

__all__ = [
    "visualize_samples",
    "plot_sample_lines",
    "plot_sample_heatmap",
    "process_results",
    "plot_sample_quality",
    "results_to_latex",
    "process_all_datasets",
    "plot_spectral_density",
    "plot_temporal_energy",
    "plot_delocalization",
]
