from fdtpu.metrics.wasserstein import WassersteinDistances, wasserstein2_1d
from fdtpu.metrics.metrics import (
    Metric,
    MetricCollection,
    SlicedWasserstein,
    MarginalWasserstein,
)

__all__ = [
    "WassersteinDistances",
    "wasserstein2_1d",
    "Metric",
    "MetricCollection",
    "SlicedWasserstein",
    "MarginalWasserstein",
]
