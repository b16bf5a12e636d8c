from fdtpu.data.dataset import DiffusionDataset, NumpyLoader
from fdtpu.data.datamodules import (
    Datamodule,
    ECGDatamodule,
    SyntheticDatamodule,
    MIMICIIIDatamodule,
    NASDAQDatamodule,
    NASADatamodule,
    USDroughtsDatamodule,
    DATAMODULE_REGISTRY,
)

__all__ = [
    "DiffusionDataset",
    "NumpyLoader",
    "Datamodule",
    "ECGDatamodule",
    "SyntheticDatamodule",
    "MIMICIIIDatamodule",
    "NASDAQDatamodule",
    "NASADatamodule",
    "USDroughtsDatamodule",
    "DATAMODULE_REGISTRY",
]
