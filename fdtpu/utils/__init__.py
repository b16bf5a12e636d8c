from fdtpu.utils.config import (
    compose_config,
    flatten_config,
    dict_to_str,
    save_config,
    load_config,
)
from fdtpu.utils.profiling import WallClock, trace
from fdtpu.utils.wandb import maybe_initialize_wandb, maybe_log_wandb
from fdtpu.utils.torch_migration import (
    convert_torch_state_dict,
    load_reference_checkpoint,
)

__all__ = [
    "compose_config",
    "flatten_config",
    "dict_to_str",
    "save_config",
    "load_config",
    "WallClock",
    "trace",
    "maybe_initialize_wandb",
    "maybe_log_wandb",
    "convert_torch_state_dict",
    "load_reference_checkpoint",
]
