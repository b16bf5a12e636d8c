from fdtpu.utils.config import (
    compose_config,
    flatten_config,
    dict_to_str,
    save_config,
    load_config,
)

__all__ = [
    "compose_config",
    "flatten_config",
    "dict_to_str",
    "save_config",
    "load_config",
]
