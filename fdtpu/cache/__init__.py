from fdtpu.cache.e2crf import (
    CacheState,
    E2CRFConfig,
    init_cache_state,
    cache_stats,
)

__all__ = ["CacheState", "E2CRFConfig", "init_cache_state", "cache_stats"]
