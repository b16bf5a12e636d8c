from fdtpu.models.score_models import (
    ScoreModelConfig,
    init_score_model,
    param_count,
    score_apply,
    score_apply_cached,
)
from fdtpu.models.transformer import MODE_CACHED, MODE_FULL, MODE_MIXED

__all__ = [
    "ScoreModelConfig",
    "init_score_model",
    "param_count",
    "score_apply",
    "score_apply_cached",
    "MODE_FULL",
    "MODE_MIXED",
    "MODE_CACHED",
]
