from videopose3d_tpu.models.temporal import (
    TemporalModelConfig,
    init_temporal_model,
    forward,
    forward_dilated,
    forward_strided,
    receptive_field,
    total_causal_shift,
    param_count,
)

__all__ = [
    "TemporalModelConfig",
    "init_temporal_model",
    "forward",
    "forward_dilated",
    "forward_strided",
    "receptive_field",
    "total_causal_shift",
    "param_count",
]
