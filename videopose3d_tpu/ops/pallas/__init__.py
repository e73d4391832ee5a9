from videopose3d_tpu.ops.pallas.temporal_block import (
    fused_dilated_block,
    fold_batchnorm,
)

__all__ = ["fused_dilated_block", "fold_batchnorm"]
