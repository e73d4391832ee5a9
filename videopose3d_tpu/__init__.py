"""videopose3d_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework for 3D human
pose estimation in video with temporal convolutions and semi-supervised training.

This is a ground-up redesign, for TPU hardware, of the capabilities of the reference
implementation facebookresearch/VideoPose3D (CVPR'19).  The compute path is pure JAX:
the dilated/strided temporal convolutions are expressed as MXU matmuls (with fused
Pallas kernels for the inference hot path), the data pipeline runs on-device as gather
operations over HBM-resident sequence arrays, and data parallelism is expressed with
``jax.sharding`` over a device mesh.

Subpackages / modules
---------------------
ops        -- pure-function geometry/metric ops (quaternion, camera, losses)
  ops.pallas -- fused kernels: bf16 inference blocks, w8a8 int8 serving,
                custom-VJP train block
models     -- temporal convolution models (functional param/state pytrees)
data       -- on-device chunked/unchunked batch generation + dataset preparation
datasets   -- mocap dataset abstractions (Human3.6M, HumanEva, custom/in-the-wild)
parallel   -- device mesh / sharding helpers + multi-host (pod) init
train      -- jitted supervised / semi-supervised trainers (epoch-as-one-scan)
evaluate   -- whole-sequence evaluator (xla / fused / int8 engines), protocols
streaming  -- per-frame causal serving engine (bf16 / w8a8 int8, mesh-scalable)
checkpoint -- reference-payload checkpoints (pickle or orbax; async writer)
runner     -- reference-flag-compatible CLI driver
"""

__version__ = "0.1.0"
