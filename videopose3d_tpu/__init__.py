"""videopose3d_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework for 3D human
pose estimation in video with temporal convolutions and semi-supervised training.

This is a ground-up redesign, for TPU hardware, of the capabilities of the reference
implementation facebookresearch/VideoPose3D (CVPR'19).  The compute path is pure JAX:
the dilated/strided temporal convolutions are expressed as MXU matmuls (with fused
Pallas kernels for the inference hot path), the data pipeline runs on-device as gather
operations over HBM-resident sequence arrays, and data parallelism is expressed with
``jax.sharding`` over a device mesh.

Subpackages
-----------
ops        -- pure-function geometry/metric ops (quaternion, camera, losses)
models     -- temporal convolution models (functional param/state pytrees)
data       -- on-device chunked/unchunked batch generation + dataset preparation
datasets   -- mocap dataset abstractions (Human3.6M, HumanEva, custom/in-the-wild)
parallel   -- device mesh / sharding helpers
"""

__version__ = "0.1.0"
