from videopose3d_tpu.datasets.mocap import MocapDataset
from videopose3d_tpu.datasets.h36m import Human36mDataset
from videopose3d_tpu.datasets.humaneva import HumanEvaDataset
from videopose3d_tpu.datasets.custom import CustomDataset

__all__ = ["MocapDataset", "Human36mDataset", "HumanEvaDataset", "CustomDataset"]
