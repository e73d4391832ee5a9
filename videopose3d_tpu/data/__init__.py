from videopose3d_tpu.data.generators import (
    FlatSequenceDataset,
    ChunkedPairSampler,
    assemble_chunked_batch,
    UnchunkedBatcher,
)

__all__ = [
    "FlatSequenceDataset",
    "ChunkedPairSampler",
    "assemble_chunked_batch",
    "UnchunkedBatcher",
]
