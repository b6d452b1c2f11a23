from dgll_tpu.sampling.base import (
    BaseSampler,
    Block,
    HostGraph,
    SparseBlock,
    WeightedBlock,
    sample_neighbors_padded,
)
from dgll_tpu.sampling.device_layerwise import (
    DeviceLap,
    DeviceLayerWiseSampler,
    build_device_lap,
    sample_blocks_device_layerwise,
)
from dgll_tpu.sampling.device_sampler import (
    DeviceCSR,
    DeviceNeighborSampler,
    sample_blocks_device,
    sample_layer_device,
)
from dgll_tpu.sampling.layerwise import (
    FastGCNSampler,
    LadiesSampler,
    geometric_layer_sizes,
    normalized_laplacian,
)
from dgll_tpu.sampling.neighbor import (
    CommunityNeighborSampler,
    DGLLNeighborSampler,
    NeighborSampler,
)

__all__ = [
    "BaseSampler",
    "Block",
    "SparseBlock",
    "WeightedBlock",
    "DeviceLap",
    "DeviceLayerWiseSampler",
    "build_device_lap",
    "sample_blocks_device_layerwise",
    "HostGraph",
    "sample_neighbors_padded",
    "NeighborSampler",
    "CommunityNeighborSampler",
    "DGLLNeighborSampler",
    "DeviceCSR",
    "DeviceNeighborSampler",
    "sample_blocks_device",
    "sample_layer_device",
    "FastGCNSampler",
    "LadiesSampler",
    "normalized_laplacian",
    "geometric_layer_sizes",
]
