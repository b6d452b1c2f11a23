from dgll_tpu.ops.segment import (
    segment_max,
    segment_mean,
    segment_min,
    segment_softmax,
    segment_sum,
)
from dgll_tpu.ops.spmm import (
    fused_gcn_layer,
    sddmm_coo,
    spmm_coo,
    spmm_max_coo,
    spmm_mean_coo,
)

__all__ = [
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_min",
    "segment_softmax",
    "spmm_coo",
    "spmm_mean_coo",
    "spmm_max_coo",
    "sddmm_coo",
    "fused_gcn_layer",
]
from dgll_tpu.ops.windowed import (
    HybridCSR,
    WindowedCSR,
    build_hybrid,
    build_hybrid_pair,
    build_windowed,
    hybrid_to_device,
    spmm_windowed_xla,
)
from dgll_tpu.ops.pallas.gat import gat_attention_chunked_fused
from dgll_tpu.ops.pallas.gat_fused import (
    gat_alpha,
    gat_attention_fused,
    gat_stats,
)
from dgll_tpu.ops.pallas.spmm_windowed import spmm_hybrid, spmm_windowed_pallas
