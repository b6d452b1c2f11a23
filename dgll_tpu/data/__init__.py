from dgll_tpu.data.datasets import (
    load_graph,
    load_planetoid,
    load_ppi_split,
    save_graph,
    synthetic_classification_graph,
    synthetic_graph_classification,
    synthetic_power_law_graph,
)
from dgll_tpu.data.transforms import (
    gcn_normalize,
    row_normalize_adj,
    row_normalize_features,
)

__all__ = [
    "synthetic_classification_graph",
    "synthetic_power_law_graph",
    "synthetic_graph_classification",
    "load_planetoid",
    "load_ppi_split",
    "save_graph",
    "load_graph",
    "gcn_normalize",
    "row_normalize_adj",
    "row_normalize_features",
]
