from dgll_tpu.nn.conv import GATConv, GCNConv, GINConv, SAGEConv
from dgll_tpu.nn.models import GAT, GCN, GIN, GINNode, GraphSAGE
from dgll_tpu.nn.pooling import (
    Pooling,
    batch_graphs,
    max_pooling,
    mean_pooling,
    sum_pooling,
)

__all__ = [
    "GCNConv",
    "GATConv",
    "SAGEConv",
    "GINConv",
    "GCN",
    "GAT",
    "GraphSAGE",
    "GIN",
    "GINNode",
    "Pooling",
    "sum_pooling",
    "mean_pooling",
    "max_pooling",
    "batch_graphs",
]
