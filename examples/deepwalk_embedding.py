"""Graph embeddings + downstream classifiers — parity with ``main_ge.py`` /
``main_trainClf.py`` in the reference.

    python examples/deepwalk_embedding.py [deepwalk|node2vec|struc2vec]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys

import numpy as np

from dgll_tpu.data import synthetic_classification_graph
from dgll_tpu.embedding import DeepWalk, Node2Vec, Struc2Vec, train_all_classifiers


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "deepwalk"
    g = synthetic_classification_graph(n_node=300, avg_degree=8, n_class=4,
                                       homophily=0.9, seed=0)
    cls = {"deepwalk": DeepWalk, "node2vec": Node2Vec, "struc2vec": Struc2Vec}[kind]
    model = cls(g, walk_length=16, num_walks=8, dim=32, seed=0).train(epochs=2)
    labels = np.asarray(g.labels)[: g.n_real_node]
    accs = train_all_classifiers(model.embeddings, labels, seed=0)
    print({k: round(v, 4) for k, v in accs.items()})


if __name__ == "__main__":
    main()
