from dgll_tpu.embedding.classifiers import train_all_classifiers, train_classifier
from dgll_tpu.embedding.skipgram import (
    SkipGramModel,
    load_embedding,
    plot_embedding,
    save_embedding,
    walk_pairs,
)
from dgll_tpu.embedding.walks import (
    WalkGraph,
    deepwalk_walks,
    node2vec_walks,
    struc2vec_walks,
)

__all__ = [
    "WalkGraph",
    "deepwalk_walks",
    "node2vec_walks",
    "struc2vec_walks",
    "SkipGramModel",
    "walk_pairs",
    "save_embedding",
    "plot_embedding",
    "load_embedding",
    "train_classifier",
    "train_all_classifiers",
]


class DeepWalk:
    """Convenience wrapper matching the reference DeepWalk class shape
    (``deepWalk.py``): walk -> train -> embeddings."""

    def __init__(self, graph, walk_length=20, num_walks=10, dim=64, window=5,
                 n_negative=5, lr=1e-2, seed=0):
        self.wg = WalkGraph.from_graph(graph)
        self.walk_length, self.num_walks = walk_length, num_walks
        self.window, self.seed = window, seed
        self.model = SkipGramModel(self.wg.n_node, dim, n_negative, lr, seed)

    def train(self, epochs: int = 2) -> "DeepWalk":
        import numpy as np
        walks = deepwalk_walks(self.wg, self.num_walks, self.walk_length, self.seed)
        pairs = walk_pairs(walks, self.window, np.random.default_rng(self.seed))
        self.model.train(pairs, epochs=epochs)
        return self

    @property
    def embeddings(self):
        return self.model.embeddings


class Node2Vec(DeepWalk):
    """node2vec wrapper (ref ``node2vec.py``)."""

    def __init__(self, graph, p=1.0, q=1.0, **kw):
        super().__init__(graph, **kw)
        self.p, self.q = p, q

    def train(self, epochs: int = 2) -> "Node2Vec":
        import numpy as np
        walks = node2vec_walks(self.wg, self.num_walks, self.walk_length,
                               self.p, self.q, self.seed)
        pairs = walk_pairs(walks, self.window, np.random.default_rng(self.seed))
        self.model.train(pairs, epochs=epochs)
        return self


class Struc2Vec(DeepWalk):
    """struc2vec wrapper (ref ``struc2vec.py``)."""

    def train(self, epochs: int = 2) -> "Struc2Vec":
        import numpy as np
        walks = struc2vec_walks(self.wg, self.num_walks, self.walk_length,
                                seed=self.seed)
        pairs = walk_pairs(walks, self.window, np.random.default_rng(self.seed))
        self.model.train(pairs, epochs=epochs)
        return self
