"""Reference-API compatibility shim: every public name a dgll user knows resolves
and the DGraph constructor signature works (parity: example.py API tour)."""
import numpy as np
import pytest


def test_all_reference_names_importable():
    from dgll_tpu import compat as dgll

    for name in [
        "backend", "DGraph", "Base_sampler", "DGLLNeighborSampler", "NeighborSampler",
        "DataLoader", "sugbraph", "gcnConv", "GraphConvolution", "gatConv",
        "sparseGatConv", "sageConv", "GinConv", "GCN", "GAT", "SpGAT", "GraphSage",
        "GIN", "Pooling", "sumPooling", "meanPooling", "maxPooling",
        "GraphCacheServer", "DeepWalk", "Node2vec", "Struc2Vec", "SkipGramModel",
        "TrainingClassifiers", "loadGraph", "saveGraph", "saveEmbedding", "mylog",
        "normalize", "accuracy", "FastGCNSampler", "LadiesSampler",
    ]:
        assert hasattr(dgll, name), name


def test_dgraph_constructor_api_tour():
    """The example.py:1-73 flow: build DGraph from adjacency dict, query it."""
    from dgll_tpu import compat as dgll

    nodes = [0, 1, 2, 3]
    edges = {0: [1, 2], 1: [0], 2: [0, 1], 3: []}
    feats = np.eye(4, dtype=np.float32)
    labels = np.array([0, 1, 0, 1])
    g = dgll.DGraph(nodes, edges, labels=labels, features=feats,
                    train_mask=np.array([1, 1, 0, 0], bool),
                    test_mask=np.array([0, 0, 1, 1], bool))
    assert g.n_node == 4
    # out-neighbour list [1, 2] of node 0 => in-edges 1<-... message direction
    assert sorted(g.get_neighbors([0])[0]) == [1, 2]
    np.testing.assert_allclose(np.asarray(g.get_features([2])), feats[[2]])
    np.testing.assert_array_equal(g.get_train_nodes(), [0, 1])


def test_compat_training_flow():
    """graphage.py-style training through compat names only."""
    import optax

    from dgll_tpu import compat as dgll
    from dgll_tpu.data import gcn_normalize, synthetic_classification_graph
    from dgll_tpu.train import MiniBatchTrainer

    g = gcn_normalize(synthetic_classification_graph(n_node=200, avg_degree=6,
                                                     n_class=3, feat_dim=8, seed=0))
    sampler = dgll.DGLLNeighborSampler([4, 4])
    loader = dgll.DataLoader(g, g.get_train_nodes(), sampler, batch_size=16)
    model = dgll.GraphSage(hidden=16, n_class=3, dropout=0.0)
    tr = MiniBatchTrainer(model, optax.adam(1e-2))
    import jax.numpy as jnp

    _, _, b0 = sampler.sample(loader.host_g, g.get_train_nodes()[:16], pad_to=16)
    state = tr.init_state(b0, jnp.take(g.node_feat, b0[0].src_ids, axis=0))
    state, loss, _ = tr.run_epoch(state, loader, g.node_feat, g.labels)
    assert np.isfinite(loss)
