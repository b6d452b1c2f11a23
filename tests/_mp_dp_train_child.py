"""Child script for the multi-process DP training test (run under launch_local).

Runs THREE real data-parallel train steps of minibatch GraphSAGE over the global
mesh (every process contributes its local CPU devices) and prints the final
loss. Fully deterministic (fixed seeds, shuffle off), so the SAME script run as
1 process x 4 devices and as 2 processes x 2 devices must print the same loss —
the parity assertion lives in tests/test_multiprocess.py.

Reference analogue: the per-process training loop of ``MQGCN.py:114-157`` under
``mp.spawn`` + Gloo; here the processes form one jax.distributed mesh and the
step is a single jitted shard_map program.
"""
import sys

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])

from dgll_tpu.parallel.launch import initialize_distributed, is_primary

initialize_distributed()

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dgll_tpu.graph import Graph
from dgll_tpu.nn import GraphSAGE
from dgll_tpu.parallel.dp import ShardedDataLoader, make_dp_block_step
from dgll_tpu.sampling import HostGraph, NeighborSampler

D = len(jax.devices())
mesh = Mesh(jax.devices(), ("data",))

# ---- deterministic tiny graph + features (identical in every process)
rng = np.random.default_rng(0)
n = 256
src = rng.integers(0, n, 2048)
dst = rng.integers(0, n, 2048)
g = Graph.from_edges(src, dst, n, add_self_loops=True)
hg = HostGraph.from_graph(g)
feats = rng.standard_normal((n, 16)).astype(np.float32)
labels = rng.integers(0, 4, n).astype(np.int32)

sampler = NeighborSampler([3, 2], seed=0)
loader = ShardedDataLoader(hg, np.arange(n), sampler, per_device_batch=8,
                           n_shard=D, shuffle=False, seed=0)

model = GraphSAGE(hidden=16, n_class=4, dropout=0.0)
tx = optax.sgd(0.05)


def model_apply(p, blocks, x, rng_):
    return model.apply({"params": p}, blocks, x, deterministic=True)


def to_global(a):
    """Stacked [D, ...] host array -> global array sharded over the mesh."""
    a = np.asarray(a)
    sh = NamedSharding(mesh, P("data", *([None] * (a.ndim - 1))))
    lo = jax.process_index() * (D // jax.process_count())
    hi = lo + D // jax.process_count()
    return jax.make_array_from_process_local_data(sh, a[lo:hi], a.shape)


it = iter(loader)
outs0, blocks0 = next(it)
local0 = jax.tree.map(lambda a: np.asarray(a)[0], blocks0,
                      is_leaf=lambda a: not isinstance(a, (list, tuple)) and hasattr(a, "shape"))
x0 = jnp.asarray(feats[np.asarray(local0[0].src_ids)])
params = model.init(jax.random.key(0), local0, x0)["params"]
opt_state = tx.init(params)
step = make_dp_block_step(mesh, model_apply, tx)

loss = None
batches = [(outs0, blocks0)] + [next(it) for _ in range(2)]
for outs, blocks in batches:
    gblocks = jax.tree.map(to_global, blocks,
                           is_leaf=lambda a: not isinstance(a, (list, tuple)) and hasattr(a, "shape"))
    sid = np.asarray(blocks[0].src_ids)
    did = np.asarray(blocks[-1].dst_ids)
    x = to_global(feats[sid])
    y = to_global(labels[did])
    m = to_global(np.asarray(blocks[-1].dst_mask))
    params, opt_state, loss = step(params, opt_state, gblocks, x, y, m,
                                   jax.random.key(1))

if is_primary():
    print(f"MPDP_LOSS={float(loss):.6f} procs={jax.process_count()} devices={D}")
