"""Child for the multi-process DEVICE-SAMPLING DP parity test.

Runs one scanned device-sampling DP epoch (``make_device_dp_epoch_fn``: every
mesh device samples its sub-batch from the replicated HBM CSR inside the
program, psum'd grads) over the GLOBAL mesh and prints the mean loss. All
randomness is derived from fixed keys folded with the device's mesh axis index,
so the same global 4-device mesh produces the same loss whether it is built by
1 process x 4 devices or 2 processes x 2 devices — the parity assertion lives
in tests/test_multiprocess.py.

Reference analogue: the full per-process loop of ``MQGCN.py:114-157`` (sampling
+ DDP step per rank); here the whole epoch, including sampling, is one SPMD
program.
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
from dgll_tpu.sampling import DeviceCSR
from dgll_tpu.sampling.base import Block
from dgll_tpu.train.device_pipeline import make_device_dp_epoch_fn
from dgll_tpu.train.trainer import TrainState

D = len(jax.devices())
mesh = Mesh(jax.devices(), ("data",))


def rep(a):
    """Full host array -> replicated global array over the mesh."""
    a = np.asarray(a)
    sh = NamedSharding(mesh, P())
    return jax.make_array_from_process_local_data(sh, a, a.shape)


def shard(a):
    """[total] host array -> global array sharded over the data axis."""
    a = np.asarray(a)
    sh = NamedSharding(mesh, P("data"))
    per = a.shape[0] // jax.process_count()
    lo = jax.process_index() * per
    return jax.make_array_from_process_local_data(sh, a[lo:lo + per], a.shape)


# ---- deterministic tiny graph (identical in every process)
rng = np.random.default_rng(0)
n = 256
src = rng.integers(0, n, 2048)
dst = rng.integers(0, n, 2048)
g = Graph.from_edges(src, dst, n, add_self_loops=True)
csr_host = DeviceCSR.from_graph(g)
feats = rng.standard_normal((n, 16)).astype(np.float32)
labels = rng.integers(0, 4, n).astype(np.int32)

model = GraphSAGE(hidden=16, n_class=4, dropout=0.0)
tx = optax.sgd(0.05)

# deterministic param init from a handmade fixed-shape block (host-side numpy,
# no device computation -> no global-array constraints)
fanouts = [3, 2]
b0 = 8
blocks0 = []
frontier = b0
for f in reversed(fanouts):
    blocks0.insert(0, Block(
        dst_ids=jnp.zeros(frontier, jnp.int32),
        src_ids=jnp.zeros(frontier * (1 + f), jnp.int32),
        neigh_mask=jnp.ones((frontier, f), bool),
        dst_mask=jnp.ones(frontier, bool),
        fanout=f, n_dst=frontier))
    frontier *= (1 + f)
x0 = jnp.zeros((blocks0[0].n_src, 16), jnp.float32)
params = model.init(jax.random.key(0), blocks0, x0)["params"]

params_g = jax.tree.map(rep, jax.tree.map(np.asarray, params))
opt_g = jax.jit(tx.init)(params_g)
state = TrainState(step=rep(np.int32(0)), apply_fn=model.apply,
                   params=params_g, tx=tx, opt_state=opt_g)

csr_g = jax.tree.map(rep, jax.tree.map(np.asarray, csr_host))
per_dev, n_batches = 8, 3
total = n_batches * D * per_dev
seeds_np = (np.arange(total) % n).astype(np.int32)
mask_np = np.ones(total, bool)

epoch = make_device_dp_epoch_fn(mesh, fanouts, per_dev, n_batches,
                                sampler="neighbor")
key = rep(np.asarray(jax.random.key_data(jax.random.key(7))))
key = jax.jit(jax.random.wrap_key_data)(key)
state, loss = epoch(state, csr_g, rep(feats), rep(labels),
                    shard(seeds_np), shard(mask_np), key)

if is_primary():
    print(f"MPDPDEV_LOSS={float(loss):.6f} procs={jax.process_count()} devices={D}")
