"""Products-scale end-to-end training epoch: host sampling + prefetch pipeline +
jitted device steps, wall-clock per epoch (SURVEY.md §6 north star — the reference's
flagship numbers are ogbn-products batch/training times, README.md:45).

Unlike bench.py (pre-sampled pool isolating the device step), this measures the
WHOLE pipeline: the prefetch-threaded DataLoader samples on the host (C++ sampler)
while the device trains, exactly how a user runs an epoch.

Run on the TPU: ``python benchmarks/epoch_bench.py``; env: EB_NODES (default 2.4M),
EB_DEG (default 25), EB_OUT.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from dgll_tpu.dataloader import DataLoader
    from dgll_tpu.nn import GraphSAGE
    from dgll_tpu.sampling import HostGraph, NeighborSampler
    from dgll_tpu.train import MiniBatchTrainer

    n_node = int(os.environ.get("EB_NODES", 2_400_000))
    avg_deg = int(os.environ.get("EB_DEG", 25))
    out_path = os.environ.get("EB_OUT", "")
    batch, fanouts = 1024, [15, 10]
    feat_dim, hidden, n_class = 100, 256, 48
    train_frac = 0.08  # ogbn-products-like train split (196k/2.4M)

    rng = np.random.default_rng(0)
    n_edge = n_node * avg_deg
    t0 = time.perf_counter()
    w = (np.arange(n_node, dtype=np.float64) + 1.0) ** (-0.9)
    cdf = np.cumsum(w); cdf /= cdf[-1]
    dst = np.searchsorted(cdf, rng.random(n_edge)).astype(np.int64)
    src = rng.integers(0, n_node, n_edge)
    print(f"[epoch] gen {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)

    from dgll_tpu import native

    indptr, src_s, _, _ = native.build_csr_apply(dst, src, None, n_node)
    hg = HostGraph(indptr, src_s, n_node)
    print(f"[epoch] csr {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)

    feats = jnp.asarray(rng.standard_normal((n_node, feat_dim), dtype=np.float32))
    labels = jnp.asarray(rng.integers(0, n_class, n_node).astype(np.int32))
    jax.block_until_ready(feats)
    train_nodes = rng.choice(n_node, int(train_frac * n_node), replace=False)
    print(f"[epoch] features on device {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)

    sampler = NeighborSampler(fanouts, seed=0)
    model = GraphSAGE(hidden=hidden, n_class=n_class, dropout=0.0)
    tr = MiniBatchTrainer(model, optax.adam(1e-3))
    # device= moves the blocks' H2D into the producer thread, overlapping the
    # transfer with the consumer's step dispatch
    dev = jax.devices()[0]
    loader = DataLoader(hg, train_nodes, sampler, batch, prefetch=4, seed=0,
                        device=dev)

    # compile once outside the timed epoch
    _, _, b0 = sampler.sample(hg, train_nodes[:batch], pad_to=batch)
    x0 = jnp.take(feats, jnp.asarray(b0[0].src_ids), axis=0)
    state = tr.init_state(b0, x0)
    state, loss, _ = tr.run_epoch(
        state, DataLoader(hg, train_nodes[: 2 * batch], sampler, batch, seed=1),
        feats, labels)
    print(f"[epoch] compiled {time.perf_counter()-t0:.1f}s", file=sys.stderr,
          flush=True)

    # two measured epochs; report the second (first-epoch allocator/relay
    # warm-up measurably contaminates the first at this scale)
    epoch_s = None
    for _ in range(2):
        t0 = time.perf_counter()
        state, loss, _ = tr.run_epoch(state, loader, feats, labels)
        jax.block_until_ready(state.params)
        epoch_s = time.perf_counter() - t0
        print(f"[epoch] measured {epoch_s:.2f}s", file=sys.stderr, flush=True)
    n_batches = len(loader)

    batch_ms = epoch_s / n_batches * 1e3
    results = {
        "metric": "products_scale_epoch",
        "value": round(epoch_s, 2),
        "unit": "s",
        "detail": {
            "device": str(jax.devices()[0]),
            "n_node": n_node, "n_edge": n_edge,
            "train_nodes": len(train_nodes), "n_batches": n_batches,
            "batch_ms_incl_sampling": round(batch_ms, 3),
            "loss": round(float(loss), 4),
            # DGLL's best published products batch time (1 GPU, README.md:45)
            "vs_dgll_products_batch": round(6.12 / batch_ms, 2),
        },
    }
    print(json.dumps(results))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
