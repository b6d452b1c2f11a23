"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: minibatch GraphSAGE training batch time on a products-scale synthetic
power-law graph (2-layer, fanouts [15,10], batch 1024, feat 100 — the shape of the
reference's flagship MQ-GNN workload). ``vs_baseline`` compares against DGLL's best
published per-batch time on ogbn-products, 6.12 ms on 1 GPU (BASELINE.md: README.md:45);
>1.0 means we are faster per batch.

Scale knobs via env: BENCH_NODES, BENCH_DEG, BENCH_BATCH, BENCH_STEPS.
BENCH_FULLGRAPH=0 skips the secondary full-graph compiled-kernel metric.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _power_law_graph(n_node: int, avg_deg: int, alpha: float = 1.0, seed: int = 0):
    """Fast Zipf-ish COO via inverse-CDF (rng.choice with p is too slow at this scale)."""
    rng = np.random.default_rng(seed)
    n_edge = n_node * avg_deg
    w = (np.arange(n_node, dtype=np.float64) + 1.0) ** (-alpha)
    cdf = np.cumsum(w)
    cdf /= cdf[-1]
    dst = np.searchsorted(cdf, rng.random(n_edge)).astype(np.int64)
    src = rng.integers(0, n_node, n_edge)
    return src, dst


def main() -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from dgll_tpu.nn import GraphSAGE
    from dgll_tpu.sampling import HostGraph, NeighborSampler
    from dgll_tpu.train import MiniBatchTrainer

    n_node = int(os.environ.get("BENCH_NODES", 1_000_000))
    avg_deg = int(os.environ.get("BENCH_DEG", 15))
    batch = int(os.environ.get("BENCH_BATCH", 1024))
    steps = int(os.environ.get("BENCH_STEPS", 30))
    feat_dim, n_class, hidden = 100, 48, 256
    fanouts = [15, 10]

    t0 = time.perf_counter()
    src, dst = _power_law_graph(n_node, avg_deg)
    _log(f"graph gen {time.perf_counter()-t0:.1f}s ({n_node} nodes, {len(src)} edges)")
    # host CSR directly (skip Graph/device copies of the edge list)
    order = np.argsort(dst, kind="stable")
    src_s, dst_s = src[order], dst[order]
    indptr = np.zeros(n_node + 1, np.int64)
    np.add.at(indptr, dst_s + 1, 1)
    indptr = np.cumsum(indptr)
    hg = HostGraph(indptr, src_s, n_node)
    _log(f"csr built {time.perf_counter()-t0:.1f}s")

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((n_node, feat_dim), dtype=np.float32))
    labels = jnp.asarray(rng.integers(0, n_class, n_node).astype(np.int32))
    jax.block_until_ready(feats)
    _log(f"features on device {time.perf_counter()-t0:.1f}s")

    sampler = NeighborSampler(fanouts, seed=0)
    model = GraphSAGE(hidden=hidden, n_class=n_class, dropout=0.0)
    tr = MiniBatchTrainer(model, optax.adam(1e-3))

    # pre-sample a pool of batches so we time the device step, then time the
    # overlapped pipeline separately
    pool = []
    for i in range(8):
        seeds = rng.integers(0, n_node, batch)
        _, _, blocks = sampler.sample(hg, seeds, pad_to=batch)
        x = jnp.take(feats, blocks[0].src_ids, axis=0)
        y = jnp.take(labels, blocks[-1].dst_ids, axis=0)
        pool.append((tuple(blocks), x, y, blocks[-1].dst_mask))
    _log(f"pool sampled {time.perf_counter()-t0:.1f}s")

    state = tr.init_state(list(pool[0][0]), pool[0][1])
    key = jax.random.key(0)

    # warmup/compile
    b, x, y, m = pool[0]
    state, loss = tr.step(state, b, x, y, m, key)
    jax.block_until_ready(loss)
    _log(f"compiled {time.perf_counter()-t0:.1f}s")

    # dependent-chain timing with scalar D2H fences: on relay-attached TPUs,
    # block_until_ready can return early, so we fit the per-step slope from two
    # chain lengths (the train state chains step k to step k+1)
    def run_chain(k: int) -> float:
        nonlocal state
        t0 = time.perf_counter()
        loss = None
        for i in range(k):
            b, x, y, m = pool[i % len(pool)]
            state, loss = tr.step(state, b, x, y, m, key)
        float(loss)  # force the whole chain
        return time.perf_counter() - t0

    k_small = max(steps // 3, 1)
    run_chain(2)
    t_small = run_chain(k_small)
    t_large = run_chain(steps)
    dt = max((t_large - t_small) / (steps - k_small), 1e-9)
    batch_ms = dt * 1e3

    # secondary: K batches fused into one lax.scan dispatch. Measured SLOWER here
    # (scan's per-iteration xs slicing copies the stacked batch, while JAX's async
    # dispatch already hides per-step launch latency) — recorded for the honesty
    # of the comparison; the plain chained loop is the production path.
    scanned_ms = None
    if os.environ.get("BENCH_SCAN", "0") == "1":
        from dgll_tpu.train.trainer import make_scanned_block_step, stack_batches

        scan_k = len(pool)
        stacked = stack_batches(pool)
        steps_fn = make_scanned_block_step()
        state, losses = steps_fn(state, *stacked, key)  # compile
        jax.block_until_ready(losses)
        _log(f"scanned step compiled {time.perf_counter()-t0:.1f}s")

        def run_scan_chain(k: int) -> float:
            nonlocal state
            t0 = time.perf_counter()
            losses = None
            for _ in range(k):
                state, losses = steps_fn(state, *stacked, key)
            float(losses[-1])
            return time.perf_counter() - t0

        run_scan_chain(1)
        ts = run_scan_chain(2)
        tl = run_scan_chain(6)
        scanned_ms = max((tl - ts) / 4, 1e-9) / scan_k * 1e3

    # edges aggregated per batch across both layers
    edges_per_batch = batch * fanouts[-1] + batch * (1 + fanouts[-1]) * fanouts[0]
    edges_per_s = edges_per_batch / dt

    # ---- secondary: full-graph GCN train step through the compiled Pallas
    # chunked-SpMM path (Graph.with_chunked), the twin of the reference's fused
    # CUDA kernel usage (FusedKernel/train_gcn.py:95-110), with roofline fraction.
    fullgraph = {}
    if os.environ.get("BENCH_FULLGRAPH", "1") != "0":
        fullgraph = _fullgraph_kernel_bench(jax, jnp)
        _log(f"fullgraph kernel bench: {fullgraph}")

    baseline_ms = 6.12  # DGLL MQ-FastGCN+f+d ogbn-products batch time, 1 GPU
    print(json.dumps({
        "metric": "sage_minibatch_batch_time",
        "value": round(batch_ms, 4),
        "unit": "ms",
        "vs_baseline": round(baseline_ms / batch_ms, 3),
        "detail": {
            "edges_per_s": int(edges_per_s),
            "scanned_batch_ms": None if scanned_ms is None else round(scanned_ms, 4),
            "n_node": n_node,
            "avg_deg": avg_deg,
            "batch": batch,
            "fanouts": fanouts,
            "feat_dim": feat_dim,
            "hidden": hidden,
            "device": str(jax.devices()[0]),
            "fullgraph_gcn_pallas": fullgraph,
        },
    }))


def _fullgraph_kernel_bench(jax, jnp, hbm_gbps: float = 819.0) -> dict:
    """Full-graph 2-layer GCN train step over the compiled chunked-SpMM kernels."""
    import optax

    from dgll_tpu.data import gcn_normalize
    from dgll_tpu.graph import Graph
    from dgll_tpu.nn import GCN
    from dgll_tpu.train.trainer import create_train_state, make_full_batch_step

    n_node = int(os.environ.get("BENCH_FG_NODES", 200_000))
    avg_deg = int(os.environ.get("BENCH_FG_DEG", 16))
    # bfloat16 runs the layer compute (XW matmul + message gather + in-kernel
    # scatter matmul) in bf16 with f32 accumulation — half the gather traffic,
    # 4x the MXU rate; params/optimizer stay f32 (standard mixed precision)
    dtype = jnp.dtype(os.environ.get("BENCH_FG_DTYPE", "float32"))
    # widths MXU-tileable so BOTH layers ride the compiled kernel (the chunked
    # path needs F % 128 == 0; a 32-class head would fall back to XLA scatter)
    feat_dim, hidden, n_class = 128, 128, 128
    rng = np.random.default_rng(1)
    src, dst = _power_law_graph(n_node, avg_deg, seed=1)
    g = Graph.from_edges(
        src, dst, n_node,
        node_feat=rng.standard_normal((n_node, feat_dim), dtype=np.float32),
        labels=rng.integers(0, n_class, n_node).astype(np.int32),
        train_mask=np.ones(n_node, bool),
        add_self_loops=True,
    )
    g = gcn_normalize(g).with_chunked(eb=512).to_device()
    assert g.chunked is not None and not g.chunked.interpret

    model = GCN(hidden=hidden, n_class=n_class, dropout=0.0,
                dtype=None if dtype == jnp.float32 else dtype)
    state = create_train_state(model, jax.random.key(0), optax.adam(1e-3), g,
                               g.node_feat)
    step = make_full_batch_step()
    key = jax.random.key(1)

    def run_chain(k: int) -> float:
        nonlocal state
        t0 = time.perf_counter()
        loss = None
        for _ in range(k):
            state, loss = step(state, g, g.node_feat, g.labels, g.train_mask, key)
        float(loss)
        return time.perf_counter() - t0

    run_chain(2)
    t_small = run_chain(3)
    t_large = run_chain(9)
    dt = max((t_large - t_small) / 6, 1e-9)
    n_edge = g.n_real_edge
    c = g.chunked
    # fwd 2 spmm + bwd 2 spmm over A^T: 4 kernel passes, each gather r+w + re-read
    slots = c.n_chunk * c.eb
    bytes_moved = 4 * (3 * slots + n_node) * hidden * dtype.itemsize
    return {
        "dtype": str(dtype),
        "step_ms": round(dt * 1e3, 2),
        "edges_per_s_per_layerpass": int(4 * n_edge / dt),
        "n_node": n_node,
        "n_edge": int(n_edge),
        "pad_factor": round(slots / n_edge, 3),
        "roofline_fraction": round(bytes_moved / dt / 1e9 / hbm_gbps, 3),
    }


if __name__ == "__main__":
    main()
