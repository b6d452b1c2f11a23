"""SpMM microbenchmark: XLA segment_sum path vs Pallas kernels vs HBM roofline.

Run on the TPU: `python benchmarks/spmm_bench.py`. Reports edges/s and effective
HBM bandwidth for full-graph aggregation on a power-law graph.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from dgll_tpu.ops import spmm_coo

    n_node = int(os.environ.get("SB_NODES", 500_000))
    avg_deg = int(os.environ.get("SB_DEG", 16))
    feat_dim = int(os.environ.get("SB_DIM", 128))
    dtype = os.environ.get("SB_DTYPE", "float32")

    rng = np.random.default_rng(0)
    n_edge = n_node * avg_deg
    w = (np.arange(n_node, dtype=np.float64) + 1.0) ** (-1.0)
    cdf = np.cumsum(w); cdf /= cdf[-1]
    dst = np.sort(np.searchsorted(cdf, rng.random(n_edge)).astype(np.int32))
    src = rng.integers(0, n_node, n_edge).astype(np.int32)
    ew = rng.random(n_edge).astype(np.float32)

    x = jnp.asarray(rng.standard_normal((n_node, feat_dim), dtype=np.float32)).astype(dtype)
    srcd, dstd, ewd = jnp.asarray(src), jnp.asarray(dst), jnp.asarray(ew)

    f = jax.jit(lambda x: spmm_coo(srcd, dstd, x, n_node, ewd))
    out = jax.block_until_ready(f(x))

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    bytes_per_edge = feat_dim * x.dtype.itemsize + 8  # row read + idx
    eff_bw = n_edge * bytes_per_edge / dt / 1e9
    print(f"segment_sum spmm: {dt*1e3:.2f} ms  {n_edge/dt/1e6:.0f}M edges/s  "
          f"~{eff_bw:.0f} GB/s effective (HBM SoL ~819)", flush=True)

    # ---- chunked one-hot Pallas kernel ----
    from dgll_tpu.ops.chunked import build_chunked, chunked_to_device
    from dgll_tpu.ops.pallas.segment_matmul import spmm_chunked_pallas

    for eb in (256, 512, 1024):
        t0 = time.perf_counter()
        c = chunked_to_device(build_chunked(src, dst, n_node, n_node, ew, eb=eb))
        prep = time.perf_counter() - t0
        pad_frac = c.n_chunk * c.eb / n_edge

        fp = jax.jit(lambda x: spmm_chunked_pallas(
            c, jnp.take(x, c.src.reshape(-1), axis=0)))
        out2 = jax.block_until_ready(fp(x))
        err = float(jnp.max(jnp.abs(out2[:n_node] - out))) / max(
            float(jnp.max(jnp.abs(out))), 1e-9)
        t0 = time.perf_counter()
        for _ in range(iters):
            out2 = fp(x)
        jax.block_until_ready(out2)
        dtp = (time.perf_counter() - t0) / iters
        print(f"pallas chunked eb={eb}: {dtp*1e3:.2f} ms  "
              f"{n_edge/dtp/1e6:.0f}M edges/s  pad={pad_frac:.2f}x  "
              f"prep={prep:.1f}s  rel_err={err:.2e}", flush=True)
    return dt


if __name__ == "__main__":
    main()
