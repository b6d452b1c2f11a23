"""SpMM microbenchmark: XLA segment_sum vs Pallas chunked kernel vs roofline.

Run on the TPU: ``python benchmarks/spmm_bench.py``. Uses dependent-chain timing
(see ``benchmarks/timing.py`` — naive loops lie on relay-attached TPUs).
Env knobs: SB_NODES, SB_DEG, SB_DIM, SB_OUT (json output path).

The committed results live in ``benchmarks/results/`` — the proof that the
compiled kernel path runs on hardware and beats the XLA scatter (reference
analogue: the fused CUDA kernel's usage in ``FusedKernel/train_gcn.py:95-110``).
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from timing import chain_time  # noqa: E402

HBM_GBPS = 819.0  # v5e HBM bandwidth (speed-of-light reference)


def main():
    import jax
    import jax.numpy as jnp

    from dgll_tpu.ops import spmm_coo
    from dgll_tpu.ops.chunked import build_chunked, chunked_to_device
    from dgll_tpu.ops.pallas.segment_matmul import spmm_chunked_pallas

    n_node = int(os.environ.get("SB_NODES", 500_000))
    avg_deg = int(os.environ.get("SB_DEG", 16))
    feat_dim = int(os.environ.get("SB_DIM", 128))
    out_path = os.environ.get("SB_OUT", "")

    rng = np.random.default_rng(0)
    n_edge = n_node * avg_deg
    w = (np.arange(n_node, dtype=np.float64) + 1.0) ** (-1.0)
    cdf = np.cumsum(w); cdf /= cdf[-1]
    dst = np.sort(np.searchsorted(cdf, rng.random(n_edge)).astype(np.int32))
    src = rng.integers(0, n_node, n_edge).astype(np.int32)
    ew = rng.random(n_edge).astype(np.float32)

    x0 = jnp.asarray(rng.standard_normal((n_node, feat_dim), dtype=np.float32))
    srcd, dstd, ewd = jnp.asarray(src), jnp.asarray(dst), jnp.asarray(ew)

    results = {
        "device": str(jax.devices()[0]),
        "n_node": n_node, "n_edge": n_edge, "feat_dim": feat_dim,
        "hbm_gbps_ref": HBM_GBPS,
    }

    # segment_sum path (chained: out feeds back as next input)
    f_seg = jax.jit(lambda x: spmm_coo(srcd, dstd, x, n_node, ewd) * 0.5)
    dt = chain_time(f_seg, x0)
    results["xla_segment_sum"] = {"ms": round(dt * 1e3, 2),
                                  "medges_per_s": round(n_edge / dt / 1e6, 1)}
    print(f"segment_sum: {dt*1e3:8.2f} ms  {n_edge/dt/1e6:6.0f}M edges/s", flush=True)

    # Roofline reference for the OP itself (gather-inclusive speed-of-light):
    # the minimum HBM traffic any implementation must move = one read of the
    # gathered source rows (E_pad rows) + one write of the output — the
    # intermediate message matrix is implementation overhead, not fundamental.
    for eb in (256, 512):
        for msg_dt, tag in ((jnp.float32, ""), (jnp.bfloat16, "_bf16msg")):
            c = chunked_to_device(build_chunked(src, dst, n_node, n_node, ew, eb=eb))
            csrc = jnp.asarray(np.asarray(c.src)[: c.n_chunk].reshape(-1))
            itemsize = jnp.dtype(msg_dt).itemsize

            f_pal = jax.jit(
                lambda x: spmm_chunked_pallas(
                    c, jnp.take(x.astype(msg_dt), csrc, axis=0),
                    out_dtype=jnp.float32)[:n_node] * 0.5
            )
            dt_p = chain_time(f_pal, x0)

            f_g = jax.jit(
                lambda x: jnp.take(x.astype(msg_dt), csrc, axis=0)[:n_node]
                .astype(jnp.float32) * 0.5
            )
            dt_g = chain_time(f_g, x0)

            pad = c.n_chunk * c.eb / n_edge
            e_pad = c.n_chunk * c.eb
            # r2-compatible implementation-traffic fraction (how close the moved
            # bytes run to HBM bandwidth): gather read + msg write + kernel
            # re-read at msg width, plus the f32 output write
            bytes_impl = e_pad * feat_dim * 3 * itemsize + n_node * feat_dim * 4
            sol_frac = bytes_impl / dt_p / 1e9 / HBM_GBPS
            # fundamental fraction: ANY implementation must read the gathered
            # source rows once and write the output once; everything else
            # (the materialised message matrix) is overhead
            bytes_min = e_pad * feat_dim * itemsize + n_node * feat_dim * 4
            min_frac = bytes_min / dt_p / 1e9 / HBM_GBPS
            key = f"pallas_eb{eb}{tag}"
            results[key] = {
                "ms": round(dt_p * 1e3, 2),
                "medges_per_s": round(n_edge / dt_p / 1e6, 1),
                "gather_only_ms": round(dt_g * 1e3, 2),
                "pad_factor": round(pad, 3),
                "roofline_fraction": round(sol_frac, 3),
                "min_bytes_fraction": round(min_frac, 3),
                "vs_segment_sum": round(results["xla_segment_sum"]["ms"] / (dt_p * 1e3), 2),
            }
            print(f"{key}: e2e {dt_p*1e3:8.2f} ms ({n_edge/dt_p/1e6:6.0f}M e/s)  "
                  f"gather-alone {dt_g*1e3:7.2f} ms  pad={pad:.2f}x  "
                  f"SoL={sol_frac:.0%}", flush=True)

    print(json.dumps(results))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
