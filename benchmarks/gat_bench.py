"""GAT attention-layer benchmark: compiled Pallas kernel path vs XLA segment ops,
on the real chip, with numerical agreement checked (VERDICT r2 #4).

Measures the full sparse attention layer (scores -> edge softmax -> weighted
aggregation) for multi-head configs including the reference's canonical
8-head x 8-dim (``/root/reference/dgll/nn/Convolution/gatconv.py:174-199``),
which reaches the kernel via per-head zero-padding.

Run on the TPU: ``python benchmarks/gat_bench.py``; env: GB_NODES, GB_DEG, GB_OUT.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from timing import chain_time  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from dgll_tpu.data import gcn_normalize, synthetic_classification_graph
    from dgll_tpu.nn.conv import GATConv

    # scale bounded by the XLA baseline: its per-edge [E, H] score/alpha arrays
    # lane-pad 8 -> 128 on TPU, so E is kept modest to fit the comparison in HBM
    # (and remote-compile time: each fresh jit costs minutes on the relay)
    n_node = int(os.environ.get("GB_NODES", 20_000))
    avg_deg = int(os.environ.get("GB_DEG", 8))
    out_path = os.environ.get("GB_OUT", "")

    g = synthetic_classification_graph(n_node=n_node, avg_degree=avg_deg,
                                       n_class=8, feat_dim=64, seed=0)
    g = gcn_normalize(g)
    gc = g.with_chunked(eb=512).to_device()
    gp = gc.replace(chunked=None, chunked_t=None)
    x = jnp.asarray(np.asarray(g.node_feat))

    results = {"device": str(jax.devices()[0]), "n_node": n_node,
               "n_edge": g.n_real_edge}

    for H, F, tag in ((8, 16, "8h x 16d (H*F=128)"), (8, 8, "8h x 8d (ref config, padded)")):
        conv = GATConv(features=F, num_heads=H)
        params = conv.init(jax.random.key(0), gc, x)

        # x feeds back (summed into a column) so chain_time's dependent chain works
        def f_kernel(xi):
            return conv.apply(params, gc, xi)[:, :1] * 0.01 + xi

        def f_xla(xi):
            return conv.apply(params, gp, xi)[:, :1] * 0.01 + xi

        # agreement first (single eval, not chained). Both paths run their
        # matmuls at the MXU's default (bf16-input, f32-accumulate) precision
        # on TPU, in different operation orders, so agreement is asserted at
        # bf16 noise level; exact-f32 logic parity is covered by the interpret
        # -mode tests (tests/test_pallas_gat.py).
        got = np.asarray(conv.apply(params, gc, x), np.float64)
        ref = np.asarray(conv.apply(params, gp, x), np.float64)
        max_rel = float(np.max(np.abs(got - ref) / np.maximum(np.abs(ref), 1.0)))
        ok = max_rel < 0.05

        dt_k = chain_time(jax.jit(f_kernel), x)
        dt_x = chain_time(jax.jit(f_xla), x)

        # trained-through: fwd + custom-VJP bwd in one chained step (r4 ask)
        tgt = jnp.asarray(np.random.default_rng(2).standard_normal(
            (x.shape[0], H * F)).astype(np.float32))

        def f_kernel_fb(xi):
            def lo(xi_):
                return jnp.vdot(conv.apply(params, gc, xi_), tgt)
            return jax.grad(lo)(xi) * 1e-3 + xi

        def f_xla_fb(xi):
            def lo(xi_):
                return jnp.vdot(conv.apply(params, gp, xi_), tgt)
            return jax.grad(lo)(xi) * 1e-3 + xi

        dt_kfb = chain_time(jax.jit(f_kernel_fb), x)
        dt_xfb = chain_time(jax.jit(f_xla_fb), x)
        key = f"gat_{H}h{F}d"
        results[key] = {
            "label": tag,
            "kernel_ms": round(dt_k * 1e3, 2),
            "xla_ms": round(dt_x * 1e3, 2),
            "speedup": round(dt_x / dt_k, 2),
            "medges_per_s_kernel": round(g.n_real_edge / dt_k / 1e6, 1),
            "fwd_bwd_kernel_ms": round(dt_kfb * 1e3, 2),
            "fwd_bwd_xla_ms": round(dt_xfb * 1e3, 2),
            "fwd_bwd_speedup": round(dt_xfb / dt_kfb, 2),
            "medges_per_s_kernel_fwd_bwd_2pass": round(
                2 * g.n_real_edge / dt_kfb / 1e6, 1),
            "matches_xla": bool(ok),
            "max_rel_diff": round(max_rel, 5),
        }
        print(f"{key} ({tag}): kernel {dt_k*1e3:.2f} ms vs XLA {dt_x*1e3:.2f} ms "
              f"({dt_x/dt_k:.2f}x) agree={ok} max_rel={max_rel:.4f}", flush=True)

    print(json.dumps(results))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
