"""GAT attention-layer benchmark: r5 fused kernels vs the r4 per-stage kernels
vs XLA segment ops, on the real chip, with numerical agreement checked.

Measures the full sparse attention layer (scores -> edge softmax -> weighted
aggregation) for multi-head configs including the reference's canonical
8-head x 8-dim (``/root/reference/dgll/nn/Convolution/gatconv.py:174-199``).
Round-5 additions: the fused 3-launch path (``ops/pallas/gat_fused.py``) A/B'd
against the round-4 6-launch path, and an ``eb=1024`` layout variant (half the
grid steps — the measured ~1.5 us/step overhead is the dominant cost).

Run on the TPU: ``python benchmarks/gat_bench.py``; env: GB_NODES, GB_DEG,
GB_OUT, GB_EB1024=0 to skip the eb sweep, GB_UNFUSED=0 to skip the r4 path.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from timing import chain_time  # noqa: E402


def bench_layer(conv, params, gc, x, tgt, label, results, key, jax, jnp,
                ref=None):
    def f_fwd(xi):
        return conv.apply(params, gc, xi)[:, :1] * 0.01 + xi

    got = np.asarray(conv.apply(params, gc, x), np.float64)
    row = {"label": label}
    if ref is not None:
        max_rel = float(np.max(np.abs(got - ref) / np.maximum(np.abs(ref), 1.0)))
        # MXU default precision (bf16-input) + different op order: bf16 noise
        row["matches_xla"] = bool(max_rel < 0.05)
        row["max_rel_diff"] = round(max_rel, 5)

    dt = chain_time(jax.jit(f_fwd), x)

    def f_fb(xi):
        def lo(xi_):
            return jnp.vdot(conv.apply(params, gc, xi_), tgt)
        return jax.grad(lo)(xi) * 1e-3 + xi

    dt_fb = chain_time(jax.jit(f_fb), x)
    n_edge = gc.n_real_edge
    row.update({
        "fwd_ms": round(dt * 1e3, 2),
        "medges_per_s_fwd": round(n_edge / dt / 1e6, 1),
        "fwd_bwd_ms": round(dt_fb * 1e3, 2),
        "medges_per_s_fwd_bwd_2pass": round(2 * n_edge / dt_fb / 1e6, 1),
    })
    results[key] = row
    print(f"{key}: fwd {dt*1e3:.2f} ms ({n_edge/dt/1e6:.1f} Me/s) "
          f"fwd+bwd {dt_fb*1e3:.2f} ms", flush=True)
    return dt, dt_fb, got


def main():
    import jax
    import jax.numpy as jnp

    import dgll_tpu.ops.pallas.gat as gatmod
    from dgll_tpu.data import gcn_normalize, synthetic_classification_graph
    from dgll_tpu.nn.conv import GATConv

    n_node = int(os.environ.get("GB_NODES", 20_000))
    avg_deg = int(os.environ.get("GB_DEG", 8))
    out_path = os.environ.get("GB_OUT", "")
    do_eb1024 = os.environ.get("GB_EB1024", "1") == "1"
    do_unfused = os.environ.get("GB_UNFUSED", "1") == "1"
    do_xla = os.environ.get("GB_XLA", "1") == "1"

    g = synthetic_classification_graph(n_node=n_node, avg_degree=avg_deg,
                                       n_class=8, feat_dim=64, seed=0)
    g = gcn_normalize(g)
    gc = g.with_chunked(eb=512).to_device()
    gp = gc.replace(chunked=None, chunked_t=None)
    gc1024 = g.with_chunked(eb=1024).to_device() if do_eb1024 else None
    x = jnp.asarray(np.asarray(g.node_feat))

    results = {"device": str(jax.devices()[0]), "n_node": n_node,
               "n_edge": g.n_real_edge}

    for H, F, tag in ((8, 16, "8h x 16d (H*F=128)"),
                      (8, 8, "8h x 8d (ref config, padded)")):
        conv = GATConv(features=F, num_heads=H)
        params = conv.init(jax.random.key(0), gc, x)
        tgt = jnp.asarray(np.random.default_rng(2).standard_normal(
            (x.shape[0], H * F)).astype(np.float32))
        base = f"gat_{H}h{F}d"

        ref = None
        if do_xla:
            dt_x, dt_xfb, ref = bench_layer(conv, params, gp, x, tgt,
                                            tag + " XLA segment ops", results,
                                            base + "_xla", jax, jnp)
        dt_f, dt_ffb, _ = bench_layer(conv, params, gc, x, tgt,
                                      tag + " fused (r5, eb=512)", results,
                                      base + "_fused", jax, jnp, ref)
        if do_xla:
            results[base + "_fused"]["speedup_vs_xla"] = round(dt_x / dt_f, 2)
            results[base + "_fused"]["fwd_bwd_speedup_vs_xla"] = round(
                dt_xfb / dt_ffb, 2)

        if gc1024 is not None:
            dt_e, dt_efb, _ = bench_layer(conv, params, gc1024, x, tgt,
                                          tag + " fused (r5, eb=1024)",
                                          results, base + "_fused_eb1024",
                                          jax, jnp, ref)
            results[base + "_fused_eb1024"]["vs_eb512"] = round(dt_f / dt_e, 2)

        if os.environ.get("GB_BF16", "1") == "1":
            # mixed precision: projection/messages bf16, softmax stats f32
            # (standard practice; halves the edge-sized gather/premult/scatter
            # traffic in fwd AND bwd)
            conv16 = GATConv(features=F, num_heads=H, dtype=jnp.bfloat16)
            dt_b, dt_bfb, _ = bench_layer(conv16, params, gc, x, tgt,
                                          tag + " fused bf16 (r5, eb=512)",
                                          results, base + "_fused_bf16",
                                          jax, jnp, ref)
            results[base + "_fused_bf16"]["fwd_bwd_vs_f32"] = round(
                dt_ffb / dt_bfb, 2)

        if do_unfused:
            # round-4 path: monkeypatch the conv's fused entry to the 6-launch
            # per-stage composition (same signature/return shape)
            orig = gatmod.gat_attention_chunked_fused
            gatmod.gat_attention_chunked_fused = (
                lambda c, ct, hp, a_s, a_d, slope, interp:
                gatmod.gat_attention_chunked_multihead(c, ct, hp, a_s, a_d,
                                                       slope, interp))
            try:
                dt_u, dt_ufb, _ = bench_layer(conv, params, gc, x, tgt,
                                              tag + " unfused (r4 path)",
                                              results, base + "_unfused_r4",
                                              jax, jnp, ref)
            finally:
                gatmod.gat_attention_chunked_fused = orig
            results[base + "_fused"]["vs_unfused_r4"] = round(dt_u / dt_f, 2)
            results[base + "_fused"]["fwd_bwd_vs_unfused_r4"] = round(
                dt_ufb / dt_ffb, 2)

    print(json.dumps(results))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
