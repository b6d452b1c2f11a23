"""SpMM hardware A/B: window-fused kernel vs r3 gather kernel vs XLA (r5).

Produces ``benchmarks/results/spmm_tpu_r5.json``. Graphs at r3 scale
(500k nodes, 8M edges, F=128):

* ``clustered`` — SBM (communities of 2048, 90 % intra): the structure the
  reference's real benchmark graphs (products/reddit) and its own COG
  preprocessing produce. The windowed kernel's design point.
* ``random``    — r3's power-law-dst/uniform-src graph: the adversarial case
  (a true expander: no ordering can manufacture locality; the hybrid builder
  routes most edges residual and the classic path rules — honest negative).
* ``shuffled_sbm`` (r5) — the SBM with node ids randomly permuted: locality
  EXISTS but not in id space, the shape of every un-preprocessed real
  power-law graph. Benched as-is AND through ``reorder_for_locality``
  (``parallel/reorder.py`` — the reference's COG preprocessing applied to the
  kernel layout), with preprocessing seconds reported alongside, as the
  reference's COG timing CSVs do (``cog.py:250-253``).

Metrics per row: ms (dependent-chain slope, relay-safe), Medges/s,
``roofline_fraction`` (r2/r3-continuity: 3x E_pad*F traffic basis at 819 GB/s),
``min_bytes_fraction`` (fundamental: one read of E_pad source rows + one output
write), and vs_* speedups. ``fwd_bwd`` rows time the custom-VJP train-through.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from timing import chain_time  # noqa: E402

HBM_GBPS = 819.0


def graphs(n, e, rng):
    out = {}
    csize, intra = 2048, 0.9
    dst = rng.integers(0, n, e)
    comm = dst // csize
    loc = rng.random(e) < intra
    src = np.where(loc, comm * csize + rng.integers(0, csize, e),
                   rng.integers(0, n, e)) % n
    out["clustered"] = (src.astype(np.int64), dst.astype(np.int64))

    w = (np.arange(n, dtype=np.float64) + 1.0) ** -1.0
    cdf = np.cumsum(w); cdf /= cdf[-1]
    dst2 = np.sort(np.searchsorted(cdf, rng.random(e)).astype(np.int64))
    src2 = rng.integers(0, n, e).astype(np.int64)
    out["random"] = (src2, dst2)

    # r5: hidden locality — SBM with shuffled ids (reorder target)
    shuf = rng.permutation(n)
    out["shuffled_sbm"] = (shuf[out["clustered"][0]], shuf[out["clustered"][1]])
    return out


def main():
    import jax
    import jax.numpy as jnp

    from dgll_tpu.ops import spmm_coo
    from dgll_tpu.ops.chunked import build_chunked_pair, chunked_to_device
    from dgll_tpu.ops.pallas.segment_matmul import spmm_chunked
    from dgll_tpu.ops.pallas.spmm_windowed import spmm_hybrid
    from dgll_tpu.ops.windowed import build_hybrid_pair, hybrid_to_device

    n_node = int(os.environ.get("SB_NODES", 500_000))
    avg_deg = int(os.environ.get("SB_DEG", 16))
    feat_dim = int(os.environ.get("SB_DIM", 128))
    out_path = os.environ.get(
        "SB_OUT", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "results", "spmm_tpu_r5.json"))
    n_edge = n_node * avg_deg
    rng = np.random.default_rng(0)

    results = {"device": str(jax.devices()[0]), "n_node": n_node,
               "n_edge": n_edge, "feat_dim": feat_dim, "hbm_gbps_ref": HBM_GBPS,
               "graphs": {}}

    x0 = jnp.asarray(rng.standard_normal((n_node, feat_dim), dtype=np.float32))

    for gname, (src, dst) in graphs(n_node, n_edge, rng).items():
        ew = rng.random(n_edge).astype(np.float32)
        g = {}

        srcd, dstd, ewd = jnp.asarray(src), jnp.asarray(dst), jnp.asarray(ew)
        f_seg = jax.jit(lambda x: spmm_coo(srcd, dstd, x, n_node, ewd) * 0.5)
        dt = chain_time(f_seg, x0)
        g["xla_segment_sum"] = {"ms": round(dt * 1e3, 2),
                                "medges_per_s": round(n_edge / dt / 1e6, 1)}
        print(f"[{gname}] segment_sum {dt*1e3:.2f} ms", flush=True)
        del srcd, dstd, ewd

        # r3 classic gather kernel (the incumbent)
        c, ct = build_chunked_pair(src, dst, n_node, n_node, ew, eb=512)
        c, ct = chunked_to_device(c), chunked_to_device(ct)
        e_pad_c = c.n_chunk * c.eb
        f_classic = jax.jit(
            lambda x: spmm_chunked(c, ct, x, interpret=c.interpret)[:n_node] * 0.5)
        dt_c = chain_time(f_classic, x0)
        g["classic_pallas_f32"] = _row(dt_c, n_edge, e_pad_c, feat_dim, 4,
                                       n_node, dt)
        print(f"[{gname}] classic {dt_c*1e3:.2f} ms", flush=True)

        # round-4 window-fused hybrid
        h, ht = build_hybrid_pair(src, dst, n_node, n_node, ew)
        h, ht = hybrid_to_device(h), hybrid_to_device(ht)
        slots = h.win.n_chunk * h.win.eb
        if h.res is not None:
            slots += h.res.n_chunk * h.res.eb
        for tag, mdt, isz in (("f32", None, 4), ("bf16", jnp.bfloat16, 2)):
            # layouts as jit ARGUMENTS, not closure constants — embedded
            # constants blow past the remote-compile request size limit
            f_hyb_raw = jax.jit(
                lambda x, h_, ht_, _m=mdt: spmm_hybrid(
                    h_, ht_, x, msg_dtype=_m)[:n_node] * 0.5)
            f_hyb = lambda x: f_hyb_raw(x, h, ht)
            dt_h = chain_time(f_hyb, x0)
            row = _row(dt_h, n_edge, e_pad_c, feat_dim, isz, n_node, dt)
            row["windowed_fraction"] = round(h.windowed_fraction, 3)
            row["slots_per_edge"] = round(slots / n_edge, 2)
            row["vs_classic"] = round(dt_c / dt_h, 2)
            g[f"hybrid_windowed_{tag}"] = row
            print(f"[{gname}] hybrid_{tag} {dt_h*1e3:.2f} ms "
                  f"(x{dt_c/dt_h:.2f} vs classic)", flush=True)

        # trained-through: fwd + custom-VJP backward in one chained step
        t_target = jnp.asarray(
            rng.standard_normal((h.win.n_rows, feat_dim), dtype=np.float32))

        @jax.jit
        def fb_raw(x, h_, ht_, t_):
            def lo(x_):
                o = spmm_hybrid(h_, ht_, x_, activation="relu")
                return jnp.vdot(o, t_)
            return jax.grad(lo)(x) * 1e-3 + x * 0.5

        dt_fb = chain_time(lambda x: fb_raw(x, h, ht, t_target), x0)
        g["hybrid_fwd_bwd_f32"] = {"ms": round(dt_fb * 1e3, 2),
                                   "medges_per_s_2pass":
                                       round(2 * n_edge / dt_fb / 1e6, 1)}
        print(f"[{gname}] fwd+bwd {dt_fb*1e3:.2f} ms", flush=True)

        # ---- r5: manufacture locality (VERDICT r4 ask #1) — reorder, then
        # windowed; preprocessing time reported alongside (COG-CSV style)
        if gname == "shuffled_sbm":
            import time as _time

            from dgll_tpu.graph import Graph
            from dgll_tpu.parallel.reorder import reorder_for_locality

            t0p = _time.perf_counter()
            gtmp = Graph.from_edges(src, dst, n_node, edge_weight=ew)
            g2, info = reorder_for_locality(gtmp)
            pre_s = _time.perf_counter() - t0p
            src_r = np.asarray(g2.src)[: g2.n_real_edge]
            dst_r = np.asarray(g2.dst)[: g2.n_real_edge]
            ew_r = np.asarray(g2.edge_weight)[: g2.n_real_edge]
            t0b = _time.perf_counter()
            hr, htr = build_hybrid_pair(src_r, dst_r, n_node, n_node, ew_r)
            build_s = _time.perf_counter() - t0b
            hr, htr = hybrid_to_device(hr), hybrid_to_device(htr)

            f_r_raw = jax.jit(lambda x, h_, ht_: spmm_hybrid(
                h_, ht_, x)[:n_node] * 0.5)
            dt_r = chain_time(lambda x: f_r_raw(x, hr, htr), x0)
            row = _row(dt_r, n_edge, e_pad_c, feat_dim, 4, n_node, dt)
            row.update({
                "windowed_fraction": round(hr.windowed_fraction, 3),
                "vs_classic": round(dt_c / dt_r, 2),
                "vs_unreordered_hybrid": round(
                    g["hybrid_windowed_f32"]["ms"] / (dt_r * 1e3), 2),
                "reorder_method": info["chosen"],
                "reorder_s": round(pre_s, 2),
                "layout_build_s": round(build_s, 2),
                "estimates": {k: round(v, 3) for k, v in info.items()
                              if k.startswith("estimate")},
            })
            g["hybrid_windowed_f32_reordered"] = row
            print(f"[{gname}] reordered({info['chosen']}) {dt_r*1e3:.2f} ms "
                  f"(frac {hr.windowed_fraction:.2f}, pre {pre_s:.1f}s)",
                  flush=True)

            dt_rfb = chain_time(lambda x: fb_raw(x, hr, htr, t_target), x0)
            g["hybrid_fwd_bwd_f32_reordered"] = {
                "ms": round(dt_rfb * 1e3, 2),
                "medges_per_s_2pass": round(2 * n_edge / dt_rfb / 1e6, 1)}
            print(f"[{gname}] reordered fwd+bwd {dt_rfb*1e3:.2f} ms",
                  flush=True)

        results["graphs"][gname] = g

    print(json.dumps(results, indent=1))
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out_path)


def functools_partial_spmm(fn, h, ht, mdt, n_node):
    def f(x):
        return fn(h, ht, x, msg_dtype=mdt)[:n_node] * 0.5
    return f


def _row(dt, n_edge, e_pad, feat_dim, itemsize, n_node, dt_seg):
    bytes_impl = e_pad * feat_dim * 3 * itemsize + n_node * feat_dim * 4
    bytes_min = e_pad * feat_dim * itemsize + n_node * feat_dim * 4
    return {
        "ms": round(dt * 1e3, 2),
        "medges_per_s": round(n_edge / dt / 1e6, 1),
        "roofline_fraction": round(bytes_impl / dt / 1e9 / HBM_GBPS, 3),
        "min_bytes_fraction": round(bytes_min / dt / 1e9 / HBM_GBPS, 3),
        "vs_segment_sum": round(dt_seg / dt, 2),
    }


if __name__ == "__main__":
    main()
