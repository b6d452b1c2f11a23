"""Why is bf16 window streaming time-neutral? (VERDICT r4 weak #1)

spmm_tpu_r4.json: the bf16 hybrid row moves HALF the window bytes in the same
wall time as f32 (31.3 vs 30.8 ms clustered), i.e. the kernel is NOT
bandwidth-bound there — but nothing diagnosed what it IS bound by. This probe
isolates the three candidate costs with timing-only layout variants (results
numerically wrong, timing valid):

* ``same_window``  — ``win_block[:] = 0``: every chunk streams the SAME
  aligned x window, so consecutive grid steps reuse the VMEM block and the
  per-chunk window DMA variety disappears. baseline − same_window ≈ DMA cost.
* ``aligned_subs`` — ``sub_off[:] = 0``: all sub-window dynamic slices start
  at 0. baseline − aligned_subs ≈ dynamic-slice overhead.
* grid floor — n_chunk × ~1.5 us/step (pallas_probe_r4's measured grid-step
  overhead): the launch-overhead bound.

Decision rule (VERDICT ask #3): if DMA cost is small next to compute/overhead,
int8 window streaming cannot pay — document and skip.

Run on TPU: ``python benchmarks/windowed_probe_r5.py``; env WP_NODES, WP_DEG,
WP_OUT.
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

    from dgll_tpu.ops.pallas.spmm_windowed import spmm_windowed_pallas
    from dgll_tpu.ops.windowed import build_hybrid, hybrid_to_device

    n_node = int(os.environ.get("WP_NODES", 500_000))
    avg_deg = int(os.environ.get("WP_DEG", 16))
    feat_dim = 128
    out_path = os.environ.get("WP_OUT", "")

    rng = np.random.default_rng(0)
    e = n_node * avg_deg
    csize, intra = 2048, 0.9
    dst = rng.integers(0, n_node, e)
    loc = rng.random(e) < intra
    src = np.where(loc, (dst // csize) * csize + rng.integers(0, csize, e),
                   rng.integers(0, n_node, e)) % n_node
    ew = rng.random(e).astype(np.float32)

    h = build_hybrid(src.astype(np.int64), dst.astype(np.int64), n_node,
                     n_node, ew)
    h = hybrid_to_device(h)
    win = h.win
    n_chunk = win.n_chunk
    x0 = jnp.asarray(rng.standard_normal((win.n_cols, feat_dim),
                                         dtype=np.float32))

    results = {
        "device": str(jax.devices()[0]), "n_node": n_node, "n_edge": e,
        "windowed_fraction": round(h.windowed_fraction, 3),
        "n_chunk": n_chunk,
        "grid_floor_ms_est": round(n_chunk * 1.5e-3, 2),
    }

    variants = {
        "baseline": win,
        "same_window": win.replace(win_block=jnp.zeros_like(win.win_block)),
        "aligned_subs": win.replace(sub_off=jnp.zeros_like(win.sub_off)),
    }
    for dt_name, mdt in (("f32", None), ("bf16", jnp.bfloat16)):
        xin = x0 if mdt is None else x0.astype(mdt)
        for vname, lay in variants.items():
            if dt_name == "bf16" and vname == "aligned_subs":
                continue  # slice cost is dtype-independent; save a compile

            @jax.jit
            def step(x, _l=lay):
                y = spmm_windowed_pallas(_l, x, out_dtype=jnp.float32,
                                         interpret=_l.interpret)
                y = jnp.pad(y, ((0, x.shape[0] - y.shape[0]), (0, 0)))
                return x + (y * 1e-6).astype(x.dtype)  # dependent chain

            dt = chain_time(step, xin)
            key = f"{dt_name}_{vname}"
            results[key] = round(dt * 1e3, 2)
            print(f"{key}: {dt*1e3:.2f} ms", flush=True)

    # decomposition
    for dt_name in ("f32", "bf16"):
        base = results.get(f"{dt_name}_baseline")
        samew = results.get(f"{dt_name}_same_window")
        if base and samew:
            results[f"{dt_name}_dma_cost_ms"] = round(base - samew, 2)
    if "f32_aligned_subs" in results:
        results["f32_subslice_cost_ms"] = round(
            results["f32_baseline"] - results["f32_aligned_subs"], 2)

    print(json.dumps(results))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
