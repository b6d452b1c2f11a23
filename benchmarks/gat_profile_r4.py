"""GAT kernel stage profile (round 4, VERDICT #6): where do the ms go?

Times the multihead chunked-GAT forward's stages separately on hardware
(dependent-chain slope, relay-safe): source-row gather, score einsums + dst
row-gather, edge softmax (segment ops), weighted-message multiply, and the
aggregation kernel — then the full fwd and fwd+bwd. Writes
benchmarks/results/gat_profile_r4.json. Env: GP_NODES, GP_DEG, GP_HEADS, GP_F.
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

    from dgll_tpu.ops.chunked import R_BLOCK, build_chunked_pair, chunked_to_device
    from dgll_tpu.ops.pallas.gat import gat_attention_chunked_multihead, spmm_msg
    from dgll_tpu.ops.pallas.sddmm import edge_softmax_chunked_heads

    n = int(os.environ.get("GP_NODES", 200_000))
    deg = int(os.environ.get("GP_DEG", 16))
    H = int(os.environ.get("GP_HEADS", 8))
    F = int(os.environ.get("GP_F", 16))
    rng = np.random.default_rng(0)
    e = n * deg
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    c, ct = build_chunked_pair(src, dst, n, n, None, eb=512)
    c, ct = chunked_to_device(c), chunked_to_device(ct)
    nc, nm = c.n_chunk, c.n_chunk_meta
    e_rows = nc * c.eb

    h = jnp.asarray(rng.standard_normal((c.n_rows, H * F), dtype=np.float32))
    a_src = jnp.asarray(rng.standard_normal((H, F), dtype=np.float32))
    a_dst = jnp.asarray(rng.standard_normal((H, F), dtype=np.float32))
    csrc = jnp.asarray(np.asarray(c.src)[:nc].reshape(-1))
    dstg = jnp.asarray(
        (np.asarray(c.row_block)[:, None] * R_BLOCK + np.asarray(c.dst_local)).reshape(-1))

    res = {"device": str(jax.devices()[0]), "n_node": n, "n_edge": e,
           "heads": H, "f": F, "e_pad": e_rows}

    def t(name, fn, x0, scale=1.0):
        dt = chain_time(fn, x0)
        res[name] = {"ms": round(dt * 1e3, 2),
                     "medges_per_s": round(e / dt / 1e6, 1)}
        print(name, "->", res[name], flush=True)

    # 1. gather only
    t("gather", jax.jit(lambda x: jnp.take(x, csrc, axis=0)[: c.n_rows] * 0.5), h)

    # 2. scores (einsums + dst row-gather), fed from a materialised msg
    msg0 = jnp.take(h, csrc, axis=0)

    def scores(m):
        mh = m.reshape(e_rows, H, F)
        sc_src = jnp.einsum("ehf,hf->eh", mh, a_src)
        s_dst = jnp.einsum("nhf,hf->nh", h.reshape(-1, H, F), a_dst)
        sc_dst = jnp.take(s_dst, dstg, axis=0)
        out = sc_src + sc_dst[:e_rows]
        return m * 0.5 + jnp.pad(out, ((0, 0), (0, H * F - H))) * 1e-6

    t("scores_plus_dstgather", jax.jit(scores), msg0)

    # 3. edge softmax (segment ops over E scalars x H heads)
    sc0 = jnp.asarray(rng.standard_normal((nm * c.eb, H), dtype=np.float32))

    def smax(s):
        alpha = edge_softmax_chunked_heads(c, s)
        return alpha * 0.5 + s * 0.25

    t("edge_softmax_heads", jax.jit(smax), sc0)

    # 4. aggregation kernel alone (unit weights, width H*F)
    t("spmm_msg_kernel",
      jax.jit(lambda m: jnp.tile(spmm_msg(c, ct, m, c.interpret),
                                 (e_rows // c.n_rows + 1, 1))[:e_rows] * 0.5),
      msg0)

    # 5. full forward
    def full(hx):
        out = gat_attention_chunked_multihead(c, ct, hx, a_src, a_dst,
                                              interpret=c.interpret)
        return out.reshape(c.n_rows, H * F) * 0.5

    t("full_forward", jax.jit(full), h)

    # 6. fwd + bwd
    tgt = jnp.asarray(rng.standard_normal((c.n_rows, H, F), dtype=np.float32))

    def fb(hx):
        def lo(hx_):
            o = gat_attention_chunked_multihead(c, ct, hx_, a_src, a_dst,
                                                interpret=c.interpret)
            return jnp.vdot(o, tgt)
        return jax.grad(lo)(hx) * 1e-3 + hx * 0.5

    t("full_fwd_bwd", jax.jit(fb), h)

    print(json.dumps(res, indent=1))
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results", "gat_profile_r4.json")
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
