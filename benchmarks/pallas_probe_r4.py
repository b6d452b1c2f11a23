"""Primitive-rate probe for the round-4 gather-fused SpMM design (TPU v5e).

The r3 SpMM kernel is gather-bound: XLA's row gather runs at a flat ~4 ns/row
(issue-rate-bound — width/locality independent, spmm_tpu_r3.json). Before
committing to a fused design, measure every candidate primitive ON THE HARDWARE:

  P0  pallas streaming HBM->HBM copy          (achievable-bandwidth calibration)
  P1  XLA take: f32 / bf16 / sorted           (baseline + bf16-regression diagnosis)
  P2  pallas dynamic VMEM row-read gather     (pass-1 candidate: window gather)
  P2b pallas one-hot MXU window gather        (pass-1 candidate: matmul gather)
  P3  pallas dynamic VMEM row accumulate      (pass-2 candidate: scatter into tile)
  P4  pallas per-row DMA gather from HBM      (VERDICT's prescribed design)

Relay rules (repo memory): one dispatch costs ~49 ms RTT and uploads run at
~30 MB/s, so ALL data is generated on device, each probe is ONE jitted dispatch
over E=4M rows (op time >> RTT), the big output stays on device (only a scalar
is read back), and the measured empty-dispatch overhead is subtracted.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 500_000          # source rows
F = 128              # feature width
E = 4_194_304        # gathered rows / edges per trial (2^22)
EB = 512             # edges per chunk
WIN = 256            # src window rows (pass-1 window gather)
OUT_TILE = 8192      # pass-2 VMEM-resident output tile rows
REPS = 8
INTERPRET = False


def timed(fn, *args):
    out = fn(*args)                      # compile + warm
    _ = float(out[-1])                   # scalar D2H only
    ts = []
    for _i in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(out[-1])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


# ---------------------------------------------------------------- P0: stream copy
def _copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:]


def p0_copy(x):
    m = x.shape[0]
    tb = 2048
    out = pl.pallas_call(
        _copy_kernel,
        interpret=INTERPRET,
        grid=(m // tb,),
        in_specs=[pl.BlockSpec((tb, F), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tb, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, F), x.dtype),
    )(x)
    return out, out[0, 0]


# ---------------------------------------------------- P2: dynamic VMEM row gather
def _dynread_kernel(idx_ref, win_ref, o_ref):
    cm = pl.program_id(0) % 8

    def body(i, _):
        for u in range(8):           # manual 8-wide unroll (fori unroll=1 only)
            e = i * 8 + u
            r = idx_ref[cm, e]
            o_ref[pl.ds(e, 1), :] = win_ref[pl.ds(r, 1), :]
        return 0

    jax.lax.fori_loop(0, EB // 8, body, 0)


def p2_dynread(idx, win):
    nc = idx.shape[0]
    out = pl.pallas_call(
        _dynread_kernel,
        interpret=INTERPRET,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((8, EB), lambda i: (i // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((WIN, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((EB, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nc * EB, F), win.dtype),
    )(idx, win)
    return out, out[0, 0]


# ------------------------------------------------ P2b: one-hot MXU window gather
def _onehot_kernel(idxv_ref, win_ref, o_ref):
    cols = jax.lax.broadcasted_iota(jnp.int32, (EB, WIN), 1)
    G = (cols == idxv_ref[:]).astype(win_ref.dtype)  # [EB, WIN]
    o_ref[:] = jnp.dot(G, win_ref[:], preferred_element_type=jnp.float32).astype(
        o_ref.dtype)


def p2b_onehot(idxv, win):
    nc = idxv.shape[0] // EB
    out = pl.pallas_call(
        _onehot_kernel,
        interpret=INTERPRET,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((EB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((WIN, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((EB, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nc * EB, F), win.dtype),
    )(idxv, win)
    return out, out[0, 0]


# ---------------------------------------------------- P3: dynamic VMEM accumulate
def _dynacc_kernel(idx_ref, msg_ref, o_ref, acc_ref):
    c = pl.program_id(0)
    nc = pl.num_programs(0)
    cm = c % 8

    @pl.when(c == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(i, _):
        for u in range(8):           # manual 8-wide unroll (fori unroll=1 only)
            e = i * 8 + u
            r = idx_ref[cm, e]
            acc_ref[pl.ds(r, 1), :] += msg_ref[pl.ds(e, 1), :].astype(jnp.float32)
        return 0

    jax.lax.fori_loop(0, EB // 8, body, 0)

    @pl.when(c == nc - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def p3_dynacc(idx, msg):
    nc = idx.shape[0]
    out = pl.pallas_call(
        _dynacc_kernel,
        interpret=INTERPRET,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((8, EB), lambda i: (i // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((EB, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((OUT_TILE, F), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((OUT_TILE, F), msg.dtype),
        scratch_shapes=[pltpu.VMEM((OUT_TILE, F), jnp.float32)],
    )(idx, msg)
    return out, out[0, 0]


# ---------------------------------------------------- P4: per-row DMA gather (HBM)
DEPTH = 8


def _dma_kernel(idx_ref, x_hbm, o_ref, msg_ref, sems):
    cm = pl.program_id(0) % 8

    def get_dma(slot, e):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(idx_ref[cm, e], 1), :],
            msg_ref.at[pl.ds(e, 1), :],
            sems.at[slot],
        )

    for w in range(DEPTH):          # warm up the pipeline
        get_dma(w, w).start()

    def body(e, _):
        get_dma(e % DEPTH, e).wait()

        @pl.when(e + DEPTH < EB)
        def _():
            get_dma(e % DEPTH, e + DEPTH).start()

        return 0

    jax.lax.fori_loop(0, EB, body, 0)
    o_ref[:] = msg_ref[:]


def p4_dma(idx, x):
    nc = idx.shape[0]
    out = pl.pallas_call(
        _dma_kernel,
        interpret=INTERPRET,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((8, EB), lambda i: (i // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((EB, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nc * EB, F), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((EB, F), x.dtype),
            pltpu.SemaphoreType.DMA((DEPTH,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, x)
    return out, out[0, 0]


def main():
    global INTERPRET, N, E, REPS
    INTERPRET = jax.default_backend() != "tpu"
    if INTERPRET:
        N, E, REPS = 4096, 8192, 1
    nc = E // EB

    # ---- all data generated ON DEVICE (relay upload is ~30 MB/s; avoid it)
    @jax.jit
    def gen(key):
        ks = jax.random.split(key, 6)
        x32 = jax.random.normal(ks[0], (N, F), jnp.float32)
        idx_flat = jax.random.randint(ks[1], (E,), 0, N, jnp.int32)
        idx_chunk = jax.random.randint(ks[2], (nc, EB), 0, WIN, jnp.int32)
        idx_out = jax.random.randint(ks[3], (nc, EB), 0, OUT_TILE, jnp.int32)
        idx_hbm = jax.random.randint(ks[4], (nc, EB), 0, N, jnp.int32)
        msg = jax.random.normal(ks[5], (nc * EB, F), jnp.float32)
        return (x32, x32.astype(jnp.bfloat16), idx_flat, jnp.sort(idx_flat),
                idx_chunk, idx_out, idx_hbm, msg)

    x32, x16, idx_flat, idx_sorted, idx_chunk, idx_out, idx_hbm, msg = gen(
        jax.random.key(0))
    win = x32[:WIN]

    res = {"device": str(jax.devices()[0]), "N": N, "F": F, "E": E, "EB": EB}

    if INTERPRET:
        got, _ = p2_dynread(idx_chunk, win)
        want = np.asarray(win)[np.asarray(idx_chunk).reshape(-1)]
        np.testing.assert_allclose(np.asarray(got), want, err_msg="p2_dynread")
        got, _ = p2b_onehot(idx_chunk.reshape(-1, 1), win)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                                   err_msg="p2b_onehot")
        got, _ = p3_dynacc(idx_out, msg)
        want2 = np.zeros((OUT_TILE, F), np.float32)
        np.add.at(want2, np.asarray(idx_out).reshape(-1), np.asarray(msg))
        np.testing.assert_allclose(np.asarray(got), want2, rtol=1e-4,
                                   err_msg="p3_dynacc")
        got, _ = p4_dma(idx_hbm, x32)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(x32)[np.asarray(idx_hbm).reshape(-1)],
            err_msg="p4_dma")
        print("interpret-mode correctness OK")

    # empty-dispatch overhead: jitted slice + scalar D2H
    @jax.jit
    def trivial(a):
        return a[:8, :8], a[0, 0]

    t_over = timed(trivial, x32)
    res["dispatch_overhead_ms"] = round(t_over * 1e3, 3)

    def rate(name, t, rows, bytes_per_row):
        per = max(t - t_over, 1e-9)
        res[name] = {"ms": round(per * 1e3, 3),
                     "ns_per_row": round(per / rows * 1e9, 3),
                     "gbps": round(rows * bytes_per_row / per / 1e9, 1)}

    take = jax.jit(lambda x, i: ((o := jnp.take(x, i, axis=0)), o[0, 0]))
    probes = [
        ("p0_stream_copy", jax.jit(p0_copy), (msg,), E, 2 * F * 4),
        ("p1_take_f32", take, (x32, idx_flat), E, F * 4),
        ("p1_take_bf16", take, (x16, idx_flat), E, F * 2),
        ("p1_take_f32_sorted", take, (x32, idx_sorted), E, F * 4),
        ("p2_dynread", jax.jit(p2_dynread), (idx_chunk, win), E, F * 4),
        ("p2b_onehot", jax.jit(p2b_onehot),
         (idx_chunk.reshape(-1, 1), win), E, F * 4),
        ("p3_dynacc", jax.jit(p3_dynacc), (idx_out, msg), E, F * 4),
        ("p4_row_dma", jax.jit(p4_dma), (idx_hbm, x32), E, F * 4),
    ]
    for name, fn, args, rows, bpr in probes:
        try:
            t = timed(fn, *args)
            rate(name, t, rows, bpr)
        except Exception as ex:  # pragma: no cover - probe robustness
            res[name] = {"error": f"{type(ex).__name__}: {str(ex)[:300]}"}
        print(name, "->", res[name], flush=True)

    print(json.dumps(res, indent=1))
    return res


if __name__ == "__main__":
    main()
