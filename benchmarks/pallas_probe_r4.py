"""Primitive-rate probe for the round-4 gather-fused SpMM design (TPU v5e).

The r3 SpMM kernel is gather-bound: XLA's row gather runs at a flat ~4 ns/row
(issue-rate-bound — width/locality independent, spmm_tpu_r3.json). Before
committing to a fused design, measure every candidate primitive ON THE HARDWARE:

  P0  pallas streaming HBM->HBM copy          (achievable-bandwidth calibration)
  P1  XLA take: f32 / bf16 / bf16-as-f32pairs (baseline + bf16-regression diagnosis)
  P2  pallas dynamic VMEM row-read gather     (pass-1 candidate: window gather)
  P2b pallas one-hot MXU window gather        (pass-1 candidate: matmul gather)
  P3  pallas dynamic VMEM row accumulate      (pass-2 candidate: scatter into tile)
  P4  pallas per-row DMA gather from HBM      (VERDICT's prescribed design)

Relay dispatch costs ~30 ms per call, so each variant runs K iterations inside
ONE jitted fori_loop (while-loops are not hoisted by XLA) and the measured
empty-dispatch overhead is subtracted. Timing: scalar D2H value read only
(block_until_ready lies over the relay — repo memory); median of repeats.
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
E = 2_097_152        # gathered rows / edges per trial (2^21)
EB = 512             # edges per chunk
WIN = 256            # src window rows (pass-1 window gather)
OUT_TILE = 8192      # pass-2 VMEM-resident output tile rows
K = 10               # in-jit iterations per timing
REPS = 5
INTERPRET = False


def timed(fn, *args):
    out = fn(*args)                      # compile + warm
    _ = float(jnp.asarray(out).ravel()[0])
    ts = []
    for _i in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.asarray(out).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def loopK(call):
    """Run call(i) K times inside one jit; depend on every output's [0,0]."""

    def run():
        def body(i, acc):
            return acc + call(i)[0, 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0)).reshape(1)

    return jax.jit(run)


# ---------------------------------------------------------------- P0: stream copy
def _copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:]


def p0_copy(x):
    m = x.shape[0]
    tb = 2048
    return pl.pallas_call(
        _copy_kernel,
        interpret=INTERPRET,
        grid=(m // tb,),
        in_specs=[pl.BlockSpec((tb, F), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tb, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, F), x.dtype),
    )(x)


# ---------------------------------------------------- P2: dynamic VMEM row gather
def _dynread_kernel(idx_ref, win_ref, o_ref):
    cm = pl.program_id(0) % 8

    def body(e, _):
        r = idx_ref[cm, e]
        o_ref[pl.ds(e, 1), :] = win_ref[pl.ds(r, 1), :]
        return 0

    jax.lax.fori_loop(0, EB, body, 0, unroll=8)


def p2_dynread(idx, win):
    nc = idx.shape[0]
    return pl.pallas_call(
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


# ------------------------------------------------ P2b: one-hot MXU window gather
def _onehot_kernel(idxv_ref, win_ref, o_ref):
    cols = jax.lax.broadcasted_iota(jnp.int32, (EB, WIN), 1)
    G = (cols == idxv_ref[:]).astype(win_ref.dtype)  # [EB, WIN]
    o_ref[:] = jnp.dot(G, win_ref[:], preferred_element_type=jnp.float32).astype(
        o_ref.dtype)


def p2b_onehot(idxv, win):
    nc = idxv.shape[0] // EB
    return pl.pallas_call(
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


# ---------------------------------------------------- P3: dynamic VMEM accumulate
def _dynacc_kernel(idx_ref, msg_ref, o_ref, acc_ref):
    c = pl.program_id(0)
    nc = pl.num_programs(0)
    cm = c % 8

    @pl.when(c == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(e, _):
        r = idx_ref[cm, e]
        acc_ref[pl.ds(r, 1), :] += msg_ref[pl.ds(e, 1), :].astype(jnp.float32)
        return 0

    jax.lax.fori_loop(0, EB, body, 0, unroll=8)

    @pl.when(c == nc - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def p3_dynacc(idx, msg):
    nc = idx.shape[0]
    return pl.pallas_call(
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
    return pl.pallas_call(
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


def main():
    global INTERPRET, N, E, REPS, K
    INTERPRET = jax.default_backend() != "tpu"
    if INTERPRET:
        N, E, REPS, K = 4096, 8192, 1, 2
    rng = np.random.default_rng(0)
    x32 = jnp.asarray(rng.standard_normal((N, F), dtype=np.float32))
    x16 = x32.astype(jnp.bfloat16)
    idx_flat = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
    idx_sorted = jnp.sort(idx_flat)
    nc = E // EB
    ncm = ((nc + 7) // 8) * 8  # SMEM metadata rows padded to the sublane tile
    idx_chunk = jnp.asarray(rng.integers(0, WIN, (ncm, EB)).astype(np.int32))
    idx_out = jnp.asarray(rng.integers(0, OUT_TILE, (ncm, EB)).astype(np.int32))
    idx_hbm = jnp.asarray(rng.integers(0, N, (ncm, EB)).astype(np.int32))
    win = x32[:WIN]
    msg = jnp.asarray(rng.standard_normal((nc * EB, F), dtype=np.float32))

    res = {"device": str(jax.devices()[0]), "N": N, "F": F, "E": E, "EB": EB,
           "K": K}

    if INTERPRET:
        got = np.asarray(p2_dynread(idx_chunk[:nc], win))
        want = np.asarray(win)[np.asarray(idx_chunk[:nc]).reshape(-1)]
        np.testing.assert_allclose(got, want, err_msg="p2_dynread")
        got = np.asarray(p2b_onehot(idx_chunk[:nc].reshape(-1, 1), win))
        np.testing.assert_allclose(got, want, rtol=1e-5, err_msg="p2b_onehot")
        got = np.asarray(p3_dynacc(idx_out[:nc], msg))
        want2 = np.zeros((OUT_TILE, F), np.float32)
        np.add.at(want2, np.asarray(idx_out[:nc]).reshape(-1), np.asarray(msg))
        np.testing.assert_allclose(got, want2, rtol=1e-4, err_msg="p3_dynacc")
        got = np.asarray(p4_dma(idx_hbm[:nc], x32))
        np.testing.assert_allclose(
            got, np.asarray(x32)[np.asarray(idx_hbm[:nc]).reshape(-1)],
            err_msg="p4_dma")
        print("interpret-mode correctness OK")

    # fixed dispatch overhead of one loopK-style call
    t_over = timed(loopK(lambda i: x32[:8, :8] + jnp.float32(i)))
    res["dispatch_overhead_ms"] = round(t_over * 1e3, 3)

    def rate(name, t, rows, bytes_per_row):
        per = max((t - t_over) / K, 1e-9)
        res[name] = {"ms": round(per * 1e3, 3),
                     "ns_per_row": round(per / rows * 1e9, 3),
                     "gbps": round(rows * bytes_per_row / per / 1e9, 1)}

    big = jnp.asarray(rng.standard_normal((E, F), dtype=np.float32))
    probes = [
        ("p0_stream_copy", lambda i: p0_copy(big), E, 2 * F * 4),
        ("p1_take_f32", lambda i: jnp.take(x32, idx_flat ^ (i & 0x0), axis=0),
         E, F * 4),
        ("p1_take_bf16", lambda i: jnp.take(x16, idx_flat, axis=0), E, F * 2),
        ("p1_take_f32_sorted", lambda i: jnp.take(x32, idx_sorted, axis=0),
         E, F * 4),
        ("p2_dynread", lambda i: p2_dynread(idx_chunk, win), E, F * 4),
        ("p2b_onehot", lambda i: p2b_onehot(idx_chunk[:nc].reshape(-1, 1), win),
         E, F * 4),
        ("p3_dynacc", lambda i: p3_dynacc(idx_out, msg), E, F * 4),
        ("p4_row_dma", lambda i: p4_dma(idx_hbm, x32), E, F * 4),
    ]
    for name, call, rows, bpr in probes:
        try:
            t = timed(loopK(call))
            rate(name, t, rows, bpr)
        except Exception as ex:  # pragma: no cover - probe robustness
            res[name] = {"error": f"{type(ex).__name__}: {str(ex)[:300]}"}
        print(name, "->", res[name], flush=True)

    print(json.dumps(res, indent=1))
    return res


if __name__ == "__main__":
    main()
