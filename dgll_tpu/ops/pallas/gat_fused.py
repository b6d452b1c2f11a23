"""Fused sparse GAT attention: scores + online softmax + aggregation in 3 launches.

Round-4's GAT path composed five metadata-layout launches per layer around the
aggregation (dst-score broadcast + 4-launch softmax: max-reduce, max-broadcast,
sum-reduce, den-broadcast; ``ops/pallas/edge_ops.py``). At ~1.5 us/grid-step
(measured, ``pallas_probe_r4.json``) and one grid step per chunk per launch,
launches — not math — dominate GAT time. This module folds the whole
pre-aggregation pipeline into TWO kernels and reuses the premultiplied-message
scatter for the third:

* ``gat_stats``  — ONE online-softmax sweep: builds the per-chunk hit matrix
  once, forms the masked scores ``e = leaky(sc_src + s_dst[dst])`` in-register
  ([R, EB] broadcast sum — the dst-score broadcast launch is gone), and
  accumulates per-destination running max ``m`` and rescaled ``sum exp`` den
  (flash-attention-style online update) into revisited [R, 1] output tiles.
  This is the round-5 answer to "fold max/sub-exp/sum into a single revisiting
  pass": the 4-launch softmax's reductions happen in ONE launch.
* ``gat_alpha``  — normalisation as three MXU matvecs per head (``s_dst``,
  ``m``, ``1/den`` brought to edges through the shared hit matrix), then
  ``alpha = exp(leaky(z) - m_dst) * invden_dst`` on the VPU — no [R, EB]
  materialisation, plus the leaky-gradient factor plane for the backward.
* aggregation — the existing unit-weight chunked scatter over messages
  premultiplied by ``alpha`` (``segment_matmul.spmm_chunked_pallas``).

Backward (custom VJP) recomputes nothing: ``alpha`` and the leaky factors are
forward residuals; 4 launches (g expand, ``sum alpha*dalpha`` reduce, its
broadcast, ``d s_dst`` reduce) replace round-4's five plus the [E, H, F] XLA
einsum chain. Reference: sparse GAT autograd ``/root/reference/dgll/nn/
Convolution/gatconv.py:60-148`` (SpecialSpmmFunction + per-edge softmax).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dgll_tpu.ops.chunked import R_BLOCK, ChunkedCSR
from dgll_tpu.ops.pallas.edge_ops import NEG, _e2r_sum_multi_d
from dgll_tpu.ops.pallas.expand_rows import expand_rows_chunked
from dgll_tpu.ops.pallas.segment_matmul import spmm_chunked_pallas, zero_cotangent


def _stats_kernel(rb_ref, dstl_ref, w_ref, *refs, H: int, slope: float):
    # refs: sc_0..sc_{H-1} [8, EB] planes, sd_0..sd_{H-1} [R, 1] columns,
    #       m_0.., den_0.. outputs [R, 1], then scratch accs (2H x [R, 1])
    sc_refs = refs[:H]
    sd_refs = refs[H:2 * H]
    m_refs = refs[2 * H:3 * H]
    den_refs = refs[3 * H:4 * H]
    accm_refs = refs[4 * H:5 * H]
    accd_refs = refs[5 * H:]

    c = pl.program_id(0)
    n_chunk = pl.num_programs(0)
    rb = rb_ref[c]
    is_first = jnp.logical_or(c == 0, rb_ref[jnp.maximum(c - 1, 0)] != rb)
    is_last = jnp.logical_or(
        c == n_chunk - 1, rb_ref[jnp.minimum(c + 1, n_chunk - 1)] != rb)
    cm = c % 8
    dstl = dstl_ref[pl.ds(cm, 1), :]                               # [1, EB]
    eb = dstl.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (R_BLOCK, eb), 0)
    hit = (rows == dstl) & (w_ref[pl.ds(cm, 1), :] != 0.0)         # [R, EB]

    for h in range(H):
        sc = sc_refs[h][pl.ds(cm, 1), :]                           # [1, EB]
        sd = sd_refs[h][:]                                         # [R, 1]
        z = sc + sd                                                # [R, EB]
        e = jnp.where(z > 0, z, slope * z)
        e = jnp.where(hit, e, NEG)
        pmax = jnp.max(e, axis=1, keepdims=True)                   # [R, 1]

        @pl.when(is_first)
        def _(h=h, pmax=pmax, e=e, hit=hit):
            accm_refs[h][:] = pmax
            accd_refs[h][:] = jnp.sum(
                jnp.where(hit, jnp.exp(e - pmax), 0.0), axis=1, keepdims=True)

        @pl.when(jnp.logical_not(is_first))
        def _(h=h, pmax=pmax, e=e, hit=hit):
            old_m = accm_refs[h][:]
            new_m = jnp.maximum(old_m, pmax)
            part = jnp.sum(
                jnp.where(hit, jnp.exp(e - new_m), 0.0), axis=1, keepdims=True)
            accd_refs[h][:] = accd_refs[h][:] * jnp.exp(old_m - new_m) + part
            accm_refs[h][:] = new_m

        @pl.when(is_last)
        def _(h=h):
            m_refs[h][:] = accm_refs[h][:]
            den_refs[h][:] = accd_refs[h][:]


def gat_stats(c: ChunkedCSR, sc_src: jax.Array, s_dst: jax.Array,
              negative_slope: float = 0.2, interpret=None):
    """Per-destination softmax stats in ONE online sweep.

    ``sc_src [n_chunk_meta*EB, H]`` per-edge source scores (metadata layout),
    ``s_dst [n_rows, H]`` per-destination scores. Returns ``(m, den)`` each
    ``[n_rows, H]`` (m == NEG marker and den == 0 for edgeless rows).
    """
    if interpret is None:
        interpret = c.interpret
    H = sc_src.shape[-1]
    nm, eb = c.n_chunk_meta, c.eb
    sc_planes = [sc_src[:, h].reshape(nm, eb).astype(jnp.float32)
                 for h in range(H)]
    sd_cols = [s_dst[:, h:h + 1].astype(jnp.float32) for h in range(H)]

    mspec = pl.BlockSpec((8, eb), lambda ci, rb: (ci // 8, 0))
    colspec = pl.BlockSpec((R_BLOCK, 1), lambda ci, rb: (rb[ci], 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c.n_chunk,),
        in_specs=[mspec, mspec] + [mspec] * H + [colspec] * H,
        out_specs=tuple([colspec] * (2 * H)),
        scratch_shapes=[pltpu.VMEM((R_BLOCK, 1), jnp.float32)
                        for _ in range(2 * H)],
    )
    outs = pl.pallas_call(
        functools.partial(_stats_kernel, H=H, slope=float(negative_slope)),
        grid_spec=grid_spec,
        out_shape=tuple(jax.ShapeDtypeStruct((c.n_rows, 1), jnp.float32)
                        for _ in range(2 * H)),
        interpret=interpret,
    )(c.row_block, c.dst_local, c.weight, *sc_planes, *sd_cols)
    m = jnp.concatenate(outs[:H], axis=-1)
    den = jnp.concatenate(outs[H:], axis=-1)
    return m, den


def _alpha_kernel(rb_ref, dstl_ref, w_ref, *refs, H: int, slope: float):
    # refs: sc planes [H], then ROW-plane tiles for sd/m/invden ([8, R_BLOCK]
    # each — full-lane [1, R] reads; Mosaic cannot transpose a [R, 1] column
    # in-kernel), then alpha outs [H], lgrad outs [H]
    sc_refs = refs[:H]
    sd_refs = refs[H:2 * H]
    m_refs = refs[2 * H:3 * H]
    iv_refs = refs[3 * H:4 * H]
    a_refs = refs[4 * H:5 * H]
    lg_refs = refs[5 * H:]

    c = pl.program_id(0)
    cm = c % 8
    rbm = rb_ref[c] % 8
    dstl = dstl_ref[pl.ds(cm, 1), :]
    eb = dstl.shape[1]
    w = w_ref[pl.ds(cm, 1), :]
    rows = jax.lax.broadcasted_iota(jnp.int32, (R_BLOCK, eb), 0)
    hitf = ((rows == dstl) & (w != 0.0)).astype(jnp.float32)       # [R, EB]

    # ALL 3H dst-indexed row quantities (s_dst, m, 1/den per head) ride ONE
    # [3H, R] @ [R, EB] MXU call per grid step, at HIGHEST precision: the
    # default bf16-input pass truncates the stats enough (~5% alpha rel err)
    # to fail the kernel-agreement bar, and per-quantity matvecs at HIGHEST
    # cost 3 passes EACH (measured +34% fwd time) — one batched matmul pays
    # the 3-pass cost once.
    stacked = jnp.concatenate(
        [r[pl.ds(rbm, 1), :] for r in (*sd_refs, *m_refs, *iv_refs)], axis=0)
    E3 = jax.lax.dot(stacked, hitf,                               # [3H, EB]
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)

    valid = w != 0.0
    for h in range(H):
        sc = sc_refs[h][pl.ds(cm, 1), :]                           # [1, EB]
        # h is a Python int (unrolled loop) -> static slices (Pallas TPU has
        # no dynamic_slice lowering for values)
        sd_e = E3[h:h + 1, :]
        m_e = E3[H + h:H + h + 1, :]
        iv_e = E3[2 * H + h:2 * H + h + 1, :]
        z = sc + sd_e
        lg = jnp.where(z > 0, 1.0, slope)
        e = jnp.where(z > 0, z, slope * z)
        # e <= m on hit edges; non-hit lanes masked to 0 (exp may overflow
        # there — masked before any multiply, so no NaN can form)
        a = jnp.where(valid, jnp.exp(jnp.minimum(e - m_e, 0.0)) * iv_e, 0.0)
        a_refs[h][pl.ds(cm, 1), :] = a
        lg_refs[h][pl.ds(cm, 1), :] = jnp.where(valid, lg, 0.0)


def _row_planes(x, n_row_blocks, nrb8):
    """[n_rows, H] -> H row-plane arrays [nrb8, R_BLOCK] (full-lane reads)."""
    H = x.shape[-1]
    return [
        jnp.pad(x[:, h].reshape(n_row_blocks, R_BLOCK).astype(jnp.float32),
                ((0, nrb8 - n_row_blocks), (0, 0)))
        for h in range(H)
    ]


def gat_alpha(c: ChunkedCSR, sc_src, s_dst, m, den,
              negative_slope: float = 0.2, interpret=None):
    """Normalised attention + leaky-grad factor per edge slot.

    Returns ``(alpha, lgrad)`` both ``[n_chunk_meta*EB, H]``."""
    if interpret is None:
        interpret = c.interpret
    H = sc_src.shape[-1]
    nm, eb = c.n_chunk_meta, c.eb
    nrb8 = ((c.n_row_blocks + 7) // 8) * 8
    sc_planes = [sc_src[:, h].reshape(nm, eb).astype(jnp.float32)
                 for h in range(H)]
    sd_rp = _row_planes(s_dst, c.n_row_blocks, nrb8)
    m_rp = _row_planes(m, c.n_row_blocks, nrb8)
    iv_rp = _row_planes(1.0 / jnp.maximum(den, 1e-16), c.n_row_blocks, nrb8)

    mspec = pl.BlockSpec((8, eb), lambda ci, rb: (ci // 8, 0))
    rpspec = pl.BlockSpec((8, R_BLOCK), lambda ci, rb: (rb[ci] // 8, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c.n_chunk,),
        in_specs=[mspec, mspec] + [mspec] * H + [rpspec] * (3 * H),
        out_specs=tuple([mspec] * (2 * H)),
    )
    outs = pl.pallas_call(
        functools.partial(_alpha_kernel, H=H, slope=float(negative_slope)),
        grid_spec=grid_spec,
        out_shape=tuple(jax.ShapeDtypeStruct((nm, eb), jnp.float32)
                        for _ in range(2 * H)),
        interpret=interpret,
    )(c.row_block, c.dst_local, c.weight,
      *sc_planes, *sd_rp, *m_rp, *iv_rp)
    live = jnp.arange(nm)[:, None] < c.n_chunk
    alpha = jnp.stack(
        [jnp.where(live, o, 0.0).reshape(-1) for o in outs[:H]], axis=-1)
    lgrad = jnp.stack(
        [jnp.where(live, o, 0.0).reshape(-1) for o in outs[H:]], axis=-1)
    return alpha, lgrad


def _valid01(c: ChunkedCSR):
    return (c.weight != 0).astype(jnp.float32)


def head_expand(H: int, f: int, dtype=jnp.float32) -> jax.Array:
    """[H, H*f] one-hot expander: ``alpha @ head_expand`` broadcasts per-head
    values over that head's feature lanes WITHOUT any rank-3 [E, H, f] array —
    a [E, H, f] intermediate tile-pads (8, 128) on its minor dims (f -> 128),
    an 8x HBM inflation that OOMs at edge scale (hit live on the 3.3M-edge
    bench). Everything E-sized stays rank-2; the expander matmul is tiny."""
    return jnp.repeat(jnp.eye(H, dtype=dtype), f, axis=1)


def _bwd_sm_kernel(rb_ref, dstl_ref, w_ref, *refs, H: int):
    # refs: alpha planes [H], dalpha planes [H], lgrad planes [H],
    #       S row-planes [H]; outs: dz planes [H], dsd cols [H]; scratch [H]
    a_refs = refs[:H]
    da_refs = refs[H:2 * H]
    lg_refs = refs[2 * H:3 * H]
    S_refs = refs[3 * H:4 * H]
    dz_refs = refs[4 * H:5 * H]
    dsd_refs = refs[5 * H:6 * H]
    acc_refs = refs[6 * H:]

    c = pl.program_id(0)
    n_chunk = pl.num_programs(0)
    rb = rb_ref[c]
    is_first = jnp.logical_or(c == 0, rb_ref[jnp.maximum(c - 1, 0)] != rb)
    is_last = jnp.logical_or(
        c == n_chunk - 1, rb_ref[jnp.minimum(c + 1, n_chunk - 1)] != rb)
    cm = c % 8
    rbm = rb % 8
    dstl = dstl_ref[pl.ds(cm, 1), :]
    eb = dstl.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (R_BLOCK, eb), 0)
    hitf = ((rows == dstl) & (w_ref[pl.ds(cm, 1), :] != 0.0)
            ).astype(jnp.float32)

    # all H dst-indexed S rows in ONE high-precision matmul (see gat_alpha)
    Sstack = jnp.concatenate([r[pl.ds(rbm, 1), :] for r in S_refs], axis=0)
    S_e = jax.lax.dot(Sstack, hitf, precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)        # [H, EB]

    for h in range(H):
        a = a_refs[h][pl.ds(cm, 1), :]
        da = da_refs[h][pl.ds(cm, 1), :]
        lg = lg_refs[h][pl.ds(cm, 1), :]
        dz = a * (da - S_e[h:h + 1, :]) * lg                     # softmax VJP
        dz_refs[h][pl.ds(cm, 1), :] = dz
        part = jax.lax.dot_general(                              # [R, 1]
            hitf, dz, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(is_first)
        def _(h=h, part=part):
            acc_refs[h][:] = part

        @pl.when(jnp.logical_not(is_first))
        def _(h=h, part=part):
            acc_refs[h][:] = acc_refs[h][:] + part

        @pl.when(is_last)
        def _(h=h):
            dsd_refs[h][:] = acc_refs[h][:]


def gat_bwd_softmax(c: ChunkedCSR, alpha, dalpha, lgrad, S, interpret=None):
    """Fused backward softmax: ``dz = alpha*(dalpha - S[dst])*lgrad`` AND its
    per-destination reduce ``dsd`` in ONE revisiting launch (replaces the
    broadcast + reduce launch pair plus the [E, H] XLA elementwise passes —
    [E, H] arrays lane-pad 8 -> 128, so every XLA pass over them moves 16x the
    logical bytes). Returns ``(dz [n_chunk_meta*EB, H], dsd [n_rows, H])``."""
    if interpret is None:
        interpret = c.interpret
    H = alpha.shape[-1]
    nm, eb = c.n_chunk_meta, c.eb
    nrb8 = ((c.n_row_blocks + 7) // 8) * 8

    def planes(x):
        return [x[:, h].reshape(nm, eb).astype(jnp.float32) for h in range(H)]

    S_rp = _row_planes(S, c.n_row_blocks, nrb8)
    mspec = pl.BlockSpec((8, eb), lambda ci, rb: (ci // 8, 0))
    rpspec = pl.BlockSpec((8, R_BLOCK), lambda ci, rb: (rb[ci] // 8, 0))
    colspec = pl.BlockSpec((R_BLOCK, 1), lambda ci, rb: (rb[ci], 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c.n_chunk,),
        in_specs=[mspec, mspec] + [mspec] * (3 * H) + [rpspec] * H,
        out_specs=tuple([mspec] * H + [colspec] * H),
        scratch_shapes=[pltpu.VMEM((R_BLOCK, 1), jnp.float32)
                        for _ in range(H)],
    )
    outs = pl.pallas_call(
        functools.partial(_bwd_sm_kernel, H=H),
        grid_spec=grid_spec,
        out_shape=tuple(
            [jax.ShapeDtypeStruct((nm, eb), jnp.float32) for _ in range(H)]
            + [jax.ShapeDtypeStruct((c.n_rows, 1), jnp.float32)
               for _ in range(H)]),
        interpret=interpret,
    )(c.row_block, c.dst_local, c.weight,
      *planes(alpha), *planes(dalpha), *planes(lgrad), *S_rp)
    live = jnp.arange(nm)[:, None] < c.n_chunk
    dz = jnp.stack([jnp.where(live, o, 0.0).reshape(-1) for o in outs[:H]],
                   axis=-1)
    dsd = jnp.concatenate(outs[H:], axis=-1)
    return dz, dsd


def head_proj(a: jax.Array) -> jax.Array:
    """[H, F] -> [H*F, H] block matrix: per-head dots as ONE rank-2 matmul."""
    H, F = a.shape
    return (a[:, :, None] * jnp.eye(H, dtype=a.dtype)[:, None, :]
            ).reshape(H * F, H)


def _scores(c, h, a_src, a_dst):
    nc, nm = c.n_chunk, c.n_chunk_meta
    msg = jnp.take(h, c.src[:nc].reshape(-1), axis=0)      # the one gather
    sc_src = (msg @ head_proj(a_src.astype(msg.dtype))).astype(jnp.float32)
    sc_src = jnp.pad(sc_src, ((0, (nm - nc) * c.eb), (0, 0)))
    s_dst = (h @ head_proj(a_dst.astype(h.dtype))).astype(jnp.float32)
    return msg, sc_src, s_dst


def _forward(c, ct, h, a_src, a_dst, drop_mask, negative_slope, interpret):
    H, f = a_src.shape
    e_rows = c.n_chunk * c.eb
    msg, sc_src, s_dst = _scores(c, h, a_src, a_dst)
    m, den = gat_stats(c, sc_src, s_dst, negative_slope, interpret)
    alpha, lgrad = gat_alpha(c, sc_src, s_dst, m, den, negative_slope,
                             interpret)
    alpha_d = alpha if drop_mask is None else alpha * drop_mask
    ex = head_expand(H, f, msg.dtype)
    msg_w = msg * (alpha_d[:e_rows].astype(msg.dtype) @ ex)  # rank-2 throughout
    out = spmm_chunked_pallas(c, msg_w, weights=_valid01(c),
                              interpret=interpret)
    return out, msg, alpha, lgrad


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _gat_fused(negative_slope, interpret, c: ChunkedCSR, ct: ChunkedCSR,
               h, a_src, a_dst, drop_mask):
    out, _, _, _ = _forward(c, ct, h, a_src, a_dst, drop_mask, negative_slope,
                            interpret)
    return out


def _gat_fwd(negative_slope, interpret, c, ct, h, a_src, a_dst, drop_mask):
    out, msg, alpha, lgrad = _forward(c, ct, h, a_src, a_dst, drop_mask,
                                      negative_slope, interpret)
    return out, (c, ct, h, a_src, a_dst, msg, alpha, lgrad, drop_mask)


def _gat_bwd(negative_slope, interpret, res, g):
    c, ct, h, a_src, a_dst, msg, alpha, lgrad, drop_mask = res
    H, f = a_src.shape
    e_rows = c.n_chunk * c.eb
    n_in = h.shape[0]

    # d msg_w: per-edge destination rows of g (one expand launch). Rank-2
    # everywhere — see head_expand (rank-3 [E, H, f] tile-pads 8x and OOMs).
    g_edges = expand_rows_chunked(c, g.astype(msg.dtype), interpret=interpret)
    ex = head_expand(H, f, jnp.float32)
    exm = ex.astype(msg.dtype)
    alpha_d = alpha if drop_mask is None else alpha * drop_mask
    a_hf = alpha_d[:e_rows].astype(msg.dtype) @ exm              # [E, H*f]
    dmsg = g_edges * a_hf
    dalpha = (g_edges * msg).astype(jnp.float32) @ ex.T
    if drop_mask is not None:       # out used dropped alpha: chain the mask
        dalpha = dalpha * drop_mask[: dalpha.shape[0]]
    dalpha = jnp.pad(dalpha, ((0, (c.n_chunk_meta - c.n_chunk) * c.eb), (0, 0)))

    # softmax VJP: dz = alpha * (dalpha - S[dst]) * leaky',
    # S = sum_dst alpha*dalpha. The broadcast of S, the elementwise chain and
    # the per-destination reduce of dz run in ONE fused launch.
    S = _e2r_sum_multi_d(interpret, c, alpha * dalpha)          # [n_rows, H]
    dz_full, dsd = gat_bwd_softmax(c, alpha, dalpha, lgrad, S, interpret)
    dz = dz_full[:e_rows]

    # score-path grads (all rank-2): sc_src = msg @ P(a_src), s_dst = h @ P(a_dst)
    Ps = head_proj(a_src.astype(msg.dtype))
    dmsg = dmsg + (dz.astype(msg.dtype) @ Ps.T)
    da_src = ((dz @ ex) * msg.astype(jnp.float32)).sum(0).reshape(H, f)
    dsd = dsd[: c.n_rows]                                       # [n_rows, H]
    dh = dsd[:n_in].astype(h.dtype) @ head_proj(a_dst.astype(h.dtype)).T
    da_dst = ((dsd @ ex) * h.astype(jnp.float32)[: c.n_rows]
              ).sum(0).reshape(H, f)

    # dh += scatter of dmsg by source id. With the slot permutation the
    # scatter rides the TRANSPOSE layout's compiled kernel (one [E] gather +
    # one chunked scatter) — XLA's serialized scatter-add at [E, H*F] is the
    # backward's dominant cost otherwise (measured 164 ms at 8M x 128).
    if c.t_slot_perm is not None:
        dmsg_z = jnp.concatenate(
            [dmsg, jnp.zeros((1, dmsg.shape[-1]), dmsg.dtype)], axis=0)
        dmsg_t = jnp.take(dmsg_z, c.t_slot_perm, axis=0)
        dh_msg = spmm_chunked_pallas(ct, dmsg_t, weights=_valid01(ct),
                                     interpret=interpret)[:n_in]
    else:
        src_flat = c.src[: c.n_chunk].reshape(-1)
        dh_msg = jax.ops.segment_sum(dmsg, src_flat, num_segments=n_in)
    dh = dh + dh_msg.astype(h.dtype)

    return (zero_cotangent(c), zero_cotangent(ct), dh,
            da_src.astype(a_src.dtype), da_dst.astype(a_dst.dtype),
            None if drop_mask is None else jnp.zeros_like(drop_mask))


_gat_fused.defvjp(_gat_fwd, _gat_bwd)


def gat_attention_fused(
    c: ChunkedCSR,
    ct: ChunkedCSR,
    h: jax.Array,
    a_src: jax.Array,
    a_dst: jax.Array,
    negative_slope: float = 0.2,
    interpret=None,
    drop_mask=None,
):
    """Fused multi-head sparse GAT layer (differentiable).

    ``h [c.n_rows, H*F]`` projected features (row-padded), ``a_src``/``a_dst``
    [H, F]. Gather, scores, online-softmax stats, alpha, and aggregation all
    live inside ONE custom-VJP op: three kernel launches forward (stats,
    alpha, scatter); backward is five launches with the dmsg scatter riding
    the transpose layout (no XLA scatter-add). Returns ``[n_rows, H, F]``.

    ``drop_mask [n_chunk_meta*eb, H]`` applies attention dropout: alpha is
    multiplied by the mask (caller pre-scales by 1/(1-p)), so GAT TRAINS
    through the kernel path too (the reference applies dropout to attention
    coefficients, ``gatconv.py:40,140``).
    """
    if interpret is None:
        interpret = c.interpret
    H = a_src.shape[0]
    out = _gat_fused(float(negative_slope), interpret, c, ct, h, a_src, a_dst,
                     drop_mask)
    return out.reshape(c.n_rows, H, -1)
