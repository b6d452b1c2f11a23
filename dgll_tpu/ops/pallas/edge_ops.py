"""Chunk-layout edge<->row primitives: segment ops without scatters or gathers.

The GAT path's cost on TPU is not the aggregation kernel — it is the
[E]-granularity XLA ops around it (measured, ``gat_profile_r4.json``: the
segment-op edge softmax is ~70 % of the layer, the per-edge ``take`` lookups
most of the rest). These Pallas kernels express every per-destination
reduction / per-edge broadcast over the chunked layout (``ops/chunked.py``) as
one-hot compares + MXU matvecs with output-tile revisiting — the same
scatter-free machinery as the SpMM kernel, at metadata-layout granularity:

* ``rows_to_edges``      v[n_rows] -> per-edge v[dst_e]  (replaces take lookups)
* ``edges_to_rows_sum``  per-dst sums                    (replaces segment_sum)
* ``edges_to_rows_max``  per-dst maxima                  (replaces segment_max)

``edge_softmax_chunked_fast`` composes them into the full per-destination
softmax (numerically equal to the segment-op version; oracle-tested). Row
vectors travel as ``[n_rows, 1]`` / ``[nrb, 128]`` tiles; per-edge values ride
the metadata layout ``[n_chunk_meta, EB]``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dgll_tpu.ops.chunked import R_BLOCK, ChunkedCSR
from dgll_tpu.ops.pallas.segment_matmul import zero_cotangent

NEG = -3.0e38  # -inf stand-in that survives f32 arithmetic


def _nrb_pad8(c: ChunkedCSR) -> int:
    return ((c.n_row_blocks + 7) // 8) * 8


def _rows_to_edges_kernel(rb_ref, dstl_ref, v_ref, out_ref):
    c = pl.program_id(0)
    cm = c % 8
    rbm = rb_ref[c] % 8
    v = v_ref[pl.ds(rbm, 1), :]                                      # [1, R]
    dstl = dstl_ref[pl.ds(cm, 1), :]                                 # [1, EB]
    rows = jax.lax.broadcasted_iota(jnp.int32, (R_BLOCK, dstl.shape[1]), 0)
    M = (rows == dstl).astype(jnp.float32)                           # [R, EB]
    out_ref[pl.ds(cm, 1), :] = jnp.dot(v, M,
                                       preferred_element_type=jnp.float32)


def rows_to_edges(c: ChunkedCSR, v: jax.Array, interpret=None) -> jax.Array:
    """``out[chunk, e] = v[dst_global(chunk, e)]`` — [n_rows] -> metadata layout."""
    if interpret is None:
        interpret = c.interpret
    nrb8 = _nrb_pad8(c)
    v2 = jnp.pad(v.reshape(c.n_row_blocks, R_BLOCK).astype(jnp.float32),
                 ((0, nrb8 - c.n_row_blocks), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c.n_chunk,),
        in_specs=[
            pl.BlockSpec((8, c.eb), lambda ci, rb: (ci // 8, 0)),    # dst_local
            pl.BlockSpec((8, R_BLOCK), lambda ci, rb: (rb[ci] // 8, 0)),  # v tiles
        ],
        out_specs=pl.BlockSpec((8, c.eb), lambda ci, rb: (ci // 8, 0)),
    )
    out = pl.pallas_call(
        _rows_to_edges_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c.n_chunk_meta, c.eb), jnp.float32),
        interpret=interpret,
    )(c.row_block, c.dst_local, v2)
    # rows >= n_chunk are uninitialised output memory
    return jnp.where(jnp.arange(c.n_chunk_meta)[:, None] < c.n_chunk, out, 0.0)


def _reduce_kernel(rb_ref, dstl_ref, w_ref, e_ref, out_ref, acc_ref, *, op):
    c = pl.program_id(0)
    n_chunk = pl.num_programs(0)
    rb = rb_ref[c]
    is_first = jnp.logical_or(c == 0, rb_ref[jnp.maximum(c - 1, 0)] != rb)
    is_last = jnp.logical_or(
        c == n_chunk - 1, rb_ref[jnp.minimum(c + 1, n_chunk - 1)] != rb)
    cm = c % 8
    dstl = dstl_ref[pl.ds(cm, 1), :]                                 # [1, EB]
    vals = e_ref[pl.ds(cm, 1), :].astype(jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (R_BLOCK, dstl.shape[1]), 0)
    hit = rows == dstl                                               # [R, EB]
    if op != "sum_all":   # masked variants skip padding slots (weight == 0)
        hit = hit & (w_ref[pl.ds(cm, 1), :] != 0.0)
    if op.startswith("sum"):
        part = jax.lax.dot_general(
            hit.astype(jnp.float32), vals, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                      # [R, 1]
        init, combine = 0.0, lambda a, b: a + b
    else:  # max
        W = jnp.where(hit, vals, NEG)                                # [R, EB]
        part = jnp.max(W, axis=1, keepdims=True)                     # [R, 1]
        init, combine = NEG, jnp.maximum

    @pl.when(is_first)
    def _():
        acc_ref[...] = part

    @pl.when(jnp.logical_not(is_first))
    def _():
        acc_ref[...] = combine(acc_ref[...], part)

    @pl.when(is_last)
    def _():
        out_ref[...] = acc_ref[...]


def _edges_to_rows(c: ChunkedCSR, e_vals: jax.Array, op: str, interpret):
    if interpret is None:
        interpret = c.interpret
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c.n_chunk,),
        in_specs=[
            pl.BlockSpec((8, c.eb), lambda ci, rb: (ci // 8, 0)),    # dst_local
            pl.BlockSpec((8, c.eb), lambda ci, rb: (ci // 8, 0)),    # weight (valid)
            pl.BlockSpec((8, c.eb), lambda ci, rb: (ci // 8, 0)),    # edge values
        ],
        out_specs=pl.BlockSpec((R_BLOCK, 1), lambda ci, rb: (rb[ci], 0)),
        scratch_shapes=[pltpu.VMEM((R_BLOCK, 1), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_reduce_kernel, op=op),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c.n_rows, 1), jnp.float32),
        interpret=interpret,
    )(c.row_block, c.dst_local, c.weight, e_vals.astype(jnp.float32))
    return out.reshape(c.n_rows)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _edges_to_rows_max_d(interpret, c, e_vals):
    return _edges_to_rows(c, e_vals, "max", interpret)


def _e2rmax_fwd(interpret, c, e_vals):
    return _edges_to_rows(c, e_vals, "max", interpret), c


def _e2rmax_bwd(interpret, c, g):
    # zero gradient by construction: the max is only the softmax stability
    # shift, which cancels exactly in the softmax gradient
    return zero_cotangent(c), jnp.zeros((c.n_chunk_meta, c.eb), jnp.float32)


_edges_to_rows_max_d.defvjp(_e2rmax_fwd, _e2rmax_bwd)


def edges_to_rows_max(c: ChunkedCSR, e_vals, interpret=None) -> jax.Array:
    """``out[r] = max over valid edge slots with dst r`` (NEG where none).

    Gradient defined as ZERO (softmax-stability shift; cancels exactly)."""
    if interpret is None:
        interpret = c.interpret
    return _edges_to_rows_max_d(interpret, c, e_vals)


# ---- differentiable wrappers (pallas_call has no autodiff): the two linear
# ops are exact adjoints of each other.


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _rows_to_edges_d(interpret, c, v):
    return rows_to_edges(c, v, interpret)


def _r2e_fwd(interpret, c, v):
    return rows_to_edges(c, v, interpret), c


def _r2e_bwd(interpret, c, g):
    # adjoint: dv[r] = sum over ALL slots with dst r of g (callers guarantee
    # zero cotangent on padding slots — true for the softmax composition)
    return zero_cotangent(c), _edges_to_rows(c, g, "sum_all", interpret)


_rows_to_edges_d.defvjp(_r2e_fwd, _r2e_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _edges_to_rows_sum_d(interpret, c, e_vals):
    return _edges_to_rows(c, e_vals, "sum", interpret)


def _e2r_fwd(interpret, c, e_vals):
    return _edges_to_rows(c, e_vals, "sum", interpret), c


def _e2r_bwd(interpret, c, g):
    de = rows_to_edges(c, g, interpret)
    de = jnp.where(c.weight != 0.0, de, 0.0)   # forward summed valid slots only
    return zero_cotangent(c), de


_edges_to_rows_sum_d.defvjp(_e2r_fwd, _e2r_bwd)


def edges_to_rows_sum(c: ChunkedCSR, e_vals, interpret=None) -> jax.Array:
    """``out[r] = sum over valid edge slots with dst r`` (differentiable)."""
    if interpret is None:
        interpret = c.interpret
    return _edges_to_rows_sum_d(interpret, c, e_vals)


def rows_to_edges_d(c: ChunkedCSR, v, interpret=None) -> jax.Array:
    """Differentiable :func:`rows_to_edges`."""
    if interpret is None:
        interpret = c.interpret
    return _rows_to_edges_d(interpret, c, v)


def edge_softmax_chunked_fast(c: ChunkedCSR, scores: jax.Array,
                              interpret=None) -> jax.Array:
    """Per-destination softmax, scatter/gather-free.

    ``scores [n_chunk_meta * EB, H]`` -> alpha of the same shape. Per head:
    one max-reduce, one broadcast, one sum-reduce, one broadcast — four chunk
    kernels on the MXU/VPU instead of XLA segment scatters + [E] takes.
    """
    nm, eb = c.n_chunk_meta, c.eb
    H = scores.shape[-1]
    valid = c.weight != 0.0
    outs = []
    for h in range(H):
        s = scores[:, h].reshape(nm, eb)
        mx = edges_to_rows_max(c, s, interpret)   # zero-grad by construction
        mx = jnp.where(mx <= NEG / 2, 0.0, mx)
        mxe = rows_to_edges_d(c, mx, interpret)
        ex = jnp.where(valid, jnp.exp(s.astype(jnp.float32) - mxe), 0.0)
        den = edges_to_rows_sum(c, ex, interpret)
        dene = rows_to_edges_d(c, den, interpret)
        outs.append((ex / jnp.maximum(dene, 1e-16)).reshape(-1))
    return jnp.stack(outs, axis=-1)


# ---------------------------------------------------------------- multi-head
# One launch for ALL heads: the one-hot compare M is built once per chunk and
# shared across the H matvecs — vs H separate launches, this cuts grid-step
# overhead (the dominant cost at small per-chunk work) by ~H and the compare
# work by H. Heads travel as separate planes (full-lane reads only).


def _r2e_multi_kernel(rb_ref, dstl_ref, *refs):
    H = len(refs) // 2
    v_refs, out_refs = refs[:H], refs[H:]
    c = pl.program_id(0)
    cm = c % 8
    rbm = rb_ref[c] % 8
    dstl = dstl_ref[pl.ds(cm, 1), :]
    rows = jax.lax.broadcasted_iota(jnp.int32, (R_BLOCK, dstl.shape[1]), 0)
    M = (rows == dstl).astype(jnp.float32)                     # shared compare
    for h in range(H):
        out_refs[h][pl.ds(cm, 1), :] = jnp.dot(
            v_refs[h][pl.ds(rbm, 1), :], M,
            preferred_element_type=jnp.float32)


def _rows_to_edges_multi_impl(c: ChunkedCSR, v: jax.Array, interpret):
    H = v.shape[-1]
    nrb8 = _nrb_pad8(c)
    planes = [
        jnp.pad(v[:, h].reshape(c.n_row_blocks, R_BLOCK).astype(jnp.float32),
                ((0, nrb8 - c.n_row_blocks), (0, 0)))
        for h in range(H)
    ]
    vspec = pl.BlockSpec((8, R_BLOCK), lambda ci, rb: (rb[ci] // 8, 0))
    ospec = pl.BlockSpec((8, c.eb), lambda ci, rb: (ci // 8, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c.n_chunk,),
        in_specs=[pl.BlockSpec((8, c.eb), lambda ci, rb: (ci // 8, 0))]
        + [vspec] * H,
        out_specs=tuple([ospec] * H),
    )
    outs = pl.pallas_call(
        _r2e_multi_kernel,
        grid_spec=grid_spec,
        out_shape=tuple(jax.ShapeDtypeStruct((c.n_chunk_meta, c.eb), jnp.float32)
                        for _ in range(H)),
        interpret=interpret,
    )(c.row_block, c.dst_local, *planes)
    live = jnp.arange(c.n_chunk_meta)[:, None] < c.n_chunk
    return jnp.stack([jnp.where(live, o, 0.0).reshape(-1) for o in outs],
                     axis=-1)


def _e2r_multi_kernel(rb_ref, dstl_ref, w_ref, *refs, op, H):
    e_refs = refs[:H]
    out_refs = refs[H:2 * H]
    acc_refs = refs[2 * H:]
    c = pl.program_id(0)
    n_chunk = pl.num_programs(0)
    rb = rb_ref[c]
    is_first = jnp.logical_or(c == 0, rb_ref[jnp.maximum(c - 1, 0)] != rb)
    is_last = jnp.logical_or(
        c == n_chunk - 1, rb_ref[jnp.minimum(c + 1, n_chunk - 1)] != rb)
    cm = c % 8
    dstl = dstl_ref[pl.ds(cm, 1), :]
    rows = jax.lax.broadcasted_iota(jnp.int32, (R_BLOCK, dstl.shape[1]), 0)
    hit = rows == dstl
    if op != "sum_all":
        hit = hit & (w_ref[pl.ds(cm, 1), :] != 0.0)
    Mf = hit.astype(jnp.float32)
    for h in range(H):
        vals = e_refs[h][pl.ds(cm, 1), :].astype(jnp.float32)
        if op.startswith("sum"):
            part = jax.lax.dot_general(
                Mf, vals, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            combine = lambda a, b: a + b
        else:
            W = jnp.where(hit, vals, NEG)
            part = jnp.max(W, axis=1, keepdims=True)
            combine = jnp.maximum

        @pl.when(is_first)
        def _(part=part, h=h):
            acc_refs[h][...] = part

        @pl.when(jnp.logical_not(is_first))
        def _(part=part, h=h, combine=combine):
            acc_refs[h][...] = combine(acc_refs[h][...], part)

        @pl.when(is_last)
        def _(h=h):
            out_refs[h][...] = acc_refs[h][...]


def _edges_to_rows_multi_impl(c: ChunkedCSR, e_vals: jax.Array, op, interpret):
    H = e_vals.shape[-1]
    planes = [e_vals[:, h].reshape(c.n_chunk_meta, c.eb).astype(jnp.float32)
              for h in range(H)]
    mspec = pl.BlockSpec((8, c.eb), lambda ci, rb: (ci // 8, 0))
    ospec = pl.BlockSpec((R_BLOCK, 1), lambda ci, rb: (rb[ci], 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c.n_chunk,),
        in_specs=[mspec, mspec] + [mspec] * H,
        out_specs=tuple([ospec] * H),
        scratch_shapes=[pltpu.VMEM((R_BLOCK, 1), jnp.float32)
                        for _ in range(H)],
    )
    outs = pl.pallas_call(
        functools.partial(_e2r_multi_kernel, op=op, H=H),
        grid_spec=grid_spec,
        out_shape=tuple(jax.ShapeDtypeStruct((c.n_rows, 1), jnp.float32)
                        for _ in range(H)),
        interpret=interpret,
    )(c.row_block, c.dst_local, c.weight, *planes)
    return jnp.concatenate([o for o in outs], axis=-1)   # [n_rows, H]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _r2e_multi_d(interpret, c, v):
    return _rows_to_edges_multi_impl(c, v, interpret)


def _r2em_fwd(interpret, c, v):
    return _rows_to_edges_multi_impl(c, v, interpret), c


def _r2em_bwd(interpret, c, g):
    return zero_cotangent(c), _edges_to_rows_multi_impl(c, g, "sum_all", interpret)


_r2e_multi_d.defvjp(_r2em_fwd, _r2em_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _e2r_sum_multi_d(interpret, c, e_vals):
    return _edges_to_rows_multi_impl(c, e_vals, "sum", interpret)


def _e2rm_fwd(interpret, c, e_vals):
    return _edges_to_rows_multi_impl(c, e_vals, "sum", interpret), c


def _e2rm_bwd(interpret, c, g):
    de = _rows_to_edges_multi_impl(c, g, interpret)
    de = jnp.where((c.weight != 0.0).reshape(-1)[:, None], de, 0.0)
    return zero_cotangent(c), de


_e2r_sum_multi_d.defvjp(_e2rm_fwd, _e2rm_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _e2r_max_multi_d(interpret, c, e_vals):
    return _edges_to_rows_multi_impl(c, e_vals, "max", interpret)


def _e2rmaxm_fwd(interpret, c, e_vals):
    return _edges_to_rows_multi_impl(c, e_vals, "max", interpret), c


def _e2rmaxm_bwd(interpret, c, g):
    # softmax stability shift: zero gradient by construction
    return zero_cotangent(c), jnp.zeros(
        (c.n_chunk_meta * c.eb, g.shape[-1]), jnp.float32)


_e2r_max_multi_d.defvjp(_e2rmaxm_fwd, _e2rmaxm_bwd)


def rows_to_edges_multi(c: ChunkedCSR, v, interpret=None) -> jax.Array:
    """[n_rows, H] -> per-edge [n_chunk_meta*EB, H] in ONE launch (all heads)."""
    if interpret is None:
        interpret = c.interpret
    return _r2e_multi_d(interpret, c, v)


def edge_softmax_chunked_multi(c: ChunkedCSR, scores: jax.Array,
                               interpret=None) -> jax.Array:
    """All-heads per-destination softmax in FOUR kernel launches total."""
    if interpret is None:
        interpret = c.interpret
    valid = (c.weight != 0.0).reshape(-1)[:, None]
    mx = _e2r_max_multi_d(interpret, c, scores)            # [n_rows, H]
    mx = jnp.where(mx <= NEG / 2, 0.0, mx)
    mxe = _r2e_multi_d(interpret, c, mx)                   # [E, H]
    ex = jnp.where(valid, jnp.exp(scores.astype(jnp.float32) - mxe), 0.0)
    den = _e2r_sum_multi_d(interpret, c, ex)               # [n_rows, H]
    dene = _r2e_multi_d(interpret, c, den)
    return ex / jnp.maximum(dene, 1e-16)
