"""Halo-exchange partitioned SpMM: boundary features move via all_to_all over ICI.

The v2 of ``parallel/gp.py``'s all_gather strategy and the structural centerpiece of
the multi-host design (SURVEY.md §2.7 / §5): each shard owns a contiguous
destination-row range; the *halo plan* precomputes, per (requester p, owner q) pair,
the unique boundary rows p needs from q, padded to one static size H. Each step then
does ONE static ``all_to_all`` of shape [D, H, F] — message volume proportional to the
partition cut (vs all_gather's full feature matrix), and XLA overlaps it with the
local gather. This replaces the reference's shared-memory graph store + remote fetch
(``FeatureCache/gcn.py:30``, ``storage.py:151-198``) with a compiled collective.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

from dgll_tpu.parallel.partition import PartitionedGraph


@struct.dataclass
class HaloPlan:
    send_ids: jax.Array    # [D, D, H] int32 — send_ids[q, p] = local rows q sends to p
    send_mask: jax.Array   # [D, D, H] bool
    src_remap: jax.Array   # [D, e_shard] int32 into [local rows | D*H halo rows]
    halo_size: int = struct.field(pytree_node=False, default=0)


def build_halo_plan(pg: PartitionedGraph, halo_multiple: int = 8) -> HaloPlan:
    """Host-side halo planning from the partitioned edge lists.

    Fully vectorised (no per-edge Python): per requester p, remote needs are the
    unique off-shard sources; slot assignment goes through an O(n_node) id->slot
    table instead of a dict, so planning a 100M-edge graph takes seconds.
    """
    D, rows = pg.n_shard, pg.rows_per_shard
    src = np.asarray(pg.src).astype(np.int64)   # [D, e_shard] global ids
    w = np.asarray(pg.edge_weight)
    n_node = D * rows

    # per requester p: sorted unique remote sources, already grouped by owner
    # (ids are contiguous per owner, so unique() output is owner-sorted for free)
    needs = []
    H = 1
    for p in range(D):
        sp = src[p]
        need = np.unique(sp[(sp // rows != p) & (w[p] != 0)])
        needs.append(need)
        if len(need):
            H = max(H, int(np.bincount(need // rows, minlength=D).max()))
    H = ((H + halo_multiple - 1) // halo_multiple) * halo_multiple

    send_ids = np.zeros((D, D, H), np.int32)     # [owner q, requester p]
    send_mask = np.zeros((D, D, H), bool)
    slot_of = np.zeros(n_node, np.int64)         # per-p id -> halo slot (reused)
    src_remap = np.zeros((D, src.shape[1]), np.int32)
    for p in range(D):
        need = needs[p]
        owner = need // rows
        # rank within owner group (need is sorted, so groups are runs)
        starts = np.searchsorted(owner, np.arange(D))
        within = np.arange(len(need), dtype=np.int64) - starts[owner]
        send_ids[owner, p, within] = (need - owner * rows).astype(np.int32)
        send_mask[owner, p, within] = True
        slot_of[need] = owner * H + within
        sp = src[p]
        local = (sp // rows) == p
        src_remap[p] = np.where(local, sp - p * rows, rows + slot_of[sp])
        slot_of[need] = 0  # reset touched entries for the next requester
    return HaloPlan(
        send_ids=jnp.asarray(send_ids),
        send_mask=jnp.asarray(send_mask),
        src_remap=jnp.asarray(src_remap),
        halo_size=H,
    )


def make_halo_spmm(mesh: Mesh, pg: PartitionedGraph, plan: HaloPlan,
                   axis: str = "data"):
    """Sharded out[i] = sum w_e x[src_e] with halo all_to_all feature exchange."""
    rows = pg.rows_per_shard

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None, None), P(axis, None, None),
                  P(axis, None), P(axis, None), P(axis, None)),
        out_specs=P(axis, None),
    )
    def spmm(x_local, send_ids, send_mask, src_remap, dst_local, w):
        send_ids, send_mask = send_ids[0], send_mask[0]        # [D, H]
        src_remap, dst_local, w = src_remap[0], dst_local[0], w[0]
        # rows this shard owes each peer
        out_rows = jnp.take(x_local, send_ids, axis=0)          # [D, H, F]
        out_rows = out_rows * send_mask[..., None].astype(out_rows.dtype)
        halo = jax.lax.all_to_all(out_rows, axis, split_axis=0, concat_axis=0,
                                  tiled=False)                  # [D, H, F]
        ext = jnp.concatenate([x_local, halo.reshape(-1, x_local.shape[-1])], axis=0)
        msg = jnp.take(ext, src_remap, axis=0) * w[:, None].astype(x_local.dtype)
        return jax.ops.segment_sum(msg, dst_local, num_segments=rows)

    def apply(x):
        return spmm(x, plan.send_ids, plan.send_mask, plan.src_remap,
                    pg.dst_local, pg.edge_weight)

    return apply


def halo_volume_bytes(pg: PartitionedGraph, plan: HaloPlan, feat_dim: int,
                      itemsize: int = 4) -> int:
    """all_to_all bytes per step (whole mesh)."""
    return pg.n_shard * pg.n_shard * plan.halo_size * feat_dim * itemsize


def allgather_volume_bytes(pg: PartitionedGraph, feat_dim: int, itemsize: int = 4) -> int:
    """all_gather bytes per step (whole mesh)."""
    return pg.n_shard * (pg.n_shard - 1) * pg.rows_per_shard * feat_dim * itemsize


def make_partitioned_spmm(mesh: Mesh, pg: PartitionedGraph, feat_dim: int,
                          strategy: str = "auto", axis: str = "data"):
    """Pick the cheaper exchange automatically: halo all_to_all when the partition
    cut is small (clustered graphs), all_gather when boundary padding would exceed
    the full matrix (hub-heavy graphs with poor cuts).

    Returns ``(spmm_fn, chosen_strategy)`` where ``chosen_strategy`` is
    ``"halo"`` or ``"allgather"``."""
    from dgll_tpu.parallel.gp import make_sharded_spmm

    if strategy == "allgather":
        return make_sharded_spmm(mesh, pg, axis), "allgather"
    plan = build_halo_plan(pg)
    if strategy == "halo":
        return make_halo_spmm(mesh, pg, plan, axis), "halo"
    if halo_volume_bytes(pg, plan, feat_dim) < allgather_volume_bytes(pg, feat_dim):
        return make_halo_spmm(mesh, pg, plan, axis), "halo"
    return make_sharded_spmm(mesh, pg, axis), "allgather"


# --------------------------------------------------------------- windowed local
@struct.dataclass
class ShardWindowed:
    """Per-shard window-fused layouts, padded to ONE static shape for shard_map.

    Each shard's LOCAL edges (src and dst both owned) that the windowed builder
    captures ride the gather-free Pallas kernel (``ops/pallas/spmm_windowed``);
    everything else — residual local edges and remote (halo) edges — keeps the
    classic remapped segment path via ``remaining_weight`` (the original
    per-shard weights with captured edges zeroed). Shapes are uniform across
    shards (layouts padded to the max chunk count), so one shard_map body
    serves the whole mesh.
    """

    src_local: jax.Array   # [D, n_sub, n_meta, SUB] int32
    dst_local: jax.Array   # [D, n_sub, n_meta, SUB] int32
    weight: jax.Array      # [D, n_sub, n_meta, SUB] float32
    row_block: jax.Array   # [D, n_chunk] int32
    win_block: jax.Array   # [D, n_chunk] int32
    sub_off: jax.Array     # [D, n_chunk, n_sub] int32
    remaining_weight: jax.Array  # [D, e_shard] float32
    n_chunk: int = struct.field(pytree_node=False, default=0)
    eb: int = struct.field(pytree_node=False, default=512)
    n_rows: int = struct.field(pytree_node=False, default=0)
    n_cols: int = struct.field(pytree_node=False, default=0)
    interpret: bool = struct.field(pytree_node=False, default=False)
    windowed_fraction: float = struct.field(pytree_node=False, default=0.0)


def build_shard_windowed(pg: PartitionedGraph) -> ShardWindowed:
    """Host-side: per-shard windowed layouts over owned-local edges, padded to
    a common static shape (max chunk count over shards)."""
    from dgll_tpu.ops.chunked import R_BLOCK, _target_platform
    from dgll_tpu.ops.windowed import build_windowed

    D, rows = pg.n_shard, pg.rows_per_shard
    src = np.asarray(pg.src).astype(np.int64)
    dstl = np.asarray(pg.dst_local).astype(np.int64)
    w = np.asarray(pg.edge_weight).copy()

    layouts, captured, total = [], 0, 0
    rem_w = w.copy()
    for p in range(D):
        local = ((src[p] // rows) == p) & (w[p] != 0)
        idx = np.nonzero(local)[0]
        lay, resid = build_windowed(src[p][idx] - p * rows, dstl[p][idx],
                                    rows, rows, w[p][idx])
        layouts.append(lay)
        keep = np.ones(len(idx), bool)
        if resid is not None:
            keep[resid] = False
        rem_w[p][idx[keep]] = 0.0       # captured edges leave the segment path
        captured += int(keep.sum())
        total += int((w[p] != 0).sum())

    n_chunk = max(l.n_chunk for l in layouts)
    if n_chunk % 2 == 0:
        n_chunk += 1
    n_meta = ((n_chunk + 7) // 8) * 8
    nb = layouts[0].n_rows // R_BLOCK

    def _pad_meta(a, fill):
        out = np.full((a.shape[0], n_meta, a.shape[2]), fill, a.dtype)
        out[:, : a.shape[1]] = np.asarray(a)
        return out

    SL = np.stack([_pad_meta(np.asarray(l.src_local), -1) for l in layouts])
    DL = np.stack([_pad_meta(np.asarray(l.dst_local), 0) for l in layouts])
    W = np.stack([_pad_meta(np.asarray(l.weight), 0.0) for l in layouts])
    RB = np.stack([
        np.pad(np.asarray(l.row_block), (0, n_chunk - l.n_chunk),
               constant_values=nb - 1) for l in layouts])
    WB = np.stack([np.pad(np.asarray(l.win_block), (0, n_chunk - l.n_chunk))
                   for l in layouts])
    SO = np.stack([
        np.pad(np.asarray(l.sub_off), ((0, n_chunk - l.n_chunk), (0, 0)))
        for l in layouts])

    return ShardWindowed(
        src_local=jnp.asarray(SL), dst_local=jnp.asarray(DL),
        weight=jnp.asarray(W), row_block=jnp.asarray(RB),
        win_block=jnp.asarray(WB), sub_off=jnp.asarray(SO),
        remaining_weight=jnp.asarray(rem_w),
        n_chunk=n_chunk, eb=layouts[0].eb,
        n_rows=layouts[0].n_rows, n_cols=layouts[0].n_cols,
        interpret=_target_platform() != "tpu",
        windowed_fraction=captured / max(total, 1),
    )


def make_halo_spmm_windowed(mesh: Mesh, pg: PartitionedGraph, plan: HaloPlan,
                            sw: ShardWindowed, axis: str = "data"):
    """Halo-exchange SpMM whose LOCAL aggregation rides the window-fused
    Pallas kernel per shard (dryrun flow 9 / multi-chip path of the flagship
    kernel). Remote + residual edges keep the remapped segment path; the
    collective is the same ONE static all_to_all as :func:`make_halo_spmm`."""
    from dgll_tpu.ops.pallas.spmm_windowed import spmm_windowed_pallas
    from dgll_tpu.ops.windowed import WindowedCSR

    rows = pg.rows_per_shard

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None, None), P(axis, None, None),
                  P(axis, None), P(axis, None), P(axis, None),
                  P(axis, None, None, None), P(axis, None, None, None),
                  P(axis, None, None, None), P(axis, None), P(axis, None),
                  P(axis, None, None)),
        out_specs=P(axis, None),
        # pallas_call's out ShapeDtypeStruct carries no varying-mesh-axes
        # annotation; the body is per-shard-local anyway
        check_vma=False,
    )
    def spmm(x_local, send_ids, send_mask, src_remap, dst_local, rem_w,
             sl, dl, wv, rb, wb, so):
        send_ids, send_mask = send_ids[0], send_mask[0]
        src_remap, dst_local, rem_w = src_remap[0], dst_local[0], rem_w[0]
        out_rows = jnp.take(x_local, send_ids, axis=0)
        out_rows = out_rows * send_mask[..., None].astype(out_rows.dtype)
        halo = jax.lax.all_to_all(out_rows, axis, split_axis=0, concat_axis=0,
                                  tiled=False)
        ext = jnp.concatenate([x_local, halo.reshape(-1, x_local.shape[-1])],
                              axis=0)
        msg = jnp.take(ext, src_remap, axis=0) * rem_w[:, None].astype(
            x_local.dtype)
        rest = jax.ops.segment_sum(msg, dst_local, num_segments=rows)

        c = WindowedCSR(
            src_local=sl[0], dst_local=dl[0], weight=wv[0],
            row_block=rb[0], win_block=wb[0], sub_off=so[0],
            n_chunk=sw.n_chunk, eb=sw.eb, n_rows=sw.n_rows, n_cols=sw.n_cols,
            interpret=sw.interpret)
        xp = jnp.pad(x_local, ((0, sw.n_cols - x_local.shape[0]), (0, 0)))
        win = spmm_windowed_pallas(c, xp, interpret=sw.interpret)[:rows]
        return win.astype(rest.dtype) + rest

    def apply(x):
        f = x.shape[-1]
        fp = ((f + 127) // 128) * 128   # kernel wants 128-lane feature tiles
        if fp != f:
            x = jnp.pad(x, ((0, 0), (0, fp - f)))
        out = spmm(x, plan.send_ids, plan.send_mask, plan.src_remap,
                   pg.dst_local, sw.remaining_weight,
                   sw.src_local, sw.dst_local, sw.weight,
                   sw.row_block, sw.win_block, sw.sub_off)
        return out[:, :f]

    return apply
