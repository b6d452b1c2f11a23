"""Graph convolution layers (flax) — TPU-native forms of the reference layer zoo.

Parity targets (``/root/reference/dgll/nn/Convolution/``):

* ``GCNConv``  — ``gcnconv.py:29-35`` / ``gcn.py:17-48`` (``A_hat @ (X W) + b``)
* ``GATConv``  — ``gatconv.py:30-54`` dense path and ``sparseGatConv:111-148`` sparse path,
  unified here as SDDMM scores -> segment softmax -> weighted SpMM (multi-head).
* ``SAGEConv`` — ``sageconv.py:32-83`` (neighbour mean/sum/max aggregate + self transform,
  sum or concat combine).
* ``GINConv``  — ``ginconv.py:16-30`` (``ReLU(Linear(X + (1+eps) A X))``).

All layers consume a *message structure* ``g`` exposing ``src``, ``dst``, ``n_dst``
(and optionally ``edge_weight``): either a full ``dgll_tpu.graph.Graph`` or a sampled
bipartite ``dgll_tpu.sampling.Block``. The bipartite convention is DGL-style: the first
``n_dst`` source rows of ``x`` are the destination nodes themselves.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from dgll_tpu.ops.segment import segment_softmax
from dgll_tpu.ops.spmm import block_aggregate, spmm_coo, spmm_max_coo, spmm_mean_coo


def _is_dense_block(g) -> bool:
    """Fanout-dense sampled Block: aggregation becomes a reshape-reduce (no scatter)."""
    return getattr(g, "neigh_mask", None) is not None and getattr(g, "fanout", 0) > 0


def _n_dst(g) -> int:
    return g.n_dst if hasattr(g, "n_dst") else g.n_node


def _edge_weight(g):
    return getattr(g, "edge_weight", None)


def _require_self_at_head(g, layer: str) -> None:
    """Layers that read ``x[:n_dst]`` as the destinations' own features must reject
    blocks violating the protocol (pure importance-sampled ``SparseBlock``s built with
    ``include_seeds=False`` do not carry self features)."""
    if not getattr(g, "self_at_head", True):
        raise ValueError(
            f"{layer} needs self features (source slot i < n_dst must be destination "
            "i itself); this block was sampled with include_seeds=False. Use GCNConv, "
            "or sample with include_seeds=True."
        )


def _is_weighted_block(g) -> bool:
    """Fixed-K weighted block (device layer-wise samplers): dense gather+einsum."""
    return getattr(g, "slot", None) is not None


def _weighted_aggregate(g, h: jax.Array, n_dst: int) -> jax.Array:
    """Weighted-sum aggregation, routed to the Pallas chunked kernel when the graph
    carries a chunked layout (``Graph.with_chunked``) and the width is MXU-tileable;
    falls back to the XLA segment path otherwise."""
    if _is_weighted_block(g):
        rows = jnp.take(h, g.slot.reshape(-1), axis=0).reshape(n_dst, g.k, -1)
        return jnp.einsum("nk,nkf->nf", g.weight.astype(h.dtype), rows)
    hy = getattr(g, "hybrid", None)
    if hy is not None and h.shape[-1] % 128 == 0 and hy.win.n_rows >= n_dst:
        # round-4 window-fused kernel: gather-free for clustered graphs
        from dgll_tpu.ops.pallas.spmm_windowed import spmm_hybrid

        return spmm_hybrid(hy, g.hybrid_t, h)[:n_dst]
    c = getattr(g, "chunked", None)
    if c is not None and h.shape[-1] % 128 == 0 and c.n_rows >= n_dst:
        from dgll_tpu.ops.pallas.segment_matmul import spmm_chunked

        # interpret-vs-compiled comes from the layout's own placement (static field
        # set at build/to_device time), never from the process-global backend
        return spmm_chunked(c, g.chunked_t, h, None, None, c.interpret)[:n_dst]
    if _is_dense_block(g):
        return block_aggregate(h, n_dst, g.fanout, g.neigh_mask, "sum")
    return spmm_coo(g.src, g.dst, h, n_dst, _edge_weight(g))


class GCNConv(nn.Module):
    """``out = A_hat @ (X W) + b`` — transform-then-aggregate (W first keeps the SpMM
    operand at the smaller hidden width, same trick as the reference CUDA kernel)."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, g, x: jax.Array) -> jax.Array:
        h = nn.Dense(self.features, use_bias=False, dtype=self.dtype, name="weight")(x)
        out = _weighted_aggregate(g, h, _n_dst(g))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            out = out + bias.astype(out.dtype)
        return out


class GATConv(nn.Module):
    """Multi-head graph attention.

    Scores: ``e_k = LeakyReLU(a_dst . h[dst_k] + a_src . h[src_k])`` (the additive form
    the reference builds densely at ``gatconv.py:45-54``), normalised per destination by
    ``segment_softmax`` (sparse twin of the masked dense softmax at ``gatconv.py:36-39``),
    then a per-head weighted SpMM. Heads are a leading vmapped axis, so the projection is
    a single MXU matmul of width heads*features.
    """

    features: int
    num_heads: int = 1
    concat_heads: bool = True
    negative_slope: float = 0.2
    attn_dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, g, x: jax.Array, deterministic: bool = True) -> jax.Array:
        H, F = self.num_heads, self.features
        n_dst = _n_dst(g)
        _require_self_at_head(g, "GATConv")
        h = nn.Dense(H * F, use_bias=False, dtype=self.dtype, name="weight")(x)
        h = h.reshape(x.shape[0], H, F)

        a_src = self.param("attn_src", nn.initializers.glorot_uniform(), (H, F), jnp.float32)
        a_dst = self.param("attn_dst", nn.initializers.glorot_uniform(), (H, F), jnp.float32)

        # compiled sparse path: full graph carrying a chunked layout. The kernel
        # width is the TOTAL H*F (one premultiplied-message launch covers all
        # heads); per-head features are zero-padded up to the smallest F' with
        # (H*F') % 128 == 0, so every config — including the reference's
        # canonical 8-head x 8-dim (gatconv.py:174-199) — reaches the MXU
        # kernels. Zero feature columns change no score or output (sliced off).
        c = getattr(g, "chunked", None)
        if c is not None and c.n_rows >= n_dst:
            import math

            from dgll_tpu.ops.pallas.gat import gat_attention_chunked_fused

            # attention dropout rides the kernel path as an alpha mask
            # (reference drops attention coefficients, gatconv.py:40,140)
            drop_mask = None
            if self.attn_dropout > 0.0 and not deterministic:
                keep = jax.random.bernoulli(
                    self.make_rng("dropout"), 1.0 - self.attn_dropout,
                    (c.n_chunk_meta * c.eb, H))
                drop_mask = keep.astype(jnp.float32) / (1.0 - self.attn_dropout)

            lane_per_head = 128 // math.gcd(H, 128)
            f_pad = -(-F // lane_per_head) * lane_per_head
            interpret = c.interpret
            hp = h
            a_s, a_d = a_src, a_dst
            if f_pad != F:
                hp = jnp.pad(h, ((0, 0), (0, 0), (0, f_pad - F)))
                a_s = jnp.pad(a_src, ((0, 0), (0, f_pad - F)))
                a_d = jnp.pad(a_dst, ((0, 0), (0, f_pad - F)))
            hp = hp.reshape(x.shape[0], H * f_pad)
            if hp.shape[0] < c.n_rows:
                hp = jnp.pad(hp, ((0, c.n_rows - hp.shape[0]), (0, 0)))
            # round-5 fused path: 3 launches fwd / 4 bwd for ANY head count
            # (was 6 fwd via broadcast + 4-launch softmax + scatter)
            out = gat_attention_chunked_fused(
                c, g.chunked_t, hp, a_s.astype(hp.dtype), a_d.astype(hp.dtype),
                self.negative_slope, interpret, drop_mask=drop_mask,
            )[:n_dst, :, :F]
            if self.concat_heads:
                return out.reshape(n_dst, H * F)
            return out.mean(axis=1)

        # per-node score halves, then gather to edges (cheaper than per-edge dots)
        s_src = jnp.einsum("nhf,hf->nh", h, a_src.astype(h.dtype))
        s_dst = jnp.einsum("nhf,hf->nh", h, a_dst.astype(h.dtype))

        if _is_dense_block(g):
            # fanout-dense attention: softmax over the fanout axis, no segment ops
            fo = g.fanout
            neigh_h = jax.lax.dynamic_slice_in_dim(h, n_dst, n_dst * fo, axis=0)
            neigh_h = neigh_h.reshape(n_dst, fo, H, F)
            s_n = jax.lax.dynamic_slice_in_dim(s_src, n_dst, n_dst * fo, axis=0)
            s_n = s_n.reshape(n_dst, fo, H)
            e = nn.leaky_relu(s_dst[:n_dst, None, :] + s_n, self.negative_slope)
            m = g.neigh_mask[..., None]
            e = jnp.where(m, e, -1e9)
            ex = jnp.exp(e - jax.lax.stop_gradient(e.max(axis=1, keepdims=True))) * m
            alpha = ex / jnp.maximum(ex.sum(axis=1, keepdims=True), 1e-9)
            if self.attn_dropout > 0.0 and not deterministic:
                alpha = nn.Dropout(rate=self.attn_dropout, deterministic=False)(alpha)
            out = jnp.einsum("nfh,nfhd->nhd", alpha.astype(neigh_h.dtype), neigh_h)
        else:
            e = jnp.take(s_dst[:n_dst], g.dst, axis=0) + jnp.take(s_src, g.src, axis=0)
            e = nn.leaky_relu(e, self.negative_slope)

            alpha = segment_softmax(e, g.dst, n_dst)  # [E, H]
            if self.attn_dropout > 0.0 and not deterministic:
                alpha = nn.Dropout(rate=self.attn_dropout, deterministic=False)(alpha)

            # aggregate at [E, H*F] and broadcast alpha via the head-expand
            # matmul: ANY rank-3 [E, H, F] intermediate tile-pads its minor
            # dims to (8, 128) on TPU — up to 8-16x HBM inflation at edge
            # scale (measured OOM at 3.3M edges); rank-2 keeps the layout
            # dense. Messages multiply and accumulate in f32 regardless of
            # the compute dtype — a bf16 segment_sum over a hub's 10k+ edges
            # loses ~log2(deg) mantissa bits.
            from dgll_tpu.ops.pallas.gat_fused import head_expand

            h2 = h.reshape(x.shape[0], H * F)
            msg = jnp.take(h2, g.src, axis=0).astype(jnp.float32) * (
                alpha @ head_expand(H, F, jnp.float32))
            out = jax.ops.segment_sum(msg, g.dst, num_segments=n_dst)
            out = out.reshape(n_dst, H, F)
        if self.concat_heads:
            return out.reshape(n_dst, H * F)
        return out.mean(axis=1)


class SAGEConv(nn.Module):
    """GraphSAGE: aggregate neighbours (mean/sum/max) then combine with the self vector.

    ``combine='concat'`` matches the reference default (``sageConv.forward:70-83``);
    bipartite blocks use the first ``n_dst`` rows as the self features.
    """

    features: int
    aggregator: str = "mean"   # mean | sum | max
    combine: str = "concat"    # concat | sum
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, g, x: jax.Array) -> jax.Array:
        n_dst = _n_dst(g)
        _require_self_at_head(g, "SAGEConv")
        if self.aggregator not in ("mean", "sum", "max"):
            raise ValueError(f"unknown aggregator {self.aggregator!r}")
        if _is_dense_block(g):
            agg = block_aggregate(x, n_dst, g.fanout, g.neigh_mask, self.aggregator)
        elif self.aggregator == "mean":
            agg = spmm_mean_coo(g.src, g.dst, x, n_dst)
        elif self.aggregator == "sum":
            agg = spmm_coo(g.src, g.dst, x, n_dst, _edge_weight(g))
        else:
            agg = spmm_max_coo(g.src, g.dst, x, n_dst)

        h_neigh = nn.Dense(self.features, use_bias=False, dtype=self.dtype, name="neigh")(agg)
        h_self = nn.Dense(
            self.features, use_bias=self.use_bias, dtype=self.dtype, name="self"
        )(x[:n_dst])
        if self.combine == "concat":
            return jnp.concatenate([h_self, h_neigh], axis=-1)
        return h_self + h_neigh


class GINConv(nn.Module):
    """GIN: ``act(MLP((1 + eps) x + A x))`` (ref ``ginconv.py:16-30`` uses eps=0, ReLU)."""

    features: int
    learn_eps: bool = False
    activation: Callable = nn.relu
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, g, x: jax.Array) -> jax.Array:
        n_dst = _n_dst(g)
        _require_self_at_head(g, "GINConv")
        agg = _weighted_aggregate(g, x, n_dst)
        eps = (
            self.param("eps", nn.initializers.zeros, (), jnp.float32)
            if self.learn_eps
            else 0.0
        )
        h = (1.0 + eps) * x[:n_dst] + agg
        h = nn.Dense(self.features, dtype=self.dtype, name="mlp")(h)
        return self.activation(h)
