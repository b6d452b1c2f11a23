"""Multi-layer uniform neighbour sampler — parity with ``DGLLNeighborSampler``
(``/root/reference/dgll/sampling/dgllsampler.py:5-21``), emitting fixed-shape blocks.

Semantics: iterate fanouts outermost-first in the returned list (``fanouts[0]`` is the
block nearest the raw input features, exactly as the reference builds by inserting at
the front while iterating ``reversed(fanouts)``). Every block is fanout-dense and
statically shaped, so the jitted train step never recompiles across batches.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from dgll_tpu.sampling.base import BaseSampler, Block, HostGraph, sample_neighbors_padded


class NeighborSampler(BaseSampler):
    def __init__(self, fanouts: Sequence[int], seed: int = 0):
        self.fanouts = [int(f) for f in fanouts]
        self._rng = np.random.default_rng(seed)

    def sample(
        self,
        g: HostGraph,
        seeds: np.ndarray,
        pad_to: Optional[int] = None,
    ) -> Tuple[np.ndarray, np.ndarray, List[Block]]:
        """Sample the multi-hop neighbourhood of ``seeds``.

        Returns ``(input_nodes, output_nodes, blocks)``: ``input_nodes`` are the global
        ids whose features feed the first block (= ``blocks[0].src_ids``),
        ``output_nodes`` the (padded) seeds. ``pad_to`` pads the seed batch to a static
        size (defaults to ``len(seeds)``).
        """
        seeds = np.asarray(seeds, np.int64)
        b = len(seeds) if pad_to is None else int(pad_to)
        dst_ids = np.zeros(b, np.int64)
        dst_ids[: len(seeds)] = seeds
        dst_mask = np.zeros(b, bool)
        dst_mask[: len(seeds)] = True

        blocks: List[Block] = []
        frontier, fmask = dst_ids, dst_mask
        for fanout in reversed(self.fanouts):
            sampled, smask = sample_neighbors_padded(g, frontier, fmask, fanout, self._rng)
            # Keep leaves as host numpy: samplers are host-side producers; arrays move
            # to device in one batch at jit-call time (avoids per-array tunnel chatter
            # and any device round-trip during sampling).
            blocks.insert(
                0,
                Block(
                    dst_ids=frontier.astype(np.int32),
                    src_ids=np.concatenate([frontier, sampled.reshape(-1)]).astype(np.int32),
                    neigh_mask=smask,
                    dst_mask=fmask,
                    fanout=fanout,
                    n_dst=frontier.shape[0],
                ),
            )
            frontier = np.concatenate([frontier, sampled.reshape(-1)])
            fmask = np.concatenate([fmask, smask.reshape(-1)])

        input_nodes = np.asarray(blocks[0].src_ids, np.int64) if blocks else dst_ids
        return input_nodes, dst_ids, blocks


# Alias matching the reference class name for drop-in familiarity.
DGLLNeighborSampler = NeighborSampler


class CommunityNeighborSampler(NeighborSampler):
    """Neighbour sampler restricted to a community's contiguous id range.

    Parity with the community trainers' ``CommBNeighborSampler``
    (``CommGNN_train.py:100-108`` — implementation absent from the reference
    snapshot; designed from call sites): seeds and sampled neighbours stay inside
    ``[lo, hi)``, so every feature row a batch touches lives in one contiguous
    slice (the property COG's relabeling creates). Out-of-range neighbours are
    masked out, matching the transductive "MOS" slicing (``CommGNNModel.py:54-56``).
    """

    def __init__(self, fanouts: Sequence[int], community_range: Tuple[int, int],
                 seed: int = 0):
        super().__init__(fanouts, seed)
        self.lo, self.hi = int(community_range[0]), int(community_range[1])

    def sample(self, g: HostGraph, seeds: np.ndarray, pad_to: Optional[int] = None):
        seeds = np.asarray(seeds, np.int64)
        assert ((seeds >= self.lo) & (seeds < self.hi)).all(), "seeds outside community"
        b = len(seeds) if pad_to is None else int(pad_to)
        dst_ids = np.full(b, self.lo, np.int64)
        dst_ids[: len(seeds)] = seeds
        dst_mask = np.zeros(b, bool)
        dst_mask[: len(seeds)] = True

        blocks: List[Block] = []
        frontier, fmask = dst_ids, dst_mask
        for fanout in reversed(self.fanouts):
            sampled, smask = sample_neighbors_padded(g, frontier, fmask, fanout, self._rng)
            in_range = (sampled >= self.lo) & (sampled < self.hi)
            # out-of-range neighbours alias their destination (weight-0 via the mask),
            # so every id a batch touches stays inside [lo, hi)
            sampled = np.where(in_range, sampled, frontier[:, None])
            smask &= in_range
            blocks.insert(
                0,
                Block(
                    dst_ids=frontier.astype(np.int32),
                    src_ids=np.concatenate([frontier, sampled.reshape(-1)]).astype(np.int32),
                    neigh_mask=smask,
                    dst_mask=fmask,
                    fanout=fanout,
                    n_dst=frontier.shape[0],
                ),
            )
            frontier = np.concatenate([frontier, sampled.reshape(-1)])
            fmask = np.concatenate([fmask, smask.reshape(-1)])

        input_nodes = np.asarray(blocks[0].src_ids, np.int64) if blocks else dst_ids
        return input_nodes, dst_ids, blocks
