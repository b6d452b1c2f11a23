"""Multi-device scaling harness: partitioned full-graph training across mesh sizes.

Reports, per device count D:
* step time for the halo-exchange and all_gather SpMM strategies (dependent-chain
  timed) — on a real multi-chip slice this is the 1->N scaling-efficiency number
  (SURVEY.md §6 north star);
* communication volume per step: all_gather moves the full feature matrix
  (N*F*(D-1)/D per chip), halo moves only the static boundary plan (D*H*F).

Runs anywhere: `JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
python benchmarks/scaling_bench.py` uses the virtual mesh.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from timing import chain_time  # noqa: E402


def clustered_graph(n_node, avg_deg, feat, n_cluster, cross_frac=0.002, seed=0):
    """Low-cut graph: n_cluster contiguous blocks, ~cross_frac of edges cross a
    block boundary. The partition-friendly case COG's relabeling produces —
    where halo exchange should beat all_gather (its volume is cut-proportional,
    halo.py:5-9)."""
    from dgll_tpu.data import gcn_normalize
    from dgll_tpu.graph import Graph

    rng = np.random.default_rng(seed)
    e = n_node * avg_deg
    size = n_node // n_cluster
    blk = rng.integers(0, n_cluster, e)
    lo = blk * size
    src = lo + rng.integers(0, size, e)
    dst = lo + rng.integers(0, size, e)
    n_cross = int(cross_frac * e)
    dst[:n_cross] = rng.integers(0, n_node, n_cross)  # the tiny cut
    g = Graph.from_edges(src, dst, n_node, add_self_loops=True,
                         node_feat=rng.standard_normal((n_node, feat)).astype(np.float32),
                         labels=rng.integers(0, 8, n_node).astype(np.int32))
    return gcn_normalize(g)


def main():
    import jax
    import jax.numpy as jnp

    from dgll_tpu.data import gcn_normalize, synthetic_classification_graph
    from dgll_tpu.parallel import (
        build_halo_plan,
        make_halo_spmm,
        make_mesh,
        make_sharded_spmm,
        partition_graph,
        shard_partitioned_graph,
    )

    n_node = int(os.environ.get("SC_NODES", 20_000))
    avg_deg = int(os.environ.get("SC_DEG", 10))
    feat = int(os.environ.get("SC_DIM", 128))
    mode = os.environ.get("SC_GRAPH", "powerlaw")
    out_path = os.environ.get("SC_OUT", "")
    if mode == "clustered":
        g = clustered_graph(n_node, avg_deg, feat, n_cluster=8)
        part_strategy = "range"  # ids already cluster-ordered (COG-style)
    else:
        g = gcn_normalize(
            synthetic_classification_graph(n_node=n_node, avg_degree=avg_deg,
                                           feat_dim=feat, power_law=0.8, seed=0)
        )
        part_strategy = "bfs"
    all_d = [d for d in (1, 2, 4, 8) if d <= jax.device_count()]
    base = None
    rows_out = []
    print(f"{'D':>2} {'halo ms':>9} {'allg ms':>9} {'eff%':>6} "
          f"{'halo MB/step':>13} {'allg MB/step':>13}")
    for D in all_d:
        mesh = make_mesh(("data",), devices=jax.devices()[:D])
        pg = partition_graph(g, D, strategy=part_strategy)
        pgs = shard_partitioned_graph(pg, mesh)
        plan = build_halo_plan(pg)
        halo = make_halo_spmm(mesh, pgs, plan)
        allg = make_sharded_spmm(mesh, pgs)

        x0 = jnp.asarray(pg.node_feat)
        rows = pg.n_node

        def step_h(x):
            return halo(x)[:rows] * 0.5

        def step_a(x):
            return allg(x)[:rows] * 0.5

        th = chain_time(jax.jit(step_h), x0, k_small=3, k_large=10)
        ta = chain_time(jax.jit(step_a), x0, k_small=3, k_large=10)
        if base is None:
            base = th
        # weak-scaling efficiency: the graph is fixed, so ideal D-device step time
        # equals the 1-device time (each device does 1/D of the work)
        eff = 100.0 * base / th
        halo_mb = D * D * plan.halo_size * feat * 4 / 1e6
        allg_mb = D * (D - 1) * pg.rows_per_shard * feat * 4 / 1e6
        print(f"{D:>2} {th*1e3:9.2f} {ta*1e3:9.2f} {eff:6.1f} "
              f"{halo_mb:13.2f} {allg_mb:13.2f}", flush=True)
        rows_out.append({"D": D, "halo_ms": round(th * 1e3, 2),
                         "allgather_ms": round(ta * 1e3, 2),
                         "halo_mb_per_step": round(halo_mb, 2),
                         "allgather_mb_per_step": round(allg_mb, 2),
                         "halo_wins": bool(th < ta)})
    if out_path:
        with open(out_path, "w") as f:
            json.dump({"graph": mode, "n_node": n_node, "avg_deg": avg_deg,
                       "feat_dim": feat, "partition": part_strategy,
                       "rows": rows_out}, f, indent=1)


if __name__ == "__main__":
    main()
