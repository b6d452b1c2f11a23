"""Halo-exchange step: executed profiler-trace evidence (round 4, VERDICT #7).

r3's overlap evidence for the halo all_to_all was a static HLO schedule dump.
This runs the actual halo SpMM step on the 8-device virtual mesh under
``jax.profiler.trace`` and summarises the EXECUTED events: per-device wall span
of the step, total all-to-all/collective event time, total other-compute time,
and the overlap ratio (how much collective time ran concurrently with compute).

Environment limitation, stated plainly: this machine has ONE physical TPU chip,
so a multi-device halo cannot execute on real ICI here — the virtual CPU mesh
is the only place the collective actually runs. Scheduling-level evidence only;
ICI-level overlap remains a projection (scaling_projection_r3.md).

Output: benchmarks/results/halo_trace_r4.json (+ the raw perfetto trace is
left in /tmp, too large to commit).
"""
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from dgll_tpu.parallel import build_halo_plan, make_halo_spmm, partition_graph
    from dgll_tpu.graph import Graph

    rng = np.random.default_rng(0)
    n, deg, f = 65536, 12, 128
    csize = 8192  # communities aligned with the 8 partitions -> halo wins
    e = n * deg
    dst = rng.integers(0, n, e)
    comm = dst // csize
    loc = rng.random(e) < 0.9
    src = np.where(loc, comm * csize + rng.integers(0, csize, e),
                   rng.integers(0, n, e)) % n
    g = Graph.from_edges(src, dst, n,
                         node_feat=rng.standard_normal((n, f)).astype(np.float32))

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    pg = partition_graph(g, 8, strategy="range")
    plan = build_halo_plan(pg)
    spmm = make_halo_spmm(mesh, pg, plan)
    x = jnp.asarray(np.asarray(pg.node_feat))

    out = spmm(x)  # compile + warm
    jax.block_until_ready(out)

    trace_dir = "/tmp/halo_trace_r4"
    with jax.profiler.trace(trace_dir):
        for _ in range(5):
            out = spmm(x)
        jax.block_until_ready(out)

    # ---- parse the perfetto trace: sum event durations by category
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace written under {trace_dir}"
    with gzip.open(sorted(paths)[-1], "rt") as fh:
        trace = json.load(fh)
    events = [ev for ev in trace.get("traceEvents", [])
              if ev.get("ph") == "X" and ev.get("dur")]

    def is_collective(name: str) -> bool:
        name = name.lower()
        return name.startswith(("all-to-all", "all-reduce", "collective-permute"))

    # restrict to XLA EXECUTOR threads: the (pid, tid) lanes where actual
    # all-to-all device ops run — everything else is host tracing noise
    exec_lanes = {(ev.get("pid"), ev.get("tid")) for ev in events
                  if is_collective(ev.get("name", ""))}
    lane_events = [ev for ev in events
                   if (ev.get("pid"), ev.get("tid")) in exec_lanes]
    coll = [ev for ev in lane_events if is_collective(ev.get("name", ""))]
    comp = [ev for ev in lane_events if not is_collective(ev.get("name", ""))]
    def merged(ivs):
        """Union of intervals (events nest: summing durations double-counts)."""
        out = []
        for a, b in sorted(ivs):
            if out and a <= out[-1][1]:
                out[-1][1] = max(out[-1][1], b)
            else:
                out.append([a, b])
        return out

    coll_iv = merged((ev["ts"], ev["ts"] + ev["dur"]) for ev in coll)
    comp_iv = merged((ev["ts"], ev["ts"] + ev["dur"]) for ev in comp)
    t_coll = sum(b - a for a, b in coll_iv) / 1e3
    t_comp = sum(b - a for a, b in comp_iv) / 1e3
    spans = coll_iv + comp_iv
    wall = (max(s[1] for s in spans) - min(s[0] for s in spans)) / 1e3 if spans else 0

    def overlap_of(iv):
        lo, hi = iv
        tot = 0.0
        for a, b in comp_iv:
            if b <= lo:
                continue
            if a >= hi:
                break
            tot += min(b, hi) - max(a, lo)
        return min(tot, hi - lo)

    t_overlap = sum(overlap_of(iv) for iv in coll_iv) / 1e3

    summary = {
        "setting": "8-device VIRTUAL cpu mesh (one physical TPU chip on this "
                   "machine; ICI-level overlap remains a projection)",
        "n_node": n, "n_edge": e, "feat_dim": f, "steps_traced": 5,
        "collective_events": len(coll),
        "collective_ms": round(t_coll, 3),
        "compute_ms": round(t_comp, 3),
        "wall_ms": round(wall, 3),
        "collective_overlapped_ms": round(t_overlap, 3),
        "overlap_fraction_of_collective": round(t_overlap / max(t_coll, 1e-9), 3),
        "collective_names": sorted({ev["name"] for ev in coll})[:8],
    }
    print(json.dumps(summary, indent=1))
    dest = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results",
                        "halo_trace_r4.json")
    with open(dest, "w") as fh:
        json.dump(summary, fh, indent=1)
    print("wrote", dest)


if __name__ == "__main__":
    main()
