"""Layer-wise sampler QUALITY A/B at a validation plateau (VERDICT r4 #2).

Round 4 shipped device FastGCN at 3.97 ms/batch but with no convergence
evidence (and a mis-scaled loss, fixed in r5 by the defensive-IS weighting).
This harness settles quality the way window_ab_r4 did for window sampling:
train a 2-layer GCN to a validation plateau on the hard-regime SBM under

  * device-neighbor   (uniform fanout, the quality reference point)
  * device-fastgcn    (alias-table layer-wise draws in-jit)
  * device-ladies     (inverse-CDF layer-dependent draws in-jit)
  * host-fastgcn      (the reference-semantics numpy sampler)

Every variant is scored through the SAME **exact full-neighborhood inference**
(``train/exact_infer.py`` — sampling-noise-free, VERDICT r4 #5), so reported
accuracies compare estimator quality only. Speed columns ride along.

Acceptance (VERDICT): layer-wise variants within ~1 % of neighbor sampling at
plateau, else the 1.54x claim demotes to speed-only.

Env: LA_NODES (400k), LA_DEG (15), LA_EPOCHS (40), LA_STOPS (6), LA_SIZES.
Output: benchmarks/results/layerwise_ab_r5.json.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from dgll_tpu.data import gcn_normalize, synthetic_classification_graph
    from dgll_tpu.dataloader import DataLoader
    from dgll_tpu.nn import GCN
    from dgll_tpu.sampling import (
        DeviceCSR,
        FastGCNSampler,
        HostGraph,
        build_device_lap,
        normalized_laplacian,
    )
    from dgll_tpu.train import DeviceEpochRunner, MiniBatchTrainer
    from dgll_tpu.train.exact_infer import make_exact_logits_fn

    n_node = int(os.environ.get("LA_NODES", 400_000))
    avg_deg = int(os.environ.get("LA_DEG", 15))
    max_epochs = int(os.environ.get("LA_EPOCHS", 40))
    n_stops = int(os.environ.get("LA_STOPS", 6))
    sizes = [int(x) for x in os.environ.get("LA_SIZES", "2048,1024").split(",")]
    batch, fanouts, n_class = 1024, [15, 10], 32
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results", "layerwise_ab_r5.json")

    t0 = time.perf_counter()
    g = synthetic_classification_graph(
        n_node=n_node, avg_degree=avg_deg, n_class=n_class, feat_dim=100,
        power_law=1.0, homophily=float(os.environ.get("LA_HOMOPHILY", 0.55)),
        feat_noise=float(os.environ.get("LA_NOISE", 4.5)), seed=0,
        train_frac=0.02)
    g = gcn_normalize(g)
    print(f"[ab] graph {time.perf_counter()-t0:.1f}s", flush=True)

    feats = jnp.asarray(g.node_feat)
    labels = jnp.asarray(g.labels)
    labels_np = np.asarray(g.labels)
    train_nodes = g.get_train_nodes()
    val_nodes = np.asarray(g.get_validation_nodes())[:20_000]
    test_nodes = np.asarray(g.get_test_nodes())[:50_000]
    model = GCN(hidden=256, n_class=n_class, dropout=0.5)

    # exact full-graph eval: one jitted forward, shared by every variant
    glight = g.replace(node_feat=None, labels=None, train_mask=None,
                       val_mask=None, test_mask=None)
    gd = jax.tree.map(jnp.asarray, glight)
    exact_fn = make_exact_logits_fn(model.apply)

    def exact_acc(params, nodes):
        logp = exact_fn(params, gd, feats)
        pred = np.asarray(jnp.argmax(logp, -1))[: g.n_real_node]
        return float((pred[nodes] == labels_np[nodes]).mean())

    results = {"n_node": n_node, "n_edge": g.n_real_edge, "batch": batch,
               "layer_sizes": sizes, "fanouts": fanouts,
               "max_epochs": max_epochs, "n_stops": n_stops,
               "eval": "exact_full_neighborhood", "variants": {}}

    def fit(name, run_epoch, state, n_batches):
        best_val, best_params, bad, epochs = -1.0, state.params, 0, 0
        t_train = 0.0
        for ep in range(max_epochs):
            te = time.perf_counter()
            state, loss = run_epoch(state)
            loss = float(loss)
            if ep > 0:
                t_train += time.perf_counter() - te
            epochs += 1
            val = exact_acc(state.params, val_nodes)
            if val > best_val:
                best_val, best_params, bad = val, state.params, 0
            else:
                bad += 1
            print(f"[{name}] ep {ep} loss {loss:.4f} val {val:.4f}", flush=True)
            if bad >= n_stops:
                break
        test = exact_acc(best_params, test_nodes)
        per_epoch = t_train / max(epochs - 1, 1)
        results["variants"][name] = {
            "best_val": round(best_val, 4), "test_acc": round(test, 4),
            "epochs": epochs,
            "train_s_per_epoch": round(per_epoch, 3),
            "batch_ms_incl_sampling": round(per_epoch / n_batches * 1e3, 3),
            "final_loss": round(loss, 4),
        }
        print(f"[{name}] DONE best_val={best_val:.4f} test={test:.4f}",
              flush=True)

    csr = DeviceCSR.from_graph(g)
    lap = build_device_lap(g, k=32)
    print(f"[ab] device structures {time.perf_counter()-t0:.1f}s", flush=True)

    variants = [
        ("device_neighbor", csr, fanouts, "neighbor"),
        ("device_fastgcn", lap, sizes, "fastgcn"),
        ("device_ladies", lap, sizes, "ladies"),
    ]
    for name, gobj, fo, samp in variants:
        runner = DeviceEpochRunner(model, optax.adam(1e-3), gobj, fo, batch,
                                   train_nodes, seed=1, sampler=samp,
                                   window=(samp == "neighbor"))
        state = runner.init_state(feats)
        fit(name, lambda st, r=runner: r.run_epoch(st, feats, labels), state,
            runner.n_batches)

    # host FastGCN (reference-semantics sampler) through the block trainer
    hg = HostGraph.from_graph(g)
    sampler = FastGCNSampler(normalized_laplacian(g), sizes, seed=2)
    tr = MiniBatchTrainer(model, optax.adam(1e-3), seed=1)
    _, _, b0 = sampler.sample(hg, train_nodes[:batch], pad_to=batch)
    x0 = jnp.take(feats, jnp.asarray(b0[0].src_ids), axis=0)
    hstate = tr.init_state(b0, x0)
    n_batches = max(1, -(-len(train_nodes) // batch))

    def host_epoch(st):
        loader = DataLoader(g, train_nodes, sampler, batch, seed=3)
        st, loss, _ = tr.run_epoch(st, loader, feats, labels)
        return st, loss

    fit("host_fastgcn", host_epoch, hstate, n_batches)

    nb = results["variants"].get("device_neighbor", {}).get("test_acc", 0)
    for name, row in results["variants"].items():
        row["acc_delta_vs_neighbor"] = round(row["test_acc"] - nb, 4)

    print(json.dumps(results, indent=1))
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
