"""Evaluation metrics — self-contained numpy/JAX forms of the reference's sklearn calls.

Per-dataset metric selection mirrors ``record_result_new``
(``/root/reference/dgll/GPU Accelerator/utils.py:60-91``): f1 for reddit/proteins,
accuracy for arxiv/products, roc-auc for proteins; micro-F1 for PPI
(``FusedKernel/train_gcn.py:108-109``).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def accuracy(logits_or_pred, labels, mask=None) -> float:
    pred = np.asarray(logits_or_pred)
    if pred.ndim > 1:
        pred = pred.argmax(-1)
    labels = np.asarray(labels)
    ok = (pred == labels).astype(np.float64)
    if mask is not None:
        m = np.asarray(mask, np.float64)
        return float((ok * m).sum() / np.maximum(m.sum(), 1))
    return float(ok.mean())


def micro_f1(pred, target, mask=None) -> float:
    """Micro-averaged F1 for multilabel (2-D {0,1}) or multiclass (1-D int) predictions."""
    pred = np.asarray(pred)
    target = np.asarray(target)
    if mask is not None:
        pred, target = pred[np.asarray(mask, bool)], target[np.asarray(mask, bool)]
    if pred.ndim == 1 or (pred.ndim == 2 and target.ndim == 1):
        if pred.ndim == 2:
            pred = pred.argmax(-1)
        # multiclass micro-F1 == accuracy
        return float((pred == target).mean())
    tp = float(((pred == 1) & (target == 1)).sum())
    fp = float(((pred == 1) & (target == 0)).sum())
    fn = float(((pred == 0) & (target == 1)).sum())
    denom = 2 * tp + fp + fn
    return 2 * tp / denom if denom else 0.0


def macro_f1(pred, target, n_class: int, mask=None) -> float:
    pred = np.asarray(pred)
    if pred.ndim > 1:
        pred = pred.argmax(-1)
    target = np.asarray(target)
    if mask is not None:
        pred, target = pred[np.asarray(mask, bool)], target[np.asarray(mask, bool)]
    f1s = []
    for c in range(n_class):
        tp = float(((pred == c) & (target == c)).sum())
        fp = float(((pred == c) & (target != c)).sum())
        fn = float(((pred != c) & (target == c)).sum())
        denom = 2 * tp + fp + fn
        f1s.append(2 * tp / denom if denom else 0.0)
    return float(np.mean(f1s))


def roc_auc(scores, target, mask=None) -> float:
    """Binary ROC-AUC via the rank statistic (ties handled by average rank)."""
    scores = np.asarray(scores, np.float64).ravel()
    target = np.asarray(target).ravel()
    if mask is not None:
        m = np.asarray(mask, bool).ravel()
        scores, target = scores[m], target[m]
    pos = target == 1
    n_pos, n_neg = int(pos.sum()), int((~pos).sum())
    if n_pos == 0 or n_neg == 0:
        return 0.5
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty_like(order, np.float64)
    ranks[order] = np.arange(1, len(scores) + 1)
    # average ranks over ties
    s_sorted = scores[order]
    i = 0
    while i < len(s_sorted):
        j = i
        while j + 1 < len(s_sorted) and s_sorted[j + 1] == s_sorted[i]:
            j += 1
        if j > i:
            ranks[order[i : j + 1]] = (i + j) / 2 + 1
        i = j + 1
    return float((ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


METRIC_FOR_DATASET = {
    "reddit": "f1",
    "ogbn-proteins": "roc-auc",
    "ogbn-arxiv": "acc",
    "ogbn-products": "acc",
    "cora": "acc",
    "citeseer": "acc",
    "pubmed": "acc",
    "ppi": "f1",
}


def metric_for_dataset(name: str) -> str:
    """Headline-metric key for a dataset (ref ``record_result_new``,
    ``GPU Accelerator/utils.py:60-91``); datasets not in the table get ``acc``."""
    import os

    base = os.path.basename(str(name).rstrip("/")).lower()
    for suffix in (".graph", ".pkl"):
        if base.endswith(suffix):
            base = base[: -len(suffix)]
    return METRIC_FOR_DATASET.get(base, "acc")


def masked_nll_loss(log_probs: jnp.ndarray, labels: jnp.ndarray, mask=None) -> jnp.ndarray:
    """Mean negative log-likelihood over masked nodes (models emit log_softmax)."""
    nll = -jnp.take_along_axis(log_probs, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    if mask is None:
        return nll.mean()
    m = mask.astype(nll.dtype)
    return (nll * m).sum() / jnp.maximum(m.sum(), 1.0)


def masked_bce_loss(logits: jnp.ndarray, targets: jnp.ndarray, mask=None) -> jnp.ndarray:
    """Multilabel sigmoid cross-entropy (PPI-style)."""
    z = jnp.clip(logits, -30, 30)
    loss = jnp.maximum(z, 0) - z * targets + jnp.log1p(jnp.exp(-jnp.abs(z)))
    loss = loss.mean(axis=-1)
    if mask is None:
        return loss.mean()
    m = mask.astype(loss.dtype)
    return (loss * m).sum() / jnp.maximum(m.sum(), 1.0)
