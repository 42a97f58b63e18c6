"""Evaluation metrics: AUROC / AUPRC / accuracy, overall and per hyperedge
size (ref: Code/utils.py:32-72).  Computed on host with sklearn, as the
reference does (the SURVEY §7 exactness recommendation)."""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
from sklearn.metrics import average_precision_score, roc_auc_score


def size_stratified_metrics(y_true: np.ndarray, y_pred: np.ndarray,
                            sizes: np.ndarray) -> Dict:
    """Returns {"all": {...}, k: {"auroc","auprc","acc"} per size}."""
    y_true = np.asarray(y_true).reshape(-1)
    y_pred = np.asarray(y_pred).reshape(-1)
    sizes = np.asarray(sizes).reshape(-1)
    out: Dict = {}
    yt = y_true > 0.5                          # ref utils.py:35
    out["all"] = _one(yt, y_pred)
    for s in np.unique(sizes):
        m = sizes == s
        out[int(s)] = _one(yt[m], y_pred[m])
    return out


def _one(yt, yp) -> Dict[str, float]:
    try:
        return {
            "auroc": float(roc_auc_score(yt, yp)),
            "auprc": float(average_precision_score(yt, yp)),
            "acc": float(((yp >= 0.5) == yt).mean()),
            "n": int(yt.size),
        }
    except ValueError:
        return {"auroc": float("nan"), "auprc": float("nan"),
                "acc": float("nan"), "n": int(yt.size)}


def format_metrics(metrics: Dict) -> Tuple[str, str, str]:
    """Reference-style formatted strings (ref Code/utils.py:40-51):
    'all 0.912 2 0.905 3 ...' for roc / aupr / acc."""
    if not metrics:
        # eval_epoch legitimately returns {} when every test bucket was
        # empty or too small to shard — log that, don't crash the epoch
        return ("n/a",) * 3
    keys = ["all"] + sorted(k for k in metrics if k != "all")
    roc = " ".join(f"{k} {metrics[k]['auroc']:.3f}" for k in keys)
    aupr = " ".join(f"{k} {metrics[k]['auprc']:.3f}" for k in keys)
    acc = " ".join(f"{k} {metrics[k]['acc']:.3f}" for k in keys)
    return roc, aupr, acc
