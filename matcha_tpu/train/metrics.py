"""Evaluation metrics: AUROC / AUPRC / accuracy, overall and per hyperedge
size (ref: Code/utils.py:32-72).  Host path computes with sklearn, as the
reference does (the SURVEY §7 exactness recommendation); the DEVICE path
(device_metrics_fn) reproduces sklearn's tie-aware definitions with sorts
+ segment ops on the accelerator, so a training epoch's metrics cost one
argsort per group and a scalar fetch instead of shipping the (steps, P)
prediction tensor to host sklearn (~4.7 s per 3.3M-row epoch on this host
— 10x the device epoch itself at the bench geometry)."""

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


# ------------------------------------------------------------ device path
def _group_metrics_device(p, y):
    """sklearn-parity (auroc, auprc, acc, n_pos) for one group ON DEVICE.

    p: (m,) f32 predictions; y: (m,) f32/bool labels (1 = positive).
    AUROC = tie-aware rank-sum (midranks over tied blocks == sklearn's
    trapezoidal ROC integral); AUPRC = average_precision_score's
    Σ (R_i − R_{i−1})·P_i over DISTINCT thresholds (ties collapse to the
    block end).  f32 is sufficient: cumulative 0/1 sums stay < 2^24 and
    the rank-sum's tree-reduction error is ~1e-7 relative (pinned to
    sklearn at 1e-5 in tests/test_metrics_device.py)."""
    import jax
    import jax.numpy as jnp
    m = p.shape[0]
    # co-sort labels with predictions (lax.sort multi-operand): an
    # argsort + gathers formulation costs several latency-bound random
    # gathers over the full epoch volume (~0.5 s each at 32M rows); every
    # step below is a bandwidth-bound vector pass instead
    ps, ys = jax.lax.sort((p, y.astype(jnp.float32)), num_keys=1)
    r = jnp.arange(1, m + 1, dtype=jnp.float32)
    new_blk = jnp.concatenate(
        [jnp.ones((1,), bool), ps[1:] != ps[:-1]])
    is_end = jnp.concatenate([ps[1:] != ps[:-1], jnp.ones((1,), bool)])
    # tie-block first/last rank broadcast WITHOUT segment gathers:
    # ranks ascend, so a running max of block-start ranks is the current
    # block's first; a reversed running min of block-end ranks is its last
    first_b = jax.lax.cummax(jnp.where(new_blk, r, 0.0))
    last_b = jax.lax.cummin(jnp.where(is_end, r, jnp.inf)[::-1])[::-1]
    midrank = (first_b + last_b) * 0.5
    n_pos = jnp.sum(ys)
    n_neg = m - n_pos
    auroc = jnp.where(
        (n_pos > 0) & (n_neg > 0),
        (jnp.sum(midrank * ys) - n_pos * (n_pos + 1) * 0.5)
        / jnp.maximum(n_pos * n_neg, 1.0),
        jnp.nan)

    # average precision over descending scores, ties collapsed to the
    # block end: each row contributes its recall delta x the precision at
    # its block's end.  In descending order a block's end is its LAST row,
    # so the block-end precision per row is a reversed "hold last flagged
    # value" associative scan — again no gathers.
    yd = ys[::-1]
    tp = jnp.cumsum(yd)
    i = jnp.arange(1, m + 1, dtype=jnp.float32)
    prec = tp / i
    rec = tp / jnp.maximum(n_pos, 1.0)
    # descending sequence = reversed ascending; a block end in descending
    # order is where the NEXT descending value differs = reversed new_blk
    is_end_d = new_blk[::-1]
    flag_val = jnp.where(is_end_d, prec, 0.0)

    def hold(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, va)

    _, prec_end = jax.lax.associative_scan(
        hold, (is_end_d[::-1], flag_val[::-1]))
    prec_end = prec_end[::-1]
    d_rec = jnp.diff(jnp.concatenate([jnp.zeros((1,)), rec]))
    ap = jnp.where(n_pos > 0, jnp.sum(d_rec * prec_end), jnp.nan)

    acc = jnp.mean((ps >= 0.5) == (ys > 0.5))
    return auroc, ap, acc, n_pos


def device_metrics_fn(y: np.ndarray, sizes: np.ndarray):
    """Build a jitted fn(preds (S, P)) -> {group: (auroc, auprc, acc,
    n_pos)} for a FIXED per-step label/size layout (y, sizes are
    structural — the same every step, cf. labels_for_batch).  Mirrors
    size_stratified_metrics exactly (same groups, same tiling)."""
    import jax
    import jax.numpy as jnp
    y = np.asarray(y).reshape(-1)
    sizes = np.asarray(sizes).reshape(-1)
    groups = {"all": np.arange(y.size)}
    for s in np.unique(sizes):
        groups[int(s)] = np.flatnonzero(sizes == s)
    ypos = (y > 0.5).astype(np.float32)
    # Compile-cost rule (measured on the tunneled TPU backend): any
    # epoch-length array BAKED INTO the program — tile(ypos[cols], steps)
    # literals, gather index literals — blows XLA constant folding up to
    # multi-minute (>8 min at 200x32768, vs seconds with none).  So the
    # per-step labels enter as a runtime ARGUMENT (tiled by a runtime
    # broadcast) and contiguous groups (labels_for_batch emits per-k
    # blocks) are lax.slice'd, not gathered.
    spans = {}
    for name, cols in groups.items():
        contig = cols.size > 0 and np.array_equal(
            cols, np.arange(cols[0], cols[-1] + 1))
        spans[name] = (int(cols[0]), int(cols[-1]) + 1) if contig else None

    @jax.jit
    def f(preds, yrow):
        flat = preds.reshape(preds.shape[0], -1).astype(jnp.float32)
        steps = flat.shape[0]
        out = {}
        for name, cols in groups.items():
            span = spans[name]
            if span is not None:
                s0, s1 = span
                p = jax.lax.slice(flat, (0, s0), (steps, s1))
                yg = jax.lax.slice(yrow, (s0,), (s1,))
            else:    # non-contiguous group (regress-mode layouts)
                p = flat[:, cols]
                yg = yrow[cols]
            yy = jnp.broadcast_to(yg, p.shape).reshape(-1)
            # str keys: a jit-returned dict pytree cannot mix int and str
            out[str(name)] = _group_metrics_device(p.reshape(-1), yy)
        return out

    yrow_dev = jnp.asarray(ypos)

    def wrapped(preds):
        return f(preds, yrow_dev)
    wrapped.group_sizes = {name: int(cols.size)
                           for name, cols in groups.items()}
    return wrapped


def metrics_from_device(vals: Dict, group_sizes: Dict, steps: int) -> Dict:
    """Fetched device_metrics_fn output -> the size_stratified_metrics
    dict shape."""
    out = {}
    for name, (auroc, ap, acc, n_pos) in vals.items():
        key = int(name) if name.isdigit() else name
        out[key] = {"auroc": float(auroc), "auprc": float(ap),
                    "acc": float(acc),
                    "n": int(group_sizes[key]) * int(steps)}
    return out


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
