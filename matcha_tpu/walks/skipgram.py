"""TPU-native skip-gram with negative sampling (SGNS) over random walks.

This is the device-kernel replacement for the reference's word2vec machinery:
the legacy pipeline trains gensim Word2Vec on walk strings
(ref History_version/Code/main_SPRITE.py:701-765) and ships a vestigial
compiled TensorFlow CPU op (``word2vec_ops.so`` — SkipgramWord2vecOp /
NegTrainWord2vecOp, SURVEY §2.11).  Here the whole SGNS update — embedding
gather, sampled-softmax logistic loss, scatter-add gradient — runs as one
jitted ``lax.scan`` over minibatches on TPU.

Semantics follow word2vec: dynamic window (uniform 1..window per center),
unigram^0.75 negative-sampling distribution, separate input/output embedding
tables, logistic loss  -log σ(u·v) - Σ log σ(-u·v_neg).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Above this vocabulary size the fused broadcast-compare-count negative
# draw (O(m*neg*V) VPU compares) loses to jnp.searchsorted's O(log V)
# binary search; mirrors the SCATTER_MATMUL_MAX_ROWS gating pattern.
COMPARE_COUNT_MAX_VOCAB = 8192


def walks_to_pairs(walks: np.ndarray, window: int,
                   rng: np.random.Generator) -> np.ndarray:
    """(W, L) walks -> (P, 2) center/context pairs with per-center dynamic
    window ~ Uniform{1..window} (word2vec's window shrinking)."""
    W, L = walks.shape
    pairs = []
    b = rng.integers(1, window + 1, size=(W, L))     # dynamic windows
    for off in range(1, min(window, L - 1) + 1):     # offsets beyond the
        centers = walks[:, :L - off]                 # walk produce no pairs
        contexts = walks[:, off:]
        # each DIRECTION is gated by its own center's dynamic window
        keep_l = b[:, :L - off] >= off               # center at i
        keep_r = b[:, off:] >= off                   # center at i + off
        pairs.append(np.stack([centers[keep_l], contexts[keep_l]], 1))
        pairs.append(np.stack([contexts[keep_r], centers[keep_r]], 1))
    out = np.concatenate(pairs, axis=0)
    return out[rng.permutation(len(out))]


def unigram_table(walks: np.ndarray, vocab: int,
                  power: float = 0.75) -> np.ndarray:
    counts = np.bincount(walks.reshape(-1), minlength=vocab).astype(np.float64)
    probs = counts ** power
    s = probs.sum()
    return (probs / s if s > 0 else np.full(vocab, 1.0 / vocab)).astype(
        np.float32)


@partial(jax.jit, static_argnames=("neg_num", "lr"))
def _sgns_epoch(emb_in, emb_out, pairs, neg_table_cdf, key, *,
                neg_num: int = 5, lr: float = 0.025):
    """One scanned pass of SGD updates over (B, m, 2) minibatched pairs."""

    vocab = emb_in.shape[0]

    def step(carry, batch):
        emb_in, emb_out, key = carry
        key, kn = jax.random.split(key)
        centers, contexts = batch[:, 0], batch[:, 1]
        m = centers.shape[0]
        u = jax.random.uniform(kn, (m, neg_num))
        # unigram^0.75 draws: #{j: cdf[j] < u} == searchsorted(cdf, u),
        # but XLA lowers searchsorted to a log2(V)-iteration while loop of
        # gather fusions (profiled: 3.5 of the 4.9 ms step); the fused
        # broadcast-compare-count is one VPU pass at small vocabularies.
        # The compare-count is O(m*neg*V) VPU work, so above
        # COMPARE_COUNT_MAX_VOCAB it would regress below the log2(V)
        # searchsorted path it replaced — gate on vocab size.
        if vocab <= COMPARE_COUNT_MAX_VOCAB:
            negs = jnp.sum((u[..., None] > neg_table_cdf).astype(jnp.int32),
                           axis=-1)
        else:
            negs = jnp.searchsorted(neg_table_cdf, u).astype(jnp.int32)
        negs = jnp.minimum(negs, vocab - 1)

        v_in = emb_in[centers]                            # (m, d)
        v_pos = emb_out[contexts]                         # (m, d)
        v_neg = emb_out[negs]                             # (m, neg, d)

        pos_score = jnp.sum(v_in * v_pos, axis=-1)        # (m,)
        neg_score = jnp.einsum("md,mnd->mn", v_in, v_neg)

        g_pos = jax.nn.sigmoid(pos_score) - 1.0           # dL/dscore
        g_neg = jax.nn.sigmoid(neg_score)                 # (m, neg)

        grad_in = (g_pos[:, None] * v_pos
                   + jnp.einsum("mn,mnd->md", g_neg, v_neg))
        grad_pos = g_pos[:, None] * v_in
        grad_neg = g_neg[..., None] * v_in[:, None, :]

        # Normalize each row's accumulated update by its occurrence count in
        # the minibatch: scatter-add otherwise sums hundreds of per-sample
        # steps on small vocabularies and diverges (sequential word2vec SGD
        # takes one lr-sized step per occurrence, interleaved with re-reads).
        # sum_r grad_i / cnt_r == (sum_r grad_i) / cnt_r, so the per-row
        # normalization factors out and both table updates become ONE
        # MXU one-hot scatter each (ops/table_scatter.py; the XLA .at[].add
        # scatters were latency-bound RMW — measured 5.9 ms per 8192-pair
        # step on the chip, i.e. slower than the torch-CPU mirror).  The
        # kernels fall back to .at[].add on CPU / non-dividing shapes.
        from matcha_tpu.ops.table_scatter import (bincount_f32,
                                                  scatter_add_matmul)
        d = emb_in.shape[1]
        out_idx = jnp.concatenate([contexts, negs.reshape(-1)])
        cnt_in = bincount_f32(centers, vocab)
        cnt_out = bincount_f32(out_idx, vocab)
        sum_in = scatter_add_matmul(grad_in, centers, vocab)      # (V, d)
        g_out = jnp.concatenate([grad_pos, grad_neg.reshape(-1, d)])
        sum_out = scatter_add_matmul(g_out, out_idx, vocab)       # (V, d)
        emb_in = emb_in - lr * sum_in / jnp.maximum(cnt_in, 1.0)[:, None]
        emb_out = emb_out - lr * sum_out / jnp.maximum(cnt_out, 1.0)[:, None]

        loss = (-jax.nn.log_sigmoid(pos_score).mean()
                - jax.nn.log_sigmoid(-neg_score).sum(-1).mean())
        return (emb_in, emb_out, key), loss

    (emb_in, emb_out, key), losses = jax.lax.scan(
        step, (emb_in, emb_out, key), pairs)
    return emb_in, emb_out, losses


def sgns_epoch_chunked(emb_in, emb_out, pairs_b: np.ndarray, cdf, key, *,
                       neg_num: int = 5, lr: float = 0.025,
                       chunk: int = 512):
    """_sgns_epoch over a large host corpus in bounded device chunks.

    One device_put of the whole minibatched corpus can be GBs; remote /
    tunneled backends drop transfers that large (observed: a 1.6 GB
    corpus put wedged the device).  Chunks of ``chunk`` minibatches
    (~32 MB at m=8192) stream instead; the embedding tables stay on
    device across calls, so steady-state throughput is unchanged.

    A corpus whose minibatch count does not divide ``chunk`` leaves one
    tail chunk of a smaller leading shape, costing one extra jit compile
    of ``_sgns_epoch`` per distinct tail size.  All pairs still train
    exactly once (padding the tail would double-train wrapped pairs), so
    the tail is kept as-is; on short corpora the extra compile dominates
    — pass a smaller ``chunk`` there."""
    losses = []
    for s in range(0, pairs_b.shape[0], chunk):
        key, kc = jax.random.split(key)
        piece = jnp.asarray(np.asarray(pairs_b[s:s + chunk],
                                       dtype=np.int32))
        emb_in, emb_out, ls = _sgns_epoch(emb_in, emb_out, piece, cdf, kc,
                                          neg_num=neg_num, lr=lr)
        losses.append(ls)
    return emb_in, emb_out, jnp.concatenate(losses)


def train_skipgram(walks: np.ndarray, vocab: int, dim: int, *,
                   window: int = 10, neg_num: int = 5, epochs: int = 1,
                   lr: float = 0.1, batch: int = 4096,
                   seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Train SGNS over walks -> (emb_in (V, d), mean loss per epoch)."""
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    emb_in = jnp.asarray(
        (rng.random((vocab, dim)) - 0.5) / dim, dtype=jnp.float32)
    emb_out = jnp.zeros((vocab, dim), dtype=jnp.float32)
    cdf = jnp.asarray(np.cumsum(unigram_table(walks, vocab)))

    losses = []
    for ep in range(epochs):
        pairs = walks_to_pairs(walks, window, rng)
        if len(pairs) >= batch:
            # wrap the tail around to fill the last minibatch (truncating
            # would silently drop up to batch-1 pairs every epoch)
            n_b = -(-len(pairs) // batch)
            pad = n_b * batch - len(pairs)
            if pad:
                pairs = np.concatenate([pairs, pairs[:pad]])
            pairs_b = pairs.reshape(n_b, batch, 2)
        else:
            pairs_b = pairs[None, :, :]
        key, ke = jax.random.split(key)
        emb_in, emb_out, ls = sgns_epoch_chunked(
            emb_in, emb_out, pairs_b, cdf, ke, neg_num=neg_num, lr=lr)
        losses.append(float(ls.mean()))
    return np.asarray(emb_in), np.asarray(losses)
