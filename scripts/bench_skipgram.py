"""Skip-gram (SGNS) pretraining throughput on TPU (VERDICT r3 #8).

SURVEY §2.11 mandates a native-performance equivalent of the reference's
word2vec machinery (gensim Word2Vec over walk strings,
ref History_version/Code/main_SPRITE.py:740-751, plus the vestigial
compiled-TF ``word2vec_ops.so``).  This benchmarks ``walks/skipgram.py`` at
a realistic walk corpus: hypergraph walks over synthetic SPRITE-like
clusters on the hg38 1 Mb genome.

gensim is NOT in this image (zero egress), so the CPU comparator is a
torch-CPU implementation of the *same* batched SGNS update (gather +
sigmoid + scatter-add, identical math incl. the per-row count
normalization) using all host cores — an upper bound on what a
Python-driven CPU path gets.  For scale, gensim's own C kernels typically
report ~0.1-1M words/s/core on comparable corpora (its docs/benchmarks);
the number recorded here is measured, not cited.

Prints one JSON line with walks geometry, pairs/s, and words/s on each
backend.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

import jax

if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
    # this jax distro ignores the env var; force via config (see conftest)
    jax.config.update("jax_platforms", "cpu")


def torch_sgns_epoch(emb_in, emb_out, pairs_b, cdf, neg_num=5, lr=0.1,
                     seed=0):
    """The same minibatched SGNS update as walks/skipgram._sgns_epoch, in
    torch on CPU (all cores)."""
    import torch
    g = torch.Generator().manual_seed(seed)
    cdf_t = torch.from_numpy(np.asarray(cdf))
    vocab = emb_in.shape[0]
    losses = []
    for batch in pairs_b:
        centers = torch.from_numpy(batch[:, 0].astype(np.int64))
        contexts = torch.from_numpy(batch[:, 1].astype(np.int64))
        m = centers.shape[0]
        u = torch.rand((m, neg_num), generator=g, dtype=torch.float64)
        negs = torch.searchsorted(cdf_t, u.to(cdf_t.dtype))
        negs = negs.clamp_(max=vocab - 1)

        v_in = emb_in[centers]
        v_pos = emb_out[contexts]
        v_neg = emb_out[negs]
        pos_score = (v_in * v_pos).sum(-1)
        neg_score = torch.einsum("md,mnd->mn", v_in, v_neg)
        g_pos = torch.sigmoid(pos_score) - 1.0
        g_neg = torch.sigmoid(neg_score)

        grad_in = (g_pos[:, None] * v_pos
                   + torch.einsum("mn,mnd->md", g_neg, v_neg))
        grad_pos = g_pos[:, None] * v_in
        grad_neg = g_neg[..., None] * v_in[:, None, :]

        cnt_in = torch.zeros(vocab).index_add_(
            0, centers, torch.ones(m))
        out_idx = torch.cat([contexts, negs.reshape(-1)])
        cnt_out = torch.zeros(vocab).index_add_(
            0, out_idx, torch.ones(out_idx.shape[0]))
        grad_in = grad_in / cnt_in[centers][:, None]
        grad_pos = grad_pos / cnt_out[contexts][:, None]
        grad_neg = grad_neg / cnt_out[negs][..., None]

        emb_in.index_add_(0, centers, -lr * grad_in)
        emb_out.index_add_(0, contexts, -lr * grad_pos)
        emb_out.index_add_(0, negs.reshape(-1),
                           -lr * grad_neg.reshape(-1, grad_neg.shape[-1]))
        losses.append(float(
            -torch.nn.functional.logsigmoid(pos_score).mean()
            - torch.nn.functional.logsigmoid(-neg_score).sum(-1).mean()))
    return losses


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-walks", type=int, default=40)
    ap.add_argument("--walk-length", type=int, default=80)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--window", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--clusters", type=int, default=60_000)
    ap.add_argument("--cpu-batches", type=int, default=50,
                    help="torch-CPU comparator runs this many minibatches "
                         "and extrapolates")
    ap.add_argument("--weight-backend", default="scipy",
                    choices=["auto", "device", "scipy"],
                    help="cooccurrence backend for the walk build; scipy "
                         "keeps the (host-side) table construction off the "
                         "TPU so the chip first touches the SGNS epoch")
    args = ap.parse_args()

    from __graft_entry__ import _build_problem
    from matcha_tpu.walks.hyper import hypergraph_walks
    from matcha_tpu.walks.skipgram import (sgns_epoch_chunked, unigram_table,
                                           walks_to_pairs)

    genome, _, _, _ = _build_problem(dim=32, chroms=23)
    n = genome.num_nodes
    rng = np.random.default_rng(0)
    # SPRITE-like local clusters (same shape as scripts/datascale_4dn.py)
    edges = []
    for _ in range(args.clusters):
        s = int(rng.choice([2, 3, 4, 5, 6, 8, 12],
                           p=[.4, .2, .15, .1, .08, .05, .02]))
        a = int(rng.integers(0, max(n - 2 * s - 2, 1)))
        offs = rng.choice(2 * s + 2, s, replace=False)
        edges.append(np.sort(a + offs).astype(np.int64))

    t0 = time.time()
    walks = hypergraph_walks(n, edges, num_walks=args.num_walks,
                             walk_length=args.walk_length, seed=1,
                             weight_backend=args.weight_backend)
    walk_s = time.time() - t0
    tokens = int(walks.size)
    print(f"walks: {walks.shape} = {tokens / 1e6:.1f}M tokens "
          f"({walk_s:.1f}s to simulate)", file=sys.stderr)

    rng_p = np.random.default_rng(2)
    t0 = time.time()
    pairs = walks_to_pairs(walks, args.window, rng_p)
    pair_s = time.time() - t0
    n_pairs = len(pairs)
    print(f"pairs: {n_pairs / 1e6:.1f}M ({pair_s:.1f}s to build)",
          file=sys.stderr)
    n_b = len(pairs) // args.batch
    pairs_b = pairs[:n_b * args.batch].reshape(n_b, args.batch, 2)

    import jax
    import jax.numpy as jnp
    cdf = jnp.asarray(np.cumsum(unigram_table(walks, n)))
    emb_in = jnp.asarray((np.random.default_rng(3).random((n, args.dim))
                          - 0.5) / args.dim, dtype=jnp.float32)
    emb_out = jnp.zeros((n, args.dim), dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    # the epoch streams the corpus in ~32 MB chunks (one multi-GB
    # device_put wedges the tunneled backend — see sgns_epoch_chunked);
    # time to a fetched SCALAR, since block_until_ready can return before
    # the scan completes on this backend
    t0 = time.time()
    out = sgns_epoch_chunked(emb_in, emb_out, pairs_b, cdf, key)
    last_loss = float(out[2][-1])
    compile_s = time.time() - t0
    t0 = time.time()
    out = sgns_epoch_chunked(emb_in, emb_out, pairs_b, cdf, key)
    last_loss = float(out[2][-1])
    tpu_epoch_s = time.time() - t0
    print(f"final minibatch loss {last_loss:.4f}", file=sys.stderr)

    # device-resident compute rate: repeated passes over ONE resident chunk
    # (the streamed epoch above is transfer-bound on this SSH-tunneled
    # backend at ~25 MB/s; on locally-attached HBM the stream is ~10 ms)
    from matcha_tpu.walks.skipgram import _sgns_epoch
    chunk = jnp.asarray(pairs_b[:512].astype(np.int32))
    ei, eo = emb_in, emb_out
    ei, eo, ls = _sgns_epoch(ei, eo, chunk, cdf, key)
    float(ls[-1])
    t0 = time.time()
    reps = 4
    for _ in range(reps):
        ei, eo, ls = _sgns_epoch(ei, eo, chunk, cdf, key)
    resident_s = None
    float(ls[-1])
    resident_s = (time.time() - t0) / reps
    resident_pairs_s = chunk.shape[0] * args.batch / resident_s
    print(f"device-resident: {resident_pairs_s / 1e6:.1f}M pairs/s "
          f"({resident_s * 1000:.0f} ms / {chunk.shape[0]}-batch chunk)",
          file=sys.stderr)
    tpu_pairs_s = n_b * args.batch / tpu_epoch_s
    # gensim-style "words/s": corpus tokens consumed per second, where each
    # token costs (pairs / tokens) pair updates
    tpu_words_s = tpu_pairs_s * tokens / n_pairs
    print(f"TPU ({jax.default_backend()}): epoch {tpu_epoch_s:.2f}s "
          f"(+{compile_s:.1f}s compile) = {tpu_pairs_s / 1e6:.2f}M pairs/s "
          f"= {tpu_words_s / 1e6:.2f}M words/s", file=sys.stderr)

    import torch
    torch.set_num_threads(os.cpu_count())
    t_in = torch.from_numpy(np.asarray(emb_in)).clone()
    t_out = torch.zeros_like(t_in)
    nb_cpu = min(args.cpu_batches, n_b)
    t0 = time.time()
    torch_sgns_epoch(t_in, t_out, pairs_b[:nb_cpu],
                     np.cumsum(unigram_table(walks, n)))
    cpu_s = time.time() - t0
    cpu_pairs_s = nb_cpu * args.batch / cpu_s
    cpu_words_s = cpu_pairs_s * tokens / n_pairs
    print(f"torch CPU ({os.cpu_count()} threads): {nb_cpu} batches in "
          f"{cpu_s:.2f}s = {cpu_pairs_s / 1e6:.2f}M pairs/s "
          f"= {cpu_words_s / 1e6:.2f}M words/s", file=sys.stderr)

    print(json.dumps({
        "tokens": tokens, "pairs": n_pairs, "dim": args.dim,
        "walk_sim_s": round(walk_s, 1),
        "tpu_pairs_per_s": round(tpu_pairs_s),
        "tpu_words_per_s": round(tpu_words_s),
        "tpu_resident_pairs_per_s": round(resident_pairs_s),
        "torch_cpu_pairs_per_s": round(cpu_pairs_s),
        "torch_cpu_words_per_s": round(cpu_words_s),
        "speedup": round(tpu_pairs_s / cpu_pairs_s, 1),
        "speedup_resident": round(resident_pairs_s / cpu_pairs_s, 1)}))


if __name__ == "__main__":
    main()
