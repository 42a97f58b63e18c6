"""The Hyper-SAGNN hyperedge classifier, TPU-first.

Capability parity with the reference's ``MultipleEmbedding`` + ``Classifier``
(ref: Code/Modules.py:125-318) with one structural re-design for TPU:

  The reference gathers a frozen per-chromosome corrcoef row per node
  occurrence and pushes it through a per-chromosome tied autoencoder inside a
  Python mask loop (ref Code/Modules.py:176-189).  Here the *entire* frozen
  feature table is encoded once per step — one (n_c × n_c)·(n_c × d) matmul
  chain per chromosome, all MXU — producing a node-embedding table
  ``H ∈ (N+1, d)``; the per-batch path is then a single gather ``H[x]``.
  Mathematically identical in eval mode; in train mode feature-dropout is
  applied per node row per step instead of per occurrence per batch (noted
  deviation, same regularizer in expectation).

Parity quirks preserved (see SURVEY.md §2.9):
  * the encoder's "static" output is the pre-attention embedding
    tanh(next_w(node+attr)) (ref Code/Modules.py:611-617)
  * forward returns raw logits, no sigmoid (loss is BCE-with-logits,
    ref Code/main.py:529)
  * score = masked mean over positions of pff_classifier((dynamic-static)^2)
    with +1e-15 guard (ref Code/Modules.py:294-311)
  * inter-chromosome reconstruction auxiliary loss against z-scored inter
    contact rows of ONE random chromosome, ×100 (ref Code/Modules.py:192-199)
  * dead branches (encode2, MHA fc2, pff_n2, tied-AE decode biases) receive no
    gradients in the reference and are omitted here (they stay at init there).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from matcha_tpu.models import modules as nn
from matcha_tpu.models.modules import (dropout, encoder_layer,
                                       encoder_layer_init, feed_forward,
                                       feed_forward_init, layer_norm,
                                       layer_norm_init, linear, linear_init,
                                       pff, pff_init, tanh)


class ModelDims(NamedTuple):
    """Static model geometry (jit-static)."""
    dim: int = 64               # embed_dim == d_model == d_k == d_v == bottleneck
    n_head: int = 8
    diag_mask: bool = True
    feature_dropout: float = 0.2   # ref Code/Modules.py:174
    num_chroms: int = 0
    num_nodes: int = 0          # N (excluding pad id 0)
    compute_dtype: str = "float32"  # "bfloat16" = mixed precision (f32 master
                                    # params, f32 softmax/LN stats/loss)
    use_pallas_attention: bool = False  # fused VMEM attention kernel (TPU)
    attr_dim: int = 0           # columns of attr_table; 0 = num_chroms + 1
                                # (the built-in one-hot-chrom + coord table).
                                # Nonzero = a user attribute matrix (the
                                # legacy attribute_dict surface, ref
                                # History_version/Code/main_drop.py:607-631)
    feature_dropout_mode: str = "per_node"
                                # "per_node": dropout drawn once per node ROW
                                #   per step on the frozen feature table (the
                                #   TPU-first table-encode design; same
                                #   regularizer in expectation).
                                # "per_occurrence": reference-exact placement
                                #   (ref Code/Modules.py:174,176-189) — drawn
                                #   per node OCCURRENCE per batch on the
                                #   gathered feature row, encoded per token,
                                #   recon decoded from the per-token
                                #   (dropout-bearing) embedding.  Opt-in A/B
                                #   path: O(T·W·d) per step, not the hot path.

    @property
    def cdt(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32


class FrozenTables(NamedTuple):
    """Non-trainable device buffers."""
    features: Tuple[jnp.ndarray, ...]   # per-chrom corrcoef (n_c, n_c)
    attr_table: jnp.ndarray             # (N+1, C+1) one-hot chrom + scaled coord
    inter_z: jnp.ndarray                # (N, N) row-z-scored inter contacts
    chrom_of_node: jnp.ndarray          # (N+1,) int32
    chrom_bounds: jnp.ndarray           # (C, 2) node-id [start, end)


_FUSE_TAIL: Optional[bool] = None
_RECON_BF16: Optional[bool] = None


def _recon_decode_bf16() -> bool:
    """MATCHA_RECON_BF16=1: the recon decode matmul (N, d)@(d, F) runs with
    bf16 operands / f32 accumulation instead of full f32 — the A/B knob for
    the single biggest 100 kb step premium (the f32 dot chain decodes all N
    node rows; VERDICT r4 #6).  Read once per process: the gate is consulted
    at trace time."""
    global _RECON_BF16
    if _RECON_BF16 is None:
        import os
        _RECON_BF16 = os.environ.get("MATCHA_RECON_BF16", "0") == "1"
    return _RECON_BF16


def _fuse_tail_enabled() -> bool:
    """MATCHA_FUSE_TAIL, read ONCE per process: the gate is consulted at
    trace time, so a mid-run env flip would otherwise mix fused and XLA
    tails (with different dropout placement) across retraces."""
    global _FUSE_TAIL
    if _FUSE_TAIL is None:
        import os
        _FUSE_TAIL = os.environ.get("MATCHA_FUSE_TAIL", "0") == "1"
    return _FUSE_TAIL


def configure_fuse_tail(enabled: bool) -> None:
    """Programmatic equivalent of MATCHA_FUSE_TAIL (config knob
    ``fuse_tail``).  Must run before the first forward trace; flipping the
    gate after it has been consulted would mix fused and XLA tails (with
    different dropout placement) across retraces, so that raises."""
    global _FUSE_TAIL
    if _FUSE_TAIL is not None and _FUSE_TAIL != bool(enabled):
        raise RuntimeError("fuse_tail gate already consulted with value "
                           f"{_FUSE_TAIL}; set it before the first forward")
    _FUSE_TAIL = bool(enabled)


# --------------------------------------------------------------------- init
def init_model(key: jax.Array, dims: ModelDims, chrom_sizes: List[int],
               embedding_mode: str = "corrcoef-ae",
               table_init: Optional[np.ndarray] = None) -> Dict:
    """Build the trainable parameter pytree.

    chrom_sizes: number of bins per chromosome (widths of the corrcoef
    feature tables).

    embedding_mode:
      "corrcoef-ae" — per-chromosome tied autoencoders over the frozen
        corrcoef tables (the current reference pipeline, Code/Modules.py:125).
      "table" — a plain trainable (N+1, dim) embedding table, optionally
        initialized from walk/skip-gram pretraining — the legacy
        Wrap_Embedding path (History_version/Code/main_SPRITE.py:757-765);
        the inter-chromosome recon loss is 0 in this mode, as in the legacy
        Wrap_Embedding's zero recon return (History_version .../Modules.py).
    """
    if table_init is None:
        # one jitted dispatch for the whole tree: eager per-leaf RNG costs
        # ~100 sequential host<->device round trips (tens of seconds on a
        # high-latency device link; measured 50 s of the bench cold start)
        return _init_model_jit(key, dims,
                               tuple(int(c) for c in chrom_sizes),
                               embedding_mode)
    return _init_model_body(key, dims, tuple(chrom_sizes), embedding_mode,
                            table_init)


@partial(jax.jit, static_argnums=(1, 2, 3))
def _init_model_jit(key, dims, chrom_sizes, embedding_mode):
    return _init_model_body(key, dims, chrom_sizes, embedding_mode, None)


def _init_model_body(key, dims, chrom_sizes, embedding_mode, table_init):
    d = dims.dim
    keys = jax.random.split(key, 8 + 2 * len(chrom_sizes))
    if embedding_mode == "table":
        n_total = sum(chrom_sizes)
        if table_init is not None:
            table = jnp.asarray(np.concatenate(
                [np.zeros((1, d), np.float32),
                 np.asarray(table_init, np.float32)]))
        else:
            table = jax.random.normal(keys[7], (n_total + 1, d)) * 0.02
            table = table.at[0].set(0.0)
        embed = {"table": table}
    else:
        ae, recon = [], []
        for c, n_c in enumerate(chrom_sizes):
            k1, k2 = jax.random.split(keys[8 + c])
            # tied autoencoder [n_c, d, d], use_bias=False
            # (ref Code/Modules.py:163); kaiming-uniform(a=sqrt(5)) ==
            # U(±1/sqrt(fan_in)) per layer
            ae.append({
                "w1": linear_init(k1, n_c, d, use_bias=False)["w"],
                "w2": linear_init(k2, d, d, use_bias=False)["w"],
            })
            # per-chrom inter-recon decoder FeedForward([d, n_c]) (ref :166)
            recon.append(linear_init(keys[8 + len(chrom_sizes) + c], d, n_c))
        embed = {"ae": ae, "recon": recon}

    attr_dim = dims.attr_dim if dims.attr_dim else len(chrom_sizes) + 1
    return {
        "embed": embed,
        "attr_nn": linear_init(keys[0], attr_dim, d),      # ref :248
        "next_w": feed_forward_init(keys[1], [d, d]),      # Classifier.next_w :242
        "encoder": encoder_layer_init(keys[2], dims.n_head, d, d, d, d),
        "ln_dynamic": layer_norm_init(d),                  # layer_norm1 :240
        "ln_static": layer_norm_init(d),                   # layer_norm2 :241
        "pff_classifier": pff_init(keys[3], [d, 1]),       # :218
    }


def build_frozen_tables(genome, intra_adj: np.ndarray, inter_adj: np.ndarray,
                        table_dtype=jnp.float32) -> FrozenTables:
    """Host-side construction of the frozen buffers.

    * features: per-chromosome row-wise corrcoef of the intra-chrom contact
      block, NaN->0 (ref Code/main.py:569-577)
    * attr_table: one-hot chromosome + coordinate scaled by the first
      chromosome's bin count; row 0 zeros for padding (ref Code/main.py:497-512)
    * inter_z: per-row z-score over positive entries of the inter-chrom
      matrix, NaN->0 (ref Code/Modules.py:146-152); stored with a leading
      zero row so it can be indexed by node id directly.

    Row padding for model-axis sharding is NOT done here — the Trainer
    applies parallel/mesh.pad_frozen_for_mesh (the single implementation;
    encode_node_table slices the pads back off).
    """
    C = genome.num_chroms
    n = genome.num_nodes

    features = []
    for c in range(C):
        s, e = genome.chrom_range[c]
        block = intra_adj[s - 1:e - 1, s - 1:e - 1].astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            corr = np.corrcoef(block)
        corr = np.nan_to_num(corr, nan=0.0).astype(np.float32)
        features.append(jnp.asarray(corr, dtype=table_dtype))

    sizes = genome.bins_per_chrom
    attr = np.zeros((n + 1, C + 1), dtype=np.float32)
    for c in range(C):
        s, e = genome.chrom_range[c]
        attr[s:e, c] = 1.0
        attr[s:e, C] = np.arange(e - s, dtype=np.float32) / float(sizes[0])

    inter = np.asarray(inter_adj, dtype=np.float32).copy()
    with np.errstate(invalid="ignore", divide="ignore"):
        for i in range(inter.shape[0]):
            row = inter[i]
            pos = row > 0
            if pos.any():
                sel = row[pos]
                std = sel.std()
                row[pos] = (sel - sel.mean()) / std if std > 0 else 0.0
    inter = np.nan_to_num(inter, nan=0.0)
    inter_z = np.zeros((n + 1, n), dtype=np.float32)
    inter_z[1:, :] = inter   # row x holds inter contacts of node x (x>=1)

    return FrozenTables(
        features=tuple(features),
        attr_table=jnp.asarray(attr),
        inter_z=jnp.asarray(inter_z, dtype=table_dtype),
        chrom_of_node=jnp.asarray(genome.node2chrom, dtype=jnp.int32),
        chrom_bounds=jnp.asarray(genome.chrom_range, dtype=jnp.int32),
    )


# ---------------------------------------------------------------- embedding
def encode_node_table(params: Dict, frozen: FrozenTables, dims: ModelDims, *,
                      key: Optional[jax.Array] = None, train: bool = False,
                      ) -> jnp.ndarray:
    """Encode every chromosome's frozen feature table through its tied
    autoencoder -> node embedding table H of shape (N+1, dim); row 0 zeros.

    This is the TPU replacement for the reference's per-batch mask loop
    (ref Code/Modules.py:176-189): H = tanh(X @ W1) @ W2 per chromosome.
    In "table" embedding mode the trainable table IS the node table.
    """
    cdt = dims.cdt
    if "table" in params["embed"]:
        return params["embed"]["table"].at[0].set(0.0).astype(cdt)
    if dims.feature_dropout_mode == "per_occurrence":
        # per-occurrence mode draws its dropout on the gathered per-token
        # feature rows (_per_occurrence_embed); the table itself — used for
        # eval, export, and the pad-max pad rows — stays clean
        train = False
    feats = frozen.features
    widths = [f.shape[1] for f in feats]     # true row counts = col counts
    rows = [f.shape[0] for f in feats]       # may carry mesh row-padding
    R, W = max(rows), max(widths)
    # Batched encode: all chromosomes' tied AEs as ONE zero-padded bmm
    # chain (padded X columns meet padded W1 rows, so pad contributions
    # vanish; pad h rows are discarded by the row gather).  Replaces the
    # ~370 tiny HLO ops the per-chrom loop compiles to at 1 Mb.  Measured
    # perf-NEUTRAL on the chip at the bench workload (4.38 ms/step both
    # ways — the backend amortizes small-op launches better than assumed);
    # kept for the smaller executable and simpler sharded story.  Gated by
    # table volume: at 100 kb the padded stack would be ~0.5 GB and the
    # per-chrom matmuls are large enough to amortize their launches anyway.
    # Gate on a PAD-INDEPENDENT volume (true rows of a corrcoef table ==
    # its width, so C*W*W ignores mesh row-padding): gating on R would let
    # a mesh run (larger R) take the per-chrom loop while the single-device
    # run takes the batched path near the threshold, drawing different
    # feature-dropout masks and breaking sharded==single trajectories.
    if len(feats) > 1 and len(feats) * W * W * 4 <= (64 << 20):
        x = jnp.stack([jnp.pad(f.astype(cdt),
                               ((0, R - f.shape[0]), (0, W - f.shape[1])))
                       for f in feats])                        # (C, R, W)
        if train and key is not None:
            key, kd = jax.random.split(key)
            # the mask is drawn at the PAD-INDEPENDENT shape (C, W, W) —
            # true row count of a corrcoef table equals its width — and
            # padded with keep=True: drawing at (C, R, W) would give the
            # single-device and mesh trainers different masks whenever
            # pad_frozen_for_mesh row-pads the features (R differs), and
            # the sharded==single trajectory test pins that alignment
            rate = dims.feature_dropout
            if rate > 0.0:
                keep = jax.random.bernoulli(kd, 1.0 - rate, (len(feats), W, W))
                keep = jnp.pad(keep, ((0, 0), (0, R - W), (0, 0)),
                               constant_values=True)
                x = jnp.where(keep, x / (1.0 - rate), 0)
        w1 = jnp.stack([jnp.pad(p["w1"].astype(cdt),
                                ((0, W - p["w1"].shape[0]), (0, 0)))
                        for p in params["embed"]["ae"]])       # (C, W, d)
        w2 = jnp.stack([p["w2"].astype(cdt)
                        for p in params["embed"]["ae"]])       # (C, d, d)
        h = jnp.einsum("crw,cwd->crd", jnp.tanh(
            jnp.einsum("crw,cwd->crd", x, w1)), w2)            # (C, R, d)
        # row gather: node id i (1-based) -> (chrom c, local row) in h
        flat_idx = np.concatenate(
            [c * R + np.arange(w) for c, w in enumerate(widths)])
        table = h.reshape(len(feats) * R, dims.dim)[flat_idx]
        return jnp.concatenate(
            [jnp.zeros((1, dims.dim), dtype=cdt), table], axis=0)
    blocks = [jnp.zeros((1, dims.dim), dtype=cdt)]
    for c, x in enumerate(feats):
        if train and key is not None:
            key, kd = jax.random.split(key)
            x = dropout(kd, x.astype(cdt), dims.feature_dropout, train)
        else:
            x = x.astype(cdt)
        ae = params["embed"]["ae"][c]
        h = jnp.tanh(x @ ae["w1"].astype(cdt)) @ ae["w2"].astype(cdt)
        # feature tables may carry zero row-padding for model-axis sharding;
        # the true row count of a corrcoef table equals its column count
        blocks.append(h[:x.shape[1]])
    return jnp.concatenate(blocks, axis=0)


def _per_occurrence_embed(params: Dict, frozen: FrozenTables,
                          dims: ModelDims, flat: jnp.ndarray,
                          key: Optional[jax.Array]) -> jnp.ndarray:
    """Reference-exact feature-dropout placement (opt-in,
    dims.feature_dropout_mode == "per_occurrence"): gather each token's
    frozen feature row, draw dropout per OCCURRENCE per batch, and encode
    through that chromosome's tied autoencoder — the semantics of the
    reference's per-batch mask loop (ref Code/Modules.py:174,176-189),
    where ``self.dropout(adj)`` acts on the gathered rows.

    Returns (T, d) node-only embeddings (pre-attribute; row of token id 0
    is exactly zero — its feature row is zero and the AE has no bias).
    O(T·W·d) work + a (T, W, d) weight gather: an A/B path, not the
    table-encode hot path."""
    cdt = dims.cdt
    feats = frozen.features
    widths = [f.shape[1] for f in feats]   # true rows == width (corrcoef)
    W = max(widths)
    rows = [jnp.zeros((1, W), cdt)]        # pad id 0
    for f, w in zip(feats, widths):
        rows.append(jnp.pad(f[:w].astype(cdt), ((0, 0), (0, W - w))))
    f_all = jnp.concatenate(rows, axis=0)                  # (N+1, W)
    x_feat = f_all[flat]                                   # (T, W)
    rate = dims.feature_dropout
    if rate > 0.0 and key is not None:
        keep = jax.random.bernoulli(key, 1.0 - rate, x_feat.shape)
        x_feat = jnp.where(keep, x_feat / (1.0 - rate), 0)
    w1 = jnp.stack([jnp.pad(p["w1"].astype(cdt),
                            ((0, W - p["w1"].shape[0]), (0, 0)))
                    for p in params["embed"]["ae"]])       # (C, W, d)
    w2 = jnp.stack([p["w2"].astype(cdt)
                    for p in params["embed"]["ae"]])       # (C, d, d)
    c_t = jnp.clip(frozen.chrom_of_node[flat], 0, len(feats) - 1)
    h1 = jnp.tanh(jnp.einsum("tw,twd->td", x_feat, w1[c_t]))
    return jnp.einsum("td,tde->te", h1, w2[c_t])           # (T, d)


def recon_loss_fn(params: Dict, frozen: FrozenTables, dims: ModelDims,
                  x_flat: jnp.ndarray, node_table: jnp.ndarray,
                  key: jax.Array) -> jnp.ndarray:
    """Inter-chromosomal reconstruction auxiliary loss
    (ref Code/Modules.py:192-199): pick one random chromosome r; for batch
    nodes NOT on r, decode FF_r(tanh(embed)) and MSE against the z-scored
    inter-contact row restricted to r's columns; ×100.

    Computed per NODE (recon_loss_node), not per token: exact, and removes
    the (T, F) target gather that dominated the training step's HBM time."""
    if "table" in params["embed"]:
        return jnp.asarray(0.0)       # legacy Wrap_Embedding: zero recon
    r = jax.random.randint(key, (), 0, dims.num_chroms)
    return recon_loss_node(params, frozen, dims, x_flat, node_table, r)


def _padded_recon_parts(params, frozen, r):
    """Shared padded-decoder machinery for the recon losses: every
    chromosome's decoder padded to the max feature width, chromosome r's
    weights/columns selected by dynamic index/gather (a 23-branch
    lax.switch here bloats both compile time and the executable).
    Returns (w_r (d, F), b_r (F,), cols (F,), col_ok (F,), width_r)."""
    widths = [f.shape[1] for f in frozen.features]
    col_start = np.concatenate([[0], np.cumsum(widths)[:-1]])
    f_max = int(max(widths))
    w_stack = jnp.stack([
        jnp.pad(p_c["w"], ((0, 0), (0, f_max - p_c["w"].shape[1])))
        for p_c in params["embed"]["recon"]])                 # (C, d, F)
    b_stack = jnp.stack([
        jnp.pad(p_c["b"], (0, f_max - p_c["b"].shape[0]))
        for p_c in params["embed"]["recon"]])                 # (C, F)
    width_arr = jnp.asarray(widths)
    start_arr = jnp.asarray(col_start)
    cols = start_arr[r] + jnp.arange(f_max)                   # (F,)
    col_ok = jnp.arange(f_max) < width_arr[r]
    cols = jnp.clip(cols, 0, frozen.inter_z.shape[1] - 1)
    return w_stack[r], b_stack[r], cols, col_ok, width_arr[r]


def recon_loss_node(params: Dict, frozen: FrozenTables, dims: ModelDims,
                    x_flat: jnp.ndarray, node_table: jnp.ndarray,
                    r) -> jnp.ndarray:
    """Per-node restructure of recon_loss_with_chrom — exact up to f32
    summation order (pinned in tests/test_forward_buckets.py): every token
    of a node shares its embedding row, so the token-mean MSE equals the
    node MSE weighted by token multiplicity.  Decodes N node rows instead
    of T token rows (T/N ≈ 70× at bench scale) and reads the (N, F) target
    slice instead of gathering (T, F) rows — the latter was ~10 ms/step of
    gather HBM time, ~35% of the whole training step."""
    R = int(min(node_table.shape[0], frozen.inter_z.shape[0],
                frozen.chrom_of_node.shape[0]))
    T = int(np.prod(x_flat.shape))
    if dims.use_pallas_attention and jax.default_backend() != "cpu":
        # Pallas iota-compare bincount (ops/table_scatter.py): the XLA
        # broadcast-compare-reduce below materializes the T x R boolean
        # through a convert (0.48 ms/step at bench scale); the kernel's
        # blockwise compare+lane-reduce measures ~0.1 ms.  Under a data
        # mesh: per-shard counts + psum via shard_map.
        from matcha_tpu.ops.table_scatter import (bincount_f32,
                                                  bincount_sharded)
        from matcha_tpu.parallel.mesh import (active_data_mesh,
                                              kernel_batch_factor)
        mesh = active_data_mesh()
        flat_ids = x_flat.reshape(-1)
        if mesh is not None and T % kernel_batch_factor(mesh) == 0:
            cnt = bincount_sharded(flat_ids, R, mesh)
        elif mesh is not None and T * R <= (1 << 31):
            cnt = jnp.sum(
                flat_ids[:, None] == jnp.arange(R)[None, :],
                axis=0, dtype=jnp.float32)
        elif mesh is not None:
            # 100 kb-scale T x R would be multi-GB: bounded-memory scatter
            cnt = jnp.zeros((R,), jnp.float32).at[flat_ids].add(1.0)
        else:
            cnt = bincount_f32(flat_ids, R)
    elif T * R <= (1 << 31):
        # fused broadcast-compare-reduce: a T-row scatter-add into (R,)
        # profiles at ~1.5 ms (row-count-bound) on TPU, while T*R VPU
        # compares reduce in ~0.2 ms at bench scale
        cnt = jnp.sum(
            x_flat.reshape(-1)[:, None] == jnp.arange(R)[None, :],
            axis=0, dtype=jnp.float32)
    else:
        cnt = jnp.zeros((R,), jnp.float32).at[x_flat].add(1.0)
    node_ids = jnp.arange(R)
    w_n = cnt * ((frozen.chrom_of_node[:R] != r) & (node_ids != 0))

    w_r, b_r, cols, col_ok, width_r = _padded_recon_parts(params, frozen, r)
    widths = [f.shape[1] for f in frozen.features]
    f_max = int(max(widths))
    if frozen.inter_z.shape[1] >= sum(widths) + f_max:
        # inter_z carries >= f_max zero pad columns (Trainer init): the
        # target slice is a contiguous dynamic_slice — at 100 kb the
        # clipped column GATHER of the (R, F) slice was 0.68 ms/step of
        # pure HBM shuffling.  Values are identical: the pad columns are
        # zero AND masked by col_ok, and no clipping can trigger.
        start = jnp.asarray(
            np.concatenate([[0], np.cumsum(widths)[:-1]]))[r]
        target = jax.lax.dynamic_slice_in_dim(
            frozen.inter_z[:R], start, f_max, axis=1).astype(jnp.float32)
    else:
        target = frozen.inter_z[:R, cols].astype(jnp.float32)  # (R, F)
    h_dec = tanh(node_table[:R].astype(jnp.float32))
    if _recon_decode_bf16():
        # bf16 operands, f32 accumulate (the precision pinned acceptable
        # for the Pallas bwd recompute, BASELINE round 2); targets/compare
        # stay f32.  A/B opt-in — see MATCHA_RECON_BF16
        recon = jnp.matmul(h_dec.astype(jnp.bfloat16),
                           w_r.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32) + b_r
    else:
        recon = h_dec @ w_r + b_r                             # (R, F)
    sq = jnp.where(col_ok[None, :], (target - recon) ** 2, 0.0)
    per_node = jnp.sum(sq, axis=-1) / width_r
    denom = jnp.sum(w_n)
    loss = jnp.where(denom > 0,
                     jnp.sum(per_node * w_n) / jnp.maximum(denom, 1.0), 0.0)
    return loss * 100.0


def recon_loss_with_chrom(params: Dict, frozen: FrozenTables, dims: ModelDims,
                          x_flat: jnp.ndarray, emb_flat: jnp.ndarray,
                          r) -> jnp.ndarray:
    chrom = frozen.chrom_of_node[x_flat]
    mask = (chrom != r) & (x_flat != 0)

    # column offsets are static, derived from the per-chrom feature
    # table widths (shape[1]: rows may carry sharding pad, columns never do)
    w_r, b_r, cols, col_ok, width_r = _padded_recon_parts(params, frozen, r)
    target = frozen.inter_z[:, cols][x_flat].astype(jnp.float32)  # (M, F)
    recon = (tanh(emb_flat.astype(jnp.float32)) @ w_r
             + b_r)                                           # (M, F)
    sq = jnp.where(col_ok[None, :], (target - recon) ** 2, 0.0)
    per_row = jnp.sum(sq, axis=-1) / width_r
    denom = jnp.sum(mask)
    loss = jnp.where(denom > 0,
                     jnp.sum(per_row * mask) / jnp.maximum(denom, 1), 0.0)
    return loss * 100.0


# ------------------------------------------------------------------ forward
def forward(params: Dict, frozen: FrozenTables, dims: ModelDims,
            x: jnp.ndarray, *, key: Optional[jax.Array] = None,
            train: bool = False, return_recon: bool = False,
            node_table: Optional[jnp.ndarray] = None,
            return_positions: bool = False):
    """Score a padded hyperedge batch x (B, L) int32 -> raw logits (B, 1).

    node_table: optionally pass a precomputed encode_node_table result (reused
    across the per-size buckets of one train step).
    return_positions: also return the per-position raw scores (B, L) before
    the masked mean — the signal behind outlier-member detection (the legacy
    reference accepts a ``get_outlier`` argument but silently ignores it,
    History_version/Code/Modules.py:314-356; here the capability works)."""
    if key is not None:
        key, k_tab, k_rec, k_enc = jax.random.split(key, 4)
    else:
        k_tab = k_rec = k_enc = None

    if node_table is None:
        node_table = encode_node_table(params, frozen, dims, key=k_tab,
                                       train=train)

    b, L = x.shape
    npm = (x != 0).astype(jnp.float32)[..., None]      # (B, L, 1)

    per_occ = (train and k_tab is not None
               and dims.feature_dropout_mode == "per_occurrence"
               and "table" not in params["embed"])
    emb_tok = None
    if per_occ:
        flat = x.reshape(-1)
        emb_tok = _per_occurrence_embed(params, frozen, dims, flat, k_tab)
        emb = (emb_tok.reshape(b, L, dims.dim)
               + linear(params["attr_nn"],
                        frozen.attr_table.astype(dims.cdt))[x])
        h = tanh(feed_forward(params["next_w"], emb))
    else:
        # node + projected-attribute tables are combined per NODE before the
        # token gather: node_table[x] + linear(attr_table[x]) == combined[x]
        # exactly (same per-row values), and the (T, C+1) attribute gather +
        # (T, C+1)@(C+1, d) matmul drop out of the per-token hot path
        combined = node_table + linear(params["attr_nn"],
                                       frozen.attr_table.astype(dims.cdt))
        h = tanh(feed_forward(params["next_w"], combined[x]))

    dynamic, static = encoder_layer(
        params["encoder"], h, npm.astype(h.dtype), dims.n_head, dims.dim,
        dims.dim, diag_mask=dims.diag_mask, key=k_enc, train=train,
        use_pallas=dims.use_pallas_attention)

    dynamic = layer_norm(params["ln_dynamic"], dynamic)
    static = layer_norm(params["ln_static"], static)
    out = (dynamic - static) ** 2 if dims.diag_mask else dynamic
    per_pos = pff(params["pff_classifier"], out).astype(jnp.float32)
    out = (jnp.sum(per_pos * npm, axis=-2)              # logits in f32
           / (jnp.sum(npm, axis=-2) + 1e-15))

    rest = ()
    if return_recon:
        if per_occ:
            # reference-exact recon placement: decoded from the per-token
            # (dropout-bearing) embedding (ref Code/Modules.py:192-199)
            r = jax.random.randint(k_rec, (), 0, dims.num_chroms)
            recon = recon_loss_with_chrom(params, frozen, dims,
                                          x.reshape(-1), emb_tok, r)
        else:
            recon = recon_loss_fn(params, frozen, dims, x.reshape(-1),
                                  node_table, k_rec)
        rest += (recon,)
    if return_positions:
        rest += (per_pos[..., 0],)
    return (out,) + rest if rest else out


def forward_buckets(params: Dict, frozen: FrozenTables, dims: ModelDims,
                    xs: Dict[int, jnp.ndarray], *,
                    key: Optional[jax.Array] = None, train: bool = False,
                    return_recon: bool = False,
                    node_table: Optional[jnp.ndarray] = None,
                    attention_mode: str = "per-k", n_shards: int = 1):
    """Forward over several per-k buckets as ONE merged token stream.

    Buckets contain no padding (every member is a real node id), so the
    reference's non-pad-mask multiplications are identities and the masked
    mean is a plain mean — every per-token stage (gather, attributes, next_w,
    pff_n1, LayerNorms, classifier head, recon) runs once over the
    concatenated stream instead of once per bucket; only the per-edge
    attention runs per k (its shape depends on k).  Output logits per bucket
    match `forward` exactly (pinned by tests/test_forward_buckets.py).

    attention_mode:
      "per-k"  — one attention per bucket shape (k=2 closed form): the
        "clean" no-pad semantics everywhere.
      "pad-max" — k=2 keeps the closed form; every k>=3 bucket is padded to
        L=max(k) and attention runs ONCE over the concatenation, with pad
        positions carrying the h of node id 0 (pads participate as keys —
        the reference's training-time semantics for sub-max sizes,
        ref Code/main.py:436-437 + the never-applied-mask quirk
        Code/Modules.py:611-613).  One attention kernel instantiation
        instead of one per k: ~3x faster cold compile, ~same throughput.

    n_shards: data-parallel shard count of the batch axis.  >1 switches all
    cross-bucket concats/splits to the shard-major layout
    (parallel/stream.py) so they are communication-free under the mesh;
    numerics are identical for any value (exact inverse pair).

    Returns ({k: (n_k, 1) logits}, recon) — recon only if return_recon.
    """
    from matcha_tpu.parallel.stream import shard_concat, shard_split
    if key is not None:
        key, k_tab, k_rec, k_enc = jax.random.split(key, 4)
    else:
        k_tab = k_rec = k_enc = None
    if node_table is None:
        node_table = encode_node_table(params, frozen, dims, key=k_tab,
                                       train=train)

    ks = sorted(xs.keys())
    shapes = [(int(xs[k].shape[0]), int(k)) for k in ks]
    tok_sizes = [n_k * k for (n_k, k) in shapes]
    flat = shard_concat([xs[k].reshape(-1) for k in ks], n_shards)   # (T,)
    from matcha_tpu.parallel.mesh import active_data_mesh
    mesh = active_data_mesh()      # pure-DP mesh for Pallas shard_map wraps
    T_tok = int(flat.shape[0])

    # node + projected-attribute tables combined per NODE before the token
    # gather (see `forward`): ONE (T, d) gather replaces the node gather,
    # the (T, C+1) attribute gather, and the per-token attr matmul; the
    # attr_nn gradient arrives through the combined table's scatter-add
    # transpose followed by one (C+1, N+1)@(N+1, d) matmul
    attr_proj = linear(params["attr_nn"], frozen.attr_table.astype(dims.cdt))
    combined = node_table + attr_proj
    per_occ = (train and k_tab is not None
               and dims.feature_dropout_mode == "per_occurrence"
               and "table" not in params["embed"])
    emb_tok = None
    if per_occ:
        # reference-exact feature-dropout placement (A/B opt-in): the
        # per-token embedding replaces the table gather; `combined` is
        # still used for the pad-max pad rows (token id 0: zero embedding)
        emb_tok = _per_occurrence_embed(params, frozen, dims, flat, k_tab)
        emb_attr = emb_tok + attr_proj[flat]
    elif dims.use_pallas_attention and jax.default_backend() != "cpu":
        # MXU one-hot-matmul VJP: the XLA scatter-add grad of this gather is
        # latency-bound random RMW (~1.6 ms/step at bench scale) — see
        # ops/table_scatter.py.  Under a data mesh the kernel is
        # shard_mapped (no GSPMD rule for Pallas custom calls); the
        # replicated table is pcast-to-varying so its gradient
        # partials psum in the transpose.
        from matcha_tpu.ops.table_scatter import (table_gather,
                                                  table_gather_sharded)
        from matcha_tpu.parallel.mesh import kernel_batch_factor
        if mesh is not None and T_tok % kernel_batch_factor(mesh) == 0:
            emb_attr = table_gather_sharded(combined, flat, mesh)
        elif mesh is not None:
            emb_attr = combined[flat]
        else:
            emb_attr = table_gather(combined, flat)              # (T, d)
    else:
        emb_attr = combined[flat]                                # (T, d)
    h = tanh(feed_forward(params["next_w"], emb_attr))           # (T, d)

    from matcha_tpu.models.modules import mha_dynamic
    keys_enc = (jax.random.split(k_enc, len(ks) + 1)
                if k_enc is not None else [None] * (len(ks) + 1))
    # Fused classifier tail (ops/fused_tail.py): dropout + pff_n1 + the
    # three LayerNorms + (dyn-static)^2 + classifier in one Pallas kernel
    # over the merged stream — the XLA chain re-reads the (T, d) stream
    # from HBM ~15 times.  The attention-output dropout (0.3) moves INSIDE
    # the kernel (in-kernel PRNG), so attention runs with drop_rate=0.
    # Opt-in (MATCHA_FUSE_TAIL=1): TPU-validated for correctness (eval
    # parity 7.6e-6, grads vs autodiff 6.3e-6 — BASELINE.md round 3) but
    # measured 16% SLOWER than the XLA chain at the bench workload (XLA
    # fuses these stages into neighbors; the custom call forces extra HBM
    # materialization), so the default stays off.  CPU eval-mode only
    # (interpret mode has no PRNG); under a pure-DP mesh the kernel is
    # shard_mapped over "data" like the other Pallas call sites.
    from matcha_tpu.ops.fused_tail import BT as _FT_BT
    from matcha_tpu.parallel.mesh import kernel_batch_factor as _kbf
    ft_quantum = _FT_BT * _kbf(mesh)
    use_fused_tail = (
        _fuse_tail_enabled()
        and dims.diag_mask and dims.use_pallas_attention
        and T_tok % ft_quantum == 0
        and (jax.default_backend() != "cpu"
             or not (train and k_enc is not None)))
    attn_drop = 0.0 if use_fused_tail else 0.3
    if attention_mode == "pad-max" and len(shapes) > 1:
        dyn = _attention_pad_max(params, frozen, dims, h, shapes, keys_enc,
                                 train, combined, n_shards,
                                 drop_rate=attn_drop)
    else:
        # per-bucket attention on static slices of the stream
        dyn_parts = []
        h_parts = shard_split(h, n_shards, tok_sizes)
        for i, (n_k, k) in enumerate(shapes):
            hk = h_parts[i].reshape(n_k, k, -1)
            dyn_k = mha_dynamic(params["encoder"]["mha"], hk, dims.n_head,
                                dims.dim, dims.dim, diag_mask=dims.diag_mask,
                                key=keys_enc[i], drop_rate=attn_drop,
                                train=train,
                                use_pallas=dims.use_pallas_attention)
            dyn_parts.append(dyn_k.reshape(n_k * k, -1))
        dyn = shard_concat(dyn_parts, n_shards)                  # (T, d)
    if use_fused_tail:
        from matcha_tpu.ops.fused_tail import fused_tail, pack_ln6
        pn = params["encoder"]["pff_n1"]
        ln6 = pack_ln6(pn["ln"], params["ln_dynamic"], params["ln_static"])
        cl = params["pff_classifier"]["layers"][0]
        # no key => the XLA path's dropout no-ops; mirror that exactly
        # (train with a zero seed would apply the same fixed mask every call)
        ft_train = train and keys_enc[-1] is not None
        if ft_train:
            seed = jax.random.randint(keys_enc[-1], (), 0,
                                      jnp.iinfo(jnp.int32).max,
                                      dtype=jnp.int32)
        else:
            seed = jnp.zeros((), jnp.int32)
        ft_args = (dyn, h, ln6, pn["layers"][0]["w"], pn["layers"][0]["b"],
                   pn["layers"][1]["w"], pn["layers"][1]["b"], cl["w"],
                   cl["b"], seed)
        if mesh is not None:
            from matcha_tpu.ops.fused_tail import fused_tail_sharded
            per_pos = fused_tail_sharded(*ft_args, 0.3, 0.4, ft_train,
                                         mesh)              # (T, 1) f32
        else:
            per_pos = fused_tail(*ft_args, 0.3, 0.4,
                                 ft_train)                   # (T, 1) f32
    else:
        dyn = pff(params["encoder"]["pff_n1"], dyn, residual=True,
                  key=keys_enc[-1], drop_rate=0.4, train=train)

        dynamic = layer_norm(params["ln_dynamic"], dyn)
        static = layer_norm(params["ln_static"], h)
        out = (dynamic - static) ** 2 if dims.diag_mask else dynamic
        per_pos = pff(params["pff_classifier"],
                      out).astype(jnp.float32)              # (T, 1)

    logits = {}
    pp_parts = shard_split(per_pos[:, 0], n_shards, tok_sizes)
    for i, (n_k, k) in enumerate(shapes):
        logits[ks[i]] = jnp.mean(pp_parts[i].reshape(n_k, k), axis=-1,
                                 keepdims=True)

    if return_recon:
        if per_occ:
            # reference-exact recon placement: decoded from the per-token
            # (dropout-bearing) embedding (ref Code/Modules.py:192-199)
            r = jax.random.randint(k_rec, (), 0, dims.num_chroms)
            recon = recon_loss_with_chrom(params, frozen, dims, flat,
                                          emb_tok, r)
        else:
            recon = recon_loss_fn(params, frozen, dims, flat, node_table,
                                  k_rec)
        return logits, recon
    return logits


def _attention_pad_max(params, frozen, dims, h, shapes, keys_enc, train,
                       combined, n_shards=1, drop_rate=0.3):
    """pad-max attention over the merged stream (see forward_buckets):
    k=2 closed form; k>=3 padded to L with the pad token's h and run as one
    batched attention; real positions scattered back into the stream.

    combined: the node + projected-attribute table (see forward_buckets);
    its row 0 is the pad token's pre-next_w input."""
    from matcha_tpu.models.modules import mha_dynamic
    from matcha_tpu.parallel.stream import shard_concat, shard_split
    L = max(k for _, k in shapes)
    # h of the pad token (node id 0): zero embedding row + attr row 0
    h_pad = tanh(feed_forward(params["next_w"], combined[0][None, :]))  # (1,d)

    dyn_parts = []
    padded = []
    h_parts = shard_split(h, n_shards, [n_k * k for (n_k, k) in shapes])
    for i, (n_k, k) in enumerate(shapes):
        hk = h_parts[i].reshape(n_k, k, -1)
        if k == 2:
            dyn2 = mha_dynamic(params["encoder"]["mha"], hk, dims.n_head,
                               dims.dim, dims.dim, diag_mask=dims.diag_mask,
                               key=keys_enc[i], drop_rate=drop_rate,
                               train=train,
                               use_pallas=dims.use_pallas_attention)
            dyn_parts.append((i, dyn2.reshape(n_k * k, -1)))
        else:
            pad = jnp.broadcast_to(h_pad[None], (n_k, L - k, h.shape[-1]))
            padded.append((i, n_k, k,
                           jnp.concatenate([hk, pad.astype(hk.dtype)], 1)))
    if padded:
        hp = shard_concat([p[3] for p in padded], n_shards)     # (E, L, d)
        dynp = mha_dynamic(params["encoder"]["mha"], hp, dims.n_head,
                           dims.dim, dims.dim, diag_mask=dims.diag_mask,
                           key=keys_enc[padded[0][0]], drop_rate=drop_rate,
                           train=train,
                           use_pallas=dims.use_pallas_attention)
        dynp_parts = shard_split(dynp, n_shards,
                                 [n_k for (_, n_k, _, _) in padded])
        for j, (i, n_k, k, _) in enumerate(padded):
            dyn_k = dynp_parts[j][:, :k, :]
            dyn_parts.append((i, dyn_k.reshape(n_k * k, -1)))
    dyn_parts.sort(key=lambda t: t[0])
    return shard_concat([d for _, d in dyn_parts], n_shards)


def node_embeddings(params: Dict, frozen: FrozenTables, dims: ModelDims,
                    ) -> jnp.ndarray:
    """All-node embedding export (ref save_embeddings, Code/main.py:462-479):
    the raw MultipleEmbedding output per node id 1..N -> (N, dim)."""
    table = encode_node_table(params, frozen, dims, train=False)
    return table[1:]


class HyperSAGNN(NamedTuple):
    """Bundled model handle: params + frozen buffers + static dims."""
    params: Dict
    frozen: FrozenTables
    dims: ModelDims

    def __call__(self, x, **kw):
        return forward(self.params, self.frozen, self.dims, x, **kw)
