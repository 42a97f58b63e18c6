"""Two-stage training runtime.

Re-creates the reference's epoch machinery (ref: Code/main.py:119-342,637-679)
as jitted, scan-based device programs:

  * one train step = negative sampling + forward + weighted BCE (×alpha) +
    inter-chrom recon (×beta) + AdamW update, fused over all per-k buckets,
    sharing one node-table encode (the reference re-encodes per batch)
  * one epoch = a single ``lax.scan`` over stacked batches — one XLA program,
    no per-batch host round-trips (the reference's dominant stall was CPU
    negative sampling + per-batch device transfer, SURVEY §3.3)
  * stage 1: alpha=0, beta=1, no rejection filters (negatives are positive
    copies, harmless since alpha=0 — ref Code/main.py:589,637-643)
  * stage 2: Bloom filters from the unlabeled quantile set, fresh AdamW,
    alpha=1, beta=0.001, best-val-AUPRC checkpointing keyed on the LARGEST
    size's AUPRC (ref quirk, Code/main.py:313-314)
"""

from __future__ import annotations

import os
import pickle
import time
from functools import partial
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from matcha_tpu.data.batcher import BucketedBatcher
from matcha_tpu.models.hypersagnn import (FrozenTables, ModelDims,
                                          encode_node_table, forward,
                                          node_embeddings)
from matcha_tpu.sampler.bloom import DeviceBloomFilter, build_bloom_dict
from matcha_tpu.sampler.negative import (ChromTable,
                                         sample_negatives_with_stats)
from matcha_tpu.train.metrics import format_metrics, size_stratified_metrics


class TrainState(NamedTuple):
    params: Dict
    opt_state: optax.OptState
    key: jax.Array


class TrainSettings(NamedTuple):
    """Static knobs of a training stage."""
    alpha: float
    beta: float
    neg_num: int = 3
    min_distance: int = 0
    max_trials: int = 8       # parallel candidate rounds per negative
    extra_rounds: int = 32    # bounded re-trial of rows all T rounds missed
    # Bloom probes per negative: only the first S structurally-valid of the
    # T trial candidates are probed (sampler/negative.py) — the probe gather
    # is latency-bound at ~7 ns/row on TPU and dominates sampling cost.
    # k=2's chromosome-constrained space is dense (per-probe hit rates can
    # reach 30-50% on real 1 Mb data), so it gets more probes; k>=3 spaces
    # are ~n^k-sparse and 2 probes leave a ~1e-5 residue for phase 2.
    max_probes_k2: int = 4
    max_probes: int = 2
    # "pallas": fused feature-major phase-1 proposal kernel (ops/propose.py)
    propose_impl: str = "xla"
    learning_rate: float = 1e-3
    weight_decay: float = 0.01   # torch AdamW default (ref Code/main.py:630)
    task_mode: str = "class"     # "class" | "regress" (ref Code/main.py:60-115)
    hard_ratio: float = 1.0      # legacy pair_ratio negative mixing
    # "padded": one uniform (sum_k 4*B_k, k_max) pad-id-0 batch through a
    #   single forward — EXACTLY the reference's training-time semantics (its
    #   mixed-size batches pad to the max size and pads participate as
    #   attention keys, the never-applied-mask quirk, ref Code/main.py:436-437
    #   + Code/Modules.py:611-613); one attention kernel instantiation.
    # "merged": per-k no-pad attention + merged token stream for the rest
    #   (the "clean" semantics; k<5 edges see no pad keys).
    # "hybrid": merged stream, k=2 closed form, one padded attention kernel
    #   for all k>=3 (pads-as-keys for k in 3..max-1, as the reference) —
    #   merged-level throughput at ~1/3 the cold-compile cost.
    token_stream: str = "hybrid"
    # data-parallel shard count of the batch axis (set by Trainer from the
    # mesh): cross-bucket concats use the shard-major layout so the merged
    # stream costs zero collectives (parallel/stream.py).  1 = plain layout.
    n_shards: int = 1
    # ((start, end), ...) per-chromosome node-id ranges as HOST constants
    # (set by Trainer from the chrom table): enables the sampler's unrolled
    # compare-select range path inside jit, where the ChromTable argument's
    # fields are tracers (sampler/negative.py).  None = gather path.
    chrom_bounds: Optional[tuple] = None


def make_optimizer(s: TrainSettings) -> optax.GradientTransformation:
    # An optax.flatten (one-vector AdamW) variant was A/B'd on the chip and
    # REJECTED at -2.3% (the per-leaf update ops fuse well; the ravel/split
    # costs more than it saves — BASELINE round 4).  The knob was removed
    # rather than kept: flatten changes the opt-state pytree structure, so a
    # checkpoint saved under it could not be restored without it.
    return optax.adamw(s.learning_rate, b1=0.9, b2=0.999, eps=1e-8,
                       weight_decay=s.weight_decay)


def batch_loss(params, frozen: FrozenTables, dims: ModelDims,
               table: ChromTable, blooms, settings: TrainSettings,
               batch, key, node_table, train: bool):
    """Loss + per-bucket predictions for one step's dict of per-k buckets.

    Classification mode runs the MERGED token-stream forward
    (models.forward_buckets) — all per-token stages once over the
    concatenated buckets; regress mode keeps the per-bucket path."""
    if settings.task_mode != "regress":
        if settings.token_stream == "padded" and len(batch) > 1:
            return _batch_loss_padded(params, frozen, dims, table, blooms,
                                      settings, batch, key, node_table, train)
        return _batch_loss_merged(params, frozen, dims, table, blooms,
                                  settings, batch, key, node_table, train)
    # regress mode only from here on (class modes returned above)
    total_bce = 0.0
    total_recon = 0.0
    preds = []
    fb_bloom = jnp.zeros((), jnp.int32)
    fb_orig = jnp.zeros((), jnp.int32)
    fb_rows = jnp.zeros((), jnp.int32)
    for k in sorted(batch.keys()):
        pos, w = batch[k]
        key, k_neg, k_fwd = jax.random.split(key, 3)
        neg, st = sample_negatives_with_stats(
            k_neg, pos, table, settings.min_distance,
            None if blooms is None else blooms[k],
            neg_num=settings.neg_num, max_trials=settings.max_trials,
            extra_rounds=settings.extra_rounds,
            max_probes=(settings.max_probes_k2 if k == 2
                        else settings.max_probes),
            hard_ratio=settings.hard_ratio,
            chrom_bounds=settings.chrom_bounds,
            propose_impl=settings.propose_impl)
        fb_bloom += st["bloom_fallback"]
        fb_orig += st["orig_fallback"]
        fb_rows += st["rows"]
        # pairwise-ranking variant (ref forward_op_batch_regress,
        # Code/main.py:60-115): y = quantile weight for positives / 0 for
        # negatives, pred = softplus(logit), MSE loss; the reported
        # "prediction" is the sigmoid of pos-vs-neg score differences
        x = jnp.concatenate([pos, neg], axis=0)
        y = jnp.concatenate([w.reshape(-1),
                             jnp.zeros(neg.shape[0])])[:, None]
        logits, recon = forward(params, frozen, dims, x, key=k_fwd,
                                train=train, return_recon=True,
                                node_table=node_table)
        pred = jax.nn.softplus(logits)
        bce = jnp.mean((pred - y) ** 2)
        n_pos = pos.shape[0]
        diff = pred[:n_pos, 0] - pred[n_pos:2 * n_pos, 0]
        preds.append(jax.nn.sigmoid(diff))
        total_bce = total_bce + bce
        total_recon = total_recon + recon
    n_buckets = len(batch)
    total_bce = total_bce / n_buckets
    total_recon = total_recon / n_buckets
    loss = settings.alpha * total_bce + settings.beta * total_recon
    # y/size are structural (reconstructed host-side from batch shapes by
    # labels_for_batch) — only predictions leave the device
    aux = {"bce": total_bce, "recon": total_recon,
           "pred": jnp.concatenate(preds),
           "fallback_bloom": fb_bloom, "fallback_orig": fb_orig,
           "fallback_rows": fb_rows}
    return loss, aux


def _resolve_ns(settings: TrainSettings, batch) -> int:
    """Effective shard-major layout factor: settings.n_shards when every
    bucket's row count splits evenly (pos rows and the neg_num multiple then
    both divide), else 1 (plain layout — still correct, just resharded)."""
    from matcha_tpu.parallel.stream import divisible
    ns = settings.n_shards
    sizes = [batch[k][0].shape[-2] for k in batch]
    return ns if divisible(sizes, ns) else 1


def _sample_all_negatives(table, blooms, settings, batch, key, ns=1):
    """Per-k negative sampling over a batch dict; returns ({k: x=(pos;neg)},
    {k: weights}, fallback counters).  x rows use the shard-major layout
    for ns>1 (read back with shard_split)."""
    from matcha_tpu.parallel.stream import shard_concat
    xs, ws = {}, {}
    fb_bloom = jnp.zeros((), jnp.int32)
    fb_orig = jnp.zeros((), jnp.int32)
    fb_rows = jnp.zeros((), jnp.int32)
    for k in sorted(batch.keys()):
        pos, w = batch[k]
        key, k_neg = jax.random.split(key)
        neg, st = sample_negatives_with_stats(
            k_neg, pos, table, settings.min_distance,
            None if blooms is None else blooms[k],
            neg_num=settings.neg_num, max_trials=settings.max_trials,
            extra_rounds=settings.extra_rounds,
            max_probes=(settings.max_probes_k2 if k == 2
                        else settings.max_probes),
            hard_ratio=settings.hard_ratio,
            chrom_bounds=settings.chrom_bounds,
            propose_impl=settings.propose_impl)
        fb_bloom += st["bloom_fallback"]
        fb_orig += st["orig_fallback"]
        fb_rows += st["rows"]
        xs[k] = shard_concat([pos, neg], ns)
        ws[k] = w
    return xs, ws, (fb_bloom, fb_orig, fb_rows)


def _bucket_bce_and_preds(logits, batch, ws, ns=1):
    """Weighted BCE averaged over buckets + concatenated sigmoid preds,
    given per-k logits for (pos;neg) rows in the ns-shard-major layout."""
    from matcha_tpu.parallel.stream import shard_split
    total_bce = 0.0
    preds = []
    for k in sorted(batch.keys()):
        n_pos = batch[k][0].shape[0]
        lg = logits[k]
        # back to (pos; neg) original order — free (contiguous block shards)
        lg_pos, lg_neg = shard_split(lg, ns, [n_pos, lg.shape[0] - n_pos])
        lg = jnp.concatenate([lg_pos, lg_neg])
        y = jnp.concatenate([jnp.ones(n_pos),
                             jnp.zeros(lg.shape[0] - n_pos)])[:, None]
        ww = jnp.concatenate([ws[k].reshape(-1),
                              jnp.ones(lg.shape[0] - n_pos)])[:, None]
        total_bce = total_bce + jnp.mean(
            ww * optax.sigmoid_binary_cross_entropy(lg, y))
        preds.append(jax.nn.sigmoid(lg).reshape(-1))
    return total_bce / len(batch), jnp.concatenate(preds)


def _batch_loss_padded(params, frozen, dims, table, blooms, settings,
                       batch, key, node_table, train: bool):
    """One uniform pad-id-0 batch through a single `forward` call — the
    reference's training-time semantics exactly (pads participate as
    attention keys; masked mean over real positions) with ONE attention
    kernel instantiation for all sizes."""
    from matcha_tpu.parallel.stream import shard_concat, shard_split
    ns = _resolve_ns(settings, batch)
    key, k_neg, k_fwd = jax.random.split(key, 3)
    xs, ws, (fb_bloom, fb_orig, fb_rows) = _sample_all_negatives(
        table, blooms, settings, batch, k_neg, ns)
    ks = sorted(batch.keys())
    L = max(ks)
    x_all = shard_concat(
        [jnp.pad(xs[k], ((0, 0), (0, L - k))) for k in ks], ns)
    logits_all, recon = forward(params, frozen, dims, x_all, key=k_fwd,
                                train=train, return_recon=True,
                                node_table=node_table)
    parts = shard_split(logits_all, ns, [xs[k].shape[0] for k in ks])
    logits = dict(zip(ks, parts))
    total_bce, preds = _bucket_bce_and_preds(logits, batch, ws, ns)
    loss = settings.alpha * total_bce + settings.beta * recon
    aux = {"bce": total_bce, "recon": recon, "pred": preds,
           "fallback_bloom": fb_bloom, "fallback_orig": fb_orig,
           "fallback_rows": fb_rows}
    return loss, aux


def _batch_loss_merged(params, frozen, dims, table, blooms, settings,
                       batch, key, node_table, train: bool):
    from matcha_tpu.models.hypersagnn import forward_buckets
    ns = _resolve_ns(settings, batch)
    key, k_neg, k_fwd = jax.random.split(key, 3)
    xs, ws, (fb_bloom, fb_orig, fb_rows) = _sample_all_negatives(
        table, blooms, settings, batch, k_neg, ns)
    mode = "pad-max" if settings.token_stream == "hybrid" else "per-k"
    logits, recon = forward_buckets(params, frozen, dims, xs, key=k_fwd,
                                    train=train, return_recon=True,
                                    node_table=node_table,
                                    attention_mode=mode, n_shards=ns)
    total_bce, preds = _bucket_bce_and_preds(logits, batch, ws, ns)
    loss = settings.alpha * total_bce + settings.beta * recon
    aux = {"bce": total_bce, "recon": recon, "pred": preds,
           "fallback_bloom": fb_bloom, "fallback_orig": fb_orig,
           "fallback_rows": fb_rows}
    return loss, aux


def _eval_mixed_loss(params, frozen, dims, table, blooms, settings,
                     ks: tuple, batch, key, node_table):
    """One mixed-size eval batch, the reference's eval semantics exactly
    (ref Code/main.py:212-247): rows drawn from the POOLED test set
    (:216-217), every row padded to the global max size — with millions of
    k-mers per size, essentially every reference batch of 96 contains a
    max-size row, so pad_sequence pads all rows to max_k and the pads
    participate as attention keys (the never-applied-mask quirk) — negatives
    per row within its true size class, weighted BCE (:56).

    batch: (x (B, L) int32 pad-0, sizes (B,) int32, w (B,) f32).

    TPU-native form: attention is per-row, so one (B*(1+neg), L) forward
    scores all sizes at once; negative sampling runs per k over the FULL
    batch (static shapes, <=4 unrolled k's) and a per-row select keeps each
    row's own-size negatives.  The off-size sampler rows are discarded —
    ~4x sampler work, irrelevant at eval's 104-batch scale.
    """
    x, sizes, w = batch
    b, L = x.shape
    neg_num = settings.neg_num
    key, k_fwd = jax.random.split(key)
    # sampler layout: neg row r corresponds to pos row r % B (tile order)
    sizes_neg = jnp.tile(sizes, neg_num)
    # stage-1 semantics (blooms None): negatives are positive copies
    neg = jnp.tile(x, (neg_num, 1))
    if blooms is not None:
        from matcha_tpu.sampler.negative import sample_negatives
        for k in ks:
            key, kk = jax.random.split(key)
            neg_k = sample_negatives(
                kk, x[:, :k], table, settings.min_distance, blooms[k],
                neg_num=neg_num, max_trials=settings.max_trials,
                extra_rounds=settings.extra_rounds,
                max_probes=(settings.max_probes_k2 if k == 2
                            else settings.max_probes),
                hard_ratio=settings.hard_ratio,
                chrom_bounds=settings.chrom_bounds,
                propose_impl=settings.propose_impl)
            neg_k = jnp.pad(neg_k, ((0, 0), (0, L - k)))
            neg = jnp.where((sizes_neg == k)[:, None], neg_k, neg)
    x_all = jnp.concatenate([x, neg], axis=0)
    logits, recon = forward(params, frozen, dims, x_all, key=k_fwd,
                            train=False, return_recon=True,
                            node_table=node_table)
    y = jnp.concatenate([jnp.ones(b), jnp.zeros(b * neg_num)])[:, None]
    ww = jnp.concatenate([w.reshape(-1), jnp.ones(b * neg_num)])[:, None]
    bce = jnp.mean(ww * optax.sigmoid_binary_cross_entropy(logits, y))
    return {"bce": bce, "recon": recon,
            "pred": jax.nn.sigmoid(logits).reshape(-1)}


def labels_for_batch(batch, settings: TrainSettings):
    """Host-side reconstruction of the per-step label/size vectors matching
    batch_loss's concatenated predictions."""
    ys, sizes = [], []
    for k in sorted(batch.keys()):
        b = batch[k][0].shape[-2]
        if settings.task_mode == "regress":
            ys.append(np.ones(b))
            sizes.append(np.full(b, k, dtype=np.int32))
        else:
            n = b * (1 + settings.neg_num)
            y = np.zeros(n)
            y[:b] = 1.0
            ys.append(y)
            sizes.append(np.full(n, k, dtype=np.int32))
    return np.concatenate(ys), np.concatenate(sizes)


class Trainer:
    """Drives the two-stage schedule over a HyperedgeStore."""

    def __init__(self, params: Dict, frozen: FrozenTables, dims: ModelDims,
                 chrom_table: ChromTable, settings: TrainSettings,
                 blooms: Optional[Dict[int, DeviceBloomFilter]] = None,
                 seed: int = 0, mesh=None, tensor_parallel: bool = False):
        from matcha_tpu.utils import warm_loop_runtime
        warm_loop_runtime()  # overlap backend loop-runtime init with setup
        self.mesh = mesh
        self.tensor_parallel = tensor_parallel
        # private copy: the epoch fns donate the carried state, and
        # device_put to a replicated sharding may alias the source buffer as
        # one shard — either way the caller's param buffers must not end up
        # aliased into the donated state.  ONE jitted dispatch for the whole
        # tree: per-leaf jnp.array(copy=True) is a synchronous round trip
        # per leaf (~40 s for 119 leaves on a high-latency device link).
        params = jax.jit(
            lambda t: jax.tree_util.tree_map(jnp.copy, t))(params)
        if frozen.features:
            # >= f_max zero pad columns on inter_z let the recon target be
            # a contiguous dynamic_slice instead of a clipped column gather
            # (0.68 ms/step of HBM shuffling at 100 kb; see recon_loss_node).
            # Pad columns are zero AND col_ok-masked — losses unchanged.
            f_max = max(int(f.shape[1]) for f in frozen.features)
            short = sum(int(f.shape[1]) for f in frozen.features) + f_max \
                - int(frozen.inter_z.shape[1])
            if short > 0:
                frozen = frozen._replace(inter_z=jnp.pad(
                    frozen.inter_z, ((0, 0), (0, short))))
        key = jax.random.PRNGKey(seed)
        if settings.chrom_bounds is None:
            # hoist the tiny per-chrom node ranges to host constants while
            # the table is still concrete — inside the jitted step the
            # ChromTable argument's fields are tracers, and the sampler's
            # compare-select range path needs Python ints
            settings = settings._replace(chrom_bounds=tuple(
                (int(s), int(e)) for s, e in
                zip(np.asarray(chrom_table.chrom_start),
                    np.asarray(chrom_table.chrom_end))))
        if mesh is not None:
            # SPMD placement (parallel/mesh.py): batch on "data", node-axis
            # tables on "model"; jit compiles the step over the mesh.
            # put_global keeps this multi-process correct: each process
            # materializes only its own shards (host-local feed).
            from matcha_tpu.parallel.distributed import put_global
            from matcha_tpu.parallel.mesh import (frozen_sharding,
                                                  pad_frozen_for_mesh,
                                                  param_sharding)
            from jax.sharding import NamedSharding, PartitionSpec
            params = jax.tree_util.tree_map(
                put_global, params,
                param_sharding(params, mesh, tensor_parallel=tensor_parallel))
            frozen = pad_frozen_for_mesh(frozen, mesh)
            frozen = jax.tree_util.tree_map(
                put_global, frozen, frozen_sharding(frozen, mesh))
            if blooms is not None:
                rep = NamedSharding(mesh, PartitionSpec())
                blooms = {k: jax.tree_util.tree_map(
                    lambda x: put_global(x, rep), f)
                    for k, f in blooms.items()}
            key = put_global(key, NamedSharding(mesh, PartitionSpec()))
            chrom_table = jax.tree_util.tree_map(
                lambda x: put_global(x, NamedSharding(mesh, PartitionSpec())),
                chrom_table)
        if mesh is not None:
            # shard-major stream layout factor = data-axis size: the merged
            # token stream then costs zero collectives (parallel/stream.py)
            settings = settings._replace(n_shards=int(mesh.shape["data"]))
        # model code shard_maps its Pallas kernels over "data" when a mesh
        # is active (custom calls have no GSPMD rule — parallel/mesh.py);
        # the mesh is consulted at TRACE time, so each jitted call below is
        # wrapped in using_active_mesh rather than set once globally (a
        # second Trainer would otherwise silently change what this one's
        # still-untraced functions compile with)
        from matcha_tpu.parallel.mesh import using_active_mesh
        # tensor_parallel shards the attention weights on "model", which the
        # kernel wrappers' replicated in_specs would mis-declare — TP keeps
        # the (GSPMD-correct) XLA paths and we say so out loud
        kmesh = None if tensor_parallel else mesh
        self._kernel_mesh = kmesh
        if tensor_parallel and dims.use_pallas_attention:
            import warnings
            warnings.warn(
                "tensor_parallel=True disables the Pallas kernels (their "
                "shard_map wrappers assume replicated attention weights); "
                "running the XLA attention/gather paths instead",
                stacklevel=2)
        self.frozen = frozen
        self.dims = dims
        self.chrom_table = chrom_table
        self.settings = settings
        self.blooms = blooms
        optimizer = make_optimizer(settings)
        self.optimizer = optimizer
        # jit: optax init eagerly issues one device op per moment leaf
        # (~40 s of cold start on a high-latency link; one dispatch jitted)
        self.state = TrainState(params=params,
                                opt_state=jax.jit(optimizer.init)(params),
                                key=key)
        dims_c, settings_c = dims, settings

        # IMPORTANT: frozen tables / Bloom bitsets / chrom tables are passed
        # as ARGUMENTS, not closures — jit embeds closed-over device arrays
        # as executable constants, which at 100 kb scale means gigabytes
        # baked into the compiled binary (and quadratic compile times).
        def train_step_with(frozen, table, blooms):
            def train_step(state: TrainState, batch):
                key, k_tab, k_loss = jax.random.split(state.key, 3)

                def loss_fn(params):
                    node_table = encode_node_table(params, frozen, dims_c,
                                                   key=k_tab, train=True)
                    return batch_loss(params, frozen, dims_c, table, blooms,
                                      settings_c, batch, k_loss, node_table,
                                      True)

                (loss, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params)
                updates, opt_state = optimizer.update(grads, state.opt_state,
                                                      state.params)
                params = optax.apply_updates(state.params, updates)
                return TrainState(params, opt_state, key), aux
            return train_step

        @partial(jax.jit, donate_argnums=0, static_argnames=("has_blooms",))
        def train_epoch_fn(state, stacked, frozen, table, blooms, has_blooms):
            step = train_step_with(frozen, table,
                                   blooms if has_blooms else None)
            return jax.lax.scan(step, state, stacked,
                                unroll=scan_unroll)

        @partial(jax.jit, donate_argnums=0,
                 static_argnames=("steps", "batch", "has_blooms"))
        def device_epoch_fn(state, full, frozen, table, blooms, steps, batch,
                            has_blooms):
            """One epoch with the data already resident on device: draw a
            fresh permutation per bucket ON DEVICE, then scan gathered
            batches — zero host work in the loop."""
            key = state.key
            idxs = {}
            for k in sorted(full.keys()):
                key, kp = jax.random.split(key)
                n = full[k][0].shape[0]
                idxs[k] = jax.random.permutation(kp, n)[
                    : steps * batch].reshape(steps, batch)
            state = TrainState(state.params, state.opt_state, key)
            step = train_step_with(frozen, table,
                                   blooms if has_blooms else None)
            # gather ALL batches in one bulk gather per bucket per epoch
            # (steps x batch rows, ~2 MB) instead of per-step gathers in
            # the scan body: the per-step gathers measured 0.59 ms/step of
            # tiny ops — ~13% of the batch-2048 step
            stacked = {k: (full[k][0][idxs[k]], full[k][1][idxs[k]])
                       for k in full}
            return jax.lax.scan(step, state, stacked,
                                unroll=scan_unroll)

        # lax.scan unroll factor for the epoch loops: >1 replicates the step
        # body to cut per-iteration while-loop orchestration (~0.4 ms/step
        # un-attributable at bench scale) at the cost of executable size /
        # compile time.  Read once per process (trace-time gate).
        scan_unroll = int(os.environ.get("MATCHA_SCAN_UNROLL", "1"))

        @partial(jax.jit, donate_argnums=0, static_argnames=("has_blooms",))
        def epoch_indexed_fn(state, idxs, full, frozen, table, blooms,
                             has_blooms):
            """One epoch from host-drawn batch INDICES into HBM-pinned base
            buckets (see BucketedBatcher.next_epoch_indices): one bulk device
            gather per bucket, then the scanned step stream.  The batches are
            bitwise the ones train_epoch's host path stages, at ~4 B/row of
            PCIe traffic instead of the rows themselves — this is the path
            `fit` runs whenever the buckets fit the HBM pin budget, so the
            shipped trainer IS the benched trainer (bench.py drives this same
            program)."""
            stacked = {k: (full[k][0][idxs[k]], full[k][1][idxs[k]])
                       for k in full}
            if mesh is not None:
                from matcha_tpu.parallel.mesh import batch_sharding
                stacked = jax.tree_util.tree_map(
                    lambda x: jax.lax.with_sharding_constraint(
                        x, batch_sharding(mesh, x.ndim)), stacked)
            step = train_step_with(frozen, table,
                                   blooms if has_blooms else None)
            return jax.lax.scan(step, state, stacked,
                                unroll=scan_unroll)

        @partial(jax.jit, static_argnames=("has_blooms",))
        def eval_epoch_fn(state, stacked, frozen, table, blooms, has_blooms):
            def eval_step(state: TrainState, batch):
                key, k_loss = jax.random.split(state.key)
                node_table = encode_node_table(state.params, frozen, dims_c,
                                               train=False)
                _, aux = batch_loss(state.params, frozen, dims_c, table,
                                    blooms if has_blooms else None,
                                    settings_c, batch, k_loss, node_table,
                                    False)
                return TrainState(state.params, state.opt_state, key), aux
            return jax.lax.scan(eval_step, state, stacked)

        def run_train_epoch(state, stacked):
            with using_active_mesh(kmesh):
                return train_epoch_fn(state, stacked, self.frozen,
                                      self.chrom_table, self.blooms or {},
                                      self.blooms is not None)

        def _eval_mixed_scan(state, stacked, frozen, table, blooms, ks,
                             has_blooms):
            def eval_step(state: TrainState, batch):
                key, k_loss = jax.random.split(state.key)
                node_table = encode_node_table(state.params, frozen, dims_c,
                                               train=False)
                aux = _eval_mixed_loss(state.params, frozen, dims_c, table,
                                       blooms if has_blooms else None,
                                       settings_c, ks, batch, k_loss,
                                       node_table)
                return TrainState(state.params, state.opt_state, key), aux
            return jax.lax.scan(eval_step, state, stacked)

        @partial(jax.jit, static_argnames=("ks", "has_blooms"))
        def eval_mixed_fn(state, stacked, frozen, table, blooms, ks,
                          has_blooms):
            return _eval_mixed_scan(state, stacked, frozen, table, blooms,
                                    ks, has_blooms)

        @partial(jax.jit, static_argnames=("ks", "has_blooms"))
        def eval_mixed_indexed_fn(state, idx, pool, frozen, table, blooms,
                                  ks, has_blooms):
            """Mixed eval from HBM-pinned pooled test arrays + host-drawn
            row indices — the eval analogue of epoch_indexed_fn.  The pooled
            rows are identical every epoch; re-staging them host->device per
            epoch was pure transfer waste (VERDICT r4 weak #6).  The gathered
            batches are bitwise what eval_epoch stages for the same seed."""
            xs, szs, ws = pool
            stacked = (xs[idx], szs[idx], ws[idx])
            if mesh is not None:
                from matcha_tpu.parallel.mesh import batch_sharding
                stacked = jax.tree_util.tree_map(
                    lambda x: jax.lax.with_sharding_constraint(
                        x, batch_sharding(mesh, x.ndim)), stacked)
            return _eval_mixed_scan(state, stacked, frozen, table, blooms,
                                    ks, has_blooms)

        def run_eval_epoch(state, stacked):
            with using_active_mesh(kmesh):
                return eval_epoch_fn(state, stacked, self.frozen,
                                     self.chrom_table, self.blooms or {},
                                     self.blooms is not None)

        def run_eval_mixed(state, stacked, ks):
            with using_active_mesh(kmesh):
                return eval_mixed_fn(state, stacked, self.frozen,
                                     self.chrom_table, self.blooms or {},
                                     ks, self.blooms is not None)

        def run_eval_mixed_indexed(state, idx, pool, ks):
            with using_active_mesh(kmesh):
                return eval_mixed_indexed_fn(state, idx, pool, self.frozen,
                                             self.chrom_table,
                                             self.blooms or {}, ks,
                                             self.blooms is not None)

        def run_device_epoch(state, full, steps, batch):
            with using_active_mesh(kmesh):
                return device_epoch_fn(state, full, self.frozen,
                                       self.chrom_table, self.blooms or {},
                                       steps, batch, self.blooms is not None)

        def run_epoch_indexed(state, idxs, full):
            with using_active_mesh(kmesh):
                return epoch_indexed_fn(state, idxs, full, self.frozen,
                                        self.chrom_table, self.blooms or {},
                                        self.blooms is not None)

        self._train_epoch_fn = run_train_epoch
        self._eval_epoch_fn = run_eval_epoch
        self._eval_mixed_fn = run_eval_mixed
        self._eval_mixed_indexed_fn = run_eval_mixed_indexed
        self._device_epoch_fn = run_device_epoch
        self._epoch_indexed_fn = run_epoch_indexed
        # device tree copy: pins a params/opt/key snapshot alive across the
        # next epoch's buffer donation (fit's overlapped eval/checkpoint)
        self._snap_fn = jax.jit(
            lambda tree: jax.tree_util.tree_map(jnp.copy, tree))
        # jitted embedding export (frozen passed as an argument — closing
        # over it would bake the tables into the executable)
        from matcha_tpu.models.hypersagnn import node_embeddings
        self._emb_export_fn = jax.jit(
            lambda p, fr: node_embeddings(p, fr, dims))
        self._train_epoch_jit = train_epoch_fn     # raw jitted fns (lowering
        self._device_epoch_jit = device_epoch_fn   # / AOT-compile hooks)
        self._epoch_indexed_jit = epoch_indexed_fn
        self._dev_buckets = None
        self._pinned_buckets = None
        self._pinned_shape = None
        self._idx_prefetch = None
        self._dev_metrics_cache = {}

    # ------------------------------------------------------------- epochs
    def _place_batch(self, stacked):
        """Host epoch arrays -> device.  Under a mesh, the batch axis shards
        on "data"; multi-process, each process device_puts ONLY its own
        shards (host-local feed via put_global — every process runs the same
        deterministic batcher, so the host value is available everywhere and
        the non-local rows are never transferred)."""
        if self.mesh is None:
            return jax.tree_util.tree_map(jnp.asarray, stacked)
        from matcha_tpu.parallel.distributed import put_global
        from matcha_tpu.parallel.mesh import batch_sharding
        return jax.tree_util.tree_map(
            lambda x: put_global(x, batch_sharding(self.mesh, x.ndim)),
            stacked)

    def _gather_aux(self, aux):
        """Fetch per-epoch outputs to host.  Multi-process, scan outputs are
        sharded with non-addressable shards — all-gather them on device
        first (jax.device_get on them would throw on a real pod slice)."""
        if self.mesh is not None and jax.process_count() > 1:
            from matcha_tpu.parallel.distributed import replicate_to_host
            return replicate_to_host(aux, self.mesh)
        return jax.device_get(aux)

    def prepare_device_epochs(self, train_buckets, batch_size: int,
                              num_batch_per_iter: int) -> None:
        """Pin the full training buckets in HBM for device-resident epochs:
        `train_epoch_device` then draws a fresh on-device permutation per
        epoch and runs the whole ring inside one scanned program — no host
        shuffle or transfer in the steady-state loop (the BucketedBatcher
        path spends 10-20 ms/step on host at bench scale).  Parity note: the
        reference's ring buffer reshuffles on wraparound (Code/Modules.py:
        653-681); a fresh permutation per epoch is the same distribution
        without the carry-over pointer.  Small buckets are duplicated to
        cover one epoch, as the reference does (Code/Modules.py:638-641)."""
        assert self.mesh is None, \
            "device-resident epochs are single-chip; use train_epoch on a mesh"
        need = num_batch_per_iter * batch_size
        dev = {}
        for k, (e, w) in sorted(train_buckets.items()):
            e = np.asarray(e, np.int32)
            w = np.asarray(w, np.float32)
            if len(e) == 0:
                raise ValueError(f"empty bucket for k={k}")
            while len(e) < need:
                e = np.concatenate([e, e])
                w = np.concatenate([w, w])
            dev[int(k)] = (jnp.asarray(e), jnp.asarray(w))
        self._dev_buckets = dev
        self._dev_steps = int(num_batch_per_iter)
        self._dev_batch = int(batch_size)

    def train_epoch_device_launch(self):
        """Dispatch one device-resident epoch WITHOUT blocking on its
        outputs; returns the raw on-device aux dict.  Callers can overlap
        the next epoch's execution with the previous epoch's host fetch
        (the device_get of per-step predictions costs ~100-200 ms per epoch
        over a tunneled device link); finalize with `jax.device_get`."""
        assert self._dev_buckets is not None, "call prepare_device_epochs"
        self.state, aux = self._device_epoch_fn(
            self.state, self._dev_buckets, self._dev_steps, self._dev_batch)
        return aux

    def train_epoch_device(self):
        """One epoch over the device-resident buckets (see
        prepare_device_epochs)."""
        t0 = time.time()
        aux = self._gather_aux(self.train_epoch_device_launch())
        elapsed = time.time() - t0
        shapes = {k: (np.zeros((self._dev_batch, k), np.int32), None)
                  for k in self._dev_buckets}
        return self._epoch_result(aux, shapes, elapsed=elapsed)

    # ------------------------------------------ indexed device-resident path
    def pin_base_buckets(self, batcher: BucketedBatcher,
                         budget_bytes: Optional[int] = None) -> bool:
        """Pin the batcher's (duplicated) base bucket arrays in HBM for
        indexed device-resident epochs (train_epoch_indexed): each epoch then
        transfers only the host-drawn INDICES (~4 B/row) and gathers the rows
        on device — the BucketedBatcher host path re-stages the rows
        themselves and costs 10-20 ms/step of host work at bench scale.
        Returns False (no pin) when the arrays exceed the budget
        (MATCHA_PIN_BUDGET_MB, default 4096); callers fall back to
        train_epoch.  Under a mesh the base arrays are replicated (they are
        small relative to the frozen tables) and the gathered batches are
        sharding-constrained onto the "data" axis."""
        if budget_bytes is None:
            budget_bytes = int(os.environ.get(
                "MATCHA_PIN_BUDGET_MB", 4096)) << 20
        if batcher.base_nbytes() > budget_bytes:
            return False
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            from matcha_tpu.parallel.distributed import put_global
            rep = NamedSharding(self.mesh, PartitionSpec())
            place = lambda a: put_global(jnp.asarray(a), rep)  # noqa: E731
        else:
            place = jnp.asarray
        self._pinned_buckets = {
            int(k): (place(batcher.base_edges[k]),
                     place(batcher.base_weights[k]))
            for k in batcher.k_list}
        self._pinned_shape = (batcher.num_batch_per_iter, batcher.batch_size)
        return True

    def _place_indices(self, idxs):
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in idxs.items()}
        from matcha_tpu.parallel.distributed import put_global
        from matcha_tpu.parallel.mesh import batch_sharding
        return {k: put_global(v, batch_sharding(self.mesh, v.ndim))
                for k, v in idxs.items()}

    def train_epoch_indexed_launch(self, batcher: BucketedBatcher):
        """Dispatch one indexed device-resident epoch WITHOUT blocking;
        returns the on-device aux dict.  The batch stream is bitwise the one
        train_epoch(batcher) would stage (same ring state, same rows).

        The NEXT epoch's indices are drawn and device_put immediately after
        the dispatch, so their host->device transfer (a few MB) overlaps this
        epoch's compute instead of serializing in front of the next launch —
        on a high-latency device link the serial transfer alone was ~40% of
        an epoch.  The extra ring advance is invisible to the consumed
        stream (draws are consumed in order)."""
        assert self._pinned_buckets is not None, "call pin_base_buckets"
        if self._idx_prefetch is not None and \
                self._idx_prefetch[0] is batcher:
            idxs = self._idx_prefetch[1]
        else:
            idxs = self._place_indices(batcher.next_epoch_indices())
        self.state, aux = self._epoch_indexed_fn(self.state, idxs,
                                                 self._pinned_buckets)
        self._idx_prefetch = (
            batcher, self._place_indices(batcher.next_epoch_indices()))
        return aux

    def _use_device_metrics(self) -> bool:
        """Device per-size AUROC/AUPRC (train/metrics.py device path): on by
        default on accelerators — host sklearn on a 3.3M-row epoch costs
        ~4.7 s (10x the device epoch at bench geometry) and requires the
        13 MB prediction fetch; the device path fetches scalars.  CPU and
        mesh runs keep the host path (sklearn parity pinned either way)."""
        return (jax.default_backend() != "cpu" and self.mesh is None
                and self.settings.task_mode != "regress"
                and os.environ.get("MATCHA_DEVICE_METRICS", "1") == "1")

    def metrics_launch(self, aux):
        """Dispatch the device-metrics program for an epoch's aux WITHOUT
        blocking; returns a handle _finish_indexed consumes.  MUST be
        called right after the epoch launch in a pipelined driver: a
        dispatch at finalize time would enqueue BEHIND the next epoch, and
        the metrics fetch would then serialize two epochs (measured: fit
        at 2.6M he/s instead of ~7M)."""
        if not self._use_device_metrics():
            return None
        from matcha_tpu.train.metrics import device_metrics_fn
        _, bs = self._pinned_shape
        shapes = {k: (np.zeros((bs, k), np.int32), None)
                  for k in self._pinned_buckets}
        ck = tuple(sorted((k, bs) for k in self._pinned_buckets)) + \
            (self.settings.neg_num, self.settings.task_mode)
        fn = self._dev_metrics_cache.get(ck)
        if fn is None:
            y, size = labels_for_batch(shapes, self.settings)
            fn = device_metrics_fn(y, size)
            self._dev_metrics_cache[ck] = fn
        return (fn(aux["pred"]), fn.group_sizes,
                int(aux["pred"].shape[0]), int(np.prod(aux["pred"].shape)))

    def _finish_indexed(self, aux, elapsed, mx=None):
        _, bs = self._pinned_shape
        shapes = {k: (np.zeros((bs, k), np.int32), None)
                  for k in self._pinned_buckets}
        if self._use_device_metrics():
            from matcha_tpu.train.metrics import metrics_from_device
            if mx is None:
                mx = self.metrics_launch(aux)
            vals_d, group_sizes, steps, pred_size = mx
            vals = jax.device_get(vals_d)
            metrics = metrics_from_device(vals, group_sizes, steps)
            small = jax.device_get({k: v for k, v in aux.items()
                                    if k != "pred"})
            return self._epoch_result(small, shapes, elapsed=elapsed,
                                      metrics=metrics, pred_size=pred_size)
        aux = self._gather_aux(aux)
        return self._epoch_result(aux, shapes, elapsed=elapsed)

    def train_epoch_indexed(self, batcher: BucketedBatcher):
        """One epoch over the pinned base buckets with host-drawn indices.
        elapsed (and the reported hyperedges/s) is scalar-synced on epoch
        completion; the per-step prediction fetch happens after the clock
        stops (it overlaps the next dispatch on a pipelined driver)."""
        t0 = time.time()
        aux = self.train_epoch_indexed_launch(batcher)
        jax.block_until_ready(aux["bce"])
        elapsed = time.time() - t0
        return self._finish_indexed(aux, elapsed)

    def lower_train_epoch(self, stacked):
        """Lower (don't run) the jitted train epoch for the current mesh and
        a host epoch-batch dict — the inspection hook behind
        scripts/comm_budget.py (compiled-HLO collective volumes)."""
        from matcha_tpu.parallel.mesh import using_active_mesh
        stacked = self._place_batch(stacked)
        with using_active_mesh(self._kernel_mesh):
            return self._train_epoch_jit.lower(
                self.state, stacked, self.frozen, self.chrom_table,
                self.blooms or {}, self.blooms is not None)

    def lower_epoch_indexed(self, batcher: BucketedBatcher):
        """Same inspection hook for the indexed device-resident epoch
        (requires pin_base_buckets first)."""
        from matcha_tpu.parallel.mesh import using_active_mesh
        assert self._pinned_buckets is not None, "call pin_base_buckets"
        idxs = self._place_indices(batcher.next_epoch_indices())
        with using_active_mesh(self._kernel_mesh):
            return self._epoch_indexed_jit.lower(
                self.state, idxs, self._pinned_buckets, self.frozen,
                self.chrom_table, self.blooms or {},
                self.blooms is not None)

    def _epoch_result(self, aux, stacked_or_shapes, elapsed=None,
                      metrics=None, pred_size=None):
        """Shared host-side epoch result assembly: labels reconstructed
        structurally from batch shapes, per-size metrics, sampler
        fallback telemetry, optional throughput.  metrics/pred_size:
        precomputed by the device-metrics path (aux then has no "pred")."""
        if metrics is None:
            y, size = labels_for_batch(stacked_or_shapes, self.settings)
            steps = aux["pred"].shape[0]
            metrics = size_stratified_metrics(np.tile(y, steps),
                                              aux["pred"].reshape(-1),
                                              np.tile(size, steps))
            pred_size = aux["pred"].size
        rows = max(int(aux["fallback_rows"].sum()), 1)
        out = {"bce": float(aux["bce"].mean()),
               "recon": float(aux["recon"].mean()),
               "metrics": metrics,
               # sampler telemetry: fraction of negatives that exhausted all
               # trials and fell back to a Bloom-hit candidate (mislabeled
               # likely-positive) or the positive itself
               "fallback_bloom_rate":
                   float(aux["fallback_bloom"].sum()) / rows,
               "fallback_orig_rate": float(aux["fallback_orig"].sum()) / rows}
        if elapsed is not None:
            out["elapsed"] = elapsed
            out["hyperedges_per_sec"] = pred_size / elapsed
        return out

    def train_epoch(self, batcher: BucketedBatcher):
        stacked = self._place_batch(batcher.next_epoch())
        t0 = time.time()
        self.state, aux = self._train_epoch_fn(self.state, stacked)
        aux = self._gather_aux(aux)
        return self._epoch_result(aux, stacked, elapsed=time.time() - t0)

    def eval_epoch(self, test_buckets, batch_size: int = 96,
                   max_samples: int = 10_000, seed: int = 0,
                   indices: Optional[np.ndarray] = None,
                   return_pred: bool = False):
        """Reference eval exactly (ref Code/main.py:200-258): draw
        ``max_samples`` rows from the MIXED-size pooled test set (:216-217),
        score in ``batch_size`` slices with per-row own-size negatives, pool
        the predictions for size-stratified metrics.  Checkpoint selection
        keys off these metrics, so the mixed draw (pool-proportional per-k
        counts) matches the reference's selected epochs on skewed size
        distributions.

        indices: optional explicit draw (positions into the sorted-by-k
        pooled test set) — the parity-harness hook for feeding both
        frameworks the identical subsample.

        Regress mode keeps the per-k path (its pairwise comparisons need
        same-size pairs)."""
        test_buckets = {k: v for k, v in test_buckets.items()
                        if len(v[0]) > 0}
        if not test_buckets:
            return {"bce": float("nan"), "recon": float("nan"),
                    "metrics": {}}
        if self.settings.task_mode == "regress":
            return self._eval_epoch_perk(test_buckets, batch_size,
                                         max_samples, seed)
        rng = np.random.default_rng(seed)
        ks = tuple(sorted(test_buckets))
        L = max(ks)
        xs, szs, ws = [], [], []
        for k, (e, w) in sorted(test_buckets.items()):
            e = np.asarray(e, np.int32)
            xs.append(np.pad(e, ((0, 0), (0, L - k))))
            szs.append(np.full(len(e), k, np.int32))
            ws.append(np.asarray(w, np.float32).reshape(-1))
        xs = np.concatenate(xs)
        szs = np.concatenate(szs)
        ws = np.concatenate(ws)
        take = min(len(xs), max_samples)
        nd = int(self.mesh.shape["data"]) if self.mesh is not None else 1
        # under a data mesh the batch axis must split evenly over the chips
        bs = (min(batch_size, take) // nd) * nd
        if bs == 0:
            return {"bce": float("nan"), "recon": float("nan"),
                    "metrics": {}}
        n_batches = take // bs
        if indices is None:
            indices = rng.permutation(len(xs))[:n_batches * bs]
        else:
            indices = np.asarray(indices)[:n_batches * bs]
        sizes_drawn = szs[indices].reshape(n_batches, bs)
        stacked = (xs[indices].reshape(n_batches, bs, L),
                   sizes_drawn,
                   ws[indices].reshape(n_batches, bs))
        stacked = self._place_batch(stacked)
        self.state, aux = self._eval_mixed_fn(self.state, stacked, ks)
        aux = self._gather_aux(aux)
        # pooled metrics over all batches (ref :249-255); per batch the
        # prediction rows are [bs positives; neg_num x bs negatives]
        neg_num = self.settings.neg_num
        y = np.tile(np.concatenate([np.ones(bs), np.zeros(bs * neg_num)]),
                    n_batches)
        size_all = np.concatenate(
            [np.concatenate([sb, np.tile(sb, neg_num)])
             for sb in sizes_drawn])
        metrics = size_stratified_metrics(y, aux["pred"].reshape(-1),
                                          size_all)
        out = {"bce": float(aux["bce"].mean()),
               "recon": float(aux["recon"].mean()),
               "metrics": metrics,
               "fallback_bloom_rate": 0.0, "fallback_orig_rate": 0.0}
        if return_pred:
            # parity-harness hook: per-row predictions in scan order
            # ([bs pos; neg_num x bs neg] per batch)
            out["pred"] = np.asarray(aux["pred"]).reshape(-1)
        return out

    def _eval_epoch_perk(self, test_buckets, batch_size: int,
                         max_samples: int, seed: int):
        """Per-k aligned eval (regress mode): per-size batches, the pairwise
        comparison needs same-size pos/neg pairs."""
        rng = np.random.default_rng(seed)
        per_k = max(1, max_samples // max(len(test_buckets), 1))
        nd = int(self.mesh.shape["data"]) if self.mesh is not None else 1
        plan = {}
        n_batches = None
        for k, (e, w) in sorted(test_buckets.items()):
            take = min(len(e), per_k)
            bs = min(batch_size, take)        # small buckets shrink the batch
            # under a data mesh the batch axis must split evenly over the
            # chips; a bucket smaller than the data axis cannot be sharded
            # at all — skip it like the empty case
            bs = (bs // nd) * nd
            if bs == 0:
                continue
            nb = take // bs
            n_batches = nb if n_batches is None else min(n_batches, nb)
            plan[k] = bs
        test_buckets = {k: v for k, v in test_buckets.items() if k in plan}
        if not test_buckets:
            return {"bce": float("nan"), "recon": float("nan"),
                    "metrics": {}}
        stacked = {}
        for k, (e, w) in sorted(test_buckets.items()):
            bs = plan[k]
            idx = rng.permutation(len(e))[:n_batches * bs]
            stacked[k] = (e[idx].reshape(n_batches, bs, k),
                          w[idx].reshape(n_batches, bs))
        stacked = self._place_batch(stacked)
        self.state, aux = self._eval_epoch_fn(self.state, stacked)
        aux = self._gather_aux(aux)
        return self._epoch_result(aux, stacked)

    # ---------------------------------------------------- pinned mixed eval
    def _pin_eval_pool(self, test_buckets, batch_size: int,
                       max_samples: int = 10_000):
        """Pool + pin the mixed-size eval arrays on device ONCE per stage
        (the rows are identical every epoch); fit's overlapped eval then
        transfers only the per-epoch drawn indices.  Mirrors eval_epoch's
        pooling/batch-planning exactly so the gathered batches (and hence
        predictions) are bitwise eval_epoch's for the same seed.  Returns
        None when the pooled set is empty or too small to shard."""
        test_buckets = {k: v for k, v in test_buckets.items()
                        if len(v[0]) > 0}
        if not test_buckets or self.settings.task_mode == "regress":
            return None
        ks = tuple(sorted(test_buckets))
        L = max(ks)
        xs, szs, ws = [], [], []
        for k, (e, w) in sorted(test_buckets.items()):
            e = np.asarray(e, np.int32)
            xs.append(np.pad(e, ((0, 0), (0, L - k))))
            szs.append(np.full(len(e), k, np.int32))
            ws.append(np.asarray(w, np.float32).reshape(-1))
        xs = np.concatenate(xs)
        szs = np.concatenate(szs)
        ws = np.concatenate(ws)
        take = min(len(xs), max_samples)
        nd = int(self.mesh.shape["data"]) if self.mesh is not None else 1
        bs = (min(batch_size, take) // nd) * nd
        if bs == 0:
            return None
        if self.mesh is None:
            place = jnp.asarray
        else:
            from jax.sharding import NamedSharding, PartitionSpec
            from matcha_tpu.parallel.distributed import put_global
            rep = NamedSharding(self.mesh, PartitionSpec())
            place = lambda a: put_global(jnp.asarray(a), rep)  # noqa: E731
        return {"pool": (place(xs), place(szs), place(ws)),
                "szs_host": szs, "n_rows": len(xs), "ks": ks,
                "bs": bs, "n_batches": take // bs}

    def eval_epoch_pinned_launch(self, pinned, seed: int = 0):
        """Dispatch one mixed eval over the pinned pool WITHOUT blocking;
        returns a handle for _finish_eval.  Draws the same row indices
        eval_epoch(seed=seed) would, so predictions are bitwise equal."""
        rng = np.random.default_rng(seed)
        bs, n_b = pinned["bs"], pinned["n_batches"]
        indices = rng.permutation(pinned["n_rows"])[: n_b * bs]
        sizes_drawn = pinned["szs_host"][indices].reshape(n_b, bs)
        idx = indices.reshape(n_b, bs).astype(np.int32)
        if self.mesh is None:
            idx = jnp.asarray(idx)
        else:
            from matcha_tpu.parallel.distributed import put_global
            from matcha_tpu.parallel.mesh import batch_sharding
            idx = put_global(idx, batch_sharding(self.mesh, idx.ndim))
        self.state, aux = self._eval_mixed_indexed_fn(
            self.state, idx, pinned["pool"], pinned["ks"])
        return {"aux": aux, "sizes_drawn": sizes_drawn, "bs": bs,
                "n_batches": n_b}

    def _finish_eval(self, handle):
        """Fetch + assemble a pinned-eval dispatch (None -> the NaN result
        eval_epoch returns for an empty test set)."""
        if handle is None:
            return {"bce": float("nan"), "recon": float("nan"),
                    "metrics": {}}
        aux = self._gather_aux(handle["aux"])
        bs, n_batches = handle["bs"], handle["n_batches"]
        neg_num = self.settings.neg_num
        y = np.tile(np.concatenate([np.ones(bs), np.zeros(bs * neg_num)]),
                    n_batches)
        size_all = np.concatenate(
            [np.concatenate([sb, np.tile(sb, neg_num)])
             for sb in handle["sizes_drawn"]])
        metrics = size_stratified_metrics(y, aux["pred"].reshape(-1),
                                          size_all)
        return {"bce": float(aux["bce"].mean()),
                "recon": float(aux["recon"].mean()),
                "metrics": metrics,
                "fallback_bloom_rate": 0.0, "fallback_orig_rate": 0.0}

    # -------------------------------------------------------------- stage
    def fit(self, train_buckets, test_buckets, *, epochs: int,
            batch_size: int = 96, num_batch_per_iter: int = 1000,
            checkpoint_path: Optional[str] = None, log=print, seed: int = 0,
            metrics_logger=None, stage: str = "stage",
            profile_dir: Optional[str] = None,
            embeddings_path: Optional[str] = None,
            checkpoint_format: str = "pickle",
            resume_path: Optional[str] = None, resume: bool = False,
            device_epochs: str = "auto"):
        """One stage of the schedule; returns history.  Checkpoints when the
        largest size's validation AUPRC improves (ref Code/main.py:313-322).

        device_epochs: "auto" pins the bucket base arrays in HBM and runs the
          indexed device-resident epoch path (train_epoch_indexed — the
          program bench.py measures) whenever they fit the pin budget,
          falling back to the host BucketedBatcher path; "on" requires the
          pin (raises over budget); "off" forces the host path.  Both paths
          draw bitwise-identical batch streams (same ring state), pinned by
          tests/test_pipeline_e2e.py.  MATCHA_DEVICE_EPOCHS overrides "auto".

        checkpoint_format:
          "pickle" — single-file host pickle (artifact parity with the
            reference's model.chkpt; single-host only)
          "orbax"  — async sharded orbax checkpoint under checkpoint_path
            (a directory); each host writes its own shards, the save
            overlaps the next epoch — the multi-controller path

        resume_path: write a FULL resume snapshot (params, optimizer state,
          RNG key, epoch, running best) every epoch, in checkpoint_format.
          With resume=True, restore the latest snapshot and continue — the
          continued trajectory is EXACTLY the uninterrupted one: the
          restored key resumes the RNG stream, the batcher (same seed) is
          fast-forwarded through the completed epochs, and eval draws are
          seeded per epoch.  The capability the reference lacks
          (SURVEY §5.3/§5.4).
        """
        empty_ks = [k for k, v in train_buckets.items() if len(v[0]) == 0]
        if empty_ks:
            # a tiny bucket can land every row in the test split; train on
            # the rest (eval_epoch skips its empty buckets symmetrically)
            log(f"dropping empty train buckets: k={empty_ks}")
            train_buckets = {k: v for k, v in train_buckets.items()
                             if len(v[0]) > 0}
        batcher = BucketedBatcher(train_buckets, batch_size,
                                  num_batch_per_iter, seed=seed)
        if device_epochs == "auto":
            device_epochs = os.environ.get("MATCHA_DEVICE_EPOCHS", "auto")
        use_indexed = False
        if device_epochs != "off":
            use_indexed = self.pin_base_buckets(batcher)
            if device_epochs == "on" and not use_indexed:
                raise ValueError("device_epochs='on' but the bucket base "
                                 "arrays exceed the HBM pin budget "
                                 "(MATCHA_PIN_BUDGET_MB)")
            if not use_indexed:
                log("bucket base arrays exceed the HBM pin budget; using the "
                    "host batcher path")
        max_k = max(train_buckets.keys())
        # -inf, not 0.0: classification AUPRC is >= 0 so the first epoch
        # always checkpoints either way (matching ref Code/main.py:313-322's
        # best=0 + >=), while regress mode substitutes -bce (always negative)
        # for the NaN AUPRC and needs a floor below any achievable loss
        best = -float("inf")
        history = []
        ckpt_mgr = None
        resume_mgr = None
        if checkpoint_path and checkpoint_format == "orbax":
            from matcha_tpu.train.checkpoint import OrbaxCheckpointer
            ckpt_mgr = OrbaxCheckpointer(checkpoint_path)
        if resume_path and checkpoint_format == "orbax":
            from matcha_tpu.train.checkpoint import OrbaxCheckpointer
            resume_mgr = OrbaxCheckpointer(resume_path)
        start_epoch = 0
        if resume and resume_path:
            rc = self._load_resume(resume_path, resume_mgr)
            if rc is not None:
                params_r, opt_r, key_r, epoch_done, best_r = rc
                self.state = TrainState(params_r, opt_r, key_r)
                if best_r is not None:
                    best = float(best_r)
                start_epoch = int(epoch_done) + 1
                # fast-forward the deterministic batcher through the
                # completed epochs so the ring/shuffle state matches the
                # uninterrupted run's
                for _ in range(start_epoch):
                    batcher.skip_epoch()
                log(f"resumed from {resume_path}: continuing at epoch "
                    f"{start_epoch} (best {best:.4f})")
        import contextlib

        def post_epoch(epoch, tr, ev, params_ck, opt_ck, key_ck):
            """Shared epoch bookkeeping: logging, history, checkpoint on
            best AUPRC, per-epoch resume snapshot.  params/opt/key are the
            post-epoch state (live in the serial path, a device-copy
            snapshot in the overlapped path — the next epoch's launch
            donates the live buffers)."""
            nonlocal best
            roc, aupr, acc = format_metrics(tr["metrics"])
            fb = ""
            if tr["fallback_bloom_rate"] or tr["fallback_orig_rate"]:
                fb = (f" sampler-fallback bloom "
                      f"{tr['fallback_bloom_rate']:.2e}"
                      f" orig {tr['fallback_orig_rate']:.2e}")
            log(f"[epoch {epoch}] train bce {tr['bce']:.4f} recon "
                f"{tr['recon']:.4f} auc: {roc} aupr: {aupr} "
                f"({tr['hyperedges_per_sec']:.0f} hyperedges/s, "
                f"{tr['elapsed']:.1f}s){fb}")
            roc, aupr, acc = format_metrics(ev["metrics"])
            log(f"[epoch {epoch}] valid bce {ev['bce']:.4f} recon "
                f"{ev['recon']:.4f} auc: {roc} aupr: {aupr}")
            history.append({"train": tr, "valid": ev})
            if metrics_logger is not None:
                metrics_logger.log_epoch(stage, epoch, tr, ev)
            fallback_m = ev["metrics"].get("all", {"auprc": 0.0})
            val_aupr = ev["metrics"].get(max_k, fallback_m)["auprc"]
            if np.isnan(val_aupr):
                # regress mode: AUROC/AUPRC are undefined (labels all 1);
                # NaN >= best is never true, so no checkpoint would ever be
                # written — select on validation loss instead (best starts
                # at -inf, so -bce-based selection engages from epoch 0)
                val_aupr = -float(ev["bce"])
            if checkpoint_path and val_aupr >= best:
                best = val_aupr
                if ckpt_mgr is not None:
                    # async: the write overlaps the next epoch's steps
                    ckpt_mgr.save(epoch, params_ck, opt_ck, epoch)
                else:
                    save_checkpoint(checkpoint_path, params_ck, opt_ck,
                                    epoch)
            if resume_path:
                # full resume snapshot EVERY epoch (not just improvements):
                # params + optimizer + RNG key + running best
                if resume_mgr is not None:
                    resume_mgr.save(epoch, params_ck, opt_ck, epoch,
                                    key=key_ck, best=best)
                else:
                    save_checkpoint(resume_path, params_ck, opt_ck, epoch,
                                    key=key_ck, best=best)

        # Overlapped epoch pipeline (VERDICT r4 #5): epoch N+1 is dispatched
        # before epoch N's eval/export/checkpoint host work runs, so that
        # work rides under the next epoch's device compute instead of
        # serializing between dispatches.  The device program order per
        # epoch is train-scan then eval-scan — exactly the serial order —
        # so the RNG-key stream, eval draws, and all metrics are identical
        # (pinned by tests/test_indexed_epochs.py); only the wall-clock
        # placement of the host work changes.  MATCHA_FIT_OVERLAP=0 forces
        # the serial path.
        overlap = (use_indexed and self.settings.task_mode != "regress"
                   and os.environ.get("MATCHA_FIT_OVERLAP", "1") == "1")
        pinned_eval = (self._pin_eval_pool(test_buckets, batch_size)
                       if overlap else None)
        need_snap = bool(checkpoint_path or resume_path or embeddings_path)
        pending = None

        def finalize(p):
            ep, aux_p, elapsed_p, ev_handle, snap, mx_p, emb_dev = p
            ev = self._finish_eval(ev_handle)
            tr = self._finish_indexed(aux_p, elapsed_p, mx=mx_p)
            pk, ok, kk = snap if snap is not None else (None, None, None)
            post_epoch(ep, tr, ev, pk, ok, kk)
            if embeddings_path is not None and ep + 1 < epochs:
                # the serial loop's epoch-(ep+1) top-of-loop export: same
                # values (params after epoch ep), off the critical path
                if emb_dev is not None:
                    if jax.process_count() <= 1 or jax.process_index() == 0:
                        np.save(embeddings_path, np.asarray(emb_dev))
                else:
                    self.export_embeddings(embeddings_path, params=pk)

        for epoch in range(start_epoch, epochs):
            if embeddings_path is not None and (not overlap
                                                or epoch == start_epoch):
                # per-epoch embedding export (ref Code/main.py:275); under
                # overlap only the first (later ones run in finalize)
                self.export_embeddings(embeddings_path)
            if profile_dir is not None and epoch == 1:
                # trace the first steady-state epoch (epoch 0 pays compile)
                from matcha_tpu.utils import profile_trace
                prof = profile_trace(profile_dir)
            else:
                prof = contextlib.nullcontext()
            if overlap:
                with prof:
                    t0 = time.time()
                    aux = self.train_epoch_indexed_launch(batcher)
                    # device metrics enqueue IMMEDIATELY behind the epoch
                    # (a finalize-time dispatch would land behind the NEXT
                    # epoch and serialize two epochs per fetch)
                    mx = self.metrics_launch(aux)
                    # eval N enqueues next; key stream advances
                    # train-then-eval exactly as the serial path
                    ev_handle = (self.eval_epoch_pinned_launch(
                        pinned_eval, seed=seed + epoch)
                        if pinned_eval is not None else None)
                    snap = None
                    emb_dev = None
                    if need_snap:
                        s = self._snap_fn(self.state)
                        snap = (s.params, s.opt_state, s.key)
                        if checkpoint_path or resume_path:
                            # start the D2H copies now: the snap executes
                            # right after this epoch's eval on device, so
                            # the transfer hides under the NEXT epoch
                            for leaf in jax.tree_util.tree_leaves(
                                    (s.params, s.opt_state)):
                                leaf.copy_to_host_async()
                        if embeddings_path is not None and self.mesh is None:
                            # export's device part dispatches HERE — a
                            # finalize-time dispatch would enqueue behind
                            # the next epoch and serialize the pipeline
                            emb_dev = self._emb_export_fn(s.params,
                                                          self.frozen)
                            emb_dev.copy_to_host_async()
                    # previous epoch's host work overlaps this epoch's
                    # device compute
                    if pending is not None:
                        finalize(pending)
                    jax.block_until_ready(aux["bce"])
                    elapsed = time.time() - t0
                if jax.process_count() <= 1:
                    skip_pred = self._use_device_metrics()
                    for name, leaf in aux.items():
                        if skip_pred and name == "pred":
                            continue   # metrics computed on device; the
                                       # 13 MB prediction fetch is skipped
                        leaf.copy_to_host_async()
                pending = (epoch, aux, elapsed, ev_handle, snap, mx,
                           emb_dev)
                continue
            if use_indexed:
                with prof:
                    t0 = time.time()
                    aux = self.train_epoch_indexed_launch(batcher)
                    mx = self.metrics_launch(aux)
                    jax.block_until_ready(aux["bce"])
                    elapsed = time.time() - t0
                # start the (big) per-step prediction fetch now so the host
                # copy overlaps eval's device compute
                if jax.process_count() <= 1:
                    skip_pred = self._use_device_metrics()
                    for name, leaf in aux.items():
                        if skip_pred and name == "pred":
                            continue
                        leaf.copy_to_host_async()
                ev = self.eval_epoch(test_buckets, batch_size=batch_size,
                                     seed=seed + epoch)
                tr = self._finish_indexed(aux, elapsed, mx=mx)
            else:
                with prof:
                    tr = self.train_epoch(batcher)
                ev = self.eval_epoch(test_buckets, batch_size=batch_size,
                                     seed=seed + epoch)
            post_epoch(epoch, tr, ev, self.state.params,
                       self.state.opt_state, self.state.key)
        if pending is not None:
            finalize(pending)
        if resume_mgr is not None:
            resume_mgr.close()
        if checkpoint_path:
            if ckpt_mgr is not None:
                if ckpt_mgr.latest_step() is not None:
                    # max_to_keep=1 + save-on-improvement => latest == best;
                    # restore straight into the live sharding layout
                    params, _, _ = ckpt_mgr.restore(
                        like_params=self.state.params)
                    self.state = self.state._replace(params=params)
                ckpt_mgr.close()
                return history
            if jax.process_count() > 1:
                # make sure process 0 finished writing before anyone reloads
                from jax.experimental import multihost_utils
                multihost_utils.sync_global_devices("matcha_ckpt_reload")
            if os.path.exists(checkpoint_path):
                params = load_checkpoint(checkpoint_path)
                if self.mesh is not None:
                    from matcha_tpu.parallel.distributed import put_global
                    from matcha_tpu.parallel.mesh import param_sharding
                    params = jax.tree_util.tree_map(
                        put_global, params,
                        param_sharding(params, self.mesh,
                                       tensor_parallel=self.tensor_parallel))
                self.state = self.state._replace(params=params)
        return history

    def _load_resume(self, resume_path: str, resume_mgr):
        """Restore a per-epoch resume snapshot.  Returns (params, opt_state,
        key, epoch_done, best) or None when no snapshot exists yet."""
        if resume_mgr is not None:
            if resume_mgr.latest_step() is None:
                return None
            params, opt_state, epoch_done = resume_mgr.restore(
                like_params=self.state.params,
                like_opt_state=self.state.opt_state)
            meta = resume_mgr.last_meta
            key = self.state.key
            if meta.get("key") is not None:
                key = jnp.asarray(np.asarray(meta["key"], np.uint32))
            return params, opt_state, key, epoch_done, meta.get("best")
        if not os.path.exists(resume_path):
            return None
        ckpt = load_checkpoint(resume_path, full=True)
        if ckpt.get("epoch") is None:
            return None
        params = ckpt["params"]
        opt_state = jax.tree_util.tree_map(jnp.asarray, ckpt["opt_state"]) \
            if ckpt.get("opt_state") is not None else self.state.opt_state
        key = (jnp.asarray(ckpt["key"]) if ckpt.get("key") is not None
               else self.state.key)
        if self.mesh is not None:
            from matcha_tpu.parallel.distributed import put_global
            from matcha_tpu.parallel.mesh import param_sharding
            from jax.sharding import NamedSharding, PartitionSpec
            params = jax.tree_util.tree_map(
                put_global, params,
                param_sharding(params, self.mesh,
                               tensor_parallel=self.tensor_parallel))
            rep = NamedSharding(self.mesh, PartitionSpec())
            # optimizer moments follow the replicated layout of the pickle
            # path (single-host); key is replicated
            opt_state = jax.tree_util.tree_map(
                lambda x: put_global(jnp.asarray(x), rep), opt_state)
            key = put_global(key, rep)
        return params, opt_state, key, ckpt["epoch"], ckpt.get("best")

    def export_embeddings(self, path: str, params=None) -> np.ndarray:
        """Per-node embedding export (ref save_embeddings,
        Code/main.py:462-479 -> ../embeddings.npy).  params: an explicit
        parameter tree (fit's overlapped path passes the post-epoch
        snapshot; default = the live state)."""
        p = self.state.params if params is None else params
        if self.mesh is None:
            # jitted: ONE dispatch.  Eager tracing is op-by-op — measured
            # 121.6 s (first call) vs 1.4 s jitted on the tunneled PJRT
            # backend, where every eager op is a network round trip
            emb = self._emb_export_fn(p, self.frozen)
        else:
            # mesh path stays eager: output shardings follow the inputs and
            # the multi-process replicate_to_host handles placement
            emb = node_embeddings(p, self.frozen, self.dims)
        if self.mesh is not None and jax.process_count() > 1:
            from matcha_tpu.parallel.distributed import replicate_to_host
            emb = replicate_to_host(emb, self.mesh)
        emb = np.asarray(emb)
        # shared filesystem: process 0 writes, like save_checkpoint —
        # concurrent same-path np.save from every host can interleave
        if jax.process_count() <= 1 or jax.process_index() == 0:
            np.save(path, emb)
        return emb


# ------------------------------------------------------------- checkpointing
def save_checkpoint(path: str, params, opt_state=None, epoch=None,
                    key=None, best=None) -> None:
    """Best-model checkpoint (parity with ref {'model_link', 'epoch'} dict,
    Code/main.py:316-322, extended with optimizer state for true resume —
    the reference cannot resume mid-stage, SURVEY §5.4).

    key/best: the trainer RNG key and running best-metric value — stored by
    the per-epoch RESUME snapshots so a restored run replays the exact
    trajectory of the uninterrupted one (SURVEY §5.3).

    Multi-process: state is replicated (addressable everywhere); process 0
    writes, others no-op (reload assumes a shared filesystem, the usual pod
    setup; orbax provides the per-host alternative)."""
    if jax.process_count() > 1 and jax.process_index() != 0:
        return
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump({"params": jax.device_get(params),
                     "opt_state": jax.device_get(opt_state)
                     if opt_state is not None else None,
                     "epoch": epoch,
                     "key": None if key is None else jax.device_get(key),
                     "best": best}, f)


def load_checkpoint(path: str, full: bool = False):
    with open(path, "rb") as f:
        ckpt = pickle.load(f)
    if not isinstance(ckpt, dict) or "params" not in ckpt:
        ckpt = {"params": ckpt, "opt_state": None, "epoch": None}
    ckpt["params"] = jax.tree_util.tree_map(jnp.asarray, ckpt["params"])
    return ckpt if full else ckpt["params"]


def save_model_bundle(path: str, params, dims: ModelDims, genome,
                      intra_adj=None, inter_adj=None) -> None:
    """The inference-app artifact (parity with the reference's whole-model
    pickle ``model2load``, ref Code/main.py:322,685): params + static dims +
    genome metadata (+ the contact matrices needed to rebuild frozen tables)."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "params.pkl"), "wb") as f:
        pickle.dump(jax.device_get(params), f)
    with open(os.path.join(path, "meta.pkl"), "wb") as f:
        pickle.dump({"dims": dims._asdict(),
                     "chrom_names": genome.chrom_names,
                     "chrom_sizes": genome.chrom_sizes,
                     "resolution": genome.resolution}, f)
    if intra_adj is not None:
        np.save(os.path.join(path, "intra_adj.npy"), intra_adj)
    if inter_adj is not None:
        np.save(os.path.join(path, "inter_adj.npy"), inter_adj)


def load_model_bundle(path: str):
    """-> (params, dims, genome, frozen)"""
    from matcha_tpu.genome import GenomeBins
    from matcha_tpu.models.hypersagnn import build_frozen_tables
    with open(os.path.join(path, "params.pkl"), "rb") as f:
        params = jax.tree_util.tree_map(jnp.asarray, pickle.load(f))
    with open(os.path.join(path, "meta.pkl"), "rb") as f:
        meta = pickle.load(f)
    genome = GenomeBins(meta["chrom_names"], meta["chrom_sizes"],
                        meta["resolution"])
    dims = ModelDims(**meta["dims"])
    # save_model_bundle treats the adjacency matrices as optional (the
    # "table" embedding mode needs no frozen feature tables) — mirror that
    ip = os.path.join(path, "intra_adj.npy")
    jp = os.path.join(path, "inter_adj.npy")
    n = genome.num_nodes
    intra = np.load(ip) if os.path.exists(ip) else np.zeros((n, n),
                                                            np.float32)
    inter = np.load(jp) if os.path.exists(jp) else np.zeros((n, n),
                                                            np.float32)
    frozen = build_frozen_tables(genome, intra, inter)
    return params, dims, genome, frozen
