"""Token-stream modes added for the cold-compile fix.

Pins:
  * sort_small (fixed sorting networks) == jnp.sort for widths 1..6
  * forward_buckets(attention_mode="pad-max"):
      - the max-k bucket gets zero pads -> EXACTLY equals the per-k path
      - a sub-max bucket equals `forward` on the SAME rows zero-padded to
        max k (the reference's training-time pads-as-keys semantics,
        ref Code/main.py:436-437 + Code/Modules.py:611-613)
      - the k=2 bucket keeps the closed form (no pad keys)
  * token_stream="padded" loss path agrees with "merged" on everything that
    is pad-independent (max-k predictions, recon, sampler telemetry)
  * Trainer.prepare_device_epochs / train_epoch_device runs a full
    device-resident epoch and reports finite metrics
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from matcha_tpu.genome import GenomeBins
from matcha_tpu.models.hypersagnn import (ModelDims, build_frozen_tables,
                                          forward, forward_buckets,
                                          init_model)
from matcha_tpu.sampler.negative import sort_small


# ----------------------------------------------------------- sorting network
def test_sort_small_matches_jnp_sort():
    rng = np.random.default_rng(0)
    for k in range(1, 7):
        x = jnp.asarray(rng.integers(0, 9, size=(64, k)), dtype=jnp.int32)
        np.testing.assert_array_equal(np.asarray(sort_small(x)),
                                      np.sort(np.asarray(x), axis=-1))
    # higher-rank input (the sampler sorts (T, n, k) trial stacks)
    x = jnp.asarray(rng.integers(0, 50, size=(3, 16, 5)), dtype=jnp.int32)
    np.testing.assert_array_equal(np.asarray(sort_small(x)),
                                  np.sort(np.asarray(x), axis=-1))


# ------------------------------------------------------------------ fixtures
@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    genome = GenomeBins(["chr1", "chr2"], [24_000_000, 15_000_000], 1_000_000)
    n = genome.num_nodes
    intra = rng.random((n, n)).astype(np.float32)
    intra = intra + intra.T
    inter = rng.random((n, n)).astype(np.float32)
    dims = ModelDims(dim=16, n_head=4, num_chroms=2, num_nodes=n)
    chrom_sizes = [int(e - s) for s, e in genome.chrom_range]
    params = init_model(jax.random.PRNGKey(0), dims, chrom_sizes)
    frozen = build_frozen_tables(genome, intra, inter)
    xs = {}
    for k in (2, 3, 5):
        e = np.stack([np.sort(rng.choice(np.arange(1, n + 1), k,
                                         replace=False))
                      for _ in range(9)])
        xs[k] = jnp.asarray(e, dtype=jnp.int32)
    return genome, dims, params, frozen, xs


# ------------------------------------------------------------------- pad-max
def test_pad_max_exact_when_no_pads_needed(setup):
    """With only {2, max-k} buckets every row is pad-free, so pad-max must
    equal the per-k path bit-for-bit semantics (allclose in f32)."""
    _, dims, params, frozen, xs = setup
    sub = {2: xs[2], 5: xs[5]}
    a = forward_buckets(params, frozen, dims, sub, attention_mode="per-k")
    b = forward_buckets(params, frozen, dims, sub, attention_mode="pad-max")
    for k in sub:
        np.testing.assert_allclose(np.asarray(b[k]), np.asarray(a[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=f"k={k}")


def test_pad_max_matches_padded_forward(setup):
    """pad-max logits per bucket == `forward` on the reference-style
    zero-padded input (pads participate as attention keys)."""
    _, dims, params, frozen, xs = setup
    out = forward_buckets(params, frozen, dims, xs, attention_mode="pad-max")
    L = max(xs)
    for k, x in xs.items():
        if k == 2:
            ref = forward(params, frozen, dims, x)         # closed form
        else:
            xp = jnp.pad(x, ((0, 0), (0, L - k)))
            ref = forward(params, frozen, dims, xp)
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6, err_msg=f"k={k}")


def test_pad_max_grads_finite(setup):
    _, dims, params, frozen, xs = setup

    def loss(p):
        out = forward_buckets(p, frozen, dims, xs, attention_mode="pad-max")
        return sum(jnp.sum(v ** 2) for v in out.values())

    g = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


# ----------------------------------------------------- padded loss path
def _make_batch(xs):
    return {k: (x, jnp.ones((x.shape[0],), jnp.float32)) for k, x in xs.items()}


def test_padded_loss_agrees_with_merged_on_pad_free_parts(setup):
    """Same key => identical negative samples and recon chromosome draw, so
    "padded" and "merged" must agree exactly on recon, sampler telemetry,
    and the max-k bucket's predictions (which get zero pads either way)."""
    from matcha_tpu.sampler.bloom import build_bloom_dict
    from matcha_tpu.sampler.negative import ChromTable
    from matcha_tpu.train.runtime import TrainSettings, batch_loss

    genome, dims, params, frozen, xs = setup
    table = ChromTable.from_genome(genome)
    blooms = build_bloom_dict({k: np.asarray(x) for k, x in xs.items()})
    batch = _make_batch(xs)
    key = jax.random.PRNGKey(11)
    from matcha_tpu.models.hypersagnn import encode_node_table
    node_table = encode_node_table(params, frozen, dims)

    outs = {}
    for mode in ("padded", "merged"):
        s = TrainSettings(alpha=1.0, beta=0.001, token_stream=mode)
        loss, aux = batch_loss(params, frozen, dims, table, blooms, s,
                               batch, key, node_table, False)
        outs[mode] = (loss, aux)
    a, b = outs["padded"][1], outs["merged"][1]
    np.testing.assert_allclose(float(a["recon"]), float(b["recon"]),
                               rtol=1e-5)
    assert int(a["fallback_rows"]) == int(b["fallback_rows"])
    assert int(a["fallback_bloom"]) == int(b["fallback_bloom"])
    # max-k bucket rows are pad-free in both modes: preds must match
    n5 = xs[5].shape[0] * 4            # pos + 3 neg
    np.testing.assert_allclose(np.asarray(a["pred"][-n5:]),
                               np.asarray(b["pred"][-n5:]),
                               rtol=1e-5, atol=1e-6)
    for _, aux in outs.values():
        assert np.isfinite(np.asarray(aux["pred"])).all()


# ------------------------------------------------- device-resident epochs
@pytest.mark.parametrize("mode", ["padded", "hybrid", "merged"])
def test_train_epoch_device(setup, mode):
    from matcha_tpu.sampler.bloom import build_bloom_dict
    from matcha_tpu.sampler.negative import ChromTable
    from matcha_tpu.train.runtime import Trainer, TrainSettings

    genome, dims, params, frozen, xs = setup
    buckets = {k: (np.asarray(x),
                   np.ones(x.shape[0], np.float32)) for k, x in xs.items()}
    blooms = build_bloom_dict({k: np.asarray(x) for k, x in xs.items()})
    trainer = Trainer(params, frozen, dims, ChromTable.from_genome(genome),
                      TrainSettings(alpha=1.0, beta=0.001,
                                    token_stream=mode),
                      blooms=blooms)
    trainer.prepare_device_epochs(buckets, batch_size=4,
                                  num_batch_per_iter=3)
    r = trainer.train_epoch_device()
    assert np.isfinite(r["bce"]) and np.isfinite(r["recon"])
    assert "all" in r["metrics"] and 0.0 <= r["metrics"]["all"]["auroc"] <= 1.0
    assert r["fallback_bloom_rate"] >= 0.0
    # a second epoch reuses the compiled program and advances the state
    r2 = trainer.train_epoch_device()
    assert np.isfinite(r2["bce"])
