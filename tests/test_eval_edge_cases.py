"""eval_epoch edge cases: size buckets whose 80/20 test split came up empty
(found by a real-TPU end-to-end CLI drive: 2 k=5-mers total -> 0 test rows
-> ZeroDivisionError in the eval batch plan)."""

import numpy as np

from __graft_entry__ import _build_problem, _random_buckets
from matcha_tpu.sampler.negative import ChromTable
from matcha_tpu.train.runtime import Trainer, TrainSettings


def test_eval_epoch_skips_empty_bucket():
    genome, dims, params, frozen = _build_problem(dim=16, n_head=4, chroms=2)
    rng = np.random.default_rng(0)
    buckets = _random_buckets(genome, rng, n_edges=64, k_list=(2,))
    trainer = Trainer(params, frozen, dims, ChromTable.from_genome(genome),
                      TrainSettings(alpha=1.0, beta=0.001))
    empty3 = (np.zeros((0, 3), np.int32), np.zeros((0,), np.float32))
    ev = trainer.eval_epoch({2: buckets[2], 3: empty3}, batch_size=16)
    assert 2 in ev["metrics"] and 3 not in ev["metrics"]

    ev2 = trainer.eval_epoch({3: empty3}, batch_size=16)
    assert ev2["metrics"] == {}


def test_fit_drops_empty_train_bucket():
    """A tiny bucket whose 80/20 split left train empty must not crash fit
    (the batcher rejects empty buckets; fit drops them first)."""
    genome, dims, params, frozen = _build_problem(dim=16, n_head=4, chroms=2)
    rng = np.random.default_rng(1)
    buckets = _random_buckets(genome, rng, n_edges=64, k_list=(2,))
    trainer = Trainer(params, frozen, dims, ChromTable.from_genome(genome),
                      TrainSettings(alpha=1.0, beta=0.001))
    empty3 = (np.zeros((0, 3), np.int32), np.zeros((0,), np.float32))
    logs = []
    hist = trainer.fit({2: buckets[2], 3: empty3},
                       {2: buckets[2], 3: empty3}, epochs=1, batch_size=16,
                       num_batch_per_iter=2, log=logs.append)
    assert len(hist) == 1
    assert any("dropping empty train buckets" in l for l in logs)


def test_regress_mode_checkpoints(tmp_path):
    """Regress mode has NaN AUROC/AUPRC; checkpoint selection must fall
    back to validation loss instead of never writing."""
    genome, dims, params, frozen = _build_problem(dim=16, n_head=4, chroms=2)
    rng = np.random.default_rng(2)
    buckets = _random_buckets(genome, rng, n_edges=64, k_list=(2,))
    trainer = Trainer(params, frozen, dims, ChromTable.from_genome(genome),
                      TrainSettings(alpha=1.0, beta=0.0, task_mode="regress"))
    ckpt = str(tmp_path / "model.chkpt")
    trainer.fit({2: buckets[2]}, {2: buckets[2]}, epochs=1, batch_size=16,
                num_batch_per_iter=2, checkpoint_path=ckpt,
                log=lambda *_: None)
    import os
    assert os.path.exists(ckpt)


def test_regress_nan_auprc_checkpoints_on_loss(tmp_path, monkeypatch):
    """Force the NaN-AUPRC path directly (sklearn happens to return
    auprc=1.0 for all-positive labels, so the regress fit above never hits
    it): checkpoint selection must fall back to -bce with a -inf floor, so
    the best-loss epoch is the one written.  The fake below patches
    eval_epoch, which fit's overlapped pipeline bypasses (it dispatches the
    pinned eval directly) — force the serial path; the NaN fallback lives
    in the shared post_epoch bookkeeping either way."""
    from matcha_tpu.train.runtime import load_checkpoint
    monkeypatch.setenv("MATCHA_FIT_OVERLAP", "0")

    genome, dims, params, frozen = _build_problem(dim=16, n_head=4, chroms=2)
    rng = np.random.default_rng(4)
    buckets = _random_buckets(genome, rng, n_edges=64, k_list=(2,))
    trainer = Trainer(params, frozen, dims, ChromTable.from_genome(genome),
                      TrainSettings(alpha=1.0, beta=0.0))
    nan_m = {"auroc": float("nan"), "auprc": float("nan"), "acc": 0.0}
    bces = iter([0.9, 0.3, 0.5])   # epoch 1 is the best-loss epoch

    def fake_eval(*a, **k):
        return {"metrics": {2: dict(nan_m), "all": dict(nan_m)},
                "bce": next(bces), "recon": 0.0}

    trainer.eval_epoch = fake_eval
    ckpt = str(tmp_path / "model.chkpt")
    trainer.fit({2: buckets[2]}, {2: buckets[2]}, epochs=3, batch_size=16,
                num_batch_per_iter=2, checkpoint_path=ckpt,
                log=lambda *_: None)
    import os
    assert os.path.exists(ckpt)
    assert load_checkpoint(ckpt, full=True)["epoch"] == 1


def test_eval_small_bucket_under_mesh():
    """Under a data mesh the eval batch must split evenly over the chips.
    With the mixed-pool draw a 3-row bucket joins the pooled subsample
    (as the reference's mixed 10k draw does) instead of being skipped;
    a pool smaller than the data axis still returns the empty result."""
    from matcha_tpu.parallel.mesh import make_mesh
    genome, dims, params, frozen = _build_problem(dim=16, n_head=4, chroms=2)
    rng = np.random.default_rng(3)
    buckets = _random_buckets(genome, rng, n_edges=64, k_list=(2, 3))
    small2 = (buckets[2][0][:10], buckets[2][1][:10])
    tiny3 = (buckets[3][0][:3], buckets[3][1][:3])
    import jax
    mesh = make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])
    trainer = Trainer(params, frozen, dims, ChromTable.from_genome(genome),
                      TrainSettings(alpha=1.0, beta=0.001), mesh=mesh)
    # pool = 13 rows -> bs 12 (multiple of 4 chips), one batch; the draw is
    # over the mixed pool so both sizes appear in the stratified metrics
    ev = trainer.eval_epoch({2: small2, 3: tiny3}, batch_size=16,
                            indices=np.arange(13))
    assert 2 in ev["metrics"] and 3 in ev["metrics"]
    # pool of 3 rows < 4 chips: cannot shard a single batch -> empty result
    ev2 = trainer.eval_epoch({3: tiny3}, batch_size=16)
    assert ev2["metrics"] == {}


def test_eval_mixed_matches_per_row_forward():
    """The mixed-pool eval's positive predictions are deterministic (eval
    mode, no dropout) and must equal a direct per-row forward on the padded
    rows — the decomposition behind the mixed path (attention is per-row,
    so batch composition cannot change a row's logit)."""
    import jax
    import jax.numpy as jnp
    from matcha_tpu.models.hypersagnn import encode_node_table, forward
    from matcha_tpu.sampler.bloom import build_bloom_dict
    from matcha_tpu.train.runtime import _eval_mixed_loss

    genome, dims, params, frozen = _build_problem(dim=16, n_head=4, chroms=2)
    rng = np.random.default_rng(5)
    buckets = _random_buckets(genome, rng, n_edges=96, k_list=(2, 3))
    blooms = build_bloom_dict({k: v[0] for k, v in buckets.items()})
    trainer = Trainer(params, frozen, dims, ChromTable.from_genome(genome),
                      TrainSettings(alpha=1.0, beta=0.001), blooms=blooms)
    # mixed batch: 8 k=2 rows + 8 k=3 rows padded to L=3
    x = np.concatenate([np.pad(buckets[2][0][:8], ((0, 0), (0, 1))),
                        buckets[3][0][:8]]).astype(np.int32)
    sizes = np.array([2] * 8 + [3] * 8, np.int32)
    w = np.ones(16, np.float32)
    node_table = encode_node_table(trainer.state.params, trainer.frozen,
                                   dims, train=False)
    def loss_fn(p, b, k):
        return _eval_mixed_loss(p, trainer.frozen, dims, trainer.chrom_table,
                                blooms, trainer.settings, (2, 3), b, k,
                                node_table)

    aux = jax.jit(loss_fn)(
        trainer.state.params, (jnp.asarray(x), jnp.asarray(sizes),
                               jnp.asarray(w)), jax.random.PRNGKey(0))
    logits, _ = forward(trainer.state.params, trainer.frozen, dims,
                        jnp.asarray(x), key=jax.random.PRNGKey(1),
                        train=False, return_recon=True,
                        node_table=node_table)
    pos_pred = np.asarray(aux["pred"])[:16]
    expect = np.asarray(jax.nn.sigmoid(logits)).reshape(-1)
    np.testing.assert_allclose(pos_pred, expect, rtol=1e-5, atol=1e-6)


def test_eval_mixed_draw_is_pool_proportional():
    """The subsample is drawn from the MIXED pool (ref Code/main.py:216-217)
    — per-k representation follows pool proportions, not one-per-k
    alignment: a 9:1 skew must show up in the drawn metrics support."""
    genome, dims, params, frozen = _build_problem(dim=16, n_head=4, chroms=2)
    rng = np.random.default_rng(6)
    buckets = _random_buckets(genome, rng, n_edges=512, k_list=(2, 3))
    big2 = (buckets[2][0][:450], buckets[2][1][:450])
    small3 = (buckets[3][0][:50], buckets[3][1][:50])
    trainer = Trainer(params, frozen, dims, ChromTable.from_genome(genome),
                      TrainSettings(alpha=1.0, beta=0.001))
    ev = trainer.eval_epoch({2: big2, 3: small3}, batch_size=100,
                            max_samples=500, seed=0)
    m = ev["metrics"]
    assert m[2]["n"] / m[3]["n"] > 5  # ~9:1 pool ratio, not 1:1 per-k
