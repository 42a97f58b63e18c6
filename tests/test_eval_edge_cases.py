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


def test_regress_nan_auprc_checkpoints_on_loss(tmp_path):
    """Force the NaN-AUPRC path directly (sklearn happens to return
    auprc=1.0 for all-positive labels, so the regress fit above never hits
    it): checkpoint selection must fall back to -bce with a -inf floor, so
    the best-loss epoch is the one written."""
    from matcha_tpu.train.runtime import load_checkpoint

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
    """Under a data mesh the eval batch must split evenly over the chips: a
    10-row bucket previously crashed _place_batch with an indivisible dim,
    and a bucket smaller than the data axis cannot be sharded — skipped."""
    from matcha_tpu.parallel.mesh import make_mesh
    genome, dims, params, frozen = _build_problem(dim=16, n_head=4, chroms=2)
    rng = np.random.default_rng(3)
    buckets = _random_buckets(genome, rng, n_edges=64, k_list=(2, 3))
    small2 = (buckets[2][0][:10], buckets[2][1][:10])   # 10 rows: bs -> 8
    tiny3 = (buckets[3][0][:3], buckets[3][1][:3])      # 3 < 4 chips: skip
    import jax
    mesh = make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])
    trainer = Trainer(params, frozen, dims, ChromTable.from_genome(genome),
                      TrainSettings(alpha=1.0, beta=0.001), mesh=mesh)
    ev = trainer.eval_epoch({2: small2, 3: tiny3}, batch_size=16)
    assert 2 in ev["metrics"] and 3 not in ev["metrics"]
