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
