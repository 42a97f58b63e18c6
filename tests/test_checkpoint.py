"""Orbax checkpointing: async save/restore round-trip, sharded restore,
best-checkpoint reload inside Trainer.fit (VERDICT #10 / SURVEY §5.4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from matcha_tpu.train.checkpoint import OrbaxCheckpointer


def tree_allclose(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_roundtrip_with_opt_state_and_epoch(tmp_path):
    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))}
    import optax
    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)
    with OrbaxCheckpointer(str(tmp_path / "ckpt")) as ckpt:
        ckpt.save(0, params, opt_state, epoch=7)
        ckpt.wait()
        p2, o2, ep = ckpt.restore(like_params=params,
                                  like_opt_state=opt_state)
    assert ep == 7
    tree_allclose(params, p2)
    tree_allclose(opt_state, o2)


def test_max_to_keep_retains_latest(tmp_path):
    with OrbaxCheckpointer(str(tmp_path / "c")) as ckpt:
        ckpt.save(0, {"w": jnp.zeros(2)})
        ckpt.save(3, {"w": jnp.full(2, 3.0)})
        ckpt.wait()
        assert ckpt.latest_step() == 3
        p, o, ep = ckpt.restore()
        assert o is None and ep is None
        np.testing.assert_allclose(np.asarray(p["w"]), 3.0)


def test_sharded_restore_preserves_sharding(tmp_path):
    from jax.sharding import Mesh, NamedSharding, PartitionSpec
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs >=4 virtual devices")
    mesh = Mesh(np.array(devs[:4]).reshape(4), ("data",))
    sh = NamedSharding(mesh, PartitionSpec("data"))
    params = {"t": jax.device_put(jnp.arange(8.0), sh)}
    with OrbaxCheckpointer(str(tmp_path / "s")) as ckpt:
        ckpt.save(0, params)
        ckpt.wait()
        p2, _, _ = ckpt.restore(like_params=params)
    assert p2["t"].sharding == sh
    np.testing.assert_allclose(np.asarray(p2["t"]), np.arange(8.0))


def test_fit_orbax_best_reload(tmp_path):
    """Trainer.fit(checkpoint_format='orbax') saves on improvement and
    reloads the best checkpoint at stage end."""
    from matcha_tpu.genome import GenomeBins
    from matcha_tpu.models.hypersagnn import (ModelDims, build_frozen_tables,
                                              init_model)
    from matcha_tpu.sampler.bloom import build_bloom_dict
    from matcha_tpu.sampler.negative import ChromTable
    from matcha_tpu.train.runtime import Trainer, TrainSettings

    rng = np.random.default_rng(5)
    genome = GenomeBins(["chr1", "chr2"], [20_000_000, 14_000_000], 1_000_000)
    n = genome.num_nodes
    intra = rng.random((n, n)).astype(np.float32)
    intra = intra + intra.T
    inter = rng.random((n, n)).astype(np.float32)
    dims = ModelDims(dim=8, n_head=2, num_chroms=2, num_nodes=n)
    chrom_sizes = [int(e - s) for s, e in genome.chrom_range]
    params = init_model(jax.random.PRNGKey(0), dims, chrom_sizes)
    frozen = build_frozen_tables(genome, intra, inter)

    buckets = {}
    for k in (2, 3):
        e = np.stack([np.sort(rng.choice(np.arange(1, n + 1), k,
                                         replace=False))
                      for _ in range(24)]).astype(np.int32)
        buckets[k] = (e, np.ones(len(e), np.float32))
    blooms = build_bloom_dict({k: v[0] for k, v in buckets.items()})
    trainer = Trainer(params, frozen, dims, ChromTable.from_genome(genome),
                      TrainSettings(alpha=1.0, beta=0.001), blooms=blooms)
    ckpt_dir = tmp_path / "orbax_ckpt"
    hist = trainer.fit(buckets, buckets, epochs=2, batch_size=8,
                       num_batch_per_iter=2,
                       checkpoint_path=str(ckpt_dir),
                       checkpoint_format="orbax", log=lambda *_: None)
    assert len(hist) == 2
    assert ckpt_dir.exists() and any(ckpt_dir.iterdir())
    # the live params equal some saved checkpoint (the best one)
    with OrbaxCheckpointer(str(ckpt_dir)) as ckpt:
        saved, _, _ = ckpt.restore()
    for a, b in zip(jax.tree_util.tree_leaves(saved),
                    jax.tree_util.tree_leaves(trainer.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def _small_problem(seed=5):
    from matcha_tpu.genome import GenomeBins
    from matcha_tpu.models.hypersagnn import (ModelDims, build_frozen_tables,
                                              init_model)
    from matcha_tpu.sampler.bloom import build_bloom_dict

    rng = np.random.default_rng(seed)
    genome = GenomeBins(["chr1", "chr2"], [20_000_000, 14_000_000], 1_000_000)
    n = genome.num_nodes
    intra = rng.random((n, n)).astype(np.float32)
    intra = intra + intra.T
    inter = rng.random((n, n)).astype(np.float32)
    dims = ModelDims(dim=8, n_head=2, num_chroms=2, num_nodes=n)
    chrom_sizes = [int(e - s) for s, e in genome.chrom_range]
    params = init_model(jax.random.PRNGKey(0), dims, chrom_sizes)
    frozen = build_frozen_tables(genome, intra, inter)
    buckets = {}
    for k in (2, 3):
        e = np.stack([np.sort(rng.choice(np.arange(1, n + 1), k,
                                         replace=False))
                      for _ in range(24)]).astype(np.int32)
        buckets[k] = (e, np.ones(len(e), np.float32))
    blooms = build_bloom_dict({k: v[0] for k, v in buckets.items()})
    return genome, dims, params, frozen, buckets, blooms


@pytest.mark.parametrize("fmt", ["pickle", "orbax"])
def test_resume_mid_stage_exact(tmp_path, fmt):
    """Kill after epoch 1, restore, continue: the continued trajectory
    (losses AND final params) must equal the uninterrupted 4-epoch run —
    optimizer state, RNG key, and batcher ring state all restored
    (SURVEY §5.3/§5.4: the capability the reference lacks)."""
    from matcha_tpu.sampler.negative import ChromTable
    from matcha_tpu.train.runtime import Trainer, TrainSettings

    genome, dims, params, frozen, buckets, blooms = _small_problem()
    table = ChromTable.from_genome(genome)
    settings = TrainSettings(alpha=1.0, beta=0.001)
    kw = dict(epochs=4, batch_size=8, num_batch_per_iter=2,
              checkpoint_format=fmt, log=lambda *_: None)

    # uninterrupted run
    ta = Trainer(params, frozen, dims, table, settings, blooms=blooms)
    hist_a = ta.fit(buckets, buckets,
                    resume_path=str(tmp_path / f"resA_{fmt}"), **kw)

    # interrupted: 2 epochs, then a FRESH trainer resumes for epochs 2-3
    pb = str(tmp_path / f"resB_{fmt}")
    tb1 = Trainer(params, frozen, dims, table, settings, blooms=blooms)
    kw1 = dict(kw, epochs=2)
    tb1.fit(buckets, buckets, resume_path=pb, **kw1)
    tb2 = Trainer(params, frozen, dims, table, settings, blooms=blooms)
    hist_b = tb2.fit(buckets, buckets, resume_path=pb, resume=True, **kw)

    assert len(hist_b) == 2   # only epochs 2 and 3 ran
    for a, b in zip(hist_a[2:], hist_b):
        assert abs(a["train"]["bce"] - b["train"]["bce"]) < 1e-6
        assert abs(a["train"]["recon"] - b["train"]["recon"]) < 1e-5
        assert abs(a["valid"]["bce"] - b["valid"]["bce"]) < 1e-6
    for x, y in zip(jax.tree_util.tree_leaves(ta.state.params),
                    jax.tree_util.tree_leaves(tb2.state.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-7)
    # optimizer state equality too (true resume, not params-only)
    for x, y in zip(jax.tree_util.tree_leaves(ta.state.opt_state),
                    jax.tree_util.tree_leaves(tb2.state.opt_state)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-7)


def test_model_bundle_without_adjacency(tmp_path):
    """save_model_bundle treats the adjacency matrices as optional (the
    'table' embedding mode needs no frozen feature tables); load must not
    require them."""
    import jax
    from matcha_tpu.genome import GenomeBins
    from matcha_tpu.models.hypersagnn import ModelDims, init_model
    from matcha_tpu.train.runtime import load_model_bundle, save_model_bundle

    genome = GenomeBins(["chr1", "chr2"], [5_000_000, 3_000_000], 1_000_000)
    dims = ModelDims(dim=8, n_head=2, num_chroms=2,
                     num_nodes=genome.num_nodes)
    chrom_sizes = [int(e - s) for s, e in genome.chrom_range]
    params = init_model(jax.random.PRNGKey(0), dims, chrom_sizes)
    save_model_bundle(str(tmp_path / "b"), params, dims, genome)
    p2, d2, g2, frozen = load_model_bundle(str(tmp_path / "b"))
    assert d2.dim == 8 and g2.num_nodes == genome.num_nodes
    assert frozen.inter_z.shape[0] == genome.num_nodes + 1
