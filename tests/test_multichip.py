"""Multi-chip SPMD tests on the virtual 8-device CPU mesh: the full sharded
training step must compile, run, and agree numerically with the single-device
path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from matcha_tpu.genome import GenomeBins
from matcha_tpu.models.hypersagnn import (ModelDims, build_frozen_tables,
                                          init_model)
from matcha_tpu.parallel.mesh import (batch_sharding, frozen_sharding,
                                      make_mesh, param_sharding)
from matcha_tpu.sampler.bloom import build_bloom_dict
from matcha_tpu.sampler.negative import ChromTable
from matcha_tpu.train.runtime import Trainer, TrainSettings

pytestmark = pytest.mark.multichip


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    genome = GenomeBins(["chr1", "chr2", "chr3"],
                        [30_000_000, 22_000_000, 15_000_000], 1_000_000)
    n = genome.num_nodes
    intra = rng.random((n, n)).astype(np.float32)
    intra = intra + intra.T
    inter = rng.random((n, n)).astype(np.float32)
    dims = ModelDims(dim=16, n_head=4, num_chroms=3, num_nodes=n)
    chrom_sizes = [int(e - s) for s, e in genome.chrom_range]
    params = init_model(jax.random.PRNGKey(0), dims, chrom_sizes)
    frozen = build_frozen_tables(genome, intra, inter)
    table = ChromTable.from_genome(genome)

    def buckets(seed, n_edges=256):
        r = np.random.default_rng(seed)
        out = {}
        for k in (2, 3):
            e = np.sort(r.choice(np.arange(1, n + 1), (n_edges, k)), axis=1)
            ok = (np.diff(e, axis=1) > 0).all(axis=1)
            e = e[ok]
            out[k] = (e.astype(np.int32),
                      r.random(len(e)).astype(np.float32) + 0.5)
        return out
    return genome, dims, params, frozen, table, buckets


def test_mesh_shapes():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(4, 2)
    assert mesh.shape == {"data": 4, "model": 2}


def test_sharded_step_runs_and_matches(problem):
    genome, dims, params, frozen, table, buckets = problem
    settings = TrainSettings(alpha=1.0, beta=0.001)
    train_b = buckets(1)
    blooms = build_bloom_dict({k: v[0] for k, v in train_b.items()})

    # single-device trainer — same n_shards as the mesh's data axis so the
    # shard-major stream layout (and with it the stream-level dropout-mask
    # RNG alignment) is identical; the layout itself is proven numerically
    # inert in tests/test_stream_sharding.py
    t1 = Trainer(params, frozen, dims, table,
                 settings._replace(n_shards=4), blooms, seed=7)
    # sharded trainer over a 4x2 (data x model) mesh
    mesh = make_mesh(4, 2)
    t2 = Trainer(params, frozen, dims, table, settings, blooms, seed=7,
                 mesh=mesh)

    from matcha_tpu.data.batcher import BucketedBatcher
    b1 = BucketedBatcher(train_b, batch_size=16, num_batch_per_iter=4, seed=3)
    b2 = BucketedBatcher(train_b, batch_size=16, num_batch_per_iter=4, seed=3)
    r1 = t1.train_epoch(b1)
    r2 = t2.train_epoch(b2)

    # same PRNG keys + same data -> identical training trajectory
    assert abs(r1["bce"] - r2["bce"]) < 1e-4
    assert abs(r1["recon"] - r2["recon"]) < 2e-3
    p1 = jax.device_get(t1.state.params)
    p2 = jax.device_get(t2.state.params)
    flat1 = jax.tree_util.tree_leaves(p1)
    flat2 = jax.tree_util.tree_leaves(p2)
    # summation-order differences (psum vs single-device reduce) get
    # amplified by Adam's normalization; bound the drift rather than demand
    # bitwise equality
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-4)


def test_sharding_placement(problem):
    from matcha_tpu.parallel.mesh import pad_frozen_for_mesh
    genome, dims, params, frozen, table, buckets = problem
    mesh = make_mesh(2, 4)
    p = jax.device_put(params, param_sharding(params, mesh))
    fp = pad_frozen_for_mesh(frozen, mesh)
    f = jax.device_put(fp, frozen_sharding(fp, mesh))
    # feature tables row-sharded over "model" (rows padded to multiple of 4)
    sh = f.features[0].sharding
    assert sh.spec == jax.sharding.PartitionSpec("model", None)
    assert f.features[0].shape[0] % 4 == 0
    assert f.inter_z.sharding.spec == jax.sharding.PartitionSpec("model", None)
    # trainable params replicated (DP); big tensors are the frozen tables
    assert p["embed"]["ae"][0]["w1"].sharding.is_fully_replicated
    assert p["encoder"]["mha"]["wq"].sharding.is_fully_replicated


def test_tensor_parallel_mode(problem):
    """Optional Megatron-style TP of the attention matmuls: placement is
    applied and the sharded step still trains."""
    genome, dims, params, frozen, table, buckets = problem
    mesh = make_mesh(2, 4)
    p = jax.device_put(params, param_sharding(params, mesh,
                                              tensor_parallel=True))
    assert p["encoder"]["mha"]["wq"].sharding.spec == (
        jax.sharding.PartitionSpec(None, "model"))
    assert p["encoder"]["mha"]["fc1"]["w"].sharding.spec == (
        jax.sharding.PartitionSpec("model", None))
    assert p["attr_nn"]["w"].sharding.is_fully_replicated

    t = Trainer(params, frozen, dims, table,
                TrainSettings(alpha=1.0, beta=0.001), None, mesh=mesh,
                tensor_parallel=True)
    from matcha_tpu.data.batcher import BucketedBatcher
    b = BucketedBatcher(buckets(5), batch_size=16, num_batch_per_iter=2)
    r = t.train_epoch(b)
    assert np.isfinite(r["bce"])


def test_kernel_wrap_on_mixed_mesh():
    """The Pallas shard_map wrapper (data_shard_map) shards the batch over
    BOTH axes of a mixed data x model mesh: forward output matches the
    unsharded fn and gradients of replicated inputs psum correctly across
    all 8 shards (VERDICT #9: the kernels keep working under a data=4,
    model=2 mesh instead of silently downgrading)."""
    from matcha_tpu.parallel.mesh import (active_data_mesh, data_shard_map,
                                          kernel_axes, kernel_batch_factor,
                                          using_active_mesh)
    mesh = make_mesh(4, 2)
    assert kernel_axes(mesh) == ("data", "model")
    assert kernel_batch_factor(mesh) == 8
    with using_active_mesh(mesh):
        assert active_data_mesh() is mesh
    pure = make_mesh(8, 1)
    assert kernel_axes(pure) == ("data",)
    assert kernel_batch_factor(pure) == 8

    x = jnp.arange(64.0).reshape(16, 4) / 64.0   # batch 16 over 8 shards
    w = jnp.arange(16.0).reshape(4, 4) / 10.0

    def fn(xx, ww):
        return jnp.tanh(xx @ ww)

    def loss_sharded(x, w):
        return jnp.sum(data_shard_map(fn, mesh, 1, 1)(x, w) ** 2)

    def loss_plain(x, w):
        return jnp.sum(fn(x, w) ** 2)

    v1, g1 = jax.jit(jax.value_and_grad(loss_sharded, argnums=(0, 1)))(x, w)
    v2, g2 = jax.value_and_grad(loss_plain, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               rtol=1e-5, atol=1e-5)
    # the replicated weight's gradient is psummed over all 8 shards
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               rtol=1e-5, atol=1e-5)


def test_tensor_parallel_warns_and_disables_kernels(problem):
    """Under TP the Pallas kernels are disabled (weights are model-sharded,
    violating the wrappers' replicated in_specs): Trainer warns at
    construction and installs no kernel mesh."""
    import warnings as _warnings
    genome, dims, params, frozen, table, buckets = problem
    mesh = make_mesh(4, 2)
    dims_p = dims._replace(use_pallas_attention=True)
    with _warnings.catch_warnings(record=True) as rec:
        _warnings.simplefilter("always")
        t = Trainer(params, frozen, dims_p, table,
                    TrainSettings(alpha=1.0, beta=0.001), None, mesh=mesh,
                    tensor_parallel=True)
    assert any("disables the Pallas kernels" in str(r.message) for r in rec)
    assert t._kernel_mesh is None
    # non-TP mixed mesh keeps the kernel mesh installed
    t2 = Trainer(params, frozen, dims, table,
                 TrainSettings(alpha=1.0, beta=0.001), None, mesh=mesh)
    assert t2._kernel_mesh is mesh


def test_eval_sharded(problem):
    genome, dims, params, frozen, table, buckets = problem
    settings = TrainSettings(alpha=1.0, beta=0.001)
    mesh = make_mesh(8, 1)
    t = Trainer(params, frozen, dims, table, settings, None, mesh=mesh)
    ev = t.eval_epoch(buckets(9), batch_size=16, max_samples=128)
    assert np.isfinite(ev["bce"])


@pytest.mark.slow
def test_run_train_config_mesh_and_table_dtype(tmp_path):
    """The config knobs mesh_data/mesh_model/table_dtype actually reach the
    Trainer: a 2x1 mesh + bf16 tables trains end-to-end through run_train."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from synth import make_synthetic_dataset, write_chrom_sizes
    from matcha_tpu.config import Config
    from matcha_tpu.pipeline import (run_generate_kmers, run_process,
                                     run_train)

    rng = np.random.default_rng(0)
    genome = GenomeBins(["chr1", "chr2"], [30_000_000, 20_000_000], 1_000_000)
    cl, mc = make_synthetic_dataset(tmp_path, genome, rng, n_clusters=2500)
    config = Config(
        cluster_path=cl, mcool_path=mc, resolution=1_000_000,
        chrom_list=genome.chrom_names,
        chrom_size=write_chrom_sizes(tmp_path, genome),
        temp_dir=str(tmp_path / "Temp"), max_cluster_size=25,
        min_distance=0, kmer_size=[2], min_freq_cutoff=2,
        quantile_cutoff_for_positive=0.6, quantile_cutoff_for_unlabel=0.4,
        embed_dim=16, n_head=4, batch_size=32, num_batch_per_iter=8,
        seed=1, mesh_data=2, mesh_model=1, table_dtype="bfloat16")
    run_process(config)
    run_generate_kmers(config)
    trainer, history, store = run_train(config, log=lambda *_: None,
                                        stage1_epochs=1, stage2_epochs=1)
    assert trainer.mesh is not None
    assert dict(trainer.mesh.shape) == {"data": 2, "model": 1}
    assert trainer.frozen.inter_z.dtype == jnp.bfloat16
    assert np.isfinite(history[-1]["valid"]["bce"])


def test_indexed_epoch_matches_host_on_mesh(problem):
    """Device-resident (indexed) epochs under a data mesh: pinned replicated
    base buckets + sharded on-device gathers produce the same trajectory as
    the host-staged path on the same mesh (VERDICT r3 #6)."""
    genome, dims, params, frozen, table, buckets = problem
    settings = TrainSettings(alpha=1.0, beta=0.001)
    train_b = buckets(21)
    blooms = build_bloom_dict({k: v[0] for k, v in train_b.items()})
    mesh = make_mesh(4, 2)

    from matcha_tpu.data.batcher import BucketedBatcher
    t1 = Trainer(params, frozen, dims, table, settings, blooms, seed=7,
                 mesh=mesh)
    t2 = Trainer(params, frozen, dims, table, settings, blooms, seed=7,
                 mesh=mesh)
    b1 = BucketedBatcher(train_b, batch_size=16, num_batch_per_iter=3, seed=3)
    b2 = BucketedBatcher(train_b, batch_size=16, num_batch_per_iter=3, seed=3)
    r1 = t1.train_epoch(b1)
    assert t2.pin_base_buckets(b2)
    r2 = t2.train_epoch_indexed(b2)
    assert abs(r1["bce"] - r2["bce"]) < 1e-6
    assert abs(r1["recon"] - r2["recon"]) < 1e-4
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(t1.state.params)),
                    jax.tree_util.tree_leaves(jax.device_get(t2.state.params))):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
