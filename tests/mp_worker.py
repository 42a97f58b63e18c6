"""Worker process for the multi-process (multi-controller) training test.

Usage: python mp_worker.py OUT COORD NPROC PID LOCAL_DEVICES

Each OS process owns LOCAL_DEVICES virtual CPU devices; with NPROC > 1 they
join via jax.distributed into one global runtime of NPROC*LOCAL_DEVICES
devices (the standard JAX multi-controller CPU test harness, SURVEY §4).
Runs two training epochs + one eval of the same deterministic problem and
dumps the trajectory to OUT.PID so the test can compare single-process vs
multi-process runs.
"""

import json
import os
import sys


def build_and_train():
    import numpy as np
    import jax
    from matcha_tpu.data.batcher import BucketedBatcher
    from matcha_tpu.genome import GenomeBins
    from matcha_tpu.models.hypersagnn import (ModelDims, build_frozen_tables,
                                              init_model)
    from matcha_tpu.parallel.mesh import make_mesh
    from matcha_tpu.sampler.bloom import build_bloom_dict
    from matcha_tpu.sampler.negative import ChromTable
    from matcha_tpu.train.runtime import Trainer, TrainSettings

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
            e = e[(np.diff(e, axis=1) > 0).all(axis=1)]
            out[k] = (e.astype(np.int32),
                      r.random(len(e)).astype(np.float32) + 0.5)
        return out

    train_b = buckets(1)
    blooms = build_bloom_dict({k: v[0] for k, v in train_b.items()})
    mesh = make_mesh(n_data=len(jax.devices()) // 2, n_model=2)
    trainer = Trainer(params, frozen, dims, table,
                      TrainSettings(alpha=1.0, beta=0.001), blooms,
                      seed=7, mesh=mesh)
    batcher = BucketedBatcher(train_b, batch_size=16, num_batch_per_iter=4,
                              seed=3)
    hist = []
    for _ in range(2):
        r = trainer.train_epoch(batcher)
        hist.append([r["bce"], r["recon"]])
    ev = trainer.eval_epoch(buckets(9), batch_size=16, max_samples=64)
    leaves = jax.tree_util.tree_leaves(jax.device_get(trainer.state.params))
    checksum = float(sum(np.abs(l).astype(np.float64).sum() for l in leaves))
    return {"hist": hist, "eval_bce": float(ev["bce"]),
            "checksum": checksum,
            "process_count": jax.process_count(),
            "devices": len(jax.devices()),
            "mesh": dict(mesh.shape)}


def main():
    out, coord, nproc, pid, local_devices = sys.argv[1:6]
    nproc, pid, local_devices = int(nproc), int(pid), int(local_devices)
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count={local_devices}"
    ).strip()
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    if nproc > 1:
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=nproc, process_id=pid)
    result = build_and_train()
    with open(f"{out}.{pid}", "w") as f:
        json.dump(result, f)
    print("worker", pid, "done:", result["hist"])


if __name__ == "__main__":
    main()
