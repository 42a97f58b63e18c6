"""End-to-end pipeline entry points.

Library equivalents of the reference's five CLI scripts (ref Readme.md:45-64):

  run_process         <- python process.py        (ingest)
  run_generate_kmers  <- python generate_kmers.py (hyperedge generation)
  run_train           <- python main.py           (two-stage training)
  (apps/ holds denoise_contact / predict_multiway / plot_embedding)

Each stage reads/writes the same ``temp_dir`` artifact layout as the
reference, so the stages interoperate with reference-produced artifacts.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np

from matcha_tpu.config import Config
from matcha_tpu.data.clusters import load_edge_list, parse_clusters, save_edge_list
from matcha_tpu.data.kmers import generate_kmers
from matcha_tpu.data.mcool import load_contacts, parse_mcool_contacts, save_contacts
from matcha_tpu.data.store import HyperedgeStore
from matcha_tpu.genome import GenomeBins
from matcha_tpu.models.hypersagnn import (ModelDims, build_frozen_tables,
                                          init_model)
from matcha_tpu.sampler.bloom import build_bloom_dict
from matcha_tpu.sampler.negative import ChromTable
from matcha_tpu.train.runtime import (Trainer, TrainSettings,
                                      save_model_bundle)


# "auto" resolutions for the TPU perf knobs — one place, shared by run_train
# and bench.py so the benched system IS the shipped system (the round-2 gap:
# bench ran merged-stream bf16 with a persistent compile cache while the CLI
# ran hybrid f32 with none).  Values validated on real TPU hardware; see
# BASELINE.md "Round-3 TPU validation".
_AUTO_TPU = {"compute_dtype": "bfloat16", "token_stream": "merged",
             "propose_impl": "xla", "fuse_tail": "off", "prng_impl": "rbg"}
_AUTO_CPU = {"compute_dtype": "float32", "token_stream": "hybrid",
             "propose_impl": "xla", "fuse_tail": "off",
             "prng_impl": "threefry2x32"}


def resolve_perf(config: Config, *, apply: bool = True) -> dict:
    """Resolve the config's "auto" perf knobs for the current backend and
    (with ``apply``) install the process-global ones: persistent compile
    cache, default PRNG impl, fuse-tail gate, loop-runtime warmup."""
    on_tpu = jax.default_backend() != "cpu"
    auto = _AUTO_TPU if on_tpu else _AUTO_CPU
    r = {k: (auto[k] if getattr(config, k) == "auto" else getattr(config, k))
         for k in auto}
    r["use_pallas_attention"] = (on_tpu
                                 if config.use_pallas_attention == "auto"
                                 else config.use_pallas_attention == "on")
    if apply:
        from matcha_tpu.models.hypersagnn import configure_fuse_tail
        from matcha_tpu.utils import enable_compile_cache, warm_loop_runtime
        if on_tpu:
            # TPU compiles are the minutes-long ones worth caching; CPU AOT
            # entries are machine-feature-pinned and noisy across hosts
            enable_compile_cache(config.compile_cache_dir)
        jax.config.update("jax_default_prng_impl", r["prng_impl"])
        if config.fuse_tail != "auto" or "MATCHA_FUSE_TAIL" not in os.environ:
            # under "auto" an explicit MATCHA_FUSE_TAIL env (A/B scripts,
            # kernel validation) wins over the resolved default
            configure_fuse_tail(r["fuse_tail"] == "on")
        warm_loop_runtime()
    return r


def run_process(config: Config) -> GenomeBins:
    """Ingest: genome binning + cluster parse + mcool contacts -> temp_dir."""
    genome = GenomeBins.from_chrom_sizes_file(
        config.chrom_size, config.chrom_list, config.resolution)
    genome.save(config.temp_dir)
    flat, offsets = parse_clusters(config.cluster_path, genome,
                                   config.max_cluster_size)
    save_edge_list(config.temp_dir, flat, offsets,
                   ragged=config.ragged_edge_list)
    intra, inter = parse_mcool_contacts(config.mcool_path, genome)
    save_contacts(config.temp_dir, intra, inter)
    return genome


def run_generate_kmers(config: Config, *, shard_index: Optional[int] = None,
                       shard_count: Optional[int] = None) -> Dict:
    """k-mer generation.  With ``shard_index``/``shard_count`` set, counts
    only that shard's clusters and writes partial counters — run one shard
    per host (embarrassingly parallel), then ``run_merge_kmers``."""
    flat, offsets = load_edge_list(config.temp_dir)
    if shard_index is not None and shard_count is None:
        raise ValueError("--shard-index requires --shard-count (otherwise "
                         "every host would run the FULL unsharded pass and "
                         "race on the final artifacts)")
    if shard_count is not None:
        from matcha_tpu.data.kmers import generate_kmers_shard
        return generate_kmers_shard(
            flat, offsets, config.kmer_size,
            max_cluster_size=config.max_cluster_size,
            min_distance=config.min_distance,
            shard_index=int(shard_index or 0), shard_count=int(shard_count),
            temp_dir=config.temp_dir)
    return generate_kmers(
        flat, offsets, config.kmer_size,
        max_cluster_size=config.max_cluster_size,
        min_distance=config.min_distance,
        min_freq_cutoff=config.min_freq_cutoff, temp_dir=config.temp_dir)


def run_merge_kmers(config: Config, *, shard_count: int) -> Dict:
    """Merge per-shard partial counters into the final artifacts."""
    from matcha_tpu.data.kmers import merge_kmer_shards
    return merge_kmer_shards(
        config.kmer_size, shard_count=int(shard_count),
        temp_dir=config.temp_dir, min_freq_cutoff=config.min_freq_cutoff)


def run_train(config: Config, *, log=print,
              stage1_epochs: Optional[int] = None,
              stage2_epochs: Optional[int] = None,
              embeddings_path: Optional[str] = None,
              resume: bool = False):
    """Two-stage training (ref Code/main.py module body :516-685).

    resume: continue from the per-epoch resume snapshots in temp_dir
    (exact trajectory — params, optimizer, RNG key, epoch; a completed
    stage is skipped automatically because its snapshot is at its last
    epoch)."""
    temp_dir = config.temp_dir
    genome = GenomeBins.load(temp_dir)
    intra, inter = load_contacts(temp_dir)

    store = HyperedgeStore.from_temp_dir(
        temp_dir, config.kmer_size,
        quantile_cutoff_for_positive=config.quantile_cutoff_for_positive,
        quantile_cutoff_for_unlabel=config.quantile_cutoff_for_unlabel,
        neg_num=config.neg_num, seed=config.seed)
    log(f"train sizes: {store.train_sizes()}")

    perf = resolve_perf(config)
    dims = ModelDims(dim=config.embed_dim, n_head=config.n_head,
                     num_chroms=genome.num_chroms,
                     num_nodes=genome.num_nodes,
                     compute_dtype=perf["compute_dtype"],
                     use_pallas_attention=perf["use_pallas_attention"])
    chrom_sizes = [int(e - s) for s, e in genome.chrom_range]
    params = init_model(jax.random.PRNGKey(config.seed), dims, chrom_sizes)
    import jax.numpy as jnp
    table_dt = (jnp.bfloat16 if config.table_dtype == "bfloat16"
                else jnp.float32)
    frozen = build_frozen_tables(genome, intra, inter, table_dtype=table_dt)
    chrom_table = ChromTable.from_genome(genome)
    mesh = None
    n_mesh = int(config.mesh_data) * int(config.mesh_model)
    if n_mesh > 1:
        from matcha_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(int(config.mesh_data), int(config.mesh_model),
                         devices=jax.devices()[:n_mesh])
    ckpt = os.path.join(temp_dir, "model.chkpt")
    from matcha_tpu.train.logging import MetricsLogger
    mlog = MetricsLogger(os.path.join(temp_dir, "logs"), stdout=log)

    # ---- stage 1: reconstruction only (ref :637-643)
    s1 = TrainSettings(alpha=config.stage1_alpha, beta=config.stage1_beta,
                       neg_num=config.neg_num,
                       min_distance=config.min_distance,
                       max_trials=config.max_neg_trials,
                       learning_rate=config.learning_rate,
                       weight_decay=config.weight_decay,
                       token_stream=perf["token_stream"],
                       propose_impl=perf["propose_impl"])
    trainer = Trainer(params, frozen, dims, chrom_table, s1, blooms=None,
                      seed=config.seed, mesh=mesh)
    trainer.fit(store.train, store.test,
                epochs=stage1_epochs if stage1_epochs is not None
                else config.stage1_epochs,
                batch_size=config.batch_size,
                num_batch_per_iter=config.num_batch_per_iter,
                checkpoint_path=ckpt, log=log, seed=config.seed,
                metrics_logger=mlog, stage="stage1_recon",
                resume_path=os.path.join(temp_dir, "resume_stage1"),
                resume=resume)

    # ---- between stages: Bloom filters from the unlabeled set (ref :646-667)
    blooms = build_bloom_dict(store.unlabeled,
                              error_rate=config.bloom_error_rate)
    log("built Bloom filters: "
        + str({k: f.m_bits for k, f in blooms.items()}))

    # ---- stage 2: classification (fresh AdamW, ref :671-679)
    s2 = s1._replace(alpha=config.stage2_alpha, beta=config.stage2_beta)
    trainer2 = Trainer(trainer.state.params, frozen, dims, chrom_table, s2,
                       blooms=blooms, seed=config.seed + 1, mesh=mesh)
    history = trainer2.fit(
        store.train, store.test,
        epochs=stage2_epochs if stage2_epochs is not None
        else config.stage2_epochs,
        batch_size=config.batch_size,
        num_batch_per_iter=config.num_batch_per_iter,
        checkpoint_path=ckpt, log=log, seed=config.seed + 1,
        metrics_logger=mlog, stage="stage2_classify",
        resume_path=os.path.join(temp_dir, "resume_stage2"),
        resume=resume)

    # ---- export artifacts (ref :681-685)
    if embeddings_path is None:
        embeddings_path = os.path.join(os.path.dirname(
            os.path.abspath(temp_dir)), "embeddings.npy")
    trainer2.export_embeddings(embeddings_path)
    save_model_bundle(os.path.join(temp_dir, "model2load"),
                      trainer2.state.params, dims, genome, intra, inter)
    return trainer2, history, store


def run_pretrain(config: Config, *, walk_mode: str = "hyper",
                 output: Optional[str] = None, log=print) -> np.ndarray:
    """Walk + skip-gram node-embedding pretraining over the parsed clusters
    (the legacy walk path, ref History_version/Code/main_SPRITE.py:640-765).
    Writes ``walk_embeddings.npy``; feed it to
    ``init_model(embedding_mode="table", table_init=...)``."""
    from matcha_tpu.data.clusters import clusters_to_list
    from matcha_tpu.walks.pretrain import pretrain_node_embeddings
    genome = GenomeBins.load(config.temp_dir)
    flat, offsets = load_edge_list(config.temp_dir)
    edges = clusters_to_list(flat, offsets)
    emb, losses = pretrain_node_embeddings(
        genome.num_nodes, edges, config.embed_dim, walk_mode=walk_mode,
        seed=config.seed)
    log(f"skip-gram losses per epoch: {losses}")
    if output is None:
        output = os.path.join(config.temp_dir, "walk_embeddings.npy")
    np.save(output, emb)
    return emb


def main(argv=None):
    import argparse
    from matcha_tpu.config import load_config
    p = argparse.ArgumentParser(prog="matcha_tpu",
                                description="TPU-native MATCHA pipeline")
    p.add_argument("stage",
                   choices=["process", "kmers", "kmers-merge", "train",
                            "pretrain", "all"])
    p.add_argument("-c", "--config", default=None, help="config.JSON path")
    p.add_argument("--walk-mode", choices=["hyper", "clique"],
                   default="hyper")
    p.add_argument("--shard-index", type=int, default=None,
                   help="kmers: this host's shard (0-based)")
    p.add_argument("--shard-count", type=int, default=None,
                   help="kmers/kmers-merge: total shards")
    p.add_argument("--resume", action="store_true",
                   help="train: continue from the per-epoch resume "
                        "snapshots in temp_dir (exact trajectory)")
    args = p.parse_args(argv)
    if (args.shard_index is not None or args.shard_count is not None) \
            and args.stage not in ("kmers", "kmers-merge"):
        # 'all' would write only partial counters then train against
        # missing/stale merged artifacts
        p.error("--shard-index/--shard-count apply only to the 'kmers' and "
                "'kmers-merge' stages")
    config = load_config(args.config)
    if args.stage in ("process", "all"):
        run_process(config)
    if args.stage in ("kmers", "all"):
        run_generate_kmers(config, shard_index=args.shard_index,
                           shard_count=args.shard_count)
    if args.stage == "kmers-merge":
        if args.shard_count is None:
            p.error("kmers-merge requires --shard-count")
        run_merge_kmers(config, shard_count=args.shard_count)
    if args.stage == "pretrain":
        run_pretrain(config, walk_mode=args.walk_mode)
    if args.stage in ("train", "all"):
        run_train(config, resume=args.resume)


if __name__ == "__main__":
    main()
