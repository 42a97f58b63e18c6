"""matcha_tpu — a TPU-native hypergraph representation-learning framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of ma-compbio/MATCHA
(Zhang & Ma, Cell Systems 2020): genome binning, SPRITE/ChIA-Drop cluster ingest,
k-mer hyperedge enumeration, Hyper-SAGNN-style hyperedge classification with
on-device negative sampling, contact-map denoising and multi-way prediction.

Layer map (mirrors SURVEY.md §7):
  config      — config system (parity with reference Code/config.JSON)
  genome      — genome binning / node dictionary (ref: Code/process.py:10-39)
  data/       — cluster parse, mcool ingest, k-mer generation, hyperedge store
  sampler/    — device Bloom filter + batched rejection negative sampler
  models/     — Hyper-SAGNN model family as pure-pytree functional modules
  train/      — two-stage jitted training runtime, metrics, checkpointing
  parallel/   — jax.sharding Mesh / pjit multi-chip layer
  ops/        — segment/incidence ops and Pallas kernels
  apps/       — denoise_contact, predict_multiway, plot_embedding
  walks/      — random-walk + skip-gram pretraining subsystem (legacy parity)
"""

__version__ = "0.1.0"

from matcha_tpu.config import Config, load_config  # noqa: F401
