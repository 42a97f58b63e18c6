"""Logit/loss drift of the bf16 recon decode (VERDICT r4 #6 judge harness).

Measures, at the full 100 kb geometry (30,344 nodes, F up to 2,490), the
drift between the f32 recon decode chain and the bf16-operand /
f32-accumulate variant (MATCHA_RECON_BF16): recon loss value both ways for
every chromosome draw, plus the gradient of loss wrt params (cosine / max
rel leaf diff) on one draw.  The training loss is alpha*bce + beta*recon
with beta=1e-3 in stage 2 (ref Code/main.py:671-679), so recon drift is
further attenuated 1000x in the total loss.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/matcha_jax_cache")


def main():
    import json
    from bench_100kb import build_frozen_synthetic, HG38
    from matcha_tpu.genome import GenomeBins
    import matcha_tpu.models.hypersagnn as hs

    names = [f"chr{i+1}" for i in range(22)] + ["chrX"]
    genome = GenomeBins(names, HG38, 100_000)
    n = genome.num_nodes
    dims = hs.ModelDims(dim=64, n_head=8, num_chroms=23, num_nodes=n,
                        compute_dtype="bfloat16")
    chrom_sizes = [int(e - s) for s, e in genome.chrom_range]
    params = hs.init_model(jax.random.PRNGKey(0), dims, chrom_sizes)
    frozen = build_frozen_synthetic(genome, jnp.bfloat16)
    table = hs.encode_node_table(params, frozen, dims)
    rng = np.random.default_rng(0)
    flat = jnp.asarray(rng.integers(1, n + 1, size=32768), jnp.int32)

    # frozen/table/flat must be jit ARGUMENTS: closed-over device arrays
    # are baked into the executable as constants, and the 1.9 GB inter_z
    # then rides the tunnel's remote_compile payload — which reproducibly
    # breaks the pipe (three dead runs before this form)
    def loss_fn(p, fr, fl, tab, r):
        return hs.recon_loss_node(p, fr, dims, fl, tab, r)

    # ONE small jitted program per mode (r traced), 23 async dispatches,
    # a single batched fetch (the naive per-call float() loop cost 46
    # tunnel round trips, >30 min)
    out = {"per_chrom_rel": []}
    vals = {}
    for mode in (False, True):
        hs._RECON_BF16 = mode
        f = jax.jit(loss_fn)
        pend = [f(params, frozen, flat, table, r)
                for r in range(dims.num_chroms)]
        vals[mode] = np.asarray(jax.device_get(pend), np.float64)
        print(f"# losses mode={mode} done", file=sys.stderr)
    rel = [abs(a - b) / max(abs(a), 1e-12)
           for a, b in zip(vals[False], vals[True])]
    out["per_chrom_rel"] = [round(r, 6) for r in rel]
    out["max_rel_loss_drift"] = max(rel)

    # gradient drift on one draw (r=0), wrt the decoder + AE params
    grads = {}
    for mode in (False, True):
        hs._RECON_BF16 = mode
        g = jax.jit(jax.grad(loss_fn))(params, frozen, flat, table, 0)
        grads[mode] = jax.device_get(g)
        print(f"# grads mode={mode} done", file=sys.stderr)
    num = den_a = den_b = 0.0
    max_leaf_rel = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(grads[False]),
                    jax.tree_util.tree_leaves(grads[True])):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        num += float(a @ b)
        den_a += float(a @ a)
        den_b += float(b @ b)
        na = np.abs(a).max()
        if na > 0:
            max_leaf_rel = max(max_leaf_rel,
                               float(np.abs(a - b).max() / na))
    out["grad_cosine"] = num / max(np.sqrt(den_a * den_b), 1e-30)
    out["grad_max_leaf_rel"] = max_leaf_rel
    print(json.dumps(out))


if __name__ == "__main__":
    main()
