"""A/B microbench of the fused attention kernels at bench shapes (VERDICT
r3 #3: attention backward is the largest step term, self-diagnosed as
vector-issue-bound with scheduling headroom).

Times hyperedge_attention fwd and fwd+bwd per L in {3,4,5} at the bench
edge count, sweeping the backward block size (via monkeypatching
_bwd_block_edges_fm) and the scoped-VMEM window, so kernel scheduling
experiments get a measured verdict in minutes.

Usage: python scripts/bench_attention_kernel.py [--edges 8192] [--dtype bf16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/matcha_jax_cache")

from matcha_tpu.ops import hyperedge_attention as ha

D = 64
H = 8


def timeit(f, *args, n=50):
    """Device-resident loop: n dependent iterations inside ONE jitted scan
    (per-call dispatch over the tunneled chip is ~1 ms, 5-10x the kernel
    itself; chaining outputs into inputs also defeats DCE)."""
    @jax.jit
    def loop(x0, rest):
        def body(x, _):
            y = f(x, *rest)
            # feed output back as next input (same shape/dtype by design)
            return y, ()
        out, _ = jax.lax.scan(body, x0, None, length=n)
        return out

    rest = args[1:]
    jax.block_until_ready(loop(args[0], rest))
    t0 = time.time()
    jax.block_until_ready(loop(args[0], rest))
    return (time.time() - t0) / n * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=8192)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--be", type=int, nargs="*", default=[256, 512, 1024])
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    ln = jnp.asarray(rng.standard_normal((6, D)), jnp.float32)
    wq = jnp.asarray(rng.standard_normal((D, H * D)) * 0.1, jnp.float32)
    wk = jnp.asarray(rng.standard_normal((D, H * D)) * 0.1, jnp.float32)
    wv = jnp.asarray(rng.standard_normal((D, H * D)) * 0.1, jnp.float32)
    fw = jnp.asarray(rng.standard_normal((H * D, D)) * 0.05, jnp.float32)
    fb = jnp.asarray(rng.standard_normal((D,)), jnp.float32)

    E = args.edges

    def make_fns(L):
        x = jnp.asarray(rng.standard_normal((E, L, D)), dt)
        g = jnp.asarray(rng.standard_normal((E, L, D)), dt)

        def fwd(x):
            return ha.hyperedge_attention(x, ln, wq, wk, wv, fw, fb, H,
                                          True, True)

        def fwdbwd(x, g):
            y, vjp = jax.vjp(lambda xx: fwd(xx), x)
            return vjp(g)[0]

        return x, g, fwd, fwdbwd

    orig = ha._bwd_block_edges_fm
    print(f"E={E} dtype={args.dtype}  (ms per call, {args.reps} reps)")
    for be_force in args.be:
        ha._bwd_block_edges_fm = (orig if be_force == 0 else
                                  (lambda E_, d_, L_, hd_: be_force))
        row = [f"be={be_force or 'auto'}"]
        tot_f = tot_b = 0.0
        for L in (3, 4, 5):
            if E % max(be_force, 1):
                row.append(f"L={L}: skip")
                continue
            x, g, fwd, fwdbwd = make_fns(L)
            tf = timeit(fwd, x, n=args.reps)
            tb = timeit(fwdbwd, x, g, n=args.reps)
            tot_f += tf
            tot_b += tb - tf
            row.append(f"L={L}: fwd {tf:.3f} bwd {tb - tf:.3f}")
        row.append(f"| total fwd {tot_f:.3f} bwd {tot_b:.3f}")
        print("  " + "  ".join(row))
    ha._bwd_block_edges_fm = orig


if __name__ == "__main__":
    main()
