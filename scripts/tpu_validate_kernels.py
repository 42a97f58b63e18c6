"""One-shot real-TPU validation + A/B for the round-2 opt-in kernels.

Runs, in order (each phase independent; failures reported, not fatal):
  1. fused classifier tail: scripts/validate_fused_tail_tpu.py semantics
     (imported and called with --skip-bench behavior)
  2. fused proposal kernel: Mosaic compile + bit-equality vs the jnp
     mirror on device, across k=2..5 at bench-shaped n
  3. bench.py A/B matrix over MATCHA_FUSE_TAIL x MATCHA_PROPOSE

Usage (TPU): python scripts/tpu_validate_kernels.py [--skip-bench]
"""

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))


def phase1_fused_tail():
    cmd = [sys.executable, os.path.join(HERE, "validate_fused_tail_tpu.py"),
           "--skip-bench"]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    print(out.stdout)
    if out.returncode != 0:
        print(out.stderr[-2000:])
    return out.returncode == 0


def phase2_propose():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from matcha_tpu.ops.propose import propose_phase1, propose_phase1_ref

    assert jax.default_backend() != "cpu", "needs real TPU"
    rng = np.random.default_rng(0)
    ok = True
    for k in (2, 3, 4, 5):
        n, T, S = 12288, 8, (4 if k == 2 else 2)
        orig = np.sort(rng.integers(1, 3000, size=(n, k)), axis=1)
        change = (rng.random((n, k)) < 0.5)
        change[np.arange(n), rng.integers(0, k, n)] = True
        lo = np.ones((n, k), np.float32)
        hi = np.full((n, k), 3000.0, np.float32)
        u = rng.random((T, k, n), dtype=np.float32)
        args = (jnp.asarray(orig.T.astype(np.int32)),
                jnp.asarray(change.T.astype(np.int32)),
                jnp.asarray(lo.T), jnp.asarray(hi.T), jnp.asarray(u))
        pk, hk = propose_phase1(*args, min_distance=0, max_probes=S,
                                interpret=False)
        pr, hr = propose_phase1_ref(*args, min_distance=0, max_probes=S)
        eq = (bool(jnp.all(pk == pr)) and bool(jnp.all(hk == hr)))
        print(f"[propose] k={k}: kernel==mirror on TPU: {eq}")
        ok = ok and eq
    return ok


def phase3_bench(script="bench.py", label="bench"):
    results = {}
    for fuse, prop in (("0", "xla"), ("1", "xla"), ("0", "pallas"),
                       ("1", "pallas")):
        env = dict(os.environ)
        env["MATCHA_FUSE_TAIL"] = fuse
        env["MATCHA_PROPOSE"] = prop
        t0 = time.time()
        path = (os.path.join(HERE, "..", script) if script == "bench.py"
                else os.path.join(HERE, script))
        out = subprocess.run([sys.executable, path], env=env,
                             capture_output=True, text=True, timeout=3600)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        val = json.loads(line[-1])["value"] if line else None
        results[(fuse, prop)] = val
        print(f"[{label}] FUSE_TAIL={fuse} PROPOSE={prop}: "
              f"{val and f'{val:,.0f} he/s'} ({time.time() - t0:.0f}s)")
        if not line:
            print(out.stderr[-1500:])
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-bench", action="store_true")
    ap.add_argument("--only", choices=["tail", "propose", "bench", "bench100"])
    args = ap.parse_args()
    if args.only in (None, "tail"):
        print("=== phase 1: fused classifier tail ===")
        print("OK" if phase1_fused_tail() else "FAILED")
    if args.only in (None, "propose"):
        print("=== phase 2: fused proposal kernel ===")
        print("OK" if phase2_propose() else "FAILED")
    if not args.skip_bench and args.only in (None, "bench"):
        print("=== phase 3: bench A/B (1 Mb) ===")
        phase3_bench()
    if not args.skip_bench and args.only in (None, "bench100"):
        print("=== phase 4: bench A/B (100 kb) ===")
        phase3_bench(script="bench_100kb.py", label="bench100")


if __name__ == "__main__":
    main()
