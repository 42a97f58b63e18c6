"""Real-TPU validation for the fused classifier-tail kernel
(ops/fused_tail.py) — everything interpret mode cannot check:

1. Mosaic compile + eval-mode numerics vs the XLA chain (exact-ish).
2. Train-mode determinism: same seed -> bit-identical output (pins the
   fwd/bwd PRNG mask regeneration contract).
3. Train-mode finite-difference gradient check: with the in-kernel PRNG
   the function IS deterministic per seed, so central differences are a
   valid oracle for the hand-written backward (small T, a few probes).
4. Dropout statistics: keep rates and inverted-dropout scaling.
5. bench.py A/B: MATCHA_FUSE_TAIL=0 vs 1 at the bench workload.

Run (TPU):  python scripts/validate_fused_tail_tpu.py [--skip-bench]
"""

import argparse
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-bench", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from matcha_tpu.models.modules import layer_norm, pff
    from matcha_tpu.ops.fused_tail import BT, fused_tail

    assert jax.default_backend() != "cpu", "this script needs real TPU"
    D, T = 64, 2 * BT
    rng = np.random.default_rng(0)

    def ln():
        return {"g": jnp.asarray(rng.standard_normal(D) * 0.1 + 1.0,
                                 jnp.float32),
                "b": jnp.asarray(rng.standard_normal(D) * 0.1, jnp.float32)}
    pn = {"layers": [
        {"w": jnp.asarray(rng.standard_normal((D, D)) * 0.1, jnp.float32),
         "b": jnp.asarray(rng.standard_normal(D) * 0.1, jnp.float32)},
        {"w": jnp.asarray(rng.standard_normal((D, D)) * 0.1, jnp.float32),
         "b": jnp.asarray(rng.standard_normal(D) * 0.1, jnp.float32)},
    ], "ln": ln()}
    ln_dyn, ln_st = ln(), ln()
    cl = {"w": jnp.asarray(rng.standard_normal((D, 1)) * 0.3, jnp.float32),
          "b": jnp.asarray(rng.standard_normal(1) * 0.1, jnp.float32)}
    y = jnp.asarray(rng.standard_normal((T, D)), jnp.float32)
    h = jnp.asarray(rng.standard_normal((T, D)), jnp.float32)
    ln6 = jnp.stack([pn["ln"]["g"], pn["ln"]["b"], ln_dyn["g"], ln_dyn["b"],
                     ln_st["g"], ln_st["b"]])
    base = (y, h, ln6, pn["layers"][0]["w"], pn["layers"][0]["b"],
            pn["layers"][1]["w"], pn["layers"][1]["b"], cl["w"], cl["b"])

    # 1. eval numerics vs XLA
    dyn = pff(pn, y, residual=True)
    ref = ((layer_norm(ln_dyn, dyn) - layer_norm(ln_st, h)) ** 2
           @ cl["w"] + cl["b"])
    got = fused_tail(*base, jnp.zeros((), jnp.int32), 0.3, 0.4, False)
    err = float(jnp.max(jnp.abs(got - ref)))
    print(f"[1] eval max|err| vs XLA: {err:.2e}")
    assert err < 1e-4, err

    # 2. train determinism
    seed = jnp.asarray(123, jnp.int32)
    o1 = fused_tail(*base, seed, 0.3, 0.4, True)
    o2 = fused_tail(*base, seed, 0.3, 0.4, True)
    same = bool(jnp.all(o1 == o2))
    o3 = fused_tail(*base, seed + 1, 0.3, 0.4, True)
    diff = bool(jnp.any(o1 != o3))
    print(f"[2] same-seed identical: {same}; different-seed differs: {diff}")
    assert same and diff

    # 3a. eval-mode gradient check vs XLA autodiff of the equivalent jnp
    # chain — a far stronger oracle than finite differences (a central
    # difference of the f32 SUM of 1024 logits has rounding noise the
    # same order as eps*grad; that false-failed the first hardware run).
    gvec = jnp.asarray(rng.standard_normal((T, 1)), jnp.float32)

    def chain(y_, h_, ln6_, w1_, b1_, w2_, b2_, wc_, bc_):
        a1 = y_ @ w1_ + b1_
        o = jnp.tanh(a1) @ w2_ + b2_ + y_
        dd = layer_norm({"g": ln6_[0], "b": ln6_[1]}, o)
        d = (layer_norm({"g": ln6_[2], "b": ln6_[3]}, dd)
             - layer_norm({"g": ln6_[4], "b": ln6_[5]}, h_))
        return jnp.sum((d * d @ wc_ + bc_) * gvec)

    def fused_eval(*a):
        return jnp.sum(fused_tail(*a, seed, 0.3, 0.4, False) * gvec)

    ga = jax.jit(jax.grad(chain, argnums=tuple(range(9))))(*base)
    gb = jax.jit(jax.grad(fused_eval, argnums=tuple(range(9))))(*base)
    worst = 0.0
    for name, a_, b_ in zip(
            ("gy", "gh", "gln", "gw1", "gb1", "gw2", "gb2", "gwc", "gbc"),
            ga, gb):
        rel = float(jnp.max(jnp.abs(a_ - b_)) / (jnp.max(jnp.abs(a_)) + 1e-9))
        worst = max(worst, rel)
    print(f"[3a] eval grads vs XLA autodiff, worst rel err: {worst:.2e}")
    assert worst < 1e-3, worst

    # 3b. train-mode gradient check.  Finite differences are ALSO invalid
    # here: the MXU rounds f32 dot operands to bf16 (1 pass), so an eps
    # perturbation is quantized to bf16 ulps through every matmul path
    # (measured: eval-mode per-position FD reads rel err ~5 even though
    # eval autodiff matches XLA to 1.5e-4).  Instead, EXTRACT the
    # in-kernel dropout masks exactly — a dropped coordinate has exactly
    # zero influence, so bit-equality of per-position logits under a
    # large input perturbation reads the mask — then inject them into the
    # jnp chain and compare full autodiff.  Same seed + same shapes ->
    # the kernel draws the same mask bits in every one of these calls.
    def pp_train(y_, ln6_, w1_, b1_, w2_, b2_, wc_, bc_):
        return fused_tail(y_, h, ln6_, w1_, b1_, w2_, b2_, wc_, bc_,
                          seed, 0.3, 0.4, True)

    pp_jit = jax.jit(pp_train)
    args0 = (y, ln6, *base[3:])
    p0 = pp_jit(*args0)
    m0 = np.zeros((T, D), bool)
    m1 = np.zeros((T, D), bool)
    for j in range(D):
        # m0: y[:, j] += 0.5 changes row i iff m0[i, j] kept (residual
        # path is f32; a kept coordinate moves pp far above ulp scale)
        pj = pp_jit(y.at[:, j].add(0.5), ln6, *base[3:])
        m0[:, j] = np.asarray(pj != p0).ravel()
        # m1: with w1 = 0, a1 = b1 is constant, so b1[j] += 0.5 changes
        # row i iff m1[i, j] kept (tanh far from saturation at |b1|<1)
        pj = pp_jit(y, ln6, jnp.zeros_like(base[3]), base[4] + 0.5 *
                    (jnp.arange(D) == j), *base[5:])
        pr = pp_jit(y, ln6, jnp.zeros_like(base[3]), *base[4:])
        m1[:, j] = np.asarray(pj != pr).ravel()
    keep0, keep1 = m0.mean(), m1.mean()
    print(f"[3b] extracted mask keep rates: m0 {keep0:.3f} (exp 0.70), "
          f"m1 {keep1:.3f} (exp 0.60)")
    assert abs(keep0 - 0.7) < 0.02 and abs(keep1 - 0.6) < 0.02

    # m1 was extracted with w1=0, a different weight config than the
    # gradient call below; mask bits depend only on (seed, shapes, call
    # order), which are identical, so the same masks apply there.
    m0j = jnp.asarray(m0, jnp.float32) / 0.7
    m1j = jnp.asarray(m1, jnp.float32) / 0.6

    def chain_train(y_, h_, ln6_, w1_, b1_, w2_, b2_, wc_, bc_):
        d0 = y_ * m0j
        a1 = d0 @ w1_ + b1_
        o = (jnp.tanh(a1) * m1j) @ w2_ + b2_ + d0
        dd = layer_norm({"g": ln6_[0], "b": ln6_[1]}, o)
        d = (layer_norm({"g": ln6_[2], "b": ln6_[3]}, dd)
             - layer_norm({"g": ln6_[4], "b": ln6_[5]}, h_))
        return jnp.sum((d * d @ wc_ + bc_) * gvec)

    def fused_train(*a):
        return jnp.sum(fused_tail(*a, seed, 0.3, 0.4, True) * gvec)

    ga = jax.jit(jax.grad(chain_train, argnums=tuple(range(9))))(*base)
    gb = jax.jit(jax.grad(fused_train, argnums=tuple(range(9))))(*base)
    worst = 0.0
    for name, a_, b_ in zip(
            ("gy", "gh", "gln", "gw1", "gb1", "gw2", "gb2", "gwc", "gbc"),
            ga, gb):
        rel = float(jnp.max(jnp.abs(a_ - b_)) / (jnp.max(jnp.abs(a_)) + 1e-9))
        worst = max(worst, rel)
    print(f"[3b] train grads vs XLA autodiff w/ extracted masks, "
          f"worst rel err: {worst:.2e}")
    assert worst < 1e-3, worst

    # 4. dropout statistics: r0 zeroes ~30% of d0's contribution.  Measure
    # via the pp variance proxy instead: run many seeds, check mean output
    # of a LINEAR probe of d0.  Simpler: keep-rate of the first mask via a
    # crafted input is overkill — rely on [2]+[3] for mask correctness and
    # check only that train-mode output differs from eval (dropout active).
    active = bool(jnp.any(o1 != got))
    print(f"[4] train-mode dropout active (train != eval): {active}")
    assert active

    if args.skip_bench:
        print("validation OK (bench skipped)")
        return

    # 5. bench A/B
    env = dict(os.environ)
    for flag in ("0", "1"):
        env["MATCHA_FUSE_TAIL"] = flag
        t0 = time.time()
        out = subprocess.run([sys.executable,
                              os.path.join(HERE, "..", "bench.py")],
                             env=env, capture_output=True, text=True)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        print(f"[5] MATCHA_FUSE_TAIL={flag}: "
              f"{line[-1] if line else out.stdout[-200:]} "
              f"({time.time() - t0:.0f}s)")
    print("validation OK")


if __name__ == "__main__":
    main()
