"""Microbenchmarks of the training step's building blocks on the real chip.

Pinpoints where the ~90 ms fwd+bwd goes: table gather + scatter-add grad,
dropout RNG, tiny-k attention, and the projection matmuls.
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

N_NODES = 3097
TOKENS = 229_376          # 4 buckets x 16384 x mean k
D = 64
H = 8


def timeit(f, *args, n=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1000


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(1, N_NODES, TOKENS, dtype=np.int32))
    table = jnp.asarray(rng.standard_normal((N_NODES, D)), dtype=jnp.float32)
    g = jnp.asarray(rng.standard_normal((TOKENS, D)), dtype=jnp.float32)
    key = jax.random.PRNGKey(0)

    gather = jax.jit(lambda t, i: t[i])
    print(f"gather ({TOKENS}x{D} from {N_NODES}): "
          f"{timeit(gather, table, x):.2f} ms")

    scatter_grad = jax.jit(jax.grad(lambda t: jnp.vdot(t[x], g)))
    print(f"gather+scatter-add grad:             "
          f"{timeit(scatter_grad, table):.2f} ms")

    seg = jax.jit(lambda gg: jax.ops.segment_sum(gg, x, num_segments=N_NODES))
    print(f"segment_sum equivalent:              {timeit(seg, g):.2f} ms")

    drop = jax.jit(lambda k: jax.random.bernoulli(k, 0.7, (TOKENS, D)))
    print(f"dropout mask threefry ({TOKENS}x{D}):  "
          f"{timeit(drop, key):.2f} ms")

    B = 16384 * 4
    qh = jnp.asarray(rng.standard_normal((B, H, 5, D)), jnp.float32)
    vh = jnp.asarray(rng.standard_normal((B, H, 5, D)), jnp.float32)

    def attn(q, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, q,
                       preferred_element_type=jnp.float32)
        a = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", a, v,
                          preferred_element_type=jnp.float32)
    attn_j = jax.jit(attn)
    print(f"attention k=5 fwd ({B} edges):        "
          f"{timeit(attn_j, qh, vh):.2f} ms")
    attn_g = jax.jit(jax.grad(lambda q, v: attn(q, v).sum(), argnums=(0, 1)))
    print(f"attention k=5 fwd+bwd:                "
          f"{timeit(attn_g, qh, vh):.2f} ms")

    xt = jnp.asarray(rng.standard_normal((TOKENS, D)), jnp.float32)
    w3 = jnp.asarray(rng.standard_normal((D, 3 * H * D)) * 0.05, jnp.float32)

    def proj(a, w):
        return a @ w
    proj_j = jax.jit(proj)
    print(f"qkv projection fwd ({TOKENS}x{D}x{3*H*D}): "
          f"{timeit(proj_j, xt, w3):.2f} ms")
    proj_g = jax.jit(jax.grad(lambda a, w: (a @ w).sum(), argnums=(0, 1)))
    print(f"qkv projection fwd+bwd:               "
          f"{timeit(proj_g, xt, w3):.2f} ms")

    # adamw update on ~1.6M params
    import optax
    opt = optax.adamw(1e-3)
    params = {"a": jnp.asarray(rng.standard_normal((1_600_000,)), jnp.float32)}
    st = opt.init(params)
    upd = jax.jit(lambda p, s: opt.update({"a": p["a"] * 1e-4}, s, p))
    print(f"adamw update 1.6M params:             {timeit(upd, params, st):.2f} ms")


if __name__ == "__main__":
    main()
