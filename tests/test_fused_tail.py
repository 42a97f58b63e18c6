"""ops/fused_tail.py: the fused dropout->pff_n1->LayerNorms->(dyn-static)^2
->classifier kernel, in interpret mode on CPU.

Eval-mode numerics + gradients are pinned EXACTLY against the XLA reference
chain (the model's own modules).  Train-mode dropout uses the in-kernel TPU
PRNG, which interpret mode cannot run — those paths are validated on real
TPU (determinism + finite-difference gradient checks; see the module
docstring)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from matcha_tpu.models.modules import layer_norm, pff
from matcha_tpu.ops.fused_tail import BT, fused_tail

D = 64


def _params(rng):
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
    cl = {"w": jnp.asarray(rng.standard_normal((D, 1)) * 0.3, jnp.float32),
          "b": jnp.asarray(rng.standard_normal(1) * 0.1, jnp.float32)}
    return pn, ln(), ln(), cl


def _xla_chain(y, h, pn, ln_dyn, ln_st, cl):
    dyn = pff(pn, y, residual=True)                     # eval: no dropout
    dynamic = layer_norm(ln_dyn, dyn)
    static = layer_norm(ln_st, h)
    out = (dynamic - static) ** 2
    return (out @ cl["w"].astype(out.dtype)
            + cl["b"].astype(out.dtype)).astype(jnp.float32)


def _pack(pn, ln_dyn, ln_st):
    return jnp.stack([pn["ln"]["g"], pn["ln"]["b"], ln_dyn["g"],
                      ln_dyn["b"], ln_st["g"], ln_st["b"]])


def test_fused_tail_eval_matches_xla(rng):
    T = 2 * BT
    y = jnp.asarray(rng.standard_normal((T, D)), jnp.float32)
    h = jnp.asarray(rng.standard_normal((T, D)), jnp.float32)
    pn, ln_dyn, ln_st, cl = _params(rng)
    ref = _xla_chain(y, h, pn, ln_dyn, ln_st, cl)
    got = fused_tail(y, h, _pack(pn, ln_dyn, ln_st),
                     pn["layers"][0]["w"], pn["layers"][0]["b"],
                     pn["layers"][1]["w"], pn["layers"][1]["b"],
                     cl["w"], cl["b"], jnp.zeros((), jnp.int32),
                     0.3, 0.4, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_tail_eval_grads_match_xla(rng):
    T = BT
    y = jnp.asarray(rng.standard_normal((T, D)), jnp.float32)
    h = jnp.asarray(rng.standard_normal((T, D)), jnp.float32)
    pn, ln_dyn, ln_st, cl = _params(rng)
    gg = jnp.asarray(rng.standard_normal((T, 1)), jnp.float32)

    def loss_ref(y, h, pn, ln_dyn, ln_st, cl):
        return jnp.sum(_xla_chain(y, h, pn, ln_dyn, ln_st, cl) * gg)

    def loss_fused(y, h, pn, ln_dyn, ln_st, cl):
        pp = fused_tail(y, h, _pack(pn, ln_dyn, ln_st),
                        pn["layers"][0]["w"], pn["layers"][0]["b"],
                        pn["layers"][1]["w"], pn["layers"][1]["b"],
                        cl["w"], cl["b"], jnp.zeros((), jnp.int32),
                        0.3, 0.4, False)
        return jnp.sum(pp * gg)

    args = (y, h, pn, ln_dyn, ln_st, cl)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(*args)
    g_fus = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(*args)
    flat_r, tree_r = jax.tree_util.tree_flatten(g_ref)
    flat_f, tree_f = jax.tree_util.tree_flatten(g_fus)
    assert tree_r == tree_f
    for i, (a, b) in enumerate(zip(flat_r, flat_f)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5, err_msg=f"leaf {i}")


def test_fused_tail_bf16_eval_close(rng):
    T = BT
    y = jnp.asarray(rng.standard_normal((T, D)), jnp.bfloat16)
    h = jnp.asarray(rng.standard_normal((T, D)), jnp.bfloat16)
    pn, ln_dyn, ln_st, cl = _params(rng)
    ref = _xla_chain(y, h, pn, ln_dyn, ln_st, cl)
    got = fused_tail(y, h, _pack(pn, ln_dyn, ln_st),
                     pn["layers"][0]["w"], pn["layers"][0]["b"],
                     pn["layers"][1]["w"], pn["layers"][1]["b"],
                     cl["w"], cl["b"], jnp.zeros((), jnp.int32),
                     0.3, 0.4, False)
    r, g = np.asarray(ref, np.float32), np.asarray(got, np.float32)
    corr = np.corrcoef(r.ravel(), g.ravel())[0, 1]
    assert corr > 0.999, corr


def test_forward_buckets_fused_gate_cpu_eval(monkeypatch, rng):
    """End-to-end: MATCHA_FUSE_TAIL=1 on CPU (eval mode) routes through the
    fused kernel in interpret mode and matches the XLA path logits."""
    import os
    from __graft_entry__ import _build_problem, _random_buckets
    from matcha_tpu.models.hypersagnn import forward_buckets

    genome, dims, params, frozen = _build_problem(dim=D, n_head=4, chroms=2)
    dims = dims._replace(use_pallas_attention=True)
    buckets = {}
    rr = np.random.default_rng(1)
    # token count divisible by BT: 256 k=2 edges -> T = 512
    rows = []
    while len(rows) < 256:
        r = np.sort(rr.integers(1, genome.node_num, 2))
        if r[0] != r[1]:
            rows.append(r)
    buckets[2] = jnp.asarray(np.asarray(rows, np.int32))

    ref = forward_buckets(params, frozen, dims, buckets, train=False)
    import matcha_tpu.models.hypersagnn as hs
    monkeypatch.setattr(hs, "_FUSE_TAIL", None)   # env is read once, cached
    monkeypatch.setenv("MATCHA_FUSE_TAIL", "1")
    got = forward_buckets(params, frozen, dims, buckets, train=False)
    np.testing.assert_allclose(np.asarray(got[2]), np.asarray(ref[2]),
                               rtol=1e-5, atol=1e-5)


def test_fused_tail_sharded_matches_unsharded(rng):
    """Eval-mode shard_map wrap over the 8-device CPU mesh: numerics +
    weight gradients equal the unsharded kernel."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from matcha_tpu.ops.fused_tail import fused_tail_sharded
    from matcha_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=8, n_model=1)
    T = 8 * BT
    y = jnp.asarray(rng.standard_normal((T, D)), jnp.float32)
    h = jnp.asarray(rng.standard_normal((T, D)), jnp.float32)
    pn, ln_dyn, ln_st, cl = _params(rng)
    args = (_pack(pn, ln_dyn, ln_st),
            pn["layers"][0]["w"], pn["layers"][0]["b"],
            pn["layers"][1]["w"], pn["layers"][1]["b"],
            cl["w"], cl["b"], jnp.zeros((), jnp.int32))
    ys = jax.device_put(y, NamedSharding(mesh, P("data")))
    hs = jax.device_put(h, NamedSharding(mesh, P("data")))

    ref = fused_tail(y, h, *args, 0.3, 0.4, False)
    got = jax.jit(lambda a, b: fused_tail_sharded(
        a, b, *args, 0.3, 0.4, False, mesh))(ys, hs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    def loss_s(w1):
        pp = fused_tail_sharded(ys, hs, args[0], w1, *args[2:], 0.3, 0.4,
                                False, mesh)
        return jnp.sum(pp ** 2)

    def loss_u(w1):
        pp = fused_tail(y, h, args[0], w1, *args[2:], 0.3, 0.4, False)
        return jnp.sum(pp ** 2)

    g1 = jax.jit(jax.grad(loss_s))(args[1])
    g2 = jax.jit(jax.grad(loss_u))(args[1])
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-6)


def test_fused_tail_train_mode_traces(rng):
    """Train mode (in-kernel PRNG dropout) cannot EXECUTE on CPU, but it
    must TRACE cleanly — a dtype mismatch in the mask bit manipulation once
    broke every train-mode use at trace time on all backends."""
    y = jnp.asarray(rng.standard_normal((BT, D)), jnp.float32)
    h = jnp.asarray(rng.standard_normal((BT, D)), jnp.float32)
    pn, ln_dyn, ln_st, cl = _params(rng)
    args = (y, h, _pack(pn, ln_dyn, ln_st),
            pn["layers"][0]["w"], pn["layers"][0]["b"],
            pn["layers"][1]["w"], pn["layers"][1]["b"],
            cl["w"], cl["b"], jnp.zeros((), jnp.int32))
    out = jax.eval_shape(lambda *a: fused_tail(*a, 0.3, 0.4, True), *args)
    assert out.shape == (BT, 1)
    g = jax.eval_shape(
        lambda *a: jax.grad(
            lambda *aa: jnp.sum(fused_tail(*aa, 0.3, 0.4, True)))(*a), *args)
    assert g.shape == (BT, D)


def test_forward_buckets_fused_gate_padmax_cpu_eval(monkeypatch, rng):
    """Fused tail under the hybrid (pad-max) attention mode: same logits
    as the XLA tail (eval, CPU interpret)."""
    from __graft_entry__ import _build_problem
    from matcha_tpu.models.hypersagnn import forward_buckets

    genome, dims, params, frozen = _build_problem(dim=D, n_head=4, chroms=2)
    dims = dims._replace(use_pallas_attention=True)
    rr = np.random.default_rng(2)
    buckets = {}
    # T = 128*2 + 256*3 = 1024 tokens, divisible by BT=512
    for k, n in ((2, 128), (3, 256)):
        rows = []
        while len(rows) < n:
            r = np.sort(rr.integers(1, genome.node_num, k))
            if (np.diff(r) > 0).all():
                rows.append(r)
        buckets[k] = jnp.asarray(np.asarray(rows, np.int32))

    ref = forward_buckets(params, frozen, dims, buckets, train=False,
                          attention_mode="pad-max")
    import matcha_tpu.models.hypersagnn as hs
    monkeypatch.setattr(hs, "_FUSE_TAIL", None)   # env is read once, cached
    monkeypatch.setenv("MATCHA_FUSE_TAIL", "1")
    got = forward_buckets(params, frozen, dims, buckets, train=False,
                          attention_mode="pad-max")
    for k in buckets:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=str(k))


def test_forward_buckets_fused_gate_mesh_cpu_eval(monkeypatch, rng):
    """Fused tail under an active pure-DP mesh routes through
    fused_tail_sharded and matches the XLA tail (eval, CPU interpret)."""
    from __graft_entry__ import _build_problem
    from matcha_tpu.models.hypersagnn import forward_buckets
    from matcha_tpu.parallel.mesh import make_mesh, using_active_mesh

    genome, dims, params, frozen = _build_problem(dim=D, n_head=4, chroms=2)
    dims = dims._replace(use_pallas_attention=True)
    rr = np.random.default_rng(3)
    rows = []
    # T = 2048*2 = 4096 = 8 shards x BT
    while len(rows) < 2048:
        r = np.sort(rr.integers(1, genome.node_num, 2))
        if r[0] != r[1]:
            rows.append(r)
    buckets = {2: jnp.asarray(np.asarray(rows, np.int32))}

    ref = forward_buckets(params, frozen, dims, buckets, train=False)
    mesh = make_mesh(n_data=8, n_model=1)
    import matcha_tpu.models.hypersagnn as hs
    monkeypatch.setattr(hs, "_FUSE_TAIL", None)   # env is read once, cached
    monkeypatch.setenv("MATCHA_FUSE_TAIL", "1")
    with using_active_mesh(mesh):
        got = forward_buckets(params, frozen, dims, buckets, train=False)
    np.testing.assert_allclose(np.asarray(got[2]), np.asarray(ref[2]),
                               rtol=1e-5, atol=1e-5)


def test_bits_to_mask_statistics(rng):
    """The bit->mask transform (shared with the kernel) realizes inverted
    dropout: keep rate ~= 1-rate, kept entries scaled by 1/(1-rate),
    E[mask] ~= 1."""
    from matcha_tpu.ops.fused_tail import bits_to_mask
    bits = jnp.asarray(
        rng.integers(0, 1 << 32, size=(1 << 16), dtype=np.uint64)
        .astype(np.uint32))
    for rate in (0.3, 0.4):
        m = np.asarray(bits_to_mask(bits, rate))
        keep = (m > 0).mean()
        assert abs(keep - (1.0 - rate)) < 0.01, (rate, keep)
        np.testing.assert_allclose(m[m > 0], 1.0 / (1.0 - rate), rtol=1e-6)
        assert abs(m.mean() - 1.0) < 0.02
