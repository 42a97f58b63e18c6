"""Fused hyperedge-attention kernel vs the XLA reference (interpret mode on
CPU) and vs the model's mha_dynamic module."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from matcha_tpu.models.modules import mha_dynamic, mha_init
from matcha_tpu.ops.hyperedge_attention import (_fwd_pallas, _fwd_xla,
                                                _pack_ln)

D, H = 32, 4


def _setup(rng, E, L):
    p = mha_init(jax.random.PRNGKey(0), H, D, D, D, D)
    x = jnp.asarray(rng.standard_normal((E, L, D)), jnp.float32)
    args = (_pack_ln(p), p["wq"], p["wk"], p["wv"], p["fc1"]["w"],
            p["fc1"]["b"])
    return p, x, args


@pytest.mark.parametrize("L", [2, 3, 5])
def test_pallas_matches_xla(rng, L):
    p, x, args = _setup(rng, 64, L)
    ref = _fwd_xla(x, *args, n_head=H, diag_mask=True)
    got = _fwd_pallas(x, *args, n_head=H, diag_mask=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_xla_path_matches_module(rng):
    """The kernel's XLA reference equals mha_dynamic (eval mode)."""
    p, x, args = _setup(rng, 32, 4)
    ref = mha_dynamic(p, x, H, D, D, diag_mask=True)
    got = _fwd_xla(x, *args, n_head=H, diag_mask=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_no_diag_mask(rng):
    p, x, args = _setup(rng, 16, 3)
    ref = _fwd_xla(x, *args, n_head=H, diag_mask=False)
    got = _fwd_pallas(x, *args, n_head=H, diag_mask=False, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_custom_vjp_grads(rng):
    from matcha_tpu.ops.hyperedge_attention import hyperedge_attention
    p, x, args = _setup(rng, 16, 3)

    def loss_fused(x, *a):
        return jnp.sum(hyperedge_attention(x, *a, H, True, False) ** 2)

    def loss_ref(x, *a):
        return jnp.sum(_fwd_xla(x, *a, n_head=H, diag_mask=True) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, *args)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, *args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_pallas_bwd_matches_xla_vjp(rng):
    from matcha_tpu.ops.hyperedge_attention import _bwd_pallas
    p, x, args = _setup(rng, 64, 5)
    g = jnp.asarray(rng.standard_normal((64, 5, D)), jnp.float32)

    def f(x, *a):
        return _fwd_xla(x, *a, n_head=H, diag_mask=True)

    _, vjp = jax.vjp(f, x, *args)
    ref = vjp(g)
    got = _bwd_pallas(x, *args, g, n_head=H, diag_mask=True, interpret=True)
    names = ["gx", "gln", "gwq", "gwk", "gwv", "gfw", "gfb"]
    for name, a, b in zip(names, got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5, err_msg=name)


def test_pallas_bwd_no_diag(rng):
    from matcha_tpu.ops.hyperedge_attention import _bwd_pallas
    p, x, args = _setup(rng, 32, 3)
    g = jnp.asarray(rng.standard_normal((32, 3, D)), jnp.float32)

    def f(x, *a):
        return _fwd_xla(x, *a, n_head=H, diag_mask=False)

    _, vjp = jax.vjp(f, x, *args)
    ref = vjp(g)
    got = _bwd_pallas(x, *args, g, n_head=H, diag_mask=False, interpret=True)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_bf16(rng):
    p, x, args = _setup(rng, 64, 4)
    xb = x.astype(jnp.bfloat16)
    ref = _fwd_xla(xb, *args, n_head=H, diag_mask=True)
    got = _fwd_pallas(xb, *args, n_head=H, diag_mask=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                               np.asarray(ref, dtype=np.float32),
                               rtol=0.05, atol=0.05)


@pytest.mark.parametrize("L", [2, 3, 5])
def test_fm_fwd_matches_xla(rng, L):
    """Feature-major layout (default on TPU): tokens on lanes, features on
    sublanes — per-head reduce/broadcast as sublane-group ops."""
    from matcha_tpu.ops.hyperedge_attention import _fwd_pallas_fm
    p, x, args = _setup(rng, 64, L)
    ref = _fwd_xla(x, *args, n_head=H, diag_mask=True)
    got = _fwd_pallas_fm(x, *args, n_head=H, diag_mask=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("diag", [True, False])
def test_fm_bwd_matches_xla_vjp(rng, diag):
    from matcha_tpu.ops.hyperedge_attention import _bwd_pallas_fm
    p, x, args = _setup(rng, 64, 5)
    g = jnp.asarray(rng.standard_normal((64, 5, D)), jnp.float32)

    def f(x, *a):
        return _fwd_xla(x, *a, n_head=H, diag_mask=diag)

    _, vjp = jax.vjp(f, x, *args)
    ref = vjp(g)
    got = _bwd_pallas_fm(x, *args, g, n_head=H, diag_mask=diag,
                         interpret=True)
    names = ["gx", "gln", "gwq", "gwk", "gwv", "gfw", "gfb"]
    for name, a, b in zip(names, got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5, err_msg=name)
