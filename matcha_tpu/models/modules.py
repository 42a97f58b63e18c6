"""Functional neural-net building blocks (pure pytrees + apply functions).

These re-create the behaviour of the reference's ``Code/Modules.py`` layer zoo
in idiomatic JAX: parameters are plain dicts, applies are pure functions, all
activations are tanh (ref Code/Modules.py:9), LayerNorm eps matches torch
(1e-5).  Weight layout is JAX-convention ``(in, out)`` (torch stores
``(out, in)``; parity harnesses transpose).

Init distributions follow torch defaults so training dynamics match:
  * Linear / Conv1d(k=1): kaiming-uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)),
    bias U(±1/sqrt(fan_in))
  * attention projections: Normal(0, sqrt(2/(d_model+d_k)))
    (ref Code/Modules.py:485-490)
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

Params = Dict


def tanh(x):
    return jnp.tanh(x)


# ------------------------------------------------------------------ linear
def linear_init(key, in_dim: int, out_dim: int, use_bias: bool = True,
                dtype=jnp.float32) -> Params:
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    p = {"w": jax.random.uniform(kw, (in_dim, out_dim), dtype, -bound, bound)}
    if use_bias:
        p["b"] = jax.random.uniform(kb, (out_dim,), dtype, -bound, bound)
    return p


def linear(p: Params, x):
    # weights follow the activation dtype (bf16 compute keeps f32 master
    # params; casts are no-ops in full f32)
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def normal_init(key, in_dim: int, out_dim: int, std: float,
                dtype=jnp.float32) -> jnp.ndarray:
    return std * jax.random.normal(key, (in_dim, out_dim), dtype)


# --------------------------------------------------------------- layernorm
def layer_norm_init(dim: int, dtype=jnp.float32) -> Params:
    return {"g": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)}


def layer_norm(p: Params, x, eps: float = 1e-5):
    dt = x.dtype
    x32 = x.astype(jnp.float32)          # stats in f32 even in bf16 compute
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return (((x32 - mu) * jax.lax.rsqrt(var + eps)
             * p["g"] + p["b"]).astype(dt))


# ----------------------------------------------------------------- dropout
def dropout(key: Optional[jax.Array], x, rate: float, train: bool):
    """Inverted dropout (torch semantics).  No-op in eval / when key is None."""
    if not train or key is None or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


# ------------------------------------------------------- feed-forward MLPs
def feed_forward_init(key, dims: Sequence[int], use_bias: bool = True) -> Params:
    """Plain linear MLP stack with tanh between layers
    (ref FeedForward, Code/Modules.py:385-414)."""
    keys = jax.random.split(key, len(dims) - 1)
    return {"layers": [linear_init(k, dims[i], dims[i + 1], use_bias)
                       for i, k in enumerate(keys)]}


def feed_forward(p: Params, x, *, key=None, drop_rate: float = 0.0,
                 train: bool = False):
    layers = p["layers"]
    for i, lp in enumerate(layers[:-1]):
        x = tanh(linear(lp, x))
        if drop_rate > 0.0:
            key, kd = jax.random.split(key) if key is not None else (None, None)
            x = dropout(kd, x, drop_rate, train)
    return linear(layers[-1], x)


def pff_init(key, dims: Sequence[int], use_bias: bool = True,
             layer_norm_flag: bool = False) -> Params:
    """Position-wise MLP (ref PositionwiseFeedForward, Code/Modules.py:327-376;
    Conv1d with kernel 1 == a linear over the feature axis)."""
    p = feed_forward_init(key, dims, use_bias)
    if layer_norm_flag:
        p["ln"] = layer_norm_init(dims[-1])
    return p


def pff(p: Params, x, *, residual: bool = False, key=None,
        drop_rate: float = 0.0, train: bool = False):
    """tanh-MLP with optional dropout between layers, then (iff
    dims[0]==dims[-1]) residual add and LayerNorm — exactly the reference's
    ordering (ref Code/Modules.py:353-376)."""
    out = x
    layers = p["layers"]
    for lp in layers[:-1]:
        out = tanh(linear(lp, out))
        key, kd = jax.random.split(key) if key is not None else (None, None)
        out = dropout(kd, out, drop_rate, train)
    out = linear(layers[-1], out)
    # residual/LN only when in_dim == out_dim (ref Code/Modules.py:368-374)
    if layers[0]["w"].shape[0] == layers[-1]["w"].shape[1]:
        if residual:
            out = out + x
        if "ln" in p:
            out = layer_norm(p["ln"], out)
    return out


# ------------------------------------------------- static/dynamic attention
def mha_init(key, n_head: int, d_model: int, d_k: int, d_v: int,
             input_dim: int) -> Params:
    """Hyper-SAGNN multi-head attention (ref MultiHeadAttention,
    Code/Modules.py:463-575).  The reference's ``fc2`` (static projection) and
    the encoder's ``pff_n2`` are computed-then-discarded upstream
    (ref Code/Modules.py:611-617 returns the *pre-attention* static), so they
    receive no gradient and are omitted here entirely."""
    ks = jax.random.split(key, 4)
    std_qk = math.sqrt(2.0 / (d_model + d_k))
    std_v = math.sqrt(2.0 / (d_model + d_v))
    return {
        "ln_q": layer_norm_init(input_dim),
        "ln_k": layer_norm_init(input_dim),
        "ln_v": layer_norm_init(input_dim),
        "wq": normal_init(ks[0], input_dim, n_head * d_k, std_qk),
        "wk": normal_init(ks[1], input_dim, n_head * d_k, std_qk),
        "wv": normal_init(ks[2], input_dim, n_head * d_v, std_v),
        "fc1": linear_init(ks[3], n_head * d_v, d_model),
    }


def mha_fused(p: Params, x, n_head: int, diag_mask: bool,
              use_pallas: bool, mesh=None):
    """The fused-attention call, optionally shard_mapped over the mesh's
    "data" axis.  Replicated weight inputs are pcast-to-varying so the
    shard_map transpose psums their per-shard gradient partials; batch
    rows stay device-local (zero collectives in the forward)."""
    from matcha_tpu.ops.hyperedge_attention import (_pack_ln,
                                                    hyperedge_attention)
    args = (_pack_ln(p), p["wq"], p["wk"], p["wv"],
            p["fc1"]["w"], p["fc1"]["b"])
    if mesh is None:
        return hyperedge_attention(x, *args, n_head, diag_mask, use_pallas)
    from matcha_tpu.parallel.mesh import data_shard_map

    def call(xx, *ws):
        return hyperedge_attention(xx, *ws, n_head, diag_mask, use_pallas)

    return data_shard_map(call, mesh, 1, 6)(x, *args)


def mha_dynamic(p: Params, x, n_head: int, d_k: int, d_v: int,
                *, diag_mask: bool = True, key=None, drop_rate: float = 0.0,
                train: bool = False, use_pallas: bool = False):
    """Self-excluding (diag-masked) self-attention over one hyperedge.

    Replicates the reference's masked-softmax (ref Code/Modules.py:424-460,
    memory_efficient=True): diagonal entries filled with -1e32 before softmax.

    PARITY QUIRK (verified against the reference): the key-pad mask is NEVER
    applied — EncoderLayer passes ``slf_attn_mask`` into MultiHeadAttention's
    ``diag_mask`` positional parameter (ref Code/Modules.py:611-613), which is
    immediately overwritten by the cached ones-minus-eye tensor, and ``mask``
    stays None so the -inf pad fill (ref :452-453) is dead code.  Pad
    positions therefore participate as attention keys/values.  We reproduce
    that exactly; note our per-k bucketed batching never pads in training, so
    this only matters for padded mixed-size inference inputs.

    Returns the "dynamic" embedding fc1(attn @ v); the "static" embedding used
    downstream is the raw input (see encoder_layer).
    """
    b, L, _ = x.shape
    if diag_mask and L == 2:
        # closed form: with the self-excluding mask and two positions, each
        # row of the softmax has exactly one unmasked key — attention weight
        # is exactly 1 on the other member, so the output is fc1(v_other)
        v = layer_norm(p["ln_v"], x) @ p["wv"].astype(x.dtype)
        out = linear(p["fc1"], v[:, ::-1, :])
        key, kd = jax.random.split(key) if key is not None else (None, None)
        return dropout(kd, out, drop_rate, train)
    if use_pallas and jax.default_backend() != "cpu":
        from matcha_tpu.parallel.mesh import (active_data_mesh,
                                              kernel_batch_factor)
        mesh = active_data_mesh()
        nd = kernel_batch_factor(mesh)
        if b % (128 * nd) == 0:
            # fused Pallas kernel: LN+qkv+attention+fc1 in one VMEM pass;
            # shard_mapped over "data" when a mesh is active (Pallas custom
            # calls have no GSPMD rule — see mha_fused / parallel.mesh)
            out = mha_fused(p, x, n_head, diag_mask, True, mesh)
            key, kd = jax.random.split(key) if key is not None else (None,
                                                                     None)
            return dropout(kd, out, drop_rate, train)
    # TPU-shaped formulation: the projections run as FLAT GEMMs over the
    # (b*L, d) token stream (big MXU tiles), and the L^2<=25 score pairs run
    # as broadcast-multiply-reduce on the vector unit — never as batched
    # (L x d_k)@(d_k x L) matmuls, which tile the MXU at <5% for L<=5.
    xf = x.reshape(b * L, x.shape[-1])
    q = (layer_norm(p["ln_q"], xf) @ p["wq"].astype(x.dtype)).reshape(
        b, L, n_head, d_k)
    k = (layer_norm(p["ln_k"], xf) @ p["wk"].astype(x.dtype)).reshape(
        b, L, n_head, d_k)
    v = (layer_norm(p["ln_v"], xf) @ p["wv"].astype(x.dtype)).reshape(
        b, L, n_head, d_v)
    inv_temp = 1.0 / math.sqrt(d_k)
    pos = jnp.arange(L)
    outs = []
    for qp in range(L):
        # scores of query position qp against all keys: (b, L, H), f32
        # products AND f32 accumulation (matching the MXU-einsum numerics
        # this path replaced — bf16-rounded products drift the logits)
        s = jnp.sum(q[:, qp:qp + 1].astype(jnp.float32)
                    * k.astype(jnp.float32), axis=-1) * inv_temp
        if diag_mask:
            s = jnp.where((pos == qp)[None, :, None], -1e32, s)  # ref :443-445
        prob = jax.nn.softmax(s, axis=1)                     # f32
        outs.append(jnp.sum(prob[..., None] * v.astype(jnp.float32),
                            axis=1).astype(x.dtype))         # (b, H, d_v)
    out = jnp.stack(outs, axis=1).reshape(b * L, n_head * d_v)
    out = linear(p["fc1"], out).reshape(b, L, -1)
    key, kd = jax.random.split(key) if key is not None else (None, None)
    return dropout(kd, out, drop_rate, train)


def encoder_layer_init(key, n_head: int, d_model: int, d_k: int, d_v: int,
                       bottle_neck: int) -> Params:
    """ref EncoderLayer (Code/Modules.py:578-617), minus the dead pff_n2."""
    k1, k2 = jax.random.split(key)
    return {
        "mha": mha_init(k1, n_head, d_model, d_k, d_v, bottle_neck),
        "pff_n1": pff_init(k2, [d_model, d_model, d_model],
                           layer_norm_flag=True),
    }


def encoder_layer(p: Params, x, non_pad_mask, n_head: int,
                  d_k: int, d_v: int, *, diag_mask: bool = True, key=None,
                  train: bool = False, use_pallas: bool = False):
    """Returns (dynamic, static).  Parity quirk faithfully preserved: the
    static branch is the *unmodified input* — the reference computes
    fc2/pff_n2 but returns the pre-attention static (Code/Modules.py:611-617).
    Dropouts: 0.3 after attention fc1, 0.4 inside pff_n1 (ref :226-227)."""
    key, ka, kp = jax.random.split(key, 3) if key is not None else (None,) * 3
    dyn = mha_dynamic(p["mha"], x, n_head, d_k, d_v,
                      diag_mask=diag_mask, key=ka, drop_rate=0.3, train=train,
                      use_pallas=use_pallas)
    dyn = pff(p["pff_n1"], dyn * non_pad_mask, residual=True, key=kp,
              drop_rate=0.4, train=train) * non_pad_mask
    return dyn, x
