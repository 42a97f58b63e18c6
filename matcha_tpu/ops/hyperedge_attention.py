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
    # Position-major block: x_ref is (L, be, d) so "all edges, position i" is
    # a contiguous 2D slice — Mosaic-friendly (no 4D reshapes, the minor two
    # dims stay (be, d)/(be, hd)-shaped throughout).
    _, be, d = x_ref.shape
    hd = H * dk
    x2 = x_ref[...].reshape(L * be, d)
    ln = ln_ref[...]

    q2 = jnp.dot(_ln(x2, ln[0], ln[1]), wq_ref[...],
                 preferred_element_type=jnp.float32).astype(x2.dtype)
    k2 = jnp.dot(_ln(x2, ln[2], ln[3]), wk_ref[...],
                 preferred_element_type=jnp.float32).astype(x2.dtype)
    v2 = jnp.dot(_ln(x2, ln[4], ln[5]), wv_ref[...],
                 preferred_element_type=jnp.float32).astype(x2.dtype)

    q = [q2[i * be:(i + 1) * be] for i in range(L)]      # (be, hd)
    k = [k2[i * be:(i + 1) * be] for i in range(L)]
    v = [v2[i * be:(i + 1) * be].astype(jnp.float32) for i in range(L)]

    # Per-head segmented reductions as MXU matmuls against the block
    # indicator seg (hd, H): seg[c, h] = [c // dk == h].  score = prod @ seg
    # sums each head's dk-column block; a @ seg.T broadcasts per-head attn
    # weights back across their columns.  Keeps every tensor 2D (Mosaic
    # rejects lane-splitting reshapes like (be,512)->(be,8,64)).
    col = jax.lax.broadcasted_iota(jnp.int32, (hd, H), 0)
    head = jax.lax.broadcasted_iota(jnp.int32, (hd, H), 1)
    seg = (col // dk == head).astype(jnp.float32)

    inv_temp = 1.0 / math.sqrt(dk)
    out_rows = []
    for i in range(L):
        s = []
        for j in range(L):
            if diag_mask and i == j:
                s.append(jnp.full((be, H), -1e32, dtype=jnp.float32))
                continue
            prod = (q[i] * k[j]).astype(jnp.float32)     # (be, hd)
            sij = jnp.dot(prod, seg,
                          preferred_element_type=jnp.float32)  # (be, H)
            s.append(sij * inv_temp)
        m = s[0]
        for j in range(1, L):
            m = jnp.maximum(m, s[j])
        e = [jnp.exp(sj - m) for sj in s]
        tot = e[0]
        for j in range(1, L):
            tot = tot + e[j]
        inv = 1.0 / tot
        acc = jnp.zeros((be, hd), dtype=jnp.float32)
        for j in range(L):
            a_full = jnp.dot(e[j] * inv, seg.T,
                             preferred_element_type=jnp.float32)  # (be, hd)
            acc = acc + a_full * v[j]
        out_rows.append(acc.astype(x2.dtype))

    attn_out = jnp.concatenate(out_rows, axis=0)          # (L*be, hd)
    y = (jnp.dot(attn_out, fw_ref[...],
                 preferred_element_type=jnp.float32)
         + fb_ref[...].astype(jnp.float32))
    out_ref[...] = y.astype(x2.dtype).reshape(L, be, d)


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
    x_t = x.transpose(1, 0, 2)                     # (L, E, d) position-major
    out_t = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, be, d), lambda i: (0, i, 0)),
            pl.BlockSpec((6, d), lambda i: (0, 0)),
            pl.BlockSpec(wq.shape, lambda i: (0, 0)),
            pl.BlockSpec(wk.shape, lambda i: (0, 0)),
            pl.BlockSpec(wv.shape, lambda i: (0, 0)),
            pl.BlockSpec(fw.shape, lambda i: (0, 0)),
            pl.BlockSpec(fb.shape, lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((L, be, d), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((L, E, d), x.dtype),
        interpret=interpret,
    )(x_t, ln, wq, wk, wv, fw, fb)
    return out_t.transpose(1, 0, 2)


# --------------------------------------------------------------------- bwd
def _bwd_kernel(x_ref, ln_ref, wq_ref, wk_ref, wv_ref, fw_ref, fb_ref, g_ref,
                gx_ref, gln_ref, gwq_ref, gwk_ref, gwv_ref, gfw_ref, gfb_ref,
                *, L: int, H: int, dk: int, diag_mask: bool):
    """Fused backward: recomputes the forward in-VMEM (flash style) and
    produces input grads (blocked) + weight/LN grads (accumulated across the
    grid in revisited output buffers)."""
    _, be, d = x_ref.shape
    hd = H * dk
    f32 = jnp.float32
    x2 = x_ref[...].reshape(L * be, d)
    g_y = g_ref[...].reshape(L * be, d).astype(f32)
    ln = ln_ref[...]

    def ln_fwd(x, gpar, bpar, eps=1e-5):
        x32 = x.astype(f32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        inv_sigma = jax.lax.rsqrt(var + eps)
        xhat = (x32 - mu) * inv_sigma
        return (xhat * gpar + bpar).astype(x.dtype), xhat, inv_sigma

    xq, xhat_q, is_q = ln_fwd(x2, ln[0], ln[1])
    xk, xhat_k, is_k = ln_fwd(x2, ln[2], ln[3])
    xv, xhat_v, is_v = ln_fwd(x2, ln[4], ln[5])

    q2 = jnp.dot(xq, wq_ref[...], preferred_element_type=f32).astype(x2.dtype)
    k2 = jnp.dot(xk, wk_ref[...], preferred_element_type=f32).astype(x2.dtype)
    v2 = jnp.dot(xv, wv_ref[...], preferred_element_type=f32).astype(x2.dtype)
    # q/k stay in the input dtype (exactly the fwd kernel's recompute
    # precision — prod is formed as (q*k).astype(f32) there too); only v is
    # carried in f32 for the attention-weighted accumulation.  Halves the
    # live q/k VMEM, buying a 2x backward block (be 64 -> 128).
    q = [q2[i * be:(i + 1) * be] for i in range(L)]
    k = [k2[i * be:(i + 1) * be] for i in range(L)]
    v = [v2[i * be:(i + 1) * be].astype(f32) for i in range(L)]

    col = jax.lax.broadcasted_iota(jnp.int32, (hd, H), 0)
    head = jax.lax.broadcasted_iota(jnp.int32, (hd, H), 1)
    seg = (col // dk == head).astype(f32)
    inv_temp = 1.0 / math.sqrt(dk)

    # forward softmax recompute, saving attn weights a[i][j] (be, H)
    a = [[None] * L for _ in range(L)]
    out_rows = []
    for i in range(L):
        s = []
        for j in range(L):
            if diag_mask and i == j:
                s.append(jnp.full((be, H), -1e32, dtype=f32))
                continue
            prod = (q[i] * k[j]).astype(f32)
            s.append(jnp.dot(prod, seg, preferred_element_type=f32)
                     * inv_temp)
        m = s[0]
        for j in range(1, L):
            m = jnp.maximum(m, s[j])
        e = [jnp.exp(sj - m) for sj in s]
        tot = e[0]
        for j in range(1, L):
            tot = tot + e[j]
        inv = 1.0 / tot
        acc = jnp.zeros((be, hd), dtype=f32)
        for j in range(L):
            a[i][j] = e[j] * inv
            acc = acc + jnp.dot(a[i][j], seg.T,
                                preferred_element_type=f32) * v[j]
        out_rows.append(acc)
    attn_out = jnp.concatenate(out_rows, axis=0)         # (L*be, hd) f32

    # fc1 backward
    gfb_c = jnp.sum(g_y, axis=0, keepdims=True)          # (1, d)
    gfw_c = jax.lax.dot_general(attn_out, g_y,
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=f32)   # (hd, d)
    g_attn = jax.lax.dot_general(g_y, fw_ref[...].astype(f32),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=f32)  # (L*be, hd)

    # attention backward
    gq = [jnp.zeros((be, hd), f32) for _ in range(L)]
    gk = [jnp.zeros((be, hd), f32) for _ in range(L)]
    gv = [jnp.zeros((be, hd), f32) for _ in range(L)]
    for i in range(L):
        g_acc = g_attn[i * be:(i + 1) * be]              # (be, hd)
        ga = []
        for j in range(L):
            if diag_mask and i == j:
                ga.append(jnp.zeros((be, H), f32))
                continue
            g_a_full = g_acc * v[j]
            ga.append(jnp.dot(g_a_full, seg, preferred_element_type=f32))
            gv[j] = gv[j] + jnp.dot(a[i][j], seg.T,
                                    preferred_element_type=f32) * g_acc
        dot_i = jnp.zeros((be, H), f32)
        for j in range(L):
            dot_i = dot_i + a[i][j] * ga[j]
        for j in range(L):
            if diag_mask and i == j:
                continue
            g_s = a[i][j] * (ga[j] - dot_i) * inv_temp   # (be, H)
            g_s_full = jnp.dot(g_s, seg.T, preferred_element_type=f32)
            gq[i] = gq[i] + g_s_full * k[j]
            gk[j] = gk[j] + g_s_full * q[i]
    g_q2 = jnp.concatenate(gq, axis=0)                   # (L*be, hd)
    g_k2 = jnp.concatenate(gk, axis=0)
    g_v2 = jnp.concatenate(gv, axis=0)

    # projections backward
    def proj_bwd(g_p, w_ref, x_in):
        gw = jax.lax.dot_general(x_in.astype(f32), g_p,
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)   # (d, hd)
        gx = jax.lax.dot_general(g_p, w_ref[...].astype(f32),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=f32)   # (L*be, d)
        return gw, gx

    gwq_c, g_xq = proj_bwd(g_q2, wq_ref, xq)
    gwk_c, g_xk = proj_bwd(g_k2, wk_ref, xk)
    gwv_c, g_xv = proj_bwd(g_v2, wv_ref, xv)

    # LayerNorm backward x3
    def ln_bwd(g_out, xhat, inv_sigma, gpar):
        gg = jnp.sum(g_out * xhat, axis=0, keepdims=True)      # (1, d)
        gb = jnp.sum(g_out, axis=0, keepdims=True)
        gxh = g_out * gpar
        gx = inv_sigma * (gxh
                          - jnp.mean(gxh, axis=-1, keepdims=True)
                          - xhat * jnp.mean(gxh * xhat, axis=-1,
                                            keepdims=True))
        return gx, gg, gb

    gx_q, ggq, gbq = ln_bwd(g_xq, xhat_q, is_q, ln[0])
    gx_k, ggk, gbk = ln_bwd(g_xk, xhat_k, is_k, ln[2])
    gx_v, ggv, gbv = ln_bwd(g_xv, xhat_v, is_v, ln[4])
    gx = gx_q + gx_k + gx_v
    gx_ref[...] = gx.astype(x2.dtype).reshape(L, be, d)

    gln_c = jnp.concatenate([ggq, gbq, ggk, gbk, ggv, gbv], axis=0)  # (6, d)

    @pl.when(pl.program_id(0) == 0)
    def _():
        gln_ref[...] = jnp.zeros_like(gln_ref)
        gwq_ref[...] = jnp.zeros_like(gwq_ref)
        gwk_ref[...] = jnp.zeros_like(gwk_ref)
        gwv_ref[...] = jnp.zeros_like(gwv_ref)
        gfw_ref[...] = jnp.zeros_like(gfw_ref)
        gfb_ref[...] = jnp.zeros_like(gfb_ref)

    gln_ref[...] += gln_c
    gwq_ref[...] += gwq_c
    gwk_ref[...] += gwk_c
    gwv_ref[...] += gwv_c
    gfw_ref[...] += gfw_c
    gfb_ref[...] += gfb_c[0]


def _bwd_block_edges(E: int, dtype, L: int, hd: int) -> int:
    """bwd holds ~2x the live data of fwd (recompute + grads); bf16
    activations buy a 2x block.  Then shrink until the live (L*be, hd)
    buffers fit the 16 MB scoped-VMEM stack with headroom.  With q/k kept
    in the input dtype (see _bwd_kernel) the live set is ~9 f32-equivalent
    buffers (v + gq/gk/gv + g_attn/attn_out + q/k at half weight), which
    admits be=128 at L=5, hd=512 (11.8 MB)."""
    be = max(_block_edges(E, dtype) // 2, 1)
    while be > 8 and 9 * L * be * hd * 4 >= 12 * 2 ** 20:
        be //= 2
    return be


def _bwd_pallas(x, ln, wq, wk, wv, fw, fb, g, *, n_head: int,
                diag_mask: bool, interpret: bool = False):
    E, L, d = x.shape
    dk = wq.shape[1] // n_head
    be = _bwd_block_edges(E, x.dtype, L, wq.shape[1])
    grid = (E // be,)
    kern = partial(_bwd_kernel, L=L, H=n_head, dk=dk, diag_mask=diag_mask)
    x_t = x.transpose(1, 0, 2)
    g_t = g.transpose(1, 0, 2)
    f32 = jnp.float32
    gx_t, gln, gwq, gwk, gwv, gfw, gfb = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, be, d), lambda i: (0, i, 0)),
            pl.BlockSpec((6, d), lambda i: (0, 0)),
            pl.BlockSpec(wq.shape, lambda i: (0, 0)),
            pl.BlockSpec(wk.shape, lambda i: (0, 0)),
            pl.BlockSpec(wv.shape, lambda i: (0, 0)),
            pl.BlockSpec(fw.shape, lambda i: (0, 0)),
            pl.BlockSpec(fb.shape, lambda i: (0,)),
            pl.BlockSpec((L, be, d), lambda i: (0, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((L, be, d), lambda i: (0, i, 0)),
            pl.BlockSpec((6, d), lambda i: (0, 0)),       # accumulated
            pl.BlockSpec(wq.shape, lambda i: (0, 0)),
            pl.BlockSpec(wk.shape, lambda i: (0, 0)),
            pl.BlockSpec(wv.shape, lambda i: (0, 0)),
            pl.BlockSpec(fw.shape, lambda i: (0, 0)),
            pl.BlockSpec(fb.shape, lambda i: (0,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, E, d), x.dtype),
            jax.ShapeDtypeStruct((6, d), f32),
            jax.ShapeDtypeStruct(wq.shape, f32),
            jax.ShapeDtypeStruct(wk.shape, f32),
            jax.ShapeDtypeStruct(wv.shape, f32),
            jax.ShapeDtypeStruct(fw.shape, f32),
            jax.ShapeDtypeStruct(fb.shape, f32),
        ],
        interpret=interpret,
    )(x_t, ln, wq, wk, wv, fw, fb, g_t)
    return (gx_t.transpose(1, 0, 2), gln.astype(ln.dtype),
            gwq.astype(wq.dtype), gwk.astype(wk.dtype),
            gwv.astype(wv.dtype), gfw.astype(fw.dtype),
            gfb.astype(fb.dtype))


# ----------------------------------------------- feature-major (fm) kernels
#
# The lane-major kernels above reduce per-head scores with "seg" matmuls of
# shape (be, 512) @ (512, 8): only 8 of the MXU's 128 output lanes carry
# useful values, a 16x waste that profiling shows dominates both passes
# (~5.5 ms bwd + 2.5 ms fwd per bench step).  The feature-major layout keeps
# tokens on the LANE axis and features on the SUBLANE axis: per-head score
# reduction becomes a leading-dim reshape-sum over sublane groups
# ((512, be) -> (H, dk, be) -> sum axis 1), and the attention broadcast a
# sublane-group broadcast — both full-width VPU ops with zero lane waste.
# Projections/fc1 keep identical MXU cost (M x K x N unchanged, transposed).


def _ffm(x, i):
    """Position slice of a (L, d, be) block ref -> (d, be)."""
    return x[i]


def _fwd_kernel_fm(x_ref, ln_ref, wqt_ref, wkt_ref, wvt_ref, fw_ref, fb_ref,
                   out_ref, *, L: int, H: int, dk: int, diag_mask: bool):
    # Feature-major block: x_ref is (L, d, be) so "all edges, position i" is
    # a (d, be) slice with features on sublanes and edges on lanes.
    # Per-head tensors are carried (H, dk, be): the head reduce is a plain
    # axis-1 sum and the attention-weight apply an implicit (H, 1, be)
    # broadcast.  Measured PERF-NEUTRAL vs the broadcast_to+reshape 2-D
    # form (bwd L=5 device time 0.396 ms both ways — Mosaic already tracks
    # broadcasts in vector layouts); kept for the simpler shape story.
    _, d, be = x_ref.shape
    f32 = jnp.float32
    ln = ln_ref[...]

    def ln_fm(x, g, b, eps=1e-5):
        x32 = x.astype(f32)
        mu = jnp.mean(x32, axis=0, keepdims=True)
        var = jnp.var(x32, axis=0, keepdims=True)
        return ((x32 - mu) * jax.lax.rsqrt(var + eps)
                * g[:, None] + b[:, None]).astype(x.dtype)

    q, k, v = [], [], []
    for i in range(L):
        xi = _ffm(x_ref, i)                                   # (d, be)
        q.append(jnp.dot(wqt_ref[...], ln_fm(xi, ln[0], ln[1]),
                         preferred_element_type=f32)
                 .astype(xi.dtype).reshape(H, dk, be))
        k.append(jnp.dot(wkt_ref[...], ln_fm(xi, ln[2], ln[3]),
                         preferred_element_type=f32)
                 .astype(xi.dtype).reshape(H, dk, be))
        v.append(jnp.dot(wvt_ref[...], ln_fm(xi, ln[4], ln[5]),
                         preferred_element_type=f32)
                 .reshape(H, dk, be))                         # f32

    hd = H * dk
    inv_temp = 1.0 / math.sqrt(dk)

    for i in range(L):
        s = []
        for j in range(L):
            if diag_mask and i == j:
                s.append(jnp.full((H, be), -1e32, dtype=f32))
                continue
            prod = (q[i] * k[j]).astype(f32)                  # (H, dk, be)
            s.append(jnp.sum(prod, axis=1) * inv_temp)        # (H, be)
        m = s[0]
        for j in range(1, L):
            m = jnp.maximum(m, s[j])
        e = [jnp.exp(sj - m) for sj in s]
        tot = e[0]
        for j in range(1, L):
            tot = tot + e[j]
        inv = 1.0 / tot
        acc = jnp.zeros((H, dk, be), dtype=f32)
        for j in range(L):
            acc = acc + (e[j] * inv)[:, None, :] * v[j]
        yi = (jax.lax.dot_general(fw_ref[...],
                                  acc.reshape(hd, be).astype(x_ref.dtype),
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=f32)
              + fb_ref[...].astype(f32)[:, None])             # (d, be)
        out_ref[i] = yi.astype(x_ref.dtype)


def _fwd_pallas_fm(x, ln, wq, wk, wv, fw, fb, *, n_head: int,
                   diag_mask: bool, interpret: bool = False):
    E, L, d = x.shape
    dk = wq.shape[1] // n_head
    be = _block_edges(E, x.dtype)
    grid = (E // be,)
    kern = partial(_fwd_kernel_fm, L=L, H=n_head, dk=dk, diag_mask=diag_mask)
    x_t = x.transpose(1, 2, 0)                    # (L, d, E) feature-major
    out_t = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, d, be), lambda i: (0, 0, i)),
            pl.BlockSpec((6, d), lambda i: (0, 0)),
            pl.BlockSpec((wq.shape[1], d), lambda i: (0, 0)),
            pl.BlockSpec((wk.shape[1], d), lambda i: (0, 0)),
            pl.BlockSpec((wv.shape[1], d), lambda i: (0, 0)),
            pl.BlockSpec(fw.shape, lambda i: (0, 0)),
            pl.BlockSpec(fb.shape, lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((L, d, be), lambda i: (0, 0, i)),
        out_shape=jax.ShapeDtypeStruct((L, d, E), x.dtype),
        interpret=interpret,
    )(x_t, ln, wq.T, wk.T, wv.T, fw, fb)
    return out_t.transpose(2, 0, 1)


def _bwd_kernel_fm(x_ref, ln_ref, wqt_ref, wkt_ref, wvt_ref, fw_ref, fb_ref,
                   g_ref, gx_ref, gln_ref, gwqt_ref, gwkt_ref, gwvt_ref,
                   gfw_ref, gfb_ref, *, L: int, H: int, dk: int,
                   diag_mask: bool):
    """Feature-major fused backward: same recompute-in-VMEM structure as
    _bwd_kernel, with per-head reduce/broadcast as sublane-group ops."""
    _, d, be = x_ref.shape
    hd = H * dk
    f32 = jnp.float32
    ln = ln_ref[...]

    def ln_fwd(x, g, b, eps=1e-5):
        x32 = x.astype(f32)
        mu = jnp.mean(x32, axis=0, keepdims=True)
        var = jnp.var(x32, axis=0, keepdims=True)
        inv_sigma = jax.lax.rsqrt(var + eps)
        xhat = (x32 - mu) * inv_sigma
        return ((xhat * g[:, None] + b[:, None]).astype(x.dtype),
                xhat, inv_sigma)

    xq, xk, xv = [], [], []
    xhat_q, xhat_k, xhat_v = [], [], []
    is_q, is_k, is_v = [], [], []
    q, k, v = [], [], []
    for i in range(L):
        xi = _ffm(x_ref, i)
        a_, h_, s_ = ln_fwd(xi, ln[0], ln[1])
        xq.append(a_); xhat_q.append(h_); is_q.append(s_)
        a_, h_, s_ = ln_fwd(xi, ln[2], ln[3])
        xk.append(a_); xhat_k.append(h_); is_k.append(s_)
        a_, h_, s_ = ln_fwd(xi, ln[4], ln[5])
        xv.append(a_); xhat_v.append(h_); is_v.append(s_)
        # q/k in input dtype (the fwd kernel's recompute precision), v in f32;
        # all (H, dk, be): head reduce = axis-1 sum, attention apply =
        # implicit (H, 1, be) broadcast (see _fwd_kernel_fm)
        q.append(jnp.dot(wqt_ref[...], xq[i],
                         preferred_element_type=f32)
                 .astype(xi.dtype).reshape(H, dk, be))
        k.append(jnp.dot(wkt_ref[...], xk[i],
                         preferred_element_type=f32)
                 .astype(xi.dtype).reshape(H, dk, be))
        v.append(jnp.dot(wvt_ref[...], xv[i],
                         preferred_element_type=f32).reshape(H, dk, be))

    inv_temp = 1.0 / math.sqrt(dk)

    # forward softmax recompute, saving attn weights a[i][j] (H, be)
    a = [[None] * L for _ in range(L)]
    attn_out = []
    for i in range(L):
        s = []
        for j in range(L):
            if diag_mask and i == j:
                s.append(jnp.full((H, be), -1e32, dtype=f32))
                continue
            prod = (q[i] * k[j]).astype(f32)
            s.append(jnp.sum(prod, axis=1) * inv_temp)
        m = s[0]
        for j in range(1, L):
            m = jnp.maximum(m, s[j])
        e = [jnp.exp(sj - m) for sj in s]
        tot = e[0]
        for j in range(1, L):
            tot = tot + e[j]
        inv = 1.0 / tot
        acc = jnp.zeros((H, dk, be), dtype=f32)
        for j in range(L):
            a[i][j] = e[j] * inv
            acc = acc + a[i][j][:, None, :] * v[j]
        attn_out.append(acc.reshape(hd, be))                  # (hd, be) f32

    # fc1 backward (g_ref is (L, d, be))
    g_y = [g_ref[i].astype(f32) for i in range(L)]
    gfb_c = g_y[0]
    for i in range(1, L):
        gfb_c = gfb_c + g_y[i]
    gfb_c = jnp.sum(gfb_c, axis=1)                            # (d,)
    gfw_c = jnp.zeros((hd, d), dtype=f32)
    g_attn = []
    for i in range(L):
        gfw_c = gfw_c + jax.lax.dot_general(
            attn_out[i], g_y[i], (((1,), (1,)), ((), ())),
            preferred_element_type=f32)                        # (hd, d)
        g_attn.append(jnp.dot(fw_ref[...].astype(f32), g_y[i],
                              preferred_element_type=f32)
                      .reshape(H, dk, be))

    # attention backward
    gq = [jnp.zeros((H, dk, be), f32) for _ in range(L)]
    gk = [jnp.zeros((H, dk, be), f32) for _ in range(L)]
    gv = [jnp.zeros((H, dk, be), f32) for _ in range(L)]
    for i in range(L):
        g_acc = g_attn[i]
        ga = []
        for j in range(L):
            if diag_mask and i == j:
                ga.append(jnp.zeros((H, be), f32))
                continue
            ga.append(jnp.sum(g_acc * v[j], axis=1))
            gv[j] = gv[j] + a[i][j][:, None, :] * g_acc
        dot_i = jnp.zeros((H, be), f32)
        for j in range(L):
            dot_i = dot_i + a[i][j] * ga[j]
        for j in range(L):
            if diag_mask and i == j:
                continue
            g_s = (a[i][j] * (ga[j] - dot_i)
                   * inv_temp)[:, None, :]                    # (H, 1, be)
            gq[i] = gq[i] + g_s * k[j]
            gk[j] = gk[j] + g_s * q[i]

    # projections backward + LayerNorm backward, per position
    def ln_bwd(g_out, xhat, inv_sigma, g):
        gg = jnp.sum(g_out * xhat, axis=1)                    # (d,)
        gb = jnp.sum(g_out, axis=1)
        gxh = g_out * g[:, None]
        gx = inv_sigma * (gxh
                          - jnp.mean(gxh, axis=0, keepdims=True)
                          - xhat * jnp.mean(gxh * xhat, axis=0,
                                            keepdims=True))
        return gx, gg, gb

    gwq_c = jnp.zeros((hd, d), f32)
    gwk_c = jnp.zeros((hd, d), f32)
    gwv_c = jnp.zeros((hd, d), f32)
    ggq = gbq = ggk = gbk = ggv = gbv = jnp.zeros((d,), f32)
    for i in range(L):
        gq2 = gq[i].reshape(hd, be)
        gk2 = gk[i].reshape(hd, be)
        gv2 = gv[i].reshape(hd, be)
        gwq_c = gwq_c + jax.lax.dot_general(
            gq2, xq[i].astype(f32), (((1,), (1,)), ((), ())),
            preferred_element_type=f32)
        gwk_c = gwk_c + jax.lax.dot_general(
            gk2, xk[i].astype(f32), (((1,), (1,)), ((), ())),
            preferred_element_type=f32)
        gwv_c = gwv_c + jax.lax.dot_general(
            gv2, xv[i].astype(f32), (((1,), (1,)), ((), ())),
            preferred_element_type=f32)
        g_xq = jax.lax.dot_general(wqt_ref[...].astype(f32), gq2,
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=f32)  # (d, be)
        g_xk = jax.lax.dot_general(wkt_ref[...].astype(f32), gk2,
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=f32)
        g_xv = jax.lax.dot_general(wvt_ref[...].astype(f32), gv2,
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=f32)
        gx_q, gg, gb = ln_bwd(g_xq, xhat_q[i], is_q[i], ln[0])
        ggq = ggq + gg; gbq = gbq + gb
        gx_k, gg, gb = ln_bwd(g_xk, xhat_k[i], is_k[i], ln[2])
        ggk = ggk + gg; gbk = gbk + gb
        gx_v, gg, gb = ln_bwd(g_xv, xhat_v[i], is_v[i], ln[4])
        ggv = ggv + gg; gbv = gbv + gb
        gx_ref[i] = (gx_q + gx_k + gx_v).astype(x_ref.dtype)

    gln_c = jnp.stack([ggq, gbq, ggk, gbk, ggv, gbv])         # (6, d)

    @pl.when(pl.program_id(0) == 0)
    def _():
        gln_ref[...] = jnp.zeros_like(gln_ref)
        gwqt_ref[...] = jnp.zeros_like(gwqt_ref)
        gwkt_ref[...] = jnp.zeros_like(gwkt_ref)
        gwvt_ref[...] = jnp.zeros_like(gwvt_ref)
        gfw_ref[...] = jnp.zeros_like(gfw_ref)
        gfb_ref[...] = jnp.zeros_like(gfb_ref)

    gln_ref[...] += gln_c
    gwqt_ref[...] += gwq_c
    gwkt_ref[...] += gwk_c
    gwvt_ref[...] += gwv_c
    gfw_ref[...] += gfw_c
    gfb_ref[...] += gfb_c


def _bwd_block_edges_fm(E: int, dtype, L: int, hd: int) -> int:
    """Feature-major blocks put edges on the LANE axis, so be must be a
    multiple of 128 (or the whole array).  The kernel requests a 64 MB
    scoped-VMEM window (see _bwd_pallas_fm) — the live set is ~9
    f32-equivalent (hd, be) buffers per position (q/k at input dtype,
    v/gq/gk/gv/attn_out/g_attn f32), and larger blocks amortize the
    per-vector-op issue cost (measured: be 128 -> 512 is 2.90 -> 2.67
    ms/step at the bench shape)."""
    be = 512
    while E % be != 0 and be > 1:
        be //= 2
    while be > 128 and 9 * L * be * hd * 4 >= 48 * 2 ** 20:
        be //= 2
    return be


def _bwd_pallas_fm(x, ln, wq, wk, wv, fw, fb, g, *, n_head: int,
                   diag_mask: bool, interpret: bool = False):
    E, L, d = x.shape
    hd = wq.shape[1]
    dk = hd // n_head
    be = _bwd_block_edges_fm(E, x.dtype, L, hd)
    grid = (E // be,)
    kern = partial(_bwd_kernel_fm, L=L, H=n_head, dk=dk, diag_mask=diag_mask)
    x_t = x.transpose(1, 2, 0)
    g_t = g.transpose(1, 2, 0)
    f32 = jnp.float32
    gx_t, gln, gwqt, gwkt, gwvt, gfw, gfb = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, d, be), lambda i: (0, 0, i)),
            pl.BlockSpec((6, d), lambda i: (0, 0)),
            pl.BlockSpec((hd, d), lambda i: (0, 0)),
            pl.BlockSpec((hd, d), lambda i: (0, 0)),
            pl.BlockSpec((hd, d), lambda i: (0, 0)),
            pl.BlockSpec(fw.shape, lambda i: (0, 0)),
            pl.BlockSpec(fb.shape, lambda i: (0,)),
            pl.BlockSpec((L, d, be), lambda i: (0, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((L, d, be), lambda i: (0, 0, i)),
            pl.BlockSpec((6, d), lambda i: (0, 0)),           # accumulated
            pl.BlockSpec((hd, d), lambda i: (0, 0)),
            pl.BlockSpec((hd, d), lambda i: (0, 0)),
            pl.BlockSpec((hd, d), lambda i: (0, 0)),
            pl.BlockSpec(fw.shape, lambda i: (0, 0)),
            pl.BlockSpec(fb.shape, lambda i: (0,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, d, E), x.dtype),
            jax.ShapeDtypeStruct((6, d), f32),
            jax.ShapeDtypeStruct((hd, d), f32),
            jax.ShapeDtypeStruct((hd, d), f32),
            jax.ShapeDtypeStruct((hd, d), f32),
            jax.ShapeDtypeStruct(fw.shape, f32),
            jax.ShapeDtypeStruct(fb.shape, f32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2 ** 20),
        interpret=interpret,
    )(x_t, ln, wq.T, wk.T, wv.T, fw, fb, g_t)
    return (gx_t.transpose(2, 0, 1), gln.astype(ln.dtype),
            gwqt.T.astype(wq.dtype), gwkt.T.astype(wk.dtype),
            gwvt.T.astype(wv.dtype), gfw.astype(fw.dtype),
            gfb.astype(fb.dtype))


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

# kernel layout: "fm" (feature-major, default — no MXU lane waste on the
# per-head reduce/broadcast) or "lane" (lane-major seg-matmul form)
import os as _os
_ATTN_IMPL = _os.environ.get("MATCHA_ATTN_IMPL", "fm")


@partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def hyperedge_attention(x, ln, wq, wk, wv, fw, fb, n_head: int,
                        diag_mask: bool = True, use_pallas: bool = True):
    """Fused LN -> qkv -> diag-masked attention -> fc1.

    x: (E, L, d); ln: (6, d) packed [qg qb kg kb vg vb]; wq/wk/wv: (d, h*dk);
    fw: (h*dk, d); fb: (d,).  Returns (E, L, d)."""
    if use_pallas:
        # feature-major blocks put edges on the TPU lane axis, where Mosaic
        # needs 128-multiples; fall back to the lane-major kernel otherwise
        use_fm = _ATTN_IMPL == "fm" and x.shape[0] % 128 == 0
        fwd = _fwd_pallas_fm if use_fm else _fwd_pallas
        return fwd(x, ln, wq, wk, wv, fw, fb, n_head=n_head,
                   diag_mask=diag_mask)
    return _fwd_xla(x, ln, wq, wk, wv, fw, fb, n_head=n_head,
                    diag_mask=diag_mask)


def _vjp_fwd(x, ln, wq, wk, wv, fw, fb, n_head, diag_mask, use_pallas):
    y = hyperedge_attention(x, ln, wq, wk, wv, fw, fb, n_head, diag_mask,
                            use_pallas)
    return y, (x, ln, wq, wk, wv, fw, fb)


def _vjp_bwd(n_head, diag_mask, use_pallas, res, g):
    x, ln, wq, wk, wv, fw, fb = res
    if use_pallas:
        use_fm = _ATTN_IMPL == "fm" and x.shape[0] % 128 == 0
        bwd = _bwd_pallas_fm if use_fm else _bwd_pallas
        return bwd(x, ln, wq, wk, wv, fw, fb, g, n_head=n_head,
                   diag_mask=diag_mask)
    # recompute-based backward through the XLA reference formulation
    def f(x, ln, wq, wk, wv, fw, fb):
        return _fwd_xla(x, ln, wq, wk, wv, fw, fb, n_head=n_head,
                        diag_mask=diag_mask)
    _, vjp = jax.vjp(f, x, ln, wq, wk, wv, fw, fb)
    return vjp(g)


hyperedge_attention.defvjp(_vjp_fwd, _vjp_bwd)
