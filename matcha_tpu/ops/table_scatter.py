"""Node-table gather with an MXU one-hot-matmul gradient.

The training step's merged token stream gathers (T, d) embedding rows from
the (N, d) node table (T ~ 229k tokens, N ~ 3k nodes at 1 Mb); the gather's
VJP is a scatter-add back into the table.  XLA lowers that scatter to a
latency-bound random read-modify-write (~7 ns/row on TPU — profiled at
1.57 ms/step, the 3rd-largest step cost).  Dense one-hot algebra is faster
here because N is small: grad(table) = onehot(idx)^T @ g, evaluated
blockwise in VMEM with the one-hot built by an iota compare (VPU) and the
contraction on the MXU — no random memory access at all.

The forward gather stays the XLA gather (it IS fast: its output feeds
compute, and N·d fits VMEM so XLA's row-gather path is fine); only the
backward uses the Pallas kernel.  Reference equivalent being replaced:
implicit autograd of `nn.Embedding`-style lookups (ref Code/Modules.py:58,
`SparseEmbedding.forward` row gather).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _scatter_kernel(idx_ref, g_ref, out_ref, *, bt: int, npad: int):
    idx = idx_ref[...]                                   # (1, bt) int32
    g = g_ref[...]                                       # (bt, d)
    # one-hot transposed: oneT[r, t] = (idx[t] == r) — idx broadcasts along
    # sublanes, iota rows are the table indices
    rows = jax.lax.broadcasted_iota(jnp.int32, (npad, bt), 0)
    one_t = (rows == idx).astype(g.dtype)                # (npad, bt)
    part = jax.lax.dot_general(g, one_t, (((0,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)  # (d,npad)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += part


def _block_tokens(T: int) -> int:
    bt = 512
    while T % bt != 0 and bt > 128:
        bt //= 2
    return bt if T % bt == 0 else 0


# Above this row count the dense one-hot contraction loses to XLA's
# latency-bound scatter-add: the kernel's MXU cost is T*n_rows*d flops
# (linear in the table height) while the scatter is ~7 ns * T rows
# regardless of height.  Crossover ~= 7ns * bf16-peak / (2*d) ~= 11k rows
# at d=64; measured at 100 kb (n_rows=30,896) the kernel costs 2.68
# ms/step vs ~0.9 for the scatter.
SCATTER_MATMUL_MAX_ROWS = 12_288


def scatter_add_matmul(g: jnp.ndarray, idx: jnp.ndarray, n_rows: int,
                       *, interpret: bool = False) -> jnp.ndarray:
    """sum_t onehot(idx[t]) x g[t]: (T, d), (T,) int32 -> (n_rows, d) f32."""
    T, d = g.shape
    npad = ((n_rows + 127) // 128) * 128
    bt = _block_tokens(T)
    if (bt == 0 or n_rows > SCATTER_MATMUL_MAX_ROWS
            or (jax.default_backend() == "cpu" and not interpret)):
        return jnp.zeros((n_rows, d), jnp.float32).at[idx].add(
            g.astype(jnp.float32))
    kern = partial(_scatter_kernel, bt=bt, npad=npad)
    out_t = pl.pallas_call(
        kern,
        grid=(T // bt,),
        in_specs=[
            pl.BlockSpec((1, bt), lambda i: (0, i)),
            pl.BlockSpec((bt, d), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((d, npad), lambda i: (0, 0)),  # accumulated
        out_shape=jax.ShapeDtypeStruct((d, npad), jnp.float32),
        interpret=interpret,
    )(idx.reshape(1, T).astype(jnp.int32), g)
    return out_t[:, :n_rows].T


def _count_kernel(idx_ref, out_ref, *, bt: int, npad: int):
    """Factorized histogram: onehot(idx) = onehot_hi(idx // 128) (x)
    onehot_lo(idx % 128), so the count grid is the MXU outer product
    one_hi @ one_lo^T — (npad/128 + 128) x bt compares instead of the
    flat npad x bt (24x fewer VPU compares at npad=3072; the indicator
    products are exact 0/1 in bf16 and counts <= bt stay exact in the
    f32 MXU accumulator)."""
    idx = idx_ref[...]                                   # (1, bt) int32
    A = npad // 128
    hi = idx // 128
    lo = idx - hi * 128
    rows_a = jax.lax.broadcasted_iota(jnp.int32, (A, bt), 0)
    rows_b = jax.lax.broadcasted_iota(jnp.int32, (128, bt), 0)
    one_hi = (rows_a == hi).astype(jnp.bfloat16)         # (A, bt)
    one_lo = (rows_b == lo).astype(jnp.bfloat16)         # (128, bt)
    cnt = jax.lax.dot_general(one_hi, one_lo, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)  # (A, 128)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += cnt


def bincount_f32(idx: jnp.ndarray, n_rows: int,
                 *, interpret: bool = False) -> jnp.ndarray:
    """Token counts per id: (T,) int32 -> (n_rows,) f32.

    Same iota-compare structure as the scatter kernel, reduced over the
    token lanes — replaces the XLA broadcast-compare-reduce (0.48 ms/step
    at bench scale, T x N boolean tensor materialized through a convert)
    and the .at[].add scatter fallback for large T*N."""
    T = int(np.prod(idx.shape))
    npad = ((n_rows + 127) // 128) * 128
    bt = _block_tokens(T)
    if bt == 0 or (jax.default_backend() == "cpu" and not interpret):
        return jnp.zeros((n_rows,), jnp.float32).at[idx.reshape(-1)].add(1.0)
    kern = partial(_count_kernel, bt=bt, npad=npad)
    out = pl.pallas_call(
        kern,
        grid=(T // bt,),
        in_specs=[pl.BlockSpec((1, bt), lambda i: (0, i))],
        out_specs=pl.BlockSpec((npad // 128, 128),
                               lambda i: (0, 0)),        # accumulated
        out_shape=jax.ShapeDtypeStruct((npad // 128, 128), jnp.float32),
        interpret=interpret,
    )(idx.reshape(1, T).astype(jnp.int32))
    return out.reshape(npad)[:n_rows]


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _tg(table: jnp.ndarray, idx: jnp.ndarray, n_rows: int) -> jnp.ndarray:
    return table[idx]


def _tg_fwd(table, idx, n_rows):
    return table[idx], idx


def _tg_bwd(n_rows, idx, g):
    # cotangent dtype of the output equals the table's (same lookup dtype)
    gt = scatter_add_matmul(g, idx, n_rows).astype(g.dtype)
    return gt, np.zeros(idx.shape, dtype=jax.dtypes.float0)


_tg.defvjp(_tg_fwd, _tg_bwd)


def table_gather(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table[idx] with the scatter-add VJP replaced by the MXU kernel."""
    return _tg(table, idx, int(table.shape[0]))


def table_gather_sharded(table: jnp.ndarray, idx: jnp.ndarray,
                         mesh) -> jnp.ndarray:
    """table_gather shard_mapped over the mesh's "data" axis (Pallas custom
    calls have no GSPMD rule).  The replicated table is pcast-to-varying so
    its gradient partials psum in the shard_map transpose."""
    from matcha_tpu.parallel.mesh import data_shard_map
    return data_shard_map(lambda ii, tt: table_gather(tt, ii),
                          mesh, 1, 1)(idx, table)


def bincount_sharded(idx: jnp.ndarray, n_rows: int, mesh) -> jnp.ndarray:
    """bincount_f32 shard_mapped over the mesh batch axes: per-shard counts
    + psum."""
    from jax.sharding import PartitionSpec as P
    from matcha_tpu.parallel.mesh import kernel_axes
    axes = kernel_axes(mesh)
    return jax.shard_map(
        lambda ii: jax.lax.psum(bincount_f32(ii, n_rows), axes),
        mesh=mesh, in_specs=(P(axes),), out_specs=P())(idx)
