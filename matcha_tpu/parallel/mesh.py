"""Multi-chip SPMD layer: mesh + sharding rules.

The reference has NO distributed backend (SURVEY §2.15 — single GPU, fork
pools, file handoff).  This module is the TPU-native scaling design mandated
by BASELINE.json:

  mesh axes: ("data", "model")
    data  — hyperedge batches sharded across chips (the natural axis: the
            per-batch loop at ref Code/main.py:155-187 is embarrassingly
            parallel); gradients reduced with psum by XLA.
    model — the node axis of the big frozen tables (per-chromosome corrcoef
            feature blocks and the inter-chrom z-scored target matrix) plus
            the matching rows of the tied-autoencoder input weights.  The
            per-chromosome block structure (ref Code/main.py:569-577) maps
            directly onto node-range shards; XLA inserts the all-gather of
            the (N, dim) encoded node table — a small collective that rides
            ICI and overlaps with the batch compute.

  Sequence/context/pipeline parallelism are structurally N/A: attention
  length is the hyperedge cardinality (<= 5, SURVEY §5.7) and the model is
  two layers deep.  Expert parallelism has no experts to shard.  They are
  intentionally not faked here.

Everything goes through plain ``jax.jit`` with NamedSharding-placed inputs —
computation follows data; no hand-written collectives needed at this scale.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from matcha_tpu.models.hypersagnn import FrozenTables


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"mesh {n_data}x{n_model} != {len(devices)} devices")
    return Mesh(devices.reshape(n_data, n_model), ("data", "model"))


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def param_sharding(params: Dict, mesh: Mesh,
                   tensor_parallel: bool = False) -> Dict:
    """Parameter placement.

    Default: fully replicated.  The trainable stack is small (the big
    tensors are the FROZEN tables — the per-chrom corrcoef features and
    inter_z, handled by frozen_sharding); replicating params turns the batch
    "data" axis into plain data parallelism with XLA-inserted psum gradient
    reduction over ICI.  The largest params (tied-AE input weights, ~n_c*d
    each) are well under a megabyte per chromosome at 100 kb resolution.

    tensor_parallel=True additionally shards the attention matmuls on the
    "model" axis Megatron-style — q/k/v projections column-sharded over
    heads, fc1 row-sharded so its output needs one psum — for configurations
    where d_model*heads grows beyond the replication sweet spot."""
    def place(path, leaf):
        if tensor_parallel:
            keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
            if keys[-1] in ("wq", "wk", "wv"):
                return _ns(mesh, None, "model")   # (d, h*dk) cols = heads
            if "fc1" in keys and keys[-1] == "w":
                return _ns(mesh, "model", None)   # (h*dk, d) rows = heads
        return _ns(mesh)
    return jax.tree_util.tree_map_with_path(place, params)


def pad_frozen_for_mesh(frozen: FrozenTables, mesh: Mesh) -> FrozenTables:
    """Zero-pad the row counts of the row-sharded tables to a multiple of the
    "model" axis (encode_node_table slices pads off; inter_z pad rows are
    never gathered since node ids are < the true row count)."""
    import jax.numpy as jnp
    m = mesh.shape["model"]

    def pad(a):
        extra = (-a.shape[0]) % m
        if extra == 0:
            return a
        return jnp.concatenate(
            [a, jnp.zeros((extra,) + a.shape[1:], a.dtype)], axis=0)

    return frozen._replace(features=tuple(pad(f) for f in frozen.features),
                           inter_z=pad(frozen.inter_z))


def frozen_sharding(frozen: FrozenTables, mesh: Mesh) -> FrozenTables:
    """Frozen-table placement: big node-axis tables row-sharded on "model"."""
    return FrozenTables(
        features=tuple(_ns(mesh, "model", None) for _ in frozen.features),
        attr_table=_ns(mesh),
        inter_z=_ns(mesh, "model", None),
        chrom_of_node=_ns(mesh),
        chrom_bounds=_ns(mesh),
    )


def batch_sharding(mesh: Mesh, ndim: int, stacked: bool = True) -> NamedSharding:
    """Hyperedge batches: shard the batch axis on "data".

    stacked=True: epoch arrays (num_batch, B[, k]) — axis 1 is the batch axis.
    stacked=False: a single batch (B[, k]) — axis 0."""
    if stacked:
        return _ns(mesh, None, "data", *([None] * (ndim - 2)))
    return _ns(mesh, "data", *([None] * (ndim - 1)))


def shard_train_inputs(mesh: Mesh, params, frozen: FrozenTables, batch):
    """Place everything under its sharding rule (the same path the Trainer
    uses): pad the row-sharded frozen tables to the model axis, then
    put_global so the placement is multi-process safe."""
    from matcha_tpu.parallel.distributed import put_global
    params = jax.tree_util.tree_map(put_global, params,
                                    param_sharding(params, mesh))
    frozen = pad_frozen_for_mesh(frozen, mesh)
    frozen = jax.tree_util.tree_map(put_global, frozen,
                                    frozen_sharding(frozen, mesh))
    batch = jax.tree_util.tree_map(
        lambda x: put_global(x, batch_sharding(mesh, x.ndim)), batch)
    return params, frozen, batch


# ----------------------------------------------------------- active mesh
# Pallas custom calls have no GSPMD partitioning rule: under a sharded jit
# they force XLA to all-gather their operands and run replicated on every
# chip (measured: 18 all-gathers for one attention call on an 8-way data
# mesh).  Model code therefore wraps its Pallas kernels in `jax.shard_map`
# over the mesh's batch axes when a mesh is active.  The mesh is consulted
# at TRACE time, so the Trainer scopes it to each of its own jitted calls
# with `using_active_mesh` — a set-and-forget global would let a second
# Trainer (or none) silently change what an earlier Trainer's
# still-untraced functions compile with.
#
# Mixed data x model meshes: the kernels' batch axis is still pure-DP
# inside a model-sharded program — every replicated-weight kernel input
# (attention weights, the all-gathered encoded node table) stays replicated
# when params are replicated — so the wrapper shards the batch dimension
# over BOTH axes jointly (P(("data", "model"))), using every chip.  Only
# tensor_parallel (Megatron-sharded attention weights) disqualifies the
# kernels: the Trainer then installs no kernel mesh and warns (the XLA
# paths remain GSPMD-correct).

_ACTIVE_MESH: Optional[Mesh] = None


def set_active_mesh(mesh: Optional[Mesh]) -> None:
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


@contextmanager
def using_active_mesh(mesh: Optional[Mesh]):
    """Install ``mesh`` as the active mesh for the duration of a (possibly
    trace-triggering) call; restores the previous value on exit."""
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    try:
        yield
    finally:
        _ACTIVE_MESH = prev


def active_data_mesh() -> Optional[Mesh]:
    """The mesh Pallas kernels should shard_map over, or None.

    Data-parallel and mixed data x model meshes qualify (the batch shards
    over both axes jointly — kernel weight inputs are replicated whenever
    params are replicated).  Tensor-parallel configurations must not
    install a kernel mesh (the Trainer passes None): their attention
    weights are model-sharded, which the P() in_specs would mis-declare."""
    m = _ACTIVE_MESH
    if m is None or int(np.prod(list(m.shape.values()))) <= 1:
        return None
    return m


def kernel_axes(mesh: Mesh) -> tuple:
    """The mesh axes a kernel's batch dimension shards over."""
    return tuple(a for a in ("data", "model")
                 if int(mesh.shape.get(a, 1)) > 1) or ("data",)


def kernel_batch_factor(mesh: Optional[Mesh]) -> int:
    """Total shard count of the kernel batch axis (divisibility checks)."""
    if mesh is None:
        return 1
    return int(np.prod([int(mesh.shape[a]) for a in kernel_axes(mesh)]))


def to_varying(x, axes=("data",)):
    """Mark a replicated shard_map input as device-varying so its cotangent
    is psummed by the transpose (pcast/pvary compat)."""
    axes = (axes,) if isinstance(axes, str) else tuple(axes)
    try:
        return jax.lax.pcast(x, axes, to="varying")
    except (AttributeError, TypeError):
        return jax.lax.pvary(x, axes)


def data_shard_map(fn, mesh: Mesh, n_sharded: int, n_replicated: int,
                   check_vma: bool = True):
    """shard_map ``fn`` over the mesh's batch axes: the first ``n_sharded``
    arguments shard their leading dim over P(kernel_axes) — ("data",) on a
    pure-DP mesh, ("data", "model") jointly on a mixed mesh — the remaining
    ``n_replicated`` are P() (replicated) and, under check_vma,
    pcast-to-varying so the shard_map transpose psums their per-shard
    gradient partials.  The shared wrapper for every Pallas call site
    (custom calls have no GSPMD rule)."""
    from jax.sharding import PartitionSpec as P
    axes = kernel_axes(mesh)

    def inner(*args):
        sharded = args[:n_sharded]
        reps = args[n_sharded:]
        if check_vma:
            reps = tuple(to_varying(r, axes) for r in reps)
        return fn(*sharded, *reps)

    return jax.shard_map(
        inner, mesh=mesh, check_vma=check_vma,
        in_specs=(P(axes),) * n_sharded + (P(),) * n_replicated,
        out_specs=P(axes))
