"""Small utilities: parameter summaries, adjacency helpers, profiling hooks."""

from __future__ import annotations

import contextlib
from typing import Dict, Tuple

import jax
import numpy as np


def param_count(params) -> int:
    """Total trainable parameter count (the reference prints this at startup,
    ref Code/main.py:632-634; note the reference's number also includes its
    dead branches — encode2, fc2, pff_n2, tied-AE decode biases — which never
    receive gradients and are omitted from our pytree, see models docstring)."""
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def param_summary(params, max_depth: int = 3) -> str:
    """Keras/torchsummary-style table of the parameter pytree
    (capability parity with History_version/Code/torchsummary.py)."""
    rows = []

    def walk(tree, path):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, path + [str(k)])
        elif isinstance(tree, (list, tuple)):
            for i, v in enumerate(tree):
                walk(v, path + [str(i)])
        else:
            rows.append((".".join(path), tuple(tree.shape),
                         int(np.prod(tree.shape))))

    walk(params, [])
    grouped: Dict[str, int] = {}
    for name, shape, n in rows:
        key = ".".join(name.split(".")[:max_depth])
        grouped[key] = grouped.get(key, 0) + n
    width = max(len(k) for k in grouped) if grouped else 10
    lines = [f"{'module':<{width}}  params", "-" * (width + 10)]
    for k in sorted(grouped):
        lines.append(f"{k:<{width}}  {grouped[k]:,}")
    lines.append("-" * (width + 10))
    lines.append(f"{'total':<{width}}  {param_count(params):,}")
    return "\n".join(lines)


def edgelist_to_adjacency(flat: np.ndarray, offsets: np.ndarray,
                          num_nodes: int) -> np.ndarray:
    """Clique-expansion co-occurrence adjacency of the hyperedge list
    (ref edgelist2adj, Code/process.py:90-105 — disabled in the reference
    driver but part of its API surface).  Entry (i-1, j-1) counts hyperedges
    containing both nodes i and j (i != j)."""
    adj = np.zeros((num_nodes, num_nodes))
    for a in range(len(offsets) - 1):
        e = flat[offsets[a]:offsets[a + 1]]
        i, j = np.meshgrid(e, e, indexing="ij")
        mask = i != j
        np.add.at(adj, (i[mask] - 1, j[mask] - 1), 1)
    return adj


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """jax.profiler trace scope (SURVEY §5.1: the reference has only
    wall-clock prints; we expose real TPU traces)."""
    if log_dir is None:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


_compile_cache_enabled = False


def enable_compile_cache(cache_dir: str = "/tmp/matcha_jax_cache") -> None:
    """Persistent XLA executable cache: repeat invocations (bench reruns,
    restarted training jobs) skip the multi-minute TPU compile.  Library
    code calls this from ``run_train``/``Trainer`` so the SHIPPED path gets
    the same warm-start as the benched one (it was script-only before).
    Idempotent; empty ``cache_dir`` disables."""
    global _compile_cache_enabled
    if _compile_cache_enabled or not cache_dir:
        return
    _compile_cache_enabled = True
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


_loop_runtime_warmed = False


def warm_loop_runtime() -> None:
    """Asynchronously dispatch a trivial ``lax.scan`` program.

    On remote/tunneled TPU backends the FIRST while-loop-containing program
    a process executes pays a large one-time runtime initialization
    (measured here: a 20-step tanh scan that compiles in 0.5 s takes
    200-580 s on first execution; every subsequent scan program — including
    completely different ones — runs immediately).  Dispatching this
    trivial loop as early as possible, WITHOUT blocking on the result, lets
    that server-side init overlap host-side setup, tracing, and local XLA
    compilation instead of serializing in front of the first real epoch.

    No-op on CPU (init is cheap there) and after the first call.
    """
    global _loop_runtime_warmed
    if _loop_runtime_warmed or jax.default_backend() == "cpu":
        return
    _loop_runtime_warmed = True
    import jax.numpy as jnp

    def _loop(x):
        return jax.lax.scan(lambda c, _: (jnp.tanh(c), ()), x, None,
                            length=2)[0]
    # async dispatch: intentionally NOT blocked on
    jax.jit(_loop)(jnp.zeros((8,), jnp.float32))
