"""Orbax-backed checkpointing (async-capable, multi-host-safe).

The reference checkpoints a torch state-dict pickle per best validation AUPRC
(ref Code/main.py:316-322).  The single-host pickle path in
``train/runtime.py`` keeps that artifact parity; THIS module is the
production path for the multi-controller world where pickling device arrays
is wrong (non-addressable shards) and where the save should overlap training:

  * orbax writes each host's addressable shards in parallel (no host-0
    gather), restoring to the same sharding layout on load
  * saves run asynchronously — the training loop keeps stepping while the
    previous checkpoint flushes to disk
  * a CheckpointManager retains the best/latest step and garbage-collects
    the rest

Usage (see Trainer.fit(checkpoint_format="orbax")):

    ckpt = OrbaxCheckpointer(dir)            # async by default
    ckpt.save(step, params, opt_state, epoch)
    params, opt_state, epoch = ckpt.restore(step=None, like=params_like)
    ckpt.close()                             # waits for pending writes
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax


class OrbaxCheckpointer:
    """Thin wrapper around an async orbax CheckpointManager holding
    {params, opt_state, meta} as one composite per step."""

    def __init__(self, directory: str, max_to_keep: int = 1,
                 async_save: bool = True):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        directory = os.path.abspath(directory)
        if jax.process_index() == 0:
            os.makedirs(directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            enable_async_checkpointing=async_save)
        self.manager = ocp.CheckpointManager(directory, options=options)

    # ------------------------------------------------------------------ save
    def save(self, step: int, params: Any, opt_state: Any = None,
             epoch: Optional[int] = None, key: Any = None,
             best: Optional[float] = None) -> None:
        """Async save of (params, opt_state, epoch[, key, best]) under
        `step`.  Returns immediately; the write completes in the background
        (close() or the next save joins it).  key/best enable exact
        mid-stage resume (the trainer RNG key as raw uint32 words and the
        running best-metric value, stored in the JSON meta)."""
        import numpy as np
        ocp = self._ocp
        items = {"params": ocp.args.StandardSave(params)}
        if opt_state is not None:
            items["opt_state"] = ocp.args.StandardSave(opt_state)
        meta = {"epoch": -1 if epoch is None else int(epoch)}
        if key is not None:
            meta["key"] = np.asarray(jax.device_get(key),
                                     np.uint32).tolist()
        if best is not None:
            meta["best"] = float(best)
        items["meta"] = ocp.args.JsonSave(meta)
        self.manager.save(step, args=ocp.args.Composite(**items))

    # --------------------------------------------------------------- restore
    def restore(self, step: Optional[int] = None, like_params: Any = None,
                like_opt_state: Any = None
                ) -> Tuple[Any, Any, Optional[int]]:
        """Restore (params, opt_state, epoch).  `like_*` pytrees (e.g. the
        current abstract state) guide sharding/dtype restoration; without
        them arrays come back as host numpy."""
        ocp = self._ocp
        self.manager.wait_until_finished()
        if step is None:
            step = self.manager.latest_step()
        if step is None:
            raise FileNotFoundError("no orbax checkpoint present")

        def std_restore(like):
            if like is None:
                return ocp.args.StandardRestore()
            abstract = jax.tree_util.tree_map(
                ocp.utils.to_shape_dtype_struct, like)
            return ocp.args.StandardRestore(abstract)

        kwargs = {"params": std_restore(like_params),
                  "meta": ocp.args.JsonRestore()}
        # restore opt_state only when the caller wants it AND the
        # checkpoint has it: a missing item crashes orbax, and reading the
        # full optimizer state to discard it wastes disk + host memory
        if like_opt_state is not None and self._has_item(step, "opt_state"):
            kwargs["opt_state"] = std_restore(like_opt_state)
        out = self.manager.restore(step, args=ocp.args.Composite(**kwargs))
        # side-channel for resume: the full meta (epoch/key/best) of the
        # step just restored
        self.last_meta = dict(out["meta"])
        epoch = out["meta"].get("epoch", -1)
        return (out["params"], out.get("opt_state"),
                None if epoch == -1 else epoch)

    def _has_item(self, step: int, name: str) -> bool:
        d = self.manager.directory / str(step)
        return (d / name).exists()

    # ------------------------------------------------------------- lifecycle
    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def wait(self) -> None:
        self.manager.wait_until_finished()

    def close(self) -> None:
        self.manager.wait_until_finished()
        self.manager.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
