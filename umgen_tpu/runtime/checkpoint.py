"""Param-store checkpointing (orbax) for native save/load + train resume.

The reference is load-only (torch.load of a DeepSpeed dict,
ref:infer_fun.py:43-50); this framework adds a full native store:

* ``save_params`` / ``load_params`` — model params (+buffers) via orbax
* ``save_train_state`` / ``load_train_state`` — params + optimizer state +
  step for elastic training resume
* conversion entry: runtime.torch_import handles the reference's torch
  checkpoints; once imported, everything round-trips through orbax.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _ckptr():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_params(path: str, params: Dict[str, Any]) -> str:
    path = os.path.abspath(path)
    _ckptr().save(path, params, force=True)
    return path


def load_params(path: str, like: Optional[Dict[str, Any]] = None,
                host: bool = False) -> Dict[str, Any]:
    """Restore a param tree.

    ``host=True`` restores every leaf as ``np.ndarray`` on the HOST
    instead of letting orbax device_put them.  On remote-relay TPU
    backends (axon) orbax's direct-to-device restore leaves the arrays
    in a state whose FIRST consumption by a large executable stalls
    ~450-950 s (measured, scripts/probe_serving_stall.py r4a5/r4a7);
    a host restore + plain ``jnp.asarray`` upload — the path serving
    has always used for quantized weights — avoids that entirely.
    """
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = _ckptr()
    if host:
        meta = ckptr.metadata(path).item_metadata
        tree = meta.tree if hasattr(meta, "tree") else meta
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree,
            is_leaf=lambda x: not isinstance(x, (dict, list, tuple)))
        return ckptr.restore(path, restore_args=restore_args)
    if like is not None:
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, like) \
            if hasattr(ocp.utils, "to_shape_dtype_struct") else like
        return ckptr.restore(path, item=target)
    return ckptr.restore(path)


def save_train_state(path: str, state) -> str:
    """state: umgen_tpu.parallel.train.TrainState."""
    tree = {"params": state.params, "buffers": state.buffers,
            "opt_state": state.opt_state, "step": state.step}
    return save_params(path, tree)


def load_train_state(path: str, like) -> Any:
    """Restore a TrainState.  ``like`` fixes the pytree structure only.

    Restores to HOST numpy then uploads with plain jnp.asarray: the
    like-template path needs concrete shardings on cross-backend
    restores (a checkpoint saved on the TPU restored on CPU raises
    "sharding ... should be specified"), and orbax's direct-to-device
    restore stalls the first big executable on relay TPU backends (see
    ``load_params`` host=True).
    """
    import jax.numpy as jnp

    from umgen_tpu.parallel.train import TrainState
    tree = load_params(path, host=True)
    tree = jax.tree.map(
        lambda x: jnp.asarray(x) if hasattr(x, "dtype") else x, tree)
    return TrainState(tree["params"], tree["buffers"], tree["opt_state"],
                      tree["step"])
