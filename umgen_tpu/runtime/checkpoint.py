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


def load_params(path: str, like: Optional[Dict[str, Any]] = None
                ) -> Dict[str, Any]:
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    if like is not None:
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, like) \
            if hasattr(ocp.utils, "to_shape_dtype_struct") else like
        return _ckptr().restore(path, item=target)
    return _ckptr().restore(path)


def save_train_state(path: str, state) -> str:
    """state: umgen_tpu.parallel.train.TrainState."""
    tree = {"params": state.params, "buffers": state.buffers,
            "opt_state": state.opt_state, "step": state.step}
    return save_params(path, tree)


def load_train_state(path: str, like) -> Any:
    from umgen_tpu.parallel.train import TrainState
    tree = load_params(path, like={
        "params": like.params, "buffers": like.buffers,
        "opt_state": like.opt_state, "step": like.step})
    return TrainState(tree["params"], tree["buffers"], tree["opt_state"],
                      tree["step"])
