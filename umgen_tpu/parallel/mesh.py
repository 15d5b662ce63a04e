"""Device mesh and sharding rules.

The reference's entire parallelism story is implicit Lightning data-parallel
over GPUs (ref:tools/model_pl.py:13) plus an unused ``--launcher torch|mpi``
flag.  Here parallelism is first-class and XLA-native:

* mesh axes: ``dp`` shards scene rollouts / the training batch,
  ``tp`` shards attention heads, FFN columns and vocabulary slices
  (Megatron-style column→row pairs, so each block needs one psum on the row
  projection — inserted automatically by GSPMD from these annotations).
* the OAR KV cache shards batch over ``dp`` and heads over ``tp``, so
  decode-time attention is fully local to each chip.

Single-host multi-chip rides ICI; multi-host (DCN) initializes with
``jax.distributed.initialize`` (the ``--launcher`` flag's TPU equivalent).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, tp: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = dp * tp
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(dev, ("dp", "tp"))


# ---------------------------------------------------------------------------
# param partitioning
# ---------------------------------------------------------------------------
def _spec_for(path: str, ndim: int) -> P:
    """PartitionSpec by param-tree path.

    Stacked layer params carry a leading L axis (never sharded).  Rules:
      qkv / q/k/v / mlp fc (column-parallel): out-dim on tp
      proj (row-parallel): in-dim on tp
      heads (vocab-parallel): out-dim on tp
      embeddings & codebooks: vocab dim on tp
      norms, biases of row-parallel projections: replicated
    """
    def last(*axes):
        # pad spec to ndim from the right (leading axes unsharded)
        return P(*([None] * (ndim - len(axes)) + list(axes)))

    if re.search(r"(qkv|mlp\w*/fc|cross_attn/[qkv])(/w)$", path):
        return last(None, "tp")
    if re.search(r"(qkv|mlp\w*/fc|cross_attn/[qkv])(/b)$", path):
        return last("tp")
    if re.search(r"proj/w$", path):
        return last("tp", None)
    if re.search(r"head_\w+/w$", path):
        return last(None, "tp")
    if re.search(r"^(be|spe|tpe|axe|egoe|tske)$", path):
        return last(None)          # small embeddings: replicate
    if re.search(r"buffers/(map|img)_codebook$", path):
        return last(None)
    return P(*([None] * ndim))


def _tree_paths(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _tree_paths(v, f"{prefix}/{k}" if prefix else str(k))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _tree_paths(v, f"{prefix}/{i}")
    else:
        yield prefix, tree


def param_sharding(params, mesh: Mesh) -> Any:
    """Pytree of NamedShardings matching `params`."""
    flat = dict(_tree_paths(params))
    specs = {p: NamedSharding(mesh, _spec_for(p, np.ndim(v)))
             for p, v in flat.items()}

    def build(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: build(v, f"{prefix}/{k}" if prefix else str(k))
                    for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return type(tree)(build(v, f"{prefix}/{i}")
                              for i, v in enumerate(tree))
        return specs[prefix]

    return build(params)


def data_sharding(mesh: Mesh, *batch_axes_then_none: int):
    """NamedSharding with batch on dp: data_sharding(mesh, ndim)."""
    ndim = batch_axes_then_none[0]
    return NamedSharding(mesh, P(*(["dp"] + [None] * (ndim - 1))))


def shard_params(params, mesh: Mesh):
    return jax.device_put(params, param_sharding(params, mesh))


# ---------------------------------------------------------------------------
# inference-cache sharding (temporal-cache rollouts)
# ---------------------------------------------------------------------------
def _ring_spec(shape, mesh: Mesh) -> P:
    """TAR ring [L, B*S, T_max, H, Dh]: scenes on dp (dim1 is B-major so a
    dp split along it is a scene split), heads on tp."""
    dp = mesh.shape.get("dp", 1)
    tp = mesh.shape.get("tp", 1)
    return P(None,
             "dp" if shape[1] % dp == 0 and dp > 1 else None,
             None,
             "tp" if shape[3] % tp == 0 and tp > 1 else None,
             None)


def constrain_rollout_cache(cache, mesh: Optional[Mesh]):
    """`lax.with_sharding_constraint` on every TAR ring in the cache dict.

    Applied inside the jitted prefill/step so GSPMD keeps the multi-GB
    rings distributed (scene batch over dp, heads over tp) instead of
    replicating carried state.  No-op without a mesh."""
    if mesh is None or mesh.size == 1:
        return cache

    def walk(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim == 5:
            return jax.lax.with_sharding_constraint(
                leaf, NamedSharding(mesh, _ring_spec(leaf.shape, mesh)))
        return leaf

    return jax.tree.map(walk, cache)


def shard_batch(batch: Dict[str, Any], mesh: Mesh):
    return {k: jax.device_put(v, data_sharding(mesh, np.ndim(v)))
            for k, v in batch.items()}
