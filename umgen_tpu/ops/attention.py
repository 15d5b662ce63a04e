"""Attention kernel selection: Pallas flash attention on TPU, XLA fallback.

The reference depends on the external flash-attn CUDA kernels
(ref:projects/models/module.py:10,218-225).  Here the hot spatial/temporal
attentions run through a Pallas TPU flash-attention kernel when available;
`umgen_tpu.models.modules.sdpa` is the always-correct XLA oracle used by
tests and CPU runs.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from umgen_tpu.models.modules import sdpa


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@functools.lru_cache(maxsize=1)
def best_attn_impl() -> Callable:
    """Return the fastest available attention implementation for this
    backend, with the sdpa signature (q, k, v [B,S,H,Dh], causal)."""
    if _on_tpu():
        try:
            from umgen_tpu.ops.flash_attention import flash_attention
            return flash_attention
        except Exception:
            return sdpa
    return sdpa
