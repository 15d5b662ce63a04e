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


# Above this many attention-logit elements (B*H*Sq*Sk), the XLA path's
# materialized S×S buffer becomes the memory bottleneck (e.g. batched
# multi-scene rollouts: B*T=160 folded rows × 16 heads × 2208² ≈ 50 GB
# fp32) and the Pallas kernel — which never materializes logits — wins.
# Below it, XLA's fused softmax is measurably faster at this model's
# head_dim (48) on v5e, so it stays the small-shape default.
_PALLAS_LOGITS_THRESHOLD = 2 ** 29   # ≈0.5G elems ≈ 2 GB fp32 logits


@functools.lru_cache(maxsize=1)
def best_attn_impl() -> Callable:
    """Return the fastest available attention implementation for this
    backend, with the sdpa signature (q, k, v [B,S,H,Dh], causal).

    Shapes are static at trace time, so the dispatch below specializes per
    call site inside jit."""
    if not _on_tpu():
        return sdpa
    try:
        from umgen_tpu.ops.flash_attention import flash_attention
    except Exception:
        return sdpa

    def dispatch(q, k, v, causal):
        B, Sq, H, _ = q.shape
        Sk = k.shape[1]
        if B * H * Sq * Sk >= _PALLAS_LOGITS_THRESHOLD:
            return flash_attention(q, k, v, causal=causal)
        return sdpa(q, k, v, causal)

    return dispatch
