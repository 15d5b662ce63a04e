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


# Dispatch rule (re-measured 2026-08-20 after the transposed-layout
# kernel rewrite, scripts/probe_flash_attn.py): at the spatial S = 2208
# shapes the Pallas kernel beats XLA at EVERY folded batch — 29.5 vs
# 13.5 TF/s at rows=2, 44.1 vs 15.8 at rows=8 (the old [S, Dh] layout
# lane-padded Dh 48 -> 128 and lost to XLA at small batch; the Dh-on-
# sublanes rewrite removed that 2.67x tax).  XLA also cannot run the
# large-batch shapes at all (the materialized S×S logits reach tens of
# GB).  Short-K attention (the temporal T <= 20 axis) stays on XLA: the
# kernel would lane-pad Sk 20 -> 128 (6.4x waste) while XLA's fused
# softmax handles tiny logits well.
_PALLAS_MIN_SK = 512


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
        Sk = k.shape[1]
        if Sk >= _PALLAS_MIN_SK:
            return flash_attention(q, k, v, causal=causal)
        return sdpa(q, k, v, causal)

    return dispatch
