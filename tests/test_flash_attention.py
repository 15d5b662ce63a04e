"""Pallas flash-attention parity vs the XLA sdpa oracle (interpret mode).

The kernel only dispatches on TPU above the logits threshold
(ops/attention.py), so without this test its math had no CPU coverage.
Covers the transposed (Dh-on-sublanes) layout of round 3: non-causal
spatial shapes, causal with bottom-right alignment (q shorter than k),
and padding remainders (S not a multiple of 128 or block_q).
"""

import functools as ft

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from umgen_tpu.models.modules import sdpa
from umgen_tpu.ops import flash_attention as fa


@pytest.fixture
def interpret_flash(monkeypatch):
    monkeypatch.setattr(fa.pl, "pallas_call",
                        ft.partial(pl.pallas_call, interpret=True))


@pytest.mark.parametrize("causal,Sq,Sk,block_q", [
    (False, 256, 256, 128),        # square non-causal (spatial attention)
    (False, 552, 552, 256),        # S % 128 != 0 (2208-style remainder)
    (True, 256, 256, 128),         # causal square
    (True, 128, 384, 128),         # causal, q shorter than k
])
def test_flash_matches_sdpa(interpret_flash, causal, Sq, Sk, block_q):
    B, H, Dh = 2, 2, 48
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (B, Sq, H, Dh)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (B, Sk, H, Dh)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (B, Sk, H, Dh)), jnp.float32)
    ref = sdpa(q, k, v, causal)
    out = fa.flash_attention(q, k, v, causal=causal, block_q=block_q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_matches_sdpa_bf16(interpret_flash):
    B, H, Dh, S = 1, 4, 48, 256
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(0, 1, (B, S, H, Dh)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 1, (B, S, H, Dh)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 1, (B, S, H, Dh)), jnp.bfloat16)
    ref = np.asarray(sdpa(q, k, v, False), np.float32)
    out = np.asarray(fa.flash_attention(q, k, v, causal=False),
                     np.float32)
    assert np.abs(out - ref).max() < 0.05
