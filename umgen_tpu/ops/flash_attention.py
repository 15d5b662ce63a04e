"""Pallas TPU fused attention for the TAR/OAR hot paths.

Replaces the reference's external flash-attn CUDA kernels
(ref:projects/models/module.py:10,218-225).  The model's attention extents
are short by LLM standards — spatial S = 2208, temporal T <= 20, OAR prefix
<= 2208 (SURVEY §5.7) — so the whole K/V for one (batch, head) fits VMEM
comfortably.  The kernel therefore blocks only the query dimension and
computes each q-block's full softmax in one shot (no online rescaling),
which is both simpler and faster than streaming flash attention at these
lengths.

Layout note (the round-3 2.6x win): head_dim = 48 is smaller than the
128-lane tile, so the naive [S, Dh] operand layout lane-pads every
q/k/v/o block 48 -> 128 and wastes 2.67x MXU work AND HBM traffic.  This
kernel therefore keeps Dh on the SUBLANE axis end to end (operands
[Dh, S], bf16 sublane tile 16 divides 48 exactly):

  * logits = dot_general(qT [Dh, bq], kT [Dh, sk], contract dim0 x dim0)
    — contraction over sublanes, lanes are bq/sk: no padding;
  * oT [Dh, bq] = dot_general(vT [Dh, sk], w [bq, sk], contract over sk)
    — output lanes bq: no padding.

Numerical contract matches `modules.sdpa`: fp32 logits, 1/sqrt(Dh) scale,
bottom-right-aligned causal mask when q is shorter than k.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attn_kernel_t(q_ref, k_ref, v_ref, o_ref, *, sm_scale: float,
                   causal: bool, s_q: int, s_k: int, block_q: int):
    """One (batch*head, q-block) program, transposed operand layout.

    q_ref: [dh, block_q]; k_ref/v_ref: [dh, s_k_pad]; o_ref: [dh, block_q].
    """
    qi = pl.program_id(1)
    # sublane-axis contraction: [dh, bq] x [dh, sk] -> [bq, sk]; inputs
    # stay in their storage dtype (bf16 on the fast path) so the MXU runs
    # native bf16 passes; accumulation is fp32 via preferred_element_type
    logits = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale

    s_k_pad = k_ref.shape[2]
    kpos = jax.lax.broadcasted_iota(jnp.int32, (block_q, s_k_pad), 1)
    valid = kpos < s_k
    if causal:
        qpos = (jax.lax.broadcasted_iota(jnp.int32, (block_q, s_k_pad), 0)
                + qi * block_q + (s_k - s_q))
        valid = valid & (kpos <= qpos)
    logits = jnp.where(valid, logits, -jnp.inf)

    m = jnp.max(logits, axis=-1, keepdims=True)
    # fully-masked rows (query padding) would produce NaN; neutralize
    m = jnp.maximum(m, -1e30)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    w = p / jnp.maximum(denom, 1e-30)
    # oT [dh, bq] = vT [dh, sk] x w [bq, sk] contracted over sk
    o_ref[0] = jax.lax.dot_general(
        v_ref[0], w.astype(v_ref.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "block_q"))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    causal: bool, block_q: int = 768) -> jnp.ndarray:
    """Drop-in replacement for modules.sdpa: [B, S, H, Dh] in/out."""
    B, Sq, H, Dh = q.shape
    Sk = k.shape[1]
    orig_dtype = q.dtype

    # fold heads into the grid's batch dim, head_dim onto sublanes
    qt = q.transpose(0, 2, 3, 1).reshape(B * H, Dh, Sq)
    kt = k.transpose(0, 2, 3, 1).reshape(B * H, Dh, Sk)
    vt = v.transpose(0, 2, 3, 1).reshape(B * H, Dh, Sk)

    # pad: S (now the lane axis) to 128, dh sublanes to the dtype tile
    sub = 16 if qt.dtype == jnp.bfloat16 else 8
    dh_pad = _round_up(Dh, sub)
    block_q = min(block_q, _round_up(Sq, 128))
    sq_pad = _round_up(Sq, block_q)
    sk_pad = _round_up(Sk, 128)
    qt = jnp.pad(qt, ((0, 0), (0, dh_pad - Dh), (0, sq_pad - Sq)))
    kt = jnp.pad(kt, ((0, 0), (0, dh_pad - Dh), (0, sk_pad - Sk)))
    vt = jnp.pad(vt, ((0, 0), (0, dh_pad - Dh), (0, sk_pad - Sk)))

    grid = (B * H, sq_pad // block_q)
    kernel = functools.partial(
        _attn_kernel_t, sm_scale=1.0 / math.sqrt(Dh), causal=causal,
        s_q=Sq, s_k=Sk, block_q=block_q)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, dh_pad, block_q), lambda b, i: (b, 0, i)),
            pl.BlockSpec((1, dh_pad, sk_pad), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, dh_pad, sk_pad), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, dh_pad, block_q), lambda b, i: (b, 0, i)),
        out_shape=jax.ShapeDtypeStruct((B * H, dh_pad, sq_pad), orig_dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Sq * Sk * Dh,
            bytes_accessed=(qt.size + kt.size + vt.size) * qt.dtype.itemsize,
            transcendentals=B * H * Sq * Sk,
        ),
    )(qt, kt, vt)

    out = out[:, :Dh, :Sq].reshape(B, H, Dh, Sq).transpose(0, 3, 1, 2)
    return out
