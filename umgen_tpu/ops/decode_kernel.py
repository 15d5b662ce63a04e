"""Fused OAR decode-step kernel: all 36 layers in one Pallas launch.

The sequential token decode is the throughput wall of the whole system: per
token, 36 transformer layers must stream ~255 MB of int8 weights plus the
KV prefix from HBM through small batch-1 matmuls.  As separate XLA ops this
runs at ~35-50% of HBM peak with per-op fixed costs; this kernel executes
the entire layer stack as ONE pallas_call with grid=(n_layers,):

  * per-layer weights (int8 + scales) and the layer's KV prefix arrive as
    grid-blocked inputs — Pallas double-buffers the next layer's blocks
    while the current layer computes;
  * the hidden state lives in a VMEM scratch that persists across grid
    steps (TPU grids run sequentially on the core);
  * attention uses a head-segmentation trick that avoids in-kernel
    transposes entirely: with K stored as [S, H*Dh], per-head logits are
    (K ⊙ q) @ M where M is a constant 0/1 head-pooling matrix, and the
    value mix is (w @ Mᵀ) ⊙ V summed over S — both MXU-friendly;
  * the new token's K/V attend via a separate rank-1 softmax term and are
    emitted per layer for a single deferred cache write by the caller.

Decode only (Q == 1); prefill and multi-query forced steps use the XLA
path.  Numerics match Rollout.oar_step to bf16 rounding.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = Dict[str, Any]


def _erf(x):
    """Abramowitz & Stegun 7.1.26 polynomial erf (|err| < 1.5e-7) — Mosaic
    has no erf/erfc lowering."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    y = 1.0 - (((((a5 * t + a4) * t) + a3) * t + a2) * t + a1) * t \
        * jnp.exp(-ax * ax)
    return s * y


def _gelu_exact(x):
    return x * 0.5 * (1.0 + _erf(x / np.sqrt(2.0).astype(np.float32)))


def _head_pool_matrix(H: int, Dh: int) -> np.ndarray:
    """[H*Dh, H] 0/1 matrix pooling lane chunks into per-head sums."""
    M = np.zeros((H * Dh, H), np.float32)
    for h in range(H):
        M[h * Dh:(h + 1) * Dh, h] = 1.0
    return M


def _kernel(cache_len_ref,                       # SMEM (1,)
            x_ref,                               # [B, d] bf16 (full)
            ln1_ref, qkv_wq_ref, qkv_ws_ref, qkv_b_ref,
            proj_wq_ref, proj_ws_ref, proj_b_ref,
            ln2_ref, fc_wq_ref, fc_ws_ref, pj_wq_ref, pj_ws_ref,
            kvk_ref, kvv_ref,                    # [1, B, S, HD] fp8
            pool_ref,                            # [HD, H] f32 (full)
            h_out_ref,                           # [B, d] bf16
            knew_ref, vnew_ref,                  # [1, B, HD] bf16
            h_scratch,                           # VMEM [B, d] f32
            *, n_layers: int, H: int, Dh: int, eps: float = 1e-5):
    l = pl.program_id(0)
    B, d = x_ref.shape
    HD = H * Dh
    scale = 1.0 / math.sqrt(Dh)
    cache_len = cache_len_ref[0]

    @pl.when(l == 0)
    def _():
        h_scratch[:] = x_ref[:].astype(jnp.float32)

    h = h_scratch[:]                              # f32 [B, d]

    def layer_norm(v, w):
        mu = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.mean((v - mu) ** 2, axis=-1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)

    def qlinear(v, wq_ref, ws_ref, b_ref=None):
        # full-int8 MXU path: dynamic per-row symmetric activation quant;
        # the alternative (dequantizing 6.8 MB of weights on the VPU every
        # step) costs ~0.5 ms/step.  ws/b blocks are [1, 1, dim].
        sa = jnp.max(jnp.abs(v), axis=-1, keepdims=True) / 127.0 + 1e-12
        aq = jnp.clip(jnp.round(v / sa), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(aq, wq_ref[0], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * sa * ws_ref[0].astype(jnp.float32)
        if b_ref is not None:
            y = y + b_ref[0].astype(jnp.float32)
        return y

    # ---- attention ----
    a = layer_norm(h, ln1_ref[0])
    qkv = qlinear(a, qkv_wq_ref, qkv_ws_ref, qkv_b_ref)     # [B, 3HD] f32
    q = qkv[:, :HD]
    k_new = qkv[:, HD:2 * HD]
    v_new = qkv[:, 2 * HD:]
    knew_ref[0] = k_new.astype(knew_ref.dtype)
    vnew_ref[0] = v_new.astype(vnew_ref.dtype)

    pool = pool_ref[:]                                       # [HD, H]
    S = kvk_ref.shape[2]
    spos = jax.lax.broadcasted_iota(jnp.int32, (S, H), 0)
    valid = spos < cache_len

    qb = q.astype(jnp.bfloat16)
    out_rows = []
    for b in range(B):
        kmat = kvk_ref[0, b].astype(jnp.bfloat16)            # [S, HD]
        vmat = kvv_ref[0, b].astype(jnp.bfloat16)
        g = kmat * qb[b][None, :]                            # [S, HD]
        logits = jax.lax.dot_general(
            g, pool.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # [S, H]
        logits = jnp.where(valid, logits, -jnp.inf)
        # rank-1 self term: q·k_new per head
        self_logit = jax.lax.dot_general(
            (k_new * q)[b:b + 1].astype(jnp.bfloat16),
            pool.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # [1, H]
        m = jnp.maximum(jnp.max(logits, axis=0, keepdims=True), self_logit)
        ep = jnp.exp(logits - m)                             # [S, H]
        es = jnp.exp(self_logit - m)                         # [1, H]
        denom = jnp.sum(ep, axis=0, keepdims=True) + es      # [1, H]
        wp = ep / denom                                      # [S, H]
        ws_self = es / denom                                 # [1, H]
        # expand per-head weights back to lanes and mix values
        w_lanes = jax.lax.dot_general(
            wp.astype(jnp.bfloat16),
            pool.T.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [S, HD]
        mixed = jnp.sum(w_lanes.astype(jnp.bfloat16) * vmat, axis=0,
                        keepdims=True)                       # [1, HD] bf16→
        self_lanes = jax.lax.dot_general(
            ws_self.astype(jnp.bfloat16), pool.T.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [1, HD]
        row = mixed.astype(jnp.float32) + self_lanes * v_new[b][None, :]
        out_rows.append(row)
    y = jnp.concatenate(out_rows, axis=0)                    # [B, HD] f32

    y = qlinear(y, proj_wq_ref, proj_ws_ref, proj_b_ref)
    # residual in bf16 to match the XLA path's dtype discipline
    h = (h.astype(jnp.bfloat16) + y.astype(jnp.bfloat16)).astype(jnp.float32)

    # ---- MLP ----
    a2 = layer_norm(h, ln2_ref[0])
    hid = qlinear(a2, fc_wq_ref, fc_ws_ref)
    hid = _gelu_exact(hid)
    y2 = qlinear(hid, pj_wq_ref, pj_ws_ref)
    h = (h.astype(jnp.bfloat16) + y2.astype(jnp.bfloat16)
         ).astype(jnp.float32)

    h_scratch[:] = h

    @pl.when(l == n_layers - 1)
    def _():
        h_out_ref[:] = h.astype(h_out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_head",))
def fused_decode_step(oar_params: Params, x: jnp.ndarray,
                      kv_k: jnp.ndarray, kv_v: jnp.ndarray,
                      cache_len, n_head: int
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """x: [B, 1, d]; kv_k/kv_v: [L, B, S, H, Dh] (fp8/bf16 storage).

    Returns (h [B, 1, d] bf16 — pre-ln_oar, kv_k, kv_v updated).
    Requires int8-quantized weights (runtime.quantize).
    """
    p = oar_params
    L, B, S, H, Dh = kv_k.shape
    d = x.shape[-1]
    HD = H * Dh

    kvk = kv_k.reshape(L, B, S, HD)
    kvv = kv_v.reshape(L, B, S, HD)
    pool = jnp.asarray(_head_pool_matrix(H, Dh))
    cl = jnp.asarray([cache_len], jnp.int32) if jnp.ndim(cache_len) == 0 \
        else cache_len.reshape(1).astype(jnp.int32)

    def full(spec_shape=None):
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    def per_layer(shape):
        # index maps receive (grid idx, *scalar_prefetch_refs)
        return pl.BlockSpec((1,) + shape,
                            lambda l, *_: (l,) + (0,) * len(shape))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L,),
        in_specs=[
            full(),                                   # x
            per_layer((1, d)),                        # ln1
            per_layer((d, 3 * d)), per_layer((1, 3 * d)),
            per_layer((1, 3 * d)),
            per_layer((d, d)), per_layer((1, d)), per_layer((1, d)),
            per_layer((1, d)),                        # ln2
            per_layer((d, 4 * d)), per_layer((1, 4 * d)),
            per_layer((4 * d, d)), per_layer((1, d)),
            per_layer((B, S, HD)), per_layer((B, S, HD)),
            full(),                                   # pool
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),    # h_out
            pl.BlockSpec((1, B, HD), lambda l, *_: (l, 0, 0)),
            pl.BlockSpec((1, B, HD), lambda l, *_: (l, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((B, d), jnp.float32)],
    )

    kernel = functools.partial(_kernel, n_layers=L, H=H, Dh=Dh)
    h_out, k_new, v_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, d), jnp.bfloat16),
            jax.ShapeDtypeStruct((L, B, HD), jnp.bfloat16),
            jax.ShapeDtypeStruct((L, B, HD), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(cl, x[:, 0].astype(jnp.bfloat16),
      p["ln1"]["w"][:, None, :],
      p["attn"]["qkv"]["wq"], p["attn"]["qkv"]["ws"][:, None, :],
      p["attn"]["qkv"]["b"][:, None, :],
      p["attn"]["proj"]["wq"], p["attn"]["proj"]["ws"][:, None, :],
      p["attn"]["proj"]["b"][:, None, :],
      p["ln2"]["w"][:, None, :],
      p["mlp"]["fc"]["wq"], p["mlp"]["fc"]["ws"][:, None, :],
      p["mlp"]["proj"]["wq"], p["mlp"]["proj"]["ws"][:, None, :],
      kvk, kvv, pool)

    k_new = k_new.reshape(L, B, 1, H, Dh)
    v_new = v_new.reshape(L, B, 1, H, Dh)
    kv_k = jax.lax.dynamic_update_slice(kv_k, k_new.astype(kv_k.dtype),
                                        (0, 0, cache_len, 0, 0))
    kv_v = jax.lax.dynamic_update_slice(kv_v, v_new.astype(kv_v.dtype),
                                        (0, 0, cache_len, 0, 0))
    return h_out[:, None, :], kv_k, kv_v
