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

Variant status (maintenance note): the SERVING set is v5 (flat int8 KV,
batch-split grid), w4 (its W4A8 twin) and the mq family (v5mq/w4mq/
v5mqi4/w4mqi4 — speculative verify); v5i4/w4i4 are the opt-in int4-KV
memory knob.  v1-v4 are superseded measured history and v6/v7 are
measured negative results (aliased append ties v5; block-diagonal
batched attention loses at B>=4) — all stay in-tree solely as tested
oracles for the serving kernels (tests/test_decode_kernel.py exercises
every variant against the XLA step); remove them only together with
their tests.
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


# ===========================================================================
# v2: packed-block, S-blocked, flash-accumulating fused decode step
# ===========================================================================
# Why v2 (measured on v5e, 36 layers, d=768, S=2208, B=1):
#   * v1 issues ~14 DMAs per layer; the 8 tiny ones (LN weights, scales,
#     biases) cost ~1-2 us each — an empty v1 kernel that only streams its
#     blocks already takes 1.42 ms (~33% of HBM peak).  v2 packs all
#     per-layer vectors into ONE [1, 11520] f32 block and all 768-input
#     matrices into ONE [768, 6144+] int8 block (+ the [3072, 768] mlp-out
#     matrix) → 5 DMAs per layer.
#   * v1 streams the full S=2208 KV prefix every step; v2 blocks S on the
#     grid ((L, NS) instead of (L,)) with the block index CLAMPED to the
#     last block below `cache_len` — Pallas skips the re-fetch when the
#     index map returns the same block, so KV traffic tracks the true
#     prefix length.  Attention accumulates across S-blocks in scratch with
#     the standard flash (m, denom, acc) update.
#   * fp8 KV upconversion is emulated (slow) on v5e — the ablated attention
#     compute was 1.46 ms/step of VPU conversions.  v2 supports bf16 and
#     int8 cache storage (int8 with the fixed KV_INT8_SCALE grid); int8
#     converts natively.

KV_INT8_SCALE = 16.0     # fixed-grid int8 KV: step 1/16, range ±7.94


def _pick_block_s(S: int, block_s: int) -> int:
    """The v5-family S-block heuristic: an explicitly given divisor wins;
    otherwise the preferred list, then the largest divisor of S that is a
    multiple of 8 up to 640 (a non-dividing explicit block_s skips the
    preferred list but still falls back to the divisor scan)."""
    bs = block_s if block_s and S % block_s == 0 else S
    if bs == S and not block_s:
        for cand in (552, 512, 416, 384, 368, 256):
            if S % cand == 0:
                return cand
    if bs == S:
        for cand in range(min(S, 640), 63, -8):
            if S % cand == 0:
                return cand
    return bs


_VEC_OFF = {}


def _vec_offsets(d: int):
    """Column offsets of the packed per-layer vector block."""
    if d not in _VEC_OFF:
        names = [("ln1", d), ("ln2", d), ("qkv_ws", 3 * d),
                 ("qkv_b", 3 * d), ("proj_ws", d), ("proj_b", d),
                 ("fc_ws", 4 * d), ("pj_ws", d)]
        off, table = 0, {}
        for n, w in names:
            table[n] = (off, off + w)
            off += w
        table["__total__"] = off
        _VEC_OFF[d] = table
    return _VEC_OFF[d]


def _pack_vec(oar_params: Params) -> jnp.ndarray:
    """All per-layer vectors (LNs, scales, biases) → one [L, 1, V] block."""
    p = oar_params
    L, d, _ = p["attn"]["qkv"]["wq"].shape
    off = _vec_offsets(d)
    vec = np.zeros((L, 1, off["__total__"]), np.float32)

    def put(name, arr):
        a, b = off[name]
        vec[:, 0, a:b] = np.asarray(arr, np.float32).reshape(L, b - a)

    put("ln1", p["ln1"]["w"])
    put("ln2", p["ln2"]["w"])
    put("qkv_ws", p["attn"]["qkv"]["ws"])
    put("qkv_b", p["attn"]["qkv"]["b"])
    put("proj_ws", p["attn"]["proj"]["ws"])
    put("proj_b", p["attn"]["proj"]["b"])
    put("fc_ws", p["mlp"]["fc"]["ws"])
    put("pj_ws", p["mlp"]["proj"]["ws"])
    return jnp.asarray(vec)


def pack_fused_oar(oar_params: Params) -> Params:
    """Stacked int8 OAR params → packed blocks for the v2 kernel.

    Input: the ``params["oar"]`` pytree from runtime.quantize (leading L
    dim on every leaf).  Output: {"vec": [L,1,V] f32, "wqp": [L,d,4d] int8 (qkv‖proj),
    "wfc": [L,d,4d] int8, "wpj": [L,4d,d] int8} — three weight streams
    (single-stream HBM DMA tops out ~260 GB/s on v5e; concurrent streams
    reach ~440).
    """
    p = oar_params
    wqp = np.concatenate([np.asarray(p["attn"]["qkv"]["wq"]),
                          np.asarray(p["attn"]["proj"]["wq"])], axis=-1)
    return {"vec": _pack_vec(p), "wqp": jnp.asarray(wqp),
            "wfc": p["mlp"]["fc"]["wq"], "wpj": p["mlp"]["proj"]["wq"]}


def _kernel_v2(nblk_ref, cl_ref,                 # scalar prefetch
               x_ref, vec_ref, wqp_ref, wfc_ref, wpj_ref,
               kvk_ref, kvv_ref, pool_ref,
               h_out_ref, kvnew_ref,
               h_scr, q_scr, m_scr, den_scr, acc_scr,
               *, n_layers: int, n_sblk: int, bs: int, H: int, Dh: int,
               kv_kind: str, eps: float = 1e-5):
    l = pl.program_id(0)
    ns = pl.program_id(1)
    B, d = x_ref.shape
    HD = H * Dh
    scale = 1.0 / math.sqrt(Dh)
    cl = cl_ref[0]
    off = _vec_offsets(d)

    def vec_slice(name):
        a, b = off[name]
        return vec_ref[0, 0, a:b]

    def layer_norm(v, w):
        mu = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.mean((v - mu) ** 2, axis=-1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)

    def qdot(v, w_blk, ws, b=None):
        sa = jnp.max(jnp.abs(v), axis=-1, keepdims=True) / 127.0 + 1e-12
        aq = jnp.clip(jnp.round(v / sa), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(aq, w_blk, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * sa * ws[None, :].astype(jnp.float32)
        if b is not None:
            y = y + b[None, :].astype(jnp.float32)
        return y

    def load_kv(ref, b):
        blk = ref[0, b]                           # [bs, HD] storage dtype
        if kv_kind == "int8":
            return (blk.astype(jnp.float32)
                    * (1.0 / KV_INT8_SCALE)).astype(jnp.bfloat16)
        return blk.astype(jnp.bfloat16)

    pool = pool_ref[:]                             # [HD, H] f32

    # ---- ns == 0: hidden init, QKV, self-term seeds the flash state ----
    @pl.when(ns == 0)
    def _():
        @pl.when(l == 0)
        def _():
            h_scr[:] = x_ref[:].astype(jnp.float32)
        h = h_scr[:]
        a = layer_norm(h, vec_slice("ln1"))
        qkv = qdot(a, wqp_ref[0, :, :3 * d], vec_slice("qkv_ws"),
                   vec_slice("qkv_b"))
        q = qkv[:, :HD]
        k_new = qkv[:, HD:2 * HD]
        v_new = qkv[:, 2 * HD:]
        q_scr[:] = q
        kvnew_ref[0, :, :HD] = k_new.astype(kvnew_ref.dtype)
        kvnew_ref[0, :, HD:] = v_new.astype(kvnew_ref.dtype)
        # seed flash state with the new token's own (k, v)
        self_logit = jax.lax.dot_general(
            (k_new * q).astype(jnp.bfloat16), pool.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale     # [B, H]
        m_scr[:, :H] = self_logit
        den_scr[:, :H] = jnp.ones_like(self_logit)
        acc_scr[:] = v_new

    # ---- every valid S-block: flash update ----
    @pl.when(ns < nblk_ref[0])
    def _():
        q = q_scr[:]
        qb = q.astype(jnp.bfloat16)
        base = ns * bs
        spos = base + jax.lax.broadcasted_iota(jnp.int32, (bs, H), 0)
        valid = spos < cl
        for b in range(B):
            kmat = load_kv(kvk_ref, b)            # [bs, HD] bf16
            vmat = load_kv(kvv_ref, b)
            g = kmat * qb[b][None, :]
            logits = jax.lax.dot_general(
                g, pool.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale   # [bs, H]
            logits = jnp.where(valid, logits, -jnp.inf)
            m_old = m_scr[b:b + 1, :H]                         # [1, H]
            m_new = jnp.maximum(m_old, jnp.max(logits, axis=0,
                                               keepdims=True))
            corr = jnp.exp(m_old - m_new)                      # [1, H]
            p = jnp.exp(logits - m_new)                        # [bs, H]
            den = den_scr[b:b + 1, :H] * corr + jnp.sum(p, axis=0,
                                                        keepdims=True)
            corr_lanes = jax.lax.dot_general(
                corr.astype(jnp.bfloat16), pool.T.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # [1, HD]
            w_lanes = jax.lax.dot_general(
                p.astype(jnp.bfloat16), pool.T.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # [bs, HD]
            blk_mix = jnp.sum(w_lanes.astype(jnp.bfloat16) * vmat,
                              axis=0, keepdims=True).astype(jnp.float32)
            acc_scr[b:b + 1, :] = acc_scr[b:b + 1, :] * corr_lanes + blk_mix
            m_scr[b:b + 1, :H] = m_new
            den_scr[b:b + 1, :H] = den

    # ---- ns == NS-1: finalize attention, proj, MLP ----
    @pl.when(ns == n_sblk - 1)
    def _():
        h = h_scr[:]
        den_lanes = jax.lax.dot_general(
            den_scr[:, :H].astype(jnp.bfloat16),
            pool.T.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # [B, HD]
        y = acc_scr[:] / den_lanes
        y = qdot(y, wqp_ref[0, :, 3 * d:4 * d], vec_slice("proj_ws"),
                 vec_slice("proj_b"))
        h = (h.astype(jnp.bfloat16) + y.astype(jnp.bfloat16)
             ).astype(jnp.float32)
        a2 = layer_norm(h, vec_slice("ln2"))
        hid = qdot(a2, wfc_ref[0], vec_slice("fc_ws"))
        hid = _gelu_exact(hid)
        y2 = qdot(hid, wpj_ref[0], vec_slice("pj_ws"))
        h = (h.astype(jnp.bfloat16) + y2.astype(jnp.bfloat16)
             ).astype(jnp.float32)
        h_scr[:] = h

        @pl.when(l == n_layers - 1)
        def _():
            h_out_ref[:] = h.astype(h_out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_head",))
def fused_decode_step_v2(packed: Params, x: jnp.ndarray,
                         kv_k: jnp.ndarray, kv_v: jnp.ndarray,
                         cache_len, n_head: int
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Packed-block fused decode step.

    packed: output of :func:`pack_fused_oar`; x: [B, 1, d];
    kv_k/kv_v: [L, B, S, H, Dh] in bf16 / int8 (KV_INT8_SCALE grid) / fp8.
    Returns (h [B, 1, d] bf16 pre-ln_oar, kv_k, kv_v updated).
    """
    L, B, S, H, Dh = kv_k.shape
    d = x.shape[-1]
    HD = H * Dh

    # S-blocking: prefer ~512-row blocks; bs must be a sublane multiple
    # and divide S
    bs = S
    for cand in (552, 512, 416, 384, 368, 276, 256):
        if S % cand == 0:
            bs = cand
            break
    if bs == S:
        for cand in range(min(S, 640), 63, -8):
            if S % cand == 0:
                bs = cand
                break
    NS = S // bs

    kv_kind = ("int8" if kv_k.dtype == jnp.int8 else
               "bf16" if kv_k.dtype == jnp.bfloat16 else "fp8")
    kvk = kv_k.reshape(L, B, S, HD)
    kvv = kv_v.reshape(L, B, S, HD)
    pool = jnp.asarray(_head_pool_matrix(H, Dh))

    cl = jnp.reshape(jnp.asarray(cache_len, jnp.int32), (1,))
    nblk = jnp.minimum((cl + bs - 1) // bs, NS).astype(jnp.int32)

    def const_l(shape):
        return pl.BlockSpec((1,) + shape, lambda l, ns, *_: (l,) + (0,)
                            * len(shape))

    def kv_spec():
        # clamp the S-block index to the last block that intersects the
        # prefix; repeated indices skip the DMA re-fetch
        return pl.BlockSpec(
            (1, B, bs, HD),
            lambda l, ns, nblk_ref, cl_ref: (
                l, 0, jnp.minimum(ns, jnp.maximum(nblk_ref[0] - 1, 0)), 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(L, NS),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),        # x
            const_l((1, packed["vec"].shape[-1])),        # vec
            const_l((d, 4 * d)),                          # wqp
            const_l((d, 4 * d)),                          # wfc
            const_l((4 * d, d)),                          # wpj
            kv_spec(), kv_spec(),
            pl.BlockSpec(memory_space=pltpu.VMEM),        # pool
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),        # h_out
            pl.BlockSpec((1, B, 2 * HD), lambda l, ns, *_: (l, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((B, d), jnp.float32),   # h
                        pltpu.VMEM((B, HD), jnp.float32),  # q
                        pltpu.VMEM((B, 128), jnp.float32),  # m
                        pltpu.VMEM((B, 128), jnp.float32),  # den
                        pltpu.VMEM((B, HD), jnp.float32)],  # acc
    )

    kernel = functools.partial(_kernel_v2, n_layers=L, n_sblk=NS, bs=bs,
                               H=H, Dh=Dh, kv_kind=kv_kind)
    h_out, kvnew = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, d), jnp.bfloat16),
            jax.ShapeDtypeStruct((L, B, 2 * HD), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(nblk, cl, x[:, 0].astype(jnp.bfloat16), packed["vec"], packed["wqp"],
      packed["wfc"], packed["wpj"], kvk, kvv, pool)

    k_new = kvnew[:, :, :HD].reshape(L, B, 1, H, Dh)
    v_new = kvnew[:, :, HD:].reshape(L, B, 1, H, Dh)
    if kv_k.dtype == jnp.int8:
        k_new = jnp.clip(jnp.round(k_new.astype(jnp.float32)
                                   * KV_INT8_SCALE), -127, 127)
        v_new = jnp.clip(jnp.round(v_new.astype(jnp.float32)
                                   * KV_INT8_SCALE), -127, 127)
    cl0 = jnp.asarray(cache_len, jnp.int32).reshape(())
    kv_k = jax.lax.dynamic_update_slice(kv_k, k_new.astype(kv_k.dtype),
                                        (0, 0, cl0, 0, 0))
    kv_v = jax.lax.dynamic_update_slice(kv_v, v_new.astype(kv_v.dtype),
                                        (0, 0, cl0, 0, 0))
    return h_out[:, None, :], kv_k, kv_v


# ===========================================================================
# v3: multi-stream smooth pipeline + MXU-only attention
# ===========================================================================
# v2 still hit two walls (measured): a single HBM->VMEM DMA stream runs at
# ~260 GB/s on v5e (8 concurrent streams: ~440 GB/s), and the per-S-block
# attention spent ~1 ms/step in [S, HD]-sized VPU passes (fp8/int8 up-
# conversion + elementwise).  v3:
#   * splits the layer's weights into per-ns streams — qkv‖proj fetched at
#     ns=0, fc at ns=2, pj at ns=1 (via lagged index maps) — so every grid
#     step carries ~3 MB over 3-4 concurrent streams instead of one
#     7 MB burst at ns=0;
#   * logits via ONE int8 MXU dot per block: logits[s,h] = k_i8[s,:] @
#     (q ⊙ pool)_i8[:,h] — the int8 KV block is consumed directly, no
#     upconversion, no [S, HD] elementwise;
#   * value mix via ONE dim-0-contraction dot: (p [bs,H])ᵀ·V [bs,HD] →
#     [H, HD], head-extracted with a poolᵀ mask-reduce ([H, HD] tiny).
# Requires int8 KV storage (KV_INT8_SCALE grid).

def _kernel_v3(nblk_ref, cl_ref,
               x_ref, vec_ref, wqp_ref, wfc_ref, wpj_ref,
               kvk_ref, kvv_ref, pool_ref, poolt_ref,
               h_out_ref, kvnew_ref,
               h_scr, qp_scr, m_scr, den_scr, acc_scr,
               *, n_layers: int, n_sblk: int, bs: int, H: int, Dh: int,
               eps: float = 1e-5):
    l = pl.program_id(0)
    ns = pl.program_id(1)
    B, d = x_ref.shape
    HD = H * Dh
    scale = 1.0 / math.sqrt(Dh)
    cl = cl_ref[0]
    off = _vec_offsets(d)

    def vec_slice(name):
        a, b = off[name]
        return vec_ref[0, 0, a:b]

    def layer_norm(v, w):
        mu = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.mean((v - mu) ** 2, axis=-1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)

    def qdot(v, w_blk, ws, b=None):
        sa = jnp.max(jnp.abs(v), axis=-1, keepdims=True) / 127.0 + 1e-12
        aq = jnp.clip(jnp.round(v / sa), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(aq, w_blk, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * sa * ws[None, :].astype(jnp.float32)
        if b is not None:
            y = y + b[None, :].astype(jnp.float32)
        return y

    pool = pool_ref[:]                 # [HD, H] f32
    poolt = poolt_ref[:]               # [H, HD] f32

    # ---- ns == 0: hidden init, QKV, quantized q-pool, self-term ----
    @pl.when(ns == 0)
    def _():
        @pl.when(l == 0)
        def _():
            h_scr[:] = x_ref[:].astype(jnp.float32)
        h = h_scr[:]
        a = layer_norm(h, vec_slice("ln1"))
        qkv = qdot(a, wqp_ref[0, :, :3 * d], vec_slice("qkv_ws"),
                   vec_slice("qkv_b"))
        q = qkv[:, :HD]
        k_new = qkv[:, HD:2 * HD]
        v_new = qkv[:, 2 * HD:]
        kvnew_ref[0, :, :HD] = k_new.astype(kvnew_ref.dtype)
        kvnew_ref[0, :, HD:] = v_new.astype(kvnew_ref.dtype)
        # per-batch-row quantized (q ⊙ pool): [B*d? no — B rows stacked]
        for b in range(B):
            qp = q[b][:, None] * pool                       # [HD, H] f32
            sq = jnp.max(jnp.abs(qp)) / 127.0 + 1e-12
            qp_i8 = jnp.clip(jnp.round(qp / sq), -127, 127)
            qp_scr[b * HD:(b + 1) * HD, :H] = qp_i8          # store as f32
            den_scr[b:b + 1, 120:121] = sq[None, None]       # stash scale
        sl_all = jax.lax.dot_general(
            (k_new * q).astype(jnp.float32), pool,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # [B, H]
        m_scr[:, :H] = sl_all
        den_scr[:, :H] = jnp.ones_like(sl_all)
        acc_scr[:] = v_new

    # ---- every valid S-block: MXU flash update ----
    @pl.when(ns < nblk_ref[0])
    def _():
        base = ns * bs
        spos = base + jax.lax.broadcasted_iota(jnp.int32, (bs, H), 0)
        valid = spos < cl
        for b in range(B):
            kmat = kvk_ref[0, b]                             # [bs, HD] i8
            vmat = kvv_ref[0, b]
            qp_i8 = qp_scr[b * HD:(b + 1) * HD, :H].astype(jnp.int8)
            sq = den_scr[b, 120]
            li = jax.lax.dot_general(kmat, qp_i8,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32)
            logits = (li.astype(jnp.float32)
                      * (sq * scale / KV_INT8_SCALE))        # [bs, H]
            logits = jnp.where(valid, logits, -jnp.inf)
            m_old = m_scr[b:b + 1, :H]
            m_new = jnp.maximum(m_old, jnp.max(logits, axis=0,
                                               keepdims=True))
            corr = jnp.exp(m_old - m_new)
            p = jnp.exp(logits - m_new)                      # [bs, H] f32
            den = den_scr[b:b + 1, :H] * corr + jnp.sum(p, axis=0,
                                                        keepdims=True)
            part = jax.lax.dot_general(
                p.astype(jnp.bfloat16),
                (vmat.astype(jnp.bfloat16)
                 * (1.0 / KV_INT8_SCALE)).astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # [H, HD]
            blk_mix = jnp.sum(part * poolt, axis=0,
                              keepdims=True)                 # [1, HD]
            corr_lanes = jnp.sum(corr[0][:, None] * poolt, axis=0,
                                 keepdims=True)              # [1, HD]
            acc_scr[b:b + 1, :] = (acc_scr[b:b + 1, :] * corr_lanes
                                   + blk_mix)
            m_scr[b:b + 1, :H] = m_new
            den_scr[b:b + 1, :H] = den

    # ---- ns == NS-1: finalize, proj, MLP ----
    @pl.when(ns == n_sblk - 1)
    def _():
        h = h_scr[:]
        den_lanes_rows = []
        for b in range(B):
            dl = jnp.sum(den_scr[b:b + 1, :H][0][:, None] * poolt, axis=0,
                         keepdims=True)
            den_lanes_rows.append(dl)
        den_lanes = jnp.concatenate(den_lanes_rows, axis=0)  # [B, HD]
        y = acc_scr[:] / den_lanes
        y = qdot(y, wqp_ref[0, :, 3 * d:4 * d], vec_slice("proj_ws"),
                 vec_slice("proj_b"))
        h = (h.astype(jnp.bfloat16) + y.astype(jnp.bfloat16)
             ).astype(jnp.float32)
        a2 = layer_norm(h, vec_slice("ln2"))
        hid = qdot(a2, wfc_ref[0], vec_slice("fc_ws"))
        hid = _gelu_exact(hid)
        y2 = qdot(hid, wpj_ref[0], vec_slice("pj_ws"))
        h = (h.astype(jnp.bfloat16) + y2.astype(jnp.bfloat16)
             ).astype(jnp.float32)
        h_scr[:] = h

        @pl.when(l == n_layers - 1)
        def _():
            h_out_ref[:] = h.astype(h_out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_head",))
def fused_decode_step_v3(packed: Params, x: jnp.ndarray,
                         kv_k: jnp.ndarray, kv_v: jnp.ndarray,
                         cache_len, n_head: int
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Multi-stream fused decode step.  Requires int8 KV caches
    (KV_INT8_SCALE grid) and pack_fused_oar params."""
    L, B, S, H, Dh = kv_k.shape
    assert kv_k.dtype == jnp.int8, "v3 requires int8 KV storage"
    d = x.shape[-1]
    HD = H * Dh

    bs = S
    for cand in (552, 512, 416, 384, 368, 276, 256):
        if S % cand == 0:
            bs = cand
            break
    if bs == S:
        for cand in range(min(S, 640), 63, -8):
            if S % cand == 0:
                bs = cand
                break
    NS = S // bs

    kvk = kv_k.reshape(L, B, S, HD)
    kvv = kv_v.reshape(L, B, S, HD)
    pool = jnp.asarray(_head_pool_matrix(H, Dh))
    poolt = pool.T.copy()

    cl = jnp.reshape(jnp.asarray(cache_len, jnp.int32), (1,))
    nblk = jnp.minimum((cl + bs - 1) // bs, NS).astype(jnp.int32)

    wqp, wfc, wpj = packed["wqp"], packed["wfc"], packed["wpj"]

    def at_l(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda l, ns, *_: (l,) + (0,) * len(shape))

    def lagged(shape, lag_ns):
        # fetch layer l's block at ns == lag_ns (buffer carries the
        # previous layer's block until then)
        return pl.BlockSpec(
            (1,) + shape,
            lambda l, ns, *_: (jnp.maximum(l - (ns < lag_ns), 0),)
            + (0,) * len(shape))

    def kv_spec():
        return pl.BlockSpec(
            (1, B, bs, HD),
            lambda l, ns, nblk_ref, cl_ref: (
                l, 0, jnp.minimum(ns, jnp.maximum(nblk_ref[0] - 1, 0)), 0))

    lag_pj = 1 if NS > 2 else 0
    lag_fc = 2 if NS > 2 else 0
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(L, NS),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),        # x
            at_l((1, packed["vec"].shape[-1])),           # vec
            at_l((d, 4 * d)),                             # wqp
            lagged((d, 4 * d), lag_fc),                   # wfc
            lagged((4 * d, d), lag_pj),                   # wpj
            kv_spec(), kv_spec(),
            pl.BlockSpec(memory_space=pltpu.VMEM),        # pool
            pl.BlockSpec(memory_space=pltpu.VMEM),        # poolt
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 2 * HD), lambda l, ns, *_: (l, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((B, d), jnp.float32),       # h
                        pltpu.VMEM((B * HD, 128), jnp.float32),  # q-pool i8
                        pltpu.VMEM((B, 128), jnp.float32),      # m
                        pltpu.VMEM((B, 128), jnp.float32),      # den (+sq)
                        pltpu.VMEM((B, HD), jnp.float32)],      # acc
    )

    kernel = functools.partial(_kernel_v3, n_layers=L, n_sblk=NS, bs=bs,
                               H=H, Dh=Dh)
    h_out, kvnew = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, d), jnp.bfloat16),
            jax.ShapeDtypeStruct((L, B, 2 * HD), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024),
    )(nblk, cl, x[:, 0].astype(jnp.bfloat16), packed["vec"], wqp, wfc, wpj,
      kvk, kvv, pool, poolt)

    k_new = kvnew[:, :, :HD].reshape(L, B, 1, H, Dh)
    v_new = kvnew[:, :, HD:].reshape(L, B, 1, H, Dh)
    k_new = jnp.clip(jnp.round(k_new.astype(jnp.float32) * KV_INT8_SCALE),
                     -127, 127)
    v_new = jnp.clip(jnp.round(v_new.astype(jnp.float32) * KV_INT8_SCALE),
                     -127, 127)
    cl0 = jnp.asarray(cache_len, jnp.int32).reshape(())
    kv_k = jax.lax.dynamic_update_slice(kv_k, k_new.astype(kv_k.dtype),
                                        (0, 0, cl0, 0, 0))
    kv_v = jax.lax.dynamic_update_slice(kv_v, v_new.astype(kv_v.dtype),
                                        (0, 0, cl0, 0, 0))
    return h_out[:, None, :], kv_k, kv_v


# ===========================================================================
# v4: balanced six-stream weight pipeline + whole-batch MXU attention
# ===========================================================================
# Two v3 costs remain (measured): the per-step DMA issue is lumpy — 3.26 MB
# lands on the (l-1, NS-1) step while (l, 2) carries only the KV block — and
# the attention work is a python loop over B (serial small dots + [bs, HD]
# VPU elementwise per scene).  v4:
#   * splits the layer's four matrices into SIX streams (qkv / proj / fc in
#     column halves / pj in row halves) with staggered lag index maps, so
#     every grid step issues ~2.0-2.6 MB over 3 concurrent streams — per
#     the measured v5e DMA law concurrency is what buys bandwidth;
#   * one int8 logits dot for the WHOLE batch: [B*bs, HD] @ [HD, B*H] with
#     cross-scene (bi != bj) entries masked to -inf (wasted MXU flops are
#     free at these sizes; the VPU softmax bookkeeping stays [B*bs, B*H]);
#   * one value dot for the whole batch: p [B*bs, B*H] is block-diagonal
#     after the mask, so a dim-0 contraction against V [B*bs, HD] yields
#     per-scene [H, HD] row blocks directly;
#   * V stays on the int8 grid through the mix (acc is carried at
#     KV_INT8_SCALE and rescaled once at finalize) — no per-block [bs, HD]
#     dequant multiply.
# Requires int8 KV storage (KV_INT8_SCALE grid).

def pack_fused_oar_v4(oar_params: Params) -> Params:
    """Stacked int8 OAR params → six-stream packed blocks for v4."""
    p = oar_params
    L, d, _ = p["attn"]["qkv"]["wq"].shape
    wfc = np.asarray(p["mlp"]["fc"]["wq"])
    wpj = np.asarray(p["mlp"]["proj"]["wq"])
    return {"vec": _pack_vec(p),
            "wqkv": p["attn"]["qkv"]["wq"],
            "wproj": p["attn"]["proj"]["wq"],
            "wfca": jnp.asarray(wfc[:, :, :2 * d]),
            "wfcb": jnp.asarray(wfc[:, :, 2 * d:]),
            "wpja": jnp.asarray(wpj[:, :2 * d]),
            "wpjb": jnp.asarray(wpj[:, 2 * d:])}


def _kernel_v4(nblk_ref, cl_ref,
               x_ref, vec_ref, wqkv_ref, wproj_ref, wfca_ref, wfcb_ref,
               wpja_ref, wpjb_ref, kvk_ref, kvv_ref, pool_ref, poolt_ref,
               h_out_ref, kvnew_ref,
               h_scr, qp_scr, m_scr, den_scr, cs_scr, acc_scr,
               *, n_layers: int, n_sblk: int, bs: int, H: int, Dh: int,
               eps: float = 1e-5):
    l = pl.program_id(0)
    ns = pl.program_id(1)
    B, d = x_ref.shape
    HD = H * Dh
    BH = B * H
    scale = 1.0 / math.sqrt(Dh)
    cl = cl_ref[0]
    off = _vec_offsets(d)

    def vec_slice(name):
        a, b = off[name]
        return vec_ref[0, 0, a:b]

    def layer_norm(v, w):
        mu = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.mean((v - mu) ** 2, axis=-1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)

    def qdot(v, w_blk, ws, b=None):
        sa = jnp.max(jnp.abs(v), axis=-1, keepdims=True) / 127.0 + 1e-12
        aq = jnp.clip(jnp.round(v / sa), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(aq, w_blk, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * sa * ws[None, :].astype(jnp.float32)
        if b is not None:
            y = y + b[None, :].astype(jnp.float32)
        return y

    pool = pool_ref[:]                 # [HD, H] f32
    poolt = poolt_ref[:]               # [H, HD] f32

    # ---- ns == 0: hidden init, QKV, quantized q-pool, self-term ----
    @pl.when(ns == 0)
    def _():
        @pl.when(l == 0)
        def _():
            h_scr[:] = x_ref[:].astype(jnp.float32)
        h = h_scr[:]
        a = layer_norm(h, vec_slice("ln1"))
        qkv = qdot(a, wqkv_ref[0], vec_slice("qkv_ws"), vec_slice("qkv_b"))
        q = qkv[:, :HD]
        k_new = qkv[:, HD:2 * HD]
        v_new = qkv[:, 2 * HD:]
        kvnew_ref[0, :, :HD] = k_new.astype(kvnew_ref.dtype)
        kvnew_ref[0, :, HD:] = v_new.astype(kvnew_ref.dtype)
        for b in range(B):
            qp = q[b][:, None] * pool                        # [HD, H] f32
            sq = jnp.max(jnp.abs(qp)) / 127.0 + 1e-12
            qp_scr[:, b * H:(b + 1) * H] = jnp.clip(jnp.round(qp / sq),
                                                    -127, 127)
            cs_scr[0:1, b * H:(b + 1) * H] = jnp.full(
                (1, H), 1.0, jnp.float32) * (sq * scale / KV_INT8_SCALE)
        sl_all = jax.lax.dot_general(
            (k_new * q).astype(jnp.float32), pool,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # [B, H]
        for b in range(B):
            m_scr[0:1, b * H:(b + 1) * H] = sl_all[b:b + 1]
        den_scr[0:1, :BH] = jnp.ones((1, BH), jnp.float32)
        acc_scr[:] = v_new * KV_INT8_SCALE

    # ---- every valid S-block: one whole-batch MXU flash update ----
    @pl.when(ns < nblk_ref[0])
    def _():
        base = ns * bs
        k_all = kvk_ref[0].reshape(B * bs, HD)               # int8
        v_all = kvv_ref[0].reshape(B * bs, HD)
        qp_i8 = qp_scr[:, :BH].astype(jnp.int8)
        li = jax.lax.dot_general(k_all, qp_i8,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        logits = li.astype(jnp.float32) * cs_scr[0:1, :BH]   # [B*bs, B*H]
        row = jax.lax.broadcasted_iota(jnp.int32, (B * bs, BH), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (B * bs, BH), 1)
        same = (row // bs) == (col // H)
        valid = same & (base + row % bs < cl)
        logits = jnp.where(valid, logits, -jnp.inf)
        m_old = m_scr[0:1, :BH]
        m_new = jnp.maximum(m_old, jnp.max(logits, axis=0, keepdims=True))
        corr = jnp.exp(m_old - m_new)                        # [1, BH]
        p = jnp.exp(logits - m_new)                          # [B*bs, BH]
        den_scr[0:1, :BH] = den_scr[0:1, :BH] * corr \
            + jnp.sum(p, axis=0, keepdims=True)
        m_scr[0:1, :BH] = m_new
        part = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v_all.astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [BH, HD]
        for b in range(B):
            corr_lanes = jax.lax.dot_general(
                corr[0:1, b * H:(b + 1) * H], poolt,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # [1, HD]
            blk_mix = jnp.sum(part[b * H:(b + 1) * H] * poolt, axis=0,
                              keepdims=True)                 # [1, HD]
            acc_scr[b:b + 1, :] = (acc_scr[b:b + 1, :] * corr_lanes
                                   + blk_mix)

    # ---- ns == NS-1: finalize, proj, MLP ----
    @pl.when(ns == n_sblk - 1)
    def _():
        h = h_scr[:]
        den_lanes_rows = []
        for b in range(B):
            den_lanes_rows.append(jax.lax.dot_general(
                den_scr[0:1, b * H:(b + 1) * H], poolt,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        den_lanes = jnp.concatenate(den_lanes_rows, axis=0)  # [B, HD]
        y = acc_scr[:] * (1.0 / KV_INT8_SCALE) / den_lanes
        y = qdot(y, wproj_ref[0], vec_slice("proj_ws"), vec_slice("proj_b"))
        h = (h.astype(jnp.bfloat16) + y.astype(jnp.bfloat16)
             ).astype(jnp.float32)
        a2 = layer_norm(h, vec_slice("ln2"))
        sa = jnp.max(jnp.abs(a2), axis=-1, keepdims=True) / 127.0 + 1e-12
        a2q = jnp.clip(jnp.round(a2 / sa), -127, 127).astype(jnp.int8)
        fca, _ = off["fc_ws"]
        fc_ws_a = vec_ref[0, 0, fca:fca + 2 * d]
        fc_ws_b = vec_ref[0, 0, fca + 2 * d:fca + 4 * d]
        hid_a = jax.lax.dot_general(a2q, wfca_ref[0], (((1,), (0,)),
                                                       ((), ())),
                                    preferred_element_type=jnp.int32
                                    ).astype(jnp.float32) \
            * sa * fc_ws_a[None, :].astype(jnp.float32)
        hid_b = jax.lax.dot_general(a2q, wfcb_ref[0], (((1,), (0,)),
                                                       ((), ())),
                                    preferred_element_type=jnp.int32
                                    ).astype(jnp.float32) \
            * sa * fc_ws_b[None, :].astype(jnp.float32)
        hid = _gelu_exact(jnp.concatenate([hid_a, hid_b], axis=-1))
        sh = jnp.max(jnp.abs(hid), axis=-1, keepdims=True) / 127.0 + 1e-12
        hq = jnp.clip(jnp.round(hid / sh), -127, 127).astype(jnp.int8)
        y2 = (jax.lax.dot_general(hq[:, :2 * d], wpja_ref[0],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
              + jax.lax.dot_general(hq[:, 2 * d:], wpjb_ref[0],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
              ).astype(jnp.float32) * sh \
            * vec_slice("pj_ws")[None, :].astype(jnp.float32)
        h = (h.astype(jnp.bfloat16) + y2.astype(jnp.bfloat16)
             ).astype(jnp.float32)
        h_scr[:] = h

        @pl.when(l == n_layers - 1)
        def _():
            h_out_ref[:] = h.astype(h_out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_head", "block_s"))
def fused_decode_step_v4(packed: Params, x: jnp.ndarray,
                         kv_k: jnp.ndarray, kv_v: jnp.ndarray,
                         cache_len, n_head: int, block_s: int = 0
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Balanced-stream, whole-batch fused decode step.  Requires int8 KV
    (KV_INT8_SCALE grid) and :func:`pack_fused_oar_v4` params."""
    L, B, S, H, Dh = kv_k.shape
    assert kv_k.dtype == jnp.int8, "v4 requires int8 KV storage"
    d = x.shape[-1]
    HD = H * Dh

    bs = block_s if block_s and S % block_s == 0 else S
    if bs == S and not block_s:
        for cand in (552, 512, 416, 384, 368, 276, 256):
            if S % cand == 0:
                bs = cand
                break
    if bs == S:
        for cand in range(min(S, 640), 63, -8):
            if S % cand == 0:
                bs = cand
                break
    NS = S // bs

    kvk = kv_k.reshape(L, B, S, HD)
    kvv = kv_v.reshape(L, B, S, HD)
    pool = jnp.asarray(_head_pool_matrix(H, Dh))
    poolt = pool.T.copy()

    cl = jnp.reshape(jnp.asarray(cache_len, jnp.int32), (1,))
    nblk = jnp.minimum((cl + bs - 1) // bs, NS).astype(jnp.int32)

    def at_l(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda l, ns, *_: (l,) + (0,) * len(shape))

    def lagged(shape, lag_ns):
        return pl.BlockSpec(
            (1,) + shape,
            lambda l, ns, *_: (jnp.maximum(l - (ns < lag_ns), 0),)
            + (0,) * len(shape))

    def kv_spec():
        return pl.BlockSpec(
            (1, B, bs, HD),
            lambda l, ns, nblk_ref, cl_ref: (
                l, 0, jnp.minimum(ns, jnp.maximum(nblk_ref[0] - 1, 0)), 0))

    lag = lambda k: min(k, NS - 1)    # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(L, NS),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),        # x
            at_l((1, packed["vec"].shape[-1])),           # vec
            at_l((d, 3 * d)),                             # wqkv
            lagged((d, d), lag(1)),                       # wproj
            lagged((d, 2 * d), lag(1)),                   # wfca
            lagged((d, 2 * d), lag(2)),                   # wfcb
            lagged((2 * d, d), lag(2)),                   # wpja
            lagged((2 * d, d), lag(3)),                   # wpjb
            kv_spec(), kv_spec(),
            pl.BlockSpec(memory_space=pltpu.VMEM),        # pool
            pl.BlockSpec(memory_space=pltpu.VMEM),        # poolt
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 2 * HD), lambda l, ns, *_: (l, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((B, d), jnp.float32),        # h
                        pltpu.VMEM((HD, 128), jnp.float32),     # q-pool i8
                        pltpu.VMEM((1, 128), jnp.float32),      # m
                        pltpu.VMEM((1, 128), jnp.float32),      # den
                        pltpu.VMEM((1, 128), jnp.float32),      # col scales
                        pltpu.VMEM((B, HD), jnp.float32)],      # acc
    )

    kernel = functools.partial(_kernel_v4, n_layers=L, n_sblk=NS, bs=bs,
                               H=H, Dh=Dh)
    h_out, kvnew = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, d), jnp.bfloat16),
            jax.ShapeDtypeStruct((L, B, 2 * HD), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024),
    )(nblk, cl, x[:, 0].astype(jnp.bfloat16), packed["vec"],
      packed["wqkv"], packed["wproj"], packed["wfca"], packed["wfcb"],
      packed["wpja"], packed["wpjb"], kvk, kvv, pool, poolt)

    k_new = kvnew[:, :, :HD].reshape(L, B, 1, H, Dh)
    v_new = kvnew[:, :, HD:].reshape(L, B, 1, H, Dh)
    k_new = jnp.clip(jnp.round(k_new.astype(jnp.float32) * KV_INT8_SCALE),
                     -127, 127)
    v_new = jnp.clip(jnp.round(v_new.astype(jnp.float32) * KV_INT8_SCALE),
                     -127, 127)
    cl0 = jnp.asarray(cache_len, jnp.int32).reshape(())
    kv_k = jax.lax.dynamic_update_slice(kv_k, k_new.astype(kv_k.dtype),
                                        (0, 0, cl0, 0, 0))
    kv_v = jax.lax.dynamic_update_slice(kv_v, v_new.astype(kv_v.dtype),
                                        (0, 0, cl0, 0, 0))
    return h_out[:, None, :], kv_k, kv_v


# ===========================================================================
# v5: static-pipeline multi-stream kernel (v3 compute, static index maps)
# ===========================================================================
# Ablation (scripts/probe_dma.py, scripts/probe_compute.py, measured on
# v5e): a kernel streaming v3's exact blocks through STATIC index maps runs
# at ~600 GB/s (0.65 ms/step at B=1), and adding v3's full attention + qdot
# compute only brings it to 0.71 ms/step — yet the real v3 kernel measures
# 2.22 ms.  The difference is v3's scalar-prefetch-driven KV index map
# (jnp.minimum(ns, nblk-1)): the runtime-clamped block index defeats the
# pipeliner's prefetch and serializes the big KV fetches.  v5 therefore:
#   * uses a plain grid with STATIC index maps everywhere — the KV stream
#     always walks all NS blocks of the (caller-sliced) cache;
#   * takes cache_len as an SMEM scalar used ONLY for in-kernel masking
#     (compute is cheap; DMA regularity is what matters);
#   * relies on the caller's per-segment cache slicing (rollout._sliced)
#     to keep whole-frame KV traffic proportional to the true prefix.
# Compute is v3's: int8 MXU logits dot, dim-0-contraction value dot,
# lagged weight streams.  Requires int8 KV (KV_INT8_SCALE grid) and
# pack_fused_oar params.

def _kernel_v5(nblk_ref, cl_ref, x_ref, vec_ref, wqp_ref, wfc_ref,
               wpj_ref, kvk_ref, kvv_ref, pool_ref, poolt_ref,
               h_out_ref, kvnew_ref,
               h_scr, qp_scr, m_scr, den_scr, acc_scr, sq_scr,
               *, n_layers: int, n_sblk: int, bs: int, H: int, Dh: int,
               n_bblk: int = 1, eps: float = 1e-5):
    l = pl.program_id(0)
    ns = pl.program_id(1)
    # batch-group grid dim (innermost, so per-(l, ns) weight blocks are
    # fetched once and reused across groups); absent when n_bblk == 1 so
    # the whole-batch path compiles exactly as before
    nb = pl.program_id(2) if n_bblk > 1 else None
    B, d = x_ref.shape
    bg = B // n_bblk                   # scenes per batch group
    HD = H * Dh
    scale = 1.0 / math.sqrt(Dh)
    cl = cl_ref[0]
    off = _vec_offsets(d)

    def vec_slice(name):
        a, b = off[name]
        return vec_ref[0, 0, a:b]

    def layer_norm(v, w):
        mu = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.mean((v - mu) ** 2, axis=-1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)

    def qdot(v, w_blk, ws, b=None):
        sa = jnp.max(jnp.abs(v), axis=-1, keepdims=True) / 127.0 + 1e-12
        aq = jnp.clip(jnp.round(v / sa), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(aq, w_blk, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * sa * ws[None, :].astype(jnp.float32)
        if b is not None:
            y = y + b[None, :].astype(jnp.float32)
        return y

    pool = pool_ref[:]                 # [HD, H] f32
    poolt = poolt_ref[:]               # [H, HD] f32

    # ---- ns == 0 (first batch group): hidden init, QKV, quantized
    # q-pool, self-term — computed for the WHOLE batch in one pass so
    # the qdot matmuls stay large ----
    init = (ns == 0) if n_bblk == 1 else ((ns == 0) & (nb == 0))

    @pl.when(init)
    def _():
        @pl.when(l == 0)
        def _():
            h_scr[:] = x_ref[:].astype(jnp.float32)
        h = h_scr[:]
        a = layer_norm(h, vec_slice("ln1"))
        qkv = qdot(a, wqp_ref[0, :, :3 * d], vec_slice("qkv_ws"),
                   vec_slice("qkv_b"))
        q = qkv[:, :HD]
        k_new = qkv[:, HD:2 * HD]
        v_new = qkv[:, 2 * HD:]
        kvnew_ref[0, :, :HD] = k_new.astype(kvnew_ref.dtype)
        kvnew_ref[0, :, HD:] = v_new.astype(kvnew_ref.dtype)
        for b in range(B):
            qp = q[b][:, None] * pool                       # [HD, H] f32
            sq = jnp.max(jnp.abs(qp)) / 127.0 + 1e-12
            qp_scr[b * HD:(b + 1) * HD, :H] = jnp.clip(
                jnp.round(qp / sq), -127, 127)
            # replicate the scalar across H lanes: the read side then only
            # needs a sublane broadcast (Mosaic rejects (1,1)->(bs,H))
            sq_scr[b:b + 1, :H] = jnp.full((1, H), sq, jnp.float32)
        sl_all = jax.lax.dot_general(
            (k_new * q).astype(jnp.float32), pool,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # [B, H]
        m_scr[:, :H] = sl_all
        den_scr[:, :H] = jnp.ones_like(sl_all)
        acc_scr[:] = v_new

    # ---- every S-block: MXU flash update (invalid rows masked) ----
    # rows of this batch group; with n_bblk == 1 the indices are static
    base = ns * bs
    spos = base + jax.lax.broadcasted_iota(jnp.int32, (bs, H), 0)
    valid = spos < cl
    for bb in range(bg):
        rb = bb if n_bblk == 1 else nb * bg + bb
        kmat = kvk_ref[0, bb]                            # [bs, HD] i8
        vmat = kvv_ref[0, bb]
        qp_i8 = qp_scr[pl.ds(rb * HD, HD), :H].astype(jnp.int8)
        sqv = sq_scr[pl.ds(rb, 1), :H]                   # [1, H]
        li = jax.lax.dot_general(kmat, qp_i8,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        logits = (li.astype(jnp.float32)
                  * (sqv * (scale / KV_INT8_SCALE)))     # [bs, H]
        logits = jnp.where(valid, logits, -jnp.inf)
        m_old = m_scr[pl.ds(rb, 1), :H]
        m_new = jnp.maximum(m_old, jnp.max(logits, axis=0,
                                           keepdims=True))
        corr = jnp.exp(m_old - m_new)
        p = jnp.exp(logits - m_new)                      # [bs, H] f32
        den = den_scr[pl.ds(rb, 1), :H] * corr + jnp.sum(p, axis=0,
                                                         keepdims=True)
        part = jax.lax.dot_general(
            p.astype(jnp.bfloat16),
            (vmat.astype(jnp.bfloat16)
             * (1.0 / KV_INT8_SCALE)).astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [H, HD]
        blk_mix = jnp.sum(part * poolt, axis=0,
                          keepdims=True)                 # [1, HD]
        corr_lanes = jnp.sum(corr[0][:, None] * poolt, axis=0,
                             keepdims=True)              # [1, HD]
        acc_scr[pl.ds(rb, 1), :] = (acc_scr[pl.ds(rb, 1), :] * corr_lanes
                                    + blk_mix)
        m_scr[pl.ds(rb, 1), :H] = m_new
        den_scr[pl.ds(rb, 1), :H] = den

    # ---- ns == NS-1 (last batch group): finalize, proj, MLP ----
    fin = ((ns == n_sblk - 1) if n_bblk == 1
           else ((ns == n_sblk - 1) & (nb == n_bblk - 1)))

    @pl.when(fin)
    def _():
        h = h_scr[:]
        den_lanes_rows = []
        for b in range(B):
            dl = jnp.sum(den_scr[b:b + 1, :H][0][:, None] * poolt, axis=0,
                         keepdims=True)
            den_lanes_rows.append(dl)
        den_lanes = jnp.concatenate(den_lanes_rows, axis=0)  # [B, HD]
        y = acc_scr[:] / den_lanes
        y = qdot(y, wqp_ref[0, :, 3 * d:4 * d], vec_slice("proj_ws"),
                 vec_slice("proj_b"))
        h = (h.astype(jnp.bfloat16) + y.astype(jnp.bfloat16)
             ).astype(jnp.float32)
        a2 = layer_norm(h, vec_slice("ln2"))
        hid = qdot(a2, wfc_ref[0], vec_slice("fc_ws"))
        hid = _gelu_exact(hid)
        y2 = qdot(hid, wpj_ref[0], vec_slice("pj_ws"))
        h = (h.astype(jnp.bfloat16) + y2.astype(jnp.bfloat16)
             ).astype(jnp.float32)
        h_scr[:] = h

        @pl.when(l == n_layers - 1)
        def _():
            h_out_ref[:] = h.astype(h_out_ref.dtype)


def _batch_split_grid(L, NS, B, bs, HD, batch_block):
    """Grid + KV BlockSpec factory for the batch-split kernels (v5 / w4 /
    v5i4).

    batch_block == 0 or == B → whole-batch 2-D grid; otherwise an
    innermost batch-group dim of size B // batch_block.  Raises on a
    non-divisor so a misconfigured knob can't silently run whole-batch
    (the un-split path is exactly the large-B VMEM failure the knob
    exists to avoid).  The returned kv_spec takes the block's trailing
    width (defaults to HD; packed caches pass HD//2, scale planes H)."""
    if batch_block and batch_block != B:
        if batch_block > B or B % batch_block:
            raise ValueError(
                f"batch_block={batch_block} must divide batch {B}")
        Bg, NB = batch_block, B // batch_block
        grid = (L, NS, NB)

        def kv_spec(width=HD):
            return pl.BlockSpec(
                (1, Bg, bs, width),
                lambda l, ns, nb, nblk_ref, cl_ref: (
                    l, nb,
                    jnp.minimum(ns, jnp.maximum(nblk_ref[0] - 1, 0)), 0))
    else:
        Bg, NB = B, 1
        grid = (L, NS)

        def kv_spec(width=HD):
            return pl.BlockSpec(
                (1, B, bs, width),
                lambda l, ns, nblk_ref, cl_ref: (
                    l, 0,
                    jnp.minimum(ns, jnp.maximum(nblk_ref[0] - 1, 0)), 0))
    return grid, Bg, NB, kv_spec


@functools.partial(jax.jit,
                   static_argnames=("n_head", "block_s", "batch_block"))
def fused_decode_step_v5(packed: Params, x: jnp.ndarray,
                         kv_k: jnp.ndarray, kv_v: jnp.ndarray,
                         cache_len, n_head: int, block_s: int = 0,
                         batch_block: int = 0
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Static-pipeline fused decode step (v3 compute, static DMA).

    Requires int8 KV caches (KV_INT8_SCALE grid) and pack_fused_oar
    params.  Streams the WHOLE (caller-sliced) cache every step; callers
    keep traffic proportional to the prefix via per-segment slicing.

    batch_block > 0 splits the batch into groups of that size on a third
    (innermost) grid dimension: per-(layer, S-block) weight fetches are
    shared across groups while each group's KV block is batch_block
    scenes, capping the kernel's VMEM footprint at large B (whole-batch
    blocks stop fitting around B=8).  0 = whole batch (the default).
    """
    # Accept [L, B, S, HD] (preferred: Dh=48 is lane-padded by XLA, so a
    # 5-D cache forces a physical relayout copy per step) or [L, B, S, H,
    # Dh].
    if kv_k.ndim == 4:
        L, B, S, HDk = kv_k.shape
        H = n_head
        Dh = HDk // H
    else:
        L, B, S, H, Dh = kv_k.shape
    assert kv_k.dtype == jnp.int8, "v5 requires int8 KV storage"
    d = x.shape[-1]
    HD = H * Dh

    bs = _pick_block_s(S, block_s)
    NS = S // bs

    kvk = kv_k if kv_k.ndim == 4 else kv_k.reshape(L, B, S, HD)
    kvv = kv_v if kv_v.ndim == 4 else kv_v.reshape(L, B, S, HD)
    pool = jnp.asarray(_head_pool_matrix(H, Dh))
    poolt = pool.T.copy()

    cl = jnp.reshape(jnp.asarray(cache_len, jnp.int32), (1,))

    wqp, wfc, wpj = packed["wqp"], packed["wfc"], packed["wpj"]

    # block index clamped at the last prefix-intersecting block: repeated
    # indices skip the DMA re-fetch, so mid-frame KV traffic tracks the
    # true prefix length (stale block contents are position-masked by ns,
    # so the unconditional flash update stays correct).  Static-map
    # measurement showed the clamp itself costs nothing at full cache —
    # the old v3 slowness was the 5-D cache relayout, not this map.
    nblk = jnp.minimum((cl + bs - 1) // bs, NS).astype(jnp.int32)

    grid, Bg, NB, kv_spec = _batch_split_grid(L, NS, B, bs, HD, batch_block)

    def at_l(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda l, ns, *_: (l,) + (0,) * len(shape))

    def lagged(shape, lag_ns):
        return pl.BlockSpec(
            (1,) + shape,
            lambda l, ns, *_, _lag=lag_ns: (
                jnp.maximum(l - (ns < _lag), 0),) + (0,) * len(shape))

    def kvnew_spec():
        return pl.BlockSpec((1, B, 2 * HD),
                            lambda l, ns, *_: (l, 0, 0))

    lag_pj = 1 if NS > 2 else 0
    lag_fc = 2 if NS > 2 else 0
    kernel = functools.partial(_kernel_v5, n_layers=L, n_sblk=NS, bs=bs,
                               H=H, Dh=Dh, n_bblk=NB)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),        # x
            at_l((1, packed["vec"].shape[-1])),           # vec
            at_l((d, 4 * d)),                             # wqp
            lagged((d, 4 * d), lag_fc),                   # wfc
            lagged((4 * d, d), lag_pj),                   # wpj
            kv_spec(), kv_spec(),
            pl.BlockSpec(memory_space=pltpu.VMEM),        # pool
            pl.BlockSpec(memory_space=pltpu.VMEM),        # poolt
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            kvnew_spec(),
        ],
        scratch_shapes=[pltpu.VMEM((B, d), jnp.float32),         # h
                        pltpu.VMEM((B * HD, 128), jnp.float32),  # q-pool i8
                        pltpu.VMEM((B, 128), jnp.float32),       # m
                        pltpu.VMEM((B, 128), jnp.float32),       # den
                        pltpu.VMEM((B, HD), jnp.float32),        # acc
                        pltpu.VMEM((B, 128), jnp.float32)],      # sq
    )
    h_out, kvnew = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, d), jnp.bfloat16),
            jax.ShapeDtypeStruct((L, B, 2 * HD), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * len(grid),
            vmem_limit_bytes=110 * 1024 * 1024),
    )(nblk, cl, x[:, 0].astype(jnp.bfloat16), packed["vec"], wqp, wfc,
      wpj, kvk, kvv, pool, poolt)

    shape_new = ((L, B, 1, HD) if kv_k.ndim == 4 else (L, B, 1, H, Dh))
    k_new = kvnew[:, :, :HD].reshape(shape_new)
    v_new = kvnew[:, :, HD:].reshape(shape_new)
    k_new = jnp.clip(jnp.round(k_new.astype(jnp.float32) * KV_INT8_SCALE),
                     -127, 127)
    v_new = jnp.clip(jnp.round(v_new.astype(jnp.float32) * KV_INT8_SCALE),
                     -127, 127)
    cl0 = jnp.asarray(cache_len, jnp.int32).reshape(())
    zeros = (0,) * (kv_k.ndim - 3)
    kv_k = jax.lax.dynamic_update_slice(kv_k, k_new.astype(kv_k.dtype),
                                        (0, 0, cl0) + zeros)
    kv_v = jax.lax.dynamic_update_slice(kv_v, v_new.astype(kv_v.dtype),
                                        (0, 0, cl0) + zeros)
    return h_out[:, None, :], kv_k, kv_v



# ===========================================================================
# v6: v5 + in-kernel aliased cache append (no out-of-kernel writeback)
# ===========================================================================
# Ablation (scripts/probe_v5_ablate.py, v5e): the v5 kernel body runs at
# 0.74 ms/step at B=2 — every compute piece overlaps with the ~600 GB/s
# block stream — but the real step measures 1.25 ms.  The difference is the
# OUT-OF-KERNEL cache writeback: the dynamic_update_slice pair after the
# pallas_call makes XLA materialize a copy of the 244 MB caches every step.
# v6 removes it: the caches are aliased input/outputs, and each layer's new
# K/V row is spliced into the streamed 8-row neighbourhood around
# `cache_len` and emitted as a (1, B, 8, HD) output block whose index map
# places it at sublane-window cl//8 via scalar prefetch — one pipelined
# ~12 KB write per layer into the SAME buffer the blocked input streams
# from.  The splice rows < cl are rewritten with identical data; rows
# >= cl are dead until a future append overwrites them; the row at cl is
# masked out of this step's attention — so the in-flight write never
# races a live read.  Requires flat [L, B, S, HD] int8 caches (S % bs == 0,
# bs % 8 == 0) and pack_fused_oar params; the passed caches are CONSUMED.

def _kernel_v6(cl_pref, x_ref, vec_ref, wqp_ref, wfc_ref, wpj_ref,
               kvk_ref, kvv_ref, pool_ref, poolt_ref,
               h_out_ref, kwin_ref, vwin_ref,
               h_scr, qp_scr, m_scr, den_scr, acc_scr, krow_scr, vrow_scr,
               sq_scr,
               *, n_layers: int, n_sblk: int, bs: int, H: int, Dh: int,
               eps: float = 1e-5):
    l = pl.program_id(0)
    ns = pl.program_id(1)
    B, d = x_ref.shape
    HD = H * Dh
    scale = 1.0 / math.sqrt(Dh)
    cl = cl_pref[0]
    off = _vec_offsets(d)

    def vec_slice(name):
        a, b = off[name]
        return vec_ref[0, 0, a:b]

    def layer_norm(v, w):
        mu = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.mean((v - mu) ** 2, axis=-1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)

    def qdot(v, w_blk, ws, b=None):
        sa = jnp.max(jnp.abs(v), axis=-1, keepdims=True) / 127.0 + 1e-12
        aq = jnp.clip(jnp.round(v / sa), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(aq, w_blk, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * sa * ws[None, :].astype(jnp.float32)
        if b is not None:
            y = y + b[None, :].astype(jnp.float32)
        return y

    pool = pool_ref[:]                 # [HD, H] f32
    poolt = poolt_ref[:]               # [H, HD] f32

    # ---- ns == 0: hidden init, QKV, row quantization, self-term ----
    @pl.when(ns == 0)
    def _():
        @pl.when(l == 0)
        def _():
            h_scr[:] = x_ref[:].astype(jnp.float32)
        h = h_scr[:]
        a = layer_norm(h, vec_slice("ln1"))
        qkv = qdot(a, wqp_ref[0, :, :3 * d], vec_slice("qkv_ws"),
                   vec_slice("qkv_b"))
        q = qkv[:, :HD]
        k_new = qkv[:, HD:2 * HD]
        v_new = qkv[:, 2 * HD:]
        krow_scr[:] = jnp.clip(jnp.round(k_new * KV_INT8_SCALE),
                               -127, 127).astype(jnp.int8)
        vrow_scr[:] = jnp.clip(jnp.round(v_new * KV_INT8_SCALE),
                               -127, 127).astype(jnp.int8)
        for b in range(B):
            qp = q[b][:, None] * pool                       # [HD, H] f32
            sq = jnp.max(jnp.abs(qp)) / 127.0 + 1e-12
            qp_scr[b * HD:(b + 1) * HD, :H] = jnp.clip(
                jnp.round(qp / sq), -127, 127)
            # replicate the scalar across H lanes: the read side then only
            # needs a sublane broadcast (Mosaic rejects (1,1)->(bs,H))
            sq_scr[b:b + 1, :H] = jnp.full((1, H), sq, jnp.float32)
        sl_all = jax.lax.dot_general(
            (k_new * q).astype(jnp.float32), pool,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # [B, H]
        m_scr[:, :H] = sl_all
        den_scr[:, :H] = jnp.ones_like(sl_all)
        acc_scr[:] = v_new

    # ---- append: splice the new row into its 8-row window and emit ----
    @pl.when(ns == cl // bs)
    def _():
        win_lo = (cl % bs) // 8 * 8
        sel = (jax.lax.broadcasted_iota(jnp.int32, (8, HD), 0)
               == cl % 8)
        for b in range(B):
            kwin = kvk_ref[0, b, pl.ds(win_lo, 8), :]
            vwin = kvv_ref[0, b, pl.ds(win_lo, 8), :]
            kwin_ref[0, b] = jnp.where(sel, krow_scr[b][None, :], kwin)
            vwin_ref[0, b] = jnp.where(sel, vrow_scr[b][None, :], vwin)

    # ---- every S-block: MXU flash update (invalid rows masked) ----
    base = ns * bs
    spos = base + jax.lax.broadcasted_iota(jnp.int32, (bs, H), 0)
    valid = spos < cl
    for b in range(B):
        kmat = kvk_ref[0, b]                             # [bs, HD] i8
        vmat = kvv_ref[0, b]
        qp_i8 = qp_scr[b * HD:(b + 1) * HD, :H].astype(jnp.int8)
        sqv = sq_scr[b:b + 1, :H]                        # [1, H]
        li = jax.lax.dot_general(kmat, qp_i8,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        logits = (li.astype(jnp.float32)
                  * (sqv * (scale / KV_INT8_SCALE)))     # [bs, H]
        logits = jnp.where(valid, logits, -jnp.inf)
        m_old = m_scr[b:b + 1, :H]
        m_new = jnp.maximum(m_old, jnp.max(logits, axis=0,
                                           keepdims=True))
        corr = jnp.exp(m_old - m_new)
        p = jnp.exp(logits - m_new)                      # [bs, H] f32
        den = den_scr[b:b + 1, :H] * corr + jnp.sum(p, axis=0,
                                                    keepdims=True)
        part = jax.lax.dot_general(
            p.astype(jnp.bfloat16),
            (vmat.astype(jnp.bfloat16)
             * (1.0 / KV_INT8_SCALE)).astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [H, HD]
        blk_mix = jnp.sum(part * poolt, axis=0, keepdims=True)
        corr_lanes = jnp.sum(corr[0][:, None] * poolt, axis=0,
                             keepdims=True)              # [1, HD]
        acc_scr[b:b + 1, :] = (acc_scr[b:b + 1, :] * corr_lanes
                               + blk_mix)
        m_scr[b:b + 1, :H] = m_new
        den_scr[b:b + 1, :H] = den

    # ---- ns == NS-1: finalize, proj, MLP ----
    @pl.when(ns == n_sblk - 1)
    def _():
        h = h_scr[:]
        den_lanes_rows = []
        for b in range(B):
            dl = jnp.sum(den_scr[b:b + 1, :H][0][:, None] * poolt, axis=0,
                         keepdims=True)
            den_lanes_rows.append(dl)
        den_lanes = jnp.concatenate(den_lanes_rows, axis=0)  # [B, HD]
        y = acc_scr[:] / den_lanes
        y = qdot(y, wqp_ref[0, :, 3 * d:4 * d], vec_slice("proj_ws"),
                 vec_slice("proj_b"))
        h = (h.astype(jnp.bfloat16) + y.astype(jnp.bfloat16)
             ).astype(jnp.float32)
        a2 = layer_norm(h, vec_slice("ln2"))
        hid = qdot(a2, wfc_ref[0], vec_slice("fc_ws"))
        hid = _gelu_exact(hid)
        y2 = qdot(hid, wpj_ref[0], vec_slice("pj_ws"))
        h = (h.astype(jnp.bfloat16) + y2.astype(jnp.bfloat16)
             ).astype(jnp.float32)
        h_scr[:] = h

        @pl.when(l == n_layers - 1)
        def _():
            h_out_ref[:] = h.astype(h_out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_head", "block_s"),
                   donate_argnums=(2, 3))
def fused_decode_step_v6(packed: Params, x: jnp.ndarray,
                         kv_k: jnp.ndarray, kv_v: jnp.ndarray,
                         cache_len, n_head: int, block_s: int = 0
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """v5 + in-kernel aliased cache append.

    kv_k/kv_v: flat [L, B, S, H*Dh] int8 (KV_INT8_SCALE grid), CONSUMED
    (aliased into the returned caches).  Returns (h [B, 1, d] bf16
    pre-ln_oar, kv_k, kv_v updated in place).
    """
    L, B, S, HD = kv_k.shape
    assert kv_k.dtype == jnp.int8 and kv_k.ndim == 4, \
        "v6 requires flat int8 KV storage"
    H = n_head
    d = x.shape[-1]
    Dh = HD // H

    bs = _pick_block_s(S, block_s)
    NS = S // bs
    assert bs % 8 == 0, "v6 append window needs bs % 8 == 0"

    pool = jnp.asarray(_head_pool_matrix(H, Dh))
    poolt = pool.T.copy()

    cl = jnp.reshape(jnp.asarray(cache_len, jnp.int32), (1,))

    wqp, wfc, wpj = packed["wqp"], packed["wfc"], packed["wpj"]

    def at_l(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda l, ns, cl_ref: (l,) + (0,) * len(shape))

    def lagged(shape, lag_ns):
        return pl.BlockSpec(
            (1,) + shape,
            lambda l, ns, cl_ref, _lag=lag_ns: (
                jnp.maximum(l - (ns < _lag), 0),) + (0,) * len(shape))

    def kv_spec():
        return pl.BlockSpec((1, B, bs, HD),
                            lambda l, ns, cl_ref: (l, 0, ns, 0))

    lag_pj = 1 if NS > 2 else 0
    lag_fc = 2 if NS > 2 else 0
    kernel = functools.partial(_kernel_v6, n_layers=L, n_sblk=NS, bs=bs,
                               H=H, Dh=Dh)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, NS),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),        # x
            at_l((1, packed["vec"].shape[-1])),           # vec
            at_l((d, 4 * d)),                             # wqp
            lagged((d, 4 * d), lag_fc),                   # wfc
            lagged((4 * d, d), lag_pj),                   # wpj
            kv_spec(), kv_spec(),                         # kvk, kvv
            pl.BlockSpec(memory_space=pltpu.VMEM),        # pool
            pl.BlockSpec(memory_space=pltpu.VMEM),        # poolt
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),        # h_out
            # 8-row append window at sublane-block cl//8 of the aliased
            # cache
            pl.BlockSpec((1, B, 8, HD),
                         lambda l, ns, cl_ref: (l, 0, cl_ref[0] // 8, 0)),
            pl.BlockSpec((1, B, 8, HD),
                         lambda l, ns, cl_ref: (l, 0, cl_ref[0] // 8, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((B, d), jnp.float32),         # h
                        pltpu.VMEM((B * HD, 128), jnp.float32),  # q-pool i8
                        pltpu.VMEM((B, 128), jnp.float32),       # m
                        pltpu.VMEM((B, 128), jnp.float32),       # den
                        pltpu.VMEM((B, HD), jnp.float32),        # acc
                        pltpu.VMEM((B, HD), jnp.int8),           # k row
                        pltpu.VMEM((B, HD), jnp.int8),           # v row
                        pltpu.VMEM((B, 128), jnp.float32)],      # sq
    )

    h_out, kv_k, kv_v = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, d), jnp.bfloat16),
            jax.ShapeDtypeStruct((L, B, S, HD), jnp.int8),
            jax.ShapeDtypeStruct((L, B, S, HD), jnp.int8),
        ],
        # flat input indices INCLUDE the scalar prefetch operand: cl=0 x=1
        # vec=2 wqp=3 wfc=4 wpj=5 kvk=6 kvv=7 pool=8 poolt=9 → alias the
        # caches straight to outputs 1/2
        input_output_aliases={6: 1, 7: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024),
    )(cl, x[:, 0].astype(jnp.bfloat16), packed["vec"], wqp, wfc, wpj,
      kv_k, kv_v, pool, poolt)
    return h_out[:, None, :], kv_k, kv_v

# ===========================================================================
# w4: v5 with int4 (W4A8) weights — group-128 scales, nibble-packed
# ===========================================================================
# The v5 kernel runs at ~90% of HBM peak, so the remaining decode lever is
# fewer bytes.  int8 weights are 255 MB/step (36 layers); int4 halves that
# to 128 MB + 8 MB of group scales.  Scheme:
#   * symmetric int4 in [-7, 7] with one scale per (128-row input group,
#     output channel) — the standard W4A8 serving recipe;
#   * nibble packing pairs group 2j (lo nibble) with group 2j+1 (hi
#     nibble) in one [128, N] int8 byte block, so the in-kernel unpack is
#     two sign-extending shifts and the group sub-dots consume aligned
#     activation slices;
#   * the three weight streams keep v5's shapes halved: wqp4 [L, K/2, 4d],
#     wfc4 [L, K/2, 4d], wpj4 [L, 2d, d]; all group scales ride ONE
#     [L, 18, 3072] f32 stream (pj's [24, 768] reshaped to [6, 3072]);
#   * activations quantize per-row over the full K (as in v5); output =
#     sum_j (acc_j * ws[group_j]) * sa.
# Accuracy: ~4-8% per-matmul relative error on Gaussian weights (vs <2%
# for int8) — an explicitly opt-in serving config (UMGEN_BENCH_W4=1 /
# ModelConfig.oar_weight_bits=4), not the default.

W4_GROUP = 128


def _quantize_w4_groups(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """[K, N] fp → (packed int8 [K/2, N], scales f32 [K/128, N])."""
    K, N = w.shape
    G = K // W4_GROUP
    wg = w.reshape(G, W4_GROUP, N).astype(np.float32)
    scale = np.maximum(np.abs(wg).max(axis=1, keepdims=True) / 7.0, 1e-8)
    q = np.clip(np.round(wg / scale), -7, 7).astype(np.int8)   # [G,128,N]
    lo = q[0::2]                                   # groups 0,2,4,...
    hi = q[1::2]
    packed = ((hi.astype(np.int16) << 4) | (lo.astype(np.int16) & 0xF)
              ).astype(np.int8)                    # [G/2, 128, N]
    return packed.reshape(K // 2, N), scale[:, 0, :]


def pack_fused_oar_w4(oar_params_raw: Params) -> Params:
    """RAW (fp32/bf16 "w") stacked OAR params → w4 packed blocks.

    Output: {"vec", "wqp4" [L,d/2,4d], "wfc4" [L,d/2,4d],
    "wpj4" [L,2d,d], "scales4" [L,18,3072] f32}.
    """
    p = oar_params_raw
    L, d, _ = np.asarray(p["attn"]["qkv"]["w"]).shape
    wqp = np.concatenate([np.asarray(p["attn"]["qkv"]["w"]),
                          np.asarray(p["attn"]["proj"]["w"])], axis=-1)
    wfc = np.asarray(p["mlp"]["fc"]["w"])
    wpj = np.asarray(p["mlp"]["proj"]["w"])

    qp_q = np.empty((L, d // 2, 4 * d), np.int8)
    fc_q = np.empty((L, d // 2, 4 * d), np.int8)
    pj_q = np.empty((L, 2 * d, d), np.int8)
    scales = np.empty((L, 18, 4 * d), np.float32)
    for ll in range(L):
        qp_q[ll], s_qp = _quantize_w4_groups(wqp[ll])
        fc_q[ll], s_fc = _quantize_w4_groups(wfc[ll])
        pj_q[ll], s_pj = _quantize_w4_groups(wpj[ll])
        scales[ll, 0:6] = s_qp
        scales[ll, 6:12] = s_fc
        scales[ll, 12:18] = s_pj.reshape(6, 4 * d)

    # vec block: LN weights + attention biases (ws slots filled with ones;
    # the w4 path never reads them)
    fake = {
        "ln1": p["ln1"], "ln2": p["ln2"],
        "attn": {"qkv": {"wq": np.zeros((L, d, 3 * d), np.int8),
                         "ws": np.ones((L, 3 * d), np.float32),
                         "b": np.asarray(p["attn"]["qkv"]["b"])},
                 "proj": {"wq": np.zeros((L, d, d), np.int8),
                          "ws": np.ones((L, d), np.float32),
                          "b": np.asarray(p["attn"]["proj"]["b"])}},
        "mlp": {"fc": {"ws": np.ones((L, 4 * d), np.float32)},
                "proj": {"ws": np.ones((L, d), np.float32)}},
    }
    return {"vec": _pack_vec(fake),
            "wqp4": jnp.asarray(qp_q), "wfc4": jnp.asarray(fc_q),
            "wpj4": jnp.asarray(pj_q), "scales4": jnp.asarray(scales)}


def _unpack_nibbles(b):
    """int8 packed byte block → (lo, hi) int8 in [-8, 7]."""
    bw = b.astype(jnp.int32)
    hi = (bw >> 4).astype(jnp.int8)
    lo = ((bw << 28) >> 28).astype(jnp.int8)
    return lo, hi


def _kernel_w4(nblk_ref, cl_ref, x_ref, vec_ref, wqp_ref, wfc_ref,
               wpj_ref, sc_ref, kvk_ref, kvv_ref, pool_ref, poolt_ref,
               h_out_ref, kvnew_ref,
               h_scr, qp_scr, m_scr, den_scr, acc_scr, sq_scr,
               *, n_layers: int, n_sblk: int, bs: int, H: int, Dh: int,
               n_bblk: int = 1, eps: float = 1e-5):
    l = pl.program_id(0)
    ns = pl.program_id(1)
    # batch-group grid dim (innermost; see _kernel_v5)
    nb = pl.program_id(2) if n_bblk > 1 else None
    B, d = x_ref.shape
    bg = B // n_bblk
    HD = H * Dh
    G = W4_GROUP
    scale = 1.0 / math.sqrt(Dh)
    cl = cl_ref[0]
    off = _vec_offsets(d)

    def vec_slice(name):
        a, b = off[name]
        return vec_ref[0, 0, a:b]

    def layer_norm(v, w):
        mu = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.mean((v - mu) ** 2, axis=-1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)

    def qdot4(v, w4_ref, sc_row0, n_out, col0=0, b_vec=None):
        """v [B, Kin] f32 @ int4 weights (w4_ref block [1, Kin/2, n_out]).

        sc_row0: first row of this weight's scale rows in sc_ref;
        col0: column offset into the weight block (for the qkv/proj split
        of wqp4).  Scale row layout: row j covers input group j with
        columns matching the weight's output columns."""
        Kin = v.shape[-1]
        sa = jnp.max(jnp.abs(v), axis=-1, keepdims=True) / 127.0 + 1e-12
        aq = jnp.clip(jnp.round(v / sa), -127, 127).astype(jnp.int8)
        y = jnp.zeros((v.shape[0], n_out), jnp.float32)
        for j in range(Kin // (2 * G)):          # packed block pairs
            blk = w4_ref[0, j * G:(j + 1) * G, col0:col0 + n_out]
            lo, hi = _unpack_nibbles(blk)
            a_lo = aq[:, (2 * j) * G:(2 * j + 1) * G]
            a_hi = aq[:, (2 * j + 1) * G:(2 * j + 2) * G]
            acc_lo = jax.lax.dot_general(
                a_lo, lo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc_hi = jax.lax.dot_general(
                a_hi, hi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            r = sc_row0 + 2 * j
            s_lo = sc_ref[0, r:r + 1, col0:col0 + n_out]       # [1, n]
            s_hi = sc_ref[0, r + 1:r + 2, col0:col0 + n_out]
            y = y + acc_lo.astype(jnp.float32) * s_lo \
                + acc_hi.astype(jnp.float32) * s_hi
        y = y * sa
        if b_vec is not None:
            y = y + b_vec[None, :].astype(jnp.float32)
        return y

    def qdot4_pj(v):
        """MLP down-proj: Kin = 4d (24 groups), scales reshaped [6, 4d]:
        group g lives at scale row 12 + g//4, cols (g%4)*d:(g%4+1)*d."""
        Kin = v.shape[-1]
        sa = jnp.max(jnp.abs(v), axis=-1, keepdims=True) / 127.0 + 1e-12
        aq = jnp.clip(jnp.round(v / sa), -127, 127).astype(jnp.int8)
        y = jnp.zeros((v.shape[0], d), jnp.float32)
        for j in range(Kin // (2 * G)):          # 12 packed pairs
            blk = wpj_ref[0, j * G:(j + 1) * G, :]
            lo, hi = _unpack_nibbles(blk)
            a_lo = aq[:, (2 * j) * G:(2 * j + 1) * G]
            a_hi = aq[:, (2 * j + 1) * G:(2 * j + 2) * G]
            acc_lo = jax.lax.dot_general(
                a_lo, lo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc_hi = jax.lax.dot_general(
                a_hi, hi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            g_lo, g_hi = 2 * j, 2 * j + 1
            rl, rh = 12 + g_lo // 4, 12 + g_hi // 4
            s_lo = sc_ref[0, rl:rl + 1,
                          (g_lo % 4) * d:(g_lo % 4 + 1) * d]   # [1, d]
            s_hi = sc_ref[0, rh:rh + 1,
                          (g_hi % 4) * d:(g_hi % 4 + 1) * d]
            y = y + acc_lo.astype(jnp.float32) * s_lo \
                + acc_hi.astype(jnp.float32) * s_hi
        return y * sa

    pool = pool_ref[:]
    poolt = poolt_ref[:]

    # ---- ns == 0 (first batch group): hidden init, QKV (int4), q-pool,
    # self-term — whole batch in one pass ----
    init = (ns == 0) if n_bblk == 1 else ((ns == 0) & (nb == 0))

    @pl.when(init)
    def _():
        @pl.when(l == 0)
        def _():
            h_scr[:] = x_ref[:].astype(jnp.float32)
        h = h_scr[:]
        a = layer_norm(h, vec_slice("ln1"))
        qkv = qdot4(a, wqp_ref, 0, 3 * d, col0=0,
                    b_vec=vec_slice("qkv_b"))
        q = qkv[:, :HD]
        k_new = qkv[:, HD:2 * HD]
        v_new = qkv[:, 2 * HD:]
        kvnew_ref[0, :, :HD] = k_new.astype(kvnew_ref.dtype)
        kvnew_ref[0, :, HD:] = v_new.astype(kvnew_ref.dtype)
        for b in range(B):
            qp = q[b][:, None] * pool
            sq = jnp.max(jnp.abs(qp)) / 127.0 + 1e-12
            qp_scr[b * HD:(b + 1) * HD, :H] = jnp.clip(
                jnp.round(qp / sq), -127, 127)
            # replicate the scalar across H lanes: the read side then only
            # needs a sublane broadcast (Mosaic rejects (1,1)->(bs,H))
            sq_scr[b:b + 1, :H] = jnp.full((1, H), sq, jnp.float32)
        sl_all = jax.lax.dot_general(
            (k_new * q).astype(jnp.float32), pool,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        m_scr[:, :H] = sl_all
        den_scr[:, :H] = jnp.ones_like(sl_all)
        acc_scr[:] = v_new

    # ---- every S-block: MXU flash update (this batch group's rows) ----
    base = ns * bs
    spos = base + jax.lax.broadcasted_iota(jnp.int32, (bs, H), 0)
    valid = spos < cl
    for bb in range(bg):
        rb = bb if n_bblk == 1 else nb * bg + bb
        kmat = kvk_ref[0, bb]
        vmat = kvv_ref[0, bb]
        qp_i8 = qp_scr[pl.ds(rb * HD, HD), :H].astype(jnp.int8)
        sqv = sq_scr[pl.ds(rb, 1), :H]                   # [1, H]
        li = jax.lax.dot_general(kmat, qp_i8,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        logits = (li.astype(jnp.float32)
                  * (sqv * (scale / KV_INT8_SCALE)))
        logits = jnp.where(valid, logits, -jnp.inf)
        m_old = m_scr[pl.ds(rb, 1), :H]
        m_new = jnp.maximum(m_old, jnp.max(logits, axis=0,
                                           keepdims=True))
        corr = jnp.exp(m_old - m_new)
        p = jnp.exp(logits - m_new)
        den = den_scr[pl.ds(rb, 1), :H] * corr + jnp.sum(p, axis=0,
                                                         keepdims=True)
        part = jax.lax.dot_general(
            p.astype(jnp.bfloat16),
            (vmat.astype(jnp.bfloat16)
             * (1.0 / KV_INT8_SCALE)).astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        blk_mix = jnp.sum(part * poolt, axis=0, keepdims=True)
        corr_lanes = jnp.sum(corr[0][:, None] * poolt, axis=0,
                             keepdims=True)
        acc_scr[pl.ds(rb, 1), :] = (acc_scr[pl.ds(rb, 1), :] * corr_lanes
                                    + blk_mix)
        m_scr[pl.ds(rb, 1), :H] = m_new
        den_scr[pl.ds(rb, 1), :H] = den

    # ---- ns == NS-1 (last batch group): finalize, proj/MLP (int4) ----
    fin = ((ns == n_sblk - 1) if n_bblk == 1
           else ((ns == n_sblk - 1) & (nb == n_bblk - 1)))

    @pl.when(fin)
    def _():
        h = h_scr[:]
        den_lanes_rows = []
        for b in range(B):
            dl = jnp.sum(den_scr[b:b + 1, :H][0][:, None] * poolt, axis=0,
                         keepdims=True)
            den_lanes_rows.append(dl)
        den_lanes = jnp.concatenate(den_lanes_rows, axis=0)
        y = acc_scr[:] / den_lanes
        y = qdot4(y, wqp_ref, 0, d, col0=3 * d,
                  b_vec=vec_slice("proj_b"))
        h = (h.astype(jnp.bfloat16) + y.astype(jnp.bfloat16)
             ).astype(jnp.float32)
        a2 = layer_norm(h, vec_slice("ln2"))
        hid = qdot4(a2, wfc_ref, 6, 4 * d)
        hid = _gelu_exact(hid)
        y2 = qdot4_pj(hid)
        h = (h.astype(jnp.bfloat16) + y2.astype(jnp.bfloat16)
             ).astype(jnp.float32)
        h_scr[:] = h

        @pl.when(l == n_layers - 1)
        def _():
            h_out_ref[:] = h.astype(h_out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("n_head", "block_s", "batch_block"))
def fused_decode_step_w4(packed: Params, x: jnp.ndarray,
                         kv_k: jnp.ndarray, kv_v: jnp.ndarray,
                         cache_len, n_head: int, block_s: int = 0,
                         batch_block: int = 0
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """W4A8 fused decode step on the flat int8 cache.

    packed: output of :func:`pack_fused_oar_w4`; kv_k/kv_v: flat
    [L, B, S, H*Dh] int8 (KV_INT8_SCALE grid).  batch_block as in
    :func:`fused_decode_step_v5` (batch groups on an innermost grid
    dim for large B)."""
    L = packed["wqp4"].shape[0]
    _, B, S, HD = kv_k.shape
    assert kv_k.dtype == jnp.int8 and kv_k.ndim == 4, \
        "w4 requires flat int8 KV storage"
    H = n_head
    d = x.shape[-1]
    Dh = HD // H

    bs = _pick_block_s(S, block_s)
    NS = S // bs

    pool = jnp.asarray(_head_pool_matrix(H, Dh))
    poolt = pool.T.copy()

    cl = jnp.reshape(jnp.asarray(cache_len, jnp.int32), (1,))
    nblk = jnp.minimum((cl + bs - 1) // bs, NS).astype(jnp.int32)

    grid, Bg, NB, kv_spec = _batch_split_grid(L, NS, B, bs, HD, batch_block)

    def at_l(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda l, ns, *_: (l,) + (0,) * len(shape))

    def lagged(shape, lag_ns):
        return pl.BlockSpec(
            (1,) + shape,
            lambda l, ns, *_, _lag=lag_ns: (
                jnp.maximum(l - (ns < _lag), 0),) + (0,) * len(shape))

    lag_pj = 1 if NS > 2 else 0
    lag_fc = 2 if NS > 2 else 0
    kernel = functools.partial(_kernel_w4, n_layers=L, n_sblk=NS, bs=bs,
                               H=H, Dh=Dh, n_bblk=NB)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),        # x
            at_l((1, packed["vec"].shape[-1])),           # vec
            at_l((d // 2, 4 * d)),                        # wqp4
            lagged((d // 2, 4 * d), lag_fc),              # wfc4
            lagged((2 * d, d), lag_pj),                   # wpj4
            at_l((18, 4 * d)),                            # scales4
            kv_spec(), kv_spec(),
            pl.BlockSpec(memory_space=pltpu.VMEM),        # pool
            pl.BlockSpec(memory_space=pltpu.VMEM),        # poolt
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 2 * HD), lambda l, ns, *_: (l, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((B, d), jnp.float32),
                        pltpu.VMEM((B * HD, 128), jnp.float32),
                        pltpu.VMEM((B, 128), jnp.float32),
                        pltpu.VMEM((B, 128), jnp.float32),
                        pltpu.VMEM((B, HD), jnp.float32),
                        pltpu.VMEM((B, 128), jnp.float32)],      # sq
    )
    h_out, kvnew = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, d), jnp.bfloat16),
            jax.ShapeDtypeStruct((L, B, 2 * HD), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * len(grid),
            vmem_limit_bytes=110 * 1024 * 1024),
    )(nblk, cl, x[:, 0].astype(jnp.bfloat16), packed["vec"],
      packed["wqp4"], packed["wfc4"], packed["wpj4"], packed["scales4"],
      kv_k, kv_v, pool, poolt)

    k_new = kvnew[:, :, :HD].reshape(L, B, 1, HD)
    v_new = kvnew[:, :, HD:].reshape(L, B, 1, HD)
    k_new = jnp.clip(jnp.round(k_new.astype(jnp.float32) * KV_INT8_SCALE),
                     -127, 127)
    v_new = jnp.clip(jnp.round(v_new.astype(jnp.float32) * KV_INT8_SCALE),
                     -127, 127)
    cl0 = jnp.asarray(cache_len, jnp.int32).reshape(())
    kv_k = jax.lax.dynamic_update_slice(kv_k, k_new.astype(kv_k.dtype),
                                        (0, 0, cl0, 0))
    kv_v = jax.lax.dynamic_update_slice(kv_v, v_new.astype(kv_v.dtype),
                                        (0, 0, cl0, 0))
    return h_out[:, None, :], kv_k, kv_v


# ===========================================================================
# v7: v5 with the per-scene attention loop replaced by block-diagonal MXU
# ===========================================================================
# EXPERIMENTAL — kept for the record; v5 remains the default.  v7 was
# motivated by per-call microbench numbers (2.44/4.41/6.42/8.39 ms at
# B=2/4/6/8, S=2208) that turned out to be dominated by a fixed ~1-2 ms
# relay overhead PER CALL; scan-timed device latencies show v5 already at
# the HBM DMA floor (0.80 ms at B=4 S=1031, 1.18 ms at S=2207) while
# v7's B×-redundant dots make it compute-bound (2.53 ms at B=4 S=2207;
# it only ties v5 when S decomposes into >=3 blocks).  Time kernels with
# >=256-step scans, never per-call wall time (see tpu-v5e relay notes).
#
# v7 computes ALL scenes' attention with two rank-2 dots per
# (layer, S-block):
#
#   logits [B*bs, B*H] = kv-block (stacked scenes) @ qp  [HD, B*H]
#   part   [B*H,  HD ] = p^T @ v-block (contract dim 0 of both)
#
# where qp holds every scene's quantized q(x)pool operand side by side and
# the cross-scene blocks of `logits` are masked to -inf before softmax
# (they cost B^2/B more MXU work, but decode is DMA-bound and the lanes
# were padded anyway; B*H<=128 keeps one lane tile).  All stats (m, den,
# acc) vectorize over [B, H].  Selector constants (esel/eselT) and tiled
# pool planes turn the per-scene gathers into dots with the two
# dimension-number forms Mosaic already lowers in v3/v5: ((1,),(0,)) and
# ((0,),(0,)).  Same int8 flat-cache contract as v5.

def _kernel_v7(nblk_ref, cl_ref, x_ref, vec_ref, wqp_ref, wfc_ref,
               wpj_ref, kvk_ref, kvv_ref,
               esel_ref, eselt_ref, poolbig_ref, pooltb_ref,
               h_out_ref, kvnew_ref,
               h_scr, qp_scr, qs_scr, m_scr, den_scr, acc_scr,
               *, n_layers: int, n_sblk: int, bs: int, H: int, Dh: int,
               eps: float = 1e-5):
    l = pl.program_id(0)
    ns = pl.program_id(1)
    B, d = x_ref.shape
    HD = H * Dh
    BH = B * H
    scale = 1.0 / math.sqrt(Dh)
    cl = cl_ref[0]
    off = _vec_offsets(d)

    def vec_slice(name):
        a, b = off[name]
        return vec_ref[0, 0, a:b]

    def layer_norm(v, w):
        mu = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.mean((v - mu) ** 2, axis=-1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)

    def qdot(v, w_blk, ws, b=None):
        sa = jnp.max(jnp.abs(v), axis=-1, keepdims=True) / 127.0 + 1e-12
        aq = jnp.clip(jnp.round(v / sa), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(aq, w_blk, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * sa * ws[None, :].astype(jnp.float32)
        if b is not None:
            y = y + b[None, :].astype(jnp.float32)
        return y

    # ---- ns == 0: hidden init, QKV, batched quantized q-pool, self ----
    @pl.when(ns == 0)
    def _():
        @pl.when(l == 0)
        def _():
            h_scr[:] = x_ref[:].astype(jnp.float32)
        h = h_scr[:]
        a = layer_norm(h, vec_slice("ln1"))
        qkv = qdot(a, wqp_ref[0, :, :3 * d], vec_slice("qkv_ws"),
                   vec_slice("qkv_b"))
        q = qkv[:, :HD]
        k_new = qkv[:, HD:2 * HD]
        v_new = qkv[:, 2 * HD:]
        kvnew_ref[0, :, :HD] = k_new.astype(kvnew_ref.dtype)
        kvnew_ref[0, :, HD:] = v_new.astype(kvnew_ref.dtype)
        # qp [HD, B*H]: column b*H+h = q[b] * pool[:, h]; built without
        # transposes via q^T·eselT = dot_general contracting dim 0 of both
        q_exp = jax.lax.dot_general(q, eselt_ref[:],
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        qp = q_exp * poolbig_ref[:]                       # [HD, BH]
        sc = jnp.max(jnp.abs(qp), axis=0, keepdims=True) / 127.0 + 1e-12
        qp_scr[:] = jnp.clip(jnp.round(qp / sc), -127, 127)
        qs_scr[0:1, :BH] = sc
        # self logit per (b, h), stored in [1, BH] lane layout (column
        # c = b*H + h) — Mosaic cannot reshape [BH] across sublanes, so
        # every flash stat lives in this layout end-to-end
        sl_full = jax.lax.dot_general(
            (k_new * q).astype(jnp.float32), poolbig_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale    # [B, BH]
        sl_bh = jnp.sum(eselt_ref[:] * sl_full, axis=0, keepdims=True)
        m_scr[0:1, :BH] = sl_bh
        den_scr[0:1, :BH] = jnp.ones_like(sl_bh)
        acc_scr[:] = v_new

    # ---- every S-block: one masked block-diagonal MXU flash update ----
    base = ns * bs
    km = kvk_ref[0].reshape(B * bs, HD)                   # i8, scene-major
    vm = kvv_ref[0].reshape(B * bs, HD)
    qp_i8 = qp_scr[:].astype(jnp.int8)                    # [HD, BH]
    li = jax.lax.dot_general(km, qp_i8, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)  # [B*bs, BH]
    sc = qs_scr[0, :BH]                                   # [BH]
    logits = li.astype(jnp.float32) * (sc[None, :]
                                       * (scale / KV_INT8_SCALE))
    row = jax.lax.broadcasted_iota(jnp.int32, (B * bs, BH), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (B * bs, BH), 1)
    keep = (row // bs == col // H) & (base + row % bs < cl)
    logits = jnp.where(keep, logits, -jnp.inf)
    m_old = m_scr[0:1, :BH]                               # [1, BH]
    m_blk = jnp.max(logits, axis=0, keepdims=True)        # [1, BH]
    m_new = jnp.maximum(m_old, m_blk)
    corr = jnp.exp(m_old - m_new)                         # [1, BH]
    p = jnp.exp(logits - m_new)                           # [B*bs, BH]
    den = den_scr[0:1, :BH] * corr + jnp.sum(p, axis=0, keepdims=True)
    part = jax.lax.dot_general(
        p.astype(jnp.bfloat16),
        (vm.astype(jnp.bfloat16) * (1.0 / KV_INT8_SCALE)
         ).astype(jnp.bfloat16),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [BH, HD]
    blk_mix = jax.lax.dot_general(esel_ref[:], part * pooltb_ref[:],
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    # expand [1, BH] -> [B, HD]: row b, lanes of head h get corr[0, b*H+h]
    corr_lanes = jax.lax.dot_general(eselt_ref[:] * corr, pooltb_ref[:],
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    acc_scr[:] = acc_scr[:] * corr_lanes + blk_mix        # [B, HD]
    m_scr[0:1, :BH] = m_new
    den_scr[0:1, :BH] = den

    # ---- ns == NS-1: finalize, proj, MLP ----
    @pl.when(ns == n_sblk - 1)
    def _():
        h = h_scr[:]
        den_lanes = jax.lax.dot_general(
            eselt_ref[:] * den_scr[0:1, :BH], pooltb_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [B, HD]
        y = acc_scr[:] / den_lanes
        y = qdot(y, wqp_ref[0, :, 3 * d:4 * d], vec_slice("proj_ws"),
                 vec_slice("proj_b"))
        h = (h.astype(jnp.bfloat16) + y.astype(jnp.bfloat16)
             ).astype(jnp.float32)
        a2 = layer_norm(h, vec_slice("ln2"))
        hid = qdot(a2, wfc_ref[0], vec_slice("fc_ws"))
        hid = _gelu_exact(hid)
        y2 = qdot(hid, wpj_ref[0], vec_slice("pj_ws"))
        h = (h.astype(jnp.bfloat16) + y2.astype(jnp.bfloat16)
             ).astype(jnp.float32)
        h_scr[:] = h

        @pl.when(l == n_layers - 1)
        def _():
            h_out_ref[:] = h.astype(h_out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_head", "block_s"))
def fused_decode_step_v7(packed: Params, x: jnp.ndarray,
                         kv_k: jnp.ndarray, kv_v: jnp.ndarray,
                         cache_len, n_head: int, block_s: int = 0
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batch-vectorized fused decode step (v5 contract, block-diagonal
    attention).  Requires flat [L, B, S, H*Dh] int8 KV caches, B*H <= 128,
    and pack_fused_oar params."""
    L, B, S, HDk = kv_k.shape
    H = n_head
    Dh = HDk // H
    assert kv_k.dtype == jnp.int8, "v7 requires int8 KV storage"
    assert B * H <= 128, "v7 packs all scenes' heads into one lane tile"
    d = x.shape[-1]
    HD = H * Dh
    BH = B * H

    bs = _pick_block_s(S, block_s)
    NS = S // bs

    pool_np = np.asarray(_head_pool_matrix(H, Dh), np.float32)  # [HD, H]
    esel_np = np.kron(np.eye(B, dtype=np.float32),
                      np.ones((H, 1), np.float32))        # [BH, B]
    esel = jnp.asarray(esel_np)
    eselt = jnp.asarray(esel_np.T.copy())                 # [B, BH]
    poolbig = jnp.asarray(np.tile(pool_np, (1, B)))       # [HD, BH]
    pooltb = jnp.asarray(np.tile(pool_np.T, (B, 1)))      # [BH, HD]

    cl = jnp.reshape(jnp.asarray(cache_len, jnp.int32), (1,))
    wqp, wfc, wpj = packed["wqp"], packed["wfc"], packed["wpj"]
    nblk = jnp.minimum((cl + bs - 1) // bs, NS).astype(jnp.int32)

    def at_l(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda l, ns, *_: (l,) + (0,) * len(shape))

    def lagged(shape, lag_ns):
        return pl.BlockSpec(
            (1,) + shape,
            lambda l, ns, *_, _lag=lag_ns: (
                jnp.maximum(l - (ns < _lag), 0),) + (0,) * len(shape))

    def kv_spec():
        return pl.BlockSpec(
            (1, B, bs, HD),
            lambda l, ns, nblk_ref, cl_ref: (
                l, 0, jnp.minimum(ns, jnp.maximum(nblk_ref[0] - 1, 0)), 0))

    lag_pj = 1 if NS > 2 else 0
    lag_fc = 2 if NS > 2 else 0
    kernel = functools.partial(_kernel_v7, n_layers=L, n_sblk=NS, bs=bs,
                               H=H, Dh=Dh)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(L, NS),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),        # x
            at_l((1, packed["vec"].shape[-1])),           # vec
            at_l((d, 4 * d)),                             # wqp
            lagged((d, 4 * d), lag_fc),                   # wfc
            lagged((4 * d, d), lag_pj),                   # wpj
            kv_spec(), kv_spec(),
            pl.BlockSpec(memory_space=pltpu.VMEM),        # esel
            pl.BlockSpec(memory_space=pltpu.VMEM),        # eselt
            pl.BlockSpec(memory_space=pltpu.VMEM),        # poolbig
            pl.BlockSpec(memory_space=pltpu.VMEM),        # pooltb
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 2 * HD), lambda l, ns, *_: (l, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((B, d), jnp.float32),       # h
                        pltpu.VMEM((HD, BH), jnp.float32),     # q-pool
                        pltpu.VMEM((8, 128), jnp.float32),     # q scales
                        pltpu.VMEM((B, 128), jnp.float32),     # m
                        pltpu.VMEM((B, 128), jnp.float32),     # den
                        pltpu.VMEM((B, HD), jnp.float32)],     # acc
    )
    h_out, kvnew = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, d), jnp.bfloat16),
            jax.ShapeDtypeStruct((L, B, 2 * HD), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024),
    )(nblk, cl, x[:, 0].astype(jnp.bfloat16), packed["vec"], wqp, wfc,
      wpj, kv_k, kv_v, esel, eselt, poolbig, pooltb)

    k_new = kvnew[:, :, :HD].reshape(L, B, 1, HD)
    v_new = kvnew[:, :, HD:].reshape(L, B, 1, HD)
    k_new = jnp.clip(jnp.round(k_new.astype(jnp.float32) * KV_INT8_SCALE),
                     -127, 127)
    v_new = jnp.clip(jnp.round(v_new.astype(jnp.float32) * KV_INT8_SCALE),
                     -127, 127)
    cl0 = jnp.asarray(cache_len, jnp.int32).reshape(())
    kv_k = jax.lax.dynamic_update_slice(kv_k, k_new.astype(kv_k.dtype),
                                        (0, 0, cl0, 0))
    kv_v = jax.lax.dynamic_update_slice(kv_v, v_new.astype(kv_v.dtype),
                                        (0, 0, cl0, 0))
    return h_out[:, None, :], kv_k, kv_v


# ===========================================================================
# v5i4: v5 with an int4 (nibble-packed) KV cache + per-(row, head) scales
# ===========================================================================
# At B=4, S=2207 the v5 step is DMA-bound at ~630 GB/s streaming 255 MB of
# int8 weights + 488 MB of int8 KV — the CACHE, not the weights, is the
# larger stream.  v5i4 stores K/V as int4 nibbles (halves layout: packed
# column j holds hd=j in the low nibble and hd=j+HD/2 in the high nibble)
# with one absmax scale per (row, head), halving KV bytes.  The head-pool
# trick makes the per-(row, head) scales exact:
#
#   * logits[s,h] contracts only hd ∈ head h (qp's pool structure), so the
#     int dot factors as raw[s,h] * ks[s,h] — one elementwise [bs, H]
#     multiply after two [bs, HD/2] @ [HD/2, H] dots (lo/hi halves).
#   * the AV dot's surviving entries pair h == head(hd), so V's scale
#     folds into the softmax weights: p'[s,h] = p[s,h] * vs[s,h] before
#     the two [bs, HD/2] value dots.
#
# Appended rows are quantized/packed OUTSIDE the kernel (q = round(7k/ks),
# clip ±7) and spliced with dynamic_update_slice like v5's int8 rows.
# Scale planes are [L, B, S, H] f32 — 2% of the packed payload.

def _kernel_v5i4(nblk_ref, cl_ref, x_ref, vec_ref, wqp_ref, wfc_ref,
                 wpj_ref, kvk_ref, kvv_ref, ksc_ref, vsc_ref,
                 pool_ref, poolt_ref, h_out_ref, kvnew_ref,
                 h_scr, qp_scr, m_scr, den_scr, acc_scr, sq_scr,
                 *, n_layers: int, n_sblk: int, bs: int, H: int, Dh: int,
                 n_bblk: int = 1, eps: float = 1e-5):
    l = pl.program_id(0)
    ns = pl.program_id(1)
    nb = pl.program_id(2) if n_bblk > 1 else None
    B, d = x_ref.shape
    bg = B // n_bblk
    HD = H * Dh
    HDh = HD // 2
    scale = 1.0 / math.sqrt(Dh)
    cl = cl_ref[0]
    off = _vec_offsets(d)

    def vec_slice(name):
        a, b = off[name]
        return vec_ref[0, 0, a:b]

    def layer_norm(v, w):
        mu = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.mean((v - mu) ** 2, axis=-1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)

    def qdot(v, w_blk, ws, b=None):
        sa = jnp.max(jnp.abs(v), axis=-1, keepdims=True) / 127.0 + 1e-12
        aq = jnp.clip(jnp.round(v / sa), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(aq, w_blk, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * sa * ws[None, :].astype(jnp.float32)
        if b is not None:
            y = y + b[None, :].astype(jnp.float32)
        return y

    pool = pool_ref[:]                 # [HD, H] f32
    poolt = poolt_ref[:]               # [H, HD] f32

    # ---- ns == 0 (first batch group): whole-batch init (as v5) ----
    init = (ns == 0) if n_bblk == 1 else ((ns == 0) & (nb == 0))

    @pl.when(init)
    def _():
        @pl.when(l == 0)
        def _():
            h_scr[:] = x_ref[:].astype(jnp.float32)
        h = h_scr[:]
        a = layer_norm(h, vec_slice("ln1"))
        qkv = qdot(a, wqp_ref[0, :, :3 * d], vec_slice("qkv_ws"),
                   vec_slice("qkv_b"))
        q = qkv[:, :HD]
        k_new = qkv[:, HD:2 * HD]
        v_new = qkv[:, 2 * HD:]
        kvnew_ref[0, :, :HD] = k_new.astype(kvnew_ref.dtype)
        kvnew_ref[0, :, HD:] = v_new.astype(kvnew_ref.dtype)
        for b in range(B):
            qp = q[b][:, None] * pool                       # [HD, H] f32
            sq = jnp.max(jnp.abs(qp)) / 127.0 + 1e-12
            qp_scr[b * HD:(b + 1) * HD, :H] = jnp.clip(
                jnp.round(qp / sq), -127, 127)
            # replicate the scalar across H lanes: the read side then only
            # needs a sublane broadcast (Mosaic rejects (1,1)->(bs,H))
            sq_scr[b:b + 1, :H] = jnp.full((1, H), sq, jnp.float32)
        sl_all = jax.lax.dot_general(
            (k_new * q).astype(jnp.float32), pool,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # [B, H]
        m_scr[:, :H] = sl_all
        den_scr[:, :H] = jnp.ones_like(sl_all)
        acc_scr[:] = v_new

    # ---- every S-block: int4 MXU flash update ----
    base = ns * bs
    spos = base + jax.lax.broadcasted_iota(jnp.int32, (bs, H), 0)
    valid = spos < cl
    for bb in range(bg):
        rb = bb if n_bblk == 1 else nb * bg + bb
        klo, khi = _unpack_nibbles(kvk_ref[0, bb])       # [bs, HD/2] i8
        vlo, vhi = _unpack_nibbles(kvv_ref[0, bb])
        ks = ksc_ref[0, bb]                              # [bs, H] f32
        vs = vsc_ref[0, bb]
        qp_lo = qp_scr[pl.ds(rb * HD, HDh), :H].astype(jnp.int8)
        qp_hi = qp_scr[pl.ds(rb * HD + HDh, HDh), :H].astype(jnp.int8)
        sqv = sq_scr[pl.ds(rb, 1), :H]                   # [1, H]
        li = (jax.lax.dot_general(klo, qp_lo, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
              + jax.lax.dot_general(khi, qp_hi, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32))
        logits = li.astype(jnp.float32) * ks * (sqv * (scale / 7.0))
        logits = jnp.where(valid, logits, -jnp.inf)
        m_old = m_scr[pl.ds(rb, 1), :H]
        m_new = jnp.maximum(m_old, jnp.max(logits, axis=0,
                                           keepdims=True))
        corr = jnp.exp(m_old - m_new)
        p = jnp.exp(logits - m_new)                      # [bs, H] f32
        den = den_scr[pl.ds(rb, 1), :H] * corr + jnp.sum(p, axis=0,
                                                         keepdims=True)
        pv = (p * vs * (1.0 / 7.0)).astype(jnp.bfloat16)  # V scales folded
        part_lo = jax.lax.dot_general(
            pv, vlo.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [H, HD/2]
        part_hi = jax.lax.dot_general(
            pv, vhi.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        blk_mix = jnp.concatenate(
            [jnp.sum(part_lo * poolt[:, :HDh], axis=0, keepdims=True),
             jnp.sum(part_hi * poolt[:, HDh:], axis=0, keepdims=True)],
            axis=1)                                      # [1, HD]
        corr_lanes = jnp.sum(corr[0][:, None] * poolt, axis=0,
                             keepdims=True)              # [1, HD]
        acc_scr[pl.ds(rb, 1), :] = (acc_scr[pl.ds(rb, 1), :] * corr_lanes
                                    + blk_mix)
        m_scr[pl.ds(rb, 1), :H] = m_new
        den_scr[pl.ds(rb, 1), :H] = den

    # ---- ns == NS-1 (last batch group): finalize, proj, MLP (as v5) ----
    fin = ((ns == n_sblk - 1) if n_bblk == 1
           else ((ns == n_sblk - 1) & (nb == n_bblk - 1)))

    @pl.when(fin)
    def _():
        h = h_scr[:]
        den_lanes_rows = []
        for b in range(B):
            dl = jnp.sum(den_scr[b:b + 1, :H][0][:, None] * poolt, axis=0,
                         keepdims=True)
            den_lanes_rows.append(dl)
        den_lanes = jnp.concatenate(den_lanes_rows, axis=0)  # [B, HD]
        y = acc_scr[:] / den_lanes
        y = qdot(y, wqp_ref[0, :, 3 * d:4 * d], vec_slice("proj_ws"),
                 vec_slice("proj_b"))
        h = (h.astype(jnp.bfloat16) + y.astype(jnp.bfloat16)
             ).astype(jnp.float32)
        a2 = layer_norm(h, vec_slice("ln2"))
        hid = qdot(a2, wfc_ref[0], vec_slice("fc_ws"))
        hid = _gelu_exact(hid)
        y2 = qdot(hid, wpj_ref[0], vec_slice("pj_ws"))
        h = (h.astype(jnp.bfloat16) + y2.astype(jnp.bfloat16)
             ).astype(jnp.float32)
        h_scr[:] = h

        @pl.when(l == n_layers - 1)
        def _():
            h_out_ref[:] = h.astype(h_out_ref.dtype)


def quantize_kv_int4(rows: jnp.ndarray, n_head: int
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[..., HD] f32/bf16 rows → (packed [..., HD/2] int8, scales [..., H]).

    Per-(row, head) absmax grid: q = clip(round(7 x / s), ±7), dequant
    x ≈ q s / 7.  Halves nibble layout (low nibble hd=j, high hd=j+HD/2)
    so the kernel reconstructs with two lane-contiguous slices, no
    interleave."""
    *lead, HD = rows.shape
    H = n_head
    Dh = HD // H
    r = rows.astype(jnp.float32).reshape(*lead, H, Dh)
    s = jnp.max(jnp.abs(r), axis=-1) + 1e-12               # [..., H]
    q = jnp.clip(jnp.round(r * (7.0 / s[..., None])), -7, 7)
    q = q.reshape(*lead, HD).astype(jnp.int32)
    lo = q[..., :HD // 2]
    hi = q[..., HD // 2:]
    packed = ((hi << 4) | (lo & 0xF)).astype(jnp.int8)
    return packed, s


@functools.partial(jax.jit,
                   static_argnames=("n_head", "block_s", "batch_block"))
def fused_decode_step_v5i4(packed: Params, x: jnp.ndarray,
                           kv_k: jnp.ndarray, kv_v: jnp.ndarray,
                           k_scale: jnp.ndarray, v_scale: jnp.ndarray,
                           cache_len, n_head: int, block_s: int = 0,
                           batch_block: int = 0):
    """v5 decode step on the int4 packed cache.

    kv_k/kv_v: [L, B, S, H*Dh/2] int8 nibble pairs; k_scale/v_scale:
    [L, B, S, H] f32 absmax planes (see quantize_kv_int4).  Same packed
    weights (pack_fused_oar), batch_block, and caller-side cache slicing
    contract as fused_decode_step_v5.  Returns (h [B,1,D], kv_k, kv_v,
    k_scale, v_scale) with the new row appended at cache_len."""
    L, B, S, HDp = kv_k.shape
    assert kv_k.dtype == jnp.int8, "v5i4 requires packed int4 storage"
    H = n_head
    HD = 2 * HDp
    Dh = HD // H
    d = x.shape[-1]

    bs = _pick_block_s(S, block_s)
    NS = S // bs

    pool = jnp.asarray(_head_pool_matrix(H, Dh))
    poolt = pool.T.copy()
    cl = jnp.reshape(jnp.asarray(cache_len, jnp.int32), (1,))
    nblk = jnp.minimum((cl + bs - 1) // bs, NS).astype(jnp.int32)
    wqp, wfc, wpj = packed["wqp"], packed["wfc"], packed["wpj"]

    grid, Bg, NB, kv_spec = _batch_split_grid(L, NS, B, bs, HD, batch_block)

    def at_l(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda l, ns, *_: (l,) + (0,) * len(shape))

    def lagged(shape, lag_ns):
        return pl.BlockSpec(
            (1,) + shape,
            lambda l, ns, *_, _lag=lag_ns: (
                jnp.maximum(l - (ns < _lag), 0),) + (0,) * len(shape))

    lag_pj = 1 if NS > 2 else 0
    lag_fc = 2 if NS > 2 else 0
    kernel = functools.partial(_kernel_v5i4, n_layers=L, n_sblk=NS, bs=bs,
                               H=H, Dh=Dh, n_bblk=NB)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),        # x
            at_l((1, packed["vec"].shape[-1])),           # vec
            at_l((d, 4 * d)),                             # wqp
            lagged((d, 4 * d), lag_fc),                   # wfc
            lagged((4 * d, d), lag_pj),                   # wpj
            kv_spec(HD // 2), kv_spec(HD // 2),           # packed K / V
            kv_spec(H), kv_spec(H),                       # scale planes
            pl.BlockSpec(memory_space=pltpu.VMEM),        # pool
            pl.BlockSpec(memory_space=pltpu.VMEM),        # poolt
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 2 * HD), lambda l, ns, *_: (l, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((B, d), jnp.float32),         # h
                        pltpu.VMEM((B * HD, 128), jnp.float32),  # q-pool i8
                        pltpu.VMEM((B, 128), jnp.float32),       # m
                        pltpu.VMEM((B, 128), jnp.float32),       # den
                        pltpu.VMEM((B, HD), jnp.float32),        # acc
                        pltpu.VMEM((B, 128), jnp.float32)],      # sq
    )
    h_out, kvnew = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, d), jnp.bfloat16),
            jax.ShapeDtypeStruct((L, B, 2 * HD), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * len(grid),
            vmem_limit_bytes=110 * 1024 * 1024),
    )(nblk, cl, x[:, 0].astype(jnp.bfloat16), packed["vec"], wqp, wfc,
      wpj, kv_k, kv_v, k_scale, v_scale, pool, poolt)

    k_new = kvnew[:, :, :HD].reshape(L, B, 1, HD)
    v_new = kvnew[:, :, HD:].reshape(L, B, 1, HD)
    kp, ks = quantize_kv_int4(k_new, H)
    vp, vs = quantize_kv_int4(v_new, H)
    cl0 = jnp.asarray(cache_len, jnp.int32).reshape(())
    kv_k = jax.lax.dynamic_update_slice(kv_k, kp, (0, 0, cl0, 0))
    kv_v = jax.lax.dynamic_update_slice(kv_v, vp, (0, 0, cl0, 0))
    k_scale = jax.lax.dynamic_update_slice(
        k_scale, ks.astype(k_scale.dtype), (0, 0, cl0, 0))
    v_scale = jax.lax.dynamic_update_slice(
        v_scale, vs.astype(v_scale.dtype), (0, 0, cl0, 0))
    return h_out[:, None, :], kv_k, kv_v, k_scale, v_scale


# ===========================================================================
# w4i4: W4A8 weights + int4 KV — the minimum-bytes decode step
# ===========================================================================
# Combines the two stream reductions: group-128 int4 weights (as w4, 128 MB
# for the 36-layer stack) and the nibble-packed per-(row, head)-scaled int4
# cache (as v5i4, half of v5's KV bytes).  At B=4 S=2207 the step streams
# ~380 MB vs v5's 743 — the headline large-batch serving config together
# with the batch-split grid.

def _kernel_w4i4(nblk_ref, cl_ref, x_ref, vec_ref, wqp_ref, wfc_ref,
                 wpj_ref, sc_ref, kvk_ref, kvv_ref, ksc_ref, vsc_ref,
                 pool_ref, poolt_ref, h_out_ref, kvnew_ref,
                 h_scr, qp_scr, m_scr, den_scr, acc_scr, sq_scr,
                 *, n_layers: int, n_sblk: int, bs: int, H: int, Dh: int,
                 n_bblk: int = 1, eps: float = 1e-5):
    l = pl.program_id(0)
    ns = pl.program_id(1)
    nb = pl.program_id(2) if n_bblk > 1 else None
    B, d = x_ref.shape
    bg = B // n_bblk
    HD = H * Dh
    HDh = HD // 2
    G = W4_GROUP
    scale = 1.0 / math.sqrt(Dh)
    cl = cl_ref[0]
    off = _vec_offsets(d)

    def vec_slice(name):
        a, b = off[name]
        return vec_ref[0, 0, a:b]

    def layer_norm(v, w):
        mu = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.mean((v - mu) ** 2, axis=-1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)

    def qdot4(v, w4_ref, sc_row0, n_out, col0=0, b_vec=None):
        Kin = v.shape[-1]
        sa = jnp.max(jnp.abs(v), axis=-1, keepdims=True) / 127.0 + 1e-12
        aq = jnp.clip(jnp.round(v / sa), -127, 127).astype(jnp.int8)
        y = jnp.zeros((v.shape[0], n_out), jnp.float32)
        for j in range(Kin // (2 * G)):
            blk = w4_ref[0, j * G:(j + 1) * G, col0:col0 + n_out]
            lo, hi = _unpack_nibbles(blk)
            a_lo = aq[:, (2 * j) * G:(2 * j + 1) * G]
            a_hi = aq[:, (2 * j + 1) * G:(2 * j + 2) * G]
            acc_lo = jax.lax.dot_general(
                a_lo, lo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc_hi = jax.lax.dot_general(
                a_hi, hi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            r = sc_row0 + 2 * j
            s_lo = sc_ref[0, r:r + 1, col0:col0 + n_out]
            s_hi = sc_ref[0, r + 1:r + 2, col0:col0 + n_out]
            y = y + acc_lo.astype(jnp.float32) * s_lo \
                + acc_hi.astype(jnp.float32) * s_hi
        y = y * sa
        if b_vec is not None:
            y = y + b_vec[None, :].astype(jnp.float32)
        return y

    def qdot4_pj(v):
        Kin = v.shape[-1]
        sa = jnp.max(jnp.abs(v), axis=-1, keepdims=True) / 127.0 + 1e-12
        aq = jnp.clip(jnp.round(v / sa), -127, 127).astype(jnp.int8)
        y = jnp.zeros((v.shape[0], d), jnp.float32)
        for j in range(Kin // (2 * G)):
            blk = wpj_ref[0, j * G:(j + 1) * G, :]
            lo, hi = _unpack_nibbles(blk)
            a_lo = aq[:, (2 * j) * G:(2 * j + 1) * G]
            a_hi = aq[:, (2 * j + 1) * G:(2 * j + 2) * G]
            acc_lo = jax.lax.dot_general(
                a_lo, lo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc_hi = jax.lax.dot_general(
                a_hi, hi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            g_lo, g_hi = 2 * j, 2 * j + 1
            rl, rh = 12 + g_lo // 4, 12 + g_hi // 4
            s_lo = sc_ref[0, rl:rl + 1, (g_lo % 4) * d:(g_lo % 4 + 1) * d]
            s_hi = sc_ref[0, rh:rh + 1, (g_hi % 4) * d:(g_hi % 4 + 1) * d]
            y = y + acc_lo.astype(jnp.float32) * s_lo \
                + acc_hi.astype(jnp.float32) * s_hi
        return y * sa

    pool = pool_ref[:]
    poolt = poolt_ref[:]

    # ---- ns == 0 (first batch group): whole-batch init, int4 QKV ----
    init = (ns == 0) if n_bblk == 1 else ((ns == 0) & (nb == 0))

    @pl.when(init)
    def _():
        @pl.when(l == 0)
        def _():
            h_scr[:] = x_ref[:].astype(jnp.float32)
        h = h_scr[:]
        a = layer_norm(h, vec_slice("ln1"))
        qkv = qdot4(a, wqp_ref, 0, 3 * d, col0=0,
                    b_vec=vec_slice("qkv_b"))
        q = qkv[:, :HD]
        k_new = qkv[:, HD:2 * HD]
        v_new = qkv[:, 2 * HD:]
        kvnew_ref[0, :, :HD] = k_new.astype(kvnew_ref.dtype)
        kvnew_ref[0, :, HD:] = v_new.astype(kvnew_ref.dtype)
        for b in range(B):
            qp = q[b][:, None] * pool
            sq = jnp.max(jnp.abs(qp)) / 127.0 + 1e-12
            qp_scr[b * HD:(b + 1) * HD, :H] = jnp.clip(
                jnp.round(qp / sq), -127, 127)
            # replicate the scalar across H lanes: the read side then only
            # needs a sublane broadcast (Mosaic rejects (1,1)->(bs,H))
            sq_scr[b:b + 1, :H] = jnp.full((1, H), sq, jnp.float32)
        sl_all = jax.lax.dot_general(
            (k_new * q).astype(jnp.float32), pool,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        m_scr[:, :H] = sl_all
        den_scr[:, :H] = jnp.ones_like(sl_all)
        acc_scr[:] = v_new

    # ---- every S-block: int4 MXU flash update (as v5i4) ----
    base = ns * bs
    spos = base + jax.lax.broadcasted_iota(jnp.int32, (bs, H), 0)
    valid = spos < cl
    for bb in range(bg):
        rb = bb if n_bblk == 1 else nb * bg + bb
        klo, khi = _unpack_nibbles(kvk_ref[0, bb])
        vlo, vhi = _unpack_nibbles(kvv_ref[0, bb])
        ks = ksc_ref[0, bb]
        vs = vsc_ref[0, bb]
        qp_lo = qp_scr[pl.ds(rb * HD, HDh), :H].astype(jnp.int8)
        qp_hi = qp_scr[pl.ds(rb * HD + HDh, HDh), :H].astype(jnp.int8)
        sqv = sq_scr[pl.ds(rb, 1), :H]                   # [1, H]
        li = (jax.lax.dot_general(klo, qp_lo, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
              + jax.lax.dot_general(khi, qp_hi, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32))
        logits = li.astype(jnp.float32) * ks * (sqv * (scale / 7.0))
        logits = jnp.where(valid, logits, -jnp.inf)
        m_old = m_scr[pl.ds(rb, 1), :H]
        m_new = jnp.maximum(m_old, jnp.max(logits, axis=0,
                                           keepdims=True))
        corr = jnp.exp(m_old - m_new)
        p = jnp.exp(logits - m_new)
        den = den_scr[pl.ds(rb, 1), :H] * corr + jnp.sum(p, axis=0,
                                                         keepdims=True)
        pv = (p * vs * (1.0 / 7.0)).astype(jnp.bfloat16)
        part_lo = jax.lax.dot_general(
            pv, vlo.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        part_hi = jax.lax.dot_general(
            pv, vhi.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        blk_mix = jnp.concatenate(
            [jnp.sum(part_lo * poolt[:, :HDh], axis=0, keepdims=True),
             jnp.sum(part_hi * poolt[:, HDh:], axis=0, keepdims=True)],
            axis=1)
        corr_lanes = jnp.sum(corr[0][:, None] * poolt, axis=0,
                             keepdims=True)
        acc_scr[pl.ds(rb, 1), :] = (acc_scr[pl.ds(rb, 1), :] * corr_lanes
                                    + blk_mix)
        m_scr[pl.ds(rb, 1), :H] = m_new
        den_scr[pl.ds(rb, 1), :H] = den

    # ---- ns == NS-1 (last batch group): finalize, int4 proj/MLP ----
    fin = ((ns == n_sblk - 1) if n_bblk == 1
           else ((ns == n_sblk - 1) & (nb == n_bblk - 1)))

    @pl.when(fin)
    def _():
        h = h_scr[:]
        den_lanes_rows = []
        for b in range(B):
            dl = jnp.sum(den_scr[b:b + 1, :H][0][:, None] * poolt, axis=0,
                         keepdims=True)
            den_lanes_rows.append(dl)
        den_lanes = jnp.concatenate(den_lanes_rows, axis=0)
        y = acc_scr[:] / den_lanes
        y = qdot4(y, wqp_ref, 0, d, col0=3 * d,
                  b_vec=vec_slice("proj_b"))
        h = (h.astype(jnp.bfloat16) + y.astype(jnp.bfloat16)
             ).astype(jnp.float32)
        a2 = layer_norm(h, vec_slice("ln2"))
        hid = qdot4(a2, wfc_ref, 6, 4 * d)
        hid = _gelu_exact(hid)
        y2 = qdot4_pj(hid)
        h = (h.astype(jnp.bfloat16) + y2.astype(jnp.bfloat16)
             ).astype(jnp.float32)
        h_scr[:] = h

        @pl.when(l == n_layers - 1)
        def _():
            h_out_ref[:] = h.astype(h_out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("n_head", "block_s", "batch_block"))
def fused_decode_step_w4i4(packed: Params, x: jnp.ndarray,
                           kv_k: jnp.ndarray, kv_v: jnp.ndarray,
                           k_scale: jnp.ndarray, v_scale: jnp.ndarray,
                           cache_len, n_head: int, block_s: int = 0,
                           batch_block: int = 0):
    """W4A8 weights + int4 KV decode step (minimum-bytes serving config).

    packed: pack_fused_oar_w4 blocks; caches/scales as
    fused_decode_step_v5i4.  Returns (h, kv_k, kv_v, k_scale, v_scale)."""
    L = packed["wqp4"].shape[0]
    _, B, S, HDp = kv_k.shape
    assert kv_k.dtype == jnp.int8, "w4i4 requires packed int4 storage"
    H = n_head
    HD = 2 * HDp
    Dh = HD // H
    d = x.shape[-1]

    bs = _pick_block_s(S, block_s)
    NS = S // bs

    pool = jnp.asarray(_head_pool_matrix(H, Dh))
    poolt = pool.T.copy()
    cl = jnp.reshape(jnp.asarray(cache_len, jnp.int32), (1,))
    nblk = jnp.minimum((cl + bs - 1) // bs, NS).astype(jnp.int32)

    grid, Bg, NB, kv_spec = _batch_split_grid(L, NS, B, bs, HD, batch_block)

    def at_l(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda l, ns, *_: (l,) + (0,) * len(shape))

    def lagged(shape, lag_ns):
        return pl.BlockSpec(
            (1,) + shape,
            lambda l, ns, *_, _lag=lag_ns: (
                jnp.maximum(l - (ns < _lag), 0),) + (0,) * len(shape))

    lag_pj = 1 if NS > 2 else 0
    lag_fc = 2 if NS > 2 else 0
    kernel = functools.partial(_kernel_w4i4, n_layers=L, n_sblk=NS, bs=bs,
                               H=H, Dh=Dh, n_bblk=NB)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),        # x
            at_l((1, packed["vec"].shape[-1])),           # vec
            at_l((d // 2, 4 * d)),                        # wqp4
            lagged((d // 2, 4 * d), lag_fc),              # wfc4
            lagged((2 * d, d), lag_pj),                   # wpj4
            at_l((18, 4 * d)),                            # scales4
            kv_spec(HD // 2), kv_spec(HD // 2),           # packed K / V
            kv_spec(H), kv_spec(H),                       # scale planes
            pl.BlockSpec(memory_space=pltpu.VMEM),        # pool
            pl.BlockSpec(memory_space=pltpu.VMEM),        # poolt
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 2 * HD), lambda l, ns, *_: (l, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((B, d), jnp.float32),
                        pltpu.VMEM((B * HD, 128), jnp.float32),
                        pltpu.VMEM((B, 128), jnp.float32),
                        pltpu.VMEM((B, 128), jnp.float32),
                        pltpu.VMEM((B, HD), jnp.float32),
                        pltpu.VMEM((B, 128), jnp.float32)],      # sq
    )
    h_out, kvnew = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, d), jnp.bfloat16),
            jax.ShapeDtypeStruct((L, B, 2 * HD), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * len(grid),
            vmem_limit_bytes=110 * 1024 * 1024),
    )(nblk, cl, x[:, 0].astype(jnp.bfloat16), packed["vec"],
      packed["wqp4"], packed["wfc4"], packed["wpj4"], packed["scales4"],
      kv_k, kv_v, k_scale, v_scale, pool, poolt)

    k_new = kvnew[:, :, :HD].reshape(L, B, 1, HD)
    v_new = kvnew[:, :, HD:].reshape(L, B, 1, HD)
    kp, ks = quantize_kv_int4(k_new, H)
    vp, vs = quantize_kv_int4(v_new, H)
    cl0 = jnp.asarray(cache_len, jnp.int32).reshape(())
    kv_k = jax.lax.dynamic_update_slice(kv_k, kp, (0, 0, cl0, 0))
    kv_v = jax.lax.dynamic_update_slice(kv_v, vp, (0, 0, cl0, 0))
    k_scale = jax.lax.dynamic_update_slice(
        k_scale, ks.astype(k_scale.dtype), (0, 0, cl0, 0))
    v_scale = jax.lax.dynamic_update_slice(
        v_scale, vs.astype(v_scale.dtype), (0, 0, cl0, 0))
    return h_out[:, None, :], kv_k, kv_v, k_scale, v_scale


# ===========================================================================
# v5mq / v5mqi4: multi-query verify-chunk kernels (speculative decoding)
# ===========================================================================
# The speculative verify step (models/speculative.py) pushes Q = K drafts
# through the OAR stack in one call.  The XLA multi-query body re-layouts
# and dequantizes every layer's whole cache slice per chunk — exactly the
# per-step relayout tax the flat-cache v5 kernel removed for Q == 1.  These
# kernels generalize v5 to Q <= 128 // H queries by packing each scene's Q
# head-pooled query operands into the 128-lane axis (Q*H = 128 at Q = 8,
# H = 16):
#
#   * the prefix attention still costs ONE [bs, HD] x [HD, Q*H] MXU dot per
#     (scene, S-block) — all Q queries ride the same KV stream, so a verify
#     chunk streams the same weight + KV bytes as a single decode step;
#   * flash stats (m, den) live in per-scene [1, Q*H] lane layouts; the
#     value mix reuses v5's poolt reduction per query;
#   * intra-chunk causal attention (query i vs draft keys j <= i, self
#     included) is Q rank-1 terms folded into the flash init at ns == 0,
#     mirroring oar_step's [prefix | new-block] masking exactly
#     (models/rollout.py oar_step; ref:UMGen.py:1234-1247 decodes these
#     positions sequentially — the reference has no speculative mode).
#
# One kernel body serves both cache formats (int4=False: flat [L, B, S,
# HD] int8 / pack_fused_oar params; int4=True: nibble-packed halves +
# per-(row, head) scale planes, scales lane-tiled across the Q groups).

def _kernel_mq(nblk_ref, cl_ref, x_ref, vec_ref, wqp_ref, wfc_ref,
               wpj_ref, *rest,
               n_layers: int, n_sblk: int, bs: int, H: int, Dh: int,
               Q: int, int4: bool, w4: bool = False, n_bblk: int = 1,
               eps: float = 1e-5):
    if w4:
        sc_ref, rest = rest[0], rest[1:]
    if int4:
        (kvk_ref, kvv_ref, ksc_ref, vsc_ref, pool_ref, poolt_ref,
         h_out_ref, kvnew_ref,
         h_scr, qp_scr, m_scr, den_scr, acc_scr, sq_scr) = rest
    else:
        (kvk_ref, kvv_ref, pool_ref, poolt_ref,
         h_out_ref, kvnew_ref,
         h_scr, qp_scr, m_scr, den_scr, acc_scr, sq_scr) = rest
    l = pl.program_id(0)
    ns = pl.program_id(1)
    # batch-group grid dim (innermost; see _kernel_v5) — absent when
    # n_bblk == 1 so the whole-batch path compiles exactly as before
    nb = pl.program_id(2) if n_bblk > 1 else None
    R, d = x_ref.shape                 # R = B * Q query rows
    B = R // Q
    bg = B // n_bblk                   # scenes per batch group
    HD = H * Dh
    HDh = HD // 2
    QH = Q * H
    scale = 1.0 / math.sqrt(Dh)
    cl = cl_ref[0]
    off = _vec_offsets(d)

    def vec_slice(name):
        a, b = off[name]
        return vec_ref[0, 0, a:b]

    def layer_norm(v, w):
        mu = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.mean((v - mu) ** 2, axis=-1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)

    def qdot(v, w_blk, ws, b=None):
        sa = jnp.max(jnp.abs(v), axis=-1, keepdims=True) / 127.0 + 1e-12
        aq = jnp.clip(jnp.round(v / sa), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(aq, w_blk, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * sa * ws[None, :].astype(jnp.float32)
        if b is not None:
            y = y + b[None, :].astype(jnp.float32)
        return y

    if w4:
        G = W4_GROUP

        def qdot4(v, w4_ref, sc_row0, n_out, col0=0, b_vec=None):
            # group-128 int4 weights, per-(input-group, output) scales —
            # identical math to _kernel_w4.qdot4
            Kin = v.shape[-1]
            sa = (jnp.max(jnp.abs(v), axis=-1, keepdims=True) / 127.0
                  + 1e-12)
            aq = jnp.clip(jnp.round(v / sa), -127, 127).astype(jnp.int8)
            y = jnp.zeros((v.shape[0], n_out), jnp.float32)
            for j in range(Kin // (2 * G)):
                blk = w4_ref[0, j * G:(j + 1) * G, col0:col0 + n_out]
                lo, hi = _unpack_nibbles(blk)
                a_lo = aq[:, (2 * j) * G:(2 * j + 1) * G]
                a_hi = aq[:, (2 * j + 1) * G:(2 * j + 2) * G]
                acc_lo = jax.lax.dot_general(
                    a_lo, lo, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc_hi = jax.lax.dot_general(
                    a_hi, hi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                r = sc_row0 + 2 * j
                s_lo = sc_ref[0, r:r + 1, col0:col0 + n_out]
                s_hi = sc_ref[0, r + 1:r + 2, col0:col0 + n_out]
                y = y + acc_lo.astype(jnp.float32) * s_lo \
                    + acc_hi.astype(jnp.float32) * s_hi
            y = y * sa
            if b_vec is not None:
                y = y + b_vec[None, :].astype(jnp.float32)
            return y

        def qdot4_pj(v):
            Kin = v.shape[-1]
            sa = (jnp.max(jnp.abs(v), axis=-1, keepdims=True) / 127.0
                  + 1e-12)
            aq = jnp.clip(jnp.round(v / sa), -127, 127).astype(jnp.int8)
            y = jnp.zeros((v.shape[0], d), jnp.float32)
            for j in range(Kin // (2 * G)):
                blk = wpj_ref[0, j * G:(j + 1) * G, :]
                lo, hi = _unpack_nibbles(blk)
                a_lo = aq[:, (2 * j) * G:(2 * j + 1) * G]
                a_hi = aq[:, (2 * j + 1) * G:(2 * j + 2) * G]
                acc_lo = jax.lax.dot_general(
                    a_lo, lo, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc_hi = jax.lax.dot_general(
                    a_hi, hi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                g_lo, g_hi = 2 * j, 2 * j + 1
                rl, rh = 12 + g_lo // 4, 12 + g_hi // 4
                s_lo = sc_ref[0, rl:rl + 1,
                              (g_lo % 4) * d:(g_lo % 4 + 1) * d]
                s_hi = sc_ref[0, rh:rh + 1,
                              (g_hi % 4) * d:(g_hi % 4 + 1) * d]
                y = y + acc_lo.astype(jnp.float32) * s_lo \
                    + acc_hi.astype(jnp.float32) * s_hi
            return y * sa

        def mm_qkv(a):
            return qdot4(a, wqp_ref, 0, 3 * d, col0=0,
                         b_vec=vec_slice("qkv_b"))

        def mm_proj(y):
            return qdot4(y, wqp_ref, 0, d, col0=3 * d,
                         b_vec=vec_slice("proj_b"))

        def mm_fc(a2):
            return qdot4(a2, wfc_ref, 6, 4 * d)

        mm_pj = qdot4_pj
    else:
        def mm_qkv(a):
            return qdot(a, wqp_ref[0, :, :3 * d], vec_slice("qkv_ws"),
                        vec_slice("qkv_b"))

        def mm_proj(y):
            return qdot(y, wqp_ref[0, :, 3 * d:4 * d],
                        vec_slice("proj_ws"), vec_slice("proj_b"))

        def mm_fc(a2):
            return qdot(a2, wfc_ref[0], vec_slice("fc_ws"))

        def mm_pj(hid):
            return qdot(hid, wpj_ref[0], vec_slice("pj_ws"))

    pool = pool_ref[:]                 # [HD, H] f32
    poolt = poolt_ref[:]               # [H, HD] f32

    # ---- ns == 0 (first batch group): hidden init, QKV for all R rows,
    # packed q-pools, intra-chunk causal flash init (the chunk's own K/V
    # rows stay full precision inside the step, matching the XLA
    # multi-row bodies).  Computed for the WHOLE batch in one pass so the
    # qdot matmuls stay large ----
    init = (ns == 0) if n_bblk == 1 else ((ns == 0) & (nb == 0))

    @pl.when(init)
    def _():
        @pl.when(l == 0)
        def _():
            h_scr[:] = x_ref[:].astype(jnp.float32)
        h = h_scr[:]
        a = layer_norm(h, vec_slice("ln1"))
        qkv = mm_qkv(a)
        q = qkv[:, :HD]
        k_new = qkv[:, HD:2 * HD]
        v_new = qkv[:, 2 * HD:]
        kvnew_ref[0, :, :HD] = k_new.astype(kvnew_ref.dtype)
        kvnew_ref[0, :, HD:] = v_new.astype(kvnew_ref.dtype)
        for b in range(B):
            qb = q[b * Q:(b + 1) * Q]                    # [Q, HD]
            kb = k_new[b * Q:(b + 1) * Q]
            vb = v_new[b * Q:(b + 1) * Q]
            qp = jnp.concatenate([qb[qi][:, None] * pool
                                  for qi in range(Q)], axis=1)  # [HD, QH]
            sq = jnp.max(jnp.abs(qp)) / 127.0 + 1e-12
            qp_scr[b * HD:(b + 1) * HD, :QH] = jnp.clip(
                jnp.round(qp / sq), -127, 127)
            # replicated across QH lanes so the read side only needs a
            # sublane broadcast (Mosaic rejects (1,1)->(bs,QH))
            sq_scr[b:b + 1, :QH] = jnp.full((1, QH), sq, jnp.float32)
            # causal intra-chunk logits: query i vs chunk key j, j <= i
            # (j == 0 is valid for every row, so m0 is finite everywhere)
            lij = []
            for j in range(Q):
                lj = jax.lax.dot_general(
                    (qb * kb[j][None, :]).astype(jnp.float32), pool,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale   # [Q, H]
                iidx = jax.lax.broadcasted_iota(jnp.int32, (Q, H), 0)
                lij.append(jnp.where(iidx >= j, lj, -jnp.inf))
            m0 = lij[0]
            for j in range(1, Q):
                m0 = jnp.maximum(m0, lij[j])
            den0 = jnp.zeros((Q, H), jnp.float32)
            acc0 = jnp.zeros((Q, HD), jnp.float32)
            for j in range(Q):
                p = jnp.exp(lij[j] - m0)                 # [Q, H]
                den0 = den0 + p
                lanes = jax.lax.dot_general(
                    p, poolt, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [Q, HD]
                acc0 = acc0 + lanes * vb[j][None, :]
            # (Q, H) -> (1, QH): tpu.reshape across the sublane/lane
            # boundary is unsupported, and a lane concat of sublane
            # slices carries mismatched sublane offsets.  Route each row
            # through a tiny selector dot (MXU results land at offset
            # {0,0}) and concat those along lanes.
            def rows_to_lanes(mat):
                qidx = jax.lax.broadcasted_iota(jnp.int32, (1, Q), 1)
                rows = [jax.lax.dot_general(
                            (qidx == qi).astype(jnp.float32), mat,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        for qi in range(Q)]
                return jnp.concatenate(rows, axis=1)     # [1, QH]

            m_scr[b:b + 1, :QH] = rows_to_lanes(m0)
            den_scr[b:b + 1, :QH] = rows_to_lanes(den0)
            acc_scr[b * Q:(b + 1) * Q, :] = acc0

    # ---- every S-block: one [bs, HD] x [HD, QH] MXU dot per scene of
    # this batch group (two half-width dots on the int4 nibble halves) ----
    base = ns * bs
    spos = base + jax.lax.broadcasted_iota(jnp.int32, (bs, QH), 0)
    valid = spos < cl
    for bb in range(bg):
        rb = bb if n_bblk == 1 else nb * bg + bb
        qp_i8 = qp_scr[pl.ds(rb * HD, HD), :QH].astype(jnp.int8)
        sqv = sq_scr[pl.ds(rb, 1), :QH]                  # [1, QH]
        if int4:
            klo, khi = _unpack_nibbles(kvk_ref[0, bb])   # [bs, HD/2] i8
            vlo, vhi = _unpack_nibbles(kvv_ref[0, bb])
            ks_q = jnp.tile(ksc_ref[0, bb], (1, Q))      # [bs, QH]
            vs_q = jnp.tile(vsc_ref[0, bb], (1, Q))
            li = (jax.lax.dot_general(
                      klo, qp_i8[:HDh], (((1,), (0,)), ((), ())),
                      preferred_element_type=jnp.int32)
                  + jax.lax.dot_general(
                      khi, qp_i8[HDh:], (((1,), (0,)), ((), ())),
                      preferred_element_type=jnp.int32))
            logits = li.astype(jnp.float32) * ks_q * (sqv * (scale / 7.0))
        else:
            kmat = kvk_ref[0, bb]                        # [bs, HD] i8
            vmat = kvv_ref[0, bb]
            li = jax.lax.dot_general(kmat, qp_i8,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32)
            logits = (li.astype(jnp.float32)
                      * (sqv * (scale / KV_INT8_SCALE)))  # [bs, QH]
        logits = jnp.where(valid, logits, -jnp.inf)
        m_old = m_scr[pl.ds(rb, 1), :QH]
        m_new = jnp.maximum(m_old, jnp.max(logits, axis=0,
                                           keepdims=True))
        corr = jnp.exp(m_old - m_new)                    # [1, QH]
        p = jnp.exp(logits - m_new)                      # [bs, QH]
        den = den_scr[pl.ds(rb, 1), :QH] * corr + jnp.sum(p, axis=0,
                                                          keepdims=True)
        if int4:
            pv = (p * vs_q * (1.0 / 7.0)).astype(jnp.bfloat16)
            part_lo = jax.lax.dot_general(
                pv, vlo.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [QH, HD/2]
            part_hi = jax.lax.dot_general(
                pv, vhi.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            part = jax.lax.dot_general(
                p.astype(jnp.bfloat16),
                (vmat.astype(jnp.bfloat16)
                 * (1.0 / KV_INT8_SCALE)).astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [QH, HD]
        for qi in range(Q):
            sl = slice(qi * H, (qi + 1) * H)
            if int4:
                blk_mix = jnp.concatenate(
                    [jnp.sum(part_lo[sl] * poolt[:, :HDh], axis=0,
                             keepdims=True),
                     jnp.sum(part_hi[sl] * poolt[:, HDh:], axis=0,
                             keepdims=True)], axis=1)    # [1, HD]
            else:
                blk_mix = jnp.sum(part[sl] * poolt, axis=0,
                                  keepdims=True)         # [1, HD]
            corr_l = jnp.sum(corr[0, sl][:, None] * poolt, axis=0,
                             keepdims=True)
            r = rb * Q + qi
            acc_scr[pl.ds(r, 1), :] = (acc_scr[pl.ds(r, 1), :] * corr_l
                                       + blk_mix)
        m_scr[pl.ds(rb, 1), :QH] = m_new
        den_scr[pl.ds(rb, 1), :QH] = den

    # ---- ns == NS-1 (last batch group): finalize, proj, MLP on all R
    # rows ----
    fin = ((ns == n_sblk - 1) if n_bblk == 1
           else ((ns == n_sblk - 1) & (nb == n_bblk - 1)))

    @pl.when(fin)
    def _():
        h = h_scr[:]
        den_rows = []
        for b in range(B):
            for qi in range(Q):
                dl = jnp.sum(
                    den_scr[b:b + 1, qi * H:(qi + 1) * H][0][:, None]
                    * poolt, axis=0, keepdims=True)      # [1, HD]
                den_rows.append(dl)
        den_lanes = jnp.concatenate(den_rows, axis=0)    # [R, HD]
        y = acc_scr[:] / den_lanes
        y = mm_proj(y)
        h = (h.astype(jnp.bfloat16) + y.astype(jnp.bfloat16)
             ).astype(jnp.float32)
        a2 = layer_norm(h, vec_slice("ln2"))
        hid = mm_fc(a2)
        hid = _gelu_exact(hid)
        y2 = mm_pj(hid)
        h = (h.astype(jnp.bfloat16) + y2.astype(jnp.bfloat16)
             ).astype(jnp.float32)
        h_scr[:] = h

        @pl.when(l == n_layers - 1)
        def _():
            h_out_ref[:] = h.astype(h_out_ref.dtype)


def _mq_call(packed, x, kv_inputs, L, B, S, HD, H, Dh, cache_len,
             block_s, int4, w4=False, batch_block=0):
    """Shared pallas_call plumbing for the multi-query kernels.

    kv_inputs: (kv_k, kv_v) flat int8, or (kv_k, kv_v, k_scale, v_scale)
    packed int4; w4 selects group-128 int4 weight blocks (pack_fused_oar_w4)
    instead of int8 (pack_fused_oar).  batch_block > 0 splits the batch
    into groups of that size on an innermost grid dim (as
    fused_decode_step_v5) — the large-B VMEM knob, which is what lets
    speculative verify chunks compose with the batch-split serving
    config.  Returns (h [B*Q, d] bf16, kvnew [L, B*Q, 2*HD] bf16)."""
    d = x.shape[-1]
    Q = x.shape[1]
    if not 1 < Q * H <= 128:
        raise ValueError(f"multi-query kernels need 1 < Q*H <= 128, "
                         f"got Q={Q}, H={H}")
    R = B * Q
    bs = _pick_block_s(S, block_s)
    NS = S // bs

    pool = jnp.asarray(_head_pool_matrix(H, Dh))
    poolt = pool.T.copy()
    cl = jnp.reshape(jnp.asarray(cache_len, jnp.int32), (1,))
    nblk = jnp.minimum((cl + bs - 1) // bs, NS).astype(jnp.int32)
    grid, _, NB, kv_spec = _batch_split_grid(L, NS, B, bs, HD, batch_block)

    def at_l(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda l, ns, *_: (l,) + (0,) * len(shape))

    def lagged(shape, lag_ns):
        return pl.BlockSpec(
            (1,) + shape,
            lambda l, ns, *_, _lag=lag_ns: (
                jnp.maximum(l - (ns < _lag), 0),) + (0,) * len(shape))

    lag_pj = 1 if NS > 2 else 0
    lag_fc = 2 if NS > 2 else 0
    kv_specs = ([kv_spec(HD // 2), kv_spec(HD // 2), kv_spec(H),
                 kv_spec(H)] if int4 else [kv_spec(), kv_spec()])
    if w4:
        w_specs = [at_l((d // 2, 4 * d)),                 # wqp4
                   lagged((d // 2, 4 * d), lag_fc),       # wfc4
                   lagged((2 * d, d), lag_pj),            # wpj4
                   at_l((18, 4 * d))]                     # scales4
        w_inputs = (packed["wqp4"], packed["wfc4"], packed["wpj4"],
                    packed["scales4"])
    else:
        w_specs = [at_l((d, 4 * d)),                      # wqp
                   lagged((d, 4 * d), lag_fc),            # wfc
                   lagged((4 * d, d), lag_pj)]            # wpj
        w_inputs = (packed["wqp"], packed["wfc"], packed["wpj"])
    kernel = functools.partial(_kernel_mq, n_layers=L, n_sblk=NS, bs=bs,
                               H=H, Dh=Dh, Q=Q, int4=int4, w4=w4,
                               n_bblk=NB)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),        # x
            at_l((1, packed["vec"].shape[-1])),           # vec
            *w_specs,
            *kv_specs,
            pl.BlockSpec(memory_space=pltpu.VMEM),        # pool
            pl.BlockSpec(memory_space=pltpu.VMEM),        # poolt
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, 2 * HD), lambda l, ns, *_: (l, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((R, d), jnp.float32),         # h
                        pltpu.VMEM((B * HD, 128), jnp.float32),  # q-pools
                        pltpu.VMEM((B, 128), jnp.float32),       # m
                        pltpu.VMEM((B, 128), jnp.float32),       # den
                        pltpu.VMEM((R, HD), jnp.float32),        # acc
                        pltpu.VMEM((B, 128), jnp.float32)],      # sq
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((R, d), jnp.bfloat16),
            jax.ShapeDtypeStruct((L, R, 2 * HD), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * len(grid),
            vmem_limit_bytes=110 * 1024 * 1024),
    )(nblk, cl, x.reshape(R, d).astype(jnp.bfloat16), packed["vec"],
      *w_inputs, *kv_inputs, pool, poolt)


@functools.partial(jax.jit,
                   static_argnames=("n_head", "block_s", "batch_block"))
def fused_decode_step_v5mq(packed: Params, x: jnp.ndarray,
                           kv_k: jnp.ndarray, kv_v: jnp.ndarray,
                           cache_len, n_head: int, block_s: int = 0,
                           batch_block: int = 0
                           ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                      jnp.ndarray]:
    """Multi-query fused verify step: x [B, Q, d], 1 < Q <= 128 // n_head.

    Same packing/caches as fused_decode_step_v5 (flat [L, B, S, HD] int8);
    the Q rows attend causally within the chunk and to the prefix below
    cache_len, and their K/V rows are written back at cache_len — exactly
    oar_step's multi-row semantics.  batch_block as in
    fused_decode_step_v5 (the large-B VMEM knob).  Returns
    (h [B, Q, d], kv_k, kv_v)."""
    L, B, S, HD = kv_k.shape
    assert kv_k.dtype == jnp.int8, "v5mq requires int8 KV storage"
    H = n_head
    Dh = HD // H
    d = x.shape[-1]
    Q = x.shape[1]

    h_out, kvnew = _mq_call(packed, x, (kv_k, kv_v), L, B, S, HD, H, Dh,
                            cache_len, block_s, int4=False,
                            batch_block=batch_block)
    k_new = kvnew[:, :, :HD].reshape(L, B, Q, HD)
    v_new = kvnew[:, :, HD:].reshape(L, B, Q, HD)
    k_new = jnp.clip(jnp.round(k_new.astype(jnp.float32) * KV_INT8_SCALE),
                     -127, 127)
    v_new = jnp.clip(jnp.round(v_new.astype(jnp.float32) * KV_INT8_SCALE),
                     -127, 127)
    cl0 = jnp.asarray(cache_len, jnp.int32).reshape(())
    kv_k = jax.lax.dynamic_update_slice(kv_k, k_new.astype(kv_k.dtype),
                                        (0, 0, cl0, 0))
    kv_v = jax.lax.dynamic_update_slice(kv_v, v_new.astype(kv_v.dtype),
                                        (0, 0, cl0, 0))
    return h_out.reshape(B, Q, d), kv_k, kv_v


@functools.partial(jax.jit,
                   static_argnames=("n_head", "block_s", "batch_block"))
def fused_decode_step_v5mqi4(packed: Params, x: jnp.ndarray,
                             kv_k: jnp.ndarray, kv_v: jnp.ndarray,
                             k_scale: jnp.ndarray, v_scale: jnp.ndarray,
                             cache_len, n_head: int, block_s: int = 0,
                             batch_block: int = 0):
    """Multi-query verify step on the int4 packed cache.

    x [B, Q, d] with 1 < Q*n_head <= 128; caches/scales as
    fused_decode_step_v5i4.  Returns (h [B, Q, d], kv_k, kv_v, k_scale,
    v_scale) with the Q new rows quantized and appended at cache_len."""
    L, B, S, HDp = kv_k.shape
    assert kv_k.dtype == jnp.int8, "v5mqi4 requires packed int4 storage"
    H = n_head
    HD = 2 * HDp
    Dh = HD // H
    d = x.shape[-1]
    Q = x.shape[1]

    h_out, kvnew = _mq_call(packed, x, (kv_k, kv_v, k_scale, v_scale),
                            L, B, S, HD, H, Dh, cache_len, block_s,
                            int4=True, batch_block=batch_block)
    k_new = kvnew[:, :, :HD].reshape(L, B, Q, HD)
    v_new = kvnew[:, :, HD:].reshape(L, B, Q, HD)
    kp, ks = quantize_kv_int4(k_new, H)
    vp, vs = quantize_kv_int4(v_new, H)
    cl0 = jnp.asarray(cache_len, jnp.int32).reshape(())
    kv_k = jax.lax.dynamic_update_slice(kv_k, kp, (0, 0, cl0, 0))
    kv_v = jax.lax.dynamic_update_slice(kv_v, vp, (0, 0, cl0, 0))
    k_scale = jax.lax.dynamic_update_slice(
        k_scale, ks.astype(k_scale.dtype), (0, 0, cl0, 0))
    v_scale = jax.lax.dynamic_update_slice(
        v_scale, vs.astype(v_scale.dtype), (0, 0, cl0, 0))
    return h_out.reshape(B, Q, d), kv_k, kv_v, k_scale, v_scale


@functools.partial(jax.jit,
                   static_argnames=("n_head", "block_s", "batch_block"))
def fused_decode_step_w4mq(packed: Params, x: jnp.ndarray,
                           kv_k: jnp.ndarray, kv_v: jnp.ndarray,
                           cache_len, n_head: int, block_s: int = 0,
                           batch_block: int = 0
                           ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                      jnp.ndarray]:
    """Multi-query verify step with W4A8 weights on the flat int8 cache.

    packed: pack_fused_oar_w4 blocks; otherwise as fused_decode_step_v5mq."""
    L, B, S, HD = kv_k.shape
    assert kv_k.dtype == jnp.int8, "w4mq requires int8 KV storage"
    H = n_head
    Dh = HD // H
    d = x.shape[-1]
    Q = x.shape[1]

    h_out, kvnew = _mq_call(packed, x, (kv_k, kv_v), L, B, S, HD, H, Dh,
                            cache_len, block_s, int4=False, w4=True,
                            batch_block=batch_block)
    k_new = kvnew[:, :, :HD].reshape(L, B, Q, HD)
    v_new = kvnew[:, :, HD:].reshape(L, B, Q, HD)
    k_new = jnp.clip(jnp.round(k_new.astype(jnp.float32) * KV_INT8_SCALE),
                     -127, 127)
    v_new = jnp.clip(jnp.round(v_new.astype(jnp.float32) * KV_INT8_SCALE),
                     -127, 127)
    cl0 = jnp.asarray(cache_len, jnp.int32).reshape(())
    kv_k = jax.lax.dynamic_update_slice(kv_k, k_new.astype(kv_k.dtype),
                                        (0, 0, cl0, 0))
    kv_v = jax.lax.dynamic_update_slice(kv_v, v_new.astype(kv_v.dtype),
                                        (0, 0, cl0, 0))
    return h_out.reshape(B, Q, d), kv_k, kv_v


@functools.partial(jax.jit,
                   static_argnames=("n_head", "block_s", "batch_block"))
def fused_decode_step_w4mqi4(packed: Params, x: jnp.ndarray,
                             kv_k: jnp.ndarray, kv_v: jnp.ndarray,
                             k_scale: jnp.ndarray, v_scale: jnp.ndarray,
                             cache_len, n_head: int, block_s: int = 0,
                             batch_block: int = 0):
    """Multi-query verify step with W4A8 weights on the int4 packed cache.

    packed: pack_fused_oar_w4 blocks; otherwise as
    fused_decode_step_v5mqi4 (the minimum-bytes speculative config)."""
    L, B, S, HDp = kv_k.shape
    assert kv_k.dtype == jnp.int8, "w4mqi4 requires packed int4 storage"
    H = n_head
    HD = 2 * HDp
    Dh = HD // H
    d = x.shape[-1]
    Q = x.shape[1]

    h_out, kvnew = _mq_call(packed, x, (kv_k, kv_v, k_scale, v_scale),
                            L, B, S, HD, H, Dh, cache_len, block_s,
                            int4=True, w4=True, batch_block=batch_block)
    k_new = kvnew[:, :, :HD].reshape(L, B, Q, HD)
    v_new = kvnew[:, :, HD:].reshape(L, B, Q, HD)
    kp, ks = quantize_kv_int4(k_new, H)
    vp, vs = quantize_kv_int4(v_new, H)
    cl0 = jnp.asarray(cache_len, jnp.int32).reshape(())
    kv_k = jax.lax.dynamic_update_slice(kv_k, kp, (0, 0, cl0, 0))
    kv_v = jax.lax.dynamic_update_slice(kv_v, vp, (0, 0, cl0, 0))
    k_scale = jax.lax.dynamic_update_slice(
        k_scale, ks.astype(k_scale.dtype), (0, 0, cl0, 0))
    v_scale = jax.lax.dynamic_update_slice(
        v_scale, vs.astype(v_scale.dtype), (0, 0, cl0, 0))
    return h_out.reshape(B, Q, d), kv_k, kv_v, k_scale, v_scale
