"""Transformer building blocks as pure JAX functions over param pytrees.

Rebuild of the reference block zoo (ref:projects/models/module.py) designed
for XLA: layers of a stack are *stacked along a leading axis* and applied
with ``lax.scan`` (constant compile time, weight streaming friendly), and the
factorized spatio-temporal TAR block folds its batch dims so both attentions
are single large batched matmuls on the MXU.

Weight-layout conventions (for the torch checkpoint importer):
  linear:  y = x @ w + b, w is [in, out] (transpose of torch's [out, in])
  attention: fused qkv [d, 3d] with bias (the reference uses
    ``bias=not config.bias`` on attention projections — with config.bias
    False they HAVE biases, ref:module.py:89-95); output proj [d, d] + bias
  mlp: fc [d, 4d], proj [4d, d], NO bias (``bias=config.bias``,
    ref:module.py:236-242)
  layernorm: weight only, eps 1e-5 (bias=None, ref:module.py:26-37)
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# initialisers
# ---------------------------------------------------------------------------
def _normal(key, shape, dtype, std=0.02):
    return (jax.random.normal(key, shape, jnp.float32) * std).astype(dtype)


def init_linear(key, d_in: int, d_out: int, bias: bool, dtype) -> Params:
    p = {"w": _normal(key, (d_in, d_out), dtype)}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def init_layernorm(dim: int, dtype) -> Params:
    return {"w": jnp.ones((dim,), dtype)}


def init_attention(key, d: int, bias_flag: bool, dtype) -> Params:
    """bias_flag is the *config* flag; attention uses `not bias_flag`."""
    k1, k2 = jax.random.split(key)
    return {
        "qkv": init_linear(k1, d, 3 * d, not bias_flag, dtype),
        "proj": init_linear(k2, d, d, not bias_flag, dtype),
    }


def init_cross_attention(key, d: int, bias_flag: bool, dtype) -> Params:
    """Separate q/k/v projections (ref:module.py:454-509)."""
    ks = jax.random.split(key, 4)
    return {
        "q": init_linear(ks[0], d, d, not bias_flag, dtype),
        "k": init_linear(ks[1], d, d, not bias_flag, dtype),
        "v": init_linear(ks[2], d, d, not bias_flag, dtype),
        "proj": init_linear(ks[3], d, d, not bias_flag, dtype),
    }


def init_mlp(key, d: int, bias_flag: bool, dtype, d_hidden=None,
             d_out=None) -> Params:
    d_hidden = d_hidden or 4 * d
    d_out = d_out or d
    k1, k2 = jax.random.split(key)
    return {
        "fc": init_linear(k1, d, d_hidden, bias_flag, dtype),
        "proj": init_linear(k2, d_hidden, d_out, bias_flag, dtype),
    }


def init_block_tar(key, d: int, bias_flag: bool, dtype) -> Params:
    """Factorized spatial→temporal→spatial block (ref:module.py:296-359)."""
    ks = jax.random.split(key, 6)
    return {
        "ln1": init_layernorm(d, dtype),
        "sa1": init_attention(ks[0], d, bias_flag, dtype),
        "ln2": init_layernorm(d, dtype),
        "mlp1": init_mlp(ks[1], d, bias_flag, dtype),
        "ln3": init_layernorm(d, dtype),
        "ta": init_attention(ks[2], d, bias_flag, dtype),
        "ln4": init_layernorm(d, dtype),
        "mlp2": init_mlp(ks[3], d, bias_flag, dtype),
        "ln5": init_layernorm(d, dtype),
        "sa2": init_attention(ks[4], d, bias_flag, dtype),
        "ln6": init_layernorm(d, dtype),
        "mlp3": init_mlp(ks[5], d, bias_flag, dtype),
    }


def init_block_oar(key, d: int, bias_flag: bool, dtype) -> Params:
    """Single causal attention + MLP (ref:module.py:378-416)."""
    ks = jax.random.split(key, 2)
    return {
        "ln1": init_layernorm(d, dtype),
        "attn": init_attention(ks[0], d, bias_flag, dtype),
        "ln2": init_layernorm(d, dtype),
        "mlp": init_mlp(ks[1], d, bias_flag, dtype),
    }


def init_decoder_block(key, d: int, bias_flag: bool, dtype) -> Params:
    """Self-attn → cross-attn → MLP (ref:module.py:630-683)."""
    ks = jax.random.split(key, 3)
    return {
        "ln1": init_layernorm(d, dtype),
        "self_attn": init_attention(ks[0], d, bias_flag, dtype),
        "ln2": init_layernorm(d, dtype),
        "ln3": init_layernorm(d, dtype),
        "cross_attn": init_cross_attention(ks[1], d, bias_flag, dtype),
        "ln4": init_layernorm(d, dtype),
        "mlp": init_mlp(ks[2], d, bias_flag, dtype),
    }


def init_stack(key, n_layers: int, init_fn, *args) -> Params:
    """Stack per-layer params along a leading axis for lax.scan."""
    keys = jax.random.split(key, n_layers)
    layers = [init_fn(k, *args) for k in keys]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


# ---------------------------------------------------------------------------
# primitive ops
# ---------------------------------------------------------------------------
def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    if "wq4" in p:
        # group-int4 weights for the XLA path (runtime/quantize.py
        # quantize_params_w4): nibble-packed along the INPUT dim, group
        # scales [in/G, out].  The dequant materializes one layer's
        # [in, out] bf16 weight as a scan-local temp (~3.5 MB at the
        # larger scale) — storage in HBM stays int4, which is the point:
        # the TAR-family stacks are ~2 GB int8 and ring memory is what
        # caps the full-window scene batch.
        packed = p["wq4"]                         # [in//2, out]
        even = ((packed << 4) >> 4)               # rows 0, 2, 4, ...
        odd = (packed >> 4)                       # rows 1, 3, 5, ...
        K2, N = packed.shape[-2], packed.shape[-1]
        q = jnp.stack([even, odd], axis=-2)       # [in//2, 2, out]
        q = q.reshape(*packed.shape[:-2], 2 * K2, N)
        scale = p["ws4"]                          # [in//G, out]
        G = (2 * K2) // scale.shape[-2]
        w = q.astype(x.dtype) * jnp.repeat(scale, G, axis=-2).astype(x.dtype)
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    elif "wq" in p:
        # weight-only int8: HBM stores int8 + per-output-channel scales;
        # XLA fuses the dequant into the matmul read.  Measured on v5e at
        # the TAR shapes ([4414,768]@[768,2304]): this runs at 72 TF/s —
        # the same as a plain bf16 dot — while dynamic activation-quant
        # int8 (the fused decode kernel's scheme) measures 49 TF/s and a
        # pure int8 dot 61 TF/s: XLA exposes no int8 MXU advantage here,
        # so dequant-to-bf16 is the right XLA-path formulation.
        w = p["wq"].astype(x.dtype) * p["ws"].astype(x.dtype)
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    else:
        y = jnp.dot(x, p["w"], preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def slice_linear_out(p: Params, n: int) -> Params:
    """First n output columns of a linear's params (raw or int8-quantized)
    — lets callers that keep only a logit slice (e.g. the n_step bbox
    head's step-0 vocab, ref:UMGen.py:1098-1101) shrink the matmul
    instead of discarding computed columns."""
    out = {}
    for k in ("w", "wq", "wq4"):
        if k in p:
            out[k] = p[k][..., :n]
    for k in ("ws", "ws4", "b"):
        if k in p:
            out[k] = p[k][..., :n]
    return out


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["w"].astype(jnp.float32)).astype(x.dtype)


def rms_norm(p: Params, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Llama-style RMSNorm (ref:module.py:40-81 — defined upstream, selected
    by get_norm only when norm_type='rms'; kept for config parity)."""
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return y.astype(x.dtype) * p["w"].astype(x.dtype)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    # exact erf GELU (torch nn.GELU default)
    return jax.nn.gelu(x, approximate=False)


def mlp(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return linear(p["proj"], gelu(linear(p["fc"], x)))


def _split_heads(x: jnp.ndarray, n_head: int) -> jnp.ndarray:
    b, s, d = x.shape
    return x.reshape(b, s, n_head, d // n_head)


def sdpa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
         causal: bool) -> jnp.ndarray:
    """Scaled dot-product attention over [B, S, H, Dh] tensors.

    With q_len < k_len and causal=True the mask is aligned bottom-right
    (decode semantics, matching flash_attn_func, ref:module.py:218-225).
    XLA path; the Pallas flash kernel (umgen_tpu.ops.attention) is swapped in
    by the model when enabled.
    """
    B, Sq, H, Dh = q.shape
    Sk = k.shape[1]
    scale = 1.0 / math.sqrt(Dh)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if causal:
        qi = jnp.arange(Sq)[:, None] + (Sk - Sq)
        ki = jnp.arange(Sk)[None, :]
        logits = jnp.where(ki <= qi, logits, -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v)


def sdpa_bias(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              causal: bool, bias: jnp.ndarray) -> jnp.ndarray:
    """`sdpa` with an additive per-head logit bias [H, Sq, Sk] (the
    relative temporal-PE path).  XLA-only: temporal sequences are <= the
    frame window (~20), so the [.., Sq, Sk] logits are tiny — the Pallas
    flash kernel's S=2207 spatial win does not apply here."""
    B, Sq, H, Dh = q.shape
    Sk = k.shape[1]
    scale = 1.0 / math.sqrt(Dh)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    logits = logits + bias.astype(jnp.float32)[None]
    if causal:
        qi = jnp.arange(Sq)[:, None] + (Sk - Sq)
        ki = jnp.arange(Sk)[None, :]
        logits = jnp.where(ki <= qi, logits, -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v)


def attention(p: Params, x: jnp.ndarray, n_head: int, causal: bool,
              attn_impl=sdpa, t_bias: Optional[jnp.ndarray] = None
              ) -> jnp.ndarray:
    """Fused-QKV self-attention over [B, S, D] (ref:module.py:179-230).
    t_bias [H, S, S]: additive logit bias (relative temporal PE)."""
    B, S, D = x.shape
    qkv = linear(p["qkv"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    if t_bias is not None:
        y = sdpa_bias(_split_heads(q, n_head), _split_heads(k, n_head),
                      _split_heads(v, n_head), causal, t_bias)
    else:
        y = attn_impl(_split_heads(q, n_head), _split_heads(k, n_head),
                      _split_heads(v, n_head), causal)
    return linear(p["proj"], y.reshape(B, S, D))


def attention_decode(p: Params, x: jnp.ndarray, n_head: int,
                     kv_cache: Tuple[jnp.ndarray, jnp.ndarray],
                     cache_len: jnp.ndarray,
                     ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Causal decode step (1 or more new tokens) with a preallocated KV ring.

    x: [B, Q, D] new-token activations (positions cache_len..cache_len+Q-1).
    kv_cache: (k, v) each [B, S_max, H, Dh]; entries < cache_len are valid.
    Returns (y [B, Q, D], updated cache).  New K/V are written starting at
    `cache_len` and attended causally with the prefix — equivalent to the
    reference's concat-and-grow cache (ref:module.py:207-211) but with
    static shapes for jit.  Q > 1 doubles as the prefill path.
    """
    B, Q, D = x.shape
    qkv = linear(p["qkv"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = _split_heads(q, n_head)
    k_new = _split_heads(k, n_head)
    v_new = _split_heads(v, n_head)

    ck, cv = kv_cache
    ck = jax.lax.dynamic_update_slice(ck, k_new.astype(ck.dtype),
                                      (0, cache_len, 0, 0))
    cv = jax.lax.dynamic_update_slice(cv, v_new.astype(cv.dtype),
                                      (0, cache_len, 0, 0))

    S_max = ck.shape[1]
    Dh = D // n_head
    scale = 1.0 / math.sqrt(Dh)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, ck.astype(q.dtype),
                        preferred_element_type=jnp.float32) * scale
    qpos = cache_len + jnp.arange(Q)[None, None, :, None]
    valid = jnp.arange(S_max)[None, None, None, :] <= qpos
    logits = jnp.where(valid, logits, -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    y = jnp.einsum("bhqk,bkhd->bqhd", w, cv.astype(q.dtype))
    y = linear(p["proj"], y.reshape(B, Q, D))
    return y, (ck, cv)


def cross_attention(p: Params, q_in: jnp.ndarray, kv_in: jnp.ndarray,
                    n_head: int) -> jnp.ndarray:
    """Non-causal cross attention (ref:module.py:454-509)."""
    B, Sq, D = q_in.shape
    q = _split_heads(linear(p["q"], q_in), n_head)
    k = _split_heads(linear(p["k"], kv_in), n_head)
    v = _split_heads(linear(p["v"], kv_in), n_head)
    y = sdpa(q, k, v, causal=False)
    return linear(p["proj"], y.reshape(B, Sq, D))


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------
def block_tar(p: Params, x: jnp.ndarray, n_head: int,
              attn_impl=sdpa, t_bias: Optional[jnp.ndarray] = None
              ) -> jnp.ndarray:
    """Factorized spatio-temporal block over [B, T, S, D]
    (ref:module.py:332-359): spatial (non-causal over S) → temporal (causal
    over T) → spatial, each with its own pre-LN and MLP.

    This is the reference's long-context trick — it never attends over the
    full T·S sequence.  On TPU both attentions are plain batched attention
    with folded leading dims: (B·T, S) and (B·S, T).

    t_bias [H, T, T]: relative temporal-PE logit bias, applied to the
    TEMPORAL attention only (config.temporal_pe_mode="relative").
    """
    B, T, S, D = x.shape

    xs = x.reshape(B * T, S, D)
    xs = xs + attention(p["sa1"], layer_norm(p["ln1"], xs), n_head,
                        causal=False, attn_impl=attn_impl)
    xs = xs + mlp(p["mlp1"], layer_norm(p["ln2"], xs))

    xt = xs.reshape(B, T, S, D).transpose(0, 2, 1, 3).reshape(B * S, T, D)
    xt = xt + attention(p["ta"], layer_norm(p["ln3"], xt), n_head,
                        causal=True, attn_impl=attn_impl, t_bias=t_bias)
    xt = xt + mlp(p["mlp2"], layer_norm(p["ln4"], xt))

    xs = xt.reshape(B, S, T, D).transpose(0, 2, 1, 3).reshape(B * T, S, D)
    xs = xs + attention(p["sa2"], layer_norm(p["ln5"], xs), n_head,
                        causal=False, attn_impl=attn_impl)
    xs = xs + mlp(p["mlp3"], layer_norm(p["ln6"], xs))

    return xs.reshape(B, T, S, D)


def block_oar(p: Params, x: jnp.ndarray, n_head: int, causal: bool = True,
              attn_impl=sdpa) -> jnp.ndarray:
    """Causal intra-frame block over [B, S, D] (ref:module.py:402-411)."""
    x = x + attention(p["attn"], layer_norm(p["ln1"], x), n_head,
                      causal=causal, attn_impl=attn_impl)
    x = x + mlp(p["mlp"], layer_norm(p["ln2"], x))
    return x


def block_oar_decode(p: Params, x: jnp.ndarray, n_head: int,
                     kv_cache, cache_len):
    """Single-token OAR block step with KV cache."""
    a, kv_cache = attention_decode(p["attn"], layer_norm(p["ln1"], x),
                                   n_head, kv_cache, cache_len)
    x = x + a
    x = x + mlp(p["mlp"], layer_norm(p["ln2"], x))
    return x, kv_cache


def temporal_attn_decode(p: Params, x: jnp.ndarray, n_head: int,
                         kv_cache: Tuple[jnp.ndarray, jnp.ndarray],
                         slot: jnp.ndarray, n_valid: jnp.ndarray,
                         t_bias: Optional[jnp.ndarray] = None
                         ) -> Tuple[jnp.ndarray,
                                    Tuple[jnp.ndarray, jnp.ndarray]]:
    """One-frame temporal attention against a rolling frame ring.

    x: [N, 1, D] (N = B*S folded rows); kv_cache: (k, v) each
    [N, T_max, H, Dh] in any storage dtype (bf16/fp8).  The new frame's K/V
    is written at ring position `slot`; the query attends every slot
    < n_valid (ring order is irrelevant to softmax; causality holds because
    only past frames are ever cached).
    t_bias [H, T_max]: per-RING-SLOT relative-PE bias (caller maps slot
    ages to table entries; the current frame's own slot must carry the
    distance-0 entry)."""
    N, _, D = x.shape
    qkv = linear(p["qkv"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = _split_heads(q, n_head)
    ck, cv = kv_cache
    ck = jax.lax.dynamic_update_slice(
        ck, _split_heads(k, n_head).astype(ck.dtype), (0, slot, 0, 0))
    cv = jax.lax.dynamic_update_slice(
        cv, _split_heads(v, n_head).astype(cv.dtype), (0, slot, 0, 0))

    T_max = ck.shape[1]
    Dh = D // n_head
    scale = 1.0 / math.sqrt(Dh)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, ck.astype(q.dtype),
                        preferred_element_type=jnp.float32) * scale
    if t_bias is not None:
        logits = logits + t_bias.astype(jnp.float32)[None, :, None, :]
    valid = jnp.arange(T_max)[None, None, None, :] < n_valid
    logits = jnp.where(valid, logits, -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    y = jnp.einsum("bhqk,bkhd->bqhd", w, cv.astype(q.dtype))
    return linear(p["proj"], y.reshape(N, 1, D)), (ck, cv)


def block_tar_decode(p: Params, x: jnp.ndarray, n_head: int,
                     kv_cache, slot, n_valid, attn_impl=sdpa,
                     t_bias: Optional[jnp.ndarray] = None):
    """BlockTAR for ONE new frame with a temporal KV ring.

    x: [B, S, D] (the new frame); kv_cache: (k, v) each [B*S, T_max, H, Dh].
    The spatial attentions are frame-local and run as usual; only the
    temporal attention consults the ring.  This is the fast-path
    counterpart of `block_tar` — the reference always recomputes the whole
    window (its temporal kvcache is plumbed but always None,
    ref:UMGen.py:666,767: `kvcache_t = [None] * n`).
    """
    B, S, D = x.shape
    xs = x
    xs = xs + attention(p["sa1"], layer_norm(p["ln1"], xs), n_head,
                        causal=False, attn_impl=attn_impl)
    xs = xs + mlp(p["mlp1"], layer_norm(p["ln2"], xs))

    xt = xs.reshape(B * S, 1, D)
    a, kv_cache = temporal_attn_decode(p["ta"], layer_norm(p["ln3"], xt),
                                       n_head, kv_cache, slot, n_valid,
                                       t_bias=t_bias)
    xt = xt + a
    xt = xt + mlp(p["mlp2"], layer_norm(p["ln4"], xt))

    xs = xt.reshape(B, S, D)
    xs = xs + attention(p["sa2"], layer_norm(p["ln5"], xs), n_head,
                        causal=False, attn_impl=attn_impl)
    xs = xs + mlp(p["mlp3"], layer_norm(p["ln6"], xs))
    return xs, kv_cache


def q4_pack(q: jnp.ndarray) -> jnp.ndarray:
    """Pack int4 values (int8 storage, range [-7, 7]) pairwise along the
    last dim: byte d holds dims (2d | low nibble, 2d+1 | high nibble)."""
    return ((q[..., 1::2] << 4) | (q[..., 0::2] & 0x0F)).astype(jnp.int8)


def q4_unpack_even(packed: jnp.ndarray) -> jnp.ndarray:
    """Sign-extended low nibble (original even dims)."""
    return (packed << 4) >> 4


def q4_unpack_odd(packed: jnp.ndarray) -> jnp.ndarray:
    """Sign-extended high nibble (original odd dims)."""
    return packed >> 4


def q2_pack(q: jnp.ndarray) -> jnp.ndarray:
    """Pack int2 values (int8 storage, range [-2, 1]) four-wise along the
    last dim: byte d holds dims (4d | bits 0-1, 4d+1 | bits 2-3,
    4d+2 | bits 4-5, 4d+3 | bits 6-7)."""
    return ((q[..., 3::4] << 6) | ((q[..., 2::4] & 0x03) << 4)
            | ((q[..., 1::4] & 0x03) << 2)
            | (q[..., 0::4] & 0x03)).astype(jnp.int8)


def q2_unpack(packed: jnp.ndarray, j: int) -> jnp.ndarray:
    """Sign-extended 2-bit field j in [0, 4) (original dims j::4)."""
    return (packed << (6 - 2 * j)) >> 6 if j < 3 else packed >> 6


def block_tar_decode_deferred(p: Params, x: jnp.ndarray, n_head: int,
                              ring_k: jnp.ndarray, ring_v: jnp.ndarray,
                              slot, n_valid, attn_impl=sdpa,
                              ring_scale_k: Optional[jnp.ndarray] = None,
                              ring_scale_v: Optional[jnp.ndarray] = None,
                              t_bias_ring: Optional[jnp.ndarray] = None,
                              t_bias_self: Optional[jnp.ndarray] = None,
                              ring_chan_k: Optional[jnp.ndarray] = None,
                              ring_chan_v: Optional[jnp.ndarray] = None,
                              ring_bits: int = 4):
    """BlockTAR single-frame step with READ-ONLY temporal rings.

    Returns (y [B, S, D], k_new, v_new [B*S, H, Dh]).  The caller scatters
    all layers' new K/V into the rings with one dynamic_update_slice —
    in-scan ring mutation forces XLA to materialize fresh multi-GB ring
    copies per step (scan ys cannot alias xs).
    The ring slot being overwritten this frame is masked out and the new
    frame attends itself via a separate rank-1 term.

    int4 rings: when ring_scale_k/v ([B, T_max, H] dequant multipliers) are
    given, ring_k/v are nibble-packed int8 [B*S, T_max, H, Dh//2] (int4
    arrays cannot cross jit boundaries on current TPU runtimes).  The
    contraction is over Dh only, so the per-(scene, frame, head) scales are
    folded into the attention *logits* (k) and *weights* (v) — no
    dequantized ring is ever materialized.

    int2 rings (ring_bits=2): ring_k/v are 2-bit-packed int8
    [B*S, T_max, H, Dh//4]; dequant value = (q + 0.5) * scale * chan, where
    ring_chan_k/v [B, H, Dh] are STATIC per-channel equalizers (frozen at
    prefill; pass ones when no prefill statistics exist).  Both extra
    factors fold exactly: chan multiplies the query (logits) / the output
    (values) since it is T-independent, and the +0.5 offset becomes a
    rank-1 correction (0.5 * sum_d q'_d on logits; 0.5 * sum_t w_t s_t on
    values) — still no dequantized ring.

    t_bias_ring [H, T_max] / t_bias_self [H]: relative temporal-PE logit
    bias per ring slot (slot ages mapped by the caller) and for the new
    frame's self term (distance 0).
    """
    B, S, D = x.shape
    xs = x
    xs = xs + attention(p["sa1"], layer_norm(p["ln1"], xs), n_head,
                        causal=False, attn_impl=attn_impl)
    xs = xs + mlp(p["mlp1"], layer_norm(p["ln2"], xs))

    xt = xs.reshape(B * S, 1, D)
    a = layer_norm(p["ln3"], xt)
    qkv = linear(p["ta"]["qkv"], a)
    q, k_new, v_new = jnp.split(qkv, 3, axis=-1)
    N = B * S
    H = n_head
    Dh = D // H
    q = q.reshape(N, 1, H, Dh)
    k_new = k_new.reshape(N, H, Dh)
    v_new = v_new.reshape(N, H, Dh)

    packed = ring_scale_k is not None
    T_max = ring_k.shape[1]
    scale = 1.0 / math.sqrt(Dh)

    def fold(t_nh1t, s_bth):
        """Multiply an [N, H, 1, T] tensor by per-(B, T, H) factors."""
        t5 = t_nh1t.reshape(B, S, H, 1, T_max)
        s5 = s_bth.transpose(0, 2, 1)[:, None, :, None, :]
        return (t5 * s5).reshape(N, H, 1, T_max)

    if packed and ring_bits == 2:
        # channel-equalized query: q'_d = q_d * chan_k[b, h, d]
        qk = q
        if ring_chan_k is not None:
            qk = (q.reshape(B, S, H, Dh)
                  * ring_chan_k[:, None].astype(q.dtype)).reshape(
                      N, 1, H, Dh)
        lp = sum(jnp.einsum("nqhd,nkhd->nhqk", qk[..., j::4],
                            q2_unpack(ring_k, j).astype(q.dtype),
                            preferred_element_type=jnp.float32)
                 for j in range(4))
        # +0.5 offset on every stored level: rank-1 logit correction
        lp = (lp + 0.5 * jnp.sum(qk, axis=-1, dtype=jnp.float32)
              .transpose(0, 2, 1)[:, :, :, None]) * scale
        lp = fold(lp, ring_scale_k.astype(jnp.float32))
    elif packed:
        lp = (jnp.einsum("nqhd,nkhd->nhqk", q[..., 0::2],
                         q4_unpack_even(ring_k).astype(q.dtype),
                         preferred_element_type=jnp.float32)
              + jnp.einsum("nqhd,nkhd->nhqk", q[..., 1::2],
                           q4_unpack_odd(ring_k).astype(q.dtype),
                           preferred_element_type=jnp.float32)) * scale
        lp = fold(lp, ring_scale_k.astype(jnp.float32))
    else:
        lp = jnp.einsum("nqhd,nkhd->nhqk", q, ring_k.astype(q.dtype),
                        preferred_element_type=jnp.float32) * scale
    if t_bias_ring is not None:
        lp = lp + t_bias_ring.astype(jnp.float32)[None, :, None, :]
    tpos = jnp.arange(T_max)[None, None, None, :]
    valid = (tpos < n_valid) & (tpos != slot)
    lp = jnp.where(valid, lp, -jnp.inf)
    ls = (jnp.sum(q[:, 0] * k_new, axis=-1)
          .astype(jnp.float32))[:, :, None, None] * scale  # [N,H,1,1]
    if t_bias_self is not None:
        ls = ls + t_bias_self.astype(jnp.float32)[None, :, None, None]
    m = jnp.maximum(jnp.max(lp, -1, keepdims=True), ls)
    ep = jnp.exp(lp - m)
    es = jnp.exp(ls - m)
    denom = jnp.sum(ep, -1, keepdims=True) + es
    wp = ep / denom
    wself = (es / denom).astype(q.dtype)
    if packed and ring_bits == 2:
        wps = fold(wp, ring_scale_v.astype(jnp.float32)).astype(q.dtype)
        y = jnp.stack([jnp.einsum("nhqk,nkhd->nqhd", wps,
                                  q2_unpack(ring_v, j).astype(q.dtype))
                       for j in range(4)], axis=-1).reshape(N, 1, H, Dh)
        # +0.5 offset: adds 0.5 * sum_t w_t s_t to every channel
        y = y + 0.5 * jnp.sum(wps, axis=-1).transpose(0, 2, 1)[..., None]
        if ring_chan_v is not None:
            y = (y.reshape(B, S, H, Dh)
                 * ring_chan_v[:, None].astype(q.dtype)).reshape(
                     N, 1, H, Dh)
    elif packed:
        wps = fold(wp, ring_scale_v.astype(jnp.float32)).astype(q.dtype)
        y_e = jnp.einsum("nhqk,nkhd->nqhd", wps,
                         q4_unpack_even(ring_v).astype(q.dtype))
        y_o = jnp.einsum("nhqk,nkhd->nqhd", wps,
                         q4_unpack_odd(ring_v).astype(q.dtype))
        y = jnp.stack([y_e, y_o], axis=-1).reshape(N, 1, H, Dh)
    else:
        y = jnp.einsum("nhqk,nkhd->nqhd", wp.astype(q.dtype),
                       ring_v.astype(q.dtype))
    y = y + wself.transpose(0, 2, 1, 3) * v_new[:, None]
    att = linear(p["ta"]["proj"], y.reshape(N, 1, D))

    xt = xt + att
    xt = xt + mlp(p["mlp2"], layer_norm(p["ln4"], xt))

    xs = xt.reshape(B, S, D)
    xs = xs + attention(p["sa2"], layer_norm(p["ln5"], xs), n_head,
                        causal=False, attn_impl=attn_impl)
    xs = xs + mlp(p["mlp3"], layer_norm(p["ln6"], xs))
    return xs, k_new, v_new


def block_tar_collect_kv(p: Params, x: jnp.ndarray, n_head: int,
                         attn_impl=sdpa,
                         t_bias: Optional[jnp.ndarray] = None):
    """Full-window BlockTAR that also returns the temporal-attention K/V for
    cache prefill.  Numerically identical to `block_tar`."""
    B, T, S, D = x.shape

    xs = x.reshape(B * T, S, D)
    xs = xs + attention(p["sa1"], layer_norm(p["ln1"], xs), n_head,
                        causal=False, attn_impl=attn_impl)
    xs = xs + mlp(p["mlp1"], layer_norm(p["ln2"], xs))

    xt = xs.reshape(B, T, S, D).transpose(0, 2, 1, 3).reshape(B * S, T, D)
    h = layer_norm(p["ln3"], xt)
    qkv = linear(p["ta"]["qkv"], h)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    kh = _split_heads(k, n_head)
    vh = _split_heads(v, n_head)
    if t_bias is not None:
        y = sdpa_bias(_split_heads(q, n_head), kh, vh, True, t_bias)
    else:
        y = attn_impl(_split_heads(q, n_head), kh, vh, True)
    xt = xt + linear(p["ta"]["proj"], y.reshape(B * S, T, D))
    xt = xt + mlp(p["mlp2"], layer_norm(p["ln4"], xt))

    xs = xt.reshape(B, S, T, D).transpose(0, 2, 1, 3).reshape(B * T, S, D)
    xs = xs + attention(p["sa2"], layer_norm(p["ln5"], xs), n_head,
                        causal=False, attn_impl=attn_impl)
    xs = xs + mlp(p["mlp3"], layer_norm(p["ln6"], xs))

    return xs.reshape(B, T, S, D), (kh, vh)       # kv: [B*S, T, H, Dh]


def decoder_block(p: Params, x: jnp.ndarray, ctx: jnp.ndarray,
                  n_head: int) -> jnp.ndarray:
    """Self-attn → cross-attn(queries, scene emb) → MLP over [B, S, D]
    (ref:module.py:662-683)."""
    x = x + attention(p["self_attn"], layer_norm(p["ln1"], x), n_head,
                      causal=False)
    x = x + cross_attention(p["cross_attn"], layer_norm(p["ln2"], x),
                            layer_norm(p["ln3"], ctx), n_head)
    x = x + mlp(p["mlp"], layer_norm(p["ln4"], x))
    return x


# ---------------------------------------------------------------------------
# stacked application
# ---------------------------------------------------------------------------
def apply_stack(stack: Params, x: jnp.ndarray, block_fn, remat: bool = False
                ) -> jnp.ndarray:
    """Run a stacked-layer block sequence with lax.scan.

    Replaces the reference's Python loop over nn.ModuleList
    (ref:UMGen.py:768-769); with stacking, XLA compiles ONE block body and
    streams per-layer weights — constant compile time in depth and the
    standard pattern for deep stacks under pjit.
    """
    def body(h, layer_params):
        f = jax.checkpoint(block_fn) if remat else block_fn
        return f(layer_params, h), None

    y, _ = jax.lax.scan(body, x, stack)
    return y


# ---------------------------------------------------------------------------
# positional encodings
# ---------------------------------------------------------------------------
def position_encoding_init(n_position: int, emb_dim: int,
                           start_index: int = 0,
                           dtype=np.float32) -> np.ndarray:
    """Sinusoid table with a zero row at pos 0 (ref:module.py:746-768).

    The reference builds this in float64 then casts to **bfloat16**
    (ref:module.py:768) — pass dtype=ml_dtypes.bfloat16/jnp.bfloat16 for
    bit-parity with checkpoints.
    """
    pos = np.arange(n_position, dtype=np.float64)[:, None]
    j = np.arange(emb_dim, dtype=np.float64)[None, :]
    table = (pos + start_index) / np.power(10000.0, 2 * (j // 2) / emb_dim)
    table[0, :] = 0.0
    table[1:, 0::2] = np.sin(table[1:, 0::2])
    table[1:, 1::2] = np.cos(table[1:, 1::2])
    return table.astype(dtype)
