"""The jitted frame step: ego → TAR cascade → OAR token decode.

This is the framework's core departure from the reference: the reference
decodes the 2207-position frame with a per-token *Python* loop containing
host round trips (pose decode on CPU, numba collision on CPU, `.item()`
checks per bbox token, ref:UMGen.py:1209-1262 and SURVEY §3.2); here the
whole frame — ego sampling, TAR priors, the four modality segments, control
injection, the pad→TAR merge rule and the retroactive collision constraint —
compiles to ONE XLA program per window size.  All shapes are static; the
per-position modality schedule is baked in at trace time from the
SequenceLayout.

Decode-order bookkeeping (1-indexed positions after the task slot):
  input index k carries embed(token_k) + prior_seq[k] (the task embedding at
  k=0); sampling position p feeds input k=p-1 with KV cache holding inputs
  0..p-2 (ref:UMGen.py:1209-1247).  Forced separators are never sampled —
  their embeddings are pushed through the OAR only to extend the cache.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from umgen_tpu.config import EGO_WHL, TASK_NAME_ID, ModelConfig
from umgen_tpu.layout import SequenceLayout
from umgen_tpu.models import modules as nn
from umgen_tpu.models.sampling import make_sampler
from umgen_tpu.models.umgen import UMGen
from umgen_tpu.ops.collision import candidate_collides

Params = Dict[str, Any]

MAX_BOXES = 62   # ego + 60 slots + candidate headroom

KV_INT8_SCALE = 16.0     # fixed-grid int8 KV storage (matches decode_kernel)


def _kv_store(x: "jnp.ndarray", dtype) -> "jnp.ndarray":
    """Write K/V activations into cache storage (scale-aware for int8)."""
    if jnp.dtype(dtype) == jnp.int8:
        return jnp.clip(jnp.round(x.astype(jnp.float32) * KV_INT8_SCALE),
                        -127, 127).astype(jnp.int8)
    return x.astype(dtype)


def _kv_load(c: "jnp.ndarray", dtype) -> "jnp.ndarray":
    """Read cache storage back to compute dtype (scale-aware for int8)."""
    if c.dtype == jnp.int8:
        return (c.astype(jnp.float32) * (1.0 / KV_INT8_SCALE)).astype(dtype)
    return c.astype(dtype)


class PackedKV(NamedTuple):
    """int4 OAR cache half: nibble-packed rows + per-(row, head) scales.

    packed [L, B, S, H*Dh/2] int8 (halves layout, see
    ops.decode_kernel.quantize_kv_int4), scale [L, B, S, H] f32.  Flows
    through OarState / lax.scan carries as an ordinary pytree; cache-
    shape code goes through _kv_rows/_sliced which special-case it."""
    packed: jnp.ndarray
    scale: jnp.ndarray


def _kv_rows(kv) -> int:
    """Cache length (S axis) for dense or packed storage."""
    return (kv.packed if isinstance(kv, PackedKV) else kv).shape[2]


def _kv_load_int4(packed: "jnp.ndarray", scale: "jnp.ndarray", n_head: int,
                  dtype) -> "jnp.ndarray":
    """[B, S, HD/2] nibbles + [B, S, H] scales → [B, S, H, Dh] dequant."""
    B, S, HDp = packed.shape
    w = packed.astype(jnp.int32)
    lo = ((w << 28) >> 28).astype(jnp.float32)
    hi = (w >> 4).astype(jnp.float32)
    full = jnp.concatenate([lo, hi], axis=-1)            # [B, S, HD]
    full = full.reshape(B, S, n_head, (2 * HDp) // n_head)
    return (full * (scale[..., None].astype(jnp.float32) / 7.0)
            ).astype(dtype)


class OarState(NamedTuple):
    """Carried state of the OAR decode within one frame."""
    kv_k: jnp.ndarray        # [L, B, S_max, H, Dh] (or PackedKV)
    kv_v: jnp.ndarray
    prev_emb: jnp.ndarray    # [B, 1, D] input embedding for the next step
    rng: jax.Array


class FrameOutputs(NamedTuple):
    tokens: jnp.ndarray      # [B, seq_len] full sampled/forced stream
    pose_tokens: jnp.ndarray  # [B, 3] ego tokens used this frame
    # speculative-decode telemetry (zeros when speculative_k == 0):
    # verify steps executed and draft tokens accepted across the frame's
    # speculatively-decoded segments.  acceptance/chunk = accepted/chunks;
    # sequential decode would have cost (chunks + accepted) OAR steps.
    spec_chunks: jnp.ndarray = np.int32(0)
    spec_accepted: jnp.ndarray = np.int32(0)


class Rollout:
    """Compiled per-frame generation for a fixed window length T."""

    def __init__(self, model: UMGen):
        self.model = model
        self.config = model.config
        self.layout = model.layout
        cfg = self.config
        self._samplers = {
            "pose": make_sampler(cfg.sample_method, cfg.top_k
                                 if cfg.sample_method == "topk" else cfg.top_p,
                                 cfg.sfmx_temp),
            "map": make_sampler(cfg.sample_method, cfg.top_k_map
                                if cfg.sample_method == "topk" else cfg.top_p,
                                cfg.sfmx_temp),
            "bbox3d": make_sampler(cfg.sample_method, cfg.top_k
                                   if cfg.sample_method == "topk"
                                   else cfg.top_p, cfg.sfmx_temp),
            # image sampling is top-k 16 regardless (ref:UMGen.py:103,1133)
            "image": make_sampler("topk" if cfg.sample_method != "greedy"
                                  else "greedy", cfg.top_k_image,
                                  cfg.sfmx_temp),
        }
        if cfg.sample_method == "greedy":
            self._samplers = {m: make_sampler("greedy", 0)
                              for m in self._samplers}
        if cfg.speculative_k > 0 and cfg.oar_cache_dtype == "int4" \
                and not cfg.fused_oar_kernel:
            # without the fused v5mqi4 kernel every verify chunk would
            # dequantize the whole int4 prefix through the XLA multi-query
            # body — pathologically slower than sequential fused decode
            raise ValueError(
                "speculative_k > 0 with the int4 OAR cache requires "
                "fused_oar_kernel=True (the v5mqi4 verify kernel); use "
                "oar_cache_dtype='int8' otherwise")
        if (cfg.speculative_k > 0 and cfg.oar_cache_dtype == "int4"
                and cfg.speculative_k * cfg.n_head > 128):
            raise ValueError(
                "speculative_k * n_head must be <= 128 with the int4 OAR "
                "cache (v5mqi4 lane-packs the queries; larger chunks "
                "would fall back to the pathological XLA int4 body)")
        if cfg.speculative_k > 0 and cfg.oar_batch_block \
                and not cfg.fused_oar_kernel:
            # without the fused kernels the batch-split knob has nothing
            # to act on, and the XLA multi-query body runs whole-batch
            raise ValueError(
                "speculative_k > 0 with oar_batch_block requires "
                "fused_oar_kernel=True (the batch-split multi-query "
                "verify kernels); drop one of the two")
        # ego box used by the collision rule (ref:UMGen.py:1320-1336)
        ego = EGO_WHL["nuplan"]
        self._ego_box = np.array(
            [0, 0, 0, ego["l"], ego["w"], ego["h"], 0, 0, 0, 0],
            dtype=np.float32)

    # ------------------------------------------------------------------
    # OAR plumbing
    # ------------------------------------------------------------------
    def init_kv(self, B: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        # +K slack rows: speculative verify chunks may push up to K-1
        # stale entries past a segment's end (never read, then overwritten)
        slack = cfg.speculative_k if cfg.speculative_k > 0 else 0
        if cfg.oar_cache_dtype == "int4":
            # nibble-packed flat storage + per-(row, head) scale planes —
            # halves the dominant KV stream of long-prefix decode steps
            # (ops.decode_kernel v5i4 notes)
            L = cfg.n_oar_layer
            S = self.layout.input_len + slack
            HD = cfg.n_head * cfg.head_dim
            return (PackedKV(jnp.zeros((L, B, S, HD // 2), jnp.int8),
                             jnp.zeros((L, B, S, cfg.n_head), jnp.float32)),
                    PackedKV(jnp.zeros((L, B, S, HD // 2), jnp.int8),
                             jnp.zeros((L, B, S, cfg.n_head), jnp.float32)))
        dt = jnp.dtype(cfg.oar_cache_dtype)
        if cfg.fused_oar_kernel and dt == jnp.int8:
            # flat [L, B, S, H*Dh] storage for the v5 kernel: a 5-D cache
            # (Dh=48 < the 128-lane tile) is lane-padded by XLA, and the
            # kernel-facing reshape then forces a physical relayout copy of
            # the WHOLE cache every decode step — measured 2.2x step time
            # (scripts/bench_decode_kernel.py: 2.18 -> 1.01 ms/step at B=1)
            shape = (cfg.n_oar_layer, B, self.layout.input_len + slack,
                     cfg.n_head * cfg.head_dim)
        else:
            shape = (cfg.n_oar_layer, B, self.layout.input_len + slack,
                     cfg.n_head, cfg.head_dim)
        return jnp.zeros(shape, dt), jnp.zeros(shape, dt)

    def oar_step(self, params: Params, x: jnp.ndarray,
                 kv_k: jnp.ndarray, kv_v: jnp.ndarray,
                 cache_len) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Push Q new inputs through the OAR stack.

        Deferred-write cache discipline: within the step every layer READS
        its cache slice and attends [prefix ‖ new-block] without mutating
        it; the 36 layers' new K/V are written back with ONE
        dynamic_update_slice afterwards.  Per-layer in-place mutation inside
        the (unrolled) layer loop forces XLA to materialize cache copies —
        measured 2x step-time on v5e.

        Returns (ln_oar(h) [B, Q, D], kv_k, kv_v)."""
        cfg = self.config
        n_head = cfg.n_head
        B, Q, D = x.shape
        if isinstance(kv_k, PackedKV):
            return self._oar_step_int4(params, x, kv_k, kv_v, cache_len)
        if cfg.fused_oar_kernel and Q == 1 and "oar_packed" in params:
            # packed-block kernels: v4/v3 (multi-stream, MXU-only
            # attention) on int8 caches; v2 (burst-fetch) otherwise
            if kv_k.dtype == jnp.int8:
                from umgen_tpu.ops import decode_kernel as dk
                if "wqp4" in params["oar_packed"]:   # W4A8 packing
                    fused = dk.fused_decode_step_w4
                    if cfg.oar_batch_block:
                        fused = functools.partial(
                            fused, batch_block=cfg.oar_batch_block)
                elif kv_k.ndim == 4 and cfg.oar_kernel_version == 7 \
                        and B * n_head <= 128 \
                        and not cfg.oar_batch_block:  # flat cache -> v7
                    # v7 has no batch-split grid; an explicit
                    # oar_batch_block (the large-B VMEM knob) routes to v5
                    fused = dk.fused_decode_step_v7
                elif kv_k.ndim == 4:             # flat cache -> v5
                    fused = dk.fused_decode_step_v5
                    if cfg.oar_batch_block:
                        fused = functools.partial(
                            fused, batch_block=cfg.oar_batch_block)
                elif "wqkv" in params["oar_packed"]:
                    fused = dk.fused_decode_step_v4
                else:
                    fused = dk.fused_decode_step_v3
                h, kv_k, kv_v = fused(
                    params["oar_packed"], x, kv_k, kv_v, cache_len,
                    n_head=n_head)
            else:
                from umgen_tpu.ops.decode_kernel import fused_decode_step_v2
                h, kv_k, kv_v = fused_decode_step_v2(
                    params["oar_packed"], x, kv_k, kv_v, cache_len,
                    n_head=n_head)
            return nn.layer_norm(params["ln_oar"], h), kv_k, kv_v
        if (cfg.fused_oar_kernel and Q > 1 and Q * n_head <= 128
                and "oar_packed" in params
                and kv_k.ndim == 4 and kv_k.dtype == jnp.int8):
            # multi-query verify chunks (speculative decoding) ride the
            # fused v5mq/w4mq kernels: all Q queries share one weight +
            # KV stream instead of paying the XLA body's per-layer cache
            # relayout/dequant per chunk.  oar_batch_block (the large-B
            # VMEM knob) splits the KV stream into batch groups exactly
            # as in the sequential kernels.
            from umgen_tpu.ops import decode_kernel as dk
            fused = (dk.fused_decode_step_w4mq
                     if "wqp4" in params["oar_packed"]
                     else dk.fused_decode_step_v5mq)
            if cfg.oar_batch_block:
                fused = functools.partial(
                    fused, batch_block=cfg.oar_batch_block)
            h, kv_k, kv_v = fused(
                params["oar_packed"], x, kv_k, kv_v, cache_len,
                n_head=n_head)
            return nn.layer_norm(params["ln_oar"], h), kv_k, kv_v
        if cfg.fused_oar_kernel and Q == 1 and kv_k.ndim == 5 \
                and "wq" in params["oar"]["attn"]["qkv"]:
            from umgen_tpu.ops.decode_kernel import fused_decode_step
            h, kv_k, kv_v = fused_decode_step(params["oar"], x, kv_k, kv_v,
                                              cache_len, n_head=n_head)
            return nn.layer_norm(params["ln_oar"], h), kv_k, kv_v
        Dh = cfg.head_dim
        scale = 1.0 / np.sqrt(Dh)
        S_max = kv_k.shape[2]
        flat_cache = kv_k.ndim == 4              # [L, B, S, H*Dh] storage
        kpos = jnp.arange(S_max)[None, None, None, :]
        qpos = cache_len + jnp.arange(Q)[None, None, :, None]
        prefix_valid = kpos < cache_len                  # [1,1,1,S]
        self_mask = (jnp.arange(Q)[None, None, :, None]
                     >= jnp.arange(Q)[None, None, None, :])

        def body(h, layer):
            p, ck, cv = layer                            # ck: [B,S,H,Dh]
            if flat_cache:
                ck = ck.reshape(B, S_max, n_head, Dh)
                cv = cv.reshape(B, S_max, n_head, Dh)
            a = nn.layer_norm(p["ln1"], h)
            qkv = nn.linear(p["attn"]["qkv"], a)
            q, k_new, v_new = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(B, Q, n_head, Dh)
            k_new = k_new.reshape(B, Q, n_head, Dh)
            v_new = v_new.reshape(B, Q, n_head, Dh)

            lp = jnp.einsum("bqhd,bkhd->bhqk", q, _kv_load(ck, q.dtype),
                            preferred_element_type=jnp.float32) * scale
            lp = jnp.where(prefix_valid, lp, -jnp.inf)
            ls = jnp.einsum("bqhd,bkhd->bhqk", q, k_new,
                            preferred_element_type=jnp.float32) * scale
            ls = jnp.where(self_mask, ls, -jnp.inf)

            m = jnp.maximum(jnp.max(lp, -1, keepdims=True),
                            jnp.max(ls, -1, keepdims=True))
            ep = jnp.exp(lp - m)
            es = jnp.exp(ls - m)
            denom = (jnp.sum(ep, -1, keepdims=True)
                     + jnp.sum(es, -1, keepdims=True))
            wp = (ep / denom).astype(q.dtype)
            ws = (es / denom).astype(q.dtype)
            y = (jnp.einsum("bhqk,bkhd->bqhd", wp, _kv_load(cv, q.dtype))
                 + jnp.einsum("bhqk,bkhd->bqhd", ws, v_new))
            h = h + nn.linear(p["attn"]["proj"], y.reshape(B, Q, D))
            h = h + nn.mlp(p["mlp"], nn.layer_norm(p["ln2"], h))
            return h, (_kv_store(k_new, kv_k.dtype),
                       _kv_store(v_new, kv_v.dtype))

        unroll = cfg.oar_layer_unroll or cfg.n_oar_layer
        h, (ks, vs) = jax.lax.scan(body, x, (params["oar"], kv_k, kv_v),
                                   unroll=unroll)
        # one deferred write of all layers' new K/V
        if flat_cache:
            L = kv_k.shape[0]
            ks = ks.reshape(L, B, Q, n_head * Dh)
            vs = vs.reshape(L, B, Q, n_head * Dh)
        zeros = (0,) * (kv_k.ndim - 3)
        kv_k = jax.lax.dynamic_update_slice(kv_k, ks,
                                            (0, 0, cache_len) + zeros)
        kv_v = jax.lax.dynamic_update_slice(kv_v, vs,
                                            (0, 0, cache_len) + zeros)
        return nn.layer_norm(params["ln_oar"], h), kv_k, kv_v

    def _oar_step_int4(self, params: Params, x: jnp.ndarray,
                       kv_k: PackedKV, kv_v: PackedKV, cache_len):
        """oar_step on the nibble-packed int4 cache (oar_cache_dtype
        "int4").  Q == 1 decode rides the v5i4 fused kernel; the few
        multi-row pushes per frame (prefill, segment bridges, speculative
        verify chunks) dequantize the prefix per layer in the XLA body —
        same attention math as the dense path, rows re-quantized per
        (row, head) on writeback."""
        from umgen_tpu.ops.decode_kernel import (fused_decode_step_v5i4,
                                                 fused_decode_step_v5mqi4,
                                                 fused_decode_step_w4i4,
                                                 quantize_kv_int4)
        cfg = self.config
        n_head = cfg.n_head
        B, Q, D = x.shape
        if (cfg.fused_oar_kernel and Q > 1 and Q * n_head <= 128
                and "oar_packed" in params):
            # speculative verify chunks on the int4 cache ride the fused
            # multi-query kernels — the XLA body below dequantizes the
            # whole packed prefix per layer per chunk
            from umgen_tpu.ops.decode_kernel import fused_decode_step_w4mqi4
            fused = (fused_decode_step_w4mqi4
                     if "wqp4" in params["oar_packed"]
                     else fused_decode_step_v5mqi4)
            if cfg.oar_batch_block:
                fused = functools.partial(
                    fused, batch_block=cfg.oar_batch_block)
            h, kp, vp, ks, vs = fused(
                params["oar_packed"], x, kv_k.packed, kv_v.packed,
                kv_k.scale, kv_v.scale, cache_len, n_head=n_head)
            return (nn.layer_norm(params["ln_oar"], h),
                    PackedKV(kp, ks), PackedKV(vp, vs))
        if cfg.fused_oar_kernel and Q == 1 and "oar_packed" in params:
            fused = (fused_decode_step_w4i4
                     if "wqp4" in params["oar_packed"]
                     else fused_decode_step_v5i4)
            if cfg.oar_batch_block:
                fused = functools.partial(fused,
                                          batch_block=cfg.oar_batch_block)
            h, kp, vp, ks, vs = fused(params["oar_packed"], x,
                                      kv_k.packed, kv_v.packed,
                                      kv_k.scale, kv_v.scale, cache_len,
                                      n_head=n_head)
            return (nn.layer_norm(params["ln_oar"], h),
                    PackedKV(kp, ks), PackedKV(vp, vs))

        Dh = cfg.head_dim
        scale = 1.0 / np.sqrt(Dh)
        S_max = kv_k.packed.shape[2]
        kpos = jnp.arange(S_max)[None, None, None, :]
        prefix_valid = kpos < cache_len                  # [1,1,1,S]
        self_mask = (jnp.arange(Q)[None, None, :, None]
                     >= jnp.arange(Q)[None, None, None, :])

        def body(h, layer):
            p, ckp, cks, cvp, cvs = layer
            ck = _kv_load_int4(ckp, cks, n_head, h.dtype)   # [B,S,H,Dh]
            cv = _kv_load_int4(cvp, cvs, n_head, h.dtype)
            a = nn.layer_norm(p["ln1"], h)
            qkv = nn.linear(p["attn"]["qkv"], a)
            q, k_new, v_new = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(B, Q, n_head, Dh)
            k_new = k_new.reshape(B, Q, n_head, Dh)
            v_new = v_new.reshape(B, Q, n_head, Dh)

            lp = jnp.einsum("bqhd,bkhd->bhqk", q, ck,
                            preferred_element_type=jnp.float32) * scale
            lp = jnp.where(prefix_valid, lp, -jnp.inf)
            ls = jnp.einsum("bqhd,bkhd->bhqk", q, k_new,
                            preferred_element_type=jnp.float32) * scale
            ls = jnp.where(self_mask, ls, -jnp.inf)
            m = jnp.maximum(jnp.max(lp, -1, keepdims=True),
                            jnp.max(ls, -1, keepdims=True))
            ep = jnp.exp(lp - m)
            es = jnp.exp(ls - m)
            denom = (jnp.sum(ep, -1, keepdims=True)
                     + jnp.sum(es, -1, keepdims=True))
            wp = (ep / denom).astype(q.dtype)
            ws = (es / denom).astype(q.dtype)
            y = (jnp.einsum("bhqk,bkhd->bqhd", wp, cv)
                 + jnp.einsum("bhqk,bkhd->bqhd", ws, v_new))
            h = h + nn.linear(p["attn"]["proj"], y.reshape(B, Q, D))
            h = h + nn.mlp(p["mlp"], nn.layer_norm(p["ln2"], h))
            HD = n_head * Dh
            kp_new, ks_new = quantize_kv_int4(
                k_new.reshape(B, Q, HD), n_head)
            vp_new, vs_new = quantize_kv_int4(
                v_new.reshape(B, Q, HD), n_head)
            return h, (kp_new, ks_new, vp_new, vs_new)

        unroll = cfg.oar_layer_unroll or cfg.n_oar_layer
        h, (kp, ks, vp, vs) = jax.lax.scan(
            body, x, (params["oar"], kv_k.packed, kv_k.scale,
                      kv_v.packed, kv_v.scale), unroll=unroll)
        kv_k = PackedKV(
            jax.lax.dynamic_update_slice(kv_k.packed, kp,
                                         (0, 0, cache_len, 0)),
            jax.lax.dynamic_update_slice(kv_k.scale,
                                         ks.astype(kv_k.scale.dtype),
                                         (0, 0, cache_len, 0)))
        kv_v = PackedKV(
            jax.lax.dynamic_update_slice(kv_v.packed, vp,
                                         (0, 0, cache_len, 0)),
            jax.lax.dynamic_update_slice(kv_v.scale,
                                         vs.astype(kv_v.scale.dtype),
                                         (0, 0, cache_len, 0)))
        return nn.layer_norm(params["ln_oar"], h), kv_k, kv_v

    # token → next-step input embedding, per modality (no positional
    # embeddings in the OAR stream, ref:UMGen.py:1053-1137)
    def _embed_token(self, params: Params, mod: str,
                     token: jnp.ndarray) -> jnp.ndarray:
        model = self.model
        if mod == "pose":
            return params["buffers"]["fouier_pe"][token]
        if mod == "map":
            z = params["buffers"]["map_codebook"][token]
            return nn.mlp(params["map_mlp_pre"], z)
        if mod == "bbox3d":
            return params["be"][token]
        if mod == "image":
            z = params["buffers"]["img_codebook"][token]
            return nn.mlp(params["img_mlp_pre"], z)
        raise ValueError(mod)

    def _aux_emb(self, params: Params, aux_id: int, B: int) -> jnp.ndarray:
        return jnp.broadcast_to(params["axe"][aux_id][None, None],
                                (B, 1, params["axe"].shape[-1]))

    # ------------------------------------------------------------------
    # per-segment KV truncation: while decoding a segment the cache can
    # never be longer than the segment's end position, so hand the scans a
    # prefix slice — the map segment (1024 of 2202 steps) then reads a
    # 1032-row cache instead of 2208, cutting its per-step HBM traffic
    # nearly in half
    # ------------------------------------------------------------------
    def _sliced(self, state: OarState, kv_len: int) -> OarState:
        def cut(kv):
            if isinstance(kv, PackedKV):
                return PackedKV(kv.packed[:, :, :kv_len],
                                kv.scale[:, :, :kv_len])
            return kv[:, :, :kv_len]

        return OarState(cut(state.kv_k), cut(state.kv_v),
                        state.prev_emb, state.rng)

    def _unsliced(self, full: OarState, part: OarState) -> OarState:
        def put(whole, piece):
            if isinstance(whole, PackedKV):
                return PackedKV(
                    jax.lax.dynamic_update_slice(
                        whole.packed, piece.packed,
                        (0,) * whole.packed.ndim),
                    jax.lax.dynamic_update_slice(
                        whole.scale, piece.scale, (0,) * whole.scale.ndim))
            return jax.lax.dynamic_update_slice(whole, piece,
                                                (0,) * whole.ndim)

        return OarState(put(full.kv_k, part.kv_k),
                        put(full.kv_v, part.kv_v),
                        part.prev_emb, part.rng)

    # ------------------------------------------------------------------
    # plain segment scan (map / image)
    # ------------------------------------------------------------------
    def _decode_plain_segment(self, params, mod, seg, state: OarState,
                              prior_seq, head_name) -> Tuple[OarState,
                                                             jnp.ndarray]:
        """Sample a contiguous run of same-modality content positions."""
        sampler = self._samplers[mod]
        c0 = seg.content_start
        # pre-split one key per position (scan xs) — a per-step
        # jax.random.split inside the loop costs a threefry launch
        rng, seg_rng = jax.random.split(state.rng)
        keys = jax.random.split(seg_rng, seg.content_len)
        state = state._replace(rng=rng)

        def step(state: OarState, xs):
            i, key = xs
            p = c0 + i
            h, kv_k, kv_v = self.oar_step(params, state.prev_emb,
                                          state.kv_k, state.kv_v,
                                          cache_len=p - 1)
            token = sampler(key, nn.linear(params[head_name], h[:, -1]))
            emb = self._embed_token(params, mod, token)[:, None, :] \
                + jax.lax.dynamic_slice_in_dim(prior_seq, p, 1, axis=1)
            return OarState(kv_k, kv_v, emb.astype(state.prev_emb.dtype),
                            state.rng), token

        state, tokens = jax.lax.scan(step, state,
                                     (jnp.arange(seg.content_len), keys),
                                     unroll=self.config.oar_pos_unroll)
        return state, tokens.T            # [B, content_len]

    # ------------------------------------------------------------------
    # teacher-forced segment (init_token_mod replay)
    # ------------------------------------------------------------------
    def _decode_forced_segment(self, params, mod, seg, state: OarState,
                               prior_seq, forced) -> Tuple[OarState,
                                                           jnp.ndarray]:
        """Force a whole segment to given tokens (the reference's
        init-token replay, ref:tools/model_pl.py:103-130 +
        UMGen.py:1180-1201): no sampling, but the forced embeddings are
        pushed through the OAR so the cache — and therefore every later
        position in the frame — conditions on the forced stream exactly
        as if it had been sampled.  One causal multi-token pass replaces
        the sequential scan (the tokens are known upfront).

        forced: [B, content_len] int32."""
        c0 = seg.content_start
        L = seg.content_len
        dt = state.prev_emb.dtype
        forced = forced.astype(jnp.int32)
        # inputs at indices c0-1 .. c0+L-2: BOS input (state.prev_emb),
        # then embed(forced[i]) + prior[c0+i] for i = 0..L-2
        emb = self._embed_token(params, mod, forced[:, :L - 1])
        pri = jax.lax.slice_in_dim(prior_seq, c0, c0 + L - 1, axis=1)
        x = jnp.concatenate([state.prev_emb, (emb + pri).astype(dt)],
                            axis=1)
        _, kv_k, kv_v = self.oar_step(params, x, state.kv_k, state.kv_v,
                                      cache_len=c0 - 1)
        last = (self._embed_token(params, mod, forced[:, L - 1:L])
                + jax.lax.slice_in_dim(prior_seq, c0 + L - 1, c0 + L,
                                       axis=1))
        return OarState(kv_k, kv_v, last.astype(dt), state.rng), forced

    # ------------------------------------------------------------------
    # bbox segment scan with merge rule / control / collision constraint
    # ------------------------------------------------------------------
    def _decode_bbox_segment(self, params, seg, state: OarState, prior_seq,
                             prev_frame_bbox, tar_box_logits,
                             control_mask) -> Tuple[OarState, jnp.ndarray]:
        """660 bbox content positions with the reference's decode rules:

        * control override: slots flagged in `control_mask` sample from the
          TAR head with <pad> masked out (ref:UMGen.py:1083-1089)
        * pad→TAR merge rule: if the OAR samples <pad> for an object that
          existed last frame, resample from the TAR head
          (ref:UMGen.py:1091-1104)
        * no-born rule (optional, ref:UMGen.py:1106-1114)
        * rule constraint: on each completed box (category position), decode
          to metric, run the BEV collision test against boxes accepted so
          far this frame (+ ego); a NEWBORN that collides — or arrives when
          >30 boxes exist — has its 11 tokens retroactively rewritten to
          <pad> (ref:UMGen.py:1116-1123, 1275-1383).  Matching the
          reference, already-written KV entries are NOT recomputed; only the
          token stream and subsequent inputs change.
        """
        cfg = self.config
        lo = self.layout
        sampler = self._samplers["bbox3d"]
        c0 = seg.content_start
        pad = cfg.bbox3d_vocab_size - 1          # 1027
        B = state.prev_emb.shape[0]
        buf = params["buffers"]

        # collision buffers: slot 0 = ego box
        boxes0 = jnp.zeros((B, MAX_BOXES, 10), jnp.float32)
        boxes0 = boxes0.at[:, 0].set(jnp.asarray(self._ego_box))
        valid0 = jnp.zeros((B, MAX_BOXES), bool).at[:, 0].set(True)
        nbox0 = jnp.ones((B,), jnp.int32)        # count incl. ego
        # window of the 11 most recent tokens (for decode-on-completion)
        win0 = jnp.full((B, 11), pad, jnp.int32)

        def decode_candidate(win):
            """11 tokens → metric box (in-graph decode_single_objects +
            unnormalize, ref:UMGen.py:1311-1316)."""
            attr = jnp.clip(win[:, :10], 0, 1023)
            vals = buf["agent_bin_mid"][attr]
            return vals * buf["agent_span"] + buf["agent_lo"]

        rng, seg_rng = jax.random.split(state.rng)
        seg_keys = jax.random.split(seg_rng, seg.content_len * 3
                                    ).reshape(seg.content_len, 3, 2)
        state = state._replace(rng=rng)

        def step(carry, xs):
            i, keys = xs
            r1, r2, r3 = keys[0], keys[1], keys[2]
            state, boxes, bvalid, nbox, win, tokens_buf = carry
            p = c0 + i
            obj = i // 11
            attr = i % 11
            h, kv_k, kv_v = self.oar_step(params, state.prev_emb,
                                          state.kv_k, state.kv_v,
                                          cache_len=p - 1)

            logits_ar = nn.linear(params["head_ar_bbox3d"], h[:, -1])
            tok_ar = sampler(r1, logits_ar)

            prev_tok = prev_frame_bbox[:, i]     # same position, last frame

            # --- control override (reference object-id quirk: //11 from the
            # BOS position, so category tokens map to the NEXT object id) ---
            ctrl_obj = (i + 1) // 11
            is_ctrl = control_mask[:, ctrl_obj]
            tar_logits = tar_box_logits[:, i]
            tar_logits_nopad = tar_logits.at[:, -1].set(-jnp.inf)
            tok_ctrl = sampler(r2, tar_logits_nopad)
            token = jnp.where(is_ctrl, tok_ctrl, tok_ar)

            # --- pad→TAR merge rule ---
            if cfg.merge_ar_tar and not cfg.only_ar:
                tok_tar = sampler(r3, tar_logits)
                need_merge = ((token == pad) & (prev_tok != pad)
                              & ~is_ctrl)
                token = jnp.where(need_merge, tok_tar, token)

            # --- no-born rule ---
            if cfg.no_born:
                newborn_pos = prev_tok == pad
                token = jnp.where(newborn_pos, pad, token)

            win = jnp.roll(win, -1, axis=1).at[:, -1].set(token)
            tokens_buf = tokens_buf.at[:, i].set(token)

            # --- rule constraint on box completion (attr == 10) ---
            if cfg.rule_constrain:
                def apply_constraint(args):
                    token, win, boxes, bvalid, nbox, tokens_buf = args
                    cand = decode_candidate(win)
                    collide = candidate_collides(cand, boxes, bvalid)
                    # newborn := previous frame token at this position is pad
                    newborn = prev_tok == pad
                    # count incl. ego + accepted + candidate
                    too_many = (nbox + 1) > 30
                    alive = token != pad
                    kill = alive & newborn & (collide | too_many)
                    keep = alive & ~kill
                    # accept: write candidate into the buffer
                    boxes = jnp.where(
                        keep[:, None, None],
                        jax.vmap(lambda b, c, n: b.at[n].set(c))(
                            boxes, cand, nbox),
                        boxes)
                    bvalid = jnp.where(
                        keep[:, None],
                        jax.vmap(lambda v, n: v.at[n].set(True))(bvalid,
                                                                 nbox),
                        bvalid)
                    nbox = nbox + keep.astype(jnp.int32)
                    # kill: rewrite the last 11 tokens to pad
                    pads = jnp.full((B, 11), pad, jnp.int32)
                    start = i - 10
                    cur = jax.lax.dynamic_slice_in_dim(tokens_buf, start,
                                                       11, axis=1)
                    repl = jnp.where(kill[:, None], pads, cur)
                    tokens_buf = jax.lax.dynamic_update_slice_in_dim(
                        tokens_buf, repl, start, axis=1)
                    token = jnp.where(kill, pad, token)
                    win = jnp.where(kill[:, None], pads, win)
                    return token, win, boxes, bvalid, nbox, tokens_buf

                token, win, boxes, bvalid, nbox, tokens_buf = jax.lax.cond(
                    attr == 10, apply_constraint,
                    lambda a: a,
                    (token, win, boxes, bvalid, nbox, tokens_buf))

            emb = self._embed_token(params, "bbox3d", token)[:, None, :] \
                + jax.lax.dynamic_slice_in_dim(prior_seq, p, 1, axis=1)
            new_state = OarState(kv_k, kv_v,
                                 emb.astype(state.prev_emb.dtype),
                                 state.rng)
            return (new_state, boxes, bvalid, nbox, win, tokens_buf), None

        tokens_buf0 = jnp.zeros((B, seg.content_len), jnp.int32)
        carry0 = (state, boxes0, valid0, nbox0, win0, tokens_buf0)
        carry, _ = jax.lax.scan(step, carry0,
                                (jnp.arange(seg.content_len), seg_keys),
                                unroll=self.config.oar_pos_unroll)
        state, _, _, _, _, tokens_buf = carry
        return state, tokens_buf

    # ------------------------------------------------------------------
    # teacher-forced OAR inputs (training + decode-consistency tests)
    # ------------------------------------------------------------------
    def oar_inputs_from_tokens(self, params: Params,
                               frame_tokens: jnp.ndarray,
                               prior_seq: jnp.ndarray) -> jnp.ndarray:
        """Rebuild the full OAR input sequence from a complete token stream.

        frame_tokens: [B, seq_len] including separators (1-indexed position
        p at column p-1).  Returns [B, seq_len, D]: input index 0 is the
        task embedding; index k >= 1 embeds token_k by its modality (aux
        embedding at separators); every index gets + prior_seq[k].
        The result feeds `UMGen.oar_forward` for a full causal pass whose
        output at index p-1 predicts position p.
        """
        cfg = self.config
        lo = self.layout
        B = frame_tokens.shape[0]
        parts = [jnp.broadcast_to(
            params["tske"][TASK_NAME_ID[cfg.task]][None, None],
            (B, 1, cfg.n_embd))]
        for seg in lo.segments:
            content = frame_tokens[:, seg.content_start - 1:seg.content_end]
            emb = self._embed_token(params, seg.mod, content)
            parts.append(self._aux_emb(params, seg.bos, B))
            parts.append(emb)
            parts.append(self._aux_emb(params, seg.eos, B))
        full = jnp.concatenate(parts, axis=1)          # [B, 1+seq_len, D]
        # drop the final EOS input (never consumed) and add priors
        full = full[:, :lo.seq_len]
        return (full + prior_seq[:, :lo.seq_len]).astype(jnp.dtype(cfg.dtype))

    # ------------------------------------------------------------------
    # full frame
    # ------------------------------------------------------------------
    def frame_step(self, params: Params, inputs: Dict[str, jnp.ndarray],
                   rng: jax.Array,
                   pose_override: Optional[jnp.ndarray] = None,
                   control_bbox: Optional[jnp.ndarray] = None,
                   forced_tokens: Optional[Dict[str, jnp.ndarray]] = None,
                   ) -> FrameOutputs:
        """Generate one frame.

        inputs: token dict, each [B, T, seg_content_len] — the conditioning
        window (pose NOT yet shifted; this function performs the shift,
        ref:UMGen.py:1438-1452).
        pose_override: [B, 3] ego tokens to force instead of sampling
        (trajectory control, ref:UMGen.py:1441-1447).
        control_bbox: [B, 660] init bbox tokens with -1 for free positions
        (agent control, ref:UMGen.py:1459-1475), or None.
        forced_tokens: {mod: [B, content_len]} teacher-forced segments
        (init_token_mod replay, ref:model_pl.py:103-130), or None.
        """
        cfg = self.config
        lo = self.layout
        model = self.model
        B = inputs["pose"].shape[0]
        rng, ego_rng = jax.random.split(rng)

        # ---- step 1: ego action (ref:UMGen.py:1438-1455) ----
        if pose_override is None:
            ego_logits = model.ego_logits(params, inputs)
            ego_tokens = self._samplers["pose"](ego_rng, ego_logits)
        else:
            ego_tokens = pose_override
        shifted = dict(inputs)
        shifted["pose"] = jnp.concatenate(
            [inputs["pose"], ego_tokens[:, None, :]], axis=1)[:, 1:]

        # ---- control slot setup (ref:UMGen.py:1457-1475) ----
        control_mask = jnp.zeros((B, 61), bool)
        if control_bbox is not None and "bbox3d" in shifted:
            valid = control_bbox != -1                       # [B, 660]
            shifted["bbox3d"] = shifted["bbox3d"].at[:, -1].set(
                jnp.where(valid, control_bbox, shifted["bbox3d"][:, -1]))
            obj_valid = valid.reshape(B, 60, 11).any(axis=2)
            control_mask = control_mask.at[:, :60].set(obj_valid)

        # ---- step 2: TAR cascade → per-position priors ----
        priors = model.tar_priors(params, shifted)
        return self._finish_frame(params, priors["prior_seq"], ego_tokens,
                                  shifted["bbox3d"][:, -1]
                                  if "bbox3d" in shifted else None,
                                  control_mask, rng,
                                  forced_tokens=forced_tokens)

    def _finish_frame(self, params: Params, prior_seq: jnp.ndarray,
                      ego_tokens: jnp.ndarray,
                      prev_frame_bbox: jnp.ndarray,
                      control_mask: jnp.ndarray,
                      rng: jax.Array,
                      forced_tokens: Optional[Dict[str, jnp.ndarray]] = None,
                      ) -> FrameOutputs:
        """Step 3: the OAR decode given the TAR priors (shared between the
        recompute and temporal-cache paths).

        forced_tokens: optional {mod: [B, content_len]} — segments listed
        here are teacher-forced to the given tokens instead of sampled
        (init_token_mod replay, ref:model_pl.py:103-130)."""
        cfg = self.config
        lo = self.layout
        B = prior_seq.shape[0]
        # prior at input index k is prior_seq[k] with the task slot at k=0
        # receiving prior_seq[0] too (the reference adds the prior AFTER
        # prepending the task embedding, so priors align with input indices,
        # ref:UMGen.py:1215-1231); equivalently: input_prior[k] =
        # prior_seq[k] for k < seq_len.
        tar_box_logits = None
        if any(s.mod == "bbox3d" for s in lo.segments):
            bseg = lo.segment("bbox3d")
            bbox_prior = jax.lax.slice_in_dim(prior_seq, bseg.start,
                                              bseg.content_end, axis=1)
            if cfg.n_step > 1:
                # multi-step head: inference uses the step-0 vocab slice
                # (ref:UMGen.py:1098-1101); slice the weight COLUMNS so
                # the matmul only computes the slice it keeps
                tar_box_logits = nn.linear(
                    nn.slice_linear_out(params["head_tar_n_step_bbox3d"],
                                        cfg.bbox3d_vocab_size),
                    bbox_prior)
            else:
                tar_box_logits = nn.linear(
                    params["head_tar_bbox3d"], bbox_prior)  # [B, 660, 1028]

        # ---- step 3: OAR decode ----
        kv_k, kv_v = self.init_kv(B)
        dt = jnp.dtype(cfg.dtype)

        # prefill: [task, pose_bos, p1, p2, p3, pose_eos]
        task_emb = jnp.broadcast_to(
            params["tske"][TASK_NAME_ID[cfg.task]][None, None],
            (B, 1, cfg.n_embd))
        pose_emb = self._embed_token(params, "pose", ego_tokens)  # [B,3,D]
        pseg = lo.segment("pose")
        prefill = jnp.concatenate([
            task_emb,
            self._aux_emb(params, pseg.bos, B),
            pose_emb,
            self._aux_emb(params, pseg.eos, B),
        ], axis=1).astype(dt)
        n_pre = prefill.shape[1]                              # 6
        prefill = prefill + prior_seq[:, :n_pre]
        _, kv_k, kv_v = self.oar_step(params, prefill, kv_k, kv_v,
                                      cache_len=0)

        tokens = jnp.zeros((B, lo.seq_len + 1), jnp.int32)   # 1-indexed
        # record the forced pose segment tokens
        tokens = tokens.at[:, pseg.start].set(pseg.bos)
        tokens = tokens.at[:, pseg.start + 1:pseg.end].set(ego_tokens)
        tokens = tokens.at[:, pseg.end].set(pseg.eos)

        # first sampled segment starts after pose; its BOS input embedding:
        segs = [s for s in lo.segments if s.mod != "pose"]
        state = OarState(
            kv_k, kv_v,
            (self._aux_emb(params, segs[0].bos, B)
             + prior_seq[:, segs[0].start:segs[0].start + 1]).astype(dt),
            rng)

        head_for = {"map": "head_ar_map", "image": "head_ar_img",
                    "bbox3d": "head_ar_bbox3d"}
        spec_k = cfg.speculative_k if cfg.sample_method in ("topk",
                                                            "greedy") else 0
        tar_head_for = {"map": "head_tar_map", "image": "head_tar_img"}
        sample_k_for = {"map": cfg.top_k_map, "image": cfg.top_k_image}
        spec_chunks = jnp.int32(0)
        spec_accepted = jnp.int32(0)
        forced_tokens = forced_tokens or {}
        for si, seg in enumerate(segs):
            tokens = tokens.at[:, seg.start].set(seg.bos)
            forced = forced_tokens.get(seg.mod)
            bbox_spec = (seg.mod == "bbox3d" and spec_k > 0
                         and cfg.speculative_bbox and forced is None)
            kv_len = min(
                seg.end + (spec_k if seg.mod != "bbox3d" or bbox_spec
                           else 0),
                _kv_rows(state.kv_k))
            part = self._sliced(state, kv_len)
            if forced is not None:
                part, seg_tokens = self._decode_forced_segment(
                    params, seg.mod, seg, part, prior_seq, forced)
            elif bbox_spec:
                from umgen_tpu.models.speculative import (
                    decode_bbox_segment_speculative)
                part, seg_tokens, tel = decode_bbox_segment_speculative(
                    self, params, seg, part, prior_seq,
                    prev_frame_bbox=prev_frame_bbox,
                    tar_box_logits=tar_box_logits,
                    control_mask=control_mask,
                    K=min(spec_k, 11),
                    greedy=cfg.sample_method == "greedy")
                spec_chunks = spec_chunks + jnp.asarray(tel.chunks,
                                                        jnp.int32)
                spec_accepted = spec_accepted + jnp.asarray(tel.accepted,
                                                            jnp.int32)
            elif seg.mod == "bbox3d":
                # NB the merge rule reads the control-OVERWRITTEN previous
                # frame (ref:_inference mutates inputs["bbox3d"][:, -1]
                # before passing it as previous_frame_tokens,
                # ref:UMGen.py:1464-1467,1535)
                part, seg_tokens = self._decode_bbox_segment(
                    params, seg, part, prior_seq,
                    prev_frame_bbox=prev_frame_bbox,
                    tar_box_logits=tar_box_logits,
                    control_mask=control_mask)
            elif spec_k > 0:
                from umgen_tpu.models.speculative import (
                    decode_segment_speculative)
                part, seg_tokens, tel = decode_segment_speculative(
                    self, params, seg, part, prior_seq,
                    head_ar=head_for[seg.mod],
                    head_tar=tar_head_for[seg.mod],
                    k=sample_k_for[seg.mod], temp=cfg.sfmx_temp,
                    K=spec_k, greedy=cfg.sample_method == "greedy")
                spec_chunks = spec_chunks + jnp.asarray(tel.chunks,
                                                        jnp.int32)
                spec_accepted = spec_accepted + jnp.asarray(tel.accepted,
                                                            jnp.int32)
            else:
                part, seg_tokens = self._decode_plain_segment(
                    params, seg.mod, seg, part, prior_seq,
                    head_for[seg.mod])
            state = self._unsliced(state, part)
            tokens = jax.lax.dynamic_update_slice_in_dim(
                tokens, seg_tokens, seg.content_start, axis=1)
            tokens = tokens.at[:, seg.end].set(seg.eos)

            if si + 1 < len(segs):
                nxt = segs[si + 1]
                # push [embed(last sampled), EOS] through the OAR to extend
                # the cache to input index seg.end, then hand the next scan
                # its BOS input embedding
                last_emb = state.prev_emb                      # k = seg.end-1
                eos_emb = (self._aux_emb(params, seg.eos, B)
                           + prior_seq[:, seg.end:seg.end + 1]).astype(dt)
                x2 = jnp.concatenate([last_emb, eos_emb], axis=1)
                _, kv_k, kv_v = self.oar_step(params, x2, state.kv_k,
                                              state.kv_v,
                                              cache_len=seg.end - 1)
                bos_emb = (self._aux_emb(params, nxt.bos, B)
                           + prior_seq[:, nxt.start:nxt.start + 1]
                           ).astype(dt)
                state = OarState(kv_k, kv_v, bos_emb, state.rng)

        return FrameOutputs(tokens=tokens[:, 1:], pose_tokens=ego_tokens,
                            spec_chunks=spec_chunks,
                            spec_accepted=spec_accepted)

    # ------------------------------------------------------------------
    # temporal-cache fast path
    # ------------------------------------------------------------------
    def _control_setup(self, frame_bbox, control_bbox, B):
        """Apply agent-control overwrite + build the control mask
        (ref:UMGen.py:1457-1475).  frame_bbox: [B, 660]."""
        control_mask = jnp.zeros((B, 61), bool)
        if control_bbox is not None:
            valid = control_bbox != -1
            frame_bbox = jnp.where(valid, control_bbox, frame_bbox)
            obj_valid = valid.reshape(B, 60, 11).any(axis=2)
            control_mask = control_mask.at[:, :60].set(obj_valid)
        return frame_bbox, control_mask

    def frame_step_prefill(self, params: Params,
                           inputs: Dict[str, jnp.ndarray],
                           rng: jax.Array,
                           pose_override=None, control_bbox=None,
                           forced_tokens=None):
        """First cached-mode step: ingest the whole conditioning window
        into the TAR rings, then decode one frame.  inputs: the raw window
        {mod: [B, T, len]} assumed to start at absolute frame 0.

        The rings are CREATED here (as the prefill scans' outputs) rather
        than passed in — avoiding a second multi-GB ring allocation during
        the prefill program.  Returns (FrameOutputs, cache)."""
        model = self.model
        B, T = inputs["pose"].shape[:2]
        rng, ego_rng = jax.random.split(rng)

        # Agent-control overwrite of the newest window frame BEFORE any
        # ring ingestion: the reference mutates its window copy in place
        # (ref:UMGen.py:1464-1467), so the overwrite persists for every
        # LATER step's ego/TAR inputs.  The reference's ego net at THIS
        # step sees the pre-overwrite window, but under agent control the
        # ego output is always overridden by the trajectory pose, so
        # ingesting the overwritten frame is observably identical — and
        # makes the rings bit-match the reference window from then on.
        if "bbox3d" in inputs:
            last_bbox, control_mask = self._control_setup(
                inputs["bbox3d"][:, -1], control_bbox, B)
            inputs = dict(inputs)
            inputs["bbox3d"] = inputs["bbox3d"].at[:, -1].set(last_bbox)
        else:
            last_bbox = None
            control_mask = jnp.zeros((B, 61), bool)

        cache: Dict = {}
        ego_logits, cache = model.prefill_ego_cache(params, inputs, cache)
        if pose_override is None:
            ego_tokens = self._samplers["pose"](ego_rng, ego_logits)
        else:
            ego_tokens = pose_override

        shifted = dict(inputs)
        shifted["pose"] = jnp.concatenate(
            [inputs["pose"], ego_tokens[:, None, :]], axis=1)[:, 1:]

        pri = model.prefill_tar_caches(params, shifted, cache)
        cache = pri["cache"]
        cache["frames"] = jnp.asarray(T, jnp.int32)
        out = self._finish_frame(params, pri["prior_seq"], ego_tokens,
                                 last_bbox, control_mask, rng,
                                 forced_tokens=forced_tokens)
        return out, cache

    def ingest_frame(self, params: Params, raw_frame: Dict[str, jnp.ndarray],
                     next_pose: jnp.ndarray, cache: Dict) -> Dict:
        """Chunked prefill: push ONE conditioning frame into the ego + TAR
        rings without decoding.  raw_frame: {mod: [B, 1, len]} frame t;
        next_pose: [B, 3] raw pose tokens of frame t+1 (the shifted-window
        semantics of `prefill_tar_caches` — the TAR rings see each frame
        with the action that leads OUT of it).

        Ingesting the window frame-by-frame is mathematically identical to
        the full-window prefill (cached == recompute pre-slide) but its
        peak memory is one frame's activations instead of the whole
        [B, T, S, D] window — the full-window prefill program is what OOMs
        first at large scene batches (B>=6 on a 16 GB chip)."""
        model = self.model
        abs_frame = cache["frames"]
        _, cache = model.ego_logits_cached(params, raw_frame, cache,
                                           abs_frame)
        shifted = dict(raw_frame)
        shifted["pose"] = next_pose[:, None, :]
        pri = model.tar_priors_cached(params, shifted, cache, abs_frame)
        cache = pri["cache"]
        cache["frames"] = abs_frame + 1
        return cache

    def frame_step_cached(self, params: Params,
                          newest_frame: Dict[str, jnp.ndarray],
                          cache: Dict, rng: jax.Array,
                          pose_override=None, control_bbox=None,
                          forced_tokens=None):
        """Steady-state cached step: ingest ONE new raw frame (the frame
        generated by the previous step, pose = motion into it) and decode
        the next frame.  newest_frame: {mod: [B, 1, len]}.

        Control note: the agent-control overwrite of the newest frame is
        applied BEFORE ego/TAR ring ingestion, reproducing the
        reference's persistent in-place window mutation
        (ref:UMGen.py:1464-1467): every later step's ego and TAR inputs
        see the overwritten tokens.  The reference's ego net at THIS
        step sees the pre-overwrite window, but under agent control the
        ego output is replaced by the trajectory pose, so the
        distinction is observably dead — the rings bit-match the
        reference window for every step whose ego output is used.
        Returns (FrameOutputs, cache)."""
        model = self.model
        B = newest_frame["pose"].shape[0]
        abs_frame = cache["frames"]          # index of the ingested frame
        rng, ego_rng = jax.random.split(rng)

        if "bbox3d" in newest_frame:
            last_bbox, control_mask = self._control_setup(
                newest_frame["bbox3d"][:, 0], control_bbox, B)
            newest_frame = dict(newest_frame)
            newest_frame["bbox3d"] = last_bbox[:, None, :]
        else:
            last_bbox = None
            control_mask = jnp.zeros((B, 61), bool)

        ego_logits, cache = model.ego_logits_cached(params, newest_frame,
                                                    cache, abs_frame)
        if pose_override is None:
            ego_tokens = self._samplers["pose"](ego_rng, ego_logits)
        else:
            ego_tokens = pose_override

        shifted_frame = dict(newest_frame)
        shifted_frame["pose"] = ego_tokens[:, None, :]

        pri = model.tar_priors_cached(params, shifted_frame, cache,
                                      abs_frame)
        cache = pri["cache"]
        cache["frames"] = abs_frame + 1
        out = self._finish_frame(params, pri["prior_seq"], ego_tokens,
                                 last_bbox, control_mask, rng,
                                 forced_tokens=forced_tokens)
        return out, cache
